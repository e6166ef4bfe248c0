"""Every oracle-declared query must exactly match DuckDB at sf0.01 — the
local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from brooklin_spark import registry
from tests.oracle import compare, duck_connection

registry.load_all()

_NAMES = sorted(registry.ORACLES)


@pytest.fixture(scope="module")
def duck(sf_correct):
    con = duck_connection(sf_correct)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, sf_correct, duck, name):
    df = registry.QUERIES[name](spark, sf_correct)
    compare(df, duck, registry.ORACLES[name], name=name)


def test_all_queries_have_entries():
    assert registry.QUERIES, "no queries registered"
    missing = set(registry.ORACLES) - set(registry.QUERIES)
    assert not missing, f"oracles without queries: {missing}"
