"""Every oracle-declared query must exactly match DuckDB at sf0.01 — the
local mirror of the driver's correctness gate.

Default collection runs a DETERMINISTIC ~1/5 name-hash sample (r10, per the
r9 verdict: the full 287-query sweep measured ~26 min of a 38-min suite and
the driver's pytest window truncated mid-run, reporting tests_ok=false on a
green tree). BROOKLIN_FULL_PARITY=1 (or BROOKLIN_SLOW_TESTS=1) restores the
full sweep — the round-end ritual and any query-touching change must run it.
The driver independently hash-checks its own 50-query sample, so default
coverage is sample+sample, not sample-only."""

from __future__ import annotations

import hashlib
import os

import pytest

from brooklin_spark import registry
from tests.oracle import compare, duck_connection

registry.load_all()

_ALL = sorted(registry.ORACLES)

#: DuckDB-side heavyweights (measured r10 full-sweep: 258 + 235 + 196 + 87
#: + 62 s — 15 min of the 38-min suite in five tests); full-sweep only
_HEAVY = {
    "text_bpe_encode_stats",
    "embedding_kcenter_coreset",
    "text_bpe_vocab_stats",
    "text_bpe_train",
    "embedding_quality_probe_eval",
}

if os.environ.get("BROOKLIN_FULL_PARITY") == "1" or (
    os.environ.get("BROOKLIN_SLOW_TESTS") == "1"
):
    _NAMES = _ALL
else:
    _NAMES = [
        n
        for n in _ALL
        if n not in _HEAVY
        and int(hashlib.md5(n.encode()).hexdigest(), 16) % 5 == 0
    ]


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
