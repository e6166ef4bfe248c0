from __future__ import annotations

import os

import pytest

from brooklin_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: >30 s single tests, skipped unless BROOKLIN_SLOW_TESTS=1 — "
        "the driver's default `pytest tests/` must finish well under its "
        "output window (r9 verdict item 2); the round-end ritual runs the "
        "full suite with BROOKLIN_SLOW_TESTS=1 BROOKLIN_FULL_PARITY=1",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("BROOKLIN_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(reason="slow test — set BROOKLIN_SLOW_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="brooklin-spark-tests")
    yield s


SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct() -> str:
    return SF_CORRECT
