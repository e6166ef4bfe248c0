"""Query registry: names -> (Spark callable, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2) registers here; the driver
contract (__spark_entry__.py) just re-exports these dicts. Queries without an
oracle (non-SQL-expressible streaming/stateful ops) register with sql=None and
get the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query-defining module (idempotent)."""
    from brooklin_spark.queries import (  # noqa: F401
        analytics,
        cdc,
        curation,
        dedup,
        multimodal,
        pandas_udfs,
        pyds_queries,
        quality_model,
        relational,
        serde_queries,
        similarity,
        streaming,
        text,
        timeseries,
        tpch_extra,
        tpch_more,
    )
