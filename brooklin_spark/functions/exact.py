"""Exact-arithmetic helpers for oracle-parity aggregates.

Monetary doubles in the testdata carry <=2 decimals; casting to
DECIMAL(12,2) before arithmetic makes sums exact and order-independent, so
Spark and any ANSI engine produce bit-identical results after a final cast
to DOUBLE. At 100 TB this also avoids the classic "parallel double sum is
nondeterministic across runs" problem for financial rollups.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,2)"


def dec(col) -> Column:
    """Cast a (2-decimal) double column to exact DECIMAL(12,2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def one_minus(col) -> Column:
    return F.lit(1).cast(DEC) - dec(col)


def one_plus(col) -> Column:
    return F.lit(1).cast(DEC) + dec(col)


def dsum(expr: Column, alias: str) -> Column:
    """Exact decimal sum, surfaced as double (bit-identical across engines)."""
    return F.sum(expr).cast("double").alias(alias)
