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

__all__ = [
    "DEC",
    "dec",
    "one_minus",
    "one_plus",
    "dsum",
    "cents",
    "c4_to_double",
    "c4sum",
]

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


# -- integer-cents fast path -------------------------------------------------
# DECIMAL(12,2) x DECIMAL(12,2) products have precision 25 — beyond Spark's
# compact-long Decimal (<=18), so every row pays a JVM BigDecimal multiply.
# The SAME exact value is an int64 multiply when money rides as 1e2-scaled
# longs; partial sums stay long (whole-stage-codegen primitives) and only
# the final per-group conversion touches decimal. Measured at sf10 on the
# bucketed spine: q5 8.9 -> 7.5 s, q10 3.2 -> 2.2 s, bit-identical results
# (scripts/spine_fastsum.py, mismatch: [] on both layouts).


def cents(col, scale: int = 100) -> Column:
    """Money double -> exact 1e2-scaled long, in codegen primitives.

    F.round(double) routes through BigDecimal per row (the cost this path
    removes); monetary doubles carry <=2 decimals so x*100 sits within
    ~1e-9 of an integer and floor(x*100 + 0.5) — a multiply, an add and a
    truncating cast — recovers it exactly (1e-9 << 0.5 margin)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c * scale + F.lit(0.5)).cast("long")


def c4_to_double(total_col: Column, alias: str, scale: int = 10000) -> Column:
    """Convert an ALREADY-SUMMED 1e4-scaled long total to double, exactly
    (decimal division, one correctly-rounded decimal->double cast). For
    groups whose long sum is bounded by construction (per-order line
    counts, per-partition partials) — the conversion runs once per GROUP,
    never per row."""
    return (
        (total_col.cast("decimal(38,0)") / F.lit(scale)).cast("double").alias(alias)
    )


def c4sum(partial_col: Column, alias: str) -> Column:
    """Final aggregate over 1e4-scaled long partials, surfaced as double.

    The partials are cast to decimal BEFORE this sum (a group's total may
    exceed int64 at extreme scale even though each bounded-size partial
    cannot — the overflow discipline lives at the partial boundary); the
    decimal division keeps the value exact (scale >= 4) and the single
    decimal->double cast is correctly rounded — the same one cast the
    dsum policy ends with, so results stay bit-identical to it."""
    return (
        (F.sum(partial_col.cast("decimal(38,0)")) / F.lit(10000))
        .cast("double")
        .alias(alias)
    )
