"""Skew mitigation operators.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on in session.py)
handles sort-merge skew automatically at runtime; manual salting remains
the tool when the engine can't re-plan — e.g. a key whose rows must meet
one reducer anyway, or pre-AQE engines. Provided here as a first-class
operator so pipelines can opt in explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate the small side ``salt_buckets``×,
    give each big-side row a deterministic salt, and join on
    (key, salt) — one hot key now spreads across ``salt_buckets`` reducers
    instead of melting one.

    The salt is a hash of the whole big-side row (deterministic → resumable
    plans, no Math.random in the DAG). The shuffle-hash hint pins the
    shuffled-join path — with a broadcastable small side you'd skip salting
    entirely, so the hint makes the operator demonstrate/exercise the case
    it exists for.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)
    ).cast("int")
    b = big.withColumn("_salt_b", salt)
    s = small.withColumn(
        "_salt_s", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = b.join(
        s.hint("shuffle_hash"),
        (F.col(big_key) == F.col(small_key)) & (F.col("_salt_b") == F.col("_salt_s")),
        how,
    )
    return joined.drop("_salt_b", "_salt_s")
