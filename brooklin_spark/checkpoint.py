"""Partitioning-preserving localCheckpoint for iterative model tables.

Under AQE, ``Dataset.localCheckpoint`` records ``UnknownPartitioning``
(the adaptive wrapper hides the final partitioning at checkpoint time),
so a downstream stage that could ride the checkpoint's existing hash
clustering re-exchanges instead — measured as one full-table shuffle per
iteration in the PageRank rounds (edge table) and the BPE rounds (word
table). Executing the eager checkpoint with AQE disabled for exactly
that one job keeps the ``HashPartitioning`` on the resulting LogicalRDD;
Spark's ``EnsureRequirements`` then accepts it for any window/aggregate
whose clustering keys are a superset of the partitioning keys.

Use ONLY for tables an iteration re-reads clustered on a stable key; a
one-shot checkpoint gains nothing from losing AQE on its build job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_partitioned(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint whose output KEEPS the plan's partitioning."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
