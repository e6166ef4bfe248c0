"""Heavy hitters: Misra-Gries candidate sketch + exact recount, with a
provable-exactness guard.

Exact top-k-by-frequency via plain `groupBy(key).count()` shuffles one
partial-aggregate row per DISTINCT key — at 100 TB with billions of
distinct keys (URLs, user agents, shingles) the shuffle is key-cardinality
scaled even though only k rows are wanted. The classic sub-linear shape:

1. **Candidate pass** — per input partition, a Misra-Gries summary of
   capacity m (`mapInPandas`, one counter dict per partition across its
   Arrow batches; batched decrements preserve the MG bound — each uniform
   decrement of d retires d*(m+1) input units, so total decrements
   D <= N/(m+1)). Any key absent from EVERY partition summary therefore
   has global count <= N/(m+1). The summary union is <= P*(m+1) rows —
   bounded by partition count, NOT key cardinality — and is
   localCheckpointed once because BOTH readers below (total-rows scalar,
   candidate set) must see the same evaluation (multi-reader discipline,
   cf. operators/distrank.py).
2. **Exact recount** — broadcast-semi-join the candidate set onto the
   input and `groupBy(key).count()` only surviving rows: the shuffle now
   carries at most P*m partial rows.
3. **Exactness guard** — the recount's k-th highest count (k scalar rows
   read driver-side) is compared to the N/(m+1) bound: if
   kth_count > N/(m+1), every non-candidate is STRICTLY below the k-th
   candidate and the top-k (with a total-order tie-break) is provably
   exact. Otherwise the sketch was inconclusive for this distribution
   (near-uniform keys / undersized m) and the operator FALLS BACK to the
   exact full groupBy — correctness never degrades, only the
   shuffle-size win does. Callers size m to their skew: the guard needs
   the k-th hitter to own > 1/(m+1) of all rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _mg_partition(batches: Iterator[pd.DataFrame], capacity: int) -> Iterator[pd.DataFrame]:
    """Misra-Gries over one partition's batches: emit surviving candidate
    keys plus one sentinel row (key NULL) carrying the partition row count."""
    counters: dict = {}
    n_rows = 0
    for pdf in batches:
        col = pdf.iloc[:, 0]
        n_rows += len(col)
        for key, cnt in col.value_counts().items():
            if key in counters:
                counters[key] += int(cnt)
            elif len(counters) < capacity:
                counters[key] = int(cnt)
            else:
                dec = min(min(counters.values()), int(cnt))
                counters = {k: v - dec for k, v in counters.items() if v > dec}
                if cnt > dec:
                    counters[key] = int(cnt) - dec
    # object dtype end-to-end: Arrow casts to the declared key type without
    # the float64 round-trip a None-in-int64 concat would force
    keys = pd.Series(list(counters.keys()) + [None], dtype=object)
    yield pd.DataFrame(
        {"key": keys, "part_rows": [0] * (len(keys) - 1) + [n_rows]}
    )


def top_k_exact(df: DataFrame, key: str, k: int, capacity: int = 4096) -> DataFrame:
    """Exact top-k keys of ``df[key]`` by frequency, candidate-pruned when
    provable. Result is identical to
    ``GROUP BY key ORDER BY cnt DESC, key LIMIT k`` (ascending-key
    tie-break) whether or not the sketch concludes."""
    ktype = df.schema[key].dataType.simpleString()
    keyed = df.select(F.col(key).alias("key"))
    sketch = keyed.mapInPandas(
        lambda it: _mg_partition(it, capacity),
        schema=f"key {ktype}, part_rows bigint",
    ).localCheckpoint()
    n_total = sketch.filter(F.col("key").isNull()).agg(
        F.sum("part_rows")
    ).collect()[0][0] or 0
    bound = n_total / (capacity + 1)

    cands = sketch.filter(F.col("key").isNotNull()).select("key").distinct()
    recount = (
        keyed.join(F.broadcast(cands), "key")
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
    )
    kth = recount.collect()
    if len(kth) == k and kth[-1]["cnt"] > bound:
        # provably exact: every non-candidate count <= N/(m+1) < kth count
        return df.sparkSession.createDataFrame(kth, schema=f"key {ktype}, cnt bigint")
    # inconclusive sketch: exact full-aggregation path
    return (
        keyed.groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
    )
