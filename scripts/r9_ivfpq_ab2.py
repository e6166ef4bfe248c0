#!/usr/bin/env python
"""Alternating bench-methodology A/B for the ivfpq LUT-map rewrite: times
CONSTRUCTION + noop execution (what bench.py measures — the old shape's 6
driver collects are part of its cost), old (pre-7315589) vs new
(registered), alternated rep-by-rep so host throttle bursts hit both
sides.

  python scripts/r9_ivfpq_ab2.py /root/testdata/sf0.1 [reps]
"""
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from brooklin_spark.io import table
from brooklin_spark.operators.similarity import (
    _collect_matrix,
    _collect_matrix_raw,
)
from brooklin_spark.queries.similarity import (
    _IVF_C,
    _IVF_NPROBE,
    _PQ_K,
    _PQ_M,
    ann_ivfpq_topk,
)
from brooklin_spark.session import get_spark

# the pre-rewrite implementation, verbatim from commit ab8227e
exec(open("/tmp/old_ivfpq_fn.py").read())


def variant_old(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cent = emb.filter(F.col("vec_id") < _IVF_C)
    cb = emb.filter(F.col("vec_id") < _PQ_K)
    return ivfpq_topk_old(  # noqa: F821  (exec'd above)
        queries, emb, cent, cb, m=_PQ_M, k=_PQ_K, nprobe=_IVF_NPROBE, topk=5
    )


def hygiene(spark):
    gc.collect()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def main():
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark()

    a = variant_old(spark, sf_dir).toPandas()
    b = ann_ivfpq_topk(spark, sf_dir).toPandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b), "VALUE MISMATCH"
    print(f"values equal: {len(a)} rows", flush=True)

    times = {"old": [], "new": []}
    for r in range(reps):
        for name, fn in [("old", variant_old), ("new", ann_ivfpq_topk)]:
            hygiene(spark)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"rep {r} {name}: {dt:.2f}s", flush=True)
    print(
        "RESULT",
        {k: round(min(v), 2) for k, v in times.items()},
        {k: [round(x, 2) for x in v] for k, v in times.items()},
        flush=True,
    )


if __name__ == "__main__":
    main()
