#!/usr/bin/env python
"""A/B: kcenter literal-path traversal — OLD (re-evaluate all r dots per
round off a growing-literal plan, re-scanning parquet) vs NEW (incremental
running-max msim on a lazily-checkpointed state, one dot per row per
round). Alternating reps in ONE session (host throttle hits both sides),
min-of-N reported, outputs compared exactly (float bits included).

Usage: python scripts/r9_kcenter_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from brooklin_spark import registry  # noqa: E402
from brooklin_spark.io import table  # noqa: E402
from brooklin_spark.queries import similarity as qs  # noqa: E402
from brooklin_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
K = qs._KC_K


def old_traverse(spark, emb, k):
    """The pre-r9s5 literal path, carried verbatim."""
    rows = []
    seed = emb.orderBy(F.asc("vec_id")).limit(1).first()
    selected = [(int(seed.vec_id), list(seed.embedding))]
    rows.append((0, int(seed.vec_id), None))

    def dot_to(vec):
        lit = F.array(*[F.lit(float(v)) for v in vec])
        return F.round(
            F.aggregate(
                F.zip_with(F.col("embedding"), lit, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    for r in range(1, k):
        taken = [i for i, _ in selected]
        sims = [dot_to(v) for _, v in selected]
        msim = F.greatest(*sims) if len(sims) > 1 else sims[0]
        pick = (
            emb.filter(~F.col("vec_id").isin(taken))
            .select("vec_id", "embedding", msim.alias("msim"))
            .orderBy(F.asc("msim"), F.asc("vec_id"))
            .limit(1)
            .first()
        )
        selected.append((int(pick.vec_id), list(pick.embedding)))
        rows.append((r, int(pick.vec_id), float(pick.msim)))
    return rows


def main() -> None:
    registry.load_all()
    spark = get_spark(app_name="kcenter-ab")
    emb = table(spark, SF, "embeddings").select("vec_id", "embedding")

    # warm both paths (codegen/JIT)
    old_traverse(spark, emb, K)
    qs._kcenter_traverse(spark, emb, K)

    def hygiene():
        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    olds, news = [], []
    rows_old = rows_new = None
    for i in range(REPS):
        for side in ("old", "new") if i % 2 == 0 else ("new", "old"):
            hygiene()
            t0 = time.perf_counter()
            if side == "old":
                rows_old = old_traverse(spark, emb, K)
                olds.append(time.perf_counter() - t0)
            else:
                rows_new = qs._kcenter_traverse(spark, emb, K)
                news.append(time.perf_counter() - t0)
        print(
            f"rep {i}: old {olds[-1]:.3f}s  new {news[-1]:.3f}s",
            flush=True,
        )

    assert rows_old == rows_new, (
        "VALUE MISMATCH\nold: %r\nnew: %r" % (rows_old, rows_new)
    )
    wins = sum(1 for o, n in zip(olds, news) if n < o)
    print(
        f"old min {min(olds):.3f}s  new min {min(news):.3f}s  "
        f"new wins {wins}/{len(olds)} pairings  values EQUAL ({len(rows_new)} rows)"
    )


if __name__ == "__main__":
    main()
