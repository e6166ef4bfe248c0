#!/usr/bin/env python
"""A/B ann_ivfpq_topk: current ivfpq_topk (6 driver collects, m broadcast
LUT joins) vs a variant that (a) collects centroids/queries/codebook ONCE
each and derives the normalized twins in numpy (bit-identical — the
normalization is the same numpy op _collect_matrix applies post-collect),
and (b) replaces the m per-subspace broadcast LUT joins with ONE literal
map<query_id, array<double>> lookup (Q*m*k doubles — broadcast-small by
the same contract that lets the LUT be driver-built at all).

  python scripts/r9_ivfpq_ab.py /root/testdata/sf0.1 [reps]
"""
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from brooklin_spark.io import table
from brooklin_spark.operators.similarity import _collect_matrix_raw
from brooklin_spark.queries.similarity import (
    _IVF_C,
    _IVF_NPROBE,
    _PQ_K,
    _PQ_M,
    ann_ivfpq_topk,
)
from brooklin_spark.session import get_spark


def ivfpq_topk_b(
    queries,
    corpus,
    centroids,
    codebook,
    m=4,
    k=16,
    nprobe=2,
    topk=5,
    id_col="vec_id",
    vec_col="embedding",
):
    spark = corpus.sparkSession
    # ONE collect per small side; normalized twins derived in numpy
    # (identical op to _collect_matrix's post-collect normalization)
    c_ids, cm_raw = _collect_matrix_raw(centroids, id_col, vec_col)
    cn = np.linalg.norm(cm_raw, axis=1)
    cn[cn == 0] = 1.0
    cm = cm_raw / cn[:, None]
    q_ids, qraw = _collect_matrix_raw(queries, id_col, vec_col)
    qn = np.linalg.norm(qraw, axis=1)
    qn[qn == 0] = 1.0
    qm = qraw / qn[:, None]
    cb_rows = codebook.orderBy(id_col).limit(k).select(id_col, vec_col).collect()
    cb_rows.sort(key=lambda r: r[0])
    cb = np.array([list(r[1]) for r in cb_rows], dtype=np.float64)
    D = cb.shape[1]
    if D % m:
        raise ValueError(f"dim {D} not divisible by m={m}")
    d_sub = D // m

    def _fused(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            raw = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.linalg.norm(raw, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = np.round((raw / norms) @ cm.T, 6)
            out = {
                "vec_id": ids,
                "cid": np.array(
                    [c_ids[np.lexsort((c_ids, -row))[0]] for row in sims],
                    dtype=np.int64,
                ),
            }
            for j in range(m):
                sub = raw[:, j * d_sub : (j + 1) * d_sub]
                csub = cb[:, j * d_sub : (j + 1) * d_sub]
                diff = sub[:, None, :] - csub[None, :, :]
                d2 = np.round((diff * diff).sum(-1), 6)
                out[f"c{j}"] = d2.argmin(axis=1).astype(np.int32)
            yield pd.DataFrame(out)

    index = corpus.select(id_col, vec_col).mapInPandas(
        _fused,
        schema="vec_id bigint, cid bigint, "
        + ", ".join(f"c{j} int" for j in range(m)),
    )

    qsims = np.round(qm @ cm.T, 6)
    probes = spark.createDataFrame(
        [
            (int(qid), int(c_ids[j]))
            for i, qid in enumerate(q_ids)
            for j in np.lexsort((c_ids, -qsims[i]))[:nprobe]
        ],
        "query_id bigint, cid bigint",
    )

    # per-query LUT as ONE literal map<bigint, array<double>>: entry
    # [j*k + code] = ||q_sub_j - codeword_code_sub_j||^2 (rounded 6)
    lut = np.zeros((len(q_ids), m, k))
    for j in range(m):
        diff = qraw[:, None, j * d_sub : (j + 1) * d_sub] - cb[
            None, :, j * d_sub : (j + 1) * d_sub
        ]
        lut[:, j, :] = np.round((diff * diff).sum(-1), 6)
    map_args = []
    for i, qid in enumerate(q_ids):
        map_args.append(F.lit(int(qid)))
        map_args.append(F.array(*[F.lit(float(x)) for x in lut[i].ravel()]))
    lut_map = F.create_map(*map_args)

    cand = (
        F.broadcast(probes)
        .join(index, "cid")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumnRenamed("vec_id", "neighbor_id")
    )
    arr = F.element_at(lut_map, F.col("query_id"))
    adc = sum(
        F.element_at(arr, F.col(f"c{j}") + F.lit(j * k + 1)) for j in range(m)
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round(adc, 6).alias("adc_dist")
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
    )


def variant_b(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cent = emb.filter(F.col("vec_id") < _IVF_C)
    cb = emb.filter(F.col("vec_id") < _PQ_K)
    return ivfpq_topk_b(
        queries, emb, cent, cb, m=_PQ_M, k=_PQ_K, nprobe=_IVF_NPROBE, topk=5
    )


def hygiene(spark):
    gc.collect()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def timed(spark, df):
    hygiene(spark)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main():
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    spark.sparkContext.setJobDescription("r9_ivfpq_ab")

    a = ann_ivfpq_topk(spark, sf_dir).toPandas()
    b = variant_b(spark, sf_dir).toPandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    if not a.equals(b):
        print("A:\n", a.head(40), "\nB:\n", b.head(40))
        raise SystemExit("VALUE MISMATCH")
    print(f"values equal: {len(a)} rows (exact, incl. float bits)", flush=True)

    times = {"A": [], "B": []}
    for r in range(reps):
        for name, fn in [("A", ann_ivfpq_topk), ("B", variant_b)]:
            dt = timed(spark, fn(spark, sf_dir))
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
