#!/usr/bin/env python
"""Scale-headline benchmark: time the data-cost query families at a given
SF dir on BOTH engines, so the 100x design claims are measured rather than
argued from plan shapes (VERDICT r4 next-round #1).

  python scripts/scale_bench.py spark benchdata/sf10 [out.json]
  python scripts/scale_bench.py duck  benchdata/sf10 [out.json]

Spark timings are best-of-N noop-sink materializations after an sf0.001
warmup (bench.py discipline). DuckDB runs each registered oracle with a
watchdog that interrupts after $SCALE_BENCH_TIMEOUT seconds (default 900)
— a timed-out query records {"timeout": limit} instead of a number, which
the scaling table reports as ">limit".
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the scale-headline set: every family whose cost scales with DATA (the
#: shapes that decide the 100 TB story), plus the TPC-H spine for joins.
SCALE_QUERIES = [
    # TPC-H spine
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_local_supplier_volume",
    "q10_returned_items",
    # fuzzy/semantic dedup
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_srp_pairs",
    "dedup_embedding_cosine",      # exact all-pairs — quadratic by DEFINITION
    "dedup_incremental_new_vs_base",
    "dedup_incremental_persisted_index",
    # ANN / embeddings
    "ann_brute_force_topk",
    # build-once/query-many: the probe measurement must not pay the
    # per-run index build (r5 verdict item 4) — same oracle, same answers
    "ann_ivf_topk_persisted",
    "ann_ivfpq_topk",
    "ann_pq_adc_topk",
    "ivf_kmeans_refine",
    # graph
    "graph_pagerank_influence",
    "graph_label_propagation",
    "graph_nhop_reach",
    # text / curation pipelines
    "text_bpe_train",
    "text_dup_span_coverage",
    "text_hashing_tf",
    "corpus_e2e_pipeline",
    # the r5 hot-key fix, proven at scale
    "multimodal_video_near_dup",
    # r5 second-session additions (each cost scales with data)
    "dedup_semdedup_kmeans",        # corpus-adaptive cluster count
    "corpus_dsir_weights",          # vocab-keyed LM-ratio scoring
    "corpus_token_budget_select",   # distrank exact global prefix sum
    "dedup_cluster_size_weights",   # pair/CC path + corpus-keyed weight join
    # (r7) bm25/hybrid's bench identity is the persisted-index probe —
    # same oracles; the ad-hoc corpus-pass twins stay registered but
    # re-pay the index build per query by design
    "text_bm25_search_persisted",   # inverted-file probe (build amortized)
    "text_hybrid_rrf_search_persisted",
    "graph_triangle_census",        # degree-oriented wedge join
    "dedup_prefix_filter_jaccard",  # exact PPJoin prefix-filter join
    # r9: the two sf0.1-flagged rows — their adjudication IS this scale
    # book (multi-stage DAG latency at toy SF; data cost decides here)
    "graph_kcore_bounded",
    "sessions_concurrency_overlap",
    # r9 verdict item 6: fertility's 2.1x at sf10 — the one-pass byte-run
    # kernel's scale row lives here
    "text_tokenizer_fertility",
    # r9 second wave: the data-scaled new operators (the rest of the wave
    # is aggregate-scale or capped-sample by construction)
    "graph_modularity_score",
    "graph_common_neighbor_linkpred",
    "dedup_threshold_survivor_curve",
    "text_idf_drift",
    "text_sentence_stats",
    # r9 fourth wave: the data-scaled members (MMR/Benford/rate-shift are
    # pool- or grid-scale by construction and stay out)
    # r9-opt: the last two non-adjudicated sf0.1 flag rows — like
    # kcore/overlap above, their adjudication is this scale book (both are
    # multi-stage latency floors at toy SF; data cost decides at sf1)
    "graph_assortativity",
    "graph_hits_authorities",       # 3x2 fact-joins against the pair table
    "orders_cohort_ltv",            # custkey agg + join-back + grid cumsum
    "text_term_burstiness",         # corpus explode -> doc-term -> term
    "text_kneser_ney_bigram",       # corpus bigram explode -> type table
    "events_count_min_sketch",      # 4x fact explode, map-side combine
    "events_hash_bootstrap_means",  # 32x fact explode, map-side combine
    "window_range_7day_spend",      # fact-scale RANGE frame window
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# optional comma-separated substring filter, e.g.
#   SCALE_BENCH_ONLY=semdedup,dsir python scripts/scale_bench.py ...
_only = os.environ.get("SCALE_BENCH_ONLY")
if _only:
    subs = [s.strip() for s in _only.split(",") if s.strip()]
    SCALE_QUERIES = [q for q in SCALE_QUERIES if any(s in q for s in subs)]


def run_spark(sf_dir: str) -> dict:
    from brooklin_spark import registry
    from brooklin_spark.session import get_spark

    registry.load_all()
    runs = int(os.environ.get("SCALE_BENCH_RUNS", "2"))
    spark = get_spark(app_name="scale-bench")
    warm = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    for name in SCALE_QUERIES:
        try:
            registry.QUERIES[name](spark, warm).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # pragma: no cover
            print(f"  warmup {name} failed: {e}", file=sys.stderr)
    spark.catalog.clearCache()
    import gc

    timings: dict = {}
    for name in SCALE_QUERIES:
        fn = registry.QUERIES[name]
        best = float("inf")
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            print(f"  {name}: {best:.3f}s", file=sys.stderr)
        except Exception as e:  # pragma: no cover - record, keep going
            timings[name] = {"error": str(e).splitlines()[0][:160]}
            print(f"  {name}: ERROR {e}", file=sys.stderr)
            # a kernel-OOM'd JVM takes the py4j gateway with it and every
            # later query would "fail"; detect the dead gateway and
            # restart the session so one bad query costs one row
            try:
                spark.range(1).count()
            except Exception:
                print("  JVM dead — restarting session", file=sys.stderr)
                from pyspark.sql import SparkSession

                SparkSession._instantiatedSession = None  # noqa: SLF001
                SparkSession._activeSession = None  # noqa: SLF001
                spark = get_spark(app_name="scale-bench")
        gc.collect()
        try:
            spark.catalog.clearCache()
        except Exception:  # pragma: no cover
            pass
    return timings


def run_duck(sf_dir: str) -> dict:
    import duckdb

    from brooklin_spark import registry

    registry.load_all()
    limit = float(os.environ.get("SCALE_BENCH_TIMEOUT", "900"))
    runs = int(os.environ.get("SCALE_BENCH_RUNS", "2"))
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    timings: dict = {}
    for name in SCALE_QUERIES:
        sql = registry.ORACLES.get(name)
        if sql is None:
            continue
        best = float("inf")
        timed_out = False
        for _ in range(runs):
            done = threading.Event()

            def watchdog():
                if not done.wait(limit):
                    con.interrupt()

            w = threading.Thread(target=watchdog, daemon=True)
            w.start()
            t0 = time.perf_counter()
            try:
                con.sql(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            except Exception:
                timed_out = True
            finally:
                done.set()
            if timed_out:
                break
        if timed_out:
            timings[name] = {"timeout": limit}
            print(f"  {name}: TIMEOUT >{limit}s", file=sys.stderr)
        else:
            timings[name] = round(best, 3)
            print(f"  {name}: {best:.3f}s", file=sys.stderr)
    return timings


def main() -> None:
    engine, sf_dir = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    timings = run_spark(sf_dir) if engine == "spark" else run_duck(sf_dir)
    total = round(
        sum(v for v in timings.values() if isinstance(v, (int, float))), 3
    )
    doc = {"engine": engine, "sf_dir": sf_dir, "total": total, "queries": timings}
    line = json.dumps(doc)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
