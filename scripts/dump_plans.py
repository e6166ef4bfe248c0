#!/usr/bin/env python
"""Regenerate PLANS.md: captured physical plans for headline queries.

Run after changing any headline operator so the in-repo plan snapshots
stay honest; tests/test_plan_quality.py asserts the same properties
mechanically, this file makes them reviewable."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from brooklin_spark import registry  # noqa: E402
from brooklin_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

PICKS = [
    ("q5_local_supplier_volume", "five-way star join: every dim broadcast, fact never sort-merged"),
    ("q1_pricing_summary", "scan-heavy aggregate: pushdown + pruning + partial/final HashAggregate"),
    ("dedup_minhash_lsh", "banded LSH: Arrow signature kernel, tuple band join, candidates-first verify"),
    ("dedup_simhash", "one-pass banding with inline bit_count(xor) verify"),
    ("ann_brute_force_topk", "no join: broadcast-matrix mapInPandas + windowed global top-k"),
    ("dedup_embedding_srp_pairs", "single bucket-keyed shuffle + per-bucket matmul"),
    ("topk_expensive_orders", "TakeOrderedAndProject, never a global sort"),
    # round-3 additions
    ("dedup_embedding_cosine", "exact all-pairs via block tiling: one (b_lo,b_hi)-keyed shuffle, per-tile matmul, no driver collect"),
    ("dedup_ngram_jaccard", "single-pass exploded-row shingle kernel, windowed-cap self-join"),
    ("embedding_pq_codes", "product quantization: codebook in closure, shuffle-free mapInPandas"),
    ("pack_sequences", "per-shard running-sum window, one partitioned exchange"),
    ("ivf_kmeans_refine", "fused assign+partial-reduce kernel per Lloyd round, k*d-row shuffle"),
    # round-3 second-session additions
    ("ann_pq_adc_topk", "ADC search: LUT in closure, map-only scoring, single rank-window exchange"),
    ("corpus_filter_pipeline", "C4/Gopher verdicts: one scan, one projection, zero exchanges"),
    ("graph_pagerank_influence", "five lazy join-agg rounds fused into one DAG over checkpointed graph tables"),
    ("layout_zorder_stats", "Morton interleave: broadcast bounds, integer bit arithmetic, one agg exchange"),
    ("source_chunked_snapshot", "Python DataSource scan: per-shard partitions, DB-side hash + pushed filter"),
    ("basket_part_affinity", "in-order self-join bounded by basket size, broadcast frequency sides"),
    # round-4 additions
    ("corpus_shard_manifest", "distributed exact global rank (distrank): range repartition + local ranks + broadcast carry-in offsets; no fact-scale SinglePartition window"),
    ("customers_rfm_segments", "three distributed ntile scores over thin projections, rejoined on custkey; zero unpartitioned windows over the customer population"),
    # round-4 third-session additions
    ("text_dup_span_coverage", "one Arrow span kernel consumed once: dup flag via window-over-hash (no groupBy+semi-join double kernel eval), per-doc interval-union window"),
    ("dedup_incremental_new_vs_base", "probe-vs-base bipartite LSH: band-tuple equi-join, candidate-only verify, fp semi-join"),
    ("graph_label_propagation", "bounded 2-round min-label: distinct order-part before the pair self-join, checkpointed edge table feeds both rounds"),
    ("events_autocorrelation", "window-free lag-k ACF: checkpointed daily aggregate self-joined on day arithmetic, exact decimal moments"),
    ("source_avro_ocf_split", "splittable Python DataSource scan: byte-range partitions, sync-marker scan, block-start ownership"),
    # round-5 additions
    ("dedup_semdedup_kmeans", "SemDeDup: shuffle-free centroid-matmul assignment, ONE cid-keyed exchange, per-cluster keep flags emitted directly (pairs never materialize)"),
    ("corpus_token_budget_select", "quality-ranked budget prefix: distrank exact global running sum (range repartition + carry-in), |sources|-row report"),
    ("corpus_dsir_weights", "DSIR: one checkpointed tokenize pass feeds vocab stats AND tf; vocab-keyed scoring join; exact decimal per-doc dot product"),
    ("text_hybrid_rrf_search", "RRF fusion: two top-L lists (TakeOrdered / per-batch local top-k), full-outer join over <= 2L rows"),
    ("dedup_prefix_filter_jaccard", "PPJoin prefix filter: rare-first per-doc prefix window, prefix-only candidate join, exact array-intersect verify — no recall cap"),
    ("graph_triangle_census", "degree-oriented wedge join: out-degree bounded O(sqrt(E)) by orientation, semi-join closure, scalar census row"),
    # round-7 second-session additions
    ("corpus_source_cap", "per-source cap via grouped distributed rank: range repartition over (source, hash), broadcast per-source min-rank offsets — no partitionBy(source) skew window"),
    ("ann_mrl_funnel_topk", "MRL funnel: ONE corpus kernel pass emits prefix AND full scores for its local shortlist; two bounded windows rank O(C·partitions·queries) rows — rerank never rescans"),
]


def main() -> None:
    registry.load_all()
    spark = get_spark(app_name="dump-plans")
    out = [
        """# PLANS — captured physical plans for headline queries

Generated by `python scripts/dump_plans.py` at sf0.01 (plan shapes are
scale-invariant; AQE re-sizes at runtime). These are the artifacts the
plan-quality tests assert on — kept in-repo so the shapes can be reviewed
without executing anything.
"""
    ]
    for name, why in PICKS:
        df = registry.QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        tree = plan.split("\n\n")[0]
        out.append(f"## {name}\n\n{why}\n\n```\n{tree}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
