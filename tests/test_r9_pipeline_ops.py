"""Round-9 unit tests: atomic_publish multi-marker + TOCTOU semantics.

Pure-filesystem tests (no Spark session) for brooklin_spark.io.atomic_publish,
covering the two r8 advisor findings:
- a multi-part index (BM25: postings + stats) is only COMPLETE when every
  part's _SUCCESS marker exists — a legacy build that crashed between parts
  must be cleared, not kept;
- a complete dir grabbed in the clear-stale rename window is restored, not
  deleted (TOCTOU guard).
"""

from __future__ import annotations

import os

import pytest

from brooklin_spark.io import atomic_publish

MARKERS = [os.path.join("postings", "_SUCCESS"), os.path.join("stats", "_SUCCESS")]


def _mkindex(d: str, *, markers=MARKERS, payload: str = "x") -> None:
    for rel in markers:
        os.makedirs(os.path.join(d, os.path.dirname(rel)), exist_ok=True)
        with open(os.path.join(d, rel), "w") as fh:
            fh.write("")
    with open(os.path.join(d, "payload.txt"), "w") as fh:
        fh.write(payload)


def _payload(d: str) -> str:
    with open(os.path.join(d, "payload.txt")) as fh:
        return fh.read()


def test_publish_fresh(tmp_path):
    tmp = str(tmp_path / "build.1")
    idx = str(tmp_path / "idx")
    _mkindex(tmp, payload="fresh")
    atomic_publish(tmp, idx, success_rel=MARKERS)
    assert _payload(idx) == "fresh"
    assert not os.path.exists(tmp)


def test_loser_keeps_served_complete_index(tmp_path):
    idx = str(tmp_path / "idx")
    _mkindex(idx, payload="served")
    tmp = str(tmp_path / "build.2")
    _mkindex(tmp, payload="loser")
    atomic_publish(tmp, idx, success_rel=MARKERS)
    assert _payload(idx) == "served"  # complete index never replaced
    assert not os.path.exists(tmp)  # loser's build discarded


def test_halfbuilt_legacy_dir_is_cleared(tmp_path):
    """postings/_SUCCESS alone must NOT count as complete (r8 advice)."""
    idx = str(tmp_path / "idx")
    _mkindex(idx, markers=MARKERS[:1], payload="half")  # no stats/_SUCCESS
    tmp = str(tmp_path / "build.3")
    _mkindex(tmp, payload="good")
    atomic_publish(tmp, idx, success_rel=MARKERS)
    assert _payload(idx) == "good"  # half-built legacy dir replaced


def test_single_marker_backcompat(tmp_path):
    idx = str(tmp_path / "idx")
    tmp = str(tmp_path / "build.4")
    _mkindex(tmp, markers=["_SUCCESS"], payload="one")
    atomic_publish(tmp, idx)  # default success_rel="_SUCCESS" (str form)
    assert _payload(idx) == "one"


def test_toctou_complete_dir_in_trash_is_restored(tmp_path, monkeypatch):
    """If a concurrent builder publishes a COMPLETE index between our
    incompleteness check and our clear-stale rename, the grabbed dir must be
    restored at idx, not rmtree'd (r8 advice)."""
    import brooklin_spark.io as bio

    idx = str(tmp_path / "idx")
    _mkindex(idx, markers=MARKERS[:1], payload="stale")  # looks incomplete
    tmp = str(tmp_path / "build.5")
    _mkindex(tmp, payload="ours")

    real_rename = os.rename
    state = {"swapped": False}

    def racing_rename(src, dst):
        # intercept the clear-stale rename (idx -> trash): just before it
        # fires, a "concurrent builder" replaces idx with a COMPLETE index
        if src == idx and ".trash." in dst and not state["swapped"]:
            state["swapped"] = True
            import shutil

            shutil.rmtree(idx)
            _mkindex(idx, payload="concurrent")
        return real_rename(src, dst)

    monkeypatch.setattr(bio.os, "rename", racing_rename)
    atomic_publish(tmp, idx, success_rel=MARKERS)
    # the concurrent builder's complete publish survives (either restored
    # from trash, or ours lost cleanly to it) — idx is complete either way
    assert os.path.exists(os.path.join(idx, MARKERS[1]))
    assert _payload(idx) in ("concurrent", "ours")
    assert not os.path.exists(tmp)
    leftovers = [d for d in os.listdir(tmp_path) if ".trash." in d]
    assert leftovers == []


def test_negative_doc_id_hash_parity():
    """pmod-normalized split-multiply hash == (doc_id*MULT) mod 2^32 for
    negative ids too (r8 advice made the 'ANY int64' comment true)."""
    import duckdb

    from brooklin_spark.queries.curation import _SRC_CAP_HV_SQL, _SRC_CAP_MULT

    con = duckdb.connect()
    for d in [-1, -3_470_000_000, -(2**62) - 7, 0, 5, 2**62]:
        got = con.execute(
            f"SELECT {_SRC_CAP_HV_SQL.replace('doc_id', 'CAST(? AS BIGINT)')}",
            [d] * _SRC_CAP_HV_SQL.count("doc_id"),
        ).fetchone()[0]
        assert got == (d * _SRC_CAP_MULT) % 2**32, d


# ---------------------------------------------------------------------------
# Round-9 second wave: properties of the new analytics/graph/text/
# multimodal queries (their value correctness is pinned by the DuckDB
# oracle gate; these tests pin the INVARIANTS the oracles can't state).
# ---------------------------------------------------------------------------

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from brooklin_spark import registry

settings.register_profile("r9_no_deadline", deadline=None)
settings.load_profile("r9_no_deadline")


@given(st.lists(st.booleans(), min_size=0, max_size=64))
def test_vad_run_length_kernel_matches_reference(mask):
    """The numpy RLE inside vad_segments must agree with a direct
    scan-based run encoder for every activity mask."""
    active = np.array(mask, dtype=bool)
    # kernel arithmetic (copied shape from operators/multimodal.py)
    edges = np.diff(active.astype(np.int8))
    starts = int(active[:1].sum()) + int((edges == 1).sum())
    run_lens = []
    if active.any():
        idx = np.flatnonzero(active)
        breaks = np.flatnonzero(np.diff(idx) > 1)
        run_lens = np.diff(np.concatenate(([0], breaks + 1, [idx.size]))).tolist()
    # reference: explicit scan
    ref_runs, cur = [], 0
    for a in mask:
        if a:
            cur += 1
        elif cur:
            ref_runs.append(cur)
            cur = 0
    if cur:
        ref_runs.append(cur)
    assert starts == len(ref_runs)
    assert sorted(run_lens) == sorted(ref_runs)
    assert sum(run_lens) == int(active.sum())


def test_modularity_bounds_and_edge_consistency(spark, sf_smoke):
    """Q is bounded in [-0.5, 1] and the integer census (nodes/edges)
    matches the label-propagation query's own graph."""
    registry.load_all()
    row = registry.QUERIES["graph_modularity_score"](spark, sf_smoke).collect()[0]
    assert -0.5 <= row.modularity <= 1.0
    assert row.n_communities <= row.n_nodes
    lp = registry.QUERIES["graph_label_propagation"](spark, sf_smoke)
    agg = lp.agg(F.sum("n_members"), F.count("*")).collect()[0]
    assert agg[0] == row.n_nodes  # same vertex set
    assert agg[1] == row.n_communities  # same community count


def test_threshold_curve_is_monotone(spark, sf_smoke):
    """Raising the threshold can only shrink the qualifying pair set and
    grow the survivor set."""
    registry.load_all()
    rows = sorted(
        registry.QUERIES["dedup_threshold_survivor_curve"](spark, sf_smoke).collect(),
        key=lambda r: r.threshold,
    )
    for lo, hi in zip(rows, rows[1:]):
        assert hi.n_pairs <= lo.n_pairs
        assert hi.n_dropped <= lo.n_dropped
        assert hi.n_survivors >= lo.n_survivors
        assert lo.n_dropped + lo.n_survivors == rows[0].n_dropped + rows[0].n_survivors


def test_linkpred_candidates_are_nonedges(spark, sf_smoke):
    """No predicted link may already be a co-purchase edge, and scores
    must be >= 2 in rank order."""
    registry.load_all()
    pred = registry.QUERIES["graph_common_neighbor_linkpred"](spark, sf_smoke)
    rows = pred.collect()
    # rebuild the edge set the query's own way (support >= 2 pairs)
    from brooklin_spark.io import table

    li = table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    edge_rows = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .select("pa", "pb")
        .collect()
    )
    edges = {(r.pa, r.pb) for r in edge_rows}
    scores = [r.common_neighbors for r in sorted(rows, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert (r.part_a, r.part_b) not in edges
        assert r.common_neighbors >= 2


def test_markov_stationary_is_distribution(spark, sf_smoke):
    """After 6 row-stochastic iterations the vector still sums to 1
    (up to the documented per-round rounding) and is non-negative."""
    registry.load_all()
    rows = registry.QUERIES["events_markov_stationary"](spark, sf_smoke).collect()
    total = sum(r.stationary_prob for r in rows)
    assert abs(total - 1.0) < 1e-3
    assert all(r.stationary_prob >= 0 for r in rows)


def test_mrl_recall_curve_shape(spark, sf_smoke):
    """One row per truncated width, recalls in [0, 1], probe count
    bounded by the sample size."""
    registry.load_all()
    from brooklin_spark.queries.similarity import _MRC_DIMS, _MRC_Q

    rows = registry.QUERIES["embedding_mrl_recall_curve"](spark, sf_smoke).collect()
    assert sorted(r.dim for r in rows) == sorted(_MRC_DIMS)
    for r in rows:
        assert 0.0 <= r.avg_recall <= 1.0
        assert r.n_queries <= _MRC_Q
