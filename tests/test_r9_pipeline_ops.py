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
