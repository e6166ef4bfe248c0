"""Physical-plan audit helpers: make plan-shape claims testable.

The scale story lives or dies in the physical plan — filters reaching the
parquet scan, small dims broadcast, no gratuitous shuffles, wide codegen
stages. These helpers parse `.explain("formatted")` output so tests (and
future rounds) can ASSERT the plan instead of eyeballing it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Formatted physical plan (post-AQE initial plan) as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning check)."""
    cols: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", executed_plan(df)):
        body = m.group(1)
        names = {part.split(":")[0].strip() for part in body.split(",") if ":" in part}
        cols.append(names)
    return cols


def _op_ids(plan: str, op_pattern: str) -> set[int]:
    # formatted explain lists each operator twice (tree + detail); count
    # unique ids from tree lines "<Op> [attrs] (<id>)" at end of line
    return {
        int(m.group(1))
        for m in re.finditer(
            rf"(?:{op_pattern})[^\n]*\((\d+)\)\s*$", plan, re.MULTILINE
        )
    }


def broadcast_join_count(df: DataFrame) -> int:
    plan = executed_plan(df)
    return len(_op_ids(plan, r"BroadcastHashJoin|BroadcastNestedLoopJoin"))


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (each is one shuffle stage)."""
    return len(_op_ids(executed_plan(df), r"Exchange"))


#: markers that make an unpartitioned window acceptable BY CONSTRUCTION:
#: operators/distrank.py's carry-in-offset window runs over the
#: <= buckets per-partition COUNT rows (metadata scale), recognizable by
#: its bookkeeping column in the window spec.
SP_WINDOW_WHITELIST_MARKERS = ("__dr_pid",)


def single_partition_window_lines(df: DataFrame) -> list[str]:
    """Window operators whose child distribution is SinglePartition —
    the classic scale-killer (the whole input funnels through ONE task).

    Detection is structural on the simple physical-plan string: a
    `windowspecdefinition` operator line whose required exchange
    (`Exchange SinglePartition`, within the next few child lines) is
    single-partition. Lines carrying a whitelist marker (see
    SP_WINDOW_WHITELIST_MARKERS) are excluded; anything returned here is
    either a defect or needs an explicit per-query justification in the
    plan audit notes.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    lines = plan.splitlines()
    hits: list[str] = []
    # operators that sit between a Window and its distribution-enforcing
    # exchange in both the initial AND the finalized-AQE plan text
    passthrough = (
        "Sort ",
        "*(",  # WholeStageCodegen prefix
        "WholeStageCodegen",
        "InputAdapter",
        "AQEShuffleRead",
        "ShuffleQueryStage",
        "ColumnarToRow",
        "Project ",
    )
    for i, ln in enumerate(lines):
        if "windowspecdefinition" not in ln or "Window" not in ln:
            continue
        if any(m in ln for m in SP_WINDOW_WHITELIST_MARKERS):
            continue
        # walk the child chain through pass-through operators until the
        # enforcing exchange (or a non-pass-through operator) appears —
        # a fixed 3-line window misses finalized AQE plans, which insert
        # ShuffleQueryStage/AQEShuffleRead between Sort and Exchange
        for nxt in lines[i + 1 : i + 12]:
            if "Exchange SinglePartition" in nxt or "SinglePartition" in nxt:
                hits.append(ln.strip()[:200])
                break
            body = nxt.strip().lstrip("+-:* ")
            if not body or any(p in nxt for p in passthrough):
                continue
            break  # a real operator that is not part of the exchange chain
    return hits


def wholestage_codegen_ids(df: DataFrame) -> set[int]:
    return {
        int(m.group(1))
        for m in re.finditer(r"WholeStageCodegen \((\d+)\)", executed_plan(df))
    }


_ATTR = r"([A-Za-z_][A-Za-z0-9_]*)#\d+L?"


def _strip_ids(keys: str) -> list[str]:
    """`fh#123L, band_id#4` -> ['fh', 'band_id'] (expression keys kept raw)."""
    return [
        re.sub(r"#\d+L?", "", k.strip()) for k in keys.split(",") if k.strip()
    ]


def self_join_candidate_generators(df: DataFrame) -> list[str]:
    """Join lines that look like CANDIDATE-PAIR GENERATION over one
    relation: an equi-join whose left and right key NAMES are identical
    (a.key == b.key over the same source) combined with a `<` tie-break
    on another same-named column pair (a.id < b.id) — the LSH/blocking
    self-join shape. Output volume is quadratic per key value, so every
    flagged join must be protected by a posting/df cap or band
    discipline and justified by name in the plan-audit notes (the r5
    audit extension; the video-near-dup hot key was the motivating
    defect).

    USING-joins on a shared key name alone are NOT flagged: without the
    tie-break they are lookups, not pair generators.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    hits: list[str] = []
    join_re = re.compile(
        r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\w*\s+"
        r"(?:\w+\s+)?\[([^\]]*)\],\s*\[([^\]]*)\],\s*(\w+)(.*)$"
    )
    for ln in plan.splitlines():
        m = join_re.search(ln)
        if not m:
            continue
        lkeys, rkeys = _strip_ids(m.group(2)), _strip_ids(m.group(3))
        if not lkeys or lkeys != rkeys:
            continue
        cond = m.group(5)
        tie = re.search(rf"\(?{_ATTR}\s*<\s*{_ATTR}\)?", cond)
        if tie and tie.group(1) == tie.group(2):
            hits.append(ln.strip()[:200])
    return hits
