#!/usr/bin/env python
"""Capture .explain("formatted") output for named queries into
plans/r10/<query>_<suffix>.txt — the r10 optimization round's before/after
plan evidence (judge cross-checks plan claims against these files).

Usage: python scripts/r10_plans.py <suffix> name1,name2[,...] [sf_dir]

Env knobs for path forcing:
  R10_FORCE_PR_FUSED=1   force graph_pagerank_influence's fused path
  R10_FORCE_SPILL=1      force the columnar-scratch spill path
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from brooklin_spark import registry  # noqa: E402
from brooklin_spark.session import get_spark  # noqa: E402

suffix = sys.argv[1]
names = sys.argv[2].split(",")
sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

registry.load_all()
if os.environ.get("R10_FORCE_PR_FUSED"):
    from brooklin_spark.queries import dedup

    dedup._PR_FUSED_LI_ROWS = 0
if os.environ.get("R10_FORCE_PR_PLAIN"):
    from brooklin_spark.queries import dedup

    dedup._PR_FUSED_LI_ROWS = 10**18
if os.environ.get("R10_FORCE_SPILL"):
    from brooklin_spark.queries import dedup

    dedup._PR_SPILL_LI_ROWS = 0

spark = get_spark(app_name="r10-plan-capture")
out_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10"
)
os.makedirs(out_dir, exist_ok=True)

for name in names:
    df = registry.QUERIES[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(f"# {name} — explain(formatted) at {sf_dir} ({suffix})\n")
        fh.write(plan)
    n_ex = plan.count("Exchange")
    print(
        f"{name}: {path}  Exchange={n_ex}  "
        f"BatchEvalPython={plan.count('BatchEvalPython')}  "
        f"ArrowEvalPython={plan.count('ArrowEvalPython')}"
    )
