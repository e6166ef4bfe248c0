#!/usr/bin/env python
"""Oracle-verify graph_pagerank_influence with the FUSED bipartite path
forced at SFs where the threshold would pick the plain path (sf0.01/sf0.1)
— proves the r10 round restructure is value-identical to DuckDB before the
sf100 measurement. Also checks the forced spill+fused composition.

  python scripts/r10_pr_oracle_forcefused.py [sf_dir ...]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from brooklin_spark import registry
from brooklin_spark.queries import dedup
from brooklin_spark.session import get_spark
from tests.oracle import compare, duck_connection

registry.load_all()
spark = get_spark(app_name="r10-pr-oracle")
dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
dedup._PR_FUSED_LI_ROWS = 0
for sf in dirs:
    con = duck_connection(sf)
    for spill in (False, True):
        dedup._PR_SPILL_LI_ROWS = 0 if spill else 10**18
        df = registry.QUERIES["graph_pagerank_influence"](spark, sf)
        compare(df, con, registry.ORACLES["graph_pagerank_influence"], name="pagerank")
        print(f"{sf} fused spill={spill}: ORACLE GREEN", flush=True)
    con.close()
print("ALL GREEN")
