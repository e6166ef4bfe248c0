#!/usr/bin/env python
"""Simulate the external correctness driver EXACTLY: a DEFAULT
SparkSession (none of session.py's tuning — Spark 4 ships ANSI on) runs
every registered query through the __spark_entry__ contract and compares
against its DuckDB oracle with strict value equality.

Run before round end: `python scripts/driver_sim.py [sf_dir]`. A query
that passes tests/test_oracle_parity.py but fails HERE depends on a
session conf the driver won't set — exactly the failure mode this guards
against (the r1 lesson: the driver passes ITS OWN SparkSession).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# Optional substring filter: `driver_sim.py <sf_dir> name1,name2` checks
# only queries whose name contains one of the given substrings.
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None
# Optional JSON artifact (r8 verdict #1): DRIVER_SIM_OUT=driver_sim_r9.json
# writes the full-width book {name: {rows_match, schema_match, hash_match,
# spark_rows, oracle_rows, err}} in the driver's CORRECTNESS format.
OUT = os.environ.get("DRIVER_SIM_OUT")
# Optional sharding for bounded-wall-clock full sweeps:
# DRIVER_SIM_SHARD=i/n checks every n-th query (sorted order) starting at i.
_shard = os.environ.get("DRIVER_SIM_SHARD")
SHARD = tuple(int(x) for x in _shard.split("/")) if _shard else None
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def equal(a: pd.DataFrame, e: pd.DataFrame) -> bool:
    if list(a.columns) != list(e.columns) or len(a) != len(e):
        return False
    for c in a.columns:
        av, ev = a[c].to_numpy(), e[c].to_numpy()
        if av.dtype.kind == "f" or ev.dtype.kind == "f":
            a64, e64 = av.astype(np.float64), ev.astype(np.float64)
            if not (((a64 == e64) | (np.isnan(a64) & np.isnan(e64))).all()):
                return False
        elif not (pd.Series(av).fillna("\0N") == pd.Series(ev).fillna("\0N")).all():
            return False
    return True


def main() -> int:
    spark = (
        SparkSession.builder.appName("driver-sim")
        .master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", str(os.cpu_count()))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("ansi mode:", spark.conf.get("spark.sql.ansi.enabled"))

    import __spark_entry__ as ent

    qs, osql = ent.queries(), ent.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    print("entry rows:", len(ent.entry(spark).collect()))
    fails = []
    book: dict[str, dict] = {}
    for i, name in enumerate(sorted(qs)):
        if ONLY and not any(s in name for s in ONLY):
            continue
        if SHARD and i % SHARD[1] != SHARD[0]:
            continue
        rec = {"rows_match": False, "schema_match": False, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None}
        book[name] = rec
        try:
            sdf = normalize(qs[name](spark, SF).toPandas())
            rec["spark_rows"] = len(sdf)
            if name not in osql:
                print(f"  {name}: rows-only ({len(sdf)})")
                rec["err"] = "no_oracle"
                continue
            edf = normalize(con.sql(osql[name]).df())
            rec["oracle_rows"] = len(edf)
            rec["rows_match"] = len(sdf) == len(edf)
            rec["schema_match"] = list(sdf.columns) == list(edf.columns)
            ok = equal(sdf, edf)
            rec["hash_match"] = ok
            print(f"  {name}: {'OK' if ok else 'MISMATCH'} ({len(sdf)} rows)")
            if not ok:
                fails.append(name)
        except Exception as e:  # noqa: BLE001 - report-and-continue harness
            rec["err"] = str(e).splitlines()[0][:300]
            print(f"  {name}: ERROR {str(e).splitlines()[0][:160]}")
            fails.append(name)
    if OUT:
        import json

        with open(OUT, "w") as f:
            json.dump(book, f, indent=1, sort_keys=True)
        print(f"book -> {OUT} ({len(book)} queries)")
    print(f"\n{len(qs) - len(fails)}/{len(qs)} green; failures: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
