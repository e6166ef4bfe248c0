"""Table loading helpers for the analytics layer.

All testdata access funnels through here so scans stay column-prunable and
filter-pushable: callers get the raw ``spark.read.parquet`` DataFrame (no
caching, no collect) and Catalyst prunes columns/filters into the parquet
scan per query. At 100 TB these would be partitioned/bucketed tables behind
a catalog; the API shape is the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    # engine invariants, set at runtime so externally-created sessions (the
    # correctness driver's) behave like session.py sessions: UTC event-time
    # semantics (matches the timezone-naive DuckDB oracle) and nanos-as-long
    # for the events table (Spark 4 refuses TIMESTAMP(NANOS) otherwise)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # "bucketed:<db>:<fallback_dir>" — the 100 TB layout: facts live as
    # bucketed catalog tables (shuffle paid once at write time, joins on
    # the bucket key plan with zero Exchange); tables not in the db fall
    # back to the plain parquet dir. Same queries, different layout —
    # scripts/spine_bucketed.py A/Bs the two.
    if sf_dir.startswith("bucketed:"):
        _, db, fallback = sf_dir.split(":", 2)
        if spark.catalog.tableExists(f"{db}.{name}"):
            return spark.table(f"{db}.{name}")
        return table(spark, fallback, name)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts is parquet TIMESTAMP(NANOS) read as long (see session.py conf);
        # truncate to micros — same conversion DuckDB applies natively.
        # Derived corpora (scripts/make_benchdata.py) store micros already
        # and skip this.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so queries can be written in Spark SQL."""
    for n in names or TABLES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


def atomic_publish(tmp: str, idx: str, success_rel: str = "_SUCCESS") -> None:
    """Publish a freshly-built index directory ``tmp`` at serving path ``idx``.

    Concurrency contract: any number of concurrent builders may call this
    with DISTINCT ``tmp`` dirs (pid-suffixed); exactly one complete build
    ends up served at ``idx``, losers discard their own build, and no
    builder ever removes a directory another builder just published.
    The key discipline: a dir is only rmtree'd after the caller WON an
    exclusive ``os.rename`` of it to a private trash path — rename is
    atomic, so two losers cannot both "clear" the same incomplete index
    (the race the old copy-pasted rmtree-then-rename block had).

    ``success_rel`` is the path — or list of paths — relative to the index
    root whose existence marks a COMPLETE index; Spark writes each during
    its parquet job, before publish, so any successfully-renamed dir
    already has them all.  Multi-part indexes (BM25's postings + stats)
    MUST pass every part's marker: a build that crashed between the parts
    has the first marker but not the last, and treating it as complete
    would keep the broken dir and discard the fresh good build (r8 advice).
    """
    import shutil

    rels = (success_rel,) if isinstance(success_rel, str) else tuple(success_rel)

    def _complete(d: str) -> bool:
        return all(os.path.exists(os.path.join(d, r)) for r in rels)

    for _ in range(16):
        try:
            os.rename(tmp, idx)  # atomic when idx is absent
            return
        except OSError:
            pass
        if _complete(idx):
            # a complete index is already served — we lost the race; keep
            # serving it and drop our own build
            shutil.rmtree(tmp, ignore_errors=True)
            return
        # idx exists but is incomplete (a crashed pre-publish build from an
        # older code path): claim it exclusively before deleting
        trash = f"{idx}.trash.{os.getpid()}"
        try:
            os.rename(idx, trash)
        except OSError:
            continue  # another builder is clearing or publishing — retry
        # TOCTOU guard (r8 advice): between our _complete(idx) == False and
        # winning the rename, a concurrent builder may have cleared the
        # stale dir and published a COMPLETE index — which we just grabbed.
        # Re-check inside the trash dir we now own exclusively; if it is
        # complete, restore it instead of deleting another builder's
        # publish out from under concurrent readers.
        if _complete(trash):
            try:
                os.rename(trash, idx)  # restore; atomic while idx absent
                shutil.rmtree(tmp, ignore_errors=True)
                return
            except OSError:
                # a third builder already published at idx; if that one is
                # complete we can safely drop the copy we hold
                if _complete(idx):
                    shutil.rmtree(trash, ignore_errors=True)
                    shutil.rmtree(tmp, ignore_errors=True)
                    return
                # served dir incomplete again — drop our trash copy and
                # retry the loop to clear/republish
        shutil.rmtree(trash, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    raise RuntimeError(f"atomic_publish: could not publish {idx}")
