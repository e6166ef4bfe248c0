"""Bucketed (pre-partitioned) tables for shuffle-free co-located joins.

At 100 TB the dominant cost of a repeated fact-fact join is re-shuffling
both sides on every query. Bucketing pays that shuffle ONCE at write time:
both tables hash-partition their files by the join key into the same
bucket count, so Catalyst plans the join with zero Exchange — each task
zips bucket i with bucket i. This is the Spark-native analog of the
reference's "destination partitions follow source partitions" co-location
(DatastreamTask partition assignment), applied to analytic storage.

Usage: write_bucketed() both sides with the same (key, n_buckets), then
join the saved tables — tests/test_plan_quality.py asserts the plan has no
shuffle. Sorting within buckets additionally removes the join's sort.

The bucket spec is PERSISTED next to the data (``_bucket_spec.json``) and
re-attachment validates against it: a CREATE TABLE whose CLUSTERED BY /
INTO n BUCKETS clause disagrees with how the files were actually written
would produce zero-Exchange plans that silently return wrong join results
(rows hashed to bucket i under spec A are read as bucket i under spec B).
register_bucketed therefore refuses to attach a directory whose recorded
spec doesn't match — wrong-spec re-attachment fails loudly, never wrong.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

SPEC_FILE = "_bucket_spec.json"


def table_location(spark: SparkSession, table_name: str) -> str:
    """Resolve a table's storage location from the catalog (never guess
    warehouse-root placement: db-qualified tables live under <db>.db/)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
    for r in rows:
        if r.col_name == "Location":
            return r.data_type.removeprefix("file:")
    raise ValueError(f"no Location row for table {table_name}")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int, sort: bool = True
) -> None:
    """Persist df as a bucketed (and bucket-sorted) managed parquet table,
    recording the bucket spec next to the files for safe re-attachment."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)
    spec = {"key": key, "n_buckets": n_buckets, "sorted": sort}
    loc = table_location(df.sparkSession, table_name)
    with open(os.path.join(loc, SPEC_FILE), "w") as f:
        json.dump(spec, f)


def register_bucketed(
    spark: SparkSession, table_name: str, key: str, n_buckets: int, location: str
) -> None:
    """(Re-)register an existing bucketed-table directory in the catalog.

    The default in-memory catalog is session-scoped while the written
    files persist, so a later session must re-attach them as an EXTERNAL
    table carrying the same bucket spec — schema comes from the parquet
    footers (CLUSTERED BY requires an explicit column list). The caller's
    (key, n_buckets) is VALIDATED against the ``_bucket_spec.json`` the
    writer recorded; a mismatch (e.g. SPINE_BUCKETS changed between the
    build and a re-run) raises instead of attaching files under a spec
    they were not written with."""
    spec_path = os.path.join(location, SPEC_FILE)
    if not os.path.exists(spec_path):
        raise ValueError(
            f"{location} has no {SPEC_FILE}; refusing to attach a bucket "
            "spec that cannot be validated — rebuild with write_bucketed()"
        )
    with open(spec_path) as f:
        spec = json.load(f)
    if spec["key"] != key or spec["n_buckets"] != n_buckets:
        raise ValueError(
            f"bucket spec mismatch for {location}: files were written with "
            f"{spec}, caller requested key={key!r} n_buckets={n_buckets} — "
            "a mismatched CLUSTERED BY would make zero-Exchange joins "
            "silently wrong"
        )
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in spark.read.parquet(location).schema.fields
    )
    sort_clause = f"SORTED BY ({key}) " if spec.get("sorted", True) else ""
    spark.sql(
        f"CREATE TABLE {table_name} ({cols}) USING parquet "
        f"CLUSTERED BY ({key}) {sort_clause}INTO {n_buckets} BUCKETS "
        f"LOCATION '{location}'"
    )


#: the spine-twin db-name convention scripts/spine_custkey.py builds:
#: <prefix><sf base>. Only the CUSTKEY layout is auto-routed — its
#: registered-q5 win is booked (spine_custkey_sf100_b256.json); the
#: orderkey layout ("spine_") only measured a win for q5 under a
#: different join order, so it stays explicit-marker-only.
_TWIN_PREFIXES = ("spinecust_",)
#: facts a twin must serve for the spine joins to ride it
_TWIN_TABLES = ("customer", "orders", "lineitem")


def spine_twin(spark: SparkSession, sf_dir: str) -> str | None:
    """Auto-detect a bucketed spine-layout twin for a plain parquet corpus
    (r10, r9 verdict item 5): when a convention-named db serves bucketed
    customer/orders/lineitem built FROM THIS EXACT CORPUS, return the
    ``bucketed:<db>:<sf_dir>`` marker that routes io.table through it; else
    None (plain path untouched — in particular the driver's bench and
    correctness environments have no twins, so their plans are unchanged).

    Provenance guard: each table's persisted ``_bucket_spec.json`` must
    carry a ``source`` stamp (abspath + mtime of the parquet it was built
    from) that matches sf_dir's file — a twin built from different data
    that merely shares the directory basename, or whose source has since
    been rewritten, is never routed to. Twins without the stamp (pre-r10
    builds) are served only via an explicit ``bucketed:`` marker."""
    if sf_dir.startswith("bucketed:") or not os.path.isdir(sf_dir):
        return None
    base = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    for prefix in _TWIN_PREFIXES:
        db = prefix + base
        try:
            if not all(
                spark.catalog.tableExists(f"{db}.{t}") for t in _TWIN_TABLES
            ):
                continue
            ok = True
            for t in _TWIN_TABLES:
                spec_path = os.path.join(
                    table_location(spark, f"{db}.{t}"), SPEC_FILE
                )
                with open(spec_path) as f:
                    src = json.load(f).get("source")
                parquet = os.path.join(sf_dir, f"{t}.parquet")
                if (
                    not src
                    or src.get("path") != os.path.abspath(parquet)
                    or src.get("mtime") != os.path.getmtime(parquet)
                ):
                    ok = False
                    break
            if ok:
                return f"bucketed:{db}:{sf_dir}"
        except Exception:
            continue
    return None


def stamp_source(table_loc: str, parquet_path: str) -> None:
    """Record the corpus a bucketed table was built from in its persisted
    spec — what spine_twin() validates before auto-routing."""
    spec_path = os.path.join(table_loc, SPEC_FILE)
    with open(spec_path) as f:
        spec = json.load(f)
    spec["source"] = {
        "path": os.path.abspath(parquet_path),
        "mtime": os.path.getmtime(parquet_path),
    }
    with open(spec_path, "w") as f:
        json.dump(spec, f)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str, key_right: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys — planned
    without any Exchange (asserted in tests)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_left] == rt[key_right])
