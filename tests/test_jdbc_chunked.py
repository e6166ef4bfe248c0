"""Golden-SQL tests for the chunked JDBC reader (mirrors the reference's
TestMysqlChunkedQueryManager golden-string style) + a DuckDB execution test
proving the shard predicates partition a table completely and disjointly."""

from __future__ import annotations

import duckdb

from brooklin_spark.sources.jdbc_chunked import (
    ChunkedQuerySpec,
    generate_chunk_query,
    generate_first_query,
    keyset_predicate,
    shard_predicate,
    shard_predicates,
)


def _spec(**kw) -> ChunkedQuerySpec:
    base = dict(
        query="SELECT * FROM lineitem",
        pk_cols=["l_orderkey", "l_linenumber"],
        num_shards=4,
        chunk_size=1000,
    )
    base.update(kw)
    return ChunkedQuerySpec(**base)


def test_first_query_golden():
    sql = generate_first_query(_spec(), shards=[0, 2])
    assert sql == (
        "SELECT * FROM ( SELECT * FROM lineitem ) nested "
        "WHERE MOD(CRC32(CONCAT(l_orderkey, l_linenumber)), 4) IN (0, 2) "
        "ORDER BY l_orderkey, l_linenumber LIMIT 1000"
    )


def test_chunk_query_golden_has_keyset_resume():
    sql = generate_chunk_query(_spec(), shards=[1])
    assert "( ( l_orderkey > ? ) OR ( l_orderkey = ? AND l_linenumber > ? ) )" in sql
    assert sql.endswith("ORDER BY l_orderkey, l_linenumber LIMIT 1000")


def test_single_pk_no_concat():
    sp = _spec(pk_cols=["id"], num_shards=8)
    assert shard_predicate(sp, [3]) == "MOD(CRC32(id), 8) IN (3)"
    assert keyset_predicate(sp) == "( ( id > ? ) )"


def test_shard_predicates_partition_completely():
    """Union of shard reads == full table, no dupes (the DatabaseChunkedReader
    correctness invariant), executed on DuckDB as the JDBC stand-in."""
    con = duckdb.connect()
    # (l_orderkey, l_linenumber) is not unique in the synthetic data; build
    # a real composite PK (l_orderkey, id)
    con.sql(
        "CREATE TABLE t AS SELECT l_orderkey, row_number() OVER () AS id "
        "FROM '/root/testdata/sf0.001/lineitem.parquet'"
    )
    # duckdb lacks CRC32; hash() is its uniform hash — dialect plug-in point
    sp = _spec(query="SELECT * FROM t", hash_fn="hash", pk_cols=["l_orderkey", "id"])
    total = 0
    seen = set()
    for pred in shard_predicates(sp):
        rows = con.sql(
            f"SELECT l_orderkey, id FROM ( SELECT * FROM t ) nested WHERE {pred}"
        ).fetchall()
        keys = set(rows)
        assert not (seen & keys), "shards must be disjoint"
        seen |= keys
        total += len(rows)
    full = con.sql("SELECT count(*) FROM t").fetchone()[0]
    assert total == full and len(seen) == full


def test_keyset_pagination_walks_whole_table():
    """Chunked keyset loop visits every row exactly once, in key order."""
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT l_orderkey, row_number() OVER () AS id "
        "FROM '/root/testdata/sf0.001/lineitem.parquet'"
    )
    sp = _spec(query="SELECT * FROM t", hash_fn="hash", chunk_size=700,
               pk_cols=["l_orderkey", "id"])
    pred = shard_predicate(sp, list(range(sp.num_shards)))  # all shards
    seen: list[tuple] = []
    last = None
    while True:
        if last is None:
            sql = (
                f"SELECT * FROM ( SELECT * FROM t ) nested WHERE {pred} "
                f"ORDER BY l_orderkey, id LIMIT {sp.chunk_size}"
            )
        else:
            # bind the reference's '?' placeholders with the last seen key
            ks = (
                f"( ( l_orderkey > {last[0]} ) OR "
                f"( l_orderkey = {last[0]} AND id > {last[1]} ) )"
            )
            sql = (
                f"SELECT * FROM ( SELECT * FROM t ) nested WHERE {pred} AND {ks} "
                f"ORDER BY l_orderkey, id LIMIT {sp.chunk_size}"
            )
        chunk = con.sql(sql).fetchall()
        if not chunk:
            break
        seen.extend(chunk)
        last = chunk[-1]
    full = con.sql("SELECT count(*) FROM t").fetchone()[0]
    assert len(seen) == full
    assert seen == sorted(seen)
    assert len(set(seen)) == full
