"""Similarity-search operators over embedding columns (array<float>).

All vector math is JVM-side higher-order functions (zip_with / aggregate /
transform) — no Python in the loop, whole-stage codegen applies. Casts to
double before arithmetic so results are engine-portable (float32 products
are exact in double).

Scale design:
- brute-force top-k: queries × corpus — right answer baseline; viable when
  the query set is small (broadcast the queries, stream the corpus).
- SRP-LSH (sign random projection): deterministic ±1 hyperplanes derived
  from md5 parity, bucket = sign-bit string; candidate generation becomes
  an equi-join on bucket — the 100 TB path. More planes → smaller buckets;
  multi-probe or repeated tables recover recall.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", _norm(F.col(vec_col)))


def cosine(a_vec: Column, b_vec: Column, a_norm: Column, b_norm: Column) -> Column:
    """Cosine similarity rounded to 6 decimals (cross-engine-stable: fold
    order noise ~1e-15 << 1e-6 grid)."""
    return F.round(_dot(a_vec, b_vec) / (a_norm * b_norm), 6)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) ⋈ corpus (no shuffle of the corpus),
    per-query top-k via row_number with id tie-break.
    """
    from pyspark.sql import Window as W

    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("_norm").alias("c_norm"),
    )
    sim = cosine(F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def similar_pairs(
    corpus: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup dedup).

    All-pairs is the verification kernel; at scale feed it SRP-LSH buckets
    instead of the full cross join (see srp_bucket)."""
    a = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("a_vec"), F.col("_norm").alias("a_norm")
    )
    b = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("b_vec"), F.col("_norm").alias("b_norm")
    )
    sim = cosine(F.col("a_vec"), F.col("b_vec"), F.col("a_norm"), F.col("b_norm"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def srp_bucket(df: DataFrame, planes: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-random-projection bucket id per vector.

    Hyperplane p's coefficient for dimension i is ±1 from md5 parity of
    "p:i" — deterministic, engine-portable, no stored model. Computed with
    an indexed transform + aggregate per plane (no explode, no shuffle).
    """
    vec = F.col(vec_col)

    def plane_term(p: int):
        def f(x, i):
            parity = (
                F.ascii(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{p}:"), (i + 1).cast("string"))), 1, 1
                    )
                )
                % 2
            )
            return x.cast("double") * (2 * parity - 1).cast("double")

        return f

    bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.transform(vec, plane_term(p)), F.lit(0.0), lambda acc, x: acc + x
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(F.col(id_col).alias("id"), vec.alias("vec"), F.concat(*bits).alias("bucket"))


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine,
    centroid-id tie-break) -> (vec_id, cid).

    Plan shape: corpus ⋈ broadcast(centroids) — partition-preserving, no
    corpus shuffle; this is the IVF index build, written once at scale and
    reused across queries. Centroid refinement (k-means iterations) slots
    in by re-calling this with updated centroids.
    """
    from pyspark.sql import Window as W

    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"), F.col("_norm").alias("vn")
    )
    k = with_norm(centroids, vec_col).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"), F.col("_norm").alias("cn")
    )
    sim = cosine(F.col("vec"), F.col("cvec"), F.col("vn"), F.col("cn"))
    scored = c.join(F.broadcast(k)).select("vec_id", "cid", sim.alias("sim"))
    w = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: probe the ``nprobe`` nearest
    centroid buckets per query, exact cosine rerank within the candidates.

    Deterministic (fixed centroids, rounded sims, id tie-breaks) so it is
    byte-reproducible across engines. At scale the candidate join shuffles
    only |probed buckets| ≈ nprobe/n_centroids of the corpus instead of
    scoring all of it — that fraction is the accuracy/throughput dial.
    """
    from pyspark.sql import Window as W

    assign = ivf_assign(corpus, centroids, id_col, vec_col)
    kc = with_norm(centroids, vec_col).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"), F.col("_norm").alias("cn")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), F.col("_norm").alias("q_norm")
    )
    qsim = cosine(F.col("q_vec"), F.col("cvec"), F.col("q_norm"), F.col("cn"))
    wq = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cid"))
    probes = (
        q.join(F.broadcast(kc)).select("query_id", "cid", qsim.alias("sim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "cid")
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), F.col("_norm").alias("c_norm")
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "cid")
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    sim = cosine(F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def srp_ann_top1(
    corpus: DataFrame, planes: int = 6, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Approximate nearest neighbor: best same-bucket neighbor per vector.

    The candidate join is keyed on the bucket string — an equi-join, so at
    scale it shuffles once on bucket instead of forming the cross product.
    Vectors alone in their bucket yield no row (approximate by design).
    """
    from pyspark.sql import Window as W

    b = srp_bucket(corpus, planes, id_col, vec_col)
    b = b.withColumn("_norm", _norm(F.col("vec")))
    x = b.alias("x")
    y = b.alias("y")
    sim = cosine(F.col("x.vec"), F.col("y.vec"), F.col("x._norm"), F.col("y._norm"))
    scored = (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") != F.col("y.id")),
        )
        .select(F.col("x.id").alias("query_id"), F.col("y.id").alias("neighbor_id"), sim.alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
