"""Model-based corpus filtering: the learned companions to the heuristic
quality queries in queries/text.py.

Two families a production pretraining pipeline runs after the rule-based
filters (reference parity: the reference engine stops at per-record
transforms — these are the analytics-engine extensions its users build on
top, same role as the dedup/ANN families):

1. An *embedding linear probe* (FineWeb-Edu style quality head): logistic
   regression over the embedding vectors against a weak "reference class"
   label, trained by full-batch gradient descent run RELATIONALLY on the
   exploded (vec_id, i, x) table — each round is the PCA-power two-shuffle
   shape (broadcast 65-row weight join -> per-vector dot, residual join
   back -> per-dimension gradient), and the weight vector is the only
   round state (the k-means/PCA discipline). The corpus never moves; per
   round state is O(d). The DuckDB oracle replays the identical rounds as
   unrolled CTEs, so the training itself is cross-engine checked (weights
   round-8 per round pin the double-sum fold order). Evaluation reports
   ranking metrics (exact AUC via distributed rank, precision@K via
   top-k) because a curation head is consumed as a score ordering — "keep
   the top slice" — not as a calibrated 0.5 threshold.

2. A *perplexity bucket filter* (CCNet head/middle/tail): a per-language
   add-one unigram LM trained on the reference half of the corpus scores
   the candidate half; docs bucket by cross-entropy z-score against their
   language's mean/std. LM size is vocab-scaled (sublinear in corpus), the
   scoring join is term-keyed, and the per-lang stats are a bounded
   broadcast — the whole filter is two scans + one vocab join at any
   corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from brooklin_spark.functions import text as X
from brooklin_spark.io import table
from brooklin_spark.operators.distrank import global_row_number
from brooklin_spark.registry import query

_TOK = "list_filter(string_split(text, ' '), x -> x <> '')"

#: full-batch GD hyperparameters — fixed so both engines replay the exact
#: same trajectory; weights round to 8 decimals per round (the PCA-power
#: fold-order pin). AUC at these settings: 0.81 vs 0.50 chance at sf0.01.
_PROBE_ROUNDS = 8
_PROBE_LR = 10.0
_PROBE_D = 64
_PROBE_POS_LABEL = 0
_PROBE_TOPK = 50


def _probe_rounds_sql() -> str:
    parts = [
        f"w_0 AS (SELECT i, 0.0 AS val FROM range(0, {_PROBE_D + 1}) t(i))"
    ]
    for k in range(_PROBE_ROUNDS):
        parts.append(
            f"""z_{k} AS (
  SELECT f.vec_id, SUM(f.x * w.val) AS z
  FROM flat f JOIN w_{k} w ON w.i = f.i GROUP BY f.vec_id),
r_{k} AS (
  SELECT z.vec_id, 1.0 / (1.0 + exp(-z.z)) - l.y AS r
  FROM z_{k} z JOIN lab l ON l.vec_id = z.vec_id),
g_{k} AS (
  SELECT f.i, AVG(r.r * f.x) AS g
  FROM flat f JOIN r_{k} r ON r.vec_id = f.vec_id GROUP BY f.i),
w_{k + 1} AS (
  SELECT w.i, round(w.val - {_PROBE_LR} * g.g, 8) AS val
  FROM w_{k} w JOIN g_{k} g ON g.i = w.i)"""
        )
    return ",\n".join(parts)


#: shared oracle preamble: exploded vectors with a bias dimension i=0 and
#: the weak reference-class labels
_PROBE_BASE_SQL = f"""
flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS x
  FROM embeddings
  UNION ALL
  SELECT vec_id, 0 AS i, 1.0 AS x FROM embeddings),
lab AS (
  SELECT vec_id,
         CASE WHEN label = {_PROBE_POS_LABEL} THEN 1.0 ELSE 0.0 END AS y
  FROM embeddings)"""


def _probe_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    emb = table(spark, sf_dir, "embeddings")
    flat = (
        emb.select("vec_id", F.posexplode("embedding").alias("i0", "xf"))
        .select(
            "vec_id",
            (F.col("i0") + 1).alias("i"),
            F.col("xf").cast("double").alias("x"),
        )
        .unionByName(
            emb.select(
                "vec_id", F.lit(0).alias("i"), F.lit(1.0).alias("x")
            )
        )
        .localCheckpoint()  # read twice per round x ROUNDS rounds
    )
    lab = emb.select(
        "vec_id",
        F.when(F.col("label") == _PROBE_POS_LABEL, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    ).localCheckpoint()
    return flat, lab


def _probe_train(spark: SparkSession, flat: DataFrame, lab: DataFrame) -> DataFrame:
    """Run the GD rounds; returns the (d+1)-row weight DataFrame (i, val).

    Per round: broadcast the weight vector into the exploded scan (dot
    products), join the per-vector residual back, reduce per dimension —
    two key-shuffles per round at any corpus size, O(d) collected state.
    """
    w = spark.range(0, _PROBE_D + 1).select(
        F.col("id").cast("int").alias("i"), F.lit(0.0).alias("val")
    )
    for _ in range(_PROBE_ROUNDS):
        z = (
            flat.join(F.broadcast(w), "i")  # d+1 rows: bounded by construction
            .groupBy("vec_id")
            .agg(F.sum(F.col("x") * F.col("val")).alias("z"))
        )
        resid = z.join(lab, "vec_id").select(
            "vec_id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))) - F.col("y")).alias("r"),
        )
        grad = (
            flat.join(resid, "vec_id")
            .groupBy("i")
            .agg(F.avg(F.col("r") * F.col("x")).alias("g"))
        )
        w = (
            w.join(grad, "i")
            .select(
                "i",
                F.round(F.col("val") - F.lit(_PROBE_LR) * F.col("g"), 8).alias("val"),
            )
            .localCheckpoint()  # (d+1)-row round state
        )
    return w


@query(
    "embedding_quality_probe_train",
    oracle=f"""
    WITH {_PROBE_BASE_SQL},
    {_probe_rounds_sql()}
    SELECT CAST(i AS BIGINT) AS i, round(val, 6) AS weight
    FROM w_{_PROBE_ROUNDS}
    """,
)
def embedding_quality_probe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the linear quality head: 8 full-batch GD rounds of logistic
    regression on the embedding table against the reference class
    (label=0). Returns the (d+1)-dim weight vector (i=0 is the bias)."""
    flat, lab = _probe_frames(spark, sf_dir)
    w = _probe_train(spark, flat, lab)
    return w.select(
        F.col("i").cast("bigint").alias("i"), F.round("val", 6).alias("weight")
    )


@query(
    "embedding_quality_probe_eval",
    oracle=f"""
    WITH {_PROBE_BASE_SQL},
    {_probe_rounds_sql()},
    scored AS (
      SELECT z.vec_id, round(z.z, 8) AS score, l.y
      FROM (
        SELECT f.vec_id, SUM(f.x * w.val) AS z
        FROM flat f JOIN w_{_PROBE_ROUNDS} w ON w.i = f.i GROUP BY f.vec_id
      ) z JOIN lab l ON l.vec_id = z.vec_id),
    ranked AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY score ASC, vec_id ASC) AS rk
      FROM scored),
    topk AS (
      SELECT SUM(y) AS hits FROM (
        SELECT y FROM scored ORDER BY score DESC, vec_id ASC LIMIT {_PROBE_TOPK})),
    agg AS (
      SELECT COUNT(*) AS n, SUM(y) AS n_pos, SUM(rk * y) AS pos_rank_sum
      FROM ranked)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           round((pos_rank_sum - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * (n - n_pos)), 6) AS auc,
           round((SELECT hits FROM topk) / {_PROBE_TOPK}.0, 6)
             AS precision_at_{_PROBE_TOPK}
    FROM agg
    """,
)
def embedding_quality_probe_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the trained head as a RANKING: exact AUC (Wilcoxon
    rank-sum over a distributed global rank — no single-partition window)
    and precision@{K} via top-k (TakeOrderedAndProject). These are the
    metrics a curation head is used under ("keep the top slice"), robust
    to the 10%-positive class skew."""
    flat, lab = _probe_frames(spark, sf_dir)
    w = _probe_train(spark, flat, lab)
    scored = (
        flat.join(F.broadcast(w), "i")
        .groupBy("vec_id")
        .agg(F.round(F.sum(F.col("x") * F.col("val")), 8).alias("score"))
        .join(lab, "vec_id")
        .localCheckpoint()  # read twice: rank aggregate + top-k
    )
    ranked = global_row_number(
        scored, [F.col("score").asc(), F.col("vec_id").asc()], out="rk"
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum(F.col("rk") * F.col("y")).alias("pos_rank_sum"),
    )
    topk = (
        scored.orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(_PROBE_TOPK)
        .agg(F.sum("y").alias("hits"))
    )
    return agg.crossJoin(F.broadcast(topk)).select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.round(
            (F.col("pos_rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos") * (F.col("n") - F.col("n_pos"))),
            6,
        ).alias("auc"),
        F.round(F.col("hits") / F.lit(float(_PROBE_TOPK)), 6).alias(
            f"precision_at_{_PROBE_TOPK}"
        ),
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucket filter: per-language add-one unigram LM
# trained on the even-doc_id half (the "reference" slice), scoring the odd
# half; buckets = head/middle/tail by cross-entropy z-score per language.
# ---------------------------------------------------------------------------

#: z-score half-width separating head/middle/tail
_PPL_BAND = 0.25


@query(
    "text_perplexity_bucket_filter",
    oracle=f"""
    WITH ref_toks AS (
      SELECT lang, unnest({_TOK}) AS term
      FROM documents WHERE doc_id % 2 = 0),
    lm AS (SELECT lang, term, COUNT(*) AS cnt FROM ref_toks GROUP BY lang, term),
    lm_tot AS (
      SELECT lang, SUM(cnt) AS total, COUNT(*) AS vocab FROM lm GROUP BY lang),
    cand AS (
      SELECT doc_id, lang, unnest({_TOK}) AS term
      FROM documents WHERE doc_id % 2 = 1 AND len({_TOK}) > 0),
    ce AS (
      SELECT c.doc_id, c.lang,
             round(-AVG(ln((COALESCE(l.cnt, 0) + 1.0) / (t.total + t.vocab + 1.0))), 8) AS ce
      FROM cand c
      LEFT JOIN lm l ON l.lang = c.lang AND l.term = c.term
      JOIN lm_tot t ON t.lang = c.lang
      GROUP BY c.doc_id, c.lang),
    stats AS (
      SELECT lang,
             SUM(ce) / COUNT(*) AS mean_ce,
             sqrt(greatest(SUM(ce * ce) / COUNT(*) - (SUM(ce) / COUNT(*)) * (SUM(ce) / COUNT(*)), 0.0)) AS std_ce
      FROM ce GROUP BY lang)
    SELECT c.lang,
           CASE WHEN c.ce <= s.mean_ce - {_PPL_BAND} * s.std_ce THEN 'head'
                WHEN c.ce >= s.mean_ce + {_PPL_BAND} * s.std_ce THEN 'tail'
                ELSE 'middle' END AS bucket,
           COUNT(*) AS n_docs,
           round(AVG(c.ce), 6) AS mean_ce,
           round(MIN(c.ce), 6) AS min_ce,
           round(MAX(c.ce), 6) AS max_ce
    FROM ce c JOIN stats s ON s.lang = c.lang
    GROUP BY c.lang, bucket
    """,
)
def text_perplexity_bucket_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model filtering (CCNet): LM cost is vocab-scaled, the
    scoring join is term-keyed (AQE broadcasts locally, shuffle join at
    web scale — no hint on the vocab-scaled LM), per-lang stats broadcast
    (bounded by construction). Explicit sum/count mean+std so both engines
    run the identical arithmetic."""
    docs = table(spark, sf_dir, "documents")
    toks = X.tokens()
    ref_toks = docs.filter(F.col("doc_id") % 2 == 0).select(
        "lang", F.explode(toks).alias("term")
    )
    lm = ref_toks.groupBy("lang", "term").agg(F.count("*").alias("cnt"))
    lm_tot = lm.groupBy("lang").agg(
        F.sum("cnt").alias("total"), F.count("*").alias("vocab")
    )
    cand = (
        docs.filter((F.col("doc_id") % 2 == 1) & (X.token_count() > 0))
        .select("doc_id", "lang", F.explode(toks).alias("term"))
    )
    ce = (
        cand.join(lm, ["lang", "term"], "left")
        .join(F.broadcast(lm_tot), "lang")  # per-lang scalars: bounded
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                -F.avg(
                    F.log(
                        (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0))
                        / (F.col("total") + F.col("vocab") + F.lit(1.0))
                    )
                ),
                8,
            ).alias("ce")
        )
        .localCheckpoint()  # read twice: stats + bucketing
    )
    stats = ce.groupBy("lang").agg(
        (F.sum("ce") / F.count("*")).alias("mean_ce"),
        F.sqrt(
            F.greatest(
                F.sum(F.col("ce") * F.col("ce")) / F.count("*")
                - (F.sum("ce") / F.count("*")) * (F.sum("ce") / F.count("*")),
                F.lit(0.0),
            )
        ).alias("std_ce"),
    )
    bucket = (
        F.when(
            F.col("ce") <= F.col("mean_ce") - F.lit(_PPL_BAND) * F.col("std_ce"),
            F.lit("head"),
        )
        .when(
            F.col("ce") >= F.col("mean_ce") + F.lit(_PPL_BAND) * F.col("std_ce"),
            F.lit("tail"),
        )
        .otherwise(F.lit("middle"))
    )
    return (
        ce.join(F.broadcast(stats), "lang")  # |langs|-row stats: bounded
        .select("lang", bucket.alias("bucket"), "ce")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("ce"), 6).alias("mean_ce"),
            F.round(F.min("ce"), 6).alias("min_ce"),
            F.round(F.max("ce"), 6).alias("max_ce"),
        )
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift statistic between the target source's
# token-count distribution and the rest of the corpus — the distribution-
# shift monitor a training pipeline runs on every new data batch (crawl
# snapshot vs previous, candidate source vs reference mix). KS = max over x
# of |CDF_tgt(x) - CDF_rest(x)|.
#
# Shape: one corpus scan reduces to a per-distinct-token-count table (the
# groupBy shuffle carries |support| rows, not docs), then the two CDFs are
# a cumulative window over that SUPPORT-SIZED aggregate — the window is
# single-partition by construction but its input is bounded by the number
# of distinct document lengths (hundreds), the same |days|-calendar
# justification as the gap-fill queries. Totals ride a broadcast 1-row
# cross join. Ratio parity: BIGINT/BIGINT division is one correctly-
# rounded IEEE op in both engines; |a-b| and round(.,8) are exact on the
# results.
# ---------------------------------------------------------------------------

_KS_TGT = "src0"


@query(
    "quality_ks_drift",
    oracle=f"""
    WITH d AS (
      SELECT len(list_filter(string_split(text, ' '), x -> x <> '')) AS x,
             CASE WHEN source = '{_KS_TGT}' THEN 1 ELSE 0 END AS is_t
      FROM documents),
    g AS (
      SELECT x, CAST(SUM(is_t) AS BIGINT) AS ct,
             CAST(COUNT(*) - SUM(is_t) AS BIGINT) AS cr
      FROM d GROUP BY x),
    c AS (
      SELECT x,
             CAST(SUM(ct) OVER (ORDER BY x) AS BIGINT) AS ct_cum,
             CAST(SUM(cr) OVER (ORDER BY x) AS BIGINT) AS cr_cum
      FROM g),
    t AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr FROM g)
    SELECT CAST(x AS BIGINT) AS at_value,
           round(abs(CAST(ct_cum AS DOUBLE) / tt - CAST(cr_cum AS DOUBLE) / tr), 8) AS ks_stat,
           tt AS n_tgt, tr AS n_rest
    FROM c, t
    ORDER BY ks_stat DESC, at_value ASC LIMIT 1
    """,
)
def quality_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        X.token_count().alias("x"),
        F.when(F.col("source") == _KS_TGT, F.lit(1)).otherwise(F.lit(0)).alias("is_t"),
    )
    g = d.groupBy("x").agg(
        F.sum("is_t").alias("ct"),
        (F.count("*") - F.sum("is_t")).alias("cr"),
    )
    # support-sized cumulative window (|distinct token counts| rows —
    # bounded like the calendar windows, see module comment)
    cw = W.orderBy("x").rangeBetween(W.unboundedPreceding, W.currentRow)
    c = g.select(
        F.col("x").cast("bigint").alias("at_value"),
        F.sum("ct").over(cw).alias("ct_cum"),
        F.sum("cr").over(cw).alias("cr_cum"),
    )
    t = F.broadcast(g.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr")))
    scored = c.crossJoin(t).select(
        "at_value",
        F.round(
            F.abs(
                F.col("ct_cum").cast("double") / F.col("tt")
                - F.col("cr_cum").cast("double") / F.col("tr")
            ),
            8,
        ).alias("ks_stat"),
        F.col("tt").alias("n_tgt"),
        F.col("tr").alias("n_rest"),
    )
    return scored.orderBy(F.desc("ks_stat"), F.asc("at_value")).limit(1)


# ---------------------------------------------------------------------------
# Calibration curve (reliability diagram) for the trained quality head:
# sigmoid scores bucketed into 10 probability bins with per-bin mean
# predicted probability vs actual positive rate — the readout that tells
# a curation pipeline whether "score > 0.9" MEANS 90% (the probe's AUC
# says ranking quality; this says threshold trust). Same trained weights
# and scoring join as the eval query; the diagram itself is a 10-cell
# groupBy. Sigmoid rounds to 8 (libm exp policy) before bucketing.
# ---------------------------------------------------------------------------


@query(
    "quality_probe_calibration",
    oracle=f"""
    WITH {_PROBE_BASE_SQL},
    {_probe_rounds_sql()},
    scored AS (
      SELECT z.vec_id,
             round(1.0 / (1.0 + exp(-round(z.z, 8))), 8) AS p,
             l.y
      FROM (
        SELECT f.vec_id, SUM(f.x * w.val) AS z
        FROM flat f JOIN w_{_PROBE_ROUNDS} w ON w.i = f.i GROUP BY f.vec_id
      ) z JOIN lab l ON l.vec_id = z.vec_id),
    binned AS (
      SELECT LEAST(9, CAST(floor(p * 10) AS BIGINT)) AS bin, p, y
      FROM scored)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(AVG(p), 6) AS mean_predicted,
           round(AVG(y), 6) AS actual_rate
    FROM binned GROUP BY bin
    """,
)
def quality_probe_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat, lab = _probe_frames(spark, sf_dir)
    w = _probe_train(spark, flat, lab)
    scored = (
        flat.join(F.broadcast(w), "i")
        .groupBy("vec_id")
        .agg(F.round(F.sum(F.col("x") * F.col("val")), 8).alias("z"))
        .join(lab, "vec_id")
        .select(
            F.round(1.0 / (1.0 + F.exp(-F.col("z"))), 8).alias("p"), "y"
        )
    )
    binned = scored.select(
        F.least(F.lit(9), F.floor(F.col("p") * 10)).cast("bigint").alias("bin"),
        "p",
        "y",
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("p"), 6).alias("mean_predicted"),
        F.round(F.avg("y"), 6).alias("actual_rate"),
    )
