"""Python extension surface queries (SURVEY §2.10 'record-level UDF on
data: absent in reference' — provided here as first-class, oracle-checked):

- applyInPandas grouped UDAF (Arrow-batched pandas per group);
- Python UDTF (Spark 4 table function) via LATERAL join.

Both are the slow path by design (see pyspark_guide: built-ins beat UDFs);
they exist for semantics Catalyst can't express. Rounding happens JVM-side
(F.round) so cross-engine float policy stays in one place.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from brooklin_spark.io import table
from brooklin_spark.registry import query

# ---------------------------------------------------------------------------
# Grouped pandas UDAF: per-source corpus stats computed in numpy/pandas.
# ---------------------------------------------------------------------------


@query(
    "pandas_text_stats_per_source",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 8) AS mean_chars,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars), 8) AS median_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY source
    """,
)
def pandas_text_stats_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("source", "n_chars")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        return pd.DataFrame(
            [
                {
                    "source": pdf["source"].iloc[0],
                    "n_docs": len(pdf),
                    "mean_chars": float(pdf["n_chars"].mean()),
                    "median_chars": float(np.median(pdf["n_chars"])),
                    "max_chars": int(pdf["n_chars"].max()),
                }
            ]
        )

    out = docs.groupBy("source").applyInPandas(
        stats,
        "source string, n_docs bigint, mean_chars double, median_chars double, max_chars bigint",
    )
    return out.select(
        "source",
        "n_docs",
        F.round("mean_chars", 8).alias("mean_chars"),
        F.round("median_chars", 8).alias("median_chars"),
        "max_chars",
    )


# ---------------------------------------------------------------------------
# Python UDTF: tokenize-with-position as a LATERAL table function.
# ---------------------------------------------------------------------------


@query(
    "udtf_token_positions",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents WHERE doc_id < 50)
    SELECT doc_id, CAST(i AS INTEGER) AS pos, w[i] AS token
    FROM tok, UNNEST(generate_series(1, len(w))) AS t(i)
    WHERE i <= 5
    """,
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            toks = [x for x in (text or "").split(" ") if x]
            for i, t in enumerate(toks[:5], start=1):
                yield i, t

    spark.udtf.register("bk_tokenize", Tokenize)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token FROM _udtf_docs d, LATERAL bk_tokenize(d.text) t"
    )
