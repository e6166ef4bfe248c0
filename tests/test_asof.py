"""As-of join operator tests, golden-checked against pandas.merge_asof."""

from __future__ import annotations

import pandas as pd

from brooklin_spark.operators.asof import asof_join


def _frames(spark):
    trades = pd.DataFrame(
        {
            "sym": ["A", "A", "A", "B", "B", "C"],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:03", "2024-01-01 10:00:07", "2024-01-01 10:01:00",
                 "2024-01-01 10:00:01", "2024-01-01 10:00:30", "2024-01-01 09:00:00"]
            ),
            "qty": [10, 20, 30, 40, 50, 60],
        }
    )
    quotes = pd.DataFrame(
        {
            "sym": ["A", "A", "A", "B", "B"],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:00", "2024-01-01 10:00:05", "2024-01-01 10:00:07",
                 "2024-01-01 10:00:00", "2024-01-01 10:00:29"]
            ),
            "px": [1.0, 1.1, 1.2, 2.0, 2.1],
        }
    )
    return trades, quotes


def test_asof_matches_pandas_merge_asof(spark):
    trades, quotes = _frames(spark)
    got = (
        asof_join(
            spark.createDataFrame(trades),
            spark.createDataFrame(quotes),
            on="sym",
            value_cols=["px"],
        )
        .toPandas()
        .sort_values(["sym", "ts"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        trades.sort_values("ts"), quotes.sort_values("ts"), on="ts", by="sym"
    ).sort_values(["sym", "ts"]).reset_index(drop=True)
    assert list(got["px"].fillna(-1)) == list(exp["px"].fillna(-1))
    # inclusive: trade at 10:00:07 matches quote at 10:00:07 (px 1.2)
    assert got.loc[(got.sym == "A") & (got.qty == 20), "px"].iloc[0] == 1.2
    # no earlier quote -> null
    assert pd.isna(got.loc[got.sym == "C", "px"]).all()


def test_asof_strict_excludes_equal_ts(spark):
    trades, quotes = _frames(spark)
    got = (
        asof_join(
            spark.createDataFrame(trades),
            spark.createDataFrame(quotes),
            on="sym",
            value_cols=["px"],
            strict=True,
        )
        .toPandas()
    )
    # strict: trade at 10:00:07 now matches the 10:00:05 quote (px 1.1)
    assert got.loc[(got.sym == "A") & (got.qty == 20), "px"].iloc[0] == 1.1


def test_asof_tolerance(spark):
    trades, quotes = _frames(spark)
    got = asof_join(
        spark.createDataFrame(trades),
        spark.createDataFrame(quotes),
        on="sym",
        value_cols=["px"],
        tolerance_seconds=2,
    ).toPandas()
    # trade A@10:01:00 is 53s after last quote -> tolerance nulls it
    assert pd.isna(got.loc[(got.sym == "A") & (got.qty == 30), "px"]).all()
    # trade B@10:00:30 is 1s after quote 10:00:29 -> kept
    assert got.loc[(got.sym == "B") & (got.qty == 50), "px"].iloc[0] == 2.1
