"""Grouped custom logic via ``applyInPandas`` (SURVEY.md §2.9).

Policy: built-in expressions first (every reference scalar op F1-F5 is
one); ``applyInPandas`` is reserved for per-group logic that genuinely
needs imperative code — model scoring, custom curve fitting, library
calls. The example here (per-user inter-event gap statistics) is
deliberately ALSO expressible with window functions, so the test can
assert the pandas path agrees with the built-in path exactly — the
contract a user extending the engine with custom grouped ops inherits.

Scale shape: one hash shuffle on the group key; each group's rows reach
Python as a single Arrow batch (``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds memory). Skewed groups are the risk — a single giant group
serializes into one Python worker; pre-aggregate or salt upstream if a
key can hold millions of rows.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .util import epoch_double

GAP_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("mean_gap_s", DoubleType(), True),
        StructField("max_gap_s", DoubleType(), True),
    ]
)


def gap_stats_pandas(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Per-user inter-event gap stats computed imperatively per group."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf[ts_col].sort_values()
        gaps = ts.diff().dropna().dt.total_seconds()
        return pd.DataFrame(
            {
                "user_id": [int(pdf[user_col].iloc[0])],
                "n_events": [len(pdf)],
                "mean_gap_s": [round(float(gaps.mean()), 6) if len(gaps) else None],
                "max_gap_s": [round(float(gaps.max()), 6) if len(gaps) else None],
            }
        )

    return (
        events.select(user_col, ts_col)
        .where(F.col(user_col).isNotNull())
        .groupBy(user_col)
        .applyInPandas(stats, schema=GAP_STATS_SCHEMA)
    )


def gap_stats_builtin(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """The same statistics as pure window + aggregate expressions — the
    fast path (whole-stage codegen, no Python) and the oracle twin."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    ts_sec = epoch_double(F.col(ts_col), events.schema[ts_col].dataType)
    gap = ts_sec - F.lag(ts_sec).over(w)
    return (
        events.select(user_col, ts_col)
        .where(F.col(user_col).isNotNull())
        .withColumn("__gap", gap)
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("__gap"), 6).alias("mean_gap_s"),
            F.round(F.max("__gap"), 6).alias("max_gap_s"),
        )
    )
