"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 extension surface).

``F.session_window`` / windowed aggs cover the declarative cases; this
module is the escape hatch for *custom* per-key state machines — the
pattern a 100 TB/day event pipeline needs for sessionization with
custom emission rules, running counters with timeout flushes, etc.

State is per-key in the state store (RocksDB/HDFS-backed on a real
cluster); timeouts drive eviction so state stays bounded. The same
transform works under ``availableNow`` for bounded tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)


def running_totals(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-user running totals as an explicit state machine: each
    micro-batch folds its rows into (count, sum) state and emits the
    updated row. The custom-operator template — swap the fold and the
    emission rule for richer semantics (e.g. emit-on-close sessions).

    Batch twin for oracle checks: ``groupBy(user).agg(count, sum)`` —
    at end-of-stream the final emission per key equals the batch result.
    """

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "n_events": pd.Series([n], dtype="int64"),
                "total_value": pd.Series([total], dtype="float64"),
            }
        )

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            fold,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=getattr(GroupStateTimeout, timeout, GroupStateTimeout.NoTimeout),
        )
    )
