"""Custom stateful streaming operator: running per-user counters via
``applyInPandasWithState`` (the escape hatch for operators Spark's
built-in streaming aggregations can't express).

The operator keeps (count, value_sum, max_ts) per user across
micro-batches and emits one updated row per user per batch —
i.e. an incrementally-maintained per-user profile. State is bounded by
the user-key cardinality and checkpointed by Spark.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max = int(pdf["ts"].astype("int64").max() // 1000)  # ns → µs
        last_us = max(last_us, batch_max)
    state.update((n, s, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_profiles_stateful(events: DataFrame) -> DataFrame:
    """Per-user running profile over a (possibly streaming) event frame."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
