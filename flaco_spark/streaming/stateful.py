"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming surface at all (batch cursor drain,
``/root/reference/src/lib.rs:188-195``); this is the extension lane's
"custom operator" slot: per-key state that Spark's built-in windowed
aggregations cannot express — here, a running per-user profile
(event count, value sum, last-seen timestamp) maintained across
micro-batches.

Scale posture: state lives in the state store partitioned by the
group key — the same hash-shuffle as a streaming aggregation, one
state row per user; Arrow-batched transfer into Python per group
partition, never a driver collect.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into running state.

    total_value accumulates in cents (int64) so the running sum is
    exact and independent of event order within/across batches.
    """
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += int(pdf["value_cents"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": pd.Series([key[0]], dtype="int64"),
            "n_events": pd.Series([n], dtype="int64"),
            "total_value": pd.Series([cents / 100.0], dtype="float64"),
            "last_seen_us": pd.Series([last_us], dtype="int64"),
        }
    )


def _prep(events: DataFrame) -> DataFrame:
    return events.select(
        "user_id",
        (money_cents(F.col("value"))).alias("value_cents"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )


def money_cents(col):
    """Exact cents as int64 (value is 2-dp in the data)."""
    return F.round(col * 100).cast("bigint")


def user_profiles_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming: running per-user profile maintained in the state store."""
    return (
        _prep(events_stream)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_profiles_batch(events: DataFrame) -> DataFrame:
    """Batch oracle for the stateful operator: same profile computed
    with ordinary aggregation (what the state converges to)."""
    return (
        _prep(events)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("value_cents") / F.lit(100.0)).alias("total_value"),
            F.max("ts_us").alias("last_seen_us"),
        )
    )
