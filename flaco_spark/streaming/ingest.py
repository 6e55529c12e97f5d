"""Streaming ingestion building blocks.

Batch/stream symmetry is deliberate: the windowed aggregation here is
the same ``F.window`` construct the batch inventory uses
(q40_tumbling_window), so a pipeline can promote a batch query to a
stream by swapping ``read`` → ``readStream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts with a watermark for late data.

    Works on both batch and streaming DataFrames (watermark is a no-op
    in batch), which is how we unit-test the semantics against the
    batch oracle.
    """
    if events.isStreaming:
        # Watermarks require TIMESTAMP (with local tz); the batch tables use
        # NTZ — cast here (identity under the engine's pinned UTC session).
        src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
            ts_col, watermark
        )
    else:
        src = events
    return (
        src.groupBy(F.window(ts_col, window_duration).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def stream_parquet_sink(
    spark: SparkSession,
    source_dir: str,
    schema: "str | object",
    out_dir: str,
    checkpoint_dir: str,
    transform=None,
) -> StreamingQuery:
    """File-source → parquet-sink streaming job, available-now trigger.

    The streaming analogue of the reference's read→file contract
    (src/lib.rs:77-85): each micro-batch lands as parquet files with
    exactly-once bookkeeping in the checkpoint.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    if transform is not None:
        stream = transform(stream)
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication with BOUNDED state.

    ``dropDuplicatesWithinWatermark`` keeps a key in state only until
    the watermark passes it — the property that makes streaming dedup
    viable at 100 TB/day (plain streaming ``dropDuplicates`` retains
    every key ever seen; its state grows without bound, the classic
    production failure).  Batch DataFrames take the plain
    ``dropDuplicates`` path, giving batch/stream symmetry for tests:
    the surviving KEY SET is identical, which row represents each key
    is engine-chosen in both modes.
    """
    cols = list(key_cols)
    if events.isStreaming:
        src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
            ts_col, watermark
        )
        return src.dropDuplicatesWithinWatermark(cols)
    return events.dropDuplicates(cols)


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the
    view events by the same user within the preceding ``max_lag``.

    On streaming inputs this is Spark's watermarked stream-stream
    inner join — both sides buffer only rows younger than the
    watermark, and the time-range predicate bounds the join state, so
    state size is O(rate × lag window), independent of total history
    (the property that lets the same query run forever on a 100 TB/day
    feed).  On batch inputs the identical expression is a plain
    range-condition join, which is how the semantics are
    differential-tested (``test_stream_stream_join_matches_batch``).
    """
    v = views.select(
        F.col(key_col).alias("v_user"),
        F.col(ts_col).cast("timestamp").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.select(
        F.col(key_col).alias("p_user"),
        F.col(ts_col).cast("timestamp").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if views.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_lag}"))
    )
    return v.join(p, cond).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        "purchase_value",
        F.col("p_ts"),
        F.col("v_ts"),
    )


SESSION_GAP_MIN = 30

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp_ntz, session_end timestamp_ntz, "
    "n_events bigint"
)
# state carried per user: the open session (epoch-µs bounds + count)
SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"


def _sessionize_fn(key, pdfs, state):
    """Custom stateful operator body (applyInPandasWithState): replay a
    user's events in timestamp order against the open-session state;
    whenever the gap to the previous event exceeds the threshold, EMIT
    the closed session and open a new one.

    Emission happens ONLY on closure-by-next-event, never on timeout —
    that makes the emitted relation a pure function of the input (each
    user's non-final sessions), independent of micro-batch boundaries
    and watermark timing, which is what lets a real streaming run sit
    behind a batch-SQL correctness gate.  Production would ALSO set
    GroupStateTimeout.EventTimeTimeout to flush a final session once
    the watermark passes last_ts + gap (any later event necessarily
    opens a new session, so the flush is safe) and thereby bound state
    churn; state size is O(1) per user either way.
    """
    import pandas as pd

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = None, None, 0
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            t_us = ts.value // 1_000  # pandas ns → µs
            if start_us is None:
                start_us, last_us, n = t_us, t_us, 1
            elif t_us - last_us > gap_us:
                out.append((key[0], start_us, last_us, n))
                start_us, last_us, n = t_us, t_us, 1
            else:
                last_us, n = t_us, n + 1
    state.update((start_us, last_us, n))
    if not out:
        return iter(())
    df = pd.DataFrame(
        out, columns=["user_id", "start_us", "last_us", "n_events"]
    )
    return iter(
        [
            pd.DataFrame(
                {
                    "user_id": df["user_id"].astype("int64"),
                    "session_start": pd.to_datetime(df["start_us"], unit="us"),
                    "session_end": pd.to_datetime(df["last_us"], unit="us"),
                    "n_events": df["n_events"].astype("int64"),
                }
            )
        ]
    )


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessionization as a CUSTOM STATEFUL streaming operator
    (``applyInPandasWithState``) — the semantics ``session_window``
    cannot express when the per-session reduction needs imperative
    logic (here a faithful sequential replay; in production, e.g.
    per-session feature vectors or fraud scores).

    Scale shape: state is one open-session record per active user
    (O(|active users|) total, independent of history length); each
    micro-batch shuffles only its own rows by user_id.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        # watermarks require TIMESTAMP (not NTZ); session tz is pinned
        # UTC engine-wide, so the cast preserves the wall clock.
        events.select(
            "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
        )
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
