"""Streaming ingestion building blocks.

Batch/stream symmetry is deliberate: the windowed aggregation here is
the same ``F.window`` construct the batch inventory uses
(q40_tumbling_window), so a pipeline can promote a batch query to a
stream by swapping ``read`` → ``readStream``.
"""

from __future__ import annotations

import os

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


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 state-v2 API): running per-key totals
# ---------------------------------------------------------------------------

RUNNING_TOTALS_OUTPUT_SCHEMA = "user_id long, n long, sum_micros long"

# The state-v2 Python workers speak protobuf to the JVM state server
# (pyspark/sql/streaming/proto/StateMessage_pb2).  This container has
# no pip-installed protobuf, but ships one inside the system
# google-cloud-sdk — point the WORKER processes at it.  Worker env is
# sourced from ``sc.environment`` at UDF-wrap time (PythonFunction
# envVars; the JVM's PythonWorkerFactory merges its PYTHONPATH into
# the worker's), so a runtime mutation here works even when the JVM
# was started by a harness we don't control.
_SYSTEM_PROTOBUF_PATH = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def ensure_protobuf_worker_env(spark: SparkSession):
    """Make ``google.protobuf`` importable in Python workers.

    No-op when protobuf is a real site-package (workers share the
    driver interpreter's site-packages).  Otherwise prepend the
    system-bundled copy to the worker PYTHONPATH and set protobuf's
    official version-skew escape hatch (the bundled runtime can trail
    the gencode pyspark ships by one minor version).  Raises
    :class:`EngineError` when no protobuf runtime exists at all —
    transformWithState is honestly unavailable then, never fake-green.

    Returns a zero-arg ``restore()`` that undoes the
    ``sc.environment`` mutation — the same save/restore discipline
    st07/q111 apply to SQL confs.  Worker env is SNAPSHOT into the
    plan's ``SimplePythonFunction`` at UDF-wrap time
    (``pyspark.rdd._wrap_function`` → ``_prepare_for_python_RDD``
    passes the dict to py4j, which copies it into a Java map), so the
    caller can restore as soon as the stateful DataFrame is BUILT and
    later UDFs in the session no longer inherit the relaxed
    version-check.
    """
    import os

    try:
        import google.protobuf  # noqa: F401

        return lambda: None
    except ImportError:
        pass
    if not os.path.isdir(f"{_SYSTEM_PROTOBUF_PATH}/google/protobuf"):
        from flaco_spark.errors import EngineError

        raise EngineError(
            "transformWithStateInPandas needs the google.protobuf runtime "
            "(pip package `protobuf`, or a system copy); none found"
        )
    env = spark.sparkContext.environment
    saved = {k: env.get(k) for k in ("PYTHONPATH", "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK")}
    cur = env.get("PYTHONPATH", "")
    if _SYSTEM_PROTOBUF_PATH not in cur:
        # APPEND after any user-provided entries (any PYTHONPATH dir
        # precedes site-packages either way; the sdk dir's top-level
        # names — api_server, dev_appserver, lib, … — collide with no
        # stdlib or dependency module, verified by listing).
        env["PYTHONPATH"] = (
            f"{cur}:{_SYSTEM_PROTOBUF_PATH}" if cur else _SYSTEM_PROTOBUF_PATH
        )
    env["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"

    def restore() -> None:
        for k, v in saved.items():
            if v is None:
                env.pop(k, None)
            else:
                env[k] = v

    return restore


class RunningTotalsProcessor:
    """Spark 4 ``StatefulProcessor``: per-user running (count, sum).

    The state-v2 surface (``transformWithStateInPandas``) that
    supersedes ``applyInPandasWithState`` (st04): named, composable
    state variables (ValueState/ListState/MapState, optional TTL) on
    an explicit lifecycle (init/handleInputRows/close) instead of one
    opaque tuple.  Each batch the processor folds the user's new rows
    into a ``ValueState`` and emits ONE row with the totals SO FAR.

    Emissions are cumulative and therefore MONOTONIC in ``n`` — per
    user, the emission with the largest ``n`` is the final total no
    matter how the bounded replay was carved into micro-batches.
    That monotonicity is what lets a real streaming run sit behind a
    batch-SQL correctness gate (take argmax-by-n per user downstream).

    Scale shape: state is one (count, sum) pair per key — O(|users|),
    independent of history; each micro-batch shuffles only its own
    rows by key.  This is the canonical state-v2 use: running feature
    aggregates (lifetime value, event counters) kept queryable across
    an unbounded feed.
    """

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "n long, s long")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, s = (self._totals.get() or (0, 0)) if self._totals.exists() else (0, 0)
        for pdf in rows:
            n += int(len(pdf))
            s += int(pdf["micros"].sum())
        self._totals.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "sum_micros": [s]})

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) via ``transformWithStateInPandas``.

    The money column is converted to exact integer micros JVM-side
    BEFORE the Python boundary (decimal cast, no float summation in
    pandas), so the running sum is exact at any scale.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    restore_env = ensure_protobuf_worker_env(events.sparkSession)
    # subclass dynamically so importing this module never hard-requires
    # the state-v2 API (present in Spark >= 4.0)
    proc = type("_RunningTotals", (RunningTotalsProcessor, StatefulProcessor), {})()
    try:
        return (
            events.select(
                "user_id",
                (F.col("value").cast("decimal(18,6)") * 1_000_000)
                .cast("bigint")
                .alias("micros"),
            )
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=proc,
                outputStructType=RUNNING_TOTALS_OUTPUT_SCHEMA,
                outputMode="append",
                timeMode="none",
            )
        )
    finally:
        # the built plan holds its own env snapshot (see the helper's
        # docstring); the session-global mutation ends with the build
        restore_env()


# ---------------------------------------------------------------------------
# foreachBatch exactly-once MERGE sink (the production CDC apply)
# ---------------------------------------------------------------------------


def _snapshot_current(snap_dir: str) -> str | None:
    """Resolve the snapshot root's CURRENT pointer to a version dir.

    Returns None only when no version has ever been committed (no
    pointer file).  A pointer naming a missing directory is CORRUPTION
    — the commit protocol below can never produce it — so it raises
    loudly instead of silently restarting the merge from scratch.
    """
    ptr = os.path.join(snap_dir, "CURRENT")
    if not os.path.isfile(ptr):
        return None
    with open(ptr, encoding="utf-8") as f:
        name = f.read().strip()
    path = os.path.join(snap_dir, name)
    if not os.path.isdir(path):
        from flaco_spark.errors import EngineError

        raise EngineError(
            f"snapshot pointer {ptr} names missing version {name!r} — "
            "refusing to rebuild state from one batch"
        )
    return path


def read_snapshot(spark, snap_dir: str) -> DataFrame:
    """Read the committed state of a :func:`foreachbatch_upsert` snapshot."""
    cur = _snapshot_current(snap_dir)
    if cur is None:
        from flaco_spark.errors import EngineError

        raise EngineError(f"no committed snapshot under {snap_dir}")
    return spark.read.parquet(cur)


def foreachbatch_upsert(events: DataFrame, snap_dir: str, checkpoint_dir: str):
    """Stream → keyed snapshot via ``foreachBatch`` MERGE: each
    micro-batch upserts latest-record-per-user into a parquet
    snapshot.  ``snap_dir`` is a snapshot ROOT: version directories
    ``v{batch_id}`` plus a ``CURRENT`` pointer file committed by
    atomic ``os.replace`` — local parquet has no txn log, so the
    pointer stands in for the Delta/Iceberg commit.  Batches may
    arrive in ANY time order: the merge keeps the global
    (ts, event_id) argmax per key, so the drained snapshot is a pure
    function of the input set — q69's latest-record relation —
    independent of batch carving.

    Failure contract (the exactly-once story, crash at ANY point):

    - "no snapshot yet" is detected by EXPLICIT pointer absence, never
      by catching read errors — a corrupt or half-written version can
      therefore never be mistaken for a fresh start and silently drop
      prior upserts.
    - the pointer is only advanced AFTER its version dir is fully
      written, via atomic rename, so a reader always sees a complete
      snapshot and the previous version survives until the commit.
    - a crash between the pointer commit and the checkpoint commit
      replays the same batch_id; the pointer already naming
      ``v{batch_id}`` short-circuits it (idempotent re-apply).

    Returns the StreamingQuery (caller awaits, then reads via
    :func:`read_snapshot`).  State posture at 100 TB/day: the snapshot
    is the state, stored in the lake not the state store; each batch's
    work is one window over |batch| + a merge against the snapshot
    (file-pruned to touched keys under a real table format).
    """
    os.makedirs(snap_dir, exist_ok=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        apply_upsert_batch(batch_df, batch_id, snap_dir)

    return (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def apply_upsert_batch(batch_df: DataFrame, batch_id: int, snap_dir: str) -> bool:
    """One micro-batch of :func:`foreachbatch_upsert`'s MERGE protocol.

    Module-level (not a closure) so the checkpoint-replay short-circuit
    is directly unit-testable: re-applying an already-committed
    ``batch_id`` must return False and leave the snapshot untouched.
    Returns True when a new version was committed.
    """
    import shutil as _sh

    from pyspark.sql import Window as W

    latest_w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    cur = _snapshot_current(snap_dir)
    vname = f"v{batch_id}"
    if cur is not None and os.path.basename(cur) == vname:
        return False  # checkpoint replay of an already-committed batch
    incoming = (
        batch_df.withColumn("rn", F.row_number().over(latest_w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "value")
    )
    if cur is not None:
        current = batch_df.sparkSession.read.parquet(cur)
        merged = (
            current.unionByName(incoming)
            .withColumn("rn", F.row_number().over(latest_w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
    else:
        merged = incoming
    vdir = os.path.join(snap_dir, vname)
    merged.write.mode("overwrite").parquet(vdir)
    ptr = os.path.join(snap_dir, "CURRENT")
    ptr_tmp = f"{ptr}.tmp.{batch_id}"
    with open(ptr_tmp, "w", encoding="utf-8") as f:
        f.write(vname)
    os.replace(ptr_tmp, ptr)  # the commit: atomic, never leaves no pointer
    if cur is not None:
        _sh.rmtree(cur, ignore_errors=True)  # GC; stray dirs are harmless
    return True
