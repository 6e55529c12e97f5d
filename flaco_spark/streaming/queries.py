"""Structured Streaming executions registered as oracle-checked queries.

Every other streaming surface in this repo is exercised by pytest
(batch/stream symmetry tests); these two entries go further and put a
REAL streaming execution behind the driver's DuckDB correctness gate:
the builder runs an actual ``readStream`` job (file source →
``availableNow`` trigger → memory sink, exactly-once checkpointing),
then returns the drained sink table, whose contents must hash-match
the batch-SQL oracle.  This is the replayed-bounded-stream equivalence
that makes Structured Streaming's semantics testable at all: for a
finite input with no late data, a streaming aggregation in complete
mode and its batch counterpart are THE SAME RELATION.

Scale notes: the file source lists and checkpoints file batches, so at
100 TB the same topology is an incremental backfill (availableNow
drains the backlog in bounded batches and exits); the memory sink is
test-only — production writes parquet/Kafka (see
:func:`flaco_spark.streaming.ingest.stream_parquet_sink`).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flaco_spark.inventory import register
from flaco_spark.localrel import local_relation
from flaco_spark.streaming.ingest import dedup_stream, windowed_event_counts
from flaco_spark.tables import convert_event_ts


def _events_stream(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """Bounded events stream: copy the fixture into a private source
    dir (the file source tracks directories) and open a readStream
    over it.  Returns (stream, scratch_dir)."""
    scratch = tempfile.mkdtemp(prefix="flaco_stream_")
    src_dir = f"{scratch}/src"
    src = f"{sf_dir}/events.parquet"
    # the fixture is a single file at the driver's SF dirs but a
    # Spark-written DIRECTORY in scaled probes — mirror either shape.
    # r13: symlink instead of copying bytes — the file source only
    # LISTS and READS the staged dir; what must be private is the
    # directory identity the source tracks, not the file contents
    # (fallback to a real copy where symlinks are unavailable).
    if os.path.isdir(src):
        shutil.copytree(src, src_dir)
    else:
        os.mkdir(src_dir)
        try:
            os.symlink(src, f"{src_dir}/events.parquet")
        except OSError:
            shutil.copy(src, f"{src_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(src_dir)
    return convert_event_ts(stream), scratch


# One streaming state partition per this many bytes of bounded-replay
# input (r13, guide §2.2/§5): Structured Streaming has no AQE — the
# number of state-store instances (= streaming shuffle partitions) is
# frozen from spark.sql.shuffle.partitions at the first micro-batch,
# which our session sizes to the CORE COUNT.  At sf0.1 that meant 32
# state stores, 32 delta-file commits and 32 tasks per micro-batch
# for ~3600 state rows (measured: commit time was the bulk of
# addBatch).  Deriving the count from the staged input size is the
# same input-proportional rule AQE applies to batch exchanges, so it
# scales: a 100 TB backfill gets thousands of state partitions, a
# megabyte fixture gets one.
_STATE_PART_BYTES = 32 << 20
_STATE_PART_MAX = 32768


def _scaled_state_partitions(scratch: str) -> int | None:
    """Streaming shuffle-partition count derived from the bytes staged
    under ``{scratch}/src``; None when the size cannot be read."""
    src_dir = os.path.join(scratch, "src")
    try:
        nbytes = 0
        for root, _dirs, files in os.walk(src_dir):
            for f in files:
                nbytes += os.stat(os.path.join(root, f)).st_size
    except OSError:
        return None
    return max(1, min(nbytes // _STATE_PART_BYTES + 1, _STATE_PART_MAX))


def _drain(
    stream_df: DataFrame, scratch: str, mode: str, prefix: str,
    min_parts: int = 1,
) -> DataFrame:
    """Run the streaming query to completion (availableNow) into a
    memory sink and return the sink table.

    ``min_parts`` floors the derived partition count — Python
    stateful operators (applyInPandasWithState / transformWithState)
    do their per-KEY work in Python workers, so their partition count
    must cover the executor parallelism regardless of input bytes
    (guide §4: the Python boundary needs the parallelism; measured:
    st04 at 1 partition serialized ~1500 user groups through one
    worker, 1.8 -> 7.4 s)."""
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    spark = stream_df.sparkSession
    n_parts = _scaled_state_partitions(scratch)
    if n_parts is not None and min_parts > 1:
        n_parts = max(n_parts, min_parts)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if n_parts is not None:
            # scoped to this query's planning: restored right after the
            # drain, before the sink table is read
            spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", f"{scratch}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        # The memory sink owns the rows (on success); the staged source
        # copy and checkpoint are dead weight either way — reclaim them
        # even when the query fails.
        shutil.rmtree(scratch, ignore_errors=True)
    return stream_df.sparkSession.table(name)


@register(
    "st01_stream_windowed_counts",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2, 3
""",
    tags=("streaming", "window", "events"),
    doc="REAL Structured Streaming execution behind the correctness "
    "gate: a readStream file source drains the events fixture through "
    "a watermarked tumbling-window count (availableNow trigger, "
    "exactly-once checkpoint, memory sink in complete mode) and the "
    "drained sink must hash-match the batch SQL — the bounded-replay "
    "equivalence that lets a pipeline promote q40's batch window to "
    "a stream by swapping read → readStream with NO semantic change.  "
    "Complete mode sidesteps append mode's last-window retention "
    "(windows past the final watermark never emit in append — the "
    "classic bounded-replay pitfall).",
)
def st01_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream, scratch = _events_stream(spark, sf_dir)
    counts = windowed_event_counts(stream)
    sink = _drain(counts, scratch, "complete", "st01")
    return sink.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        "n",
    )


@register(
    "st02_stream_dedup_keys",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
    tags=("streaming", "dedup", "events"),
    doc="Streaming deduplication with BOUNDED state "
    "(dropDuplicatesWithinWatermark) behind the correctness gate: "
    "the emitted key set must equal the batch DISTINCT — which row "
    "represents a key is engine-chosen (append mode emits first "
    "arrival), so the checked relation is the key set itself.  "
    "Bounded state is what makes streaming dedup survive at "
    "100 TB/day: a key leaves state when the watermark passes it, "
    "where plain streaming dropDuplicates retains every key forever "
    "(the classic unbounded-state production failure).",
)
def st02_stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream, scratch = _events_stream(spark, sf_dir)
    deduped = dedup_stream(stream).select("user_id", "event_type")
    sink = _drain(deduped, scratch, "append", "st02")
    return sink.select("user_id", "event_type").distinct()


@register(
    "st03_stream_attribution_join",
    oracle="""
SELECT p.user_id,
       p.event_id AS purchase_id,
       v.event_id AS view_id,
       CAST(p.value AS DOUBLE) AS purchase_value
FROM events p
JOIN events v ON v.user_id = p.user_id
             AND v.ts <= p.ts
             AND v.ts >= p.ts - INTERVAL 1 HOUR
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
""",
    tags=("streaming", "join", "events"),
    doc="Watermarked STREAM-STREAM interval join behind the "
    "correctness gate: purchases attribute to same-user views within "
    "the preceding hour, run as a real two-readStream job (each side "
    "its own file source + watermark) drained availableNow into a "
    "memory sink, hash-matched to the batch interval-join SQL.  In "
    "append mode an inner stream-stream join emits every matched "
    "pair exactly once; the watermark + time-range predicate bound "
    "join STATE (O(rate × lag), independent of history) without "
    "changing the emitted relation on bounded replay — the property "
    "that lets the identical query run forever on a 100 TB/day feed.",
)
def st03_stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views, scratch = _events_stream(spark, sf_dir)
    # second, independent stream over the same fixture (own source dir
    # + checkpoint, as two real feeds would be)
    purchases, scratch2 = _events_stream(spark, sf_dir)
    from flaco_spark.streaming.ingest import attribution_join

    joined = attribution_join(
        views.filter(F.col("event_type") == "view"),
        purchases.filter(F.col("event_type") == "purchase"),
    )
    try:
        sink = _drain(joined, scratch, "append", "st03")
    finally:
        shutil.rmtree(scratch2, ignore_errors=True)
    return sink.select(
        "user_id",
        "purchase_id",
        "view_id",
        F.col("purchase_value").cast("double").alias("purchase_value"),
    )


@register(
    "st04_stateful_sessionization",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
),
agg AS (
  SELECT user_id, sid,
         MIN(ts) AS session_start, MAX(ts) AS session_end,
         COUNT(*) AS n_events,
         MAX(sid) OVER (PARTITION BY user_id) AS last_sid
  FROM sess GROUP BY user_id, sid
)
SELECT user_id,
       strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(n_events AS BIGINT) AS n_events
FROM agg WHERE sid < last_sid
""",
    tags=("streaming", "stateful", "session", "events"),
    doc="CUSTOM STATEFUL streaming operator behind the correctness "
    "gate: gap-based sessionization via applyInPandasWithState (one "
    "open-session record per user as explicit state, sequential "
    "replay per micro-batch) run as a REAL readStream job and "
    "hash-matched against batch-SQL sessionization.  Emission is "
    "closure-by-next-event only, so the emitted relation — every "
    "user's non-final sessions — is a pure function of the input, "
    "independent of micro-batch boundaries and watermark timing "
    "(final sessions are exactly the ones a production deployment "
    "flushes by EventTimeTimeout; the gate pins the part that is "
    "deterministic under bounded replay).  This is the surface "
    "session_window cannot express once the per-session logic is "
    "imperative — the 'custom stateful operator' lane of Structured "
    "Streaming.",
)
def st04_stateful_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flaco_spark.streaming.ingest import sessionize_stream

    stream, scratch = _events_stream(spark, sf_dir)
    sessions = sessionize_stream(stream)
    sink = _drain(
        sessions, scratch, "append", "st04",
        min_parts=spark.sparkContext.defaultParallelism,
    )
    return sink.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


# Static enrichment dimension for st05: event_type → (funnel stage,
# engagement weight).  A literal dim keeps the query self-contained;
# in production this is any slowly-changing reference table (user
# segments, geo lookup, model-version routing) re-read per micro-batch.
_ST05_DIM = [
    ("view", "top", 1),
    ("click", "mid", 3),
    ("signup", "bottom", 10),
    ("purchase", "bottom", 25),
    ("error", "ops", 0),
]


@register(
    "st05_stream_static_enrichment",
    oracle="""
WITH dim(event_type, stage, weight) AS (
  VALUES ('view', 'top', 1), ('click', 'mid', 3), ('signup', 'bottom', 10),
         ('purchase', 'bottom', 25), ('error', 'ops', 0)
)
SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       d.stage,
       COUNT(*) AS n,
       CAST(SUM(CAST(d.weight AS BIGINT)) AS BIGINT) AS engagement
FROM events e JOIN dim d USING (event_type)
GROUP BY 1, 2
""",
    tags=("streaming", "join", "enrichment", "events"),
    doc="Stream-STATIC broadcast enrichment behind the correctness "
    "gate: the events readStream joins a static reference dimension "
    "(event_type → funnel stage / engagement weight) and aggregates "
    "weighted counts per tumbling hour, drained availableNow into a "
    "complete-mode memory sink and hash-matched to the batch SQL "
    "with an inline VALUES dim.  Stream-static joins need NO "
    "watermark and NO join state: the static side is broadcast to "
    "every micro-batch (re-resolved per batch, so a slowly-changing "
    "dim picks up updates between batches) — the cheapest and most "
    "common streaming join shape at 100 TB/day, and the one to reach "
    "for before any stream-stream topology (st03) when one side is "
    "reference data.",
)
def st05_stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream, scratch = _events_stream(spark, sf_dir)
    dim = local_relation(spark, _ST05_DIM, "event_type string, stage string, weight int")
    enriched = stream.join(F.broadcast(dim), "event_type").groupBy(
        F.window("ts", "1 hour").alias("w"), "stage"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("weight").cast("bigint")).alias("engagement"),
    )
    sink = _drain(enriched, scratch, "complete", "st05")
    return sink.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "stage",
        "n",
        "engagement",
    )


@register(
    "st06_stream_parquet_sink",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000) AS BIGINT) AS value_micros
FROM events WHERE event_type <> 'error'
GROUP BY 1, 2
""",
    tags=("streaming", "sink", "parquet", "events"),
    doc="The PRODUCTION streaming sink under the correctness gate: "
    "the events readStream runs a stateless map-side transform "
    "(error-drop filter + hour/decimal derivation) and lands as "
    "PARQUET FILES with exactly-once checkpoint bookkeeping "
    "(st01-st05 use the test-only memory sink; this is the path a "
    "deployment actually ships).  The gate then BATCH-reads the "
    "files the stream wrote and aggregates — hash-matching the "
    "batch SQL proves no micro-batch was lost, duplicated, or "
    "reordered into a different relation.  Stateless transforms "
    "need no watermark and emit in append mode with nothing held "
    "back, so the parquet output is replay-complete on a bounded "
    "source — the property that makes stream-to-lake backfills "
    "(availableNow over a backlog) safe.  At 100 TB/day this exact "
    "topology is the bronze-layer ingest; the aggregate here stands "
    "in for every downstream batch reader.",
)
def st06_stream_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    from flaco_spark.streaming.ingest import stream_parquet_sink

    scratch = tempfile.mkdtemp(prefix="flaco_st06_")
    src_dir = f"{scratch}/src"
    src = f"{sf_dir}/events.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, src_dir)
    else:
        _os.mkdir(src_dir)
        shutil.copy(src, f"{src_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    out_dir = f"{scratch}/bronze"
    try:
        q = stream_parquet_sink(
            spark,
            src_dir,
            raw_schema,
            out_dir,
            f"{scratch}/ckpt",
            transform=lambda s: convert_event_ts(s)
            .filter(F.col("event_type") != "error")
            .select(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                    "hour"
                ),
                "event_type",
                (F.col("value").cast("decimal(18,6)") * 1_000_000)
                .cast("bigint")
                .alias("micros"),
            ),
        )
        q.awaitTermination()
        agg = (
            spark.read.parquet(out_dir)
            .groupBy("hour", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("micros").cast("bigint").alias("value_micros"),
            )
        )
        rows = agg.collect()
        return local_relation(spark, rows, agg.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "st07_transform_with_state",
    oracle="""
SELECT user_id,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT)
           AS sum_micros
FROM events
GROUP BY user_id
""",
    tags=("streaming", "stateful", "state-v2", "events"),
    doc="Spark 4 STATE-V2 custom stateful operator "
    "(transformWithStateInPandas) behind the correctness gate: a "
    "StatefulProcessor keeps per-user running (count, value-sum) in a "
    "named ValueState and emits the cumulative totals each "
    "micro-batch; emissions are monotonic in n, so argmax-by-n per "
    "user is the final total regardless of how the bounded replay was "
    "carved into batches — that reduction (max / max_by) turns a real "
    "readStream execution into a deterministic relation hash-matched "
    "against the batch GROUP BY.  Money flows as exact integer micros "
    "(decimal cast JVM-side, integer sums in state) — no float drift "
    "across engines.  This is the lifecycle API that supersedes "
    "applyInPandasWithState (st04): named composable state variables "
    "with optional TTL, timers, and init/close hooks.",
)
def st07_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flaco_spark.streaming.ingest import running_totals_stream

    # state-v2 requires the RocksDB state store (multiple column
    # families); pin it for this query only and restore the session
    # default after — st01-st06 keep the HDFS-backed provider.
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        stream, scratch = _events_stream(spark, sf_dir)
        totals = running_totals_stream(stream)
        # Python stateful operator: keep the executor parallelism
        # (see _drain's min_parts note); fewer partitions also means
        # fewer RocksDB instances, but the per-key Python work is the
        # measured dominant cost class for this operator family.
        sink = _drain(
            totals, scratch, "append", "st07",
            min_parts=spark.sparkContext.defaultParallelism,
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return sink.groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.max_by("sum_micros", "n").alias("sum_micros"),
    )


@register(
    "st08_python_stream_source",
    oracle="""
SELECT i, (i * i) % 97 AS v FROM range(0, 1000) t(i)
""",
    tags=("streaming", "datasource", "source", "python"),
    doc="STREAMING Python data source (Spark 4 "
    "SimpleDataSourceStreamReader) behind the correctness gate: a "
    "pure-Python source advances a checkpointed offset cursor 250 "
    "rows per micro-batch to a 1000-row bound (row k = (k, k*k%97)), "
    "drained through a real multi-micro-batch streaming run into a "
    "memory sink — the emitted relation must equal the closed-form "
    "SQL, proving no offset range was lost, duplicated, or replayed "
    "into a different relation (readBetweenOffsets is the recovery "
    "path that makes the source exactly-once).  This is the API a "
    "queue or feed WITHOUT a built-in Spark connector plugs into — "
    "the streaming complement of u10's batch DataSource; Spark owns "
    "offset checkpointing, the source only answers read(start).  The "
    "drain loop polls the sink and stops at the bound — the bounded "
    "stand-in for a forever-running deployment.",
)
def st08_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import time

    from flaco_spark.sources.pyds import register_counter_stream

    register_counter_stream(spark)
    scratch = tempfile.mkdtemp(prefix="flaco_st08_")
    name = f"st08_{uuid.uuid4().hex[:8]}"
    limit = 1000
    stream = spark.readStream.format("counter_stream").option("limit", limit).load()
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{scratch}/ckpt")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).count() >= limit:
                break
            time.sleep(0.3)
        else:
            raise TimeoutError("st08: counter stream did not drain in 120 s")
    finally:
        q.stop()
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.table(name)


@register(
    "st09_foreachbatch_upsert",
    oracle="""
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CAST(value AS DOUBLE) AS value
FROM (
  SELECT user_id, event_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
    tags=("streaming", "foreachbatch", "merge", "cdc", "events"),
    doc="foreachBatch exactly-once MERGE behind the correctness gate "
    "— the PRODUCTION streaming-CDC apply pattern (q67's MERGE run "
    "per micro-batch): the events fixture is split into THREE "
    "slices drained one per micro-batch (maxFilesPerTrigger=1), "
    "deliberately NOT in time order, and each batch upserts "
    "latest-record-per-user into a rewrite-and-swap parquet "
    "snapshot; the drained snapshot must hash-match q69's batch "
    "latest-record SQL, proving the merge converges to the same "
    "relation under ANY batch carving and arrival order.  This "
    "completes the streaming lane's sink trio: memory (test), "
    "append parquet (st06 — immutable facts), foreachBatch MERGE "
    "(keyed mutable state in the lake, the Delta/Iceberg-shaped "
    "deployment).",
)
def st09_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob

    from flaco_spark.streaming.ingest import foreachbatch_upsert
    from flaco_spark.tables import table as _table

    scratch = tempfile.mkdtemp(prefix="flaco_st09_")
    src_dir = f"{scratch}/src"
    os.mkdir(src_dir)
    events = _table(spark, sf_dir, "events")
    # three disjoint slices, one file each — replayed out of time order
    for i in range(3):
        events.filter(F.pmod("event_id", F.lit(3)) == i).coalesce(1).write.parquet(
            f"{scratch}/part{i}"
        )
        [pf] = glob.glob(f"{scratch}/part{i}/*.parquet")
        shutil.copy(pf, f"{src_dir}/slice{i}.parquet")
    snap_dir = f"{scratch}/snapshot"
    try:
        raw_schema = events.schema
        stream = (
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
            .select("user_id", "event_id", "ts", "value")
        )
        q = foreachbatch_upsert(stream, snap_dir, f"{scratch}/ckpt")
        q.awaitTermination()
        from flaco_spark.streaming.ingest import read_snapshot

        snap = read_snapshot(spark, snap_dir).select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.col("value").cast("double").alias("value"),
        )
        rows = snap.collect()
        return local_relation(spark, rows, snap.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "st10_chained_stream_aggs",
    oracle="""
WITH wm AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS w FROM events),
hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
kept AS (
  SELECT h, event_type, n FROM hourly CROSS JOIN wm
  WHERE h + INTERVAL 1 HOUR <= w
),
daily AS (
  SELECT date_trunc('day', h) AS d, event_type,
         SUM(n) AS total, COUNT(*) AS n_hours
  FROM kept GROUP BY 1, 2
)
SELECT strftime(d, '%Y-%m-%d') AS day, event_type,
       CAST(total AS BIGINT) AS total,
       CAST(n_hours AS BIGINT) AS n_hours
FROM daily CROSS JOIN wm WHERE d + INTERVAL 1 DAY <= w
""",
    tags=("streaming", "multi-stateful", "window", "events"),
    doc="CHAINED stateful streaming aggregations in ONE query (the "
    "multiple-stateful-operator support added in Spark 3.4): "
    "watermarked hourly counts per event type feed a SECOND "
    "windowed aggregation — daily totals over window_time() of the "
    "hourly windows — with both stateful operators in a single "
    "append-mode availableNow run, no intermediate sink.  The "
    "oracle pins the BOUNDED-REPLAY SEMANTICS exactly: a window "
    "emits iff its end ≤ final watermark (max event time − 10 min), "
    "applied at BOTH levels — the last partial day and the trailing "
    "partial hours are withheld, which is precisely what a resumed "
    "production run would later emit.  Before 3.4 this topology "
    "required two jobs and a Kafka/parquet hop between them; the "
    "single-query form checkpoints both state stores atomically.  "
    "100 TB posture: state is |open hourly windows| + |open daily "
    "windows| per key — rate-independent; the second agg's input "
    "is already hour-grained, so its shuffle is metadata-sized.",
)
def st10_chained_stream_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream, scratch = _events_stream(spark, sf_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    hourly = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w1"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    daily = (
        hourly.groupBy(
            F.window(F.window_time("w1"), "1 day").alias("w2"), "event_type"
        )
        .agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_hours"))
    )
    sink = _drain(daily, scratch, "append", "st10")
    return sink.select(
        F.date_format(F.col("w2.start"), "yyyy-MM-dd").alias("day"),
        "event_type",
        F.col("total").cast("bigint").alias("total"),
        F.col("n_hours").cast("bigint").alias("n_hours"),
    )


@register(
    "st11_session_window_agg",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
),
agg AS (
  SELECT user_id,
         MIN(ts) AS session_start,
         MAX(ts) + INTERVAL 30 MINUTE AS session_end,
         COUNT(*) AS n_events
  FROM sess GROUP BY user_id, sid
)
SELECT user_id,
       strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(n_events AS BIGINT) AS n_events
FROM agg
""",
    tags=("streaming", "session-window", "events"),
    doc="NATIVE session-window streaming aggregation "
    "(``F.session_window``, Spark 3.2+) behind the correctness gate "
    "— the DECLARATIVE counterpart to st04's imperative "
    "applyInPandasWithState sessionization, exercising a different "
    "execution path entirely: the state store's session-merge "
    "operator (sort-merge of overlapping [start, last+gap) "
    "intervals inside the state store) rather than user-code state. "
    "Complete-mode drain emits EVERY session including each user's "
    "final one (st04's append-mode contract must withhold those), "
    "so the oracle is the full gaps-and-islands relation with the "
    "session end extended by the gap — exactly session_window's "
    "[first_event, last_event + gap] window.  Gap-boundary "
    "semantics are MEASURED, not assumed (r7 property-test find, "
    "reversing this doc's earlier half-open claim): the state "
    "store's session merge is closed at the boundary — an event at "
    "exactly last + gap JOINS the session — so the oracle opens a "
    "new session only when the delta is strictly > the gap "
    "(deterministic 29/30/31-min probes pinned in "
    "tests/test_property_differential.py).  100 TB posture: "
    "state is |open sessions| per user (rate-independent); "
    "production uses append mode + watermark to evict closed "
    "sessions, complete mode here is the bounded-replay gate "
    "harness.",
)
def st11_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream, scratch = _events_stream(spark, sf_dir)
    sessions = stream.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    sink = _drain(sessions, scratch, "complete", "st11")
    return sink.select(
        "user_id",
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


@register(
    "st12_sliding_window_counts",
    oracle="""
WITH offs AS (SELECT i AS k FROM generate_series(0, 1) AS g(i)),
assigned AS (
  SELECT date_trunc('hour', e.ts) - o.k * INTERVAL 1 HOUR AS w_start,
         e.event_type
  FROM events e CROSS JOIN offs o
)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(w_start + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM assigned
GROUP BY 1, 2, 3
""",
    tags=("streaming", "sliding-window", "events"),
    doc="SLIDING-window streaming aggregation (window duration 2h, "
    "slide 1h) behind the correctness gate — the overlapping-window "
    "state shape st01's tumbling windows never exercise: every "
    "event belongs to exactly duration/slide = 2 windows, so the "
    "stateful operator fans each input row into 2 window keys "
    "before the count state updates (this multiplicative state "
    "write is why production monitors pick slide ratios, not "
    "arbitrary slides).  The oracle replays the same assignment "
    "rule in batch SQL: window starts are the 2 hour-aligned "
    "instants w with w <= ts < w + 2h, i.e. trunc(ts) - k hours "
    "for k in {0, 1}.  Complete-mode drain as in st01 (bounded "
    "replay emits every window).  100 TB posture: state is |open "
    "windows x keys| — rate-independent; the fan-out factor is the "
    "fixed integer 2, applied map-side before the shuffle.",
)
def st12_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream, scratch = _events_stream(spark, sf_dir)
    counts = stream.groupBy(
        F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    sink = _drain(counts, scratch, "complete", "st12")
    return sink.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
    )


@register(
    "p04_stream_ingest_pipeline",
    oracle="""
WITH dim(event_type, stage, weight) AS (
  VALUES ('view', 'top', 1), ('click', 'mid', 3), ('signup', 'bottom', 10),
         ('purchase', 'bottom', 25), ('error', 'ops', 0)
),
wm AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS final_wm FROM events),
silver AS (
  SELECT date_trunc('hour', e.ts) AS w_start, d.stage,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(d.weight AS BIGINT)) AS BIGINT) AS engagement,
         CAST(SUM(CAST(e.value AS DECIMAL(18,6)) * 1000000) AS BIGINT) AS value_micros
  FROM events e
  JOIN dim d USING (event_type)
  CROSS JOIN wm
  WHERE e.event_type <> 'error' AND e.user_id IS NOT NULL
    AND date_trunc('hour', e.ts) + INTERVAL 1 HOUR <= wm.final_wm
  GROUP BY 1, 2
)
SELECT stage,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(n) AS BIGINT) AS total_n,
       CAST(SUM(engagement) AS BIGINT) AS total_engagement,
       CAST(SUM(value_micros) AS BIGINT) AS total_value_micros
FROM silver GROUP BY stage
""",
    tags=("streaming", "pipeline", "flagship", "events"),
    doc="FLAGSHIP #4 — the streaming bronze→silver ingest pipeline "
    "as ONE oracle-gated run: a real events readStream passes a "
    "quality gate (error-drop + null-user drop), broadcast "
    "stream-static enrichment (st05's funnel dim), and a WATERMARKED "
    "hourly windowed aggregate per funnel stage (real stateful "
    "operator, 10-min watermark, append mode), lands as PARQUET "
    "files with exactly-once checkpointing, and is then BATCH-read "
    "back and rolled up per stage — proving the files a downstream "
    "consumer sees are exactly the batch relation.  Append-mode "
    "emission is pinned the st10 way: only windows whose end <= the "
    "final watermark (max ts − 10 min) emit on bounded replay, and "
    "the oracle applies the same rule.  This is the composition a "
    "100 TB/day deployment actually ships (ingest → enrich → gate → "
    "rollup → lake); state is |open windows × stages| — "
    "rate-independent.",
)
def p04_stream_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flaco_spark.streaming.ingest import stream_parquet_sink

    scratch = tempfile.mkdtemp(prefix="flaco_p04_")
    src_dir = f"{scratch}/src"
    src = f"{sf_dir}/events.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, src_dir)
    else:
        os.mkdir(src_dir)
        shutil.copy(src, f"{src_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    out_dir = f"{scratch}/silver"
    dim = local_relation(
        spark, _ST05_DIM, "event_type string, stage string, weight int"
    )

    def transform(s: DataFrame) -> DataFrame:
        gated = (
            convert_event_ts(s)
            # watermarks require TIMESTAMP (not NTZ); session tz is
            # pinned UTC so the cast preserves instants (st10's rule)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .filter(
                (F.col("event_type") != "error") & F.col("user_id").isNotNull()
            )
            .join(F.broadcast(dim), "event_type")
        )
        return (
            gated.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "stage")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("weight").cast("bigint")).alias("engagement"),
                F.sum(F.col("value").cast("decimal(18,6)") * 1_000_000)
                .cast("bigint")
                .alias("value_micros"),
            )
            .select(F.col("w.start").alias("w_start"), "stage", "n", "engagement", "value_micros")
        )

    try:
        q = stream_parquet_sink(
            spark, src_dir, raw_schema, out_dir, f"{scratch}/ckpt", transform
        )
        q.awaitTermination()
        silver = spark.read.parquet(out_dir)
        agg = silver.groupBy("stage").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum("n").cast("bigint").alias("total_n"),
            F.sum("engagement").cast("bigint").alias("total_engagement"),
            F.sum("value_micros").cast("bigint").alias("total_value_micros"),
        )
        rows = agg.collect()
        return local_relation(spark, rows, agg.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "st13_outer_stream_join",
    oracle="""
WITH v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
w AS (SELECT LEAST((SELECT MAX(ts) FROM v), (SELECT MAX(ts) FROM p))
             - INTERVAL 2 HOUR AS wm),
j AS (
  SELECT v.event_id AS view_id, v.user_id, v.ts AS v_ts,
         p.event_id AS purchase_id
  FROM v LEFT JOIN p ON p.user_id = v.user_id
                    AND p.ts >= v.ts
                    AND p.ts <= v.ts + INTERVAL 1 HOUR
)
SELECT view_id, user_id, purchase_id,
       (purchase_id IS NOT NULL) AS converted
FROM j, w
WHERE purchase_id IS NOT NULL OR j.v_ts + INTERVAL 1 HOUR < w.wm
""",
    tags=("streaming", "join", "outer", "events"),
    doc="Watermarked LEFT-OUTER stream-stream join behind the "
    "correctness gate — the conversion-funnel shape st03's inner "
    "join cannot express: every view emits, WITH its purchase(s) "
    "within the following hour if any, else one NULL-padded row "
    "(the unconverted-view record ad/notification attribution "
    "actually bills on).  The outer semantics are the subtle part: "
    "a NULL row can only emit once the watermark proves no match "
    "can still arrive, so the emitted relation on a bounded replay "
    "is matched-pairs ∪ {unmatched views whose 1-hour match window "
    "closed below the FINAL watermark} — and the oracle states "
    "exactly that: watermark = min(max event time per side) − the "
    "2-hour delay, unmatched views kept iff v_ts + 1h < watermark "
    "(fixture timestamps are microsecond-grained, so the boundary "
    "equality case is measure-zero and checked absent at every "
    "driver SF).  Hash-equality against a REAL two-readStream "
    "availableNow run proves Spark's state-eviction/NULL-emission "
    "machinery implements that relation.  State is O(rate × lag) "
    "per side, independent of history — the 100 TB/day contract.",
)
def st13_outer_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views, scratch = _events_stream(spark, sf_dir)
    purch, scratch2 = _events_stream(spark, sf_dir)
    v = (
        views.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast("timestamp").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    p = (
        purch.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    joined = v.join(p, cond, "leftOuter")
    try:
        sink = _drain(joined, scratch, "append", "st13")
    finally:
        shutil.rmtree(scratch2, ignore_errors=True)
    return sink.select(
        "view_id",
        F.col("v_user").alias("user_id"),
        "purchase_id",
        F.col("purchase_id").isNotNull().alias("converted"),
    )


@register(
    "st14_stream_union",
    oracle="""
SELECT feed, event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS value_cents
FROM (
  SELECT 'feed_a' AS feed, event_type, value FROM events
  UNION ALL
  SELECT 'feed_b' AS feed, event_type, value FROM events
)
GROUP BY feed, event_type
""",
    tags=("streaming", "union", "events"),
    doc="Multi-SOURCE streaming topology behind the correctness "
    "gate: two independent readStream file sources (own directories "
    "and listings, as two real feeds — regions, kafka clusters, "
    "vendors — would be) union into ONE stateful aggregation, "
    "tagged with provenance so the gate proves rows neither leak "
    "across feeds nor drop at the merge.  Streaming union is "
    "append-only source composition — no state of its own; the "
    "downstream complete-mode count/exact-decimal-sum aggregate "
    "carries the state, sized |feeds × event types|.  This is the "
    "fan-in half of the ingest story (st06 is the fan-out sink "
    "half): at 100 TB/day per feed the union adds zero shuffles — "
    "each source's files scan straight into the shared partial "
    "aggregation.",
)
def st14_stream_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, scratch = _events_stream(spark, sf_dir)
    b, scratch2 = _events_stream(spark, sf_dir)
    u = a.select(
        F.lit("feed_a").alias("feed"), "event_type", "value"
    ).unionByName(b.select(F.lit("feed_b").alias("feed"), "event_type", "value"))
    agg = u.groupBy("feed", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("value_cents"),
    )
    try:
        sink = _drain(agg, scratch, "complete", "st14")
    finally:
        shutil.rmtree(scratch2, ignore_errors=True)
    return sink


@register(
    "st15_stream_observed_metrics",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS value_cents,
       true AS observed_rows_ok,
       true AS observed_cents_ok
FROM events GROUP BY event_type
""",
    tags=("streaming", "observe", "metrics", "events"),
    doc="STREAMING observed metrics (df.observe on a readStream + "
    "StreamingQueryProgress.observedMetrics) behind the correctness "
    "gate — q122's data-quality counters carried into the streaming "
    "runtime, where they are the standard in-flight monitoring hook "
    "(rows/bytes/invariant counters per micro-batch with NO second "
    "pass over the stream).  The gate machine-checks the metric "
    "against the data it describes: the map-side observed row count "
    "and exact-decimal cent total, summed across every micro-batch "
    "the availableNow drain executes, must equal the same totals "
    "re-aggregated from the drained sink — observed_rows_ok / "
    "observed_cents_ok hash-pin that equality against the oracle's "
    "literal trues.  A metric that dropped a batch, double-counted "
    "a replay, or raced the commit breaks the hash.  Scale: observe "
    "is a zero-shuffle piggyback on the existing plan; the drain "
    "itself is one partial-agg shuffle per micro-batch.",
)
def st15_stream_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream, scratch = _events_stream(spark, sf_dir)
    observed = stream.observe(
        "st15_obs",
        F.count(F.lit(1)).alias("n_in"),
        F.sum(F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents_in"),
    )
    agg = observed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("value_cents"),
    )
    name = f"st15_{uuid.uuid4().hex[:8]}"
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", f"{scratch}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        obs_rows, obs_cents = 0, 0
        for progress in q.recentProgress:
            metrics = progress.observedMetrics.get("st15_obs")
            if metrics is not None and metrics["n_in"] is not None:
                obs_rows += metrics["n_in"]
                # SUM over an all-empty batch is NULL while COUNT is 0
                if metrics["cents_in"] is not None:
                    obs_cents += int(metrics["cents_in"])
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    sink = spark.table(name)
    totals = sink.agg(
        F.sum("n").alias("tn"), F.sum("value_cents").alias("tc")
    ).first()
    rows_ok = bool(totals["tn"] == obs_rows)
    cents_ok = bool(totals["tc"] == obs_cents)
    return sink.select(
        "event_type",
        "n",
        "value_cents",
        F.lit(rows_ok).alias("observed_rows_ok"),
        F.lit(cents_ok).alias("observed_cents_ok"),
    )
