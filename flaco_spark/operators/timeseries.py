"""Time-series operators over the ``events`` stream table.

Operators Spark lacks as single primitives, composed scale-first:

- **as-of join** — "latest prior event" via a carried window value
  (``last(..., ignorenulls)`` over an ordered per-key window).  This
  is the shuffle-minimal formulation: one sort per key partition, no
  range-join explosion, no per-row subqueries.
- **sliding windows** — ``F.window(ts, size, slide)``; each event
  lands in size/slide windows (map-side fan-out, then a normal
  hash aggregation).
- **session windows** — ``F.session_window`` (the same construct
  Structured Streaming uses for stateful sessionization).
- **hierarchical rollup** — hourly partials re-aggregated to daily,
  the continuous-aggregate pattern: at 100 TB you keep the hourly
  layer materialized and the daily layer is 24× cheaper than a
  rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flaco_spark.compat import dsum, money, sql_dsum, sql_money
from flaco_spark.inventory import register
from flaco_spark.localrel import local_relation
from flaco_spark.tables import table


def asof_prior_event(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    mark_col: str,
    pick_types: tuple[str, str],
    id_col: str,
) -> DataFrame:
    """Generic as-of: for each row of type pick_types[0], attach the
    latest prior row of type pick_types[1] within the same key."""
    target, source = pick_types
    w = (
        W.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried_id = F.last(
        F.when(F.col(mark_col) == source, F.col(id_col)), ignorenulls=True
    ).over(w)
    carried_ts = F.last(
        F.when(F.col(mark_col) == source, F.col(ts_col)), ignorenulls=True
    ).over(w)
    return (
        df.withColumn("asof_id", carried_id)
        .withColumn("asof_ts", carried_ts)
        .filter(F.col(mark_col) == target)
    )


@register(
    "ts01_asof_join",
    oracle="""
SELECT event_id,
       user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       asof_id AS prior_view_id,
       strftime(asof_ts, '%Y-%m-%d %H:%M:%S.%f') AS prior_view_ts
FROM (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
           OVER w AS asof_id,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER w AS asof_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
) t
WHERE event_type = 'purchase'
""",
    tags=("timeseries", "asof", "window", "events"),
    doc="As-of join: each purchase gets the user's latest prior view "
    "(carried-value window — no range-join explosion).",
)
def ts01_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    res = asof_prior_event(
        e, key_col="user_id", ts_col="ts", mark_col="event_type",
        pick_types=("purchase", "view"), id_col="event_id",
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return res.select(
        "event_id",
        "user_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        F.col("asof_id").alias("prior_view_id"),
        F.date_format("asof_ts", fmt).alias("prior_view_ts"),
    )


@register(
    "ts02_sliding_window",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts) - o.off * INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n,
       {sql_dsum(sql_money('value'), 'sum_value')}
FROM events, (SELECT unnest([0, 1]) AS off) o
GROUP BY 1
""",
    tags=("timeseries", "window", "events"),
    doc="Sliding 2-hour window, 1-hour slide: each event fans out to "
    "size/slide windows map-side.",
)
def ts02_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(money("value"), "sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "sum_value",
        )
    )


@register(
    "ts03_session_window",
    oracle=f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessioned AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       COUNT(*) AS n_events,
       {sql_dsum(sql_money('value'), 'sum_value')}
FROM sessioned
GROUP BY user_id, session_id
""",
    tags=("timeseries", "session", "events"),
    doc="Session windows (30-minute gap) via F.session_window — the "
    "stateful-streaming sessionization construct, checked against a "
    "lag/cumsum oracle.  Gap-boundary semantics measured, not "
    "assumed (r7 property-test find): session_window's merge is "
    "CLOSED at the boundary — an event at exactly last + gap JOINS "
    "the session (only delta > gap splits; deltas of 29/30/31 min "
    "against a 30-min gap give 1/1/2 sessions, pinned in "
    "tests/test_property_differential.py) — so the oracle splits on "
    "strict >.",
)
def ts03_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(money("value"), "sum_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), fmt).alias("session_start"),
            F.date_format(F.col("w.end"), fmt).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def ts06_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    first_view = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("fv")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
    )
    converted = (
        first_view.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("pts") > F.col("fv"))
            & (F.col("pts") <= F.col("fv") + F.expr("interval 24 hours")),
            "left_semi",
        )
        .select("user_id")
        .withColumn("converted", F.lit(1))
    )
    return (
        first_view.join(converted, "user_id", "left")
        .groupBy(F.date_format(F.date_trunc("day", "fv"), "yyyy-MM-dd").alias("view_day"))
        .agg(
            F.count(F.lit(1)).alias("n_viewers"),
            F.count("converted").alias("n_converted"),
        )
    )


register(
    "ts06_funnel_conversion",
    oracle="""
WITH first_view AS (
  SELECT user_id, MIN(ts) AS fv FROM events WHERE event_type = 'view' GROUP BY user_id
),
converted AS (
  SELECT DISTINCT f.user_id
  FROM first_view f
  JOIN events p ON p.user_id = f.user_id AND p.event_type = 'purchase'
               AND p.ts > f.fv AND p.ts <= f.fv + INTERVAL 24 HOUR
)
SELECT strftime(date_trunc('day', f.fv), '%Y-%m-%d') AS view_day,
       COUNT(*) AS n_viewers,
       COUNT(c.user_id) AS n_converted
FROM first_view f LEFT JOIN converted c ON f.user_id = c.user_id
GROUP BY 1
""",
    tags=("timeseries", "funnel", "conversion", "events"),
    doc="Funnel conversion: per first-view day, how many viewers "
    "purchased within 24h of their first view — first-touch aggregate, "
    "time-bounded semi-join, left join for the conversion flag; all "
    "shuffles on user_id with partial aggregation.",
)(ts06_funnel_conversion)


def ts05_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    first_day = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    activity = e.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    return (
        activity.join(first_day, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


register(
    "ts05_retention_cohorts",
    oracle="""
WITH first_day AS (
  SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort,
       CAST(date_diff('day', f.cohort_day, a.day) AS INT) AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM activity a JOIN first_day f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
    tags=("timeseries", "retention", "cohort", "events"),
    doc="Cohort retention matrix: users bucketed by first-seen day, "
    "distinct-active-user counts per (cohort, day offset) — two "
    "shuffles on user_id (both partial-aggregated), the standard "
    "product-analytics rollup.",
)(ts05_retention_cohorts)


@register(
    "ts04_rollup_hierarchy",
    oracle=f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n,
       {sql_dsum(sql_money('value'), 'sum_value')}
FROM events
GROUP BY 1, 2
""",
    tags=("timeseries", "rollup", "events"),
    doc="Hierarchical rollup: daily aggregates computed FROM hourly "
    "partials (continuous-aggregate pattern); must equal a direct "
    "daily scan.",
)
def ts04_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(money("value")).alias("sum_dec"),  # keep exact partials
    )
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "hour"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
        )
        .select("day", "event_type", "n", "sum_value")
    )


# ---------------------------------------------------------------------------
# ts07 — OHLC downsampling (per-entity time-bar aggregation)
# ---------------------------------------------------------------------------


@register(
    "ts07_ohlc_bars",
    oracle=f"""
WITH ranked AS (
  SELECT user_id,
         date_trunc('hour', ts) AS hr,
         value,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id,
       strftime(hr, '%Y-%m-%d %H:%M:%S') AS bar_start,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n_events,
       {sql_dsum(sql_money('value'), 'volume')}
FROM ranked
GROUP BY user_id, hr
""",
    tags=("timeseries", "ohlc", "downsample", "events"),
    doc="OHLC time-bar downsampling: per (user, hour) the first/last "
    "values under a deterministic total order (ts, event_id) plus "
    "high/low/count/exact-decimal volume — the classic tick→bar "
    "compaction every metrics/market pipeline runs.  Scale shape: "
    "window + aggregate share one (user, hour) shuffle; bar count is "
    "entities × time-buckets regardless of event volume.",
)
def ts07_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events").withColumn("hr", F.date_trunc("hour", "ts"))
    w_a = W.partitionBy("user_id", "hr").orderBy("ts", "event_id")
    w_d = W.partitionBy("user_id", "hr").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = e.withColumn("rn_a", F.row_number().over(w_a)).withColumn(
        "rn_d", F.row_number().over(w_d)
    )
    return ranked.groupBy("user_id", "hr").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        dsum(money("value"), "volume"),
    ).select(
        "user_id",
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
        "open",
        "high",
        "low",
        "close",
        "n_events",
        "volume",
    )


# ---------------------------------------------------------------------------
# ts08 — rolling median over an exact 3-row frame
# ---------------------------------------------------------------------------


@register(
    "ts08_rolling_median",
    oracle="""
SELECT user_id, event_id, med3 FROM (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS med3
  FROM events
) t WHERE rn >= 3
""",
    tags=("timeseries", "window", "median", "events"),
    doc="Rolling median smoothing over each user's event stream — the "
    "robust-denoising pass for sensor/metric streams.  The frame is "
    "pinned to exactly 3 rows (rows with a shorter warm-up frame are "
    "dropped), so the median is always the middle *data value*: no "
    "interpolation, hence bit-identical across engines even over "
    "arbitrary doubles.  Spark side sorts the 3-element frame list "
    "(constant work per row); one shuffle keyed by user_id shared by "
    "both windows.  For wide frames at 100 TB the scale path is an "
    "approx-quantile sketch per frame, not a bigger sort.",
)
def ts08_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w3 = W.partitionBy("user_id").orderBy(*order).rowsBetween(-2, 0)
    wn = W.partitionBy("user_id").orderBy(*order)
    return (
        e.select(
            "user_id",
            "event_id",
            F.row_number().over(wn).alias("rn"),
            F.element_at(F.sort_array(F.collect_list("value").over(w3)), 2).alias(
                "med3"
            ),
        )
        .filter(F.col("rn") >= 3)
        .select("user_id", "event_id", "med3")
    )


# ---------------------------------------------------------------------------
# ts09 — range (interval) join against bucket boundaries
# ---------------------------------------------------------------------------

VALUE_BUCKETS: tuple[tuple[str, float, float], ...] = (
    ("p000_010", 0.0, 10.0),
    ("p010_050", 10.0, 50.0),
    ("p050_200", 50.0, 200.0),
    ("p200_500", 200.0, 500.0),
)


@register(
    "ts09_value_range_join",
    oracle="""
WITH buckets(bucket, lo, hi) AS (
  VALUES ('p000_010', 0.0, 10.0),
         ('p010_050', 10.0, 50.0),
         ('p050_200', 50.0, 200.0),
         ('p200_500', 200.0, 500.0)
)
SELECT b.bucket,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events e
JOIN buckets b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.bucket
""",
    tags=("timeseries", "range-join", "events"),
    doc="Range (interval) join: each event matches the bucket whose "
    "[lo, hi) interval contains its value — the histogram/banding "
    "join Spark has no first-class operator for.  The bucket side is "
    "a tiny literal dimension, explicitly broadcast, so the non-equi "
    "condition executes as a broadcast nested-loop over a "
    "constant-size inner — a map-side pass over the fact table, no "
    "fact shuffle before the final partial-aggregated groupBy.  The "
    "same shape covers time-interval enrichment (maintenance windows, "
    "calendars) at any scale; only the broadcast side must stay "
    "small, which interval dimensions are.",
)
def ts09_value_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    b = local_relation(
        spark, list(VALUE_BUCKETS), "bucket string, lo double, hi double"
    )
    joined = e.join(
        F.broadcast(b),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return joined.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# ts10 — gap detection (missing-heartbeat analysis)
# ---------------------------------------------------------------------------

GAP_MINUTES = 360  # 6h


@register(
    "ts10_gap_detection",
    oracle="""
SELECT user_id,
       strftime(prev_ts, '%Y-%m-%d %H:%M:%S.%f') AS gap_start,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS gap_end,
       CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS gap_seconds
FROM (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
) t
WHERE prev_ts IS NOT NULL
  AND date_diff('second', prev_ts, ts) > 360 * 60
""",
    tags=("timeseries", "window", "gap", "events"),
    doc="Gap detection: flag every pair of consecutive events (per "
    "entity, time order) separated by more than the expected "
    "heartbeat interval — the monitoring/sensor-health primitive "
    "dual to ts03's session windows (a session BREAK is exactly a "
    "gap).  One shuffle keyed by entity, one lag() window, O(1) "
    "state per row; output is gaps only, so cardinality is "
    "anomaly-sized, not row-sized.",
)
def ts10_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    # timestampdiff on the ntz values stays timezone-independent;
    # unix_timestamp(cast(... as timestamp)) would route through the
    # session timezone and drift ±3600s across a DST transition in a
    # non-UTC session tz, flipping rows near the threshold vs the
    # oracle's naive date_diff.  date_trunc to whole seconds first:
    # date_diff('second', ...) counts SECOND-BOUNDARY CROSSINGS
    # (0.9s → 1.1s is 1), not elapsed full seconds (0).
    gap_s = F.expr(
        "timestampdiff(SECOND, date_trunc('second', prev_ts), date_trunc('second', ts))"
    )
    return (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .withColumn("gap_seconds", gap_s)
        .filter(F.col("gap_seconds") > GAP_MINUTES * 60)
        .select(
            "user_id",
            F.date_format("prev_ts", fmt).alias("gap_start"),
            F.date_format("ts", fmt).alias("gap_end"),
            F.col("gap_seconds").cast("bigint").alias("gap_seconds"),
        )
    )


# ---------------------------------------------------------------------------
# ts11 — time-interval RANGE frame (trailing 6h sum per user)
# ---------------------------------------------------------------------------


@register(
    "ts11_interval_range_frame",
    oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS trailing_6h
FROM events
WHERE user_id < 100
""",
    tags=("timeseries", "window", "range-frame", "events"),
    doc="Time-based RANGE frame: each event's trailing-6-hour value "
    "sum — the moving-metric primitive where the frame is defined by "
    "the TIMESTAMP DELTA, not a row count (q59's RANGE frame is "
    "numeric; this is its temporal sibling, and the batch mirror of "
    "the streaming sliding window ts02).  Events landing at the same "
    "ts share a frame (RANGE ties), so the sum uses the exact-decimal "
    "discipline to stay order-independent.  One shuffle keyed by "
    "user, frame state bounded by the interval's event density.",
)
def ts11_interval_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    e.createOrReplaceTempView("v_events_range")
    return e.sparkSession.sql(
        """
        SELECT user_id, event_id,
               CAST(SUM(CAST(value AS DECIMAL(18,6)))
                    OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS trailing_6h
        FROM v_events_range
        """
    )


# ---------------------------------------------------------------------------
# ts12 — VWAP time bars (volume-weighted average price)
# ---------------------------------------------------------------------------


@register(
    "ts12_vwap_bars",
    oracle="""
SELECT user_id,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bar,
       CAST(COUNT(*) AS BIGINT) AS n_trades,
       CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(event_id % 100 + 1 AS BIGINT)) AS DOUBLE)
         / CAST(SUM(CAST(event_id % 100 + 1 AS BIGINT)) AS DOUBLE) AS vwap
FROM events
WHERE user_id < 50
GROUP BY 1, 2
""",
    tags=("timeseries", "vwap", "agg", "events"),
    doc="Volume-weighted average price per hourly bar — the "
    "downsampling companion to ts07's OHLC, with value as price and "
    "a deterministic derived volume (event_id%100+1).  VWAP = "
    "Σ(p·v)/Σv where both sums are exact (decimal price × integer "
    "volume), then ONE division — the only formulation that "
    "hash-matches across engines AND re-aggregates incrementally "
    "(store the two sums, not the ratio, in the hourly layer; q76's "
    "partial-merge pattern).  Single partial-aggregated shuffle.",
)
def ts12_vwap_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    vol = (F.col("event_id") % 100 + 1).cast("bigint")
    pv = F.col("value").cast("decimal(18,6)") * vol
    return (
        e.groupBy(
            "user_id",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bar"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            (F.sum(pv).cast("double") / F.sum(vol).cast("double")).alias("vwap"),
        )
    )


# ---------------------------------------------------------------------------
# ts13 — z-score anomaly detection from exact moments
# ---------------------------------------------------------------------------


@register(
    "ts13_zscore_anomalies",
    oracle="""
WITH m AS (
  SELECT user_id,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sxx
  FROM events GROUP BY user_id
)
SELECT e.user_id, e.event_id, e.value,
       (e.value - m.sx / m.n)
         / sqrt((m.sxx - m.sx * m.sx / m.n) / (m.n - 1)) AS zscore
FROM events e JOIN m ON e.user_id = m.user_id
WHERE abs((e.value - m.sx / m.n)
          / sqrt((m.sxx - m.sx * m.sx / m.n) / (m.n - 1))) > 3.0
""",
    tags=("timeseries", "anomaly", "stats", "events"),
    doc="Z-score anomaly detection: flag events more than 3 sample "
    "standard deviations from their user's mean, with mean/std "
    "derived from exact-decimal moment sums (q70's technique) so the "
    "flagged set is bit-identical across engines and partitionings — "
    "an anomaly detector whose OUTPUT flaps between runs is worse "
    "than none.  One moments aggregate (tiny) broadcast-joined back "
    "to the stream; output is anomaly-sized.  The same two-pass "
    "shape at 100 TB: moments from the hourly rollup layer, join "
    "pushed to the scan.",
)
def ts13_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    vd = F.col("value").cast("decimal(18,6)")
    m = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(vd).cast("double").alias("sx"),
        F.sum(vd * vd).cast("double").alias("sxx"),
    )
    joined = e.join(F.broadcast(m), "user_id")
    mean = F.col("sx") / F.col("n")
    std = F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - F.lit(1.0)))
    z = (F.col("value") - mean) / std
    return (
        joined.withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 3.0)
        .select("user_id", "event_id", "value", "zscore")
    )


# ---------------------------------------------------------------------------
# ts14 — period-over-period comparison (MoM growth)
# ---------------------------------------------------------------------------


@register(
    "ts14_mom_growth",
    oracle="""
WITH monthly AS (
  SELECT event_type,
         strftime(date_trunc('month', ts), '%Y-%m') AS month,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
  FROM events GROUP BY 1, 2
)
SELECT event_type, month, total,
       LAG(total) OVER w AS prev_total,
       total - LAG(total) OVER w AS delta,
       (total - LAG(total) OVER w) / LAG(total) OVER w AS growth
FROM monthly
WINDOW w AS (PARTITION BY event_type ORDER BY month)
""",
    tags=("timeseries", "window", "reporting", "events"),
    doc="Period-over-period reporting: monthly exact-decimal totals "
    "per series, then lag() for the previous period, absolute delta, "
    "and relative growth — the MoM/YoY table every dashboard ships.  "
    "The rollup compresses rows to |series|x|months| BEFORE the "
    "window, so the lag sort runs on the aggregate (tiny at any "
    "scale), not the raw stream; deltas are IEEE ops on exact "
    "operands, first period's growth NULL by lag semantics.",
)
def ts14_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    monthly = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month"),
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"))
    w = W.partitionBy("event_type").orderBy("month")
    prev = F.lag("total").over(w)
    return monthly.select(
        "event_type",
        "month",
        "total",
        prev.alias("prev_total"),
        (F.col("total") - prev).alias("delta"),
        ((F.col("total") - prev) / prev).alias("growth"),
    )


# ---------------------------------------------------------------------------
# ts15 — resample to a regular grid with forward fill (LOCF)
# ---------------------------------------------------------------------------


@register(
    "ts15_resample_ffill",
    oracle="""
WITH grid AS (
  SELECT u.user_id, g.h AS slot
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20) u,
       generate_series(TIMESTAMP '2024-01-01 00:00:00',
                       TIMESTAMP '2024-01-03 23:00:00',
                       INTERVAL 1 HOUR) AS g(h)
),
hourly AS (
  SELECT user_id, slot, lv FROM (
    SELECT user_id, date_trunc('hour', ts) AS slot,
           CAST(value AS DOUBLE) AS lv,
           ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE user_id < 20) t
  WHERE rn = 1
),
joined AS (
  SELECT g.user_id, g.slot, h.lv
  FROM grid g LEFT JOIN hourly h
    ON g.user_id = h.user_id AND g.slot = h.slot
)
SELECT user_id,
       strftime(slot, '%Y-%m-%d %H:%M:%S') AS slot,
       lv AS observed,
       last_value(lv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY slot
                                         ROWS UNBOUNDED PRECEDING) AS filled
FROM joined
""",
    tags=("timeseries", "resample", "ffill", "events"),
    doc="Resample to a regular hourly grid with forward fill (LOCF): "
    "per user, every grid slot gets the hour's last observation "
    "(arg_max under the deterministic (ts, event_id) order) or the "
    "most recent prior value carried forward — pandas' "
    "resample().ffill() as a distributed plan: calendar-generated "
    "grid (q64's device) × users, one left join on (user, slot), one "
    "last(ignorenulls) running window.  Three days of grid keeps the "
    "fan-out bounded; at scale the grid is a generated dimension, "
    "never materialized storage.",
)
def ts15_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    users = e.select("user_id").distinct()
    grid = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
                F.lit("2024-01-03 23:00:00").cast("timestamp_ntz"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("slot"),
    )
    w_last = W.partitionBy("user_id", "slot_h").orderBy(F.desc("ts"), F.desc("event_id"))
    hourly = (
        e.withColumn("slot_h", F.date_trunc("hour", "ts"))
        .withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("slot_h").alias("slot"), F.col("value").alias("last_value"))
    )
    joined = grid.join(hourly, ["user_id", "slot"], "left")
    w_fill = (
        W.partitionBy("user_id")
        .orderBy("slot")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("slot", "yyyy-MM-dd HH:mm:ss").alias("slot"),
        F.col("last_value").alias("observed"),
        F.last("last_value", ignorenulls=True).over(w_fill).alias("filled"),
    )


# ---------------------------------------------------------------------------
# ts16 — as-of join directions: backward, forward, nearest
# ---------------------------------------------------------------------------


@register(
    "ts16_asof_directions",
    oracle="""
WITH marked AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
           OVER wb AS prior_id,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER wb AS prior_ts,
         first_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
           OVER wf AS next_id,
         first_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER wf AS next_ts
  FROM events
  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wf AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
       prior_id, next_id,
       CASE
         WHEN prior_id IS NULL THEN next_id
         WHEN next_id IS NULL THEN prior_id
         WHEN date_diff('microsecond', prior_ts, ts)
              <= date_diff('microsecond', ts, next_ts) THEN prior_id
         ELSE next_id
       END AS nearest_id
FROM marked
WHERE event_type = 'purchase'
""",
    tags=("timeseries", "asof", "window", "events"),
    doc="As-of join in all three directions (the pandas "
    "``merge_asof`` / kdb ``aj`` direction surface): for each "
    "purchase, the user's latest PRIOR view (backward — ts01's "
    "semantics), earliest NEXT view (forward), and NEAREST view "
    "(tie prefers prior, matching merge_asof).  Both directions are "
    "carried-value windows over ONE shuffle keyed by user — no "
    "range-join explosion, O(1) state per row either direction; "
    "'nearest' is a pure map-side arbitration of the two carried "
    "candidates by microsecond gap.",
)
def ts16_asof_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    wb = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    view_id = F.when(F.col("event_type") == "view", F.col("event_id"))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    marked = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(view_id, ignorenulls=True).over(wb).alias("prior_id"),
        F.last(view_ts, ignorenulls=True).over(wb).alias("prior_ts"),
        F.first(view_id, ignorenulls=True).over(wf).alias("next_id"),
        F.first(view_ts, ignorenulls=True).over(wf).alias("next_ts"),
    )
    gap_prior = F.expr("timestampdiff(MICROSECOND, prior_ts, ts)")
    gap_next = F.expr("timestampdiff(MICROSECOND, ts, next_ts)")
    nearest = (
        F.when(F.col("prior_id").isNull(), F.col("next_id"))
        .when(F.col("next_id").isNull(), F.col("prior_id"))
        .when(gap_prior <= gap_next, F.col("prior_id"))
        .otherwise(F.col("next_id"))
    )
    return (
        marked.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "prior_id",
            "next_id",
            nearest.alias("nearest_id"),
        )
    )


# ---------------------------------------------------------------------------
# ts17 — sweep-line concurrency (max simultaneous sessions)
# ---------------------------------------------------------------------------

TS17_SESSION_MINUTES = 30


@register(
    "ts17_concurrency_sweep",
    oracle=f"""
WITH sessions AS (
  SELECT user_id, ts AS s_start, ts + INTERVAL {TS17_SESSION_MINUTES} MINUTE AS s_end
  FROM events WHERE event_type = 'signup'
),
deltas AS (
  SELECT s_start AS t, 1 AS d FROM sessions
  UNION ALL
  SELECT s_end AS t, -1 AS d FROM sessions
),
swept AS (
  SELECT t, d,
         SUM(d) OVER (ORDER BY t, d DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS concurrent
  FROM deltas
)
SELECT strftime(date_trunc('hour', t), '%Y-%m-%d %H:%M:%S') AS hour_start,
       CAST(MAX(concurrent) AS BIGINT) AS peak_concurrent
FROM swept
GROUP BY 1
""",
    tags=("timeseries", "sweepline", "intervals", "events"),
    doc="Interval-overlap concurrency by SWEEP LINE: each signup opens "
    "a 30-minute session; sessions become +1/-1 boundary events, a "
    "running sum over the merged boundary stream IS the concurrency "
    "curve, and per-hour MAX gives the peak-load profile (capacity "
    "planning's first query).  The sweep needs a single total order "
    "over boundaries — at 100 TB that is q66's range-partitioned "
    "global sort, not a one-task window; here the surface-parity "
    "form uses the ordered window with starts-before-ends tie-break "
    "(+1 sorts first at equal t, the closed-interval convention both "
    "engines pin identically).  Cardinality: 2 boundary rows per "
    "session, output is hours-sized.",
)
def ts17_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    sessions = e.select(
        F.col("ts").alias("s_start"),
        (F.col("ts") + F.expr(f"INTERVAL {TS17_SESSION_MINUTES} MINUTES")).alias("s_end"),
    )
    deltas = sessions.select(F.col("s_start").alias("t"), F.lit(1).alias("d")).unionAll(
        sessions.select(F.col("s_end").alias("t"), F.lit(-1).alias("d"))
    )
    w = (
        W.orderBy("t", F.desc("d"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    swept = deltas.withColumn("concurrent", F.sum("d").over(w))
    return (
        swept.groupBy(
            F.date_format(F.date_trunc("hour", "t"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            )
        )
        .agg(F.max("concurrent").cast("bigint").alias("peak_concurrent"))
    )


# ---------------------------------------------------------------------------
# ts18 — bar-pattern detection (lag-window technical signals)
# ---------------------------------------------------------------------------


@register(
    "ts18_bar_patterns",
    oracle="""
WITH ranked AS (
  SELECT date_trunc('hour', ts) AS hr,
         value,
         ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
),
bars AS (
  SELECT hr,
         MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
         MAX(CASE WHEN rn_d = 1 THEN value END) AS close
  FROM ranked GROUP BY hr
),
seq AS (
  SELECT hr, open, close,
         close > open AS up,
         lag(close > open, 1) OVER w AS up1,
         lag(close > open, 2) OVER w AS up2,
         lag(close, 1) OVER w AS close1,
         lag(close, 2) OVER w AS close2
  FROM bars
  WINDOW w AS (ORDER BY hr)
)
SELECT strftime(hr, '%Y-%m-%d %H:%M:%S') AS bar_start,
       up AND COALESCE(up1, FALSE) AND COALESCE(up2, FALSE)
         AND close > close1 AND close1 > close2 AS three_rising,
       up <> COALESCE(up1, up) AS reversal
FROM seq
""",
    tags=("timeseries", "pattern", "window", "events"),
    doc="Bar-pattern detection over ts07's OHLC bars: per entity, "
    "lag-window booleans flag three-consecutive-rising bars (the "
    "'three white soldiers' momentum signal, generalized to any "
    "metric: three rising hourly aggregates = sustained drift) and "
    "direction reversals — the alerting primitives monitoring "
    "systems derive from compacted bars rather than raw ticks.  "
    "Bars are GLOBAL per hour here, so the lag window runs over a "
    "bounded hours-sized sequence (the same bounded-input argument "
    "as t16/d12; per-entity bars would key the window by entity as "
    "ts07 does).  One (hour) shuffle compacts ticks to bars; "
    "pattern state per row is O(pattern length).",
)
def ts18_bar_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").withColumn("hr", F.date_trunc("hour", "ts"))
    w_a = W.partitionBy("hr").orderBy("ts", "event_id")
    w_d = W.partitionBy("hr").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = (
        e.withColumn("rn_a", F.row_number().over(w_a))
        .withColumn("rn_d", F.row_number().over(w_d))
    )
    bars = ranked.groupBy("hr").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
    )
    ws = W.orderBy("hr")
    up = F.col("close") > F.col("open")
    seq = (
        bars.withColumn("up", up)
        .withColumn("up1", F.lag("up", 1).over(ws))
        .withColumn("up2", F.lag("up", 2).over(ws))
        .withColumn("close1", F.lag("close", 1).over(ws))
        .withColumn("close2", F.lag("close", 2).over(ws))
    )
    three = (
        F.col("up")
        & F.coalesce(F.col("up1"), F.lit(False))
        & F.coalesce(F.col("up2"), F.lit(False))
        & (F.col("close") > F.col("close1"))
        & (F.col("close1") > F.col("close2"))
    )
    reversal = F.col("up") != F.coalesce(F.col("up1"), F.col("up"))
    return seq.select(
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
        three.alias("three_rising"),
        reversal.alias("reversal"),
    )


# ---------------------------------------------------------------------------
# ts19 — EWMA smoothing over the hourly grid (integer-weight form)
# ---------------------------------------------------------------------------

EWMA_TAPS = 8  # alpha = 1/2, truncated at 8 taps; weights 2^7 .. 2^0


def _ewma_terms(col: str, alias_prefix: str = "") -> tuple[str, str]:
    """SQL fragments (numerator, denominator) for the integer-weighted
    EWMA: weight of lag j is 2^(7-j), so everything stays integer
    until one final double division — bit-identical across engines."""
    num = " + ".join(
        f"COALESCE(LAG({col}, {j}) OVER w, 0) * {1 << (EWMA_TAPS - 1 - j)}"
        for j in range(EWMA_TAPS)
    )
    den = " + ".join(
        f"CASE WHEN LAG({col}, {j}) OVER w IS NULL THEN 0 ELSE {1 << (EWMA_TAPS - 1 - j)} END"
        for j in range(EWMA_TAPS)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_terms("cnt")


@register(
    "ts19_ewma_smoothing",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, CAST(cnt AS BIGINT) AS cnt,
       CAST({_EWMA_NUM} AS BIGINT) AS ewma_num,
       CAST({_EWMA_DEN} AS BIGINT) AS ewma_den,
       CAST({_EWMA_NUM} AS DOUBLE) / CAST({_EWMA_DEN} AS DOUBLE) AS ewma
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour)
""",
    tags=("timeseries", "window", "smoothing", "events"),
    doc="Exponentially-weighted moving average (alpha=1/2, 8 taps) "
    "over per-series hourly counts — the smoothing primitive behind "
    "alerting baselines and trend displays.  The geometric weights "
    "are powers of two, so numerator and normalizer are pure INTEGER "
    "lag-chains (weight of lag j = 2^(7-j)) with ONE final double "
    "division — bit-identical across engines, no float accumulation "
    "order to disagree on.  The hourly rollup compresses the stream "
    "to |series|x|hours| before the window, so the lag sort is "
    "aggregate-sized; truncating at 8 taps is what makes EWMA "
    "window-expressible at all (the infinite-memory recurrence "
    "would need a sequential scan).",
)
def ts19_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("event_type").orderBy("hour")
    num = None
    den = None
    for j in range(EWMA_TAPS):
        wt = 1 << (EWMA_TAPS - 1 - j)
        lagged = F.lag("cnt", j).over(w) if j else F.col("cnt")
        term = F.coalesce(lagged, F.lit(0)) * wt
        present = F.when(lagged.isNull(), 0).otherwise(wt)
        num = term if num is None else num + term
        den = present if den is None else den + present
    return hourly.select(
        "event_type",
        "hour",
        F.col("cnt").cast("bigint").alias("cnt"),
        num.cast("bigint").alias("ewma_num"),
        den.cast("bigint").alias("ewma_den"),
        (num.cast("double") / den.cast("double")).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# ts20 — seasonal decomposition lite: trend + hour-of-day profile
# ---------------------------------------------------------------------------

TS20_HALF = 12  # centered moving average: 12 before + self + 12 after


@register(
    "ts20_seasonal_profile",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
trended AS (
  SELECT event_type, hour, cnt,
         SUM(cnt) OVER w AS trend_sum,
         COUNT(*) OVER w AS trend_n
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN {TS20_HALF} PRECEDING AND {TS20_HALF} FOLLOWING)
),
resid AS (
  SELECT event_type,
         CAST(extract(hour FROM hour) AS INT) AS hod,
         {2 * TS20_HALF + 1} * cnt - trend_sum AS residual_x25
  FROM trended WHERE trend_n = {2 * TS20_HALF + 1}
)
SELECT event_type, hod,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(SUM(residual_x25) AS BIGINT) AS residual_sum_x25,
       CAST(SUM(residual_x25) AS DOUBLE)
         / ({2 * TS20_HALF + 1}.0 * CAST(COUNT(*) AS DOUBLE)) AS seasonal
FROM resid
GROUP BY event_type, hod
""",
    tags=("timeseries", "window", "seasonality", "events"),
    doc="Seasonal decomposition (STL-lite): per-series hourly counts, "
    "trend as a centered 25-hour moving average (full windows only — "
    "edge hours excluded, not padded), and the hour-of-day seasonal "
    "index as the mean detrended residual — how load dashboards "
    "separate 'today is big' from 'it is 3pm'.  Exactness: residuals "
    "are kept as 25*cnt - trend_sum (pure integers — the x25 scaling "
    "clears the /25), summed exactly, with ONE final double division, "
    "so engines cannot disagree on float accumulation order.  Two "
    "window passes over the aggregate-sized hourly table, then a "
    "|series|x24 rollup — nothing corpus-sized past the first "
    "group-by.",
)
def ts20_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    span = 2 * TS20_HALF + 1
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-TS20_HALF, TS20_HALF)
    )
    trended = hourly.select(
        "event_type",
        "hour",
        "cnt",
        F.sum("cnt").over(w).alias("trend_sum"),
        F.count(F.lit(1)).over(w).alias("trend_n"),
    )
    resid = trended.filter(F.col("trend_n") == span).select(
        "event_type",
        F.hour("hour").cast("int").alias("hod"),
        (F.lit(span) * F.col("cnt") - F.col("trend_sum")).alias("residual_x25"),
    )
    return resid.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum("residual_x25").cast("bigint").alias("residual_sum_x25"),
        (
            F.sum("residual_x25").cast("double")
            / (F.lit(float(span)) * F.count(F.lit(1)).cast("double"))
        ).alias("seasonal"),
    )


# ---------------------------------------------------------------------------
# ts21 — robust anomalies: median absolute deviation (MAD) gating
# ---------------------------------------------------------------------------

TS21_K = 3.0  # flag when |value - median| > K * MAD


@register(
    "ts21_mad_anomalies",
    oracle=f"""
WITH ranked AS (
  SELECT event_id, event_type, CAST(value AS DOUBLE) AS value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(value AS DOUBLE), event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type,
         MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS median_val
  FROM ranked GROUP BY event_type
),
dev AS (
  SELECT r.event_id, r.event_type, r.value, m.median_val,
         abs(r.value - m.median_val) AS deviation,
         ROW_NUMBER() OVER (PARTITION BY r.event_type
                            ORDER BY abs(r.value - m.median_val), r.event_id) AS drn,
         COUNT(*) OVER (PARTITION BY r.event_type) AS dn
  FROM ranked r JOIN med m ON r.event_type = m.event_type
),
mad AS (
  SELECT event_type,
         MAX(CASE WHEN drn = CAST(ceil(0.5 * dn) AS BIGINT) THEN deviation END) AS mad_val
  FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type, d.value, d.median_val, m.mad_val, d.deviation
FROM dev d JOIN mad m ON d.event_type = m.event_type
WHERE d.deviation > {TS21_K} * m.mad_val
""",
    tags=("timeseries", "anomaly", "robust-stats", "events"),
    doc="Robust anomaly gate: per-series median and median absolute "
    "deviation (both via the q55 row-number pick — exact data points, "
    "no interpolation, engine-portable), flagging events whose "
    "deviation exceeds K*MAD.  MAD is the robust replacement for "
    "ts13's z-score: one fat outlier inflates a stddev enough to "
    "hide its siblings, while the median/MAD pair is immune to 50% "
    "contamination — the difference between an alert channel that "
    "works during an incident and one that goes quiet.  Scale "
    "shape: two window passes partitioned by series + two "
    "|series|-sized broadcast joins; deviations are IEEE ops on "
    "identical operands so both engines agree bit-for-bit.",
)
def ts21_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    wv = W.partitionBy("event_type").orderBy(F.col("value").cast("double"), "event_id")
    wn = W.partitionBy("event_type")
    ranked = e.select(
        "event_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias("median_val")
    )
    dev_base = ranked.join(F.broadcast(med), "event_type").withColumn(
        "deviation", F.abs(F.col("value") - F.col("median_val"))
    )
    wd = W.partitionBy("event_type").orderBy("deviation", "event_id")
    dev = dev_base.select(
        "event_id",
        "event_type",
        "value",
        "median_val",
        "deviation",
        F.row_number().over(wd).alias("drn"),
        F.count(F.lit(1)).over(wn).alias("dn"),
    )
    mad = dev.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("drn") == F.ceil(F.lit(0.5) * F.col("dn")).cast("bigint"),
                F.col("deviation"),
            )
        ).alias("mad_val")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("deviation") > F.lit(TS21_K) * F.col("mad_val"))
        .select("event_id", "event_type", "value", "median_val", "mad_val", "deviation")
    )


# ---------------------------------------------------------------------------
# ts22 — lead-lag cross-correlation between two series
# ---------------------------------------------------------------------------

TS22_LAGS = (-3, -2, -1, 0, 1, 2, 3)


@register(
    "ts22_cross_correlation",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour,
         COUNT(*) FILTER (event_type = 'view') AS views,
         COUNT(*) FILTER (event_type = 'purchase') AS purchases
  FROM events GROUP BY 1
),
lags(lag_h) AS (VALUES {", ".join(f"({lag})" for lag in TS22_LAGS)}),
pairs AS (
  SELECT g.lag_h, v.views AS x, p.purchases AS y
  FROM lags g
  JOIN hourly v ON TRUE
  JOIN hourly p ON p.hour = v.hour + g.lag_h * INTERVAL 1 HOUR
),
moments AS (
  SELECT lag_h,
         COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM pairs GROUP BY lag_h
)
SELECT CAST(lag_h AS INT) AS lag_h,
       CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS xcorr
FROM moments
""",
    tags=("timeseries", "correlation", "lead-lag", "events"),
    doc="Lead-lag cross-correlation: Pearson correlation between the "
    "view and purchase hourly series at offsets of -3..+3 hours — "
    "how analysts find the conversion delay ('purchases track views "
    "with a 2-hour lag') and pipeline engineers find causal ordering "
    "between feeds.  Hourly counts are INTEGERS, so every moment sum "
    "(sx, sxx, sxy, ...) is exact integer arithmetic — the "
    "correlation materializes as one double expression per lag at "
    "the very end (the q70 exact-moments discipline; builtin CORR "
    "accumulates doubles in partition order and is not "
    "reproducible).  Scale shape: the stream compresses to |hours| "
    "rows before the 7-lag self-join; everything after is "
    "|lags|-sized.",
)
def ts22_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
    )
    lags = local_relation(
        e.sparkSession, [(lag,) for lag in TS22_LAGS], "lag_h int"
    )
    v = hourly.select(F.col("hour").alias("v_hour"), F.col("views").alias("x"))
    p = hourly.select(F.col("hour").alias("p_hour"), F.col("purchases").alias("y"))
    pairs = (
        v.crossJoin(F.broadcast(lags))
        .join(
            p,
            F.col("p_hour")
            == F.col("v_hour") + F.make_dt_interval(hours=F.col("lag_h")),
        )
    )
    m = pairs.groupBy("lag_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return m.select(
        F.col("lag_h").cast("int").alias("lag_h"),
        F.col("n").cast("bigint").alias("n"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (
                F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
                * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
            )
        ).alias("xcorr"),
    )


# ---------------------------------------------------------------------------
# ts23 — LTTB-style downsampling (largest triangle, bucket-mean anchors)
# ---------------------------------------------------------------------------

TS23_BUCKETS = 20


@register(
    "ts23_lttb_downsample",
    oracle=f"""
WITH pts AS (
  SELECT user_id % 10 AS series,
         CAST(epoch_us(ts) AS DOUBLE) AS x,
         CAST(value AS DOUBLE) AS y,
         ROW_NUMBER() OVER (PARTITION BY user_id % 10 ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id % 10) AS n
  FROM events
),
big AS (SELECT * FROM pts WHERE n > {TS23_BUCKETS + 2}),
bucketed AS (
  SELECT series, x, y, rn, n,
         CASE WHEN rn = 1 THEN 0
              WHEN rn = n THEN {TS23_BUCKETS - 1}
              ELSE 1 + CAST(((rn - 2) * {TS23_BUCKETS - 2}) // (n - 2) AS INT)
         END AS b
  FROM big
),
means AS (
  SELECT series, b,
         CAST(SUM(CAST(x AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mx,
         CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS my
  FROM bucketed GROUP BY series, b
),
areas AS (
  SELECT c.series, c.b, c.x, c.y, c.rn,
         abs((p.mx - nx.mx) * (c.y - p.my) - (p.mx - c.x) * (nx.my - p.my)) AS area
  FROM bucketed c
  JOIN means p  ON c.series = p.series  AND p.b  = c.b - 1
  JOIN means nx ON c.series = nx.series AND nx.b = c.b + 1
  WHERE c.b BETWEEN 1 AND {TS23_BUCKETS - 2}
),
chosen AS (
  SELECT series, b, x, y,
         ROW_NUMBER() OVER (PARTITION BY series, b ORDER BY area DESC, rn) AS pick
  FROM areas
)
SELECT series, b AS bucket, x AS x_us, y FROM chosen WHERE pick = 1
UNION ALL
SELECT series, b AS bucket, x AS x_us, y FROM bucketed WHERE b IN (0, {TS23_BUCKETS - 1})
""",
    tags=("timeseries", "downsample", "lttb", "events"),
    doc=f"LTTB-style visual downsampling (Steinarsson 2013, *Downsampling "
    "Time Series for Visual Representation*): each series keeps its "
    f"first and last points plus, from each of {TS23_BUCKETS - 2} "
    "equal-count middle buckets, the point forming the LARGEST "
    "TRIANGLE with its neighbor buckets' mean points — the "
    "downsampler that preserves visual extremes where per-bucket "
    "averaging flattens them.  This is the bucket-MEAN-anchor "
    "variant: strict LTTB anchors on the previously SELECTED point "
    "(a sequential chain per series); anchoring on the neighbor "
    "bucket means — Steinarsson's own 'LTTB with fixed anchors' "
    "simplification — makes every bucket's argmax independent, i.e. "
    "one window pass + one bucket aggregate + one argmax, fully "
    "parallel at 100 TB (the sequential variant needs per-series "
    "iteration).  Float discipline: bucket means divide exact sums "
    "(bigint µs / decimal values) once; the area formula is a fixed "
    "IEEE operation sequence; argmax ties break on row order.",
)
def ts23_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    B = TS23_BUCKETS
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("series").orderBy("ts", "event_id")
    pts = ev.select(
        (F.col("user_id") % 10).alias("series"),
        F.unix_micros(F.col("ts").cast("timestamp")).cast("double").alias("x"),
        F.col("value").cast("double").alias("y"),
        "ts",
        "event_id",
    ).select(
        "series",
        "x",
        "y",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("series")).alias("n"),
    )
    big = pts.filter(F.col("n") > B + 2)
    bucketed = big.withColumn(
        "b",
        F.when(F.col("rn") == 1, F.lit(0))
        .when(F.col("rn") == F.col("n"), F.lit(B - 1))
        .otherwise(
            (
                F.lit(1)
                + F.floor(((F.col("rn") - 2) * (B - 2)) / (F.col("n") - 2)).cast("int")
            )
        ),
    )
    # decimal(38,0) sum: epoch-µs × bucket size exceeds int64 beyond
    # ~5k points/bucket (the 10× probe found the ANSI overflow;
    # DuckDB's SUM(BIGINT) widens to 128-bit implicitly)
    means = bucketed.groupBy("series", "b").agg(
        (
            F.sum(F.col("x").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mx"),
        (
            F.sum(F.col("y").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("my"),
    )
    p = means.select(
        F.col("series").alias("s1"), (F.col("b") + 1).alias("bp"),
        F.col("mx").alias("pmx"), F.col("my").alias("pmy"),
    )
    nx = means.select(
        F.col("series").alias("s2"), (F.col("b") - 1).alias("bn"),
        F.col("mx").alias("nmx"), F.col("my").alias("nmy"),
    )
    mids = bucketed.filter(F.col("b").between(1, B - 2))
    areas = (
        mids.join(p, (mids.series == p.s1) & (mids.b == p.bp))
        .join(nx, (mids.series == nx.s2) & (mids.b == nx.bn))
        .select(
            "series", "b", "x", "y", "rn",
            F.abs(
                (F.col("pmx") - F.col("nmx")) * (F.col("y") - F.col("pmy"))
                - (F.col("pmx") - F.col("x")) * (F.col("nmy") - F.col("pmy"))
            ).alias("area"),
        )
    )
    pick = W.partitionBy("series", "b").orderBy(F.desc("area"), F.asc("rn"))
    chosen = (
        areas.withColumn("pick", F.row_number().over(pick))
        .filter(F.col("pick") == 1)
        .select("series", F.col("b").alias("bucket"), F.col("x").alias("x_us"), "y")
    )
    ends = bucketed.filter(F.col("b").isin(0, B - 1)).select(
        "series", F.col("b").alias("bucket"), F.col("x").alias("x_us"), "y"
    )
    return chosen.unionAll(ends)


# ---------------------------------------------------------------------------
# ts24 — distribution drift (chi-square over value histograms)
# ---------------------------------------------------------------------------

TS24_BIN_WIDTH = 10.0
TS24_SPLIT = "2024-01-16"


@register(
    "ts24_distribution_drift",
    oracle=f"""
WITH binned AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{TS24_SPLIT}' THEN 'a' ELSE 'b' END AS cohort,
         CAST(floor(CAST(value AS DOUBLE) / {TS24_BIN_WIDTH}) AS BIGINT) AS bin
  FROM events
),
counts AS (
  SELECT event_type, bin,
         SUM(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS cb
  FROM binned GROUP BY event_type, bin
),
tot AS (
  SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb FROM counts GROUP BY event_type
),
terms AS (
  SELECT c.event_type, c.bin, t.na, t.nb,
         CAST(c.ca AS DOUBLE) / CAST(t.na AS DOUBLE) AS pa,
         CAST(c.cb AS DOUBLE) / CAST(t.nb AS DOUBLE) AS pb
  FROM counts c JOIN tot t ON c.event_type = t.event_type
  WHERE c.ca > 0
)
SELECT event_type,
       CAST(MAX(na) AS BIGINT) AS n_a,
       CAST(MAX(nb) AS BIGINT) AS n_b,
       round(list_reduce(list_prepend(0.0::DOUBLE,
               list((pb - pa) * (pb - pa) / pa ORDER BY bin)),
             (acc, x) -> acc + x), 8) AS drift_chi2
FROM terms
GROUP BY event_type
""",
    tags=("timeseries", "drift", "histogram", "events"),
    doc="Distribution drift between time cohorts by a chi-square "
    "statistic over fixed-width value histograms: events split at "
    f"{TS24_SPLIT} into reference (a) and current (b) cohorts, "
    "per-type value distributions bin at width 10 "
    "(q75's histogram rule), and drift = Σ (p_b − p_a)²/p_a over "
    "reference-occupied bins — the monitoring gate that catches a "
    "metric's DISTRIBUTION moving while its mean stays put (the "
    "failure averages hide).  Chi-square over PSI deliberately: PSI "
    "needs ln(), and libm transcendentals are not bit-identical "
    "across engines (the same reason t22's BM25 uses rational idf); "
    "the chi-square is pure rational arithmetic, summed as a "
    "bin-ordered fold (g01's contract).  One binning pass + "
    "|types × bins| tiny aggregate — scan-bound at any scale.",
)
def ts24_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit(TS24_SPLIT).cast("timestamp"), "a")
        .otherwise("b")
        .alias("cohort"),
        F.floor(F.col("value").cast("double") / TS24_BIN_WIDTH)
        .cast("bigint")
        .alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("cohort") == "a", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("cohort") == "b", 1).otherwise(0)).alias("cb"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    terms = (
        counts.join(F.broadcast(tot), "event_type")
        .filter(F.col("ca") > 0)
        .select(
            "event_type",
            "bin",
            "na",
            "nb",
            (F.col("ca").cast("double") / F.col("na").cast("double")).alias("pa"),
            (F.col("cb").cast("double") / F.col("nb").cast("double")).alias("pb"),
        )
    )
    chi2 = F.round(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "bin",
                        (
                            (F.col("pb") - F.col("pa"))
                            * (F.col("pb") - F.col("pa"))
                            / F.col("pa")
                        ).alias("t"),
                    )
                )
            )["t"],
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        8,
    )
    return terms.groupBy("event_type").agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        chi2.alias("drift_chi2"),
    )


# ---------------------------------------------------------------------------
# ts25 — winsorized robust aggregation
# ---------------------------------------------------------------------------


@register(
    "ts25_winsorized_stats",
    oracle="""
WITH ranked AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY CAST(value AS DOUBLE), event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
bounds AS (
  SELECT event_type,
         MAX(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT) THEN v END) AS lo,
         MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN v END) AS hi
  FROM ranked GROUP BY event_type
),
clamped AS (
  SELECT r.event_type, r.n,
         CASE WHEN r.v < b.lo THEN b.lo
              WHEN r.v > b.hi THEN b.hi
              ELSE r.v END AS w,
         r.v,
         CASE WHEN r.v < b.lo OR r.v > b.hi THEN 1 ELSE 0 END AS is_clamped
  FROM ranked r JOIN bounds b ON r.event_type = b.event_type
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(SUM(is_clamped) AS BIGINT) AS n_clamped,
       CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS raw_mean,
       CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS winsor_mean
FROM clamped
GROUP BY event_type
""",
    tags=("timeseries", "robust", "winsorize", "events"),
    doc="Winsorized robust aggregation: per event type, values clamp "
    "to their distribution's discrete p05/p95 (q55's row-selection "
    "rule — chosen bounds are REAL data points, no interpolation, so "
    "they are engine-portable for continuous doubles where "
    "PERCENTILE_CONT's interpolation is ulp-fragile), then the "
    "winsorized mean is reported against the raw mean plus the clamp "
    "count — the standard tamed-tail metric (Tukey/Dixon lineage) "
    "for dashboards a single outlier would otherwise swing, and the "
    "robust companion to ts13's z-score and ts21's MAD gates.  "
    "Clamped sums stay in the exact-decimal discipline; one window "
    "pass + one aggregate, both on the same event_type partitioning.",
)
def ts25_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").select(
        "event_type", "event_id", F.col("value").cast("double").alias("v")
    )
    w = W.partitionBy("event_type").orderBy("v", "event_id")
    wn = W.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.05 * F.col("n")).cast("bigint"), F.col("v"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.95 * F.col("n")).cast("bigint"), F.col("v"))
        ).alias("hi"),
    )
    clamped = ranked.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "n",
        "v",
        F.when(F.col("v") < F.col("lo"), F.col("lo"))
        .when(F.col("v") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("v"))
        .alias("w"),
        ((F.col("v") < F.col("lo")) | (F.col("v") > F.col("hi")))
        .cast("int")
        .alias("is_clamped"),
    )
    return clamped.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum("is_clamped").cast("bigint").alias("n_clamped"),
        (
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
            / F.max("n").cast("double")
        ).alias("raw_mean"),
        (
            F.sum(F.col("w").cast("decimal(18,6)")).cast("double")
            / F.max("n").cast("double")
        ).alias("winsor_mean"),
    )


# ---------------------------------------------------------------------------
# ts26 — linear multi-touch attribution
# ---------------------------------------------------------------------------


@register(
    "ts26_linear_attribution",
    oracle="""
WITH touches AS (
  SELECT p.event_id AS purchase_id,
         p.user_id,
         CAST(CAST(p.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS revenue_cents,
         v.event_id AS view_id,
         COUNT(*) OVER (PARTITION BY p.event_id) AS n_touches
  FROM events p
  JOIN events v ON v.user_id = p.user_id
               AND v.event_type = 'view'
               AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
  WHERE p.event_type = 'purchase'
)
SELECT purchase_id, user_id, view_id,
       CAST(n_touches AS BIGINT) AS n_touches,
       CAST(revenue_cents // n_touches
            + CASE WHEN view_id = MIN(view_id) OVER (PARTITION BY purchase_id)
                   THEN revenue_cents % n_touches ELSE 0 END AS BIGINT) AS credit_cents
FROM touches
""",
    tags=("timeseries", "attribution", "join", "events"),
    doc="Linear multi-touch attribution: each purchase's revenue "
    "splits EQUALLY across the same-user views in its preceding hour "
    "(st03's attribution window, now with the money allocated).  "
    "Credit is exact integer cents — floor division with the "
    "remainder assigned to the earliest touch (u08's "
    "installment-split rule): per-touch float division both drifts "
    "between engines and loses cents, and a ledger that doesn't sum "
    "exactly back to revenue fails reconciliation.  Physical shape: "
    "one user-keyed interval join (bounded by the 1-hour window) + "
    "two windows sharing the purchase partitioning; at 100 TB the "
    "streaming form is st03's watermarked join with this allocation "
    "as the post-join map.",
)
def ts26_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("revenue_cents"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("vts"),
    )
    touches = p.join(
        v,
        (p.p_user == v.v_user)
        & (v.vts <= p.pts)
        & (v.vts >= p.pts - F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", F.col("p_user").alias("user_id"), "revenue_cents", "view_id")
    wp = W.partitionBy("purchase_id")
    out = touches.withColumn("n_touches", F.count(F.lit(1)).over(wp)).withColumn(
        "first_view", F.min("view_id").over(wp)
    )
    credit = (
        F.floor(F.col("revenue_cents") / F.col("n_touches")).cast("bigint")
        + F.when(
            F.col("view_id") == F.col("first_view"),
            F.col("revenue_cents") % F.col("n_touches"),
        ).otherwise(0)
    )
    return out.select(
        "purchase_id",
        "user_id",
        "view_id",
        F.col("n_touches").cast("bigint").alias("n_touches"),
        credit.cast("bigint").alias("credit_cents"),
    )


# ---------------------------------------------------------------------------
# ts27 — resample to a regular grid with LINEAR INTERPOLATION
# ---------------------------------------------------------------------------


@register(
    "ts27_resample_interpolate",
    oracle="""
WITH grid AS (
  SELECT u.user_id, g.h AS slot
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20) u,
       generate_series(TIMESTAMP '2024-01-01 00:00:00',
                       TIMESTAMP '2024-01-03 23:00:00',
                       INTERVAL 1 HOUR) AS g(h)
),
hourly AS (
  SELECT user_id, slot, m FROM (
    SELECT user_id, date_trunc('hour', ts) AS slot,
           CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS m,
           ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE user_id < 20) t
  WHERE rn = 1
),
joined AS (
  SELECT g.user_id, g.slot, h.m,
         CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', g.slot)
              AS BIGINT) AS hh
  FROM grid g LEFT JOIN hourly h
    ON g.user_id = h.user_id AND g.slot = h.slot
),
ctx AS (
  SELECT user_id, slot, m, hh,
    last_value(m IGNORE NULLS) OVER wp AS pm,
    last_value(CASE WHEN m IS NOT NULL THEN hh END IGNORE NULLS) OVER wp AS ph,
    first_value(m IGNORE NULLS) OVER wf AS nm,
    first_value(CASE WHEN m IS NOT NULL THEN hh END IGNORE NULLS) OVER wf AS nh
  FROM joined
  WINDOW wp AS (PARTITION BY user_id ORDER BY slot ROWS UNBOUNDED PRECEDING),
         wf AS (PARTITION BY user_id ORDER BY slot
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       strftime(slot, '%Y-%m-%d %H:%M:%S') AS slot,
       m AS observed_micros,
       CASE WHEN m IS NOT NULL THEN m
            WHEN pm IS NULL OR nm IS NULL THEN NULL
            ELSE pm + CAST(FLOOR(((nm - pm) * (hh - ph)) / (nh - ph)) AS BIGINT)
       END AS filled_micros
FROM ctx
""",
    tags=("timeseries", "resample", "interpolate", "events"),
    doc="Resample to a regular hourly grid with LINEAR INTERPOLATION "
    "(pandas' resample().interpolate(), complement of ts15's LOCF): "
    "empty slots between two observations get the time-proportional "
    "blend pm + (nm-pm)*(h-ph)/(nh-ph); edges never extrapolate "
    "(leading/trailing gaps stay NULL).  Exactness discipline: values "
    "flow as integer MICROS and the blend is floor(integer*integer / "
    "small-int) — every intermediate is an exactly-representable "
    "integer (<=2^47) and the quotient's distance from any integer is "
    ">= 1/71, so double floor-division is bit-identical across "
    "engines (no decimal-rounding divergence).  Physical shape is "
    "ts15's: generated grid dimension x users, one (user,slot) left "
    "join, then two per-user ordered windows (carry-forward AND "
    "carry-backward) sharing one sort.  At 100 TB the grid stays a "
    "generated dimension and each user's series sorts once within "
    "its partition.",
)
def ts27_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    users = e.select("user_id").distinct()
    grid = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
                F.lit("2024-01-03 23:00:00").cast("timestamp_ntz"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("slot"),
    )
    w_last = W.partitionBy("user_id", "slot_h").orderBy(F.desc("ts"), F.desc("event_id"))
    hourly = (
        e.withColumn("slot_h", F.date_trunc("hour", "ts"))
        .withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("slot_h").alias("slot"),
            (F.col("value").cast("decimal(18,6)") * 1_000_000)
            .cast("bigint")
            .alias("m"),
        )
    )
    joined = (
        grid.join(hourly, ["user_id", "slot"], "left")
        .withColumn(
            "hh",
            F.expr(
                "timestampdiff(HOUR, TIMESTAMP_NTZ '2024-01-01 00:00:00', slot)"
            ).cast("bigint"),
        )
    )
    wp = W.partitionBy("user_id").orderBy("slot").rowsBetween(W.unboundedPreceding, 0)
    wf = W.partitionBy("user_id").orderBy("slot").rowsBetween(0, W.unboundedFollowing)
    obs_h = F.when(F.col("m").isNotNull(), F.col("hh"))
    ctx = joined.select(
        "user_id",
        "slot",
        "m",
        "hh",
        F.last("m", ignorenulls=True).over(wp).alias("pm"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("ph"),
        F.first("m", ignorenulls=True).over(wf).alias("nm"),
        F.first(obs_h, ignorenulls=True).over(wf).alias("nh"),
    )
    blend = F.col("pm") + F.floor(
        ((F.col("nm") - F.col("pm")) * (F.col("hh") - F.col("ph")))
        / (F.col("nh") - F.col("ph"))
    ).cast("bigint")
    return ctx.select(
        "user_id",
        F.date_format("slot", "yyyy-MM-dd HH:mm:ss").alias("slot"),
        F.col("m").alias("observed_micros"),
        F.when(F.col("m").isNotNull(), F.col("m"))
        .when(F.col("pm").isNull() | F.col("nm").isNull(), F.lit(None).cast("bigint"))
        .otherwise(blend)
        .alias("filled_micros"),
    )


# ---------------------------------------------------------------------------
# ts28 — business-day arithmetic (closed form, no calendar explode)
# ---------------------------------------------------------------------------


@register(
    "ts28_business_days",
    oracle="""
WITH base AS (
  SELECT o_orderkey,
         CAST(o_orderdate AS DATE) AS od,
         datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS n0
  FROM orders WHERE o_orderkey % 97 = 0
)
SELECT o_orderkey,
       strftime(od, '%Y-%m-%d') AS order_date,
       strftime(od + INTERVAL 21 DAY, '%Y-%m-%d') AS sla_date,
       CAST((5 * ((n0 + 22) // 7) + LEAST((n0 + 22) % 7, 5))
            - (5 * (n0 // 7) + LEAST(n0 % 7, 5)) AS BIGINT) AS business_days
FROM base
""",
    tags=("timeseries", "calendar", "business-days", "orders"),
    doc="Business-day arithmetic in CLOSED FORM: weekdays in "
    "[order_date, order_date + 21d] via f(n) = 5*(n div 7) + "
    "min(n mod 7, 5) anchored at Monday 1990-01-01, so bd = "
    "f(n+22) - f(n) — pure integer scalar math, NO calendar explode "
    "and NO engine dow() convention in sight (Spark's dayofweek is "
    "Sunday=1 where DuckDB's dow is Sunday=0, the classic silent "
    "cross-engine bug; anchoring at a known Monday sidesteps the "
    "whole family).  The formula is semantically pinned against a "
    "Python datetime replay in "
    "test_business_day_formula_matches_python.  Per-row map "
    "expression — the SLA-deadline column a 100 TB order stream "
    "derives inline, where the q64-style generated-calendar join "
    "(22x row fan-out) is only worth it once holidays enter.",
)
def ts28_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    od = F.col("o_orderdate").cast("date")
    n0 = F.datediff(od, F.lit("1990-01-01").cast("date"))

    def f(n):
        return 5 * F.floor(n / 7) + F.least(n % 7, F.lit(5))

    return o.select(
        "o_orderkey",
        F.date_format(od, "yyyy-MM-dd").alias("order_date"),
        F.date_format(F.date_add(od, 21), "yyyy-MM-dd").alias("sla_date"),
        (f(n0 + 22) - f(n0)).cast("bigint").alias("business_days"),
    )


# ---------------------------------------------------------------------------
# ts29 — moving-average crossover detection (momentum signals)
# ---------------------------------------------------------------------------


@register(
    "ts29_ma_crossover",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000) AS BIGINT) AS rev
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
mas AS (
  SELECT day, rev,
         CAST(SUM(rev) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
              // 3 AS BIGINT) AS short_ma,
         CAST(SUM(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
              // 7 AS BIGINT) AS long_ma,
         COUNT(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS w
  FROM daily
),
sig AS (
  SELECT day, rev, short_ma, long_ma,
         CASE WHEN short_ma > long_ma THEN 1 ELSE 0 END AS above,
         LAG(CASE WHEN short_ma > long_ma THEN 1 ELSE 0 END) OVER (ORDER BY day)
           AS prev_above
  FROM mas WHERE w = 7
)
SELECT strftime(day, '%Y-%m-%d') AS day, rev, short_ma, long_ma,
       CASE WHEN above = 1 AND prev_above = 0 THEN 'golden'
            WHEN above = 0 AND prev_above = 1 THEN 'death'
            ELSE 'none' END AS crossover
FROM sig WHERE prev_above IS NOT NULL
""",
    tags=("timeseries", "moving-average", "crossover", "events"),
    doc="Moving-average crossover detection (the momentum-signal "
    "primitive trading and alerting systems run on every metric): "
    "daily purchase revenue in exact integer micros, 3-day vs 7-day "
    "trailing means, and the day the short average crosses the long "
    "one flagged as golden (up) or death (down) via a lag on the "
    "above/below indicator.  Exactness: the means are INTEGER FLOOR "
    "means — SUM(micros) DIV n over full windows only — because "
    "AVG() routes through double division and the two engines "
    "round-trip the 53-bit quotient differently by 1 µunit (caught "
    "by the gate on first build; floor-of-integer-division cannot "
    "disagree on a positive domain).  No float accumulation.  Warm-up "
    "rows (incomplete 7-day window) are excluded by the window COUNT "
    "so both engines agree on where the signal stream starts.  One "
    "|days|-row relation after the first aggregate: the windows cost "
    "nothing at any corpus scale.",
)
def ts29_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum((F.col("value").cast("decimal(18,6)") * 1_000_000))
        .cast("bigint")
        .alias("rev")
    )
    w3 = W.orderBy("day").rowsBetween(-2, 0)
    w7 = W.orderBy("day").rowsBetween(-6, 0)
    mas = daily.select(
        "day",
        "rev",
        F.expr("SUM(rev) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) DIV 3")
        .cast("bigint")
        .alias("short_ma"),
        F.expr("SUM(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) DIV 7")
        .cast("bigint")
        .alias("long_ma"),
        F.count(F.lit(1)).over(w7).alias("w"),
    ).filter(F.col("w") == 7)
    above = F.when(F.col("short_ma") > F.col("long_ma"), 1).otherwise(0)
    sig = mas.select(
        "day",
        "rev",
        "short_ma",
        "long_ma",
        above.alias("above"),
        F.lag(above).over(W.orderBy("day")).alias("prev_above"),
    ).filter(F.col("prev_above").isNotNull())
    return sig.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "rev",
        "short_ma",
        "long_ma",
        F.when((F.col("above") == 1) & (F.col("prev_above") == 0), "golden")
        .when((F.col("above") == 0) & (F.col("prev_above") == 1), "death")
        .otherwise("none")
        .alias("crossover"),
    )


# ---------------------------------------------------------------------------
# ts30 — state dwell-time report (duration-weighted transitions)
# ---------------------------------------------------------------------------


@register(
    "ts30_state_durations",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(date_diff('second', ts, next_ts)) AS BIGINT) AS total_seconds,
       CAST(MAX(date_diff('second', ts, next_ts)) AS BIGINT) AS max_seconds
FROM seq WHERE next_ts IS NOT NULL
GROUP BY event_type
""",
    tags=("timeseries", "durations", "state", "events"),
    doc="State DWELL-TIME report: each event opens a state that lasts "
    "until the user's next event (lead over the (ts, event_id) "
    "order), and durations aggregate per state — 'how long do users "
    "sit in each state', the duration-weighted complement of q77's "
    "transition COUNTS (a state entered often but exited instantly "
    "dominates counts yet vanishes here; uptime/downtime and "
    "funnel-latency reports are this exact shape).  Durations are "
    "integer seconds via ts10's exact idiom — truncate both ends to "
    "whole seconds, then timestampdiff (DuckDB's date_diff counts "
    "second-BOUNDARY crossings, Spark's raw timestampdiff truncates "
    "elapsed microseconds; truncating first makes both count the "
    "same boundaries, timezone-independently); each user's final "
    "open state is excluded (unknowable duration, the honest "
    "right-censoring choice).  One per-user window + one small "
    "aggregate.",
)
def ts30_state_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", "ts", F.lead("ts").over(w).alias("next_ts")
    ).filter(F.col("next_ts").isNotNull())
    dur = F.expr(
        "timestampdiff(SECOND, date_trunc('second', ts),"
        " date_trunc('second', next_ts))"
    )
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(dur).cast("bigint").alias("total_seconds"),
        F.max(dur).cast("bigint").alias("max_seconds"),
    )


@register(
    "ts31_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000) AS BIGINT) AS rev
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
stat AS (SELECT CAST(SUM(rev) // COUNT(*) AS BIGINT) AS mu FROM daily),
cus AS (
  SELECT day, rev,
         CAST(SUM(rev - mu) OVER (ORDER BY day) AS BIGINT) AS cusum
  FROM daily CROSS JOIN stat
),
cp AS (SELECT day AS cp_day FROM cus ORDER BY ABS(cusum) DESC, day LIMIT 1),
seg AS (
  SELECT c.day, c.rev, c.cusum,
         CASE WHEN c.day = cp.cp_day THEN 1 ELSE 0 END AS is_changepoint,
         CASE WHEN c.day <= cp.cp_day THEN 'before' ELSE 'after' END AS segment
  FROM cus c CROSS JOIN cp
)
SELECT strftime(day, '%Y-%m-%d') AS day, rev, cusum,
       CAST(is_changepoint AS BIGINT) AS is_changepoint, segment,
       CAST(SUM(rev) OVER (PARTITION BY segment)
            // COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS segment_mean
FROM seg
""",
    tags=("timeseries", "changepoint", "cusum", "events"),
    doc="CUSUM changepoint estimation (Page 1954 lineage; the "
    "argmax-|cumulative-deviation| single-split estimator binary "
    "segmentation recurses on): daily purchase revenue in exact "
    "integer micros, cumulative deviation from the global integer "
    "floor mean, the day maximizing |CUSUM| flagged as the level "
    "shift, and both segments annotated with their own floor means "
    "— the drift/regime-shift primitive monitoring pipelines run "
    "on every metric.  ALL-INTEGER arithmetic (micros, floor "
    "means, integer cumsum): nothing for cross-engine float "
    "rounding to disagree on.  100 TB posture: the series is "
    "day-grained (agg output is |days| rows regardless of event "
    "volume), so the single-partition windows operate on a "
    "metadata-sized relation; the heavy lifting is one map-side "
    "partial agg over events.",
)
def ts31_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,6)") * 1_000_000)
        .cast("bigint")
        .alias("rev")
    )
    stat = daily.agg(
        F.expr("SUM(rev) DIV COUNT(*)").cast("bigint").alias("mu")
    )
    cus = daily.crossJoin(F.broadcast(stat)).select(
        "day",
        "rev",
        F.sum(F.col("rev") - F.col("mu"))
        .over(W.orderBy("day"))
        .cast("bigint")
        .alias("cusum"),
    )
    cp = (
        cus.orderBy(F.abs(F.col("cusum")).desc(), F.asc("day"))
        .limit(1)
        .select(F.col("day").alias("cp_day"))
    )
    seg = cus.crossJoin(F.broadcast(cp)).select(
        "day",
        "rev",
        "cusum",
        F.when(F.col("day") == F.col("cp_day"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_changepoint"),
        F.when(F.col("day") <= F.col("cp_day"), "before")
        .otherwise("after")
        .alias("segment"),
    )
    wseg = W.partitionBy("segment")
    return seg.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "rev",
        "cusum",
        "is_changepoint",
        "segment",
        F.expr(
            "SUM(rev) OVER (PARTITION BY segment)"
            " DIV COUNT(*) OVER (PARTITION BY segment)"
        )
        .cast("bigint")
        .alias("segment_mean"),
    )


@register(
    "ts32_theil_sen_trend",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000) AS BIGINT) AS rev
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, rev,
         day - MIN(day) OVER (PARTITION BY event_type) AS x
  FROM daily
),
pairs AS (
  SELECT a.event_type,
         CAST(((b.rev - a.rev) * 1000000) // (b.x - a.x) AS BIGINT) AS slope
  FROM idx a JOIN idx b ON a.event_type = b.event_type AND b.x > a.x
),
ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM pairs
)
SELECT event_type,
       CAST(MAX(cnt) AS BIGINT) AS n_pairs,
       CAST(MAX(CASE WHEN rn = (cnt + 1) // 2 THEN slope END) AS BIGINT)
         AS slope_micros_per_day,
       CASE WHEN MAX(CASE WHEN rn = (cnt + 1) // 2 THEN slope END) > 0
            THEN 'rising'
            WHEN MAX(CASE WHEN rn = (cnt + 1) // 2 THEN slope END) < 0
            THEN 'falling' ELSE 'flat' END AS trend
FROM ranked GROUP BY event_type
""",
    tags=("timeseries", "trend", "robust", "theil-sen", "events"),
    doc="Theil–Sen robust trend estimation (Theil 1950 / Sen 1968): "
    "per event type, the MEDIAN of all pairwise day-to-day revenue "
    "slopes — the breakdown-point-0.29 alternative to least-squares "
    "that one outlier day cannot drag, which is why monitoring "
    "systems prefer it for drift direction.  Slopes are exact "
    "integers (micros·1e6 per day, truncating integer division — "
    "Spark DIV and DuckDB // share toward-zero semantics), and the "
    "median is the DISCRETE lower-middle order statistic picked by "
    "rank, never an interpolated float.  The O(days²) pair join is "
    "intentional and safe: the input is the day-grained aggregate "
    "(metadata-sized regardless of event volume — a year is 66k "
    "pairs), the same contract as ts31's windows; at 100 TB the "
    "heavy work remains the one partial-agg scan of events.",
)
def ts32_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)") * 1_000_000)
        .cast("bigint")
        .alias("rev")
    )
    idx = daily.select(
        "event_type",
        "rev",
        F.datediff(
            "day", F.min("day").over(W.partitionBy("event_type"))
        ).alias("x"),
    )
    a = idx.select(
        F.col("event_type").alias("et"),
        F.col("rev").alias("rev_a"),
        F.col("x").alias("x_a"),
    )
    b = idx.select(
        F.col("event_type").alias("et"),
        F.col("rev").alias("rev_b"),
        F.col("x").alias("x_b"),
    )
    pairs = a.join(b, "et").filter(F.col("x_b") > F.col("x_a")).select(
        F.col("et").alias("event_type"),
        F.expr("CAST(((rev_b - rev_a) * 1000000) DIV (x_b - x_a) AS BIGINT)")
        .alias("slope"),
    )
    wp = W.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wp.orderBy("slope")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
    )
    med = F.max(
        F.when(F.col("rn") == F.expr("(cnt + 1) DIV 2"), F.col("slope"))
    )
    return ranked.groupBy("event_type").agg(
        F.max("cnt").cast("bigint").alias("n_pairs"),
        med.cast("bigint").alias("slope_micros_per_day"),
        F.when(med > 0, "rising")
        .when(med < 0, "falling")
        .otherwise("flat")
        .alias("trend"),
    )


@register(
    "ts33_burstiness",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM daily GROUP BY event_type
)
SELECT event_type, n AS n_days, s1 AS total_events,
       round((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
             / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 8) AS fano_factor,
       round((sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
              - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             / (sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 8) AS burstiness
FROM mom
""",
    tags=("timeseries", "burstiness", "moments", "events"),
    doc="Traffic burstiness profile per event type: the Fano factor "
    "(variance-to-mean of daily counts; 1 = Poisson, >1 = "
    "overdispersed/bursty) and the Goh–Barabási burstiness "
    "coefficient B = (σ−μ)/(σ+μ) ∈ (−1, 1) — the two standard "
    "clumpiness diagnostics capacity planning and anomaly "
    "baselining start from.  The q70/g09 moments discipline: daily "
    "counts are integers, so n, Σc, Σc² are exact order-independent "
    "BIGINTs; doubles appear only in the final closed-form "
    "expression (one sqrt, fixed operation sequence) evaluated "
    "identically by both engines.  One partial-agg scan to "
    "day-grain, then a 5-row reduce.",
)
def ts33_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    var = (d("n") * d("s2") - d("s1") * d("s1")) / (d("n") * (d("n") - F.lit(1.0)))
    mean = d("s1") / d("n")
    return mom.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("s1").alias("total_events"),
        F.round(var / mean, 8).alias("fano_factor"),
        F.round((F.sqrt(var) - mean) / (F.sqrt(var) + mean), 8).alias(
            "burstiness"
        ),
    )


@register(
    "ts34_autocorrelation",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
gmom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(x * x) AS BIGINT) AS s2
  FROM daily
),
lags AS (SELECT i AS lag FROM generate_series(1, 7) AS g(i)),
pairs AS (
  SELECT l.lag,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(a.x * b.x) AS BIGINT) AS sxy,
         CAST(SUM(a.x) AS BIGINT) AS sa,
         CAST(SUM(b.x) AS BIGINT) AS sb
  FROM lags l
  JOIN daily a ON TRUE
  JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
  GROUP BY l.lag
)
SELECT p.lag, p.n_pairs,
       round((CAST(p.sxy AS DOUBLE)
              - (CAST(g.s1 AS DOUBLE) / CAST(g.n AS DOUBLE))
                * (CAST(p.sa AS DOUBLE) + CAST(p.sb AS DOUBLE))
              + CAST(p.n_pairs AS DOUBLE)
                * (CAST(g.s1 AS DOUBLE) / CAST(g.n AS DOUBLE))
                * (CAST(g.s1 AS DOUBLE) / CAST(g.n AS DOUBLE)))
             / (CAST(g.s2 AS DOUBLE)
                - CAST(g.n AS DOUBLE)
                  * (CAST(g.s1 AS DOUBLE) / CAST(g.n AS DOUBLE))
                  * (CAST(g.s1 AS DOUBLE) / CAST(g.n AS DOUBLE))), 8) AS acf
FROM pairs p CROSS JOIN gmom g
""",
    tags=("timeseries", "autocorrelation", "moments", "events"),
    doc="Sample autocorrelation function of the daily event-count "
    "series at lags 1-7 — the seasonality/memory diagnostic run "
    "before any forecasting or anomaly model (a weekly cycle shows "
    "as a lag-7 peak).  Standard ACF estimator: full-series mean "
    "and variance in the denominator, lag-k cross products in the "
    "numerator, expanded so every aggregate is an exact "
    "order-independent integer (n, Σx, Σx², and per-lag Σx·x₊ₖ, "
    "Σx, Σx₊ₖ via a self-join on day+k); doubles enter only in the "
    "final closed-form expression with a fixed operation sequence "
    "(the q70/g09/ts33 moments discipline).  100 TB posture: one "
    "partial-agg scan to day grain, then the self-join and moments "
    "run on |days| rows × 7 lags — metadata-sized regardless of "
    "event volume.",
)
def ts34_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    glob = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"),
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day").alias("a_day"), F.col("x").alias("ax"))
    b = daily.select(F.col("day").alias("b_day"), F.col("x").alias("bx"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b_day") == F.date_add(F.col("a_day"), F.col("lag")))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("ax") * F.col("bx")).cast("bigint").alias("sxy"),
            F.sum("ax").cast("bigint").alias("sa"),
            F.sum("bx").cast("bigint").alias("sb"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = d("s1") / d("n")
    num = d("sxy") - mean * (d("sa") + d("sb")) + d("n_pairs") * mean * mean
    den = d("s2") - d("n") * mean * mean
    return pairs.crossJoin(F.broadcast(glob)).select(
        "lag", "n_pairs", F.round(num / den, 8).alias("acf")
    )


@register(
    "ts35_ohlc_resample",
    oracle="""
WITH keyed AS (
  SELECT event_type,
         date_trunc('hour', ts) AS hour,
         CAST(epoch(ts) AS BIGINT) * 100000000 + event_id AS okey,
         CAST(value AS DOUBLE) AS v
  FROM events
)
SELECT event_type,
       strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       arg_min(v, okey) AS open,
       round(MAX(v), 8) AS high,
       round(MIN(v), 8) AS low,
       arg_max(v, okey) AS close,
       CAST(COUNT(*) AS BIGINT) AS n
FROM keyed
GROUP BY event_type, hour
""",
    tags=("timeseries", "ohlc", "argminmax", "events"),
    doc="OHLC bar resampling via the arg-min/arg-max AGGREGATE "
    "surface (F.min_by / F.max_by ↔ DuckDB arg_min/arg_max) — "
    "selection-by-ordering as a hash aggregate instead of ts18's "
    "window-rank formulation: one partial-agg pass, no sort, no "
    "window state.  Determinism is the subtle part pinned here: "
    "min_by/max_by with a tied ordering key is engine-chosen, so "
    "the ordering key is epoch-seconds × 1e8 + event_id — unique "
    "per row by construction (event_id < 1e8 at every fixture "
    "scale), making open/close well-defined selections.  100 TB "
    "posture: this is THE preferred OHLC shape at scale — map-side "
    "combinable partial aggregates ((key, value) pairs merge by "
    "key comparison), vs the window form's full per-partition "
    "sort; |types × hours| output rows.",
)
def ts35_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    keyed = e.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
        (
            F.unix_timestamp("ts").cast("bigint") * F.lit(100000000)
            + F.col("event_id")
        ).alias("okey"),
        F.col("value").cast("double").alias("v"),
    )
    return keyed.groupBy("event_type", "hour").agg(
        F.min_by("v", "okey").alias("open"),
        F.round(F.max("v"), 8).alias("high"),
        F.round(F.min("v"), 8).alias("low"),
        F.max_by("v", "okey").alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "open", "high", "low", "close", "n",
    )


@register(
    "ts36_max_drawdown",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, day, v,
         SUM(v) OVER (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS equity
  FROM daily
),
dd AS (
  SELECT event_type, day, equity,
         MAX(equity) OVER (PARTITION BY event_type ORDER BY day
                           ROWS UNBOUNDED PRECEDING) AS hwm
  FROM cum
),
worst AS (
  SELECT event_type, day, hwm - equity AS drawdown,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY hwm - equity DESC, day) AS rn
  FROM dd
)
SELECT event_type,
       CAST(drawdown AS BIGINT) AS max_drawdown_micros,
       strftime(day, '%Y-%m-%d') AS trough_day,
       CAST((SELECT MAX(hwm) FROM dd d2 WHERE d2.event_type = worst.event_type)
            AS BIGINT) AS peak_equity_micros
FROM worst WHERE rn = 1
""",
    tags=("timeseries", "drawdown", "window", "events"),
    doc="Maximum drawdown with high-water mark — the risk metric "
    "every equity/traffic curve audit reports: daily value sums "
    "(exact integer micros) accumulate to an equity curve, the "
    "running MAX gives the high-water mark, and the deepest "
    "(hwm − equity) gap is the max drawdown, earliest-day "
    "tie-break.  Three ordered windows SHARING one "
    "(event_type, day) sort — Spark plans a single exchange+sort "
    "for all of them — then a per-type argmax.  All arithmetic "
    "exact integers end to end; |types × days| intermediate rows "
    "regardless of event volume.",
)
def ts36_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)") * 1_000_000)
        .cast("bigint")
        .alias("v")
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    dd = daily.withColumn("equity", F.sum("v").over(w)).withColumn(
        "hwm", F.max(F.sum("v").over(w)).over(w)
    )
    worst_w = W.partitionBy("event_type").orderBy(
        F.desc(F.col("hwm") - F.col("equity")), F.asc("day")
    )
    peaks = dd.groupBy("event_type").agg(
        F.max("hwm").cast("bigint").alias("peak_equity_micros")
    )
    return (
        dd.withColumn("rn", F.row_number().over(worst_w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            (F.col("hwm") - F.col("equity")).cast("bigint").alias(
                "max_drawdown_micros"
            ),
            F.date_format("day", "yyyy-MM-dd").alias("trough_day"),
        )
        .join(F.broadcast(peaks), "event_type")
    )


@register(
    "ts37_seasonality_strength",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
dow AS (
  SELECT event_type, CAST(dayofweek(day) AS INT) AS wd,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(c) AS BIGINT) AS s1_g
  FROM daily GROUP BY 1, 2
),
tot AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM daily GROUP BY event_type
),
ssb AS (
  SELECT d.event_type,
         SUM(CAST(d.s1_g AS DOUBLE) * CAST(d.s1_g AS DOUBLE)
             / CAST(d.n_g AS DOUBLE) ORDER BY d.wd) AS grp_term
  FROM dow d GROUP BY d.event_type
)
SELECT t.event_type, t.n AS n_days,
       round((s.grp_term - CAST(t.s1 AS DOUBLE) * CAST(t.s1 AS DOUBLE)
                            / CAST(t.n AS DOUBLE))
             / (CAST(t.s2 AS DOUBLE) - CAST(t.s1 AS DOUBLE) * CAST(t.s1 AS DOUBLE)
                                        / CAST(t.n AS DOUBLE)), 8) AS eta_sq
FROM tot t JOIN ssb s ON t.event_type = s.event_type
""",
    tags=("timeseries", "seasonality", "moments", "events"),
    doc="Weekly seasonality strength per event type: η² — the "
    "between-weekday share of daily-count variance "
    "(SSB/SST via the computational identity "
    "Σ_g S1_g²/n_g − S1²/n over S2 − S1²/n) — the one-number answer "
    "to 'does this series have a weekly cycle worth modeling', "
    "η² → 1 meaning weekday explains everything, → 0 noise.  "
    "Moments discipline with one extension: the 7 per-weekday "
    "S1_g²/n_g terms are doubles, so their sum is a "
    "WEEKDAY-ORDERED fold on both engines (Spark sorts the 7-row "
    "array; DuckDB SUM(... ORDER BY wd) — DuckDB's ordered "
    "aggregate makes the sequence explicit).  Day-grain partial "
    "agg, then 7-row math.",
)
def ts37_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    dow = daily.groupBy(
        "event_type", F.dayofweek("day").cast("int").alias("wd")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("c").cast("bigint").alias("s1_g"),
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    term = (
        F.col("s1_g").cast("double")
        * F.col("s1_g").cast("double")
        / F.col("n_g").cast("double")
    )
    ssb = dow.select("event_type", "wd", term.alias("t")).groupBy(
        "event_type"
    ).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("wd", "t")))["t"],
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("grp_term")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean_sq = d("s1") * d("s1") / d("n")
    return tot.join(ssb, "event_type").select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(
            (F.col("grp_term") - mean_sq) / (d("s2") - mean_sq), 8
        ).alias("eta_sq"),
    )


@register(
    "ts38_kendall_tau",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
aligned AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.day, a.c AS x, b.c AS y
  FROM daily a JOIN daily b
    ON a.day = b.day AND a.event_type < b.event_type
),
pairs AS (
  SELECT p.type_a, p.type_b,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN (p.x - q.x) * (p.y - q.y) > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS concordant,
         CAST(SUM(CASE WHEN (p.x - q.x) * (p.y - q.y) < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS discordant,
         CAST(SUM(CASE WHEN p.x = q.x AND p.y <> q.y THEN 1 ELSE 0 END)
              AS BIGINT) AS ties_x,
         CAST(SUM(CASE WHEN p.y = q.y AND p.x <> q.x THEN 1 ELSE 0 END)
              AS BIGINT) AS ties_y
  FROM aligned p JOIN aligned q
    ON p.type_a = q.type_a AND p.type_b = q.type_b AND p.day < q.day
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_pairs, concordant, discordant,
       round(CAST(concordant - discordant AS DOUBLE)
             / (sqrt(CAST(concordant + discordant + ties_x AS DOUBLE))
                * sqrt(CAST(concordant + discordant + ties_y AS DOUBLE))), 8)
         AS tau_b
FROM pairs
""",
    tags=("timeseries", "correlation", "kendall", "events"),
    doc="Kendall τ-b rank correlation between every pair of event "
    "types' daily-count series — the nonparametric complement to "
    "ts22's lagged Pearson: outlier-robust, invariant to any "
    "monotone transform, and (the engine reason it's here) "
    "computable in EXACT INTEGERS end-to-end — concordant / "
    "discordant / tie counts are plain sums over day pairs, with "
    "doubles only in the final two-sqrt τ-b normalization (fixed "
    "sequence, q70/g09 discipline).  Day pairs are "
    "|days|² over the day-grain aggregate — metadata-sized at any "
    "event volume; the type-pair alignment is a |days|-row "
    "self-join.",
)
def ts38_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = daily.select(
        F.col("event_type").alias("type_a"), "day", F.col("c").alias("x")
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("day_b"),
        F.col("c").alias("y"),
    )
    aligned = a.join(
        b,
        (F.col("day") == F.col("day_b")) & (F.col("type_a") < F.col("type_b")),
    ).select("type_a", "type_b", "day", "x", "y")
    p = aligned
    q = aligned.select(
        F.col("type_a").alias("qa"), F.col("type_b").alias("qb"),
        F.col("day").alias("qday"), F.col("x").alias("qx"), F.col("y").alias("qy"),
    )
    joined = p.join(
        q,
        (F.col("type_a") == F.col("qa"))
        & (F.col("type_b") == F.col("qb"))
        & (F.col("day") < F.col("qday")),
    )
    sgn = (F.col("x") - F.col("qx")) * (F.col("y") - F.col("qy"))
    pairs = joined.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("bigint").alias("concordant"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("bigint").alias("discordant"),
        F.sum(
            F.when((F.col("x") == F.col("qx")) & (F.col("y") != F.col("qy")), 1)
            .otherwise(0)
        ).cast("bigint").alias("ties_x"),
        F.sum(
            F.when((F.col("y") == F.col("qy")) & (F.col("x") != F.col("qx")), 1)
            .otherwise(0)
        ).cast("bigint").alias("ties_y"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return pairs.select(
        "type_a", "type_b", "n_pairs", "concordant", "discordant",
        F.round(
            (d("concordant") - d("discordant"))
            / (
                F.sqrt(d("concordant") + d("discordant") + d("ties_x"))
                * F.sqrt(d("concordant") + d("discordant") + d("ties_y"))
            ),
            8,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# ts39 — interval-union coverage (merge overlapping intervals)
# ---------------------------------------------------------------------------


@register(
    "ts39_interval_coverage",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS s_us,
         epoch_us(ts) + 1800000000 AS e_us
  FROM events
),
m AS (
  SELECT user_id, event_id, s_us, e_us,
         MAX(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pm
  FROM base
),
i AS (
  SELECT user_id, s_us, e_us,
         SUM(CASE WHEN pm IS NULL OR s_us > pm THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s_us, event_id
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM m
),
g AS (
  SELECT user_id, island, MAX(e_us) - MIN(s_us) AS cov_us
  FROM i GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(cov_us) AS BIGINT) AS covered_us
FROM g GROUP BY user_id
""",
    tags=("timeseries", "interval", "union", "events"),
    doc="Interval-UNION coverage — merge overlapping intervals and "
    "measure what they actually cover: every event opens a "
    "30-minute activity interval; per user, overlapping/touching "
    "intervals coalesce into islands (the classic cumulative-max "
    "sweep: an interval starts a new island iff its start exceeds "
    "the running max of all earlier ends — half-open [s,e) "
    "semantics, so exact adjacency chains) and the report is "
    "islands + total covered time.  The metric double-counting "
    "naive SUM(duration) gets wrong and ts17's concurrency sweep "
    "does not answer (coverage ≠ overlap depth) — billable active "
    "time, sensor uptime, effective listening windows.  All arithmetic "
    "is epoch-microsecond integers — exact, hash-matchable.  "
    "Shape: one shuffle keyed by user for the ordered sweep "
    "window, then two partial-agg reduces; per-user event runs are "
    "bounded, and a whale user would take the q66 range-partition "
    "lane.",
)
def ts39_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s_us"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + 1800000000).alias("e_us"),
    )
    w = W.partitionBy("user_id").orderBy("s_us", "event_id")
    m = base.withColumn(
        "pm", F.max("e_us").over(w.rowsBetween(W.unboundedPreceding, -1))
    )
    i = m.withColumn(
        "island",
        F.sum(
            F.when(F.col("pm").isNull() | (F.col("s_us") > F.col("pm")), 1).otherwise(
                0
            )
        ).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    g = i.groupBy("user_id", "island").agg(
        (F.max("e_us") - F.min("s_us")).alias("cov_us")
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("cov_us").cast("bigint").alias("covered_us"),
    )
