"""Scale-posture tests: assert the physical plans we rely on at 100 TB
actually materialize (pushdown, pruning, broadcast, top-k)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flaco_spark.inventory import load_inventory
from flaco_spark.plans import (
    broadcast_join_count,
    has_pushed_filters,
    read_schema_columns,
    uses_take_ordered,
)

REGISTRY = load_inventory()


def test_filter_pushdown_q06(spark, sf_dir):
    df = REGISTRY["q06_forecast_revenue"].builder(spark, sf_dir)
    assert has_pushed_filters(df), "q06 predicates must reach the parquet scan"


def test_column_pruning_q02(spark, sf_dir):
    df = REGISTRY["q02_projection_filter"].builder(spark, sf_dir)
    cols = read_schema_columns(df)
    assert set(cols) <= {
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
        "l_quantity",
        "l_shipdate",
    }, f"scan reads more columns than the query needs: {cols}"


def test_broadcast_joins_q05(spark, sf_dir):
    df = REGISTRY["q05_local_supplier_volume"].builder(spark, sf_dir)
    assert broadcast_join_count(df) >= 4, "dimension joins must be broadcast"


def test_sf_scaled_dims_fall_back_to_smj(spark, sf_dir):
    """customer/supplier/part carry NO forced broadcast hint: with the
    size threshold disabled their joins degrade to sort-merge (the
    100 TB-safe path), while fixed-cardinality nation/region keep
    their explicit hints.  With the default threshold the small local
    tables still auto-broadcast (next test)."""
    from flaco_spark.plans import formatted_plan, sort_merge_join_count

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        q03 = REGISTRY["q03_shipping_priority"].builder(spark, sf_dir)
        assert broadcast_join_count(q03) == 0, "q03 has no fixed-cardinality dim"
        assert sort_merge_join_count(q03) >= 2
        q05 = REGISTRY["q05_local_supplier_volume"].builder(spark, sf_dir)
        plan = formatted_plan(q05)
        # nation + region stay broadcast by explicit hint; customer,
        # supplier, and the fact-fact join all degrade to SMJ.
        assert broadcast_join_count(q05) == 2
        assert sort_merge_join_count(q05) >= 3
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_aqe_promotes_smj_to_broadcast_at_runtime(spark, sf_dir):
    """The other half of the size-aware story: with the STATIC
    threshold disabled (plan compiles to SMJ, as it would against an
    unknown-size 100 TB table) but the ADAPTIVE threshold on, AQE
    re-plans the join as broadcast at runtime from the actual shuffle
    sizes — so dropping the forced hints costs nothing when the dim
    really is small."""
    from flaco_spark.plans import formatted_plan

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        df = REGISTRY["q03_shipping_priority"].builder(spark, sf_dir)
        assert broadcast_join_count(df) == 0, "static plan must be SMJ"
        df.collect()  # execute THIS plan (count() would build a new one)
        final = formatted_plan(df)
        assert "isFinalPlan=true" in final
        assert "BroadcastHashJoin" in final, "AQE must promote the small side"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_small_dims_auto_broadcast_at_default_threshold(spark, sf_dir):
    """Same queries, default 64 MB threshold: the sub-threshold local
    tables broadcast WITHOUT hints (so local plans are unchanged by
    the hint removal)."""
    q03 = REGISTRY["q03_shipping_priority"].builder(spark, sf_dir)
    assert broadcast_join_count(q03) >= 1


def test_topk_plan_q46(spark, sf_dir):
    df = REGISTRY["q46_topk"].builder(spark, sf_dir)
    assert uses_take_ordered(df), "ORDER BY + LIMIT must plan as TakeOrderedAndProject"


def test_knn_is_map_side(spark, sf_dir):
    """Brute-force knn must broadcast the query side — candidates never shuffle
    before scoring."""
    df = REGISTRY["e01_knn_bruteforce"].builder(spark, sf_dir)
    assert broadcast_join_count(df) >= 1


def test_ann_topk_is_two_phase(spark, sf_dir):
    """No ANN reducer may hold a query's full candidate set: the first
    window must partition by (query, input-partition) — the plan's
    first Window partition spec carries the _pid column — and only the
    ≤ k×partitions survivors reach the per-query window."""
    from flaco_spark.plans import formatted_plan

    for name in ("e01_knn_bruteforce", "e03_ann_sign_lsh", "e04_ann_ivf"):
        plan = formatted_plan(REGISTRY[name].builder(spark, sf_dir))
        assert "_pid" in plan, f"{name}: local top-k phase missing (_pid not in plan)"
        assert plan.count("row_number()") >= 2, f"{name}: expected local+global rank windows"


def test_topk_per_query_exactness(spark):
    """Two-phase top-k equals the single-window top-k on a dataset
    spread over many partitions (lossless pruning property)."""
    from pyspark.sql import Window as W
    from flaco_spark.operators.similarity import topk_per_query

    rows = [(q, i, float((q * 7 + i * 13) % 101)) for q in range(4) for i in range(500)]
    df = spark.createDataFrame(rows, ["qid", "nid", "score"]).repartition(16)
    got = topk_per_query(df, "qid", [F.desc("score"), F.asc("nid")], 5).select(
        "qid", "nid", "score", "rn"
    )
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("nid"))
    want = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "nid", "score", "rn")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_q07_broadcasts_all_dims(spark, sf_dir):
    """6-table join: every dim side broadcast; only lineitem ⋈ orders may
    shuffle."""
    df = REGISTRY["q07_nation_trade"].builder(spark, sf_dir)
    assert broadcast_join_count(df) >= 4


def test_q09_pushes_like_filter_and_broadcasts(spark, sf_dir):
    df = REGISTRY["q09_product_profit"].builder(spark, sf_dir)
    assert broadcast_join_count(df) >= 3
    cols = read_schema_columns(df)
    # lineitem scan must not read l_tax/l_returnflag etc.
    assert "l_tax" not in cols and "l_returnflag" not in cols


def test_ivf_seed_join_is_broadcast(spark, sf_dir):
    """IVF assign stage: seed table must broadcast (candidates never
    shuffle for cell assignment)."""
    df = REGISTRY["e04_ann_ivf"].builder(spark, sf_dir)
    assert broadcast_join_count(df) >= 2


def test_frame_sample_fanout_cardinality(spark, sf_dir):
    """m02: output rows == sum over docs of ceil(n_frames / stride)."""
    from flaco_spark.operators.multimodal import FRAME_STRIDE

    from flaco_spark.tables import table as _table
    docs = _table(spark, sf_dir, "documents")
    expected = (
        docs.select(
            (
                F.floor(
                    (F.length(F.encode(F.col("text"), "UTF-8")) % 24)
                    / F.lit(FRAME_STRIDE)
                )
                + 1
            ).alias("k")
        )
        .agg(F.sum("k"))
        .collect()[0][0]
    )
    got = REGISTRY["m02_frame_sample"].builder(spark, sf_dir).count()
    assert got == expected


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key join with ZERO exchanges,
    and the result matches the plain (shuffled) join."""
    from flaco_spark.operators.bucketing import (
        drop_bucketed,
        read_bucketed,
        write_bucketed,
    )
    from flaco_spark.plans import exchange_count
    from flaco_spark.tables import table as _table

    l = _table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = _table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    try:
        write_bucketed(l, "bkt_lineitem", "l_orderkey", path=str(tmp_path / "l"))
        write_bucketed(o, "bkt_orders", "o_orderkey", path=str(tmp_path / "o"))
        bl, bo = read_bucketed(spark, "bkt_lineitem"), read_bucketed(spark, "bkt_orders")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        assert exchange_count(joined) == 0, "bucketed join must not shuffle"
        assert joined.count() == l.join(o, l.l_orderkey == o.o_orderkey).count()
    finally:
        drop_bucketed(spark, "bkt_lineitem")
        drop_bucketed(spark, "bkt_orders")


def test_streaming_batch_symmetry(spark, sf_dir):
    """Windowed streaming aggregation matches the batch equivalent."""
    from flaco_spark.streaming import windowed_event_counts

    from flaco_spark.tables import table as _table
    events = _table(spark, sf_dir, "events")
    got = {
        (r.window_start, r.event_type): r.n
        for r in windowed_event_counts(events).collect()
    }
    want = {
        (r.ws, r.event_type): r.n
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_stateful_stream_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState running profiles converge to the batch
    aggregate when the stream is drained (availableNow)."""
    import shutil

    from flaco_spark.streaming import user_profiles_batch, user_profiles_stream
    from flaco_spark.tables import convert_event_ts, table as _table

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    stream = spark.readStream.schema(raw_schema).parquet(str(src_dir))
    q = (
        user_profiles_stream(convert_event_ts(stream))
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per user wins (update mode may emit a row per batch)
    got_df = spark.sql(
        "SELECT user_id, n_events, total_value, last_seen_us FROM profiles"
    ).toPandas()
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2), r.last_seen_us)
        for r in got_df.drop_duplicates("user_id", keep="last").itertuples()
    }
    want = {
        r.user_id: (r.n_events, round(r.total_value, 2), r.last_seen_us)
        for r in user_profiles_batch(_table(spark, sf_dir, "events")).collect()
    }
    assert got == want


def test_sessionization_batch_boundary_independent(spark, sf_dir, tmp_path):
    """st04's claim, proven: the emitted session set is IDENTICAL
    whether the stream arrives as one micro-batch or two (time-split
    files, maxFilesPerTrigger=1) — open sessions crossing the batch
    boundary carry through explicit state, closed ones emit exactly
    once.  This is the property that makes a custom stateful operator
    oracle-checkable at all."""
    import time as _time

    import duckdb as _duck

    from flaco_spark.streaming.ingest import sessionize_stream

    src1 = tmp_path / "one"
    src2 = tmp_path / "two"
    src1.mkdir()
    src2.mkdir()
    sf_events = f"{sf_dir}/events.parquet"
    # single file vs two time-split halves (ascending: nothing late)
    _duck.sql(
        f"COPY (SELECT * FROM read_parquet('{sf_events}') ORDER BY ts, event_id) "
        f"TO '{src1}/all.parquet' (FORMAT PARQUET)"
    )
    _duck.sql(
        f"COPY (SELECT * FROM read_parquet('{sf_events}') "
        f"WHERE ts < (SELECT median(ts) FROM read_parquet('{sf_events}')) "
        f"ORDER BY ts, event_id) TO '{src2}/a_first.parquet' (FORMAT PARQUET)"
    )
    _time.sleep(1.1)  # distinct mtimes order the two micro-batches
    _duck.sql(
        f"COPY (SELECT * FROM read_parquet('{sf_events}') "
        f"WHERE ts >= (SELECT median(ts) FROM read_parquet('{sf_events}')) "
        f"ORDER BY ts, event_id) TO '{src2}/b_second.parquet' (FORMAT PARQUET)"
    )

    from flaco_spark.tables import convert_event_ts

    raw_schema = spark.read.parquet(sf_events).schema

    def run(src, name, one_file_per_batch):
        stream = spark.readStream.schema(raw_schema)
        if one_file_per_batch:
            stream = stream.option("maxFilesPerTrigger", 1)
        sessions = sessionize_stream(convert_event_ts(stream.parquet(str(src))))
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.table(name).collect()
        )

    single = run(src1, "sess_single", False)
    split = run(src2, "sess_split", True)
    assert single == split
    assert len(single) > 0  # non-vacuous: sessions actually closed


def test_salted_agg_equals_plain(spark, sf_dir):
    from flaco_spark.compat import money
    from flaco_spark.operators.skew import salted_sum_count
    from flaco_spark.tables import table as _table

    o = _table(spark, sf_dir, "orders")
    salted = {
        r.o_custkey: (str(r.s), r.n)
        for r in salted_sum_count(
            o, ["o_custkey"], money("o_totalprice"), ["o_orderkey"]
        ).collect()
    }
    plain = {
        r.o_custkey: (str(r.s), r.n)
        for r in o.groupBy("o_custkey")
        .agg(F.sum(money("o_totalprice")).alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == plain


def test_streaming_parquet_sink(spark, sf_dir, tmp_path):
    from flaco_spark.streaming import stream_parquet_sink, windowed_event_counts
    from flaco_spark.tables import convert_event_ts

    import shutil

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    q = stream_parquet_sink(
        spark,
        source_dir=str(src_dir),
        schema=raw_schema,
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        transform=lambda df: windowed_event_counts(convert_event_ts(df)),
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() > 0
    assert set(out.columns) == {"window_start", "window_end", "event_type", "n"}


def test_streaming_dedup_bounded_state_matches_batch(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark (bounded state) drained over the
    events table yields exactly the batch dedup's key set."""
    import shutil

    from flaco_spark.streaming import dedup_stream
    from flaco_spark.tables import convert_event_ts, table as _table

    src_dir = tmp_path / "dd_src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    stream = spark.readStream.schema(raw_schema).parquet(str(src_dir))
    q = (
        dedup_stream(convert_event_ts(stream))
        .writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.event_type)
        for r in spark.sql("SELECT user_id, event_type FROM dd_out").collect()
    }
    want = {
        (r.user_id, r.event_type)
        for r in dedup_stream(_table(spark, sf_dir, "events"))
        .select("user_id", "event_type")
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_watermark_drops_late_rows(spark, sf_dir, tmp_path):
    """Append-mode watermark semantics: a row arriving later than
    watermark+window behind the max event time is dropped."""
    import time as _time

    from pyspark.sql import functions as F

    src_dir = tmp_path / "wm_src"
    src_dir.mkdir()
    schema = "ts TIMESTAMP, k STRING"

    on_time = spark.createDataFrame(
        [("2024-01-01 10:00:00", "a"), ("2024-01-01 13:00:00", "a")],
        ["ts_s", "k"],
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "k")
    on_time.write.parquet(str(src_dir / "batch1"))

    stream = spark.readStream.schema(schema).option(
        "pathGlobFilter", "*.parquet"
    ).parquet(str(src_dir / "batch1"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "k", "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # watermark = 13:00 - 1h = 12:00 → the 10:00 window is final and
    # emitted; the 13:00 window is still open, so exactly one row.
    rows = spark.sql("SELECT * FROM wm_counts").collect()
    assert len(rows) == 1 and rows[0].n == 1
    assert rows[0].ws.hour == 10


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    """Hive-partitioned layout: a filter on the partition column must
    prune at plan time (PartitionFilters), and per-partition file
    count stays 1 (no small-file explosion)."""
    import os

    from flaco_spark.plans import formatted_plan
    from flaco_spark.sources.partitioned import read_partitioned, write_partitioned
    from flaco_spark.tables import table as _table

    events = _table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_by_day")
    write_partitioned(events, out, ["day"])

    part_dirs = [d for d in os.listdir(out) if d.startswith("day=")]
    assert len(part_dirs) > 1
    files_in_first = [
        f
        for f in os.listdir(os.path.join(out, part_dirs[0]))
        if f.endswith(".parquet")
    ]
    assert len(files_in_first) == 1, "one file per partition per write"

    some_day = sorted(part_dirs)[0].split("=", 1)[1]
    filtered = read_partitioned(spark, out).filter(F.col("day") == some_day)
    plan = formatted_plan(filtered)
    assert "PartitionFilters: [" in plan and "day#" in plan.split("PartitionFilters:")[1][:200]
    total = read_partitioned(spark, out).count()
    assert total == events.count()


def test_range_join_broadcasts_bucket_side(spark, sf_dir):
    """ts09's non-equi interval join must execute as a broadcast
    nested-loop over the 4-row bucket dim — never a cartesian shuffle
    of the fact table."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["ts09_value_range_join"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_edit_distance_join_is_blocked_equi(spark, sf_dir):
    """t08's candidate generation must be an equi-join on the
    (brand, size) blocking key — the plan may choose SMJ or broadcast
    by size, but never a cartesian/nested-loop all-pairs product."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["t08_edit_distance_pairs"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_deterministic_sample_filter_is_scan_side(spark, sf_dir):
    """q72's hash-sample predicate is a scan-side Filter before the
    aggregate's exchange: unsampled rows never shuffle."""
    from flaco_spark.plans import exchange_count

    df = REGISTRY["q72_deterministic_sample"].builder(spark, sf_dir)
    # one partial-agg exchange only (plus AQE result stage bookkeeping)
    assert exchange_count(df) <= 1


def test_running_distinct_reuses_user_sort(spark, sf_dir):
    """q73 needs at most two exchanges: (user, type) rank then
    user running-sum — never one per window function instance."""
    from flaco_spark.plans import exchange_count

    df = REGISTRY["q73_running_distinct"].builder(spark, sf_dir)
    assert exchange_count(df) <= 2


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream interval join (purchase attribution)
    drains to exactly the batch range-join result."""
    import shutil

    from flaco_spark.streaming import attribution_join
    from flaco_spark.tables import convert_event_ts, table as _table

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def split(df):
        return (
            df.filter(F.col("event_type") == "view"),
            df.filter(F.col("event_type") == "purchase"),
        )

    stream = convert_event_ts(spark.readStream.schema(raw_schema).parquet(str(src_dir)))
    sv, sp = split(stream)
    q = (
        attribution_join(sv, sp)
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.purchase_id, r.view_id)
        for r in spark.sql("SELECT purchase_id, view_id FROM attrib").collect()
    }

    bv, bp = split(_table(spark, sf_dir, "events"))
    want = {
        (r.purchase_id, r.view_id) for r in attribution_join(bv, bp).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_foreachbatch_upsert_converges(spark, sf_dir, tmp_path):
    """foreachBatch exactly-once MERGE sink, exercised through the
    PRODUCTION protocol (flaco_spark.streaming.ingest.foreachbatch_upsert
    + read_snapshot — the versioned CURRENT-pointer commit, not a
    test-local copy): after the stream drains, the committed snapshot
    equals the batch latest-record query (q69 semantics), and
    re-applying the committed batch_id (a crash-between-commit-and-
    checkpoint replay) short-circuits without touching the snapshot.
    Completes the CDC lane: q67 MERGE (batch) + q69 compaction + this
    streaming apply."""
    import os
    import shutil

    from flaco_spark.streaming.ingest import (
        apply_upsert_batch,
        foreachbatch_upsert,
        read_snapshot,
    )
    from flaco_spark.tables import convert_event_ts, table as _table

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    snap_dir = str(tmp_path / "snapshot")

    stream = convert_event_ts(
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
    ).select("user_id", "event_id", "ts", "value")
    q = foreachbatch_upsert(stream, snap_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    snapshot = read_snapshot(spark, snap_dir)
    got = {
        (r.user_id, r.event_id)
        for r in snapshot.select("user_id", "event_id").collect()
    }
    from pyspark.sql import Window as W

    e = _table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {
        (r.user_id, r.event_id)
        for r in e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
        .collect()
    }
    assert got == want and len(want) > 0

    # Checkpoint replay: crash AFTER the pointer commit but BEFORE the
    # checkpoint commit re-delivers the last batch_id — the idempotence
    # short-circuit must refuse it and leave the snapshot untouched.
    with open(os.path.join(snap_dir, "CURRENT"), encoding="utf-8") as f:
        committed = int(f.read().strip().lstrip("v"))
    vdir = os.path.join(snap_dir, f"v{committed}")
    mtime_before = os.path.getmtime(vdir)
    replayed = apply_upsert_batch(
        snapshot.limit(5), committed, snap_dir
    )  # any frame: a committed id must short-circuit before reading it
    assert replayed is False
    assert os.path.getmtime(vdir) == mtime_before
    with open(os.path.join(snap_dir, "CURRENT"), encoding="utf-8") as f:
        assert f.read().strip() == f"v{committed}"
    # ... while a NEW batch_id advances the pointer (normal progress).
    n_before = snapshot.count()  # materialize before v{committed} is GC'd
    assert apply_upsert_batch(snapshot.limit(0), committed + 1, snap_dir) is True
    assert (
        read_snapshot(spark, snap_dir).count() == n_before
    )  # empty increment: same relation, new committed version


def test_lateral_topn_decorrelates(spark, sf_dir):
    """q80's LATERAL LIMIT subquery must decorrelate to a ranked
    window (WindowGroupLimit pushes the limit map-side) — never a
    per-outer-row re-execution."""
    from flaco_spark.plans import formatted_plan

    plan = formatted_plan(REGISTRY["q80_lateral_topn"].builder(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_pivot_single_scan_q90(spark, sf_dir):
    """Pivot with a PINNED value list must not add a values-discovery
    pass: exactly one lineitem scan in the plan."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["q90_pivot_revenue"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("lineitem.parquet") == 1, "pivot added an extra fact scan"


def test_unpivot_is_expand_q91(spark, sf_dir):
    """unpivot compiles to a map-side Expand, not an N-way self-union
    (which would re-scan the input once per melted column)."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["q91_unpivot_revenue"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Expand" in plan, "unpivot should plan as Expand"
    assert plan.count("lineitem.parquet") == 1, "unpivot re-scanned the fact table"


def test_repetition_filter_is_shuffle_free_t14(spark, sf_dir):
    """t14 is pure map-side: no Exchange anywhere in the plan."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["t14_repetition_ratio"].builder(spark, sf_dir)
    assert "Exchange" not in formatted_plan(df), "t14 must not shuffle"


def test_vocab_growth_no_nested_loop_t17(spark, sf_dir):
    """t17 assigns checkpoints map-side (CASE ladder), so the plan must
    contain NO BroadcastNestedLoopJoin — the failure mode is a non-equi
    join that broadcasts the corpus-sized first-seen table."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["t17_vocab_growth"].builder(spark, sf_dir)
    assert "BroadcastNestedLoopJoin" not in formatted_plan(df), (
        "t17 must not plan a nested-loop join"
    )


def test_decontamination_broadcasts_bench_side_d16(spark, sf_dir):
    """The eval-set side of the contamination join is benchmark-sized;
    it must broadcast so the training scan stays map-side."""
    from flaco_spark.plans import broadcast_join_count

    df = REGISTRY["d16_decontamination"].builder(spark, sf_dir)
    assert broadcast_join_count(df) >= 1, "bench n-gram side must broadcast"


def test_streaming_watermark_drops_late_batch(spark, tmp_path):
    """REAL late-data semantics: batch 1 advances the watermark past a
    window; batch 2 delivers an event for that already-closed window;
    the event must be DROPPED (append-mode aggregation never revises
    an emitted window).  maxFilesPerTrigger=1 forces the two files
    into separate micro-batches in filename order."""
    import time as _time

    from pyspark.sql import functions as F

    src = tmp_path / "late_src"
    src.mkdir()
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    def _write(path, rows):
        # FLAT files: the streaming file source does not recurse into
        # Spark-written output directories
        ids, tss = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "ts": pa.array(
                        [_dt.datetime.fromisoformat(t) for t in tss],
                        pa.timestamp("us"),
                    ),
                }
            ),
            path,
        )

    _write(str(src / "a_batch1.parquet"),
           [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 13:30:00")])
    _time.sleep(1.1)  # distinct mtimes: the file source orders batches by timestamp
    # watermark COMMITS one batch behind its source data (batch N runs
    # under the watermark derived from batch N-1's commit), so an
    # intermediate batch lets 13:30 - 2h = 11:30 take effect before
    # the late row arrives
    _write(str(src / "b_batch2.parquet"), [(4, "2024-01-01 13:31:00")])
    _time.sleep(1.1)
    _write(str(src / "c_batch3.parquet"), [(3, "2024-01-01 10:30:00")])

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = {
        r["w"]["start"].hour: r["n"] for r in spark.table("late_test").collect()
    }
    # the 10:00 window emitted with ONLY event 1 — event 3 arrived after
    # the watermark passed 11:30 and was dropped, not merged
    assert emitted.get(10) == 1, emitted
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1, "the late row must be dropped by the watermark"


def test_blocklist_prefilter_broadcasts_d23(spark, sf_dir):
    """d23's bucket set and exact blocklist must both broadcast: the
    corpus side stays map-side (no shuffle of document rows), which is
    the whole point of the Bloom-shaped prefilter."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["d23_blocklist_filter"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, "prefilter + verify must broadcast"
    assert "SortMergeJoin" not in plan, "corpus must not shuffle for the blocklist"


def test_ivfpq_no_unbucketed_pairing_e15(spark, sf_dir):
    """e15 must pair candidates through cell-restricted joins: no
    CartesianProduct, and the only nested-loop joins are broadcast
    (1-row / k-row sides)."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["e15_ivfpq_search"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, "IVFPQ must never plan all-pairs"


def test_cumulative_unique_single_pass_q98(spark, sf_dir):
    """q98's first-seen decomposition is linear: no per-day rescan
    loop means at most two events scans in the plan (firsts + day
    dimension), not |days| of them."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["q98_cumulative_unique_users"].builder(spark, sf_dir)
    assert formatted_plan(df).count("events.parquet") <= 2


def test_d24_no_all_pairs(spark, sf_dir):
    """d24's substring profile must stay posting-shaped: hash-keyed
    shuffles only, never a cartesian/nested-loop pairing of documents."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["d24_exact_substring_dedup"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q102_partition_values_roundtrip(spark, sf_dir):
    """q102's read-back day partition column must come back typed (DATE)
    so pruning compares values, not strings."""
    out = REGISTRY["q102_partition_pruned_agg"].builder(spark, sf_dir)
    days = {r["day"] for r in out.select("day").distinct().collect()}
    assert days == {"2024-01-03", "2024-01-04", "2024-01-05"}


def test_transform_with_state_multibatch(spark, sf_dir, tmp_path):
    """state-v2 running totals are batch-boundary independent: split
    the events fixture into THREE source files drained one per
    micro-batch (maxFilesPerTrigger=1) — the argmax-by-n reduction of
    the cumulative emissions must equal the single-batch total, i.e.
    the batch GROUP BY."""
    from flaco_spark.streaming.ingest import running_totals_stream
    from flaco_spark.tables import table as _table

    events = _table(spark, sf_dir, "events")
    # three disjoint slices, written as one file each
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for i in range(3):
        events.filter(F.pmod("event_id", F.lit(3)) == i).coalesce(1).write.parquet(
            str(tmp_path / f"part{i}")
        )
        import glob
        import shutil as _sh

        [pf] = glob.glob(str(tmp_path / f"part{i}" / "*.parquet"))
        _sh.copy(pf, src_dir / f"slice{i}.parquet")

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        raw_schema = events.schema
        stream = (
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src_dir))
        )
        q = (
            running_totals_stream(stream)
            .writeStream.format("memory")
            .queryName("tws_mb")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    sink = spark.table("tws_mb")
    # with 3 micro-batches most users emit multiple cumulative rows
    assert sink.count() > sink.select("user_id").distinct().count()
    got = {
        (r.user_id): (r.n, r.sum_micros)
        for r in sink.groupBy("user_id")
        .agg(F.max("n").alias("n"), F.max_by("sum_micros", "n").alias("sum_micros"))
        .collect()
    }
    want = {
        r.user_id: (r.n, r.s)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value").cast("decimal(18,6)") * 1_000_000).cast("bigint"))
            .cast("bigint")
            .alias("s"),
        )
        .collect()
    }
    assert got == want


def test_m10_patch_grid_is_shuffle_free(spark, sf_dir):
    """Patch-grid planning is pure generation: scan -> filter ->
    project -> generate, no Exchange anywhere."""
    from flaco_spark.plans import formatted_plan

    plan = formatted_plan(REGISTRY["m10_patch_grid"].builder(spark, sf_dir))
    assert "Exchange" not in plan, "m10 must not shuffle"
    assert "Generate" in plan


def test_p02_index_build_is_map_side(spark, sf_dir):
    """The index build ships the coarse quantizer AND the PQ codebooks
    as literal constants (e15's map-side argmin — not a vecs×seeds
    crossJoin window), so the ONLY exchange is the per-list occupancy
    window's partitioning."""
    import re

    from flaco_spark.plans import formatted_plan

    plan = formatted_plan(REGISTRY["p02_index_build_pipeline"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    window_nodes = re.findall(r"^\(\d+\) Window\b", plan, re.M)
    assert len(window_nodes) == 1, f"expected only the list-size window, saw {len(window_nodes)}"
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 1, f"expected <=1 hash exchange, saw {n_shuffles}"


def test_ts27_interpolation_shares_one_sort(spark, sf_dir):
    """The carry-forward and carry-backward frames share one
    (user_id, slot) ordering, so Spark must fuse them into a SINGLE
    Window node over one sort (plus the hourly-dedup row_number
    window) — and never a per-row join."""
    import re

    from flaco_spark.plans import formatted_plan

    plan = formatted_plan(REGISTRY["ts27_resample_interpolate"].builder(spark, sf_dir))
    window_nodes = re.findall(r"^\(\d+\) Window\b", plan, re.M)
    assert len(window_nodes) <= 2, f"expected fused frames, saw {len(window_nodes)} Window nodes"
    assert "CartesianProduct" not in plan


def test_g04_no_cartesian(spark, sf_dir):
    """Probe-anchored link prediction joins postings by supplier key —
    never an all-pairs product."""
    from flaco_spark.plans import formatted_plan

    plan = formatted_plan(REGISTRY["g04_link_prediction"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_t19_single_corpus_shuffle(spark, sf_dir):
    """t19's rewrite removed the shingle-keyed re-join: the only join
    left is doc-count-sized (broadcast), never a corpus-sized
    SortMergeJoin over shingles."""
    from flaco_spark.plans import formatted_plan

    plan = formatted_plan(REGISTRY["t19_novelty_curve"].builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_stream_checkpoint_resume_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once RESUME across separate streaming runs: drain run 1
    with only slice 0 in the source dir, then add slices 1+2 and start
    a SECOND query on the SAME checkpoint — it must process only the
    new files, and the parquet sink must hold every event exactly
    once.  This is the backfill-resume contract the st06 topology
    relies on (checkpointed file-source offsets + idempotent sink)."""
    import glob
    import shutil as _sh

    from flaco_spark.streaming.ingest import stream_parquet_sink
    from flaco_spark.tables import convert_event_ts, table as _table

    events = _table(spark, sf_dir, "events")
    slices = []
    for i in range(3):
        events.filter(F.pmod("event_id", F.lit(3)) == i).coalesce(1).write.parquet(
            str(tmp_path / f"part{i}")
        )
        [pf] = glob.glob(str(tmp_path / f"part{i}" / "*.parquet"))
        slices.append(pf)
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _sh.copy(slices[0], src_dir / "slice0.parquet")

    raw_schema = events.schema
    out_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = stream_parquet_sink(
            spark,
            str(src_dir),
            raw_schema,
            out_dir,
            ckpt,
            transform=lambda s: convert_event_ts(s).select("event_id", "user_id"),
        )
        q.awaitTermination(120)

    run()  # run 1: slice 0 only
    n1 = spark.read.parquet(out_dir).count()
    _sh.copy(slices[1], src_dir / "slice1.parquet")
    _sh.copy(slices[2], src_dir / "slice2.parquet")
    run()  # run 2: same checkpoint, must pick up ONLY the new files
    sunk = spark.read.parquet(out_dir)
    total = events.count()
    assert 0 < n1 < total
    assert sunk.count() == total, "resume must not duplicate or drop rows"
    assert sunk.select("event_id").distinct().count() == total


def test_d30_bloom_bits_broadcast(spark, sf_dir):
    """The Bloom bit set and the exact-confirm bench keys are all
    broadcast: the corpus scan must never shuffle."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["d30_bloom_decontamination"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 4, "3 bit probes + confirm must broadcast"
    assert "CartesianProduct" not in plan


def test_s03_hot_path_stays_broadcast_when_smj_forced(spark, sf_dir):
    """With auto-broadcast disabled the COLD path degrades to SMJ (the
    100 TB shape) while the hot-key path keeps its explicit broadcast
    hints — the whole point of the split."""
    from flaco_spark.plans import sort_merge_join_count

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = REGISTRY["s03_hot_cold_split_join"].builder(spark, sf_dir)
        assert broadcast_join_count(df) >= 3, "hot join + both key probes"
        assert sort_merge_join_count(df) >= 1, "cold tail must shuffle-join"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_p03_prefix_sum_is_bucket_partitioned(spark, sf_dir):
    """The corpus-sized window runs partitioned by hex bucket; only
    the 16-row offset table may pass through a single partition."""
    from flaco_spark.plans import formatted_plan

    plan = formatted_plan(REGISTRY["p03_shard_export_pipeline"].builder(spark, sf_dir))
    assert "hashpartitioning(bucket" in plan, "big window must partition by bucket"


def test_e24_projection_is_map_side(spark, sf_dir):
    """JL projection adds no shuffle of its own; the recall stage's
    all-pairs join builds on the broadcast 5-row query side."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["e24_random_projection"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_m12_downmix_single_repartition(spark, sf_dir):
    """The DSP chain is mapInPandas after ONE explicit payload
    repartition — no other exchange."""
    from flaco_spark.plans import exchange_count, formatted_plan

    df = REGISTRY["m12_stereo_downmix"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "MapInPandas" in plan
    assert exchange_count(df) == 1, "only the explicit repartition may shuffle"


def test_ts34_moments_are_broadcast(spark, sf_dir):
    """ACF: the lag dimension and global moments are broadcast; the
    only shuffles key on day grain (metadata-sized)."""
    from flaco_spark.plans import broadcast_join_count, formatted_plan

    df = REGISTRY["ts34_autocorrelation"].builder(spark, sf_dir)
    assert broadcast_join_count(df) >= 2, "lags and gmom must broadcast"
    assert "CartesianProduct" not in formatted_plan(df)


def test_e26_discount_table_broadcast(spark, sf_dir):
    """nDCG discount table and the 1-row IDCG aggregate join broadcast;
    ground truth and candidate rankings meet in a k-sized join."""
    from flaco_spark.plans import broadcast_join_count

    df = REGISTRY["e26_ranking_metrics"].builder(spark, sf_dir)
    assert broadcast_join_count(df) >= 3


def test_q120_single_aggregation_shuffle(spark, sf_dir):
    """URL parsing is pure map-side column work: exactly the one
    partial-agg exchange, no join."""
    from flaco_spark.plans import exchange_count, formatted_plan

    df = REGISTRY["q120_url_functions"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert exchange_count(df) == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan, "URL family must stay JVM-side"


def test_t31_single_scan_two_aggs(spark, sf_dir):
    """Confusion audit: prediction is map-side; gold and hyp are
    |languages|-row aggregates joined without a corpus-sized shuffle."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["t31_langid_confusion"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan, "lang-ID must stay JVM-side"


def test_q130_shuffle_hash_hint_honored(spark, sf_dir):
    """The SHUFFLE_HASH hint must materialize as a ShuffledHashJoin —
    a hint changes the plan, never the relation (the gate checks the
    relation; this checks the plan)."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["q130_join_hints"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q134_existence_join_shape(spark, sf_dir):
    """EXISTS/IN in the SELECT list must plan as ExistenceJoin (no row
    may drop) — the third subquery join flavor next to semi/anti."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["q134_exists_projection"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ExistenceJoin" in plan
    assert "CartesianProduct" not in plan


def test_e28_broadcast_centroids_no_python(spark, sf_dir):
    """Outlier screen: the |labels|x8 centroid table joins broadcast;
    all vector math stays JVM-side."""
    from flaco_spark.plans import broadcast_join_count, formatted_plan

    df = REGISTRY["e28_embedding_outlier_screen"].builder(spark, sf_dir)
    assert broadcast_join_count(df) >= 1
    assert "BatchEvalPython" not in formatted_plan(df)


def test_t34_map_side_only(spark, sf_dir):
    """Code screen is scan → project: zero exchanges, zero joins."""
    from flaco_spark.plans import exchange_count, formatted_plan

    df = REGISTRY["t34_code_detection"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert exchange_count(df) == 0
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_t33_single_source_shuffle(spark, sf_dir):
    """Gini: the rank window and the per-source reduce share the one
    source-keyed exchange (partial aggregation handles the rest)."""
    from flaco_spark.plans import exchange_count, formatted_plan

    df = REGISTRY["t33_length_gini"].builder(spark, sf_dir)
    assert exchange_count(df) <= 2
    assert "BatchEvalPython" not in formatted_plan(df)


def test_u15_arrow_lane(spark, sf_dir):
    """The array-returning UDF must take the Arrow (pandas) lane, not
    row-at-a-time pickling."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["u15_array_return_pandas_udf"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_d32_single_key_pipeline(spark, sf_dir):
    """Soft-dedup: cluster count and join-back share the md5 key; no
    python, no cartesian."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["d32_soft_dedup_weights"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q139_broadcast_grid_probe(spark, sf_dir):
    """Radius join: the 9x-exploded probe side broadcasts; the point
    side joins without a join-side shuffle (its only exchange is the
    distinct), and no cartesian product appears."""
    from flaco_spark.plans import broadcast_join_count, formatted_plan

    df = REGISTRY["q139_grid_radius_join"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q136_bitmap_partial_agg(spark, sf_dir):
    """Bitmap distinct: no Expand/distinct-expand shuffle — the plan
    is plain two-level hash aggregation over (group, bucket)."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["q136_bitmap_distinct"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "bitmap_construct_agg" in plan or "bitmap_count" in plan
    assert "BatchEvalPython" not in plan


def test_q138_map_side_luhn(spark, sf_dir):
    """Luhn validation is a scan -> project -> single partial agg:
    exactly one exchange, no Python."""
    from flaco_spark.plans import exchange_count, formatted_plan

    df = REGISTRY["q138_luhn_validation"].builder(spark, sf_dir)
    assert exchange_count(df) <= 1
    assert "BatchEvalPython" not in formatted_plan(df)


def test_m14_arrow_batch_lane(spark, sf_dir):
    """Resampler runs in the Arrow mapInPandas lane with the bounded
    repartition, never row-at-a-time Python."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["m14_audio_resample"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()
    assert "BatchEvalPython" not in plan


def test_m17_resize_single_map_stage(spark, sf_dir):
    """m17 (decode + box downscale) is ONE Arrow mapInPandas stage
    over the bounded repartition — exactly one Exchange, no shuffle
    after the Python stage, never row-at-a-time Python."""
    from flaco_spark.plans import formatted_plan

    import re

    df = REGISTRY["m17_image_resize"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()
    assert "BatchEvalPython" not in plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, "only the bounded repartition"


def test_m18_m19_jpeg_single_map_stage(spark, sf_dir):
    """m18 (baseline JPEG) and m19 (progressive JPEG) ride the same
    lane as m17 (VERDICT r9 task 6 — m18 was the one codec row without
    a plan pin): ONE Arrow mapInPandas stage over the bounded
    repartition — exactly one Exchange, no shuffle after the Python
    stage, never row-at-a-time Python.  A refactor that silently adds
    an exchange to the codec lane fails here, not at 100 TB."""
    import re

    from flaco_spark.plans import formatted_plan

    for name in ("m18_jpeg_decode", "m19_jpeg_progressive_decode",
                 "m20_jpeg_cmyk_decode", "m21_webp_lossless_decode",
                 "m22_webp_lossy_decode", "m23_exif_metadata"):
        df = REGISTRY[name].builder(spark, sf_dir)
        plan = formatted_plan(df)
        assert "MapInPandas" in plan or "mapInPandas" in plan.lower(), name
        assert "BatchEvalPython" not in plan, name
        n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchanges == 1, f"{name}: only the bounded repartition"


def test_t35_shared_set_antijoin(spark, sf_dir):
    """Boilerplate removal: the shared-fingerprint screen is a
    LeftAnti join (broadcast or shuffled — AQE's call by size), and
    reassembly never windows corpus-wide."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["t35_boilerplate_removal"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan


def test_e29_label_bounded_pairwise(spark, sf_dir):
    """Cluster separation: the pairwise stage joins |labels|x64-row
    partials (broadcast), never vector rows against vector rows."""
    from flaco_spark.plans import broadcast_join_count, formatted_plan

    df = REGISTRY["e29_cluster_separation"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 2
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_u16_arrow_struct_return(spark, sf_dir):
    """Struct-returning pandas UDF rides the Arrow lane."""
    from flaco_spark.plans import formatted_plan

    df = REGISTRY["u16_struct_return_pandas_udf"].builder(spark, sf_dir)
    assert "ArrowEvalPython" in formatted_plan(df)


def test_global_rank_offsets_broadcast_not_case_chain(spark, sf_dir):
    """global_rank attaches per-partition offsets via a BROADCAST join
    on _pid (one plan node at any partition count), never the old
    O(#partitions)-deep chained CASE WHEN — at thousands of partitions
    the when-chain bloats the expression tree and codegen linearly."""
    from flaco_spark.operators.relational_ext import global_rank
    from flaco_spark.tables import table

    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    ranked, n = global_rank(s, ["s_acctbal", "s_suppkey"])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert n == s.count()
    # the rank itself must still be the dense global row order
    rows = ranked.orderBy("_rank").collect()
    assert [r["_rank"] for r in rows] == list(range(1, n + 1))
    keys = [(r["s_acctbal"], r["s_suppkey"]) for r in rows]
    assert keys == sorted(keys)


def test_g01_quantized_sum_plan(spark, sf_dir):
    """g01's inflow aggregation must stay the scale-safe shape: a
    map-side-combining partial_sum over quantized integers (r6,
    SCALING.md) — NO collect_list anywhere in the physical plan (a
    collect_list fold materializes a celebrity node's whole
    in-neighborhood in one grouped row: the 100 TB OOM this design
    dissolved) — and the unrolled 3-round optimized plan must stay
    bounded (the r5 multi-reference chain measured a 2 GiB plan
    string before its lineage cut)."""
    df = REGISTRY["g01_pagerank"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 150_000, f"g01 plan string is {len(plan)} chars"
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in phys
    assert "partial_sum(FLOOR(" in phys, "map-side combine missing"


def test_iterative_oracles_keep_materialized_ctes():
    """The unrolled graph oracles must keep their MATERIALIZED CTE
    hints: DuckDB's default inlining re-evaluates a CTE per reference,
    which compounds exponentially across unrolled rounds — g07's
    un-hinted oracle exhausted a 100 GiB DuckDB budget at sf0.1 and
    the failure cascaded (leaked buffer reservation) over 130 later
    queries.  A future oracle edit that drops the hints would pass
    every small-SF gate and only detonate at scale, so pin them here."""
    for name in (
        "g01_pagerank",
        "g02_triangle_count",
        "g03_label_propagation",
        "g05_personalized_pagerank",
        "g06_kcore_peel",
        "g07_hits",
        "g08_clustering_coefficient",
    ):
        oracle = REGISTRY[name].oracle
        assert oracle and "MATERIALIZED" in oracle, name


def test_t27_shared_corpus_subtree(spark, sf_dir):
    """t27's two retrieval rounds must share ONE tokenize+aggregate
    subtree (r12: round-1 scores via a single stack() pass, feedback
    sums pivoted to one broadcast row).  The per-query-leg unionAll
    shape re-planned the corpus aggregate per leg — 27 parquet scans
    and 47 exchanges in the physical plan, with round 2 re-executing
    the whole round-1 subtree once per query broadcast."""
    from flaco_spark.plans import exchange_count, formatted_plan

    df = REGISTRY["t27_rocchio_prf"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Scan parquet") <= 12, "corpus subtree re-planned per query leg"
    assert exchange_count(df) <= 16
