"""Storage-layout queries: the physical designs that ARE the index at
100 TB, each behind the driver's DuckDB correctness gate.

The reference extracts to one flat file per query
(``/root/reference/src/lib.rs:116-148``) and re-reads it whole; at
100 TB the layout of the extracted data decides every later query's
cost.  Two layouts matter most and each gets an oracle-checked entry:

- **Bucketed tables** (q101): hash-partition both fact tables on the
  join key at WRITE time; every later join on that key plans with
  zero Exchange operators (the shuffle was paid once, not per query).
  The shuffle-free plan property itself is asserted in
  ``tests/test_plans.py::test_bucketed_join_no_shuffle``; this entry
  proves the layout also preserves SEMANTICS (the bucketed join's
  result hash-matches the plain join's oracle).
- **Hive partitioning** (q102): lay event data out as
  ``day=YYYY-MM-DD/`` directories; a date-filtered query resolves the
  filter against directory NAMES at plan time (PartitionFilters) and
  never opens irrelevant files — 1/N of the days reads 1/N of the
  data.  Pruning is plan-asserted in
  ``tests/test_plans.py::test_partitioned_write_prunes_on_read``;
  this entry proves the partition-column round-trip (value → path
  string → value) is lossless under the correctness gate.

Both builders stage their layout in a private scratch dir, EAGERLY
materialize the small aggregate result, and delete the scratch before
returning (the scratch-leak discipline q92/q93 established).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flaco_spark.inventory import register
from flaco_spark.operators.bucketing import (
    drop_bucketed,
    read_bucketed,
    write_bucketed,
)
from flaco_spark.sources.partitioned import read_partitioned, write_partitioned
from flaco_spark.tables import convert_event_ts, table


def _eager(df: DataFrame) -> DataFrame:
    """Materialize a small result so scratch files can be deleted
    before returning (see q92's rationale in relational_ext.py)."""
    from flaco_spark.localrel import eager_local

    return eager_local(df)


@register(
    "q101_bucketed_join",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS price_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    tags=("layout", "bucketing", "join", "lineitem", "orders"),
    doc="Bucketed (co-located) fact-fact join: lineitem and orders are "
    "written hash-bucketed AND per-bucket sorted on the join key, then "
    "joined — Catalyst plans a SortMergeJoin over the pre-bucketed "
    "scans with ZERO Exchange operators and no sort stage (plan "
    "asserted in tests/test_plans.py::test_bucketed_join_no_shuffle).  "
    "This is the 'pay the shuffle once, at write time' physical design "
    "that makes repeated fact-fact joins affordable at 100 TB: the "
    "per-query cost drops from shuffle(6 TB)+shuffle(1.5 TB) to a "
    "streaming merge of co-located sorted files.  The oracle is the "
    "PLAIN join over the original tables — the layout must change the "
    "plan, not the relation.",
)
def q101_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    run = uuid.uuid4().hex[:8]
    lt, ot = f"bkt_l_{run}", f"bkt_o_{run}"
    scratch = tempfile.mkdtemp(prefix="flaco_bucketed_")
    try:
        l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
        o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
        write_bucketed(l, lt, "l_orderkey", path=f"{scratch}/l")
        write_bucketed(o, ot, "o_orderkey", path=f"{scratch}/o")
        bl, bo = read_bucketed(spark, lt), read_bucketed(spark, ot)
        agg = (
            bl.join(bo, bl.l_orderkey == bo.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * 100)
                .cast("bigint")
                .alias("price_cents"),
            )
        )
        return _eager(agg)
    finally:
        drop_bucketed(spark, lt)
        drop_bucketed(spark, ot)
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "q102_partition_pruned_agg",
    oracle="""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000) AS BIGINT) AS value_micros
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-03' AND DATE '2024-01-05'
GROUP BY 1, 2
""",
    tags=("layout", "partitioning", "pruning", "events"),
    doc="Hive-partitioned layout under the correctness gate: events "
    "are written as day=YYYY-MM-DD/ directories (repartitioned by day "
    "first so each partition gets one file per write, not one per "
    "task — the small-files failure mode), then a 3-day date filter "
    "reads back ONLY those directories (PartitionFilters resolve "
    "against path names at plan time; asserted in tests/test_plans.py"
    "::test_partitioned_write_prunes_on_read).  The gate proves the "
    "partition-column round-trip value→path→value is lossless and the "
    "pruned aggregate hash-matches the plain filtered aggregate over "
    "the unpartitioned fixture.  At 100 TB this layout makes date "
    "filters O(days touched), independent of corpus size.",
)
def q102_partition_pruned_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    scratch = tempfile.mkdtemp(prefix="flaco_partitioned_")
    try:
        ev = convert_event_ts(table(spark, sf_dir, "events")).withColumn(
            "day", F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd")
        )
        write_partitioned(ev, f"{scratch}/events_by_day", ["day"])
        back = read_partitioned(spark, f"{scratch}/events_by_day")
        # partition-column type inference reads day= back as DATE —
        # exactly what pruning wants; re-format for the string contract
        agg = (
            back.filter(F.col("day").between("2024-01-03", "2024-01-05"))
            .groupBy(
                F.date_format(F.col("day").cast("date"), "yyyy-MM-dd").alias("day"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("value").cast("decimal(18,6)") * 1_000_000))
                .cast("bigint")
                .alias("value_micros"),
            )
        )
        return _eager(agg)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
