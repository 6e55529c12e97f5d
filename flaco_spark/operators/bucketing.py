"""Bucketed (co-located) joins: pre-shuffle once, join shuffle-free
forever.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders)
is the shuffle of both sides on the join key — every query pays it
again.  Bucketing amortizes it: write each table hash-partitioned
into N buckets on the join key (one shuffle, at write time); any
number of subsequent joins on that key read bucket-aligned files and
plan with ZERO exchanges (SortMergeJoin over pre-bucketed scans).

This is the Spark-native analogue of the co-located table placement a
distributed warehouse would use, and the right physical design for
the engine's "extract once, query many times" contract (the reference
re-extracts from Postgres per query — ``/root/reference/src/lib.rs:188``
— precisely because it has no such storage layer).

Usage contract:

- ``write_bucketed(df, name, key)`` — one-time, one-shuffle write.
- ``read_bucketed(spark, name)`` — metastore-backed scan that carries
  the bucketing property into planning.
- Joins between two tables bucketed on the same key with the same
  bucket count produce no Exchange (asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    num_buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) on ``key``.

    Sorting within buckets lets the subsequent SortMergeJoin skip its
    sort stage entirely — the join becomes a streaming merge of
    pre-sorted, pre-partitioned files.
    """
    # Pre-partition by the bucket key: without it every write TASK
    # emits one file per bucket it sees (tasks × buckets files — 256
    # at local[32]; the guide §6 small-files failure mode, and at
    # scale a metadata explosion).  Spark's bucket id and
    # repartition's HashPartitioning both murmur3 the key, so each
    # task lands whole buckets and the output is ~num_buckets files
    # per table.
    from pyspark.sql import functions as F

    writer = (
        df.repartition(num_buckets, F.col(key))
        .write.format("parquet")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .mode(mode)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def drop_bucketed(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
