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
    writer = df.write.format("parquet").bucketBy(num_buckets, key).sortBy(key).mode(mode)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def drop_bucketed(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
