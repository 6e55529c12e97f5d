"""Hive-partitioned parquet layout: write by partition column(s), read
with partition pruning.

The reference writes one flat file per extraction
(``/root/reference/src/lib.rs:116-148``).  At 100 TB the storage
layout IS the index: laying data out as ``path/day=YYYY-MM-DD/…``
means a date-filtered query never opens irrelevant files — the filter
is resolved against directory names at plan time (``PartitionFilters``
in the scan, asserted in tests/test_plans.py), reading 1/N of the
data for 1/N of the days.

Partition-count discipline: choose columns with bounded cardinality
(day, not timestamp; source, not doc_id).  Each partition directory
should hold ≥ one full parquet row group (~128 MB) at the target
scale — thousands of tiny files per partition is the classic failure
mode, so the writer repartitions by the partition columns first
(one shuffle) to get one file per partition per write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flaco_spark.errors import EngineError


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    coalesce_per_partition: bool = True,
) -> None:
    """Write ``df`` hive-partitioned by ``partition_cols``.

    ``coalesce_per_partition=True`` shuffles rows to their partition
    before writing so each partition directory gets one file per
    write (instead of one file per upstream task per partition —
    task_count × partition_count small files).
    """
    if not partition_cols:
        raise EngineError("write_partitioned needs at least one partition column")
    out = df.repartition(*partition_cols) if coalesce_per_partition else df
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a hive-partitioned dataset; partition columns come back as
    ordinary columns and filters on them prune directories at plan
    time."""
    return spark.read.parquet(path)
