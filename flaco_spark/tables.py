"""Test-data table catalog.

The driver materializes a deterministic TPC-H-ish star schema plus
``events`` / ``documents`` / ``embeddings`` at
``/root/testdata/sf{0.001,0.01,0.1}`` (TESTDATA.md).  Every inventory
query loads through here so scans share one code path (and one place
to attach bucketing / caching decisions later).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Fixed-cardinality dimensions (5 and 25 rows at EVERY scale factor)
# that are always safe to force-broadcast.  customer/supplier/part are
# deliberately NOT here: they scale linearly with SF (at 100 TB
# customer is billions of rows), so their join strategy is left to
# spark.sql.autoBroadcastJoinThreshold + AQE, which pick broadcast
# when the (possibly filtered) side is actually small and fall back
# to sort-merge/shuffled-hash when it is not.
BROADCAST_TABLES = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = convert_event_ts(df)
    return df


def convert_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) in the parquet file, read as long
    nanos (spark.sql.legacy.parquet.nanosAsLong); convert to
    µs-precision NTZ, matching DuckDB's truncate-to-micros read."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(df.schema[ts_col].dataType, T.LongType):
        df = df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")).cast("timestamp_ntz")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for spark.sql paths)."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
