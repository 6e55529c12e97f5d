"""local_relation / literal fast paths: values must be bit-identical
to the stock createDataFrame / F.lit routes (r12 optimization)."""

from __future__ import annotations

import datetime
import decimal
import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flaco_spark.localrel import local_relation


@pytest.fixture(scope="module")
def spark():
    from flaco_spark.session import get_session

    return get_session(app_name="test_localrel")


MIXED_SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.DoubleType()),
        T.StructField("d", T.DecimalType(18, 2)),
        T.StructField("e", T.TimestampNTZType()),
        T.StructField("f", T.DateType()),
        T.StructField("g", T.BooleanType()),
        T.StructField("h", T.BinaryType()),
    ]
)

MIXED_ROWS = [
    (
        1,
        "x",
        1.5,
        decimal.Decimal("12.34"),
        datetime.datetime(2024, 1, 1, 3, 4, 5, 123456),
        datetime.date(2024, 1, 2),
        True,
        b"\x00\xff",
    ),
    (None, None, None, None, None, None, None, None),
    (
        2**62,
        "unicode ✓",
        -0.0,
        decimal.Decimal("-1.00"),
        datetime.datetime(1999, 12, 31, 23, 59, 59),
        datetime.date(1970, 1, 1),
        False,
        b"",
    ),
]


def test_values_match_stock_path(spark):
    fast = local_relation(spark, MIXED_ROWS, MIXED_SCHEMA)
    slow = spark.createDataFrame(MIXED_ROWS, MIXED_SCHEMA)
    assert fast.collect() == slow.collect()
    assert fast.schema == slow.schema


def test_fast_path_is_jvm_local(spark):
    fast = local_relation(spark, MIXED_ROWS, MIXED_SCHEMA)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    # the whole point: no pickled-RDD scan, no Python worker at action
    assert "LocalTableScan" in plan


def test_nan_column_falls_back_and_preserves_nan(spark):
    rows = [(1.0,), (float("nan"),), (None,)]
    df = local_relation(spark, rows, "x double")
    vals = [r.x for r in df.collect()]
    assert vals[0] == 1.0
    assert math.isnan(vals[1])
    assert vals[2] is None


def test_array_column_fast_path(spark):
    rows = [([1.5, 2.5], 1), (None, 2), ([], 3)]
    schema = "arr array<double>, k int"
    fast = local_relation(spark, rows, schema)
    slow = spark.createDataFrame(rows, schema)
    assert fast.collect() == slow.collect()


def test_nan_inside_array_falls_back(spark):
    rows = [([1.0, float("nan")],)]
    df = local_relation(spark, rows, "arr array<double>")
    got = df.collect()[0].arr
    assert got[0] == 1.0 and math.isnan(got[1])


def test_nested_struct_falls_back(spark):
    schema = T.StructType(
        [T.StructField("s", T.StructType([T.StructField("i", T.LongType())]))]
    )
    df = local_relation(spark, [((7,),)], schema)
    assert df.collect()[0].s.i == 7


def test_pq_literal_sql_equals_f_lit(spark):
    from flaco_spark.operators.similarity import (
        _lit_bigints,
        _lit_doubles,
        _lit_vecs,
    )

    ids = [3, 10, 17]
    # awkward doubles: shortest-repr round-trip must hold exactly
    doubles = [0.1, -0.0, 1e-17, 123456.789012345, 2.0 / 3.0]
    vecs = [doubles, [x + 1e-9 for x in doubles]]
    row = spark.range(1).select(
        _lit_bigints(ids).alias("i"),
        _lit_doubles(doubles).alias("d"),
        _lit_vecs(vecs).alias("v"),
        F.lit(ids).cast("array<bigint>").alias("i0"),
        F.lit(doubles).cast("array<double>").alias("d0"),
        F.lit(vecs).cast("array<array<double>>").alias("v0"),
    ).collect()[0]
    assert row.i == row.i0
    assert row.d == row.d0  # bitwise: -0.0 == 0.0 is True, check reprs
    assert [repr(x) for x in row.d] == [repr(x) for x in row.d0]
    assert row.v == row.v0
