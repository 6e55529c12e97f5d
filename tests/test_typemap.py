"""Golden tests for the Postgres→Spark type mapping (SURVEY.md §1.3)
and the F4-style edge-case fixture."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flaco_spark.typemap import (
    custom_schema,
    flaco_compat_nulls_to_nan,
    spark_type_for,
)


def test_golden_mapping():
    golden = {
        "bytea": T.BinaryType(),
        "bool": T.BooleanType(),
        '"char"': T.ByteType(),
        "text": T.StringType(),
        "jsonb": T.StringType(),
        "oid": T.LongType(),
        "uuid": T.StringType(),
        "int2": T.ShortType(),
        "int4": T.IntegerType(),
        "int8": T.LongType(),
        "float4": T.FloatType(),
        "float8": T.DoubleType(),
        "timestamp": T.TimestampNTZType(),
        "timestamptz": T.TimestampType(),
        "date": T.DateType(),
        "interval": T.DayTimeIntervalType(),
        "numeric": T.DecimalType(38, 18),
    }
    for pg, expected in golden.items():
        assert spark_type_for(pg) == expected, pg


def test_time_maps_to_native_timetype_on_spark_41():
    """Spark ≥4.1 has a native TIME type; PG TIME/TIMETZ map to it at
    µs precision (PG's own).  On older runtimes the documented
    fallback is µs-since-midnight as LongType."""
    if hasattr(T, "TimeType"):
        assert spark_type_for("time") == T.TimeType(6)
        assert spark_type_for("timetz") == T.TimeType(6)
    else:
        assert spark_type_for("time") == T.LongType()
        assert spark_type_for("timetz") == T.LongType()


def test_fallbacks_and_arrays():
    # enum / unknown types → string, not a panic (ref src/lib.rs:382-385)
    assert spark_type_for("mpaa_rating") == T.StringType()
    assert spark_type_for("tsvector") == T.StringType()
    # PG arrays → ArrayType (reference panics)
    assert spark_type_for("int4[]") == T.ArrayType(T.IntegerType())
    assert spark_type_for("text[]") == T.ArrayType(T.StringType())


def test_numeric_modes():
    assert spark_type_for("numeric") == T.DecimalType(38, 18)
    assert spark_type_for("numeric", numeric_mode="flaco") == T.DoubleType()


def test_custom_schema_string():
    s = custom_schema({"id": "int8", "price": "numeric", "tag": "text"})
    assert s == "id bigint, price decimal(38,18), tag string"


def test_nan_compat_mode(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (None, None)], "a double, b float"
    )
    out = flaco_compat_nulls_to_nan(df).collect()
    nulls = [r for r in out if r.a is None or (isinstance(r.a, float) and not math.isnan(r.a) and r.a != 1.0)]
    assert not nulls
    nan_row = [r for r in out if isinstance(r.a, float) and math.isnan(r.a)]
    assert len(nan_row) == 1 and math.isnan(nan_row[0].b)


def test_f4_edge_fixture_roundtrip(spark, tmp_path):
    """FIXTURES.md F4: one column per reference edge case, including a
    leading-NULL timestamp column (reference panics, src/lib.rs:312-316)."""
    rows = []
    for i in range(100):
        rows.append(
            (
                i % 2 == 0,
                f'{{"k": {i}, "arr": [{i}, {i + 1}]}}',
                f"00000000-0000-4000-8000-{i:012d}",
                None if i == 0 else f"2024-01-01 {i % 24:02d}:00:00",  # leading NULL ts
                ["G", "PG", "PG-13", "R", "NC-17"][i % 5],
                list(range(i % 3 + 1)),
            )
        )
    schema = (
        "c_bool boolean, c_json string, c_uuid string, "
        "c_ts string, c_enum string, c_arr array<int>"
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "c_ts", F.col("c_ts").cast("timestamp_ntz")
    )
    path = str(tmp_path / "f4.parquet")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert back.filter("c_ts IS NULL").count() == 1  # survives, no panic
    # JSON path extraction works on the stored strings
    k = back.select(F.get_json_object("c_json", "$.k").cast("int").alias("k")).agg(
        F.sum("k")
    ).first()[0]
    assert k == sum(range(100))
    assert back.schema["c_arr"].dataType == T.ArrayType(T.IntegerType())
