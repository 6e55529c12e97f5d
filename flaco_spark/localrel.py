"""Fast driver-local relations.

``spark.createDataFrame(rows)`` over plain Python rows plans a scan
of a *pickled* RDD: every later action on the frame round-trips the
rows through a Python worker (measured ~0.5 s per job even for a
40-row broadcast build side at sf0.1).  For the eager-materialize
pattern this engine uses everywhere (collect a small result, return
it as a fresh DataFrame so scratch dirs / caches can be torn down),
that tax is paid once per consumer action.

:func:`local_relation` builds the same relation through the Arrow
path (pandas → Arrow batches → JVM rows, guide §4.1/§6: Arrow for
driver transfers): the data crosses the boundary once at build time
and later actions scan JVM-resident batches with no Python worker —
measured 0.23 s vs 0.70 s for the identical broadcast join.

Scope guards (values must be BIT-IDENTICAL to the stock path):

- only schemas of ATOMIC fields (numeric, string, boolean, binary,
  date, timestamp, decimal) or one-level arrays of them — deeper
  nesting keeps the row path;
- a float/double column (or float-array element) containing a real
  NaN falls back (pandas' NaN-vs-null conflation would silently turn
  it into SQL NULL);
- ANY conversion failure falls back.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_ATOMIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.StringType,
    T.BooleanType,
    T.BinaryType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DecimalType,
)


def _fast_type(dt: T.DataType) -> bool:
    """Atomic, or a one-level array of atomics."""
    if isinstance(dt, _ATOMIC):
        return True
    return isinstance(dt, T.ArrayType) and isinstance(dt.elementType, _ATOMIC)


def _has_nan(rows, schema: T.StructType) -> bool:
    flat_idx, arr_idx = [], []
    for i, f in enumerate(schema.fields):
        if isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            flat_idx.append(i)
        elif isinstance(f.dataType, T.ArrayType) and isinstance(
            f.dataType.elementType, (T.FloatType, T.DoubleType)
        ):
            arr_idx.append(i)
    if not flat_idx and not arr_idx:
        return False
    for r in rows:
        for i in flat_idx:
            v = r[i]
            if v is not None and math.isnan(v):
                return True
        for i in arr_idx:
            a = r[i]
            if a is not None and any(
                x is not None and math.isnan(x) for x in a
            ):
                return True
    return False


def local_relation(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with the Arrow fast
    path for flat atomic schemas; bit-identical values either way."""
    if isinstance(schema, str):
        try:
            schema = T._parse_datatype_string(schema)
        except Exception:  # noqa: BLE001 — let createDataFrame report it
            pass
    if (
        isinstance(schema, T.StructType)
        and rows
        and all(_fast_type(f.dataType) for f in schema.fields)
        and not _has_nan(rows, schema)
    ):
        try:
            import pandas as pd

            # dtype=object per column keeps every value as the exact
            # Python object (None stays None — from_records would
            # coerce numeric Nones to NaN floats).
            data = {
                name: pd.Series([r[i] for r in rows], dtype=object)
                for i, name in enumerate(schema.names)
            }
            pdf = pd.DataFrame(data, columns=schema.names)
            return spark.createDataFrame(pdf, schema)
        except Exception:  # noqa: BLE001 — correctness over speed
            pass
    return spark.createDataFrame(rows, schema)


def eager_local(df: DataFrame) -> DataFrame:
    """Collect ``df`` and rebuild it as a driver-local relation (the
    scratch-teardown eager-materialize pattern, fast-path edition)."""
    return local_relation(df.sparkSession, df.collect(), df.schema)
