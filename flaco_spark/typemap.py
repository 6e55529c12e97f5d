"""PostgreSQL → Spark type mapping (SURVEY.md §1.3).

The reference decodes 19 Postgres OID families into arrow2 arrays
(``/root/reference/src/lib.rs:198-389``).  This module is the
declarative equivalent for Spark's JDBC reader: the mapping table, a
``customSchema`` builder, and the documented deliberate divergences
(SURVEY.md §7.5):

- NULL floats stay NULL (reference coerces to NaN, src/lib.rs:272,280)
- NUMERIC is exact ``DecimalType(38,18)`` by default (reference is
  lossy f64, src/lib.rs:375-381); ``numeric_mode="flaco"`` restores
  the lossy-double behavior for byte-compat migrations
- UUID maps to string (reference's IpAddr-based decode panics,
  src/lib.rs:241-248)
- enums/arrays are supported instead of panicking (src/lib.rs:382-385)
- TIMESTAMPTZ never panics on a leading NULL (src/lib.rs:312-316)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Postgres type name → Spark type. Keys are the lowercase names that
# appear in information_schema / JDBC metadata.
PG_TO_SPARK: dict[str, T.DataType] = {
    # binary / boolean (src/lib.rs:202-213)
    "bytea": T.BinaryType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    # "char" is a 1-byte int in PG, not a string (src/lib.rs:214-219)
    '"char"': T.ByteType(),
    # text family (src/lib.rs:220-225)
    "text": T.StringType(),
    "varchar": T.StringType(),
    "character varying": T.StringType(),
    "bpchar": T.StringType(),
    "name": T.StringType(),
    "unknown": T.StringType(),
    # JSON kept as string, queried with get_json_object (src/lib.rs:226-234)
    "json": T.StringType(),
    "jsonb": T.StringType(),
    # oid is unsigned 32-bit; Spark has no unsigned → long (src/lib.rs:235-240)
    "oid": T.LongType(),
    # UUID as canonical string (fixes src/lib.rs:241-248)
    "uuid": T.StringType(),
    # integers (src/lib.rs:249-266)
    "int2": T.ShortType(),
    "smallint": T.ShortType(),
    "int4": T.IntegerType(),
    "integer": T.IntegerType(),
    "int8": T.LongType(),
    "bigint": T.LongType(),
    # floats — NULL stays NULL (diverges from src/lib.rs:272,280)
    "float4": T.FloatType(),
    "real": T.FloatType(),
    "float8": T.DoubleType(),
    "double precision": T.DoubleType(),
    # temporal (src/lib.rs:283-366)
    "timestamp": T.TimestampNTZType(),
    "timestamp without time zone": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "timestamp with time zone": T.TimestampType(),
    "date": T.DateType(),
    # TIME (src/lib.rs:350-366): Spark ≥4.1 has a native TimeType —
    # mapped at µs precision, matching PG's; on older runtimes the
    # documented fallback is µs since midnight as LongType.  TIMETZ
    # loses its offset either way (JDBC's java.sql.Time carries none);
    # the value is normalized by the server to session time zone.
    "time": T.TimeType(6) if hasattr(T, "TimeType") else T.LongType(),
    "timetz": T.TimeType(6) if hasattr(T, "TimeType") else T.LongType(),
    # INTERVAL decoded properly (reference keeps raw 16 bytes,
    # src/lib.rs:367-374)
    "interval": T.DayTimeIntervalType(),
    # NUMERIC exact by default (diverges from lossy f64, src/lib.rs:375-381)
    "numeric": T.DecimalType(38, 18),
    "decimal": T.DecimalType(38, 18),
}


def spark_type_for(pg_type: str, numeric_mode: str = "exact") -> T.DataType:
    """Spark type for a Postgres type name.

    Fallbacks mirror §7.5(6): enums and any unknown scalar map to
    string (the reference's own suggested fallback, src/lib.rs:383-384);
    ``foo[]`` arrays map to ArrayType of the element mapping.
    """
    key = pg_type.strip().lower()
    if key.endswith("[]"):
        return T.ArrayType(spark_type_for(key[:-2], numeric_mode))
    if key in ("numeric", "decimal") and numeric_mode == "flaco":
        return T.DoubleType()  # reference's lossy behavior, opt-in only
    return PG_TO_SPARK.get(key, T.StringType())


def custom_schema(columns: dict[str, str], numeric_mode: str = "exact") -> str:
    """Build the JDBC ``customSchema`` option string from
    {column: pg_type} metadata."""
    parts = [
        f"{name} {spark_type_for(pg, numeric_mode).simpleString()}"
        for name, pg in columns.items()
    ]
    return ", ".join(parts)


def flaco_compat_nulls_to_nan(df: DataFrame) -> DataFrame:
    """Opt-in compat mode replicating the reference's NULL-float→NaN
    coercion (src/lib.rs:272,280).  Never applied by default."""
    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, (T.FloatType, T.DoubleType)):
            out = out.withColumn(
                field.name,
                F.coalesce(F.col(field.name), F.lit(float("nan")).cast(field.dataType)),
            )
    return out
