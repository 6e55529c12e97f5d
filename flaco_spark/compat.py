"""Cross-engine determinism helpers.

The correctness gate hash-compares Spark results against a DuckDB
oracle.  Floating-point aggregation is order-dependent, so any
``SUM(double)`` would be nondeterministic across engines.  The engine
therefore follows one rule everywhere a float aggregate appears in an
oracle-checked query:

    cast the double to a fixed-scale DECIMAL → aggregate exactly →
    cast the exact result back to DOUBLE (and for ratios, perform a
    single IEEE double division on exact operands).

Both engines round a double to the same decimal (round-to-nearest of
the same binary value; exact ties at these scales require dyadic
fractions that do not occur in the data), both sum decimals exactly,
and both convert the same exact decimal to the same nearest double —
so the final doubles are bit-identical.

Two engine-specific constraints pin the scales (verified by probe):

1. DuckDB's DECIMAL→DOUBLE cast goes hugeint→double and is only
   correctly rounded while the UNSCALED value stays below 2^53 —
   so aggregate scales must be small enough that
   ``|sum| * 10^scale < 9e15`` with growth headroom (scale 2 money →
   exact up to |sum| ≈ 9e13, far beyond any SF here).
2. DuckDB TRUNCATES on DECIMAL→DECIMAL scale reduction while Spark
   rounds HALF_UP — so never reduce a decimal's scale; choose the
   final scale up front.  (Double→decimal casts ARE consistently
   round-half-away in both engines.)

Scales also keep decimal *products* within precision 38 in BOTH
engines (Spark: p1+p2+1; DuckDB: w1+w2):

- ``DEC_MONEY``  = DECIMAL(14,2): prices / quantities / balances
  (the data is 2-dp).
- ``DEC_RATE``   = DECIMAL(4,2):  discount / tax style rates.
- ``DEC_VALUE``  = DECIMAL(18,6): general standalone sums.

money(14,2) × (1±rate)(5,2) → (20,4) Spark / (19,4) DuckDB — exact;
× another (5,2) → (26,6) / (24,6) — still exact, and a full-table sum
at scale 6 stays under 2^53 unscaled through sf100.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC_MONEY = "decimal(14,2)"
DEC_RATE = "decimal(4,2)"
DEC_VALUE = "decimal(18,6)"


def money(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC_MONEY)


def rate(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC_RATE)


def value(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC_VALUE)


def one_minus(rate_col: str | Column) -> Column:
    """(1 - rate) as DECIMAL(5,2) — exact."""
    return F.lit(1).cast(DEC_RATE) - rate(rate_col)


def one_plus(rate_col: str | Column) -> Column:
    return F.lit(1).cast(DEC_RATE) + rate(rate_col)


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal SUM surfaced as a double."""
    return F.sum(col).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """avg = exact decimal sum cast to double, divided by double count.

    A single IEEE division of identical operands — bit-identical in any
    engine.
    """
    return (F.sum(col).cast("double") / F.count(F.lit(1)).cast("double")).alias(alias)


# ---- matching SQL fragments for the DuckDB oracle ----------------------

SQL_MONEY = "DECIMAL(14,2)"
SQL_RATE = "DECIMAL(4,2)"
SQL_VALUE = "DECIMAL(18,6)"


def sql_money(expr: str) -> str:
    return f"CAST({expr} AS {SQL_MONEY})"


def sql_rate(expr: str) -> str:
    return f"CAST({expr} AS {SQL_RATE})"


def sql_value(expr: str) -> str:
    return f"CAST({expr} AS {SQL_VALUE})"


def sql_one_minus(expr: str) -> str:
    return f"(CAST(1 AS {SQL_RATE}) - {sql_rate(expr)})"


def sql_one_plus(expr: str) -> str:
    return f"(CAST(1 AS {SQL_RATE}) + {sql_rate(expr)})"


def sql_dsum(inner: str, alias: str) -> str:
    return f"CAST(SUM({inner}) AS DOUBLE) AS {alias}"


def sql_davg(inner: str, alias: str) -> str:
    return f"CAST(SUM({inner}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS {alias}"
