"""Skew mitigation: salted aggregation and salted broadcast-replicate
joins.

At 100 TB a handful of hot keys (one customer, one null-ish default
value) can put an entire shuffle partition on one executor.  Two
standard treatments, both expressed so their RESULTS are identical to
the unsalted operator — the inventory registers them with the plain
SQL as the oracle, so the equivalence is machine-checked:

- **Salted aggregation** — add a deterministic salt column, aggregate
  on (key, salt) first (spreads a hot key over N partitions), then
  re-aggregate on the key.  Works for any algebraic aggregate
  (sum/count/min/max and avg via sum+count).
- **Salt-replicate join** — for a skewed big-side key: the big side
  gets a deterministic salt in [0, N); the small side is replicated N
  times (explode over the salt range); the join key becomes
  (key, salt) so each hot key's rows split across N partitions.

Spark's AQE skew-join handles *detected* skew automatically at
runtime (enabled in the session factory); these operators are the
explicit, planner-independent form — useful when skew is known ahead
of time or when AQE's post-shuffle splitting can't help (e.g. skewed
aggregation keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flaco_spark.compat import money, sql_money
from flaco_spark.inventory import register
from flaco_spark.tables import table

DEFAULT_SALT_BUCKETS = 16


def _salt(cols: list[str | Column], buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of the row's non-key
    columns.  Using row content (not rand()) keeps results reproducible
    and retry-safe — a re-executed task salts identically."""
    return F.pmod(F.hash(*cols), F.lit(buckets))


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column,
    salt_cols: list[str],
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-stage skew-safe SUM/COUNT.

    Stage 1 aggregates on (group_cols, salt) — a hot key's rows spread
    over ``buckets`` partitions and combine map-side; stage 2 combines
    the ≤ buckets partial rows per key.  Output: group_cols, ``s``
    (exact decimal sum), ``n`` (count).
    """
    salted = df.withColumn("_salt", _salt([F.col(c) for c in salt_cols], buckets))
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.sum(value_col).alias("ps"), F.count(F.lit(1)).alias("pn")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("ps").alias("s"), F.sum("pn").alias("n")
    )


def salt_replicate_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
    big_salt_cols: list[str] | None = None,
) -> DataFrame:
    """Inner equi-join where the big side's key distribution is skewed.

    The small side is exploded ``buckets``× (acceptable because it is
    small); the shuffle key becomes (key, salt) so no single reducer
    owns a hot key.  Result == plain ``big.join(small, key)``.
    """
    salt_src = big_salt_cols or [c for c in big.columns if c != key]
    b = big.withColumn("_salt", _salt([F.col(c) for c in salt_src], buckets))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return b.join(s, [key, "_salt"]).drop("_salt")


# ---------------------------------------------------------------------------
# Oracle-checked inventory entries: salted == unsalted, machine-verified
# ---------------------------------------------------------------------------


@register(
    "s01_salted_agg",
    oracle=f"""
SELECT o_custkey,
       CAST(SUM({sql_money('o_totalprice')}) AS DOUBLE) AS total_spent,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
""",
    tags=("skew", "agg", "salting"),
    doc="Skew-safe two-stage salted aggregation; the oracle is the "
    "PLAIN group-by, proving the salting is semantics-preserving.",
)
def s01_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    out = salted_sum_count(
        o,
        group_cols=["o_custkey"],
        value_col=money("o_totalprice"),
        salt_cols=["o_orderkey"],
    )
    return out.select(
        "o_custkey",
        F.col("s").cast("double").alias("total_spent"),
        F.col("n").alias("n_orders"),
    )


@register(
    "s02_salted_join",
    oracle=f"""
SELECT l.l_orderkey, l.l_linenumber, n.n_name AS supp_nation,
       CAST({sql_money('l.l_extendedprice')} AS DOUBLE) AS price
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
""",
    tags=("skew", "join", "salting"),
    doc="Salt-replicate join of lineitem against the (replicated) "
    "supplier→nation dim; oracle is the plain join — identical rows.",
)
def s02_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        F.col("s_suppkey").alias("l_suppkey"), F.col("n_name").alias("supp_nation")
    )
    joined = salt_replicate_join(
        l, dim, key="l_suppkey", big_salt_cols=["l_orderkey", "l_linenumber"]
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "supp_nation",
        money("l_extendedprice").cast("double").alias("price"),
    )


HOT_KEY_MIN_ROWS = 20  # a key this hot gets the broadcast path


def hot_cold_split_join(
    big: DataFrame, small: DataFrame, key: str, hot_min: int = HOT_KEY_MIN_ROWS
) -> DataFrame:
    """Inner equi-join with HOT-KEY ISOLATION (the differentiated-join
    treatment): keys whose big-side row count ≥ ``hot_min`` are joined
    on the BROADCAST path (no shuffle touches their rows), the cold
    remainder takes the normal shuffle join, and the union is exactly
    ``big.join(small, key)``.  Unlike salting (s02), the hot rows
    never shuffle AT ALL — the treatment of choice when a handful of
    keys dominate and the dim side is broadcastable anyway.
    """
    hot_keys = (
        big.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= hot_min)
        .select(key)
    )
    big_hot = big.join(F.broadcast(hot_keys), key, "left_semi")
    big_cold = big.join(F.broadcast(hot_keys), key, "left_anti")
    hot_joined = big_hot.join(F.broadcast(small), key)
    cold_joined = big_cold.join(small, key)
    return hot_joined.unionByName(cold_joined)


@register(
    "s03_hot_cold_split_join",
    oracle=f"""
SELECT l.l_suppkey, l.l_orderkey, l.l_linenumber,
       s.s_nationkey,
       CAST({sql_money('l.l_extendedprice')} AS DOUBLE) AS price
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
""",
    tags=("skew", "join", "hot-keys", "broadcast"),
    doc="Hot-key isolation join (the differentiated/split-join skew "
    "treatment, the third of the classic trio after salting s01/s02 "
    "and AQE's runtime split): suppliers with ≥20 lineitem rows are "
    "detected by a partial-aggregated count, their rows take a "
    "BROADCAST join (zero shuffle for exactly the rows that would "
    "have made a reducer hot), the cold tail takes the plain "
    "shuffle join, and unionByName stitches the two plans.  The "
    "oracle is the PLAIN join — the split is machine-checked to be "
    "semantics-preserving, the same equivalence contract as "
    "s01/s02.  100 TB posture: the hot-key relation is "
    "tiny-by-definition (keys above a row-count threshold), both "
    "probe passes are broadcast semi/anti joins over one scan, and "
    "the expensive shuffle now sees a key distribution with its "
    "head cut off.",
)
def s03_hot_cold_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = hot_cold_split_join(
        l, s.withColumnRenamed("s_suppkey", "l_suppkey"), key="l_suppkey"
    )
    return joined.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "s_nationkey",
        money("l_extendedprice").cast("double").alias("price"),
    )
