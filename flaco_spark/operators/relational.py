"""Relational query inventory (SURVEY.md §2.2).

The reference delegates all relational algebra to the PostgreSQL
server via SQL pushdown (``/root/reference/src/lib.rs:189``); its
contract is "any SQL the server can run".  This module supplies that
contract natively: every operator category — projection, filter,
joins of all types, aggregation (grouped / global / rollup / cube /
grouping sets / multi-distinct), windows, sort/limit, set ops, scalar
function families, subqueries — expressed with the DataFrame API so
Catalyst plans it (predicate pushdown, column pruning, broadcast
joins, AQE).

Scale notes (100 TB posture):

- Dimension tables (region/nation/supplier/part/customer) are
  explicitly broadcast when joined against fact tables — no shuffle of
  the big side.
- Aggregations go through Tungsten partial (map-side) aggregation
  automatically; keys are the natural group keys, no driver collects.
- Top-k uses ``orderBy().limit(k)`` which Catalyst executes as
  ``TakeOrderedAndProject`` (per-partition heaps + driver merge of k
  rows, never a full sort).
- All float aggregates follow the exact-decimal discipline in
  :mod:`flaco_spark.compat` so results are reproducible bit-for-bit
  regardless of partitioning / ordering — a property worth having at
  any scale, not just for the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flaco_spark.compat import (
    DEC_MONEY,
    davg,
    dsum,
    money,
    one_minus,
    one_plus,
    rate,
    sql_davg,
    sql_dsum,
    sql_money,
    sql_one_minus,
    sql_one_plus,
    value,
    sql_value,
)
from flaco_spark.inventory import register
from flaco_spark.tables import table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

_Q01_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum(sql_money('l_quantity'), 'sum_qty')},
  {sql_dsum(sql_money('l_extendedprice'), 'sum_base_price')},
  {sql_dsum(f"{sql_money('l_extendedprice')} * {sql_one_minus('l_discount')}", 'sum_disc_price')},
  {sql_dsum(f"{sql_money('l_extendedprice')} * {sql_one_minus('l_discount')} * {sql_one_plus('l_tax')}", 'sum_charge')},
  {sql_davg(sql_money('l_quantity'), 'avg_qty')},
  {sql_davg(sql_money('l_extendedprice'), 'avg_price')},
  {sql_davg(sql_money('l_discount'), 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "q01_pricing_summary",
    oracle=_Q01_ORACLE,
    tags=("agg", "filter", "flagship"),
    doc="TPC-H Q1-style pricing summary: grouped exact-decimal sums/avgs "
    "with a pushed-down timestamp filter.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(money("l_quantity"), "sum_qty"),
        dsum(money("l_extendedprice"), "sum_base_price"),
        dsum(money("l_extendedprice") * one_minus("l_discount"), "sum_disc_price"),
        dsum(
            money("l_extendedprice") * one_minus("l_discount") * one_plus("l_tax"),
            "sum_charge",
        ),
        davg(money("l_quantity"), "avg_qty"),
        davg(money("l_extendedprice"), "avg_price"),
        davg(money("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q06_forecast_revenue",
    oracle=f"""
SELECT {sql_dsum(f"{sql_money('l_extendedprice')} * {sql_money('l_discount')}", 'revenue')},
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("agg", "filter"),
    doc="TPC-H Q6-style global aggregate over a tightly filtered scan "
    "(all predicates push to the parquet reader).",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(money("l_extendedprice") * money("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q27_multi_distinct",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS n_months
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg", "distinct"),
    doc="Multiple COUNT(DISTINCT) aggregates in one grouped aggregation "
    "(Catalyst expands to a single multi-distinct plan).",
)
def q27_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.date_format("o_orderdate", "yyyy-MM")).alias("n_months"),
    )


@register(
    "q28_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       {sql_dsum(sql_money('l_quantity'), 'sum_qty')},
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("agg", "rollup"),
    doc="ROLLUP hierarchy totals with GROUPING() indicators.",
)
def q28_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        dsum(money("l_quantity"), "sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n")


@register(
    "q29_cube",
    oracle=f"""
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       {sql_dsum(sql_money('value'), 'sum_value')},
       COUNT(*) AS n
FROM events
GROUP BY CUBE (event_type, strftime(date_trunc('day', ts), '%Y-%m-%d'))
""",
    tags=("agg", "cube", "events"),
    doc="CUBE over event type × day.",
)
def q29_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    return e.cube("event_type", "day").agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        dsum(money("value"), "sum_value"),
        F.count(F.lit(1)).alias("n"),
    ).select("event_type", "day", "g_type", "sum_value", "n")


@register(
    "q42_grouping_sets",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum(sql_money('l_extendedprice'), 'sum_price')},
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    tags=("agg", "groupingsets", "sql"),
    doc="Explicit GROUPING SETS via the SQL API (same Catalyst plan as "
    "the DataFrame rollup/cube path).",
)
def q42_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS {DEC_MONEY})) AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q44_having",
    oracle=f"""
SELECT l_suppkey,
       COUNT(*) AS n_items,
       {sql_dsum(sql_money('l_quantity'), 'total_qty')}
FROM lineitem
GROUP BY l_suppkey
HAVING COUNT(*) > 100 AND SUM({sql_money('l_quantity')}) > CAST(1000 AS DECIMAL(14,2))
""",
    tags=("agg", "having"),
    doc="Grouped aggregation with a post-aggregation HAVING filter.",
)
def q44_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(money("l_quantity")).alias("_total_qty_dec"),
        )
        .filter((F.col("n_items") > 100) & (F.col("_total_qty_dec") > F.lit(1000).cast(DEC_MONEY)))
        .select(
            "l_suppkey",
            "n_items",
            F.col("_total_qty_dec").cast("double").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q03_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey AS o_orderkey,
       {sql_dsum(f"{sql_money('l.l_extendedprice')} * {sql_one_minus('l.l_discount')}", 'revenue')},
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    tags=("join", "agg", "topk"),
    doc="TPC-H Q3-style 3-way join + grouped revenue + top-k "
    "(customer is SF-proportional, so its join strategy is left to "
    "autoBroadcastJoinThreshold/AQE — broadcast when the filtered side "
    "is small, sort-merge otherwise; TakeOrderedAndProject for the "
    "top-10).",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            l.l_orderkey.alias("o_orderkey"),
            F.date_format(o.o_orderdate, "yyyy-MM-dd").alias("orderdate"),
            o.o_orderpriority,
        )
        .agg(dsum(money("l_extendedprice") * one_minus("l_discount"), "revenue"))
        .select("o_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    oracle=f"""
SELECT n.n_name,
       {sql_dsum(f"{sql_money('l.l_extendedprice')} * {sql_one_minus('l.l_discount')}", 'revenue')}
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""",
    tags=("join", "agg"),
    doc="TPC-H Q5-style 6-way star join; fixed-cardinality dims "
    "(nation, region) force-broadcast, SF-proportional dims "
    "(customer, supplier) size-decided by AQE; the only guaranteed "
    "shuffle is the final small group-by.",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(money("l_extendedprice") * one_minus("l_discount"), "revenue"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {sql_dsum(f"{sql_money('l.l_extendedprice')} * {sql_one_minus('l.l_discount')}", 'revenue')},
       n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    tags=("join", "agg", "topk"),
    doc="TPC-H Q10-style: revenue lost to returns per customer, top 20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(money("l_extendedprice") * one_minus("l_discount"), "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) t
GROUP BY c_count
""",
    tags=("join", "outer", "agg"),
    doc="TPC-H Q13-style: left outer join + two-level aggregation "
    "(order-count histogram, customers with zero orders included).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT
  (100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
        THEN {sql_money('l.l_extendedprice')} * {sql_one_minus('l.l_discount')} END) AS DOUBLE))
  / CAST(SUM({sql_money('l.l_extendedprice')} * {sql_one_minus('l.l_discount')}) AS DOUBLE)
  AS promo_revenue_pct,
  COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
""",
    tags=("join", "agg", "case"),
    doc="TPC-H Q14-style conditional aggregation (CASE WHEN inside SUM) "
    "over a broadcast part join.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    p = _t(spark, sf_dir, "part")
    disc_price = money("l_extendedprice") * one_minus("l_discount")
    joined = l.join(p, l.l_partkey == p.p_partkey)
    return joined.agg(
        (
            (F.lit(100.0) * F.sum(F.when(F.col("p_type").like("PROMO%"), disc_price)).cast("double"))
            / F.sum(disc_price).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
SELECT {sql_dsum(f"{sql_money('l.l_extendedprice')} * {sql_one_minus('l.l_discount')}", 'revenue')},
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE
   (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
OR (p.p_brand = 'Brand#3'  AND p.p_type IN ('PROMO', 'ECONOMY') AND l.l_quantity >= 20)
""",
    tags=("join", "filter"),
    doc="TPC-H Q19-style OR-of-ANDs predicate spanning both join sides.",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_type").isin("PROMO", "ECONOMY") & (F.col("l_quantity") >= 20))
    )
    return j.filter(cond).agg(
        dsum(money("l_extendedprice") * one_minus("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q39_cross_join",
    oracle="""
SELECT a.r_regionkey AS rk1, b.r_regionkey AS rk2,
       a.r_name || '-' || b.r_name AS pair
FROM region a CROSS JOIN region b
""",
    tags=("join", "cross"),
    doc="Explicit cross join (small×small only; guarded by design).",
)
def q39_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("rk1"), F.col("r_name").alias("name1")
    )
    b = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("rk2"), F.col("r_name").alias("name2")
    )
    return a.crossJoin(b).select(
        "rk1", "rk2", F.concat_ws("-", "name1", "name2").alias("pair")
    )


# ---------------------------------------------------------------------------
# Semi/anti joins & subqueries
# ---------------------------------------------------------------------------


@register(
    "q04_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
""",
    tags=("join", "semi", "subquery"),
    doc="TPC-H Q4-style EXISTS → left-semi join with a non-equi "
    "condition component.",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    sem = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q38_semi_anti",
    oracle="""
SELECT 'has_order' AS tag, COUNT(*) AS n
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'no_order' AS tag, COUNT(*) AS n
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    tags=("join", "semi", "anti"),
    doc="Left-semi (EXISTS) and left-anti (NOT EXISTS) joins.",
)
def q38_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    has = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("has_order").alias("tag"), "n")
    )
    nope = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("no_order").alias("tag"), "n")
    )
    return has.unionAll(nope)


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
WITH part_avg AS (
  SELECT l_partkey,
         CAST(SUM({sql_money('l_quantity')}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM({sql_money('l.l_extendedprice')}) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part_avg a ON l.l_partkey = a.l_partkey
WHERE l.l_quantity < 0.2 * a.avg_qty
""",
    tags=("join", "subquery", "agg"),
    doc="TPC-H Q17-style correlated aggregate subquery, decorrelated "
    "into an aggregate + self-join.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    part_avg = l.groupBy("l_partkey").agg(
        (F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_qty")
    )
    return (
        l.join(part_avg.withColumnRenamed("l_partkey", "pk"), l.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_totalprice,
       {sql_dsum(sql_money('l.l_quantity'), 'total_qty')}
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM({sql_money('l_quantity')}) > CAST(180 AS DECIMAL(14,2))
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
    tags=("join", "subquery", "agg", "topk"),
    doc="TPC-H Q18-style IN-subquery over a grouped HAVING, top-100.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    # Single-pass formulation: the per-order aggregate that drives the
    # HAVING filter IS the total_qty the output needs — aggregate
    # lineitem once, filter, and join the (tiny) surviving rows to
    # orders.  One lineitem shuffle instead of two, and the final
    # re-aggregation disappears (orders ⋈ big is 1:1 on o_orderkey).
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("q"))
        .filter(F.col("q") > F.lit(180).cast(DEC_MONEY))
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            F.col("q").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q37_scalar_subquery",
    oracle=f"""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (
  SELECT CAST(SUM({sql_money('o_totalprice')}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
  FROM orders
)
""",
    tags=("subquery", "filter"),
    doc="Scalar subquery: orders above the global average price.",
)
def q37_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    avg_df = o.agg(
        (F.sum(money("o_totalprice")).cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_price")
    )
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q22_idle_rich_customers",
    oracle=f"""
SELECT c.c_custkey, c.c_acctbal
FROM customer c
WHERE c.c_acctbal > (
  SELECT CAST(SUM({sql_money('c_acctbal')}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
  FROM customer WHERE c_acctbal > 0
)
AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2001-01-01')
""",
    tags=("subquery", "anti"),
    doc="TPC-H Q22-style: above-average balances with no RECENT orders "
    "(scalar subquery + filtered anti join).  'Recent' = since "
    "2001-01-01: with the plain no-orders-ever predicate every sf has "
    "zero qualifying rows (all customers order), making the check "
    "vacuous — the date-bounded form returns real rows at every sf, "
    "and pushes the date filter into the anti-join's build side.",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_df = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")),
            F.col("c_custkey") == o.o_custkey,
            "left_anti",
        )
        .select("c_custkey", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


@register(
    "q23_window_rank",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER()  OVER w AS rn,
         RANK()        OVER w AS rnk,
         DENSE_RANK()  OVER w AS drnk,
         NTILE(4)      OVER w AS quartile
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) t WHERE rn <= 3
""",
    tags=("window", "rank"),
    doc="Ranking window functions (row_number/rank/dense_rank/ntile) "
    "with a deterministic total order per partition.",
)
def q23_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q24_window_running",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       CAST(SUM({sql_money('o_totalprice')}) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       LAG(o_totalprice)  OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       FIRST_VALUE(o_orderkey) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order,
       CAST(SUM({sql_money('o_totalprice')}) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(COUNT(*) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS ma3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("window", "frame"),
    doc="Framed window aggregates: running sum, lag/lead, first_value, "
    "3-row moving average (exact-decimal inside the frame).",
)
def q24_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    order_w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = order_w.rowsBetween(W.unboundedPreceding, W.currentRow)
    last3 = order_w.rowsBetween(-2, W.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "o_totalprice",
        F.sum(money("o_totalprice")).over(cum).cast("double").alias("running_spend"),
        F.lag("o_totalprice").over(order_w).alias("prev_price"),
        F.lead("o_totalprice").over(order_w).alias("next_price"),
        F.first("o_orderkey").over(cum).alias("first_order"),
        (
            F.sum(money("o_totalprice")).over(last3).cast("double")
            / F.count(F.lit(1)).over(last3).cast("double")
        ).alias("ma3"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops / distinct
# ---------------------------------------------------------------------------


@register(
    "q46_topk",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 15
""",
    tags=("sort", "limit"),
    doc="Top-k: Catalyst plans TakeOrderedAndProject (no global sort).",
)
def q46_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .limit(15)
    )


@register(
    "q26_set_ops",
    oracle="""
SELECT 'u' AS tag, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
) a
UNION ALL
SELECT 'i' AS tag, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
) b
UNION ALL
SELECT 'e' AS tag, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
) c
""",
    tags=("setop",),
    doc="UNION (distinct), INTERSECT, EXCEPT over two customer slices, "
    "tagged and unioned-all together.",
)
def q26_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    u = a.union(b).distinct().select(F.lit("u").alias("tag"), "c_custkey")
    i = a.intersect(b).select(F.lit("i").alias("tag"), "c_custkey")
    e = a.exceptAll(b).distinct().select(F.lit("e").alias("tag"), "c_custkey")
    return u.unionAll(i).unionAll(e)


@register(
    "q11_distinct",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
    tags=("distinct",),
    doc="DISTINCT projection.",
)
def q11_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "q41_pivot",
    oracle=f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN {sql_money('l_quantity')} END) AS DOUBLE) AS qty_open,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN {sql_money('l_quantity')} END) AS DOUBLE) AS qty_filled
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("pivot", "agg"),
    doc="Pivot on line status (DataFrame pivot with explicit values — "
    "no extra pass to discover them).",
)
def q41_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(money("l_quantity")).cast("double"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


# ---------------------------------------------------------------------------
# Projection / filter / scalar function families
# ---------------------------------------------------------------------------


@register(
    "q02_projection_filter",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       CAST({sql_money('l_extendedprice')} * {sql_one_minus('l_discount')} AS DOUBLE) AS disc_price,
       l_quantity
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
  AND l_quantity < 25
""",
    tags=("projection", "filter"),
    doc="Expression projection + conjunctive filter; both predicates "
    "and the 5-column pruning push into the parquet scan.",
)
def q02_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-02-01")
            & (F.col("l_quantity") < 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (money("l_extendedprice") * one_minus("l_discount")).cast("double").alias("disc_price"),
            "l_quantity",
        )
    )


@register(
    "q36_predicates",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
FROM lineitem
WHERE l_returnflag IN ('A', 'R')
  AND l_quantity BETWEEN 10 AND 20
  AND l_linestatus LIKE 'F%'
  AND l_shipdate IS NOT NULL
  AND NOT (l_discount > 0.09)
""",
    tags=("filter", "predicates"),
    doc="IN / BETWEEN / LIKE / IS NOT NULL / NOT — 3-valued logic "
    "predicate battery.",
)
def q36_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 20)
        & F.col("l_linestatus").like("F%")
        & F.col("l_shipdate").isNotNull()
        & ~(F.col("l_discount") > 0.09)
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")


@register(
    "q30_string_functions",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       substring(p_name, 1, 8) AS name_prefix,
       length(p_name) AS name_len,
       p_brand || '/' || p_type AS brand_type,
       replace(p_name, 'a', '@') AS name_replaced,
       lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
       trim(' ' || p_name || ' ') AS name_trimmed,
       string_split(p_name, ' ')[1] AS first_word,
       CASE WHEN contains(p_type, 'O') THEN 1 ELSE 0 END AS has_o
FROM part
WHERE p_name LIKE '%a%'
""",
    tags=("scalar", "string"),
    doc="String function family: case, substring, length, concat, "
    "replace, pad, trim, split, contains.",
)
def q30_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%a%")).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("name_replaced"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.when(F.contains(F.col("p_type"), F.lit("O")), 1).otherwise(0).alias("has_o"),
    )


@register(
    "q31_math_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS abs_disc_delta,
       round(l_extendedprice, 1) AS price_rounded,
       l_partkey % 7 AS partkey_mod,
       l_quantity * l_quantity AS qty_squared,
       sqrt(l_quantity) AS qty_sqrt,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       greatest(l_tax, l_discount) AS max_rate,
       least(l_tax, l_discount) AS min_rate
FROM lineitem
WHERE l_orderkey % 10 = 0
""",
    tags=("scalar", "math"),
    doc="Math function family (only IEEE-exact ops so results are "
    "bit-reproducible: abs/round/mod/sqrt/floor/ceil/sign/greatest/least).",
)
def q31_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") % 10 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.round("l_extendedprice", 1).alias("price_rounded"),
        (F.col("l_partkey") % 7).alias("partkey_mod"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_squared"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@register(
    "q32_temporal_functions",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dy,
       quarter(o_orderdate) AS qtr,
       dayofyear(o_orderdate) AS doy,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       strftime(o_orderdate, '%Y-%m-%d') AS iso_date
FROM orders
WHERE year(o_orderdate) = 1997
""",
    tags=("scalar", "temporal"),
    doc="Temporal function family: extract parts, truncate, interval "
    "arithmetic, datediff, formatting.",
)
def q32_temporal_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.year("o_orderdate") == 1997).select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("plus_30d"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_y2k"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
    )


@register(
    "q33_json_functions",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k
FROM events
GROUP BY event_type
""",
    tags=("scalar", "json", "events"),
    doc="JSON path extraction (reference stores JSON as strings, "
    "src/lib.rs:226-234; we query it with get_json_object).",
)
def q33_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.min(k).alias("min_k"),
    )


@register(
    "q34_conditional",
    oracle=f"""
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS balance_band,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment,
       COUNT(*) AS n,
       {sql_dsum(sql_money('c_acctbal'), 'total_bal')}
FROM customer
GROUP BY 1, 2
""",
    tags=("scalar", "case", "null"),
    doc="CASE WHEN / COALESCE / NULLIF conditional battery.",
)
def q34_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    seg = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER"))
    return c.groupBy(band.alias("balance_band"), seg.alias("segment")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(money("c_acctbal"), "total_bal"),
    )


@register(
    "q35_casts",
    oracle="""
SELECT c_custkey,
       CAST(c_custkey AS VARCHAR) AS key_str,
       CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       CAST(CAST(c_acctbal AS DECIMAL(14,4)) AS VARCHAR) AS bal_str,
       CAST(c_nationkey AS DOUBLE) AS nation_dbl,
       CAST(CAST(c_acctbal AS DECIMAL(14,2)) AS DOUBLE) AS bal_dec,
       CAST(c_acctbal > 0 AS INT) AS is_positive
FROM customer
""",
    tags=("scalar", "cast"),
    doc="Cast battery across int/string/decimal/double/boolean "
    "(§1.3 type-mapping checks).",
)
def q35_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_custkey").cast("string").alias("key_str"),
        F.col("c_custkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("c_acctbal").cast("decimal(14,4)").cast("string").alias("bal_str"),
        F.col("c_nationkey").cast("double").alias("nation_dbl"),
        F.col("c_acctbal").cast("decimal(14,2)").cast("double").alias("bal_dec"),
        (F.col("c_acctbal") > 0).cast("int").alias("is_positive"),
    )


@register(
    "q40_tumbling_window",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type,
       COUNT(*) AS n,
       {sql_dsum(sql_money('value'), 'sum_value')}
FROM events
GROUP BY 1, 2
""",
    tags=("agg", "temporal", "events"),
    doc="Tumbling 1-hour time-window aggregation over the events table "
    "(Spark F.window — same construct Structured Streaming uses).",
)
def q40_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(money("value"), "sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "q45_approx_distinct",
    oracle=None,  # HLL sketches differ between engines by design → rows-only check
    tags=("agg", "approx"),
    doc="approx_count_distinct (HyperLogLog++) with the error bound "
    "machine-checked IN the result: the same single-pass aggregate "
    "computes the exact distinct counts and emits rel_err_* plus a "
    "within_bound flag (|approx-exact|/exact <= 0.15 = 3x the default "
    "rsd of 0.05).  No oracle: sketch estimates are engine-specific; "
    "tests/test_pipeline_ops.py asserts within_bound on this exact "
    "registered query.",
)
def q45_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    rel = lambda a, e: F.abs(F.col(a).cast("double") / F.col(e).cast("double") - 1.0)  # noqa: E731
    return (
        l.agg(
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .withColumn("rel_err_orders", rel("approx_orders", "exact_orders"))
        .withColumn("rel_err_parts", rel("approx_parts", "exact_parts"))
        .withColumn(
            "within_bound",
            (F.col("rel_err_orders") <= 0.15) & (F.col("rel_err_parts") <= 0.15),
        )
    )


# ---------------------------------------------------------------------------
# Outer joins / ordering / multiset ops / regex / hashes / pagination
# ---------------------------------------------------------------------------


@register(
    "q47_full_outer",
    oracle="""
SELECT c.c_custkey, o.o_orderkey,
       coalesce(c.c_name, '<no customer>') AS cust,
       coalesce(CAST(o.o_totalprice AS VARCHAR), '<no order>') AS price_str
FROM (SELECT * FROM customer WHERE c_acctbal > 8000) c
FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
  ON c.c_custkey = o.o_custkey
""",
    tags=("join", "outer"),
    doc="Full outer join with unmatched rows on both sides.",
)
def q47_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 8000)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full_outer")
        .select(
            "c_custkey",
            "o_orderkey",
            F.coalesce("c_name", F.lit("<no customer>")).alias("cust"),
            F.coalesce(F.col("o_totalprice").cast("string"), F.lit("<no order>")).alias(
                "price_str"
            ),
        )
    )


@register(
    "q48_right_outer",
    oracle="""
SELECT n.n_nationkey, n.n_name, s.s_suppkey
FROM supplier s
RIGHT OUTER JOIN nation n ON s.s_nationkey = n.n_nationkey
""",
    tags=("join", "outer"),
    doc="Right outer join (every nation kept, suppliers optional).",
)
def q48_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right_outer").select(
        "n_nationkey", "n_name", "s_suppkey"
    )


@register(
    "q49_nulls_ordering",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey,
         lag(o_totalprice) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_price
  FROM orders
) t
ORDER BY prev_price ASC NULLS FIRST, o_orderkey
LIMIT 25
""",
    tags=("sort", "nulls", "window"),
    doc="NULLS FIRST ordering over a computed (lag) column with a "
    "deterministic tie-break + limit.",
)
def q49_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_totalprice").over(w).alias("prev_price"),
        )
        .orderBy(F.asc_nulls_first("prev_price"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "q50_multiset_ops",
    oracle="""
SELECT 'ia' AS tag, l_returnflag, l_linestatus FROM (
  SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_orderkey % 2 = 0
  INTERSECT ALL
  SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_orderkey % 2 = 1
) a
UNION ALL
SELECT 'ea' AS tag, l_returnflag, l_linestatus FROM (
  SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_orderkey % 2 = 0
  EXCEPT ALL
  SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_orderkey % 2 = 1
) b
""",
    tags=("setop", "multiset"),
    doc="INTERSECT ALL / EXCEPT ALL (bag semantics with duplicate "
    "multiplicities).",
)
def q50_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    even = l.filter(F.col("l_orderkey") % 2 == 0).select("l_returnflag", "l_linestatus")
    odd = l.filter(F.col("l_orderkey") % 2 == 1).select("l_returnflag", "l_linestatus")
    ia = even.intersectAll(odd).select(F.lit("ia").alias("tag"), "l_returnflag", "l_linestatus")
    ea = even.exceptAll(odd).select(F.lit("ea").alias("tag"), "l_returnflag", "l_linestatus")
    return ia.unionAll(ea)


@register(
    "q51_regexp",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       CASE WHEN regexp_matches(p_name, '^[a-z]+ [a-z]+') THEN 1 ELSE 0 END AS two_words,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
FROM part
""",
    tags=("scalar", "string", "regexp"),
    doc="Regular-expression extract / replace / match (patterns chosen "
    "inside the Java-regex ∩ RE2 common dialect).",
)
def q51_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.when(F.col("p_name").rlike("^[a-z]+ [a-z]+"), 1).otherwise(0).alias("two_words"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
    )


@register(
    "q52_hash_binary",
    oracle="""
SELECT p_partkey,
       md5(p_name) AS name_md5,
       sha256(p_name) AS name_sha256,
       to_base64(CAST(p_name AS BLOB)) AS name_b64,
       CAST(octet_length(CAST(p_name AS BLOB)) AS INT) AS n_bytes
FROM part
WHERE p_partkey % 5 = 0
""",
    tags=("scalar", "binary", "hash"),
    doc="Hash & binary function family: md5, sha2-256, base64, byte "
    "length (BYTEA-arm parity, ref src/lib.rs:202-207).",
)
def q52_hash_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 5 == 0)
    payload = F.encode(F.col("p_name"), "UTF-8")
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2(F.col("p_name"), 256).alias("name_sha256"),
        F.base64(payload).alias("name_b64"),
        F.length(payload).alias("n_bytes"),
    )


@register(
    "q53_ilike",
    oracle="""
SELECT p_partkey, p_type
FROM part
WHERE p_type ILIKE '%prOmO%' OR upper(p_brand) LIKE 'BRAND#1%'
""",
    tags=("filter", "string"),
    doc="Case-insensitive LIKE.",
)
def q53_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").ilike("%prOmO%") | F.upper("p_brand").like("BRAND#1%")
    ).select("p_partkey", "p_type")


@register(
    "q54_offset_pagination",
    oracle="""
SELECT c_custkey, c_acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 10 OFFSET 10
""",
    tags=("sort", "limit", "offset"),
    doc="ORDER BY + OFFSET + LIMIT pagination (deterministic total "
    "order).",
)
def q54_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .offset(10)
        .limit(10)
    )
