"""UDF surface (SURVEY.md §2.2 "UDF surface" row).

Four escape hatches, in ascending batch-efficiency order:

- row-at-a-time Python UDF (``F.udf``) — supported for parity, never
  used in engine hot paths;
- vectorized pandas UDF (``F.pandas_udf``) — Arrow-batched, the
  correct choice when Python is unavoidable;
- grouped pandas UDAF (``applyInPandas``) — per-group pandas frames;
- Arrow-native table function (``mapInArrow``) — zero-pandas batch
  transform (also the machinery behind the distributed Feather sink,
  flaco_spark/sources/feather.py).

Every entry computes integer/string results only, so the DuckDB
oracle matches exactly despite the Python round-trip.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flaco_spark.inventory import register
from flaco_spark.localrel import local_relation
from flaco_spark.tables import table


@register(
    "u01_python_udf",
    oracle="""
SELECT l_orderkey, l_linenumber,
       'key=' || CAST(l_partkey AS VARCHAR) || ':' || CAST(l_partkey % 7 AS VARCHAR) AS tag
FROM lineitem
WHERE l_orderkey % 100 = 0
""",
    tags=("udf", "python"),
    doc="Row-at-a-time Python scalar UDF (the slow path, here for "
    "surface parity).",
)
def u01_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = F.udf(lambda k: f"key={k}:{k % 7}", "string")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return l.select("l_orderkey", "l_linenumber", tag("l_partkey").alias("tag"))


@register(
    "u05_arrow_python_udf",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_partkey * l_partkey % 997 AS BIGINT) AS sq_mod
FROM lineitem
WHERE l_orderkey % 200 = 0
""",
    tags=("udf", "python", "arrow"),
    doc="Arrow-optimized Python scalar UDF (useArrow=True): same "
    "row-wise authoring model as u01 but Arrow-batched transfer — "
    "the drop-in upgrade path for legacy Python UDFs.",
)
def u05_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    sq_mod = F.udf(lambda k: (k * k) % 997, "bigint", useArrow=True)
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 200 == 0)
    return l.select("l_orderkey", "l_linenumber", sq_mod("l_partkey").alias("sq_mod"))


@register(
    "u02_pandas_udf",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST((l_partkey * 31 + 7) % 1000003 AS BIGINT) AS bucket
FROM lineitem
WHERE l_orderkey % 100 = 0
""",
    tags=("udf", "pandas", "arrow"),
    doc="Vectorized (Arrow-batched) pandas UDF — the ~10-100× faster "
    "Python escape hatch.",
)
def u02_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("bigint")
    def bucket(k: pd.Series) -> pd.Series:
        return (k * 31 + 7) % 1000003

    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return l.select("l_orderkey", "l_linenumber", bucket("l_partkey").alias("bucket"))


@register(
    "u03_grouped_pandas_udaf",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS qty_cents
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("udf", "pandas", "agg"),
    doc="Grouped pandas UDAF via applyInPandas (integer-exact "
    "aggregation so the oracle matches).",
)
def u03_grouped_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n": [len(pdf)],
                # quantities are integral doubles; *100 stays exact
                "qty_cents": [(pdf["l_quantity"] * 100).astype("int64").sum()],
            }
        )

    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").applyInPandas(
        agg, schema="l_returnflag string, n bigint, qty_cents bigint"
    )


@register(
    "u04_map_in_arrow",
    oracle="""
SELECT l_orderkey, CAST(l_orderkey * 2 AS BIGINT) AS double_key
FROM lineitem
WHERE l_quantity > 45
""",
    tags=("udf", "arrow"),
    doc="Arrow-native batch table function (mapInArrow): filter + "
    "project without touching pandas.",
)
def u04_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    def transform(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:  # noqa: F821
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            mask = pc.greater(batch.column("l_quantity"), pa.scalar(45.0))
            kept = batch.filter(mask)
            keys = kept.column("l_orderkey")
            yield pa.RecordBatch.from_arrays(
                [keys, pc.multiply(keys, pa.scalar(2, type=pa.int64()))],
                names=["l_orderkey", "double_key"],
            )

    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return l.mapInArrow(transform, schema="l_orderkey bigint, double_key bigint")


@register(
    "u06_apply_in_arrow",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value * 100 AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
""",
    tags=("udf", "arrow", "agg"),
    doc="Grouped Arrow UDAF via applyInArrow (Spark 4): per-group "
    "aggregation computed with pyarrow.compute on the raw Arrow "
    "table — no pandas materialization at all, the cheapest grouped "
    "Python escape hatch.  Integer-exact outputs so the oracle "
    "hash-matches.",
)
def u06_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    def agg(tbl: "pa.Table") -> "pa.Table":  # noqa: F821
        import pyarrow as pa
        import pyarrow.compute as pc

        cents = pc.cast(
            pc.round(pc.multiply(tbl.column("value"), pa.scalar(100.0))), pa.int64()
        )
        ks = pc.cast(
            pc.struct_field(
                pc.extract_regex(tbl.column("props"), r'"k": (?P<k>\d+)'), "k"
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "event_type": [tbl.column("event_type")[0].as_py()],
                "n": [tbl.num_rows],
                "value_cents": [pc.sum(cents).as_py()],
                "max_k": [pc.max(ks).as_py()],
            },
            schema=pa.schema(
                [
                    ("event_type", pa.string()),
                    ("n", pa.int64()),
                    ("value_cents", pa.int64()),
                    ("max_k", pa.int32()),
                ]
            ),
        )

    e = table(spark, sf_dir, "events").select("event_type", "value", "props")
    return e.groupBy("event_type").applyInArrow(
        agg, schema="event_type string, n bigint, value_cents bigint, max_k int"
    )


@register(
    "u07_cogrouped_pandas",
    oracle="""
SELECT c.c_custkey,
       COUNT(DISTINCT o.o_orderkey) AS n_orders,
       COUNT(l.l_orderkey) AS n_lineitems
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_custkey < 50
GROUP BY c.c_custkey
""",
    tags=("udf", "cogroup", "pandas"),
    doc="Cogrouped applyInPandas: orders and lineitem co-partition on "
    "the join key and each (orders-group, lineitem-group) pair lands "
    "in ONE Python call as two pandas frames — Spark's escape hatch "
    "for per-key merge logic no SQL join expresses (per-key "
    "sequence alignment, custom matching).  The function here does a "
    "pandas merge + count so the DuckDB join oracle can hash-check "
    "the plumbing end-to-end.  Scale: both sides shuffle once on the "
    "key (same cost as the equivalent join), Python sees one key "
    "group at a time, Arrow-batched.",
)
def u07_cogrouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select("o_custkey", "o_orderkey")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")

    # restrict lineitem to the relevant orders first (semi-join) so the
    # cogroup key can be the CUSTOMER: one python call per customer.
    # (aliased copy of the order keys — avoids self-join ambiguity)
    o_keys = o.select(
        F.col("o_custkey").alias("ck"), F.col("o_orderkey").alias("ok")
    )
    li_k = li.join(o_keys, li.l_orderkey == o_keys.ok, "inner").select(
        F.col("ck").alias("o_custkey"), "l_orderkey", "l_linenumber"
    )

    def merge(orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
        if orders_pdf.empty:
            return pd.DataFrame(
                columns=["c_custkey", "n_orders", "n_lineitems"]
            ).astype({"c_custkey": "int64", "n_orders": "int64", "n_lineitems": "int64"})
        merged = orders_pdf.merge(
            lines_pdf, left_on="o_orderkey", right_on="l_orderkey", how="inner"
        )
        if merged.empty:
            return pd.DataFrame(
                columns=["c_custkey", "n_orders", "n_lineitems"]
            ).astype({"c_custkey": "int64", "n_orders": "int64", "n_lineitems": "int64"})
        return pd.DataFrame(
            {
                "c_custkey": [int(orders_pdf["o_custkey"].iloc[0])],
                "n_orders": [int(merged["o_orderkey"].nunique())],
                "n_lineitems": [int(len(merged))],
            }
        )

    return (
        o.groupby("o_custkey")
        .cogroup(li_k.groupby("o_custkey"))
        .applyInPandas(merge, schema="c_custkey bigint, n_orders bigint, n_lineitems bigint")
    )


# ---------------------------------------------------------------------------
# u08 — Python user-defined TABLE function (UDTF)
# ---------------------------------------------------------------------------


@register(
    "u08_python_udtf",
    oracle="""
WITH base AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_cents,
         CAST(o_orderkey % 3 + 1 AS BIGINT) AS n_parts,
         generate_series(0, CAST(o_orderkey % 3 AS BIGINT)) AS idxs
  FROM orders WHERE o_orderkey < 200
)
SELECT o_orderkey,
       unnest(idxs) AS installment_idx,
       CAST(total_cents // n_parts
            + CASE WHEN unnest(idxs) = 0 THEN total_cents % n_parts ELSE 0 END
            AS BIGINT) AS installment_cents
FROM base
""",
    tags=("udf", "udtf", "orders"),
    doc="Python UDTF (Spark 4 user-defined TABLE function): one input "
    "row fans out to a variable number of output rows from imperative "
    "Python — the 1→N escape hatch when explode over a computed array "
    "won\'t do (stateful row generation, external lookups).  Each "
    "order yields its installment schedule: total split into "
    "orderkey%3+1 parts in EXACT INTEGER CENTS (floor division, "
    "remainder on the first installment — the only engine-portable "
    "AND financially correct way to split money; per-part float "
    "rounding both drifts between engines and loses cents).  The "
    "UDTF runs inside LATERAL, streaming rows through Arrow without "
    "materializing the fan-out; map-side only, no shuffle.",
)
def u08_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, installment_idx bigint, installment_cents bigint")
    class InstallmentSplit:
        def eval(self, orderkey: int, total_cents: int):
            n = orderkey % 3 + 1
            base, rem = divmod(total_cents, n)
            for i in range(n):
                yield (orderkey, i, base + (rem if i == 0 else 0))

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    spark.udtf.register("installment_split", InstallmentSplit)
    o.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("total_cents"),
    ).createOrReplaceTempView("u08_orders")
    return spark.sql(
        """
        SELECT s.o_orderkey, s.installment_idx, s.installment_cents
        FROM u08_orders o,
             LATERAL installment_split(o.o_orderkey, o.total_cents) s
        """
    )


# ---------------------------------------------------------------------------
# u09 — iterator-form pandas UDF (amortized per-task initialization)
# ---------------------------------------------------------------------------


@register(
    "u09_iterator_pandas_udf",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST((l_partkey * 17 + 3) % 999983 AS BIGINT) AS scored
FROM lineitem
WHERE l_orderkey % 100 = 1
""",
    tags=("udf", "pandas", "arrow", "iterator"),
    doc="Iterator-form pandas UDF (Iterator[pd.Series] → "
    "Iterator[pd.Series]): the variant that matters for ML scoring — "
    "per-task state (a model, a tokenizer, a compiled regex) "
    "initializes ONCE before the batch loop instead of per Arrow "
    "batch, which is the difference between loading a model per 10k "
    "rows and per task at 100 TB.  The 'model' here is a trivial "
    "affine hash so the DuckDB oracle can verify the plumbing; the "
    "init-once-then-stream structure is the real surface.",
)
def u09_iterator_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("bigint")
    def scored(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # expensive one-time init would go here (runs once per task)
        a, b, mod = 17, 3, 999983
        for k in batches:
            yield (k * a + b) % mod

    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 1)
    return l.select("l_orderkey", "l_linenumber", scored("l_partkey").alias("scored"))


# ---------------------------------------------------------------------------
# u10 — custom Python DataSource (Spark 4 datasource API), Arrow-batch read
# ---------------------------------------------------------------------------


@register(
    "u10_python_datasource",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
""",
    tags=("udf", "datasource", "feather", "source", "documents"),
    doc="Custom Python DataSource (Spark 4 pyspark.sql.datasource "
    "API) behind the correctness gate: the documents table is sunk to "
    "a distributed Feather/IPC directory (the reference's "
    "FileFormat.Feather container, src/lib.rs:150-168), read back "
    "through the registered 'feather_dir' source — one InputPartition "
    "per file, read() yielding pyarrow RecordBatches (the Arrow-native "
    "fast path, no per-row Python objects) — and aggregated; the "
    "result must hash-match the same aggregate over the original "
    "parquet.  This is the idiomatic Spark-4 answer to a corpus in a "
    "format Spark lacks a built-in reader for: ~60 lines of Python, "
    "file-level parallelism, schema probed from metadata at plan "
    "time.  The |groups|-row aggregate is materialized eagerly so "
    "the scratch copy is deleted before returning (q92's contract).",
)
def u10_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from flaco_spark.sources.feather import write_feather
    from flaco_spark.sources.pyds import register_feather_source
    from flaco_spark.tables import table as _table

    register_feather_source(spark)
    src = _table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = tempfile.mkdtemp(prefix="flaco_pyds_")
    path = f"{out}/docs_feather"
    try:
        write_feather(src, path, single_file=False)
        back = spark.read.format("feather_dir").option("path", path).load()
        agg = back.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        rows = agg.collect()
        return local_relation(spark, rows, agg.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "u11_arrow_udtf",
    oracle="""
WITH base AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purch
  FROM events WHERE user_id < 50 GROUP BY user_id
),
tiers AS (
  SELECT user_id, n_events, n_purch,
         unnest(CASE WHEN n_purch >= 3 THEN ['active', 'buyer', 'vip']
                     WHEN n_purch >= 1 THEN ['active', 'buyer']
                     ELSE ['active'] END) AS tier
  FROM base
)
SELECT user_id, tier, n_events, n_purch FROM tiers
""",
    tags=("udf", "udtf", "arrow", "events"),
    doc="Arrow-optimized Python UDTF (Spark 4 ``useArrow=True``): the "
    "same 1→N table-function authoring model as u08 but with "
    "Arrow-serialized input/output batches instead of pickled rows — "
    "the UDTF analogue of u05's Arrow scalar UDF, completing the "
    "surface matrix {scalar, aggregate, table} × {pickle, Arrow}.  "
    "Each user fans out to one row per earned engagement tier "
    "(imperative threshold ladder).  The oracle mirrors with a CASE "
    "list unnest; aggregation happens BEFORE the UDTF so the "
    "imperative stage touches |users| rows, not |events|.",
)
def u11_arrow_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="user_id bigint, tier string, n_events bigint, n_purch bigint",
        useArrow=True,
    )
    class TierFanout:
        def eval(self, user_id: int, n_events: int, n_purch: int):
            tiers = ["active"]
            if n_purch >= 1:
                tiers.append("buyer")
            if n_purch >= 3:
                tiers.append("vip")
            for t in tiers:
                yield (user_id, t, n_events, n_purch)

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("bigint")
        .alias("n_purch"),
    )
    spark.udtf.register("tier_fanout", TierFanout)
    agg.createOrReplaceTempView("u11_users")
    return spark.sql(
        """
        SELECT s.user_id, s.tier, s.n_events, s.n_purch
        FROM u11_users u,
             LATERAL tier_fanout(u.user_id, u.n_events, u.n_purch) s
        """
    )


@register(
    "u12_grouped_agg_pandas_udf",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         AS cents_sum,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders WHERE o_orderkey < 3000
GROUP BY o_orderstatus
""",
    tags=("udf", "pandas", "grouped-agg", "orders"),
    doc="GROUPED_AGG pandas UDF (the Series→scalar aggregate form, "
    "usable directly inside groupBy().agg() and as a window "
    "function) — the remaining cell of the UDF matrix next to u03's "
    "applyInPandas (DataFrame→DataFrame) form: where u03 reshapes "
    "whole groups, GROUPED_AGG slots a vectorized Python reduction "
    "into the aggregation plan.  Catalyst REFUSES to mix pandas and "
    "JVM aggregates in one agg() ([INVALID_PANDAS_UDF_PLACEMENT]), "
    "so both outputs here are pandas reductions — the composition "
    "constraint itself is part of the surface being demonstrated.  "
    "Integer-exact cents keep the Python-side sum "
    "oracle-comparable.  Arrow-batched per group; partial "
    "aggregation is NOT available for Python aggregates, so at "
    "100 TB this shuffles full rows — acceptable for rare custom "
    "reductions, never for what a builtin expresses (the engine's "
    "standing UDF policy).",
)
def u12_grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def cents_sum(v: pd.Series) -> int:
        return int(v.sum())

    @pandas_udf("bigint")
    def row_count(v: pd.Series) -> int:
        return int(len(v))

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    return o.select("o_orderstatus", cents.alias("c")).groupBy("o_orderstatus").agg(
        cents_sum(F.col("c")).alias("cents_sum"),
        row_count(F.col("c")).alias("n"),
    )


# ---------------------------------------------------------------------------
# u13 — UDTF with TABLE argument (polymorphic table function)
# ---------------------------------------------------------------------------


@register(
    "u13_table_arg_udtf",
    oracle="""
SELECT o_orderpriority, rnk, o_orderkey, price_cents FROM (
  SELECT o_orderpriority,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                 ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC,
                                          o_orderkey) AS INT) AS rnk,
         o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
  FROM orders WHERE o_orderkey < 4000
) WHERE rnk <= 2
""",
    tags=("udf", "udtf", "table-argument", "orders"),
    doc="UDTF with a TABLE argument (Spark 4 polymorphic table "
    "functions): the function is called FROM top2_spenders(TABLE(t) "
    "PARTITION BY o_orderpriority ORDER BY ...) — Spark shuffles by "
    "the partition clause and feeds each partition's rows, in the "
    "declared order, to one UDTF instance (eval per row, terminate "
    "per partition), which is the imperative escape hatch when "
    "per-group logic outgrows window functions but the input must "
    "stay a streamed partition, never a collected list (u03's "
    "applyInPandas materializes the group as one pandas frame; this "
    "streams).  The top-2 semantics here are deliberately "
    "window-expressible so the oracle can verify the partition/order "
    "contract exactly.  Money stays integer cents through the Python "
    "boundary.",
)
def u13_table_arg_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderpriority string, rnk int, o_orderkey bigint, price_cents bigint")
    class Top2Spenders:
        def __init__(self) -> None:
            self._seen = 0

        def eval(self, row):
            # rows arrive in the TABLE clause's declared ORDER BY
            if self._seen < 2:
                self._seen += 1
                yield (
                    row["o_orderpriority"],
                    self._seen,
                    row["o_orderkey"],
                    row["price_cents"],
                )

    spark.udtf.register("u13_top2_spenders", Top2Spenders)
    table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000).select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    ).createOrReplaceTempView("u13_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, rnk, o_orderkey, price_cents
        FROM u13_top2_spenders(
          TABLE(u13_orders)
          PARTITION BY o_orderpriority
          ORDER BY (price DESC, o_orderkey)
        )
        """
    )


# ---------------------------------------------------------------------------
# u14 — pandas UDF over STRUCT input (Arrow complex-type transit)
# ---------------------------------------------------------------------------


@register(
    "u14_struct_pandas_udf",
    oracle="""
SELECT event_id,
       CAST((CAST(json_extract_string(props, '$.k') AS INT) * 31
             + length(event_type)) % 997 AS BIGINT) AS score
FROM events WHERE event_id % 50 = 7
""",
    tags=("udf", "pandas", "arrow", "struct", "events"),
    doc="Pandas UDF over a STRUCT argument — the Arrow COMPLEX-TYPE "
    "transit lane: the props JSON parses JVM-side (from_json, so the "
    "parse never pays the Python tax) into a typed struct, and the "
    "scalar pandas UDF receives the struct column as a pandas "
    "DataFrame (Arrow struct arrays arrive as named columns, the "
    "contract every feature-dict scorer relies on) alongside a "
    "plain string column.  The scored value is integer-affine so "
    "the DuckDB oracle can verify the plumbing; the surface under "
    "test is the struct crossing the Arrow boundary, completing the "
    "UDF matrix's type axis (scalars: u02, arrays implicit in "
    "similarity ops, structs: here).",
)
def u14_struct_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("bigint")
    def score(meta: pd.DataFrame, etype: pd.Series) -> pd.Series:
        # struct column arrives as a DataFrame with one column per field
        return (meta["k"].astype("int64") * 31 + etype.str.len()) % 997

    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 50 == 7)
    meta = F.from_json("props", "k int").alias("meta")
    return e.select("event_id", score(meta, F.col("event_type")).alias("score"))


@register(
    "u15_array_return_pandas_udf",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tok
  FROM documents WHERE doc_id % 25 = 3
)
SELECT doc_id,
       CAST(len(tok) AS INT) AS n_toks,
       array_to_string(tok[1:3], '|') AS head3
FROM toks
""",
    tags=("udf", "pandas", "arrow", "array", "documents"),
    doc="Pandas UDF RETURNING an array — the other direction of the "
    "Arrow complex-type transit u14 pins for structs: a scalar "
    "pandas UDF tokenizes each document Python-side and returns "
    "``array<string>`` (list-of-string Arrow arrays crossing back "
    "into the JVM — the contract every Python tokenizer/chunker "
    "that feeds native explode/slice relies on), then NATIVE "
    "expressions consume the returned array (size, slice, "
    "concat_ws) so the gate proves the round-trip preserves "
    "element order and count.  The tokenizer is the same "
    "lowercase/non-alphanumeric-split t12 normalizes with, so the "
    "DuckDB oracle states it in pure SQL.  Keyed 1-in-25 sample: "
    "the lane under test is type transit, not throughput — the "
    "engine's production tokenizers stay JVM-side (t01/t06).",
)
def u15_array_return_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("array<string>")
    def tokenize(text: pd.Series) -> pd.Series:
        import re

        pat = re.compile(r"[^a-z0-9]+")
        return text.map(
            lambda s: [t for t in pat.split((s or "").lower()) if t]
        )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 3)
    toks = d.select("doc_id", tokenize(F.col("text")).alias("tok"))
    return toks.select(
        "doc_id",
        F.size("tok").cast("int").alias("n_toks"),
        F.concat_ws("|", F.slice("tok", 1, 3)).alias("head3"),
    )


@register(
    "u16_struct_return_pandas_udf",
    oracle=r"""
SELECT doc_id,
       CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_tokens,
       CAST(length(text) AS INT) AS n_chars,
       substr(text, 1, 8) AS head
FROM documents
WHERE doc_id % 25 = 11
""",
    tags=("udf", "pandas", "arrow", "struct", "documents"),
    doc="Pandas UDF RETURNING a struct — the remaining direction of "
    "the Arrow complex-type transit matrix (u14 takes a struct IN, "
    "u15 returns an array; this returns ``struct<...>`` as a "
    "pandas DataFrame whose columns become the struct's fields).  "
    "The profile struct (token count, char count, 8-char head) is "
    "re-derivable in pure SQL, and the gate consumes the RETURNED "
    "struct with native field access (.field projection), proving "
    "field names, order, and values survive the Arrow round-trip.  "
    "Keyed 1-in-25 sample: the lane under test is type transit — "
    "production profiling stays JVM-side (t01/t26).",
)
def u16_struct_return_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("struct<n_tokens:int, n_chars:int, head:string>")
    def profile(text: pd.Series) -> pd.DataFrame:
        import re

        ws = re.compile(r"\s+")
        return pd.DataFrame(
            {
                "n_tokens": text.map(lambda s: len(ws.split(s or ""))).astype(
                    "int32"
                ),
                "n_chars": text.str.len().astype("int32"),
                "head": text.str.slice(0, 8),
            }
        )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 11)
    p = d.select("doc_id", profile(F.col("text")).alias("p"))
    return p.select(
        "doc_id",
        F.col("p.n_tokens").alias("n_tokens"),
        F.col("p.n_chars").alias("n_chars"),
        F.col("p.head").alias("head"),
    )
