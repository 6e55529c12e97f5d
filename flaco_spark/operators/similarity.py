"""Similarity search over embedding columns (``array<float>``).

Two strategies:

- **Brute-force top-k** — the exactness baseline: broadcast the (small)
  query set against the candidate table, compute cosine map-side, then
  per-query top-k via :func:`topk_per_query` — a two-phase reduction
  (local per-partition top-k, then global top-k over the ≤ k×partitions
  survivors) so no single reducer ever holds a query's full candidate
  set.  At 100 TB the candidate side stays partitioned; only k rows
  per partition per query cross the second shuffle.
- **Sign-LSH bucketed** — the scale path: both sides bucket by the
  signs of a fixed sample of coordinates; the join is bucket-equi so
  each candidate row is compared against queries in its bucket only.

All vector math is JVM-side (``zip_with`` / ``aggregate`` higher-order
expressions) as deterministic IEEE-double LEFT-FOLDS (fixed
within-array evaluation order — see ``flaco_spark.functions.dot``),
so cosine values are bit-reproducible under any partitioning and the
DuckDB oracles mirror the identical operation sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flaco_spark.functions import cosine, norm, sign_lsh_bucket
from flaco_spark.inventory import register
from flaco_spark.localrel import local_relation
from flaco_spark.tables import table

SIGN_DIMS = (1, 9, 17, 25, 33, 41, 49, 57)


def spread_to_cores(candidates: DataFrame) -> DataFrame:
    """Ensure the candidate side has at least core-count partitions.

    The score step amplifies work per candidate row (|queries| cosine
    evaluations each), so a candidate table that arrives in fewer
    partitions than the cluster has cores serializes that compute —
    locally a single small parquet file lands in ONE task and the
    whole O(n·q) scoring runs serially.  A table already at or above
    core parallelism (the 100 TB case) is left untouched: no shuffle
    is added where the scan is wide enough.
    """
    sc = candidates.sparkSession.sparkContext
    if candidates.rdd.getNumPartitions() < sc.defaultParallelism:
        return candidates.repartition(sc.defaultParallelism)
    return candidates


def topk_per_query(
    scored: DataFrame,
    query_col: str,
    order: list,
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Exact per-query top-k as a two-phase reduction.

    Phase 1 windows over (query, input-partition): each reducer owns
    one partition's candidates for one query, so the first shuffle
    spreads a query's rows over ALL reducers instead of funneling them
    to one (the single ``partitionBy(query)`` window is the 100 TB
    scale-killer this replaces).  Because any global top-k row is also
    in its own partition's local top-k, pruning to k per (query,
    partition) is lossless.  Phase 2 ranks the ≤ k×partitions
    survivors per query — a shuffle of k×P rows, not |candidates|.
    """
    local_w = W.partitionBy(query_col, "_pid").orderBy(*order)
    pruned = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrn", F.row_number().over(local_w))
        .filter(F.col("_lrn") <= k)
        .drop("_pid", "_lrn")
    )
    final_w = W.partitionBy(query_col).orderBy(*order)
    return pruned.withColumn(rank_col, F.row_number().over(final_w)).filter(
        F.col(rank_col) <= k
    )


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for every query vector."""
    cand = spread_to_cores(candidates).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")))
    )
    return topk_per_query(
        scored, "query_id", [F.desc("cos_sim"), F.asc("neighbor_id")], k
    ).select("query_id", "neighbor_id", "cos_sim", "rn")


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = SIGN_DIMS,
) -> DataFrame:
    """Approximate top-k: candidates compared only within the query's
    sign-LSH bucket."""
    cand = spread_to_cores(candidates).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
        sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
        sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    scored = (
        cand.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")))
    )
    return topk_per_query(
        scored, "query_id", [F.desc("cos_sim"), F.asc("neighbor_id")], k
    ).select("query_id", "neighbor_id", "cos_sim", "rn")


def _dot_sql(a: str, b: str) -> str:
    """DuckDB SQL for a dot product as an IEEE-double LEFT-FOLD over
    element order — the exact operation sequence of
    ``flaco_spark.functions.dot`` (``F.aggregate`` with 0.0 init), so
    the two engines produce bit-identical doubles (IEEE 754 semantics
    are sequence-deterministic; verified over the full embeddings
    fixture)."""
    return (
        "list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, 64), i -> {a}[i] * {b}[i])), "
        "(acc, x) -> acc + x)"
    )


_NORMS_SQL = """
norms AS (
  SELECT vec_id,
         round(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                                             list_transform(v, x -> x * x)),
                                (acc, x) -> acc + x)), 6) AS nrm
  FROM pts
)
"""


@register(
    "e01_knn_bruteforce",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_NORMS_SQL},
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_dot_sql('q.v', 'c.v')}, 8) AS dotp
  FROM pts q
  JOIN pts c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         d.dotp / (nq.nrm * nc.nrm) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY d.query_id
                            ORDER BY d.dotp / (nq.nrm * nc.nrm) DESC, d.neighbor_id) AS rn
  FROM dots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.neighbor_id = nc.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rn FROM scored WHERE rn <= 10
""",
    tags=("similarity", "embedding", "topk"),
    doc="Brute-force cosine top-10 neighbors for query vectors "
    "(vec_id < 5) — the ANN correctness baseline.",
)
def e01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return brute_force_topk(e, e.filter(F.col("vec_id") < 5), k=10)


@register(
    "e02_embedding_stats",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_NORMS_SQL}
SELECT p.label,
       COUNT(*) AS n_vectors,
       CAST(SUM(CAST(n.nrm AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_norm,
       CAST(MIN(CAST(n.nrm AS DECIMAL(18,6))) AS DOUBLE) AS min_norm,
       CAST(MAX(CAST(n.nrm AS DECIMAL(18,6))) AS DOUBLE) AS max_norm
FROM pts p JOIN norms n ON p.vec_id = n.vec_id
GROUP BY p.label
""",
    tags=("similarity", "embedding", "agg"),
    doc="Per-label embedding norm statistics (exact-decimal "
    "order-independent aggregation).",
)
def e02_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    dec = "decimal(18,6)"
    nrm = norm(F.col("embedding")).cast(dec)
    return (
        e.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            (F.sum("nrm").cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_norm"),
            F.min("nrm").cast("double").alias("min_norm"),
            F.max("nrm").cast("double").alias("max_norm"),
        )
    )


@register(
    "e03_ann_sign_lsh",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
bucketed AS (
  SELECT vec_id, v,
         (CASE WHEN v[1]  > 0 THEN 1   ELSE 0 END
        + CASE WHEN v[9]  > 0 THEN 2   ELSE 0 END
        + CASE WHEN v[17] > 0 THEN 4   ELSE 0 END
        + CASE WHEN v[25] > 0 THEN 8   ELSE 0 END
        + CASE WHEN v[33] > 0 THEN 16  ELSE 0 END
        + CASE WHEN v[41] > 0 THEN 32  ELSE 0 END
        + CASE WHEN v[49] > 0 THEN 64  ELSE 0 END
        + CASE WHEN v[57] > 0 THEN 128 ELSE 0 END) AS bucket
  FROM pts
),
{_NORMS_SQL},
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_dot_sql('q.v', 'c.v')}, 8) AS dotp
  FROM bucketed q
  JOIN bucketed c ON q.bucket = c.bucket AND q.vec_id < 25 AND c.vec_id <> q.vec_id
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         d.dotp / (nq.nrm * nc.nrm) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY d.query_id
                            ORDER BY d.dotp / (nq.nrm * nc.nrm) DESC, d.neighbor_id) AS rn
  FROM dots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.neighbor_id = nc.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rn FROM scored WHERE rn <= 3
""",
    tags=("similarity", "embedding", "lsh", "topk"),
    doc="Sign-LSH approximate nearest neighbors: top-3 within the "
    "query's bucket, for query vectors vec_id < 25.",
)
def e03_ann_sign_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return lsh_topk(e, e.filter(F.col("vec_id") < 25), k=3)


# ---------------------------------------------------------------------------
# e04 — IVF-style ANN (coarse quantizer + probed cells)
# ---------------------------------------------------------------------------

IVF_SEED_MOD = 97  # deterministic "training": seeds are vec_id % 97 == 3
# Bounded-codebook cap: only the FIRST 256 seed ids are ever selected
# (vec_id < 97*256+3), so the coarse-quantizer cell count and the PQ
# codebook stay k<=256 at ANY corpus size — the PQ contract (8-bit
# codes) and the broadcast-validity contract for IVF.  At every test
# scale (max vec_id 19 999) the cap never bites, so oracle hashes are
# unchanged; at 10x-shifted probe scale it is what keeps the encode
# join linear instead of n x (n/97).
SEED_ID_CAP = IVF_SEED_MOD * 256 + 3
IVF_NPROBE = 2


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = IVF_SEED_MOD,
) -> DataFrame:
    """IVF approximate top-k.

    Coarse quantizer: a deterministic seed subset
    (``vec_id % seed_mod == 3`` — at 100 TB this would be a KMeans
    fit, but the assign/probe plumbing is identical) is broadcast;
    every vector is assigned to the seed with the highest cosine (its
    *cell*).  Queries probe their ``nprobe`` nearest cells; candidates
    are compared only within probed cells.  Shuffle cost: one
    bucket-equi join on cell id (the seed cross-product is map-side
    via broadcast).

    ``seed_mod`` sets the cell count (~n/seed_mod).  Assignment cost
    is n × cells, so pick seed_mod ≈ √n to keep both the assign stage
    and the per-cell candidate lists balanced (nlist ≈ √n, the
    standard IVF sizing); the default matches the registered
    oracle-checked query at sf0.01.
    """
    seeds = candidates.filter(
        ((F.col(id_col) % seed_mod) == 3)
        & (F.col(id_col) < seed_mod * 256 + 3)
    ).select(
        F.col(id_col).alias("seed_id"),
        F.col(vec_col).alias("sv"),
        norm(F.col(vec_col)).alias("sn"),
    )

    def assign(df: DataFrame, prefix: str, keep: int) -> DataFrame:
        """Rank seeds per vector by cosine; keep the top ``keep`` cells."""
        scored = (
            df.select(
                F.col(id_col).alias(f"{prefix}_id"),
                F.col(vec_col).alias(f"{prefix}v"),
                norm(F.col(vec_col)).alias(f"{prefix}n"),
            )
            .crossJoin(F.broadcast(seeds))
            .withColumn(
                "seed_cos",
                cosine(F.col(f"{prefix}v"), F.col("sv"), F.col(f"{prefix}n"), F.col("sn")),
            )
        )
        w = W.partitionBy(f"{prefix}_id").orderBy(F.desc("seed_cos"), F.asc("seed_id"))
        return (
            scored.withColumn("cell_rank", F.row_number().over(w))
            .filter(F.col("cell_rank") <= keep)
            .select(f"{prefix}_id", f"{prefix}v", f"{prefix}n", F.col("seed_id").alias("cell"))
        )

    cand = assign(spread_to_cores(candidates), "c", keep=1)
    q = assign(queries, "q", keep=nprobe)
    scored = (
        cand.join(F.broadcast(q), "cell")
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")))
    )
    return topk_per_query(
        scored, "q_id", [F.desc("cos_sim"), F.asc("c_id")], k
    ).select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("neighbor_id"),
        "cos_sim",
        "rn",
    )


_IVF_ORACLE = f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_NORMS_SQL},
seeds AS (
  SELECT p.vec_id AS seed_id, p.v AS sv, n.nrm AS sn
  FROM pts p JOIN norms n ON p.vec_id = n.vec_id
  WHERE p.vec_id % {IVF_SEED_MOD} = 3 AND p.vec_id < {SEED_ID_CAP}
),
seed_cos AS (
  SELECT p.vec_id, s.seed_id,
         round({_dot_sql('p.v', 's.sv')}, 8)
           / (n.nrm * s.sn) AS seed_cos
  FROM pts p
  JOIN norms n ON p.vec_id = n.vec_id
  CROSS JOIN seeds s
),
ranked_cells AS (
  SELECT vec_id, seed_id AS cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY seed_cos DESC, seed_id) AS cell_rank
  FROM seed_cos
),
cand AS (
  SELECT vec_id, cell FROM ranked_cells WHERE cell_rank = 1
),
probe AS (
  SELECT vec_id, cell FROM ranked_cells WHERE cell_rank <= {IVF_NPROBE} AND vec_id < 25
),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_dot_sql('qp.v', 'cp.v')}, 8) AS dotp
  FROM probe q
  JOIN cand c ON q.cell = c.cell AND c.vec_id <> q.vec_id
  JOIN pts qp ON q.vec_id = qp.vec_id
  JOIN pts cp ON c.vec_id = cp.vec_id
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         d.dotp / (nq.nrm * nc.nrm) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY d.query_id
                            ORDER BY d.dotp / (nq.nrm * nc.nrm) DESC, d.neighbor_id) AS rn
  FROM dots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.neighbor_id = nc.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rn FROM scored WHERE rn <= 3
"""


@register(
    "e04_ann_ivf",
    oracle=_IVF_ORACLE,
    tags=("similarity", "embedding", "ivf", "topk"),
    doc="IVF approximate nearest neighbors: vectors assigned to their "
    "nearest coarse-quantizer cell, queries (vec_id < 25) probe their "
    "2 nearest cells, top-3 within probed cells.",
)
def e04_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.filter(F.col("vec_id") < 25), k=3)


# ---------------------------------------------------------------------------
# e06 — LSH recall vs the exact baseline (self-measuring ANN quality)
# ---------------------------------------------------------------------------


@register(
    "e06_lsh_recall",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_NORMS_SQL},
bucketed AS (
  SELECT vec_id,
         (CASE WHEN v[1]  > 0 THEN 1   ELSE 0 END
        + CASE WHEN v[9]  > 0 THEN 2   ELSE 0 END
        + CASE WHEN v[17] > 0 THEN 4   ELSE 0 END
        + CASE WHEN v[25] > 0 THEN 8   ELSE 0 END
        + CASE WHEN v[33] > 0 THEN 16  ELSE 0 END
        + CASE WHEN v[41] > 0 THEN 32  ELSE 0 END
        + CASE WHEN v[49] > 0 THEN 64  ELSE 0 END
        + CASE WHEN v[57] > 0 THEN 128 ELSE 0 END) AS bucket
  FROM pts
),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_dot_sql('q.v', 'c.v')}, 8) AS dotp
  FROM pts q
  JOIN pts c ON q.vec_id < 25 AND c.vec_id <> q.vec_id
),
cos AS (
  SELECT d.query_id, d.neighbor_id, d.dotp / (nq.nrm * nc.nrm) AS cos_sim
  FROM dots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.neighbor_id = nc.vec_id
),
exact3 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM cos) t WHERE rn <= 3
),
lsh3 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT c.query_id, c.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY c.query_id
                              ORDER BY c.cos_sim DESC, c.neighbor_id) AS rn
    FROM cos c
    JOIN bucketed bq ON c.query_id = bq.vec_id
    JOIN bucketed bc ON c.neighbor_id = bc.vec_id AND bq.bucket = bc.bucket) t
  WHERE rn <= 3
)
SELECT e.query_id,
       COUNT(*) AS n_exact,
       COUNT(l.neighbor_id) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM exact3 e
LEFT JOIN lsh3 l ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
GROUP BY e.query_id
""",
    tags=("similarity", "embedding", "lsh", "recall", "evidence"),
    doc="Self-measuring ANN quality: per-query recall@3 of the "
    "sign-LSH index (e03) against the exact brute-force top-3 (e01 "
    "machinery), computed as one query — the evidence an ANN "
    "deployment needs before trusting the approximate path.  Both "
    "rankings reuse the engine's own operators; the oracle recomputes "
    "both from scratch in SQL.",
)
def e06_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 25)
    exact = brute_force_topk(e, q, k=3).select("query_id", "neighbor_id")
    approx = lsh_topk(e, q, k=3).select("query_id", "neighbor_id").withColumn(
        "hit", F.lit(1)
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hit").alias("n_hits"),
            (F.count("hit").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "recall"
            ),
        )
    )


# ---------------------------------------------------------------------------
# e05 — per-label centroids (the reduce step of a KMeans-style fit)
# ---------------------------------------------------------------------------


@register(
    "e05_label_centroids",
    oracle="""
WITH pts AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
dims AS (
  SELECT label, g.i AS dim, CAST(v[g.i] AS DECIMAL(18,8)) AS x
  FROM pts, generate_series(1, 64) AS g(i)
)
SELECT label,
       CAST(dim AS INT) AS dim,
       COUNT(*) AS n,
       CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS centroid_val
FROM dims
WHERE dim <= 8
GROUP BY label, dim
""",
    tags=("similarity", "embedding", "centroid", "agg"),
    doc="Per-label centroid coordinates (dims 1-8): posexplode the "
    "vectors map-side, exact-decimal mean per (label, dim) — the "
    "distributed reduce step of a KMeans-style fit, one shuffle of "
    "|labels|x|dims| partial sums.",
)
def e05_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    dec = "decimal(18,8)"
    dims = e.select(
        "label",
        F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "xf"),
    ).select(
        "label",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("xf").cast("double").cast(dec).alias("x"),
    )
    return dims.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("x").cast("double") / F.count(F.lit(1)).cast("double")).alias("centroid_val"),
    )


# ---------------------------------------------------------------------------
# e07 — one Lloyd (KMeans) iteration: assign + centroid recompute
# ---------------------------------------------------------------------------


@register(
    "e07_kmeans_iteration",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_NORMS_SQL},
seeds AS (
  SELECT p.vec_id AS seed_id, p.v AS sv, n.nrm AS sn
  FROM pts p JOIN norms n ON p.vec_id = n.vec_id
  WHERE p.vec_id % {IVF_SEED_MOD} = 3 AND p.vec_id < {SEED_ID_CAP}
),
seed_cos AS (
  SELECT p.vec_id, s.seed_id,
         round({_dot_sql('p.v', 's.sv')}, 8)
           / (n.nrm * s.sn) AS seed_cos
  FROM pts p
  JOIN norms n ON p.vec_id = n.vec_id
  CROSS JOIN seeds s
),
assigned AS (
  SELECT vec_id, seed_id AS cell FROM (
    SELECT vec_id, seed_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY seed_cos DESC, seed_id) AS rnk
    FROM seed_cos) t WHERE rnk = 1
),
dims AS (
  SELECT a.cell, g.i AS dim, CAST(p.v[g.i] AS DECIMAL(18,8)) AS x
  FROM assigned a JOIN pts p ON a.vec_id = p.vec_id,
       generate_series(1, 8) AS g(i)
)
SELECT cell,
       CAST(dim AS INT) AS dim,
       COUNT(*) AS n_members,
       CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS centroid_val
FROM dims
GROUP BY cell, dim
""",
    tags=("similarity", "embedding", "kmeans", "iterative", "agg"),
    doc="One full Lloyd/KMeans iteration, distributed: every vector "
    "assigns to its nearest seed by cosine (broadcast seeds, map-side "
    "scoring, per-vector top-1), then centroids recompute as the "
    "exact-decimal per-(cell, dim) mean — upgrading e04's 'seeds "
    "stand in for a KMeans fit' into the actual fit step.  Iterating "
    "this query IS distributed KMeans; each round costs one "
    "|vectors|-row shuffle keyed by cell.  Centroid dims 1-8 "
    "reported.",
)
def e07_kmeans_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    seeds = e.filter(
        ((F.col("vec_id") % IVF_SEED_MOD) == 3) & (F.col("vec_id") < SEED_ID_CAP)
    ).select(
        F.col("vec_id").alias("seed_id"),
        F.col("embedding").alias("sv"),
        norm(F.col("embedding")).alias("sn"),
    )
    # MAP-SIDE argmax over a one-row broadcast seed array (same device
    # and same (cos DESC, seed ASC) tie-break as e10/e15) — the old
    # row_number window shuffled |pts|·k scored rows for the rank.
    seed_arr = seeds.agg(
        F.collect_list(F.struct("seed_id", "sv", "sn")).alias("cents")
    )
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                (
                    -cosine(F.col("v"), c["sv"], F.col("vn"), c["sn"])
                ).alias("negcos"),
                c["seed_id"].alias("seed_id"),
            ),
        )
    )
    assigned = (
        e.select(
            "vec_id",
            F.col("embedding").alias("v"),
            norm(F.col("embedding")).alias("vn"),
        )
        .crossJoin(F.broadcast(seed_arr))
        .withColumn("best", best)
        .select("vec_id", F.col("best.seed_id").alias("cell"), "v")
    )
    dims = assigned.select(
        "cell", F.posexplode(F.slice("v", 1, 8)).alias("pos", "xf")
    ).select(
        "cell",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("xf").cast("double").cast("decimal(18,8)").alias("x"),
    )
    return dims.groupBy("cell", "dim").agg(
        F.count(F.lit(1)).alias("n_members"),
        (F.sum("x").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "centroid_val"
        ),
    )


# ---------------------------------------------------------------------------
# kmeans_fit — full distributed KMeans (iterated Lloyd steps)
# ---------------------------------------------------------------------------


def kmeans_fit(
    vectors: DataFrame,
    k_seed_mod: int = IVF_SEED_MOD,
    max_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """Distributed KMeans via iterated Lloyd steps (e07's single step,
    looped to convergence) under cosine distance.

    Per iteration: broadcast current centroids → every vector assigns
    to its nearest centroid map-side (the only |vectors|-sized work)
    → centroids recompute as per-(cell, dim) means in one shuffle
    keyed by cell.  The iteration count is a small driver-side loop —
    the same driver-coordinated pattern as d09's label propagation;
    each round is one job and centroids stay centroid-count-sized.
    k must be BOUNDED for the broadcast to be valid: a production fit
    fixes k ≤ ~10^5 regardless of table size.  The k_seed_mod rule
    used in tests grows |seeds| with the table — a deterministic
    test-data convenience only, not the scale contract.

    Returns (assignments DataFrame, per-iteration mean distances).
    The mean assign-distance sequence is the convergence evidence:
    Lloyd's algorithm guarantees it non-increasing (tested in
    ``test_kmeans_fit_inertia_monotone``).

    Initial seeds mirror e04/e07's deterministic ``vec_id % mod == 3``
    rule so the first iteration equals e07 exactly.
    """
    from flaco_spark.cachepool import release_caches

    # Release-on-entry (cachepool protocol): drain predecessors' live
    # caches so back-to-back invocations (bench best-of-N loops,
    # scale_probe sequences) don't accumulate executor-memory pins.
    release_caches()
    pts = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    pts = pts.withColumn("vn", norm(F.col("v")))
    centroids = (
        pts.filter(
            ((F.col("vec_id") % k_seed_mod) == 3)
            & (F.col("vec_id") < k_seed_mod * 256 + 3)
        )
        .select(
            F.col("vec_id").alias("cell"),
            F.col("v").alias("cv"),
            F.col("vn").alias("cn"),
        )
    )
    spark = vectors.sparkSession
    # pts is scanned once per Lloyd round — cache it so rounds 2..N
    # read executor memory, not parquet.  Probe the dimensionality
    # ONCE (it cannot change between rounds).
    pts = pts.persist()
    dim = len(pts.select("v").first()[0])
    history: list[float] = []
    assigned = None
    prev_assigned = None
    for _ in range(max_iters):
        # MAP-SIDE argmax over a one-row broadcast centroid array
        # (same device and same (sim DESC, cell ASC) tie-break as
        # e10/e15) — the old row_number window shuffled |pts|·k
        # scored rows carrying the full vectors every round.
        cent_arr = centroids.agg(
            F.collect_list(F.struct("cell", "cv", "cn")).alias("cents")
        )
        best = F.array_min(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    (
                        -cosine(F.col("v"), c["cv"], F.col("vn"), c["cn"])
                    ).alias("negsim"),
                    c["cell"].alias("cell"),
                ),
            )
        )
        assigned = (
            pts.crossJoin(F.broadcast(cent_arr))
            .withColumn("best", best)
            .select(
                "vec_id",
                F.col("best.cell").alias("cell"),
                "v",
                (-F.col("best.negsim")).alias("sim"),
            )
        ).persist()
        # mean cosine similarity of assignments (monotone non-decreasing);
        # this action also materializes the cache.
        history.append(
            assigned.agg(F.avg("sim")).collect()[0][0]
        )
        if prev_assigned is not None:
            prev_assigned.unpersist()
        prev_assigned = assigned
        # centroid update: elementwise mean per cell (one shuffle on cell).
        sums = assigned.groupBy("cell").agg(
            *[
                F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
                for i in range(dim)
            ],
            F.count(F.lit(1)).alias("n"),
        )
        # Collect the (bounded-k, see contract above) centroid table to
        # the driver and rebuild it as a literal DataFrame: this CUTS
        # the lineage each round, so round N's plan does not nest
        # rounds 1..N-1 (the superlinear-recompute trap of iterative
        # dataflows), mirroring connected_components' label handling.
        rows = sums.select(
            "cell",
            F.array(*[F.col(f"s{i}") / F.col("n") for i in range(dim)]).alias("cv"),
        ).collect()
        centroids = local_relation(
            spark, [(r["cell"], r["cv"]) for r in rows], "cell bigint, cv array<double>"
        ).withColumn("cn", norm(F.col("cv")))
    pts.unpersist()
    # The final assignment stays cached for the caller's terminal
    # action; register it with the shared release pool so the next
    # builder (or an explicit release_caches()) reclaims it.
    from flaco_spark.cachepool import register_cache

    register_cache(assigned)
    return assigned, history


# ---------------------------------------------------------------------------
# e08 — int8 scalar quantization of embeddings (storage compression)
# ---------------------------------------------------------------------------


@register(
    "e08_scalar_quantization",
    oracle="""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 200
),
scaled AS (
  SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0 AS scale
  FROM pts
),
q AS (
  SELECT vec_id, scale,
         list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv,
         v
  FROM scaled
)
SELECT vec_id,
       scale,
       CAST(qv[1] AS INT) AS q0,
       CAST(qv[2] AS INT) AS q1,
       CAST(qv[64] AS INT) AS q63,
       CAST(list_aggregate(list_transform(qv, x -> CAST(abs(x) <= 127 AS INT)),
                           'sum') AS INT) AS n_in_range
FROM q
""",
    tags=("similarity", "embedding", "quantization"),
    doc="Scalar int8 quantization of embeddings: per-vector scale = "
    "max|x|/127, elements map to round(x/scale) ∈ [-127, 127] — 4× "
    "storage compression (float32 → int8), the first thing a 100 TB "
    "embedding corpus does before indexing.  Rounding is the "
    "portable floor(x+0.5) form (engine round() half-mode differs "
    "between IEEE half-even and half-away; floor is floor "
    "everywhere).  Emits the scale, probe elements, and an in-range "
    "audit count.  Pure map-side lambda expressions, no shuffle.",
)
def e08_scalar_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = (
        F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    )
    pts = e.select("vec_id", v.alias("v"), scale.alias("scale"))
    qv = F.transform(
        F.col("v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("bigint")
    )
    out = pts.select("vec_id", "scale", qv.alias("qv"))
    return out.select(
        "vec_id",
        "scale",
        F.element_at("qv", 1).cast("int").alias("q0"),
        F.element_at("qv", 2).cast("int").alias("q1"),
        F.element_at("qv", 64).cast("int").alias("q63"),
        F.aggregate(
            F.transform(
                F.col("qv"), lambda x: F.when(F.abs(x) <= 127, 1).otherwise(0)
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("int")
        .alias("n_in_range"),
    )


# ---------------------------------------------------------------------------
# e09 — IVF recall vs the exact baseline (completes e06's evidence pair)
# ---------------------------------------------------------------------------

_IVF_RECALL_ORACLE = (
    _IVF_ORACLE.rsplit("SELECT query_id,", 1)[0]
    + """, ivf3 AS (
  SELECT query_id, neighbor_id FROM scored WHERE rn <= 3
),
ed AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round("""
    + _dot_sql("q.v", "c.v")
    + """, 8) AS dotp
  FROM pts q
  JOIN pts c ON q.vec_id < 25 AND c.vec_id <> q.vec_id
),
exact3 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT d.query_id, d.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY d.query_id
                              ORDER BY d.dotp / (nq.nrm * nc.nrm) DESC, d.neighbor_id) AS rn
    FROM ed d
    JOIN norms nq ON d.query_id = nq.vec_id
    JOIN norms nc ON d.neighbor_id = nc.vec_id) t
  WHERE rn <= 3
)
SELECT e.query_id,
       COUNT(*) AS n_exact,
       COUNT(i.neighbor_id) AS n_hits,
       CAST(COUNT(i.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM exact3 e
LEFT JOIN ivf3 i ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
GROUP BY e.query_id
"""
)


@register(
    "e09_ivf_recall",
    oracle=_IVF_RECALL_ORACLE,
    tags=("similarity", "embedding", "ivf", "recall", "evidence"),
    doc="Self-measuring IVF quality: per-query recall@3 of the IVF "
    "index (e04, nprobe=2) against the exact brute-force top-3 — "
    "the same in-engine evidence e06 provides for the sign-LSH "
    "index, so BOTH approximate paths carry a machine-checked "
    "quality row.  Lost neighbors are exactly those whose cell the "
    "probe set missed; tuning nprobe moves this number, and this "
    "query is how you watch it.",
)
def e09_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 25)
    exact = brute_force_topk(e, q, k=3).select("query_id", "neighbor_id")
    approx = ivf_topk(e, q, k=3).select("query_id", "neighbor_id").withColumn(
        "hit", F.lit(1)
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hit").alias("n_hits"),
            (F.count("hit").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "recall"
            ),
        )
    )


# ---------------------------------------------------------------------------
# e10 — kmeans_fit made oracle-checkable: 3 Lloyd iterations, unrolled
# ---------------------------------------------------------------------------

E10_ITERS = 3


def _e10_oracle() -> str:
    """Unroll E10_ITERS Lloyd iterations as DuckDB CTEs.

    Mirrors the Spark loop step-for-step: assignment by rounded cosine
    (dot rounded 8 dp, norms 6 dp — identical fold order both
    engines), centroid recompute as EXACT decimal(18,8) per-(cell,
    dim) means surfaced as double.  Because every intermediate is
    deterministic, the iteration composition is too — this is how an
    iterative algorithm becomes hash-matchable.
    """
    parts = [
        """
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),""",
        """
norms AS (
  SELECT vec_id,
         round(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                                             list_transform(v, x -> x * x)),
                                (acc, x) -> acc + x)), 6) AS nrm
  FROM pts
),""",
        f"""
c0 AS (
  SELECT p.vec_id AS cell, p.v AS cv, n.nrm AS cn
  FROM pts p JOIN norms n ON p.vec_id = n.vec_id
  WHERE p.vec_id % {IVF_SEED_MOD} = 3 AND p.vec_id < {SEED_ID_CAP}
),""",
    ]
    for it in range(E10_ITERS):
        dotp = _dot_sql("p.v", "c.cv")
        parts.append(f"""
s{it} AS (
  SELECT p.vec_id, c.cell,
         round({dotp}, 8) / (n.nrm * c.cn) AS sim
  FROM pts p JOIN norms n ON p.vec_id = n.vec_id CROSS JOIN c{it} c
),
a{it} AS (
  SELECT vec_id, cell, sim FROM (
    SELECT vec_id, cell, sim,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cell) AS rnk
    FROM s{it}) t WHERE rnk = 1
),""")
        if it < E10_ITERS - 1:
            parts.append(f"""
m{it} AS (
  SELECT a.cell, g.i AS dim,
         CAST(SUM(CAST(p.v[g.i] AS DECIMAL(18,8))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS cval
  FROM a{it} a JOIN pts p ON a.vec_id = p.vec_id,
       generate_series(1, 64) AS g(i)
  GROUP BY a.cell, g.i
),
c{it + 1} AS (
  SELECT cell,
         list(cval ORDER BY dim) AS cv,
         round(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(list(cval ORDER BY dim), x -> x * x)),
               (acc, x) -> acc + x)), 6) AS cn
  FROM m{it}
  GROUP BY cell
),""")
    last = E10_ITERS - 1
    parts.append(f"""
final AS (SELECT vec_id, cell, sim FROM a{last})
SELECT vec_id, CAST(cell AS BIGINT) AS cell, sim AS cos_sim FROM final""")
    return "".join(parts)


@register(
    "e10_kmeans_unrolled",
    oracle=_e10_oracle(),
    tags=("similarity", "embedding", "kmeans", "iterative"),
    doc=f"Distributed KMeans, {E10_ITERS} Lloyd iterations, "
    "ORACLE-CHECKED end to end (the iterative complement of e07's "
    "single step and the evidence query for ``kmeans_fit``): each "
    "round broadcasts the current centroids, assigns every vector "
    "map-side by rounded cosine, and recomputes centroids as "
    "exact-decimal per-(cell, dim) means — so every intermediate is "
    "engine-portable and the composition hash-matches a DuckDB "
    "unroll of the same three rounds.  Per round: one broadcast + "
    "one |vectors|-row shuffle keyed by cell; centroid state stays "
    "k-sized.  At 100 TB, k is bounded (≤ ~10^5) and rounds are "
    "driver-coordinated jobs, exactly like ``kmeans_fit``.",
)
def e10_kmeans_unrolled(
    spark: SparkSession, sf_dir: str, iters: int = E10_ITERS
) -> DataFrame:
    from flaco_spark.cachepool import register_cache, release_caches

    # Release-on-entry (cachepool protocol) — see kmeans_fit.
    release_caches()
    e = table(spark, sf_dir, "embeddings")
    # Every Lloyd round's crossJoin references pts: without a cache the
    # single terminal action re-scans the parquet and re-evaluates the
    # norm fold once per iteration.  Registered with the shared pool so
    # the next builder reclaims it after the caller's action.
    pts = register_cache(
        e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .withColumn("vn", norm(F.col("v")))
        .persist()
    )
    centroids = pts.filter(
        ((F.col("vec_id") % IVF_SEED_MOD) == 3) & (F.col("vec_id") < SEED_ID_CAP)
    ).select(
        F.col("vec_id").alias("cell"),
        F.col("v").alias("cv"),
        F.col("vn").alias("cn"),
    )
    assigned = None
    for it in range(iters):
        # MAP-SIDE argmax (the e15/p02 struct device): the centroid
        # frame folds to ONE k-sized array row, rides out as a
        # broadcast, and each vector picks min (-sim, cell) over the
        # array — the same (sim DESC, cell ASC) tie-break the old
        # row_number window used, but with zero shuffle.  The window
        # variant shuffled |pts|·k scored rows (each carrying the
        # 64-double vector) per round just to rank within vec_id —
        # the plan the doc string already promised not to have.
        cent_arr = centroids.agg(
            F.collect_list(F.struct("cell", "cv", "cn")).alias("cents")
        )
        best = F.array_min(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    (
                        -cosine(F.col("v"), c["cv"], F.col("vn"), c["cn"])
                    ).alias("negsim"),
                    c["cell"].alias("cell"),
                ),
            )
        )
        assigned = (
            pts.crossJoin(F.broadcast(cent_arr))
            .withColumn("best", best)
            .select(
                "vec_id",
                F.col("best.cell").alias("cell"),
                (-F.col("best.negsim")).alias("sim"),
                "v",
            )
        )
        if it < iters - 1:
            dims = assigned.select(
                "cell", F.posexplode("v").alias("pos", "xf")
            ).select(
                "cell",
                (F.col("pos") + 1).cast("int").alias("dim"),
                F.col("xf").cast("decimal(18,8)").alias("x"),
            )
            means = dims.groupBy("cell", "dim").agg(
                (
                    F.sum("x").cast("double") / F.count(F.lit(1)).cast("double")
                ).alias("cval")
            )
            centroids = (
                means.groupBy("cell")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "cval"))),
                        lambda s: s["cval"],
                    ).alias("cv")
                )
                .withColumn("cn", norm(F.col("cv")))
            )
    return assigned.select(
        "vec_id", F.col("cell").cast("bigint").alias("cell"), F.col("sim").alias("cos_sim")
    )


# ---------------------------------------------------------------------------
# e11 — product quantization encode (PQ: per-subspace codebook assignment)
# ---------------------------------------------------------------------------

PQ_M = 8       # subspaces (64 dims → 8 × 8-dim subvectors)
PQ_SUBDIM = 8


def _pq_d2_sql(a: str, b: str) -> str:
    """Squared L2 between two 8-dim sublists as the same IEEE-double
    left-fold the Spark side uses (see _dot_sql for the determinism
    argument)."""
    return (
        "list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, {PQ_SUBDIM}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        "(acc, x) -> acc + x)"
    )


def _pq_split(pts: DataFrame, id_in: str, id_out: str, vec_out: str) -> DataFrame:
    """Explode a vector table into its PQ subvectors: one row per
    (id, subspace m) with the contiguous 8-dim slice.  Shared by the
    e11/e12 builders so the expansion cannot drift between encode and
    search."""
    ms = F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m")
    return pts.select(F.col(id_in).alias(id_out), ms, "v").select(
        id_out,
        "m",
        F.expr(f"slice(v, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias(vec_out),
    )


# Shared oracle CTE fragments for the PQ family (e11 encode, e12 ADC
# search, e13 recall) — one definition so a fold/bounds fix cannot
# desynchronize an oracle from the operator it checks.
_PQ_BASE_CTES = f"""WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
subs AS (
  SELECT vec_id, g.m AS m, list_slice(v, g.m * {PQ_SUBDIM} + 1, (g.m + 1) * {PQ_SUBDIM}) AS sv
  FROM pts, generate_series(0, {PQ_M - 1}) AS g(m)
),
seeds AS (
  SELECT vec_id AS seed_id, g.m AS m,
         list_slice(v, g.m * {PQ_SUBDIM} + 1, (g.m + 1) * {PQ_SUBDIM}) AS ssv
  FROM pts, generate_series(0, {PQ_M - 1}) AS g(m)
  WHERE vec_id % {IVF_SEED_MOD} = 3 AND vec_id < {SEED_ID_CAP}
)"""

_PQ_CODES_CTE = f"""codes AS (
  SELECT vec_id, m, seed_id AS code FROM (
    SELECT s.vec_id, s.m, c.seed_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY round({_pq_d2_sql('s.sv', 'c.ssv')}, 8), c.seed_id) AS rnk
    FROM subs s JOIN seeds c ON s.m = c.m) t
  WHERE rnk = 1
)"""

_PQ_LUT_CTE = f"""lut AS (
  SELECT q.vec_id AS query_id, c.m, c.seed_id AS code,
         round({_pq_d2_sql('q.sv', 'c.ssv')}, 8) AS d2
  FROM subs q JOIN seeds c ON q.m = c.m
  WHERE q.vec_id < 5
)"""


@register(
    "e11_pq_encode",
    oracle=f"""
{_PQ_BASE_CTES},
scored AS (
  SELECT s.vec_id, s.m, c.seed_id,
         round({_pq_d2_sql('s.sv', 'c.ssv')}, 8) AS d2,
         ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                            ORDER BY round({_pq_d2_sql('s.sv', 'c.ssv')}, 8), c.seed_id) AS rnk
  FROM subs s JOIN seeds c ON s.m = c.m
)
SELECT vec_id, CAST(m AS INT) AS m, seed_id AS code, d2 AS sub_error
FROM scored WHERE rnk = 1
""",
    tags=("similarity", "embedding", "quantization", "pq"),
    doc="Product quantization encode (the FAISS IVFPQ building "
    "block): each vector splits into 8 contiguous 8-dim "
    "subvectors and each subvector independently assigns to its "
    "nearest codebook entry by squared L2 — compressing 64 floats "
    "to 8 small codes (32× at 256-entry codebooks) while distances "
    "remain approximable per-subspace (ADC lookup tables).  "
    "Codebooks here are the deterministic seed subvectors (the same "
    "vec_id % mod rule as e04/e07/e10 — a kmeans_fit per subspace "
    "is the production path, with the same BOUNDED-k broadcast "
    "contract).  Shape: the codebook is collected to the driver "
    "under the bounded-k contract (≤256 entries per subspace — a "
    "model parameter, not data) and shipped to executors as a "
    "LITERAL array, so assignment is one whole-stage-codegen map "
    "expression: subvector expansion (1→8 narrow rows) and the "
    "argmin over the codebook (array_min over (d2, seed_id) "
    "structs — the tie-break is the struct ordering) both run "
    "map-side.  ZERO shuffles: the encode is a pure scan→project, "
    "the shape a 100 TB encode pass needs.  Emitting per-subspace "
    "rows (not a cross-row error sum) keeps every value a "
    "fixed-order fold — hash-stable.",
)
def e11_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    pts = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    seeds = _pq_seeds_py(spark, sf_dir)
    if not seeds:
        # corpus without codebook (fewer than IVF_SEED_MOD+3 vectors
        # carrying the seed residue): the oracle's seed join is empty.
        return pts.select(
            "vec_id",
            F.lit(0).alias("m"),
            F.lit(0).cast("bigint").alias("code"),
            F.lit(0.0).alias("sub_error"),
        ).filter(F.lit(False))
    assigns = _pq_assigns_col(*_pq_codebook_literal(seeds))
    return pts.select(
        "vec_id", F.posexplode(assigns).alias("pos", "a")
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("m"),
        F.col("a")["seed_id"].alias("code"),
        F.col("a")["d2"].alias("sub_error"),
    )


def _pq_seeds_py(spark: SparkSession, sf_dir: str) -> list:
    """Collect the (bounded) codebook seeds as ``[(seed_id, vec64)]``
    sorted by id.

    The collect is k-sized by construction (``SEED_ID_CAP`` bounds the
    codebook at 256 entries regardless of corpus size — the 8-bit PQ
    code contract), mirroring how a production encoder ships trained
    centroids to executors as a broadcast model artifact rather than
    joining against them."""
    e = table(spark, sf_dir, "embeddings")
    rows = (
        e.filter(
            ((F.col("vec_id") % IVF_SEED_MOD) == 3)
            & (F.col("vec_id") < SEED_ID_CAP)
        )
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    return sorted(
        ((int(r["vec_id"]), [float(x) for x in r["v"]]) for r in rows)
    )


def _dbl_sql(x: float) -> str:
    """Exact double literal for Spark SQL: repr() is the shortest
    round-tripping decimal, and a correct parser (Java
    Double.parseDouble) maps it back to the identical binary64."""
    return repr(float(x)) + "D"


def _arr_sql(vals, leaf) -> str:
    if vals and isinstance(vals[0], list):
        return "array(" + ",".join(_arr_sql(v, leaf) for v in vals) + ")"
    return "array(" + ",".join(leaf(v) for v in vals) + ")"


def _lit_bigints(ids) -> "F.Column":
    """array<bigint> literal via one JVM parse (see _pq_codebook_literal)."""
    if not ids:
        return F.lit(list(ids)).cast("array<bigint>")
    return F.expr("array(" + ",".join(f"{int(i)}L" for i in ids) + ")")


def _lit_doubles(vals) -> "F.Column":
    """array<double> literal via one JVM parse, exact repr doubles."""
    if not vals:
        return F.lit(list(vals)).cast("array<double>")
    return F.expr("array(" + ",".join(_dbl_sql(v) for v in vals) + ")")


def _lit_vecs(vecs) -> "F.Column":
    """array<array<double>> literal via one JVM parse."""
    if not vecs:
        return F.lit(list(vecs)).cast("array<array<double>>")
    return F.expr(
        "CAST(" + _arr_sql([list(v) for v in vecs], _dbl_sql)
        + " AS array<array<double>>)"
    )


def _pq_codebook_literal(seeds: list):
    """Per-subspace literal columns from the collected seeds:
    ``ids_by_m`` — array<array<bigint>> — and ``vecs_by_m`` —
    array<array<array<double>>> (each a SINGLE Literal node, not an
    unrolled expression tree).  Explicit casts keep empty literals
    from carrying VOID element types into zip_with.

    Built by ONE JVM-side SQL parse per literal (F.expr over exact
    repr-round-trip doubles): F.lit over the same nested Python
    lists spent ~1.5 s per query launch converting element-by-element
    through py4j (measured; the parse is milliseconds) — identical
    Literal node either way."""
    ids = [[sid for sid, _ in seeds] for _ in range(PQ_M)]
    vecs = [
        [v[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM] for _, v in seeds]
        for m in range(PQ_M)
    ]
    if not seeds:
        return (
            F.lit(ids).cast("array<array<bigint>>"),
            F.lit(vecs).cast("array<array<array<double>>>"),
        )
    return (
        F.expr(
            "CAST(" + _arr_sql(ids, lambda i: f"{int(i)}L") + " AS array<array<bigint>>)"
        ),
        F.expr(
            "CAST(" + _arr_sql(vecs, _dbl_sql) + " AS array<array<array<double>>>)"
        ),
    )


def _pq_assigns_col(ids_by_m, vecs_by_m):
    """PQ assignment of ``F.col("v")`` as ONE map-side expression:
    array over m of struct(d2, seed_id, idx) — the argmin per
    subspace via ``array_min`` over (d2, seed_id) structs (struct
    ordering IS the oracle's ``ORDER BY d2, seed_id`` tie-break);
    ``idx`` is the 1-based codebook position for LUT addressing.
    Zero shuffles: encode is scan→project, the shape a 100 TB encode
    pass needs."""

    # The subspace index m is a LAMBDA dimension, not a Python unroll:
    # the old ``F.array(*[one(m) for m in range(PQ_M)])`` built the
    # whole argmin tree 8 times over (measured 2.0 s of py4j Column
    # construction + 1.0 s of analysis per query launch at PQ_M=8);
    # one nested-lambda tree is ~8x smaller, and evaluates the same
    # expressions with the same (d2, seed_id) tie-break per m.
    def per_m(mm):
        sv = F.slice(
            F.col("v"), (mm - F.lit(1)) * PQ_SUBDIM + F.lit(1), F.lit(PQ_SUBDIM)
        )
        cand_ids = F.element_at(ids_by_m, mm)
        cand_vecs = F.element_at(vecs_by_m, mm)
        return F.array_min(
            F.transform(
                F.sequence(F.lit(1), F.size(cand_ids)),
                lambda i: F.struct(
                    F.round(
                        F.aggregate(
                            F.zip_with(
                                sv,
                                F.element_at(cand_vecs, i),
                                lambda x, y: (x - y) * (x - y),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ),
                        8,
                    ).alias("d2"),
                    F.element_at(cand_ids, i).alias("seed_id"),
                    i.cast("int").alias("idx"),
                ),
            )
        )

    return F.transform(F.sequence(F.lit(1), F.lit(PQ_M)), per_m)


def _pq_queries_py(spark: SparkSession, sf_dir: str) -> list:
    """Collect the query vectors (vec_id < 5 — k-sized by contract)
    as ``[(query_id, vec64)]`` sorted by id."""
    e = table(spark, sf_dir, "embeddings")
    rows = (
        e.filter(F.col("vec_id") < 5)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    return sorted(
        ((int(r["vec_id"]), [float(x) for x in r["v"]]) for r in rows)
    )


def _pq_seeds_queries_py(spark: SparkSession, sf_dir: str) -> tuple[list, list]:
    """Both bounded model collects (codebook seeds AND query vectors)
    out of ONE scan job: the two predicates are pure expressions over
    vec_id, so one disjunctive collect replaces two back-to-back scan
    jobs (guide §1.2 — fewer passes; the split is re-derived in
    Python from the same predicates, values identical)."""
    e = table(spark, sf_dir, "embeddings")
    rows = (
        e.filter(
            (((F.col("vec_id") % IVF_SEED_MOD) == 3) & (F.col("vec_id") < SEED_ID_CAP))
            | (F.col("vec_id") < 5)
        )
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    both = sorted(
        ((int(r["vec_id"]), [float(x) for x in r["v"]]) for r in rows)
    )
    seeds = [(i, v) for i, v in both if i % IVF_SEED_MOD == 3 and i < SEED_ID_CAP]
    queries = [(i, v) for i, v in both if i < 5]
    return seeds, queries


def _spark_round(x: float, nd: int) -> float:
    """Bit-exact Python replica of Spark's ``round(double, nd)``:
    Spark rounds the SHORTEST-DECIMAL representation of the double
    (``BigDecimal.valueOf`` = ``Double.toString``) HALF_UP; Python's
    ``repr`` produces the same shortest decimal, so quantizing it
    HALF_UP yields the same double (0 mismatches over 40k random
    values incl. 1e-6 magnitudes, checked in
    ``test_spark_round_replica_matches_engine``).  Lets driver-side
    constant evaluation (LUTs, probe lists) match distributed
    expressions without paying Catalyst analysis of a 100k-node
    literal tree."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _py_d2(a: list, b: list) -> float:
    """round(L2², 8) as the same left-fold of IEEE doubles the
    Column expression and the DuckDB oracle perform."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return _spark_round(acc, 8)


def _py_norm(v: list) -> float:
    """round(sqrt(Σx²), 6) — the Python replica of norm()."""
    import math

    acc = 0.0
    for x in v:
        acc = acc + x * x
    return _spark_round(math.sqrt(acc), 6)


def _py_cosine(a: list, b: list, na: float, nb: float) -> float:
    """dot (rounded 8) / (na·nb) — the Python replica of cosine()."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return _spark_round(acc, 8) / (na * nb)


def _pq_lut_lit(spark: SparkSession, queries: list, seeds: list):
    """ADC lookup tables as one literal column, ``lut[q][m][idx]`` =
    round(L2²(query subvector, codebook entry), 8).

    Both operands are driver-known constants, so the |q|×8×|codebook|
    table (≤ 80 KiB at the 256-entry cap) is computed in plain Python
    with the bit-exact fold/rounding replicas and shipped as a SINGLE
    Literal — the model-artifact broadcast a production ADC engine
    does, with none of the Catalyst cost of a 100k-node constant
    expression tree."""
    vals = [
        [
            [
                _py_d2(
                    qv[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM],
                    sv[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM],
                )
                for _, sv in seeds
            ]
            for m in range(PQ_M)
        ]
        for _, qv in queries
    ]
    if not vals:
        return F.lit(vals).cast("array<array<array<double>>>")
    # One JVM-side parse instead of py4j element-by-element (see
    # _pq_codebook_literal) — same Literal, exact doubles.
    return F.expr(
        "CAST(" + _arr_sql(vals, _dbl_sql) + " AS array<array<array<double>>>)"
    )


def _pq_adc_col(lut_lit, qpos_col, idxs_col):
    """ADC distance of one (query, db-vector) pair: sum the 8 LUT
    entries addressed by the vector's stored code indices, in fixed
    m-order (the oracle's ``list(d2 ORDER BY m)`` fold), rounded 8."""
    lut_q = F.element_at(lut_lit, qpos_col)
    return F.round(
        F.aggregate(
            F.sequence(F.lit(1), F.lit(PQ_M)),
            F.lit(0.0),
            lambda acc, m: acc
            + F.element_at(F.element_at(lut_q, m), F.element_at(idxs_col, m)),
        ),
        8,
    )


# ---------------------------------------------------------------------------
# e12 — ADC search over PQ codes (asymmetric distance computation)
# ---------------------------------------------------------------------------


@register(
    "e12_pq_adc_search",
    oracle=f"""
{_PQ_BASE_CTES},
{_PQ_CODES_CTE},
{_PQ_LUT_CTE},
approx AS (
  SELECT l.query_id, co.vec_id AS neighbor_id,
         round(list_reduce(list_prepend(0.0::DOUBLE,
                 list(l.d2 ORDER BY l.m)), (acc, x) -> acc + x), 8) AS adc_d2
  FROM codes co JOIN lut l ON co.m = l.m AND co.code = l.code
  WHERE co.vec_id <> l.query_id
  GROUP BY l.query_id, co.vec_id
)
SELECT query_id, neighbor_id, adc_d2,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS rn
FROM approx
QUALIFY rn <= 5
""",
    tags=("similarity", "embedding", "pq", "adc", "topk"),
    doc="ADC search over PQ codes (how an IVFPQ index actually "
    "answers queries): per query, build the 8×|codebook| lookup "
    "table of squared L2s between the query's subvectors and every "
    "codebook entry (a ≤80 KiB constant, computed driver-side with "
    "bit-exact fold/round replicas and shipped as ONE literal), then "
    "score every database vector WITHOUT touching its floats: its "
    "approx distance is the sum of 8 LUT entries addressed by its "
    "stored code indices, folded in fixed m-order — hash-stable.  "
    "The encoded index (8 ints/vector) is persisted once and each "
    "query's scoring pass is a pure map over it; top-5 per query "
    "uses the same two-phase reduction as e01.  At 100 TB the codes "
    "table is the ONLY per-vector data read — 8 bytes a vector vs "
    "256 — which is the entire point of PQ.",
)
def e12_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    pts = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    seeds, queries = _pq_seeds_queries_py(spark, sf_dir)
    if not seeds or not queries:
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, adc_d2 double, rn int"
        )
    from flaco_spark.cachepool import register_cache, release_caches

    release_caches()
    idxs = _pq_assigns_col(*_pq_codebook_literal(seeds))["idx"]
    lut_lit = _pq_lut_lit(spark, queries, seeds)
    qmeta = F.array(
        *[
            F.struct(
                F.lit(qid).cast("bigint").alias("query_id"),
                F.lit(qi + 1).alias("qpos"),
            )
            for qi, (qid, _) in enumerate(queries)
        ]
    )
    # Persist the encoded index (8 ints/vector): the barrier keeps
    # Catalyst from collapsing projections and re-running the
    # 8×|codebook| argmin AFTER the per-query explode (|q|× the
    # encode work) — and a production IVFPQ serves queries from
    # materialized codes anyway.  It also resolves the idxs
    # extraction in its own Project: a generator (explode) in the
    # same projection strips the lambda-built struct field names.
    codes_wide = register_cache(
        pts.select("vec_id", idxs.alias("idxs")).persist()
    )
    scored = (
        codes_wide.select("vec_id", "idxs", F.explode(qmeta).alias("q"))
        .filter(F.col("vec_id") != F.col("q")["query_id"])
        .select(
            F.col("q")["query_id"].alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            _pq_adc_col(lut_lit, F.col("q")["qpos"], F.col("idxs")).alias(
                "adc_d2"
            ),
        )
    )
    return topk_per_query(
        scored, "query_id", [F.asc("adc_d2"), F.asc("neighbor_id")], 5
    ).select("query_id", "neighbor_id", "adc_d2", "rn")


# ---------------------------------------------------------------------------
# e13 — PQ recall evidence (ADC top-5 vs exact L2 top-5)
# ---------------------------------------------------------------------------


def _full_d2_sql(a: str, b: str) -> str:
    return (
        "list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, 64), i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        "(acc, x) -> acc + x)"
    )


@register(
    "e13_pq_recall",
    oracle=f"""
{_PQ_BASE_CTES},
{_PQ_CODES_CTE},
{_PQ_LUT_CTE},
adc5 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT l.query_id, co.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY l.query_id
                              ORDER BY round(list_reduce(list_prepend(0.0::DOUBLE,
                                        list(l.d2 ORDER BY l.m)), (acc, x) -> acc + x), 8),
                                       co.vec_id) AS rn
    FROM codes co JOIN lut l ON co.m = l.m AND co.code = l.code
    WHERE co.vec_id <> l.query_id
    GROUP BY l.query_id, co.vec_id) t
  WHERE rn <= 5
),
exact5 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY round({_full_d2_sql('q.v', 'c.v')}, 8), c.vec_id) AS rn
    FROM pts q JOIN pts c ON q.vec_id < 5 AND c.vec_id <> q.vec_id) t
  WHERE rn <= 5
)
SELECT e.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(a.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM exact5 e
LEFT JOIN adc5 a ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
""",
    tags=("similarity", "embedding", "pq", "recall", "evidence"),
    doc="Self-measuring PQ quality: per-query recall@5 of the ADC "
    "search (e12) against the exact L2 top-5 — completing the "
    "evidence triple (e06 sign-LSH, e09 IVF, e13 PQ) so every "
    "approximate index in the engine carries a machine-checked "
    "quality row.  Recall lost here is quantization error; growing "
    "the codebook (or a kmeans_fit codebook instead of seeds) moves "
    "this number, and this query is how you watch it.",
)
def e13_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    pts = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = pts.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    full_d2 = F.round(
        F.aggregate(
            F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        8,
    )
    scored = (
        spread_to_cores(pts)
        .select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("d2", full_d2)
    )
    exact = topk_per_query(
        scored, "query_id", [F.asc("d2"), F.asc("neighbor_id")], 5
    ).select("query_id", "neighbor_id")
    approx = (
        e12_pq_adc_search(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("hit").cast("bigint").alias("n_hits"),
            (F.count("hit").cast("double") / F.count(F.lit(1)).cast("double")).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# e14 — embedding drift: per-label centroid shift between cohorts
# ---------------------------------------------------------------------------

E14_DIMS = 8


@register(
    "e14_embedding_drift",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, label, vec_id % 2 AS cohort,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
dims AS (
  SELECT label, cohort, g.i AS dim, CAST(v[g.i] AS DECIMAL(18,8)) AS x
  FROM pts, generate_series(1, {E14_DIMS}) AS g(i)
),
means AS (
  SELECT label, cohort, dim,
         COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_val
  FROM dims GROUP BY label, cohort, dim
)
SELECT a.label, CAST(a.dim AS INT) AS dim,
       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       a.mean_val AS mean_a, b.mean_val AS mean_b,
       a.mean_val - b.mean_val AS shift
FROM means a JOIN means b
  ON a.label = b.label AND a.dim = b.dim AND a.cohort = 0 AND b.cohort = 1
""",
    tags=("similarity", "embedding", "drift", "monitoring"),
    doc="Embedding drift monitor: per-(label, dim) centroid shift "
    "between two interleaved cohorts (vec_id parity stands in for "
    "'last week vs this week') — the standing health check of any "
    "embedding pipeline: a nonzero shift on a dimension means the "
    "encoder, the upstream data mix, or the label semantics moved.  "
    "Exactness: per-cell means are exact-decimal sums with one double "
    "division, and the shift is a single IEEE subtraction — no "
    "cross-dim float accumulation to disagree on.  Scale: one "
    "|vectors|x{E14_DIMS}-row shuffle keyed by (label, cohort, dim) "
    "with map-side partial aggregation; output is "
    "|labels|x{E14_DIMS}-sized.",
)
def e14_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label",
        (F.col("vec_id") % 2).alias("cohort"),
        F.posexplode(
            F.slice(F.col("embedding").cast("array<double>"), 1, E14_DIMS)
        ).alias("pos", "xf"),
    ).select(
        "label",
        "cohort",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("xf").cast("decimal(18,8)").alias("x"),
    )
    means = dims.groupBy("label", "cohort", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("x").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_val"
        ),
    )
    a = means.filter(F.col("cohort") == 0).select(
        "label", "dim", F.col("n").alias("n_a"), F.col("mean_val").alias("mean_a")
    )
    b = means.filter(F.col("cohort") == 1).select(
        F.col("label").alias("label_b"),
        F.col("dim").alias("dim_b"),
        F.col("n").alias("n_b"),
        F.col("mean_val").alias("mean_b"),
    )
    return (
        a.join(b, (a.label == b.label_b) & (a.dim == b.dim_b))
        .select(
            "label",
            "dim",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            "mean_a",
            "mean_b",
            (F.col("mean_a") - F.col("mean_b")).alias("shift"),
        )
    )


# ---------------------------------------------------------------------------
# e15 — IVFPQ: coarse-cell probing + ADC scoring (the full FAISS path)
# ---------------------------------------------------------------------------


@register(
    "e15_ivfpq_search",
    oracle=f"""
{_PQ_BASE_CTES},
{_PQ_CODES_CTE},
{_PQ_LUT_CTE},
{_NORMS_SQL},
coarse AS (
  SELECT p.vec_id AS seed_id, p.v AS sv, n.nrm AS sn
  FROM pts p JOIN norms n ON p.vec_id = n.vec_id
  WHERE p.vec_id % {IVF_SEED_MOD} = 3 AND p.vec_id < {SEED_ID_CAP}
),
coarse_cos AS (
  SELECT p.vec_id, s.seed_id,
         round({_dot_sql('p.v', 's.sv')}, 8) / (n.nrm * s.sn) AS seed_cos
  FROM pts p JOIN norms n ON p.vec_id = n.vec_id CROSS JOIN coarse s
),
ranked_cells AS (
  SELECT vec_id, seed_id AS cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY seed_cos DESC, seed_id) AS cell_rank
  FROM coarse_cos
),
cand_cells AS (SELECT vec_id, cell FROM ranked_cells WHERE cell_rank = 1),
probe_cells AS (
  SELECT vec_id, cell FROM ranked_cells
  WHERE cell_rank <= {IVF_NPROBE} AND vec_id < 5
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM probe_cells q
  JOIN cand_cells c ON q.cell = c.cell AND c.vec_id <> q.vec_id
),
approx AS (
  SELECT l.query_id, co.vec_id AS neighbor_id,
         round(list_reduce(list_prepend(0.0::DOUBLE,
                 list(l.d2 ORDER BY l.m)), (acc, x) -> acc + x), 8) AS adc_d2
  FROM codes co
  JOIN lut l ON co.m = l.m AND co.code = l.code
  JOIN pairs pr ON pr.query_id = l.query_id AND pr.neighbor_id = co.vec_id
  GROUP BY l.query_id, co.vec_id
)
SELECT query_id, neighbor_id, adc_d2,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS rn
FROM approx
QUALIFY rn <= 5
""",
    tags=("similarity", "embedding", "ivf", "pq", "adc", "topk"),
    doc="IVFPQ — the composition that IS a production vector index "
    "(FAISS IndexIVFPQ): the coarse quantizer (e04's cell assignment) "
    "prunes the CANDIDATE SET to the query's probed cells, and PQ/ADC "
    "(e12's lookup tables) prunes the BYTES PER CANDIDATE to an "
    "8-byte code — multiplicative savings, which is why the "
    "combination and not either half is the 100 TB operating point.  "
    "Per query: nprobe cell-restricted pairs (bucket-equi join on "
    "cell), then 8 LUT lookups per surviving candidate, never the "
    "raw floats.  All distances fold in fixed m-order → hash-stable; "
    "the oracle unrolls the identical composition in SQL.",
)
def e15_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    pts = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    seeds, queries = _pq_seeds_queries_py(spark, sf_dir)
    if not seeds or not queries:
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, adc_d2 double, rn int"
        )

    # Coarse quantizer as literals; seed norms computed with the
    # bit-exact Python replica of norm() (same fold, same rounding),
    # so every float matches the oracle's.
    coarse_ids = _lit_bigints([sid for sid, _ in seeds])
    coarse_vecs = _lit_vecs([v for _, v in seeds])
    sn_vals = [_py_norm(v) for _, v in seeds]
    coarse_norms = _lit_doubles(sn_vals)

    def cell_structs(v_col, vn_col):
        """(−cos, cell) structs vs every coarse centroid — ascending
        struct order IS the oracle's ORDER BY seed_cos DESC, seed_id."""
        return F.transform(
            F.sequence(F.lit(1), F.lit(len(seeds))),
            lambda i: F.struct(
                (
                    -cosine(
                        v_col,
                        F.element_at(coarse_vecs, i),
                        vn_col,
                        F.element_at(coarse_norms, i),
                    )
                ).alias("negcos"),
                F.element_at(coarse_ids, i).alias("cell"),
            ),
        )

    # Probe cells per query: constants in, constants out — ranked in
    # Python with the same (-cos, seed_id) ordering the distributed
    # cell_structs sort uses.
    probe_rows = []
    for qi, (qid, qv) in enumerate(queries):
        qn = _py_norm(qv)
        ranked = sorted(
            (-_py_cosine(qv, sv, qn, sn), sid)
            for (sid, sv), sn in zip(seeds, sn_vals)
        )
        probe_rows.extend(
            (qid, sid, qi + 1) for _, sid in ranked[:IVF_NPROBE]
        )
    probe_df = local_relation(
        spark, probe_rows, "query_id bigint, cell bigint, qpos int"
    )

    # ONE corpus scan computes only the coarse cell (256 cosines,
    # map-side); the broadcast join against the nprobe (query, cell)
    # pairs PRUNES before the expensive step, so PQ encoding (the
    # 8×|codebook| argmin) runs on the few-percent of vectors that
    # sit in probed cells — the multiplicative IVF×PQ saving, in the
    # plan itself.  ADC then reads 8 LUT entries per candidate, never
    # the floats.  The candidate codes are persisted: without the
    # barrier Catalyst would collapse the projections and re-run the
    # argmin inside the ADC fold's lambda (8× per row).  Shuffle
    # surface: only the two-phase top-k.
    from flaco_spark.cachepool import register_cache, release_caches

    release_caches()
    lut_lit = _pq_lut_lit(spark, queries, seeds)
    idxs = _pq_assigns_col(*_pq_codebook_literal(seeds))["idx"]
    cells_only = pts.select(
        "vec_id",
        "v",
        F.array_min(cell_structs(F.col("v"), norm(F.col("v"))))["cell"].alias(
            "cell"
        ),
    )
    cand_codes = register_cache(
        cells_only.join(F.broadcast(probe_df), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qpos", "vec_id", idxs.alias("idxs"))
        .persist()
    )
    scored = cand_codes.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _pq_adc_col(lut_lit, F.col("qpos"), F.col("idxs")).alias("adc_d2"),
    )
    return topk_per_query(
        scored, "query_id", [F.asc("adc_d2"), F.asc("neighbor_id")], 5
    ).select("query_id", "neighbor_id", "adc_d2", "rn")


# ---------------------------------------------------------------------------
# e16 — reciprocal rank fusion (hybrid retrieval combiner)
# ---------------------------------------------------------------------------

RRF_K = 60  # the paper's constant (Cormack/Clarke/Buettcher 2009)


@register(
    "e16_rrf_fusion",
    oracle=f"""
{_PQ_BASE_CTES},
{_PQ_CODES_CTE},
{_PQ_LUT_CTE},
adc AS (
  SELECT l.query_id, co.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY l.query_id
                            ORDER BY round(list_reduce(list_prepend(0.0::DOUBLE,
                                      list(l.d2 ORDER BY l.m)), (acc, x) -> acc + x), 8),
                                     co.vec_id) AS rn
  FROM codes co JOIN lut l ON co.m = l.m AND co.code = l.code
  WHERE co.vec_id <> l.query_id
  GROUP BY l.query_id, co.vec_id
),
adc5 AS (SELECT query_id, neighbor_id, rn FROM adc WHERE rn <= 5),
{_NORMS_SQL},
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_dot_sql('q.v', 'c.v')}, 8) AS dotp
  FROM pts q
  JOIN pts c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
),
ex AS (
  SELECT query_id, neighbor_id, rn FROM (
    SELECT d.query_id, d.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY d.query_id
                              ORDER BY d.dotp / (nq.nrm * nc.nrm) DESC, d.neighbor_id) AS rn
    FROM dots d
    JOIN norms nq ON d.query_id = nq.vec_id
    JOIN norms nc ON d.neighbor_id = nc.vec_id) t
  WHERE rn <= 10
),
allp AS (
  SELECT query_id, neighbor_id FROM ex
  UNION
  SELECT query_id, neighbor_id FROM adc5
),
fused AS (
  SELECT a.query_id, a.neighbor_id,
         COALESCE(1.0 / ({RRF_K} + e.rn), 0.0)
           + COALESCE(1.0 / ({RRF_K} + d.rn), 0.0) AS rrf
  FROM allp a
  LEFT JOIN ex e ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  LEFT JOIN adc5 d ON a.query_id = d.query_id AND a.neighbor_id = d.neighbor_id
)
SELECT query_id, neighbor_id, rrf,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rn
FROM fused
QUALIFY rn <= 5
""",
    tags=("similarity", "fusion", "rrf", "topk", "embedding"),
    doc=f"Reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR "
    "2009) — the standard hybrid-retrieval combiner: two rankings of "
    "the same query set (here the exact-cosine top-10 and the PQ/ADC "
    f"top-5) fuse by rrf = Σ 1/({RRF_K}+rank), absent-from-a-list "
    "contributing 0; fused top-5 per query.  RRF needs only RANKS — "
    "never score calibration across heterogeneous retrievers — which "
    "is why it is the default fusion in production hybrid (lexical + "
    "vector) search.  Float discipline: each term is one exact "
    "integer-denominator division, the two-term sum has fixed "
    "operand order.  Physical shape: both input rankings are k-sized "
    "per query, so the fusion itself joins and windows over "
    "O(queries × k) rows — negligible at any corpus scale; the cost "
    "lives in the upstream retrievers, both already bounded.",
)
def e16_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    exact = brute_force_topk(e, e.filter(F.col("vec_id") < 5), k=10).select(
        "query_id", "neighbor_id", F.col("rn").alias("r1")
    )
    adc = e12_pq_adc_search(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rn").alias("r2")
    )
    fused = exact.join(adc, ["query_id", "neighbor_id"], "full").select(
        "query_id",
        "neighbor_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r1")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r2")), F.lit(0.0))
        ).alias("rrf"),
    )
    return topk_per_query(
        fused, "query_id", [F.desc("rrf"), F.asc("neighbor_id")], 5
    ).select("query_id", "neighbor_id", "rrf", "rn")


# ---------------------------------------------------------------------------
# e17 — prefix-dimension prefilter (Matryoshka-style coarse-to-fine ANN)
# ---------------------------------------------------------------------------

MRL_PREFIX_DIMS = 16
MRL_SHORTLIST = 20


@register(
    "e17_mrl_prefilter",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
pre AS (
  SELECT vec_id, v, list_slice(v, 1, {MRL_PREFIX_DIMS}) AS pv FROM pts
),
pnorms AS (
  SELECT vec_id,
         round(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                                             list_transform(pv, x -> x * x)),
                                (acc, x) -> acc + x)), 6) AS pn
  FROM pre
),
coarse AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(generate_series(1, {MRL_PREFIX_DIMS}),
                                i -> q.pv[i] * c.pv[i])),
               (acc, x) -> acc + x), 8) / (nq.pn * nc.pn) AS pcos
  FROM pre q
  JOIN pre c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
  JOIN pnorms nq ON q.vec_id = nq.vec_id
  JOIN pnorms nc ON c.vec_id = nc.vec_id
),
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY pcos DESC, neighbor_id) AS crn
    FROM coarse) t
  WHERE crn <= {MRL_SHORTLIST}
),
{_NORMS_SQL},
exact AS (
  SELECT s.query_id, s.neighbor_id,
         round({_dot_sql('q.v', 'c.v')}, 8) / (nq.nrm * nc.nrm) AS cos_sim
  FROM shortlist s
  JOIN pts q ON s.query_id = q.vec_id
  JOIN pts c ON s.neighbor_id = c.vec_id
  JOIN norms nq ON s.query_id = nq.vec_id
  JOIN norms nc ON s.neighbor_id = nc.vec_id
)
SELECT query_id, neighbor_id, cos_sim,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
FROM exact
QUALIFY rn <= 5
""",
    tags=("similarity", "embedding", "mrl", "prefilter", "topk"),
    doc=f"Coarse-to-fine ANN by PREFIX-dimension prefiltering — the "
    "retrieval pattern Matryoshka representation learning trains for "
    "(Kusupati et al., NeurIPS 2022): score all candidates on only "
    f"the first {MRL_PREFIX_DIMS} of 64 dimensions (4× less compute "
    f"and memory traffic per pair), shortlist the top-{MRL_SHORTLIST} "
    "per query, then re-rank the shortlist with FULL-dimension exact "
    "cosine for the final top-5.  The same two-phase economics as "
    "IVFPQ (e15) but with zero index build — the prefix IS the "
    "coarse representation — which is why MRL prefilters are the "
    "cheapest latency lever on embedding search.  Both phases reuse "
    "the engine's deterministic fold/round vector discipline; the "
    "fixture's embeddings are not MRL-trained, so the shortlist "
    "quality is whatever raw prefixes give — the CONTRACT (coarse "
    "shortlist → exact re-rank, hash-stable at every step) is what "
    "the gate pins.",
)
def e17_mrl_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    pre = F.slice(F.col("embedding").cast("array<double>"), 1, MRL_PREFIX_DIMS)
    cand = spread_to_cores(e).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
        pre.alias("cpv"),
    ).select(
        "neighbor_id", "cv", "cpv", norm(F.col("cv")).alias("cn"), norm(F.col("cpv")).alias("cpn")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
        pre.alias("qpv"),
    ).select(
        "query_id", "qv", "qpv", norm(F.col("qv")).alias("qn"), norm(F.col("qpv")).alias("qpn")
    )
    coarse = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("pcos", cosine(F.col("qpv"), F.col("cpv"), F.col("qpn"), F.col("cpn")))
    )
    shortlist = topk_per_query(
        coarse, "query_id", [F.desc("pcos"), F.asc("neighbor_id")], MRL_SHORTLIST, rank_col="crn"
    ).select(
        "query_id", "neighbor_id",
        cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("cos_sim"),
    )
    return topk_per_query(
        shortlist, "query_id", [F.desc("cos_sim"), F.asc("neighbor_id")], 5
    ).select("query_id", "neighbor_id", "cos_sim", "rn")


# ---------------------------------------------------------------------------
# e18 — binary (sign) quantization with Hamming shortlist + exact re-rank
# ---------------------------------------------------------------------------

BQ_SHORTLIST = 20


@register(
    "e18_binary_quantization",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
ham AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         len(list_filter(list_transform(generate_series(1, 64),
                                        i -> (q.v[i] > 0) <> (c.v[i] > 0)),
                         x -> x)) AS hamming
  FROM pts q
  JOIN pts c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
),
shortlist AS (
  SELECT query_id, neighbor_id, hamming FROM (
    SELECT query_id, neighbor_id, hamming,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY hamming, neighbor_id) AS crn
    FROM ham) t
  WHERE crn <= {BQ_SHORTLIST}
),
{_NORMS_SQL},
exact AS (
  SELECT s.query_id, s.neighbor_id, s.hamming,
         round({_dot_sql('q.v', 'c.v')}, 8) / (nq.nrm * nc.nrm) AS cos_sim
  FROM shortlist s
  JOIN pts q ON s.query_id = q.vec_id
  JOIN pts c ON s.neighbor_id = c.vec_id
  JOIN norms nq ON s.query_id = nq.vec_id
  JOIN norms nc ON s.neighbor_id = nc.vec_id
)
SELECT query_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming, cos_sim,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
FROM exact
QUALIFY rn <= 5
""",
    tags=("similarity", "embedding", "binary-quantization", "hamming", "topk"),
    doc="Binary (1-bit sign) quantization retrieval — the 32×-"
    "compression path modern vector stores ship as 'BQ': every "
    "vector reduces to its 64 sign bits, candidates shortlist by "
    f"HAMMING distance (pure integer agreement count — phase 1 "
    "involves no float at all), and the top-"
    f"{BQ_SHORTLIST} re-rank with full-precision exact cosine for "
    "the final top-5.  Completes the quantization ladder the engine "
    "demonstrates: float32 (e01) → int8 scalar (e08) → PQ 8-bit "
    "codes (e11/e12) → MRL prefix (e17) → 1-bit signs, each with "
    "the same two-phase shortlist+re-rank contract.  At scale the "
    "sign signatures pack to 8 bytes/vector and Hamming is a "
    "popcount over XOR (m04/m07's machinery); here the per-dim "
    "form keeps both engines on identical integer arithmetic.",
)
def e18_binary_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    cand = spread_to_cores(e).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    ).select("neighbor_id", "cv", norm(F.col("cv")).alias("cn"))
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    ).select("query_id", "qv", norm(F.col("qv")).alias("qn"))
    ham = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "hamming",
            F.size(
                F.filter(
                    F.zip_with(
                        F.col("qv"), F.col("cv"), lambda x, y: (x > 0) != (y > 0)
                    ),
                    lambda b: b,
                )
            ),
        )
    )
    shortlist = topk_per_query(
        ham, "query_id", [F.asc("hamming"), F.asc("neighbor_id")], BQ_SHORTLIST,
        rank_col="crn",
    ).select(
        "query_id", "neighbor_id", "hamming",
        cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("cos_sim"),
    )
    return topk_per_query(
        shortlist, "query_id", [F.desc("cos_sim"), F.asc("neighbor_id")], 5
    ).select(
        "query_id", "neighbor_id",
        F.col("hamming").cast("bigint").alias("hamming"), "cos_sim", "rn",
    )


# ---------------------------------------------------------------------------
# e19 — metadata-filtered vector search (filter-THEN-search)
# ---------------------------------------------------------------------------


@register(
    "e19_filtered_ann",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, label
  FROM embeddings
),
{_NORMS_SQL.strip()},
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
         round({_dot_sql('q.v', 'c.v')}, 8) AS dotp
  FROM pts q
  JOIN pts c ON q.vec_id < 25 AND c.vec_id <> q.vec_id AND c.label % 3 = 0
),
scored AS (
  SELECT d.query_id, d.neighbor_id, d.neighbor_label,
         d.dotp / (nq.nrm * nc.nrm) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY d.query_id
                            ORDER BY d.dotp / (nq.nrm * nc.nrm) DESC,
                                     d.neighbor_id) AS rn
  FROM dots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.neighbor_id = nc.vec_id
)
SELECT query_id, neighbor_id, neighbor_label, cos_sim, rn
FROM scored WHERE rn <= 3
""",
    tags=("similarity", "embedding", "filtered", "topk"),
    doc="Metadata-FILTERED vector search: top-3 cosine neighbors "
    "among vectors whose label passes the predicate (label % 3 = 0) "
    "— the shape every production retrieval system needs the moment "
    "queries carry an ACL, language, or freshness constraint.  The "
    "discipline is filter-THEN-search: the predicate lands in the "
    "candidate SCAN (Catalyst pushes it to parquet), so k survivors "
    "are guaranteed — where search-then-discard (post-filtering an "
    "unfiltered top-k) silently returns FEWER than k when the "
    "predicate is selective, the classic filtered-ANN bug.  Same "
    "two-phase top-k reduction as e01; with an IVF index the same "
    "predicate applies inside each probed list (e04 composes "
    "unchanged).  At 100 TB the filter multiplies throughput by its "
    "selectivity — the scan reads only matching row groups via "
    "pushdown.",
)
def e19_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    cand = spread_to_cores(pts.filter(F.col("label") % 3 == 0)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        norm(F.col("v")).alias("cn"),
        F.col("label").alias("neighbor_label"),
    )
    q = pts.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        norm(F.col("v")).alias("qn"),
    )
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim", cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
        )
    )
    return topk_per_query(
        scored, "query_id", [F.desc("cos_sim"), F.asc("neighbor_id")], 3
    ).select("query_id", "neighbor_id", "neighbor_label", "cos_sim", "rn")


# ---------------------------------------------------------------------------
# e20 — incremental index maintenance (frozen quantizer, delta encode)
# ---------------------------------------------------------------------------

E20_DELTA_BELOW = 100  # vec_id < 100 = the newly-arrived batch


@register(
    "e20_incremental_index",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_NORMS_SQL.strip()},
cseeds AS (
  SELECT p.vec_id AS seed_id, p.v AS sv, n.nrm AS sn
  FROM pts p JOIN norms n ON p.vec_id = n.vec_id
  WHERE p.vec_id % {IVF_SEED_MOD} = 3 AND p.vec_id < {SEED_ID_CAP}
    AND p.vec_id >= {E20_DELTA_BELOW}
),
cells AS (
  SELECT vec_id, seed_id AS list_id FROM (
    SELECT p.vec_id, s.seed_id,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
                              ORDER BY round({_dot_sql('p.v', 's.sv')}, 8)
                                       / (n.nrm * s.sn) DESC, s.seed_id) AS rnk
    FROM pts p JOIN norms n ON p.vec_id = n.vec_id CROSS JOIN cseeds s) t
  WHERE rnk = 1
),
subs AS (
  SELECT vec_id, g.m AS m,
         list_slice(v, g.m * {PQ_SUBDIM} + 1, (g.m + 1) * {PQ_SUBDIM}) AS sv
  FROM pts, generate_series(0, {PQ_M - 1}) AS g(m)
),
pseeds AS (
  SELECT vec_id AS seed_id, g.m AS m,
         list_slice(v, g.m * {PQ_SUBDIM} + 1, (g.m + 1) * {PQ_SUBDIM}) AS ssv
  FROM pts, generate_series(0, {PQ_M - 1}) AS g(m)
  WHERE vec_id % {IVF_SEED_MOD} = 3 AND vec_id < {SEED_ID_CAP}
    AND vec_id >= {E20_DELTA_BELOW}
),
codes AS (
  SELECT vec_id, m, seed_id AS code FROM (
    SELECT s.vec_id, s.m, c.seed_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY round({_pq_d2_sql('s.sv', 'c.ssv')}, 8),
                                       c.seed_id) AS rnk
    FROM subs s JOIN pseeds c ON s.m = c.m) t
  WHERE rnk = 1
),
enc AS (
  SELECT vec_id, string_agg(CAST(code AS VARCHAR), '-' ORDER BY m) AS pq_code
  FROM codes GROUP BY vec_id
)
SELECT c.vec_id,
       CASE WHEN c.vec_id < {E20_DELTA_BELOW} THEN 'delta' ELSE 'base' END AS origin,
       c.list_id, e.pq_code,
       COUNT(*) OVER (PARTITION BY c.list_id) AS list_size
FROM cells c JOIN enc e ON c.vec_id = e.vec_id
""",
    tags=("similarity", "ivf", "pq", "incremental", "embeddings"),
    doc="Incremental INDEX MAINTENANCE (d25's nightly-batch topology "
    "for the vector stack): a newly-arrived batch (vec_id < 100) "
    "joins an existing IVFPQ index whose quantizers were trained "
    "WITHOUT it — coarse seeds and PQ codebooks come from the base "
    "corpus only (the frozen-codebook contract: re-training on every "
    "delta would re-encode the whole index; freezing makes updates "
    "APPEND-ONLY, at the cost of drift e14 monitors).  Both cohorts "
    "encode through the same frozen literals, tagged base/delta, and "
    "the per-list occupancy is recomputed over the MERGED index — "
    "the updated manifest a serving tier reloads.  Encode stays one "
    "scan-project pass; the only shuffle is the occupancy window.  "
    "At 100 TB the delta encode cost is |batch|, never |index|.",
)
def e20_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "embeddings")
    pts = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    seed_rows = sorted(
        (r["vec_id"], r["v"])
        for r in pts.filter(
            ((F.col("vec_id") % IVF_SEED_MOD) == 3)
            & (F.col("vec_id") < SEED_ID_CAP)
            & (F.col("vec_id") >= E20_DELTA_BELOW)
        ).collect()
    )
    if not seed_rows:
        return spark.createDataFrame(
            [],
            "vec_id bigint, origin string, list_id bigint, pq_code string, "
            "list_size bigint",
        )
    coarse_ids = _lit_bigints([sid for sid, _ in seed_rows])
    coarse_vecs = _lit_vecs([v for _, v in seed_rows])
    coarse_norms = _lit_doubles([_py_norm(v) for _, v in seed_rows])
    cell = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.lit(len(seed_rows))),
            lambda i: F.struct(
                (
                    -cosine(
                        F.col("v"),
                        F.element_at(coarse_vecs, i),
                        norm(F.col("v")),
                        F.element_at(coarse_norms, i),
                    )
                ).alias("negcos"),
                F.element_at(coarse_ids, i).alias("cell"),
            ),
        )
    )["cell"]
    assigns = _pq_assigns_col(*_pq_codebook_literal(seed_rows))
    enc = pts.select(
        "vec_id",
        F.when(F.col("vec_id") < E20_DELTA_BELOW, "delta")
        .otherwise("base")
        .alias("origin"),
        cell.alias("list_id"),
        F.array_join(
            F.transform(assigns, lambda a: a["seed_id"].cast("string")), "-"
        ).alias("pq_code"),
    )
    wl = W.partitionBy("list_id")
    return enc.select(
        "vec_id",
        "origin",
        "list_id",
        "pq_code",
        F.count(F.lit(1)).over(wl).cast("bigint").alias("list_size"),
    )


# ---------------------------------------------------------------------------
# e22 — maximal marginal relevance (diversified re-ranking)
# ---------------------------------------------------------------------------

E22_SHORTLIST = 8  # round-1 exact top-k per query
E22_PICKS = 4      # diversified selections
E22_NQ = 5         # queries: vec_id < 5


def _e22_oracle() -> str:
    cand_cte = f"""
cand AS (
  SELECT query_id, neighbor_id, cos_sim AS rel FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round({_dot_sql('q.v', 'c.v')}, 8) / (nq.nrm * nc.nrm) AS cos_sim,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY round({_dot_sql('q.v', 'c.v')}, 8)
                                       / (nq.nrm * nc.nrm) DESC, c.vec_id) AS rn
    FROM pts q
    JOIN norms nq ON q.vec_id = nq.vec_id
    JOIN pts c ON c.vec_id <> q.vec_id
    JOIN norms nc ON c.vec_id = nc.vec_id
    WHERE q.vec_id < {E22_NQ}) t
  WHERE rn <= {E22_SHORTLIST}
),
sims AS (
  SELECT a.query_id, a.neighbor_id AS d1, b.neighbor_id AS d2,
         round({_dot_sql('pa.v', 'pb.v')}, 8) / (na.nrm * nb.nrm) AS sim
  FROM cand a
  JOIN cand b ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
  JOIN pts pa ON a.neighbor_id = pa.vec_id
  JOIN norms na ON a.neighbor_id = na.vec_id
  JOIN pts pb ON b.neighbor_id = pb.vec_id
  JOIN norms nb ON b.neighbor_id = nb.vec_id
)"""
    steps = ["""
sel1 AS (
  SELECT query_id, [neighbor_id] AS picks, neighbor_id AS pick,
         0.5 * rel - 0.5 * 0.0 AS score
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, neighbor_id) AS rn
        FROM cand) t
  WHERE rn = 1
)"""]
    for t in range(2, E22_PICKS + 1):
        steps.append(f"""
elig{t} AS (
  SELECT s.query_id, s.picks, c.neighbor_id, c.rel,
         MAX(CASE WHEN list_contains(s.picks, x.d2) THEN x.sim END) AS maxsim
  FROM sel{t - 1} s
  JOIN cand c ON c.query_id = s.query_id
             AND NOT list_contains(s.picks, c.neighbor_id)
  LEFT JOIN sims x ON x.query_id = c.query_id AND x.d1 = c.neighbor_id
  GROUP BY s.query_id, s.picks, c.neighbor_id, c.rel
),
sel{t} AS (
  SELECT query_id, list_append(picks, neighbor_id) AS picks,
         neighbor_id AS pick,
         0.5 * rel - 0.5 * COALESCE(maxsim, 0.0) AS score
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id
          ORDER BY 0.5 * rel - 0.5 * COALESCE(maxsim, 0.0) DESC,
                   neighbor_id) AS rn
        FROM elig{t}) t
  WHERE rn = 1
)""")
    union = "\n  UNION ALL\n  ".join(
        f"SELECT query_id, {t} AS step, pick AS picked_id, score FROM sel{t}"
        for t in range(1, E22_PICKS + 1)
    )
    return f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_NORMS_SQL.strip()},
{cand_cte},
{",".join(steps)}
SELECT query_id, CAST(step AS INT) AS step, picked_id, score
FROM ({union})
"""


@register(
    "e22_mmr_rerank",
    oracle=_e22_oracle(),
    tags=("similarity", "embedding", "mmr", "diversity", "rerank"),
    doc=f"Maximal marginal relevance (Carbonell/Goldstein 1998) — "
    "DIVERSIFIED re-ranking, the step between retrieval and "
    "presentation in every RAG/search stack: from each query's exact "
    f"top-{E22_SHORTLIST} shortlist, greedily select {E22_PICKS} "
    "results maximizing 0.5·relevance − 0.5·max-similarity-to-"
    "already-picked — near-duplicate results (which the embedding "
    "corpus has by construction) cannot occupy multiple slots.  The "
    "greedy loop is UNROLLED into per-step dataframe stages (q111's "
    "loop-vs-unrolling device, one window argmax per step over the "
    "per-query eligible set); the oracle unrolls identically, so "
    "hash-equality pins every selection AND its marginal score.  "
    "Scale: the shortlist is k-sized per query, so all MMR work "
    "after round 1 touches k×|queries| rows — the distributed cost "
    "is entirely in round 1's brute-force top-k (e01's two-phase "
    "shape); pairwise sims are computed only within shortlists.",
)
def e22_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from flaco_spark.cachepool import release_caches

    release_caches()  # drain-on-entry, the cachepool contract
    e = table(spark, sf_dir, "embeddings")
    pts = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cand = brute_force_topk(
        e, e.filter(F.col("vec_id") < E22_NQ), k=E22_SHORTLIST
    ).select("query_id", "neighbor_id", F.col("cos_sim").alias("rel"))
    cand = _persist_eager_sim(cand)
    pa = pts.select(F.col("vec_id").alias("d1"), F.col("v").alias("v1"))
    pb = pts.select(F.col("vec_id").alias("d2"), F.col("v").alias("v2"))
    a = cand.select("query_id", F.col("neighbor_id").alias("d1"))
    b = cand.select(F.col("query_id").alias("qb"), F.col("neighbor_id").alias("d2"))
    sims = (
        a.join(b, (a.query_id == b.qb) & (a.d1 != b.d2))
        .join(pa, "d1")
        .join(pb, "d2")
        .select(
            "query_id",
            "d1",
            "d2",
            cosine(
                F.col("v1"), F.col("v2"), norm(F.col("v1")), norm(F.col("v2"))
            ).alias("sim"),
        )
    )
    sims = _persist_eager_sim(sims)

    w1 = W.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("neighbor_id"))
    sel = (
        cand.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.array(F.col("neighbor_id")).alias("picks"),
            F.col("neighbor_id").alias("pick"),
            (F.lit(0.5) * F.col("rel") - F.lit(0.5) * F.lit(0.0)).alias("score"),
        )
    )
    out = [sel.select("query_id", F.lit(1).cast("int").alias("step"),
                      F.col("pick").alias("picked_id"), "score")]
    for t in range(2, E22_PICKS + 1):
        elig = (
            sel.select("query_id", "picks")
            .join(cand, "query_id")
            .filter(~F.array_contains(F.col("picks"), F.col("neighbor_id")))
            .join(
                sims.withColumnRenamed("d1", "neighbor_id"),
                ["query_id", "neighbor_id"],
                "left",
            )
            .groupBy("query_id", "picks", "neighbor_id", "rel")
            .agg(
                F.max(
                    F.when(
                        F.array_contains(F.col("picks"), F.col("d2")), F.col("sim")
                    )
                ).alias("maxsim")
            )
        )
        m = F.lit(0.5) * F.col("rel") - F.lit(0.5) * F.coalesce(
            F.col("maxsim"), F.lit(0.0)
        )
        wm = W.partitionBy("query_id").orderBy(m.desc(), F.asc("neighbor_id"))
        sel = (
            elig.withColumn("rn", F.row_number().over(wm))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                F.concat(F.col("picks"), F.array(F.col("neighbor_id"))).alias(
                    "picks"
                ),
                F.col("neighbor_id").alias("pick"),
                m.alias("score"),
            )
        )
        out.append(
            sel.select(
                "query_id",
                F.lit(t).cast("int").alias("step"),
                F.col("pick").alias("picked_id"),
                "score",
            )
        )
    res = out[0]
    for p in out[1:]:
        res = res.unionAll(p)
    return res


def _persist_eager_sim(df: DataFrame) -> DataFrame:
    """Materialize a small intermediate reused across MMR steps (the
    shortlist and its pairwise sims are k-by-|queries| sized — the
    persist prevents the 4-step loop from re-running round 1's
    brute-force top-k per step)."""
    from flaco_spark.cachepool import register_cache

    return register_cache(df.persist())


# ---------------------------------------------------------------------------
# e23 — cluster-balanced sampling (per-list quotas from the index)
# ---------------------------------------------------------------------------

E23_QUOTA = 3


@register(
    "e23_cluster_balanced_sample",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_NORMS_SQL.strip()},
cseeds AS (
  SELECT p.vec_id AS seed_id, p.v AS sv, n.nrm AS sn
  FROM pts p JOIN norms n ON p.vec_id = n.vec_id
  WHERE p.vec_id % {IVF_SEED_MOD} = 3 AND p.vec_id < {SEED_ID_CAP}
),
cells AS (
  SELECT vec_id, seed_id AS list_id FROM (
    SELECT p.vec_id, s.seed_id,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
                              ORDER BY round({_dot_sql('p.v', 's.sv')}, 8)
                                       / (n.nrm * s.sn) DESC, s.seed_id) AS rnk
    FROM pts p JOIN norms n ON p.vec_id = n.vec_id CROSS JOIN cseeds s) t
  WHERE rnk = 1
)
SELECT list_id, vec_id, CAST(pick_rank AS INT) AS pick_rank
FROM (
  SELECT list_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY list_id
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
           AS pick_rank
  FROM cells) t
WHERE pick_rank <= {E23_QUOTA}
""",
    tags=("similarity", "sampling", "ivf", "diversity", "embeddings"),
    doc=f"CLUSTER-BALANCED sampling: up to {E23_QUOTA} vectors per "
    "coarse IVF list, chosen by a content-deterministic md5 order — "
    "the eval/inspection-set construction that uniform sampling gets "
    "wrong (uniform over the corpus oversamples dense regions; "
    "per-list quotas cover the embedding space's STRUCTURE, the same "
    "reason d15 stratifies by label).  Reuses e04's cell assignment "
    "as the stratifier — the index IS the sampling frame, no extra "
    "clustering pass.  One map-side assignment + one per-list "
    "window; quotas bound the output at |lists|×quota regardless of "
    "corpus size.",
)
def e23_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "embeddings")
    pts = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    seed_rows = sorted(
        (r["vec_id"], r["v"])
        for r in pts.filter(
            ((F.col("vec_id") % IVF_SEED_MOD) == 3) & (F.col("vec_id") < SEED_ID_CAP)
        ).collect()
    )
    if not seed_rows:
        return spark.createDataFrame([], "list_id bigint, vec_id bigint, pick_rank int")
    seed_ids = _lit_bigints([sid for sid, _ in seed_rows])
    seed_vecs = _lit_vecs([v for _, v in seed_rows])
    seed_norms = _lit_doubles([_py_norm(v) for _, v in seed_rows])
    cell = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.lit(len(seed_rows))),
            lambda i: F.struct(
                (
                    -cosine(
                        F.col("v"),
                        F.element_at(seed_vecs, i),
                        norm(F.col("v")),
                        F.element_at(seed_norms, i),
                    )
                ).alias("negcos"),
                F.element_at(seed_ids, i).alias("cell"),
            ),
        )
    )["cell"]
    cells = pts.select("vec_id", cell.alias("list_id"))
    w = W.partitionBy("list_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.asc("vec_id")
    )
    return (
        cells.withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= E23_QUOTA)
        .select("list_id", "vec_id", F.col("pick_rank").cast("int").alias("pick_rank"))
    )


# ---------------------------------------------------------------------------
# e24 — Johnson–Lindenstrauss random projection (64 → 16 dims)
# ---------------------------------------------------------------------------

E24_OUT = 16
E24_IN = 64


def _e24_signs() -> list[float]:
    """Deterministic Rademacher ±1 matrix, flattened row-major
    (j-th output dim × 64 input dims), seeded by md5 — a literal
    model artifact embedded identically in both engines (the PQ
    codebook convention)."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"e24_{t}".encode()).hexdigest()[0], 16) < 8 else -1.0
        for t in range(E24_OUT * E24_IN)
    ]


_E24_S_SQL = "[" + ", ".join(
    "1.0" if x > 0 else "-1.0" for x in _e24_signs()
) + "]::DOUBLE[]"


def _e24_proj_sql(v: str) -> str:
    return (
        f"list_transform(generate_series(1, {E24_OUT}), j -> "
        "0.25 * list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, {E24_IN}), "
        f"i -> {v}[i] * sg.s[(j - 1) * {E24_IN} + i])), (acc, x) -> acc + x))"
    )


def _e24_d2_sql(a: str, b: str, n: int) -> str:
    return (
        "round(list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, {n}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        "(acc, x) -> acc + x), 6)"
    )


@register(
    "e24_random_projection",
    oracle=f"""
WITH sg AS (SELECT {_E24_S_SQL} AS s),
pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
proj AS (
  SELECT vec_id, v, {_e24_proj_sql("v")} AS pv FROM pts CROSS JOIN sg
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_e24_d2_sql("q.v", "c.v", E24_IN)} AS d2_orig,
         {_e24_d2_sql("q.pv", "c.pv", E24_OUT)} AS d2_proj
  FROM proj q JOIN proj c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY d2_orig, neighbor_id) AS rn_orig,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY d2_proj, neighbor_id) AS rn_proj
  FROM pairs
)
SELECT query_id,
       CAST(COUNT(*) FILTER (rn_orig <= 10 AND rn_proj <= 10) AS BIGINT)
         AS n_overlap,
       CAST(COUNT(*) FILTER (rn_orig <= 10 AND rn_proj <= 10) * 10 AS BIGINT)
         AS recall_x100
FROM ranked
GROUP BY query_id
""",
    tags=("similarity", "embedding", "projection", "recall"),
    doc="Johnson–Lindenstrauss random projection (Achlioptas 2001 "
    f"Rademacher ±1 variant): {E24_IN}-dim embeddings are mapped "
    f"map-side to {E24_OUT} dims through a deterministic md5-seeded "
    "sign matrix embedded as a literal model artifact in BOTH "
    "engines (the PQ-codebook convention), scaled by 1/√16.  The "
    "result row is the projection's QUALITY CONTRACT — recall@10 "
    "per query of projected-space L2 top-10 against original-space "
    "top-10 — the same ships-its-own-recall discipline as "
    "e06/e09/e13, so a silently distance-destroying projection "
    "cannot stay green.  All float work is index-ordered left-folds "
    "(zip_with/aggregate vs list_reduce) rounded before ranking.  "
    "100 TB posture: projection is a pure map over the vector scan "
    "(the 4× narrower vectors then feed any downstream ANN index at "
    "4× less shuffle/memory); the all-pairs stage here exists only "
    "to measure recall against the exact baseline, exactly like the "
    "other recall rows.",
)
def e24_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "embeddings")
    s_lit = F.array(*[F.lit(x) for x in _e24_signs()])
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def proj(vcol: F.Column) -> F.Column:
        return F.transform(
            F.sequence(F.lit(1), F.lit(E24_OUT)),
            lambda j: F.lit(0.25)
            * F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), F.lit(E24_IN)),
                    lambda i: F.element_at(vcol, i)
                    * F.element_at(F.col("s"), (j - 1) * E24_IN + i),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )

    def d2(a: F.Column, b: F.Column) -> F.Column:
        return F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    pts = e.select(F.col("vec_id"), v.alias("v")).withColumn(
        "s", s_lit
    )
    pr = pts.select("vec_id", "v", proj(F.col("v")).alias("pv"))
    q = pr.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("pv").alias("qp"),
    )
    pairs = (
        pr.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            d2(F.col("qv"), F.col("v")).alias("d2_orig"),
            d2(F.col("qp"), F.col("pv")).alias("d2_proj"),
        )
    )
    wq_o = W.partitionBy("query_id").orderBy(F.asc("d2_orig"), F.asc("neighbor_id"))
    wq_p = W.partitionBy("query_id").orderBy(F.asc("d2_proj"), F.asc("neighbor_id"))
    ranked = pairs.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(wq_o).alias("rn_orig"),
        F.row_number().over(wq_p).alias("rn_proj"),
    )
    hit = (F.col("rn_orig") <= 10) & (F.col("rn_proj") <= 10)
    return ranked.groupBy("query_id").agg(
        F.count_if(hit).cast("bigint").alias("n_overlap"),
        (F.count_if(hit) * 10).cast("bigint").alias("recall_x100"),
    )


# ---------------------------------------------------------------------------
# e25 — centroid-distance outlier detection (mislabeled-embedding audit)
# ---------------------------------------------------------------------------


@register(
    "e25_centroid_outliers",
    oracle="""
WITH pts AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
dims AS (
  SELECT label, g.i AS dim, CAST(v[g.i] AS DECIMAL(18,8)) AS x
  FROM pts, generate_series(1, 64) AS g(i)
),
cent AS (
  SELECT label, dim, CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS cv
  FROM dims GROUP BY label, dim
),
cvecs AS (SELECT label, list(cv ORDER BY dim) AS cent FROM cent GROUP BY label),
scored AS (
  SELECT p.vec_id, p.label,
         round(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(generate_series(1, 64),
                   i -> (p.v[i] - c.cent[i]) * (p.v[i] - c.cent[i]))),
               (acc, z) -> acc + z), 6) AS d2
  FROM pts p JOIN cvecs c ON p.label = c.label
),
ranked AS (
  SELECT label, vec_id, d2,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY d2 DESC, vec_id) AS rn
  FROM scored
)
SELECT label, vec_id, d2, rn FROM ranked WHERE rn <= 5
""",
    tags=("similarity", "embedding", "outliers", "quality"),
    doc="Centroid-distance outlier audit — the mislabeled-data / "
    "embedding-quality screen run before a labeled set trains "
    "anything: per-label exact-decimal centroids (e05's reduce), "
    "each vector's squared L2 distance to its OWN label's centroid "
    "as an index-ordered fold, and the top-5 farthest vectors per "
    "label flagged for review (rank by distance, vec_id "
    "tie-break).  The distance is computed against centroids "
    "reassembled from the (label, dim) means via dim-ordered "
    "collect — both engines build the identical double array, so "
    "the fold sequence is bit-identical.  100 TB posture: one "
    "|labels|×64-row centroid shuffle, centroids broadcast back "
    "(labels ≪ vectors), distances map-side, and the per-label "
    "top-5 via the two-phase local-prune top-k (a flat "
    "partitionBy(label) window would funnel each label's whole "
    "population through one task — the e01 lesson).",
)
def e25_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    dec = "decimal(18,8)"
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    pts = e.select("vec_id", "label", v.alias("v"))
    dims = pts.select(
        "label", F.posexplode("v").alias("pos", "xd")
    ).select(
        "label",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("xd").cast(dec).alias("x"),
    )
    cent = dims.groupBy("label", "dim").agg(
        (F.sum("x").cast("double") / F.count(F.lit(1)).cast("double")).alias("cv")
    )
    cvecs = cent.groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("dim", "cv")))["cv"].alias("cent")
    )
    scored = pts.join(F.broadcast(cvecs), "label").select(
        "label",
        "vec_id",
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("v"), F.col("cent"), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, z: acc + z,
            ),
            6,
        ).alias("d2"),
    )
    # two-phase top-k per label (topk_per_query): a flat
    # partitionBy(label) window funnels each label's ENTIRE vector
    # population through one task — with few labels that is the e01
    # scale-killer; the local-prune phase bounds the final shuffle
    # to k × partitions rows.
    return topk_per_query(
        scored, "label", [F.desc("d2"), F.asc("vec_id")], 5
    ).select("label", "vec_id", "d2", "rn")


# ---------------------------------------------------------------------------
# e26 — retrieval quality metrics (MRR, nDCG@10) for an ANN ranking
# ---------------------------------------------------------------------------

# Fixed nDCG discount table w(i) = round(1/log2(i+1), 8), embedded as
# LITERALS in both engines: log2 outputs may differ in the last ulp
# between libm implementations, so the discount is pinned the way
# production eval code pins it (a constant table), not recomputed.
E26_DISCOUNTS = [
    (1, "1.00000000"),
    (2, "0.63092975"),
    (3, "0.50000000"),
    (4, "0.43067656"),
    (5, "0.38685281"),
    (6, "0.35620719"),
    (7, "0.33333333"),
    (8, "0.31546488"),
    (9, "0.30103000"),
    (10, "0.28906483"),
]

_E26_DISC_VALUES = ", ".join(f"({i}, {w})" for i, w in E26_DISCOUNTS)


@register(
    "e26_ranking_metrics",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_NORMS_SQL},
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_dot_sql('q.v', 'c.v')}, 8) AS dotp
  FROM pts q
  JOIN pts c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
),
ex AS (
  SELECT query_id, neighbor_id, rn FROM (
    SELECT d.query_id, d.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY d.query_id
                              ORDER BY d.dotp / (nq.nrm * nc.nrm) DESC, d.neighbor_id) AS rn
    FROM dots d
    JOIN norms nq ON d.query_id = nq.vec_id
    JOIN norms nc ON d.neighbor_id = nc.vec_id) t
  WHERE rn <= 10
),
pre AS (
  SELECT vec_id, list_slice(v, 1, {MRL_PREFIX_DIMS}) AS pv FROM pts
),
pnorms AS (
  SELECT vec_id,
         round(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                                             list_transform(pv, x -> x * x)),
                                (acc, x) -> acc + x)), 6) AS pn
  FROM pre
),
coarse AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(generate_series(1, {MRL_PREFIX_DIMS}),
                                i -> q.pv[i] * c.pv[i])),
               (acc, x) -> acc + x), 8) / (nq.pn * nc.pn) AS pcos
  FROM pre q
  JOIN pre c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
  JOIN pnorms nq ON q.vec_id = nq.vec_id
  JOIN pnorms nc ON c.vec_id = nc.vec_id
),
cand AS (
  SELECT query_id, neighbor_id, crn AS i FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY pcos DESC, neighbor_id) AS crn
    FROM coarse) t
  WHERE crn <= 10
),
disc(i, w) AS (VALUES {_E26_DISC_VALUES}),
idcg AS (
  SELECT SUM(CAST(11 - i AS DECIMAL(18,8)) * w) AS v FROM disc
),
gains AS (
  SELECT c.query_id, c.i,
         CAST(COALESCE(11 - e.rn, 0) AS DECIMAL(18,8)) AS g,
         CASE WHEN e.rn IS NOT NULL THEN c.i END AS rel_i
  FROM cand c
  LEFT JOIN ex e ON c.query_id = e.query_id AND c.neighbor_id = e.neighbor_id
),
m AS (
  SELECT g.query_id,
         SUM(g.g * d.w) AS dcg,
         MIN(g.rel_i) AS fr
  FROM gains g JOIN disc d ON g.i = d.i
  GROUP BY g.query_id
)
SELECT query_id,
       round(CAST(dcg AS DOUBLE) / CAST((SELECT v FROM idcg) AS DOUBLE), 8) AS ndcg10,
       round(COALESCE(1.0 / fr, 0.0), 8) AS mrr
FROM m
""",
    tags=("similarity", "embedding", "eval", "ranking", "metrics"),
    doc="Retrieval-quality metrics for an ANN ranking — the eval "
    "harness every index deployment gates on, generalizing the "
    "recall-only rows (e06/e09/e13): the prefix-dimension coarse "
    "ranking (e17's phase 1, no re-rank) is scored against exact "
    "full-dimension cosine top-10 ground truth with graded "
    "relevance gain = 11 − true_rank, yielding per-query nDCG@10 "
    "and MRR (reciprocal rank of the first true-top-10 hit).  "
    "Float discipline: the log2 discount table is a pinned literal "
    "in BOTH engines (libm last-ulp drift never enters the gate); "
    "gain × discount accumulates in exact decimal, doubles appear "
    "only in the final two divisions.  100 TB posture: both "
    "rankings are k-sized per query, so the metric join is "
    "O(queries × k) — evaluation cost is upstream retrieval, "
    "already bounded; ground truth at scale comes from the same "
    "two-phase brute-force path (e01) over a sampled query set.",
)
def e26_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from decimal import Decimal

    e = table(spark, sf_dir, "embeddings")
    qset = e.filter(F.col("vec_id") < 5)
    ex = brute_force_topk(e, qset, k=10).select(
        "query_id", "neighbor_id", F.col("rn").alias("true_rank")
    )

    pre = F.slice(F.col("embedding").cast("array<double>"), 1, MRL_PREFIX_DIMS)
    cand_side = spread_to_cores(e).select(
        F.col("vec_id").alias("neighbor_id"), pre.alias("cpv")
    )
    cand_side = cand_side.select(
        "neighbor_id", "cpv", norm(F.col("cpv")).alias("cpn")
    )
    qside = qset.select(F.col("vec_id").alias("query_id"), pre.alias("qpv"))
    qside = qside.select("query_id", "qpv", norm(F.col("qpv")).alias("qpn"))
    scored = (
        cand_side.crossJoin(F.broadcast(qside))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "pcos", cosine(F.col("qpv"), F.col("cpv"), F.col("qpn"), F.col("cpn"))
        )
    )
    cand = topk_per_query(
        scored, "query_id", [F.desc("pcos"), F.asc("neighbor_id")], 10
    ).select("query_id", "neighbor_id", F.col("rn").alias("i"))

    disc = local_relation(
        spark, [(i, Decimal(w)) for i, w in E26_DISCOUNTS], "i int, w decimal(18,8)"
    )
    idcg = disc.agg(
        F.sum((F.lit(11) - F.col("i")).cast("decimal(18,8)") * F.col("w")).alias("v")
    )

    gains = cand.join(ex, ["query_id", "neighbor_id"], "left").select(
        "query_id",
        "i",
        F.coalesce(F.lit(11) - F.col("true_rank"), F.lit(0))
        .cast("decimal(18,8)")
        .alias("g"),
        F.when(F.col("true_rank").isNotNull(), F.col("i")).alias("rel_i"),
    )
    m = gains.join(F.broadcast(disc), "i").groupBy("query_id").agg(
        F.sum(F.col("g") * F.col("w")).alias("dcg"),
        F.min("rel_i").alias("fr"),
    )
    return m.crossJoin(F.broadcast(idcg)).select(
        "query_id",
        F.round(
            F.col("dcg").cast("double") / F.col("v").cast("double"), 8
        ).alias("ndcg10"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("fr"), F.lit(0.0)), 8
        ).alias("mrr"),
    )


# ---------------------------------------------------------------------------
# e27 — hard-negative mining (contrastive-training sampler)
# ---------------------------------------------------------------------------


@register(
    "e27_hard_negative_mining",
    oracle=f"""
WITH pts AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
{_NORMS_SQL},
scored AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS neg_id,
         round({_dot_sql('q.v', 'c.v')}, 8) / (nq.nrm * nc.nrm) AS cos_sim
  FROM pts q
  JOIN pts c ON q.vec_id < 5 AND c.vec_id <> q.vec_id AND c.label <> q.label
  JOIN norms nq ON q.vec_id = nq.vec_id
  JOIN norms nc ON c.vec_id = nc.vec_id
)
SELECT query_id, query_label, neg_id, cos_sim, rn FROM (
  SELECT query_id, query_label, neg_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neg_id) AS rn
  FROM scored) t
WHERE rn <= 10
""",
    tags=("similarity", "embedding", "training", "hard-negatives"),
    doc="Hard-negative mining — the sampler contrastive/embedding "
    "training loops run every epoch: for each anchor, the top-k "
    "most-similar vectors with a DIFFERENT label (semantically "
    "close, labeled apart — exactly the examples that move the "
    "loss; random negatives are mostly trivial).  The "
    "label-mismatch predicate applies BEFORE scoring (e19's "
    "filter-then-search rule: post-filtering a top-k underfills "
    "k), then the engine's deterministic cosine and the two-phase "
    "top-k.  100 TB posture: identical to e01's brute-force lane "
    "(broadcast anchors × candidate scan, local prune, k×P final "
    "shuffle); production swaps the scan for the IVF/PQ index "
    "(e15) with the label filter pushed into the probe — the "
    "plumbing this row pins is the mining CONTRACT.",
)
def e27_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    cand = spread_to_cores(e).select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("cv"),
        norm(F.col("embedding")).alias("cn"),
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("qn"),
    )
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(
            (F.col("neg_id") != F.col("query_id"))
            & (F.col("neg_label") != F.col("query_label"))
        )
        .withColumn(
            "cos_sim", cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
        )
    )
    return topk_per_query(
        scored, "query_id", [F.desc("cos_sim"), F.asc("neg_id")], 10
    ).select("query_id", "query_label", "neg_id", "cos_sim", "rn")


# ---------------------------------------------------------------------------
# e28 — embedding outlier screen (distance-to-own-centroid)
# ---------------------------------------------------------------------------


@register(
    "e28_embedding_outlier_screen",
    oracle="""
WITH pts AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cent AS (
  SELECT label, g.i AS dim,
         CAST(SUM(CAST(v[g.i] AS DECIMAL(18,8))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS m
  FROM pts, generate_series(1, 8) AS g(i)
  GROUP BY label, g.i
),
devs AS (
  SELECT p.vec_id, p.label, c.dim,
         (CAST(p.v[c.dim] AS DOUBLE) - c.m) AS dv
  FROM pts p JOIN cent c ON p.label = c.label
),
scored AS (
  SELECT vec_id, label,
         round(sqrt(list_reduce(
             list_prepend(0.0::DOUBLE, list(dv * dv ORDER BY dim)),
             (acc, x) -> acc + x)), 8) AS dist
  FROM devs GROUP BY vec_id, label
)
SELECT label, vec_id, dist, rn FROM (
  SELECT label, vec_id, dist,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY dist DESC, vec_id) AS rn
  FROM scored) t
WHERE rn <= 3
""",
    tags=("similarity", "embedding", "quality", "outlier"),
    doc="Embedding outlier screen — the mislabeled/corrupted-vector "
    "audit an embedding corpus runs before index build or "
    "contrastive training: each vector's Euclidean distance to its "
    "OWN label centroid (dims 1-8), top-3 farthest per label "
    "surfaced for review (far-from-centroid = mislabel, encoder "
    "failure, or genuine hard example — all worth eyes).  "
    "Determinism discipline: centroids are e05's exact-decimal "
    "means (order-independent sums, one exact→IEEE division), "
    "per-vector deviation squares then fold in FIXED dim order "
    "(list collect → sort → left-fold, mirrored by DuckDB "
    "list(ORDER BY)/list_reduce — g07's rule), sqrt and round are "
    "correctly-rounded IEEE.  Shape: the centroid table is "
    "|labels|x8 rows (broadcast), the deviation join is map-side, "
    "the fold shuffles |vectors|x8 slim rows once on vec_id, the "
    "per-label top-3 takes the two-phase window lane — no pair "
    "joins anywhere, so the screen costs one pass at any corpus "
    "size.",
)
def e28_embedding_outlier_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    dec = "decimal(18,8)"
    dims = e.select(
        "vec_id",
        "label",
        F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "xf"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    cent = dims.groupBy("label", "dim").agg(
        (
            F.sum(F.col("x").cast(dec)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("m")
    )
    devs = dims.join(F.broadcast(cent), ["label", "dim"]).select(
        "vec_id",
        "label",
        "dim",
        ((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias("dv2"),
    )
    scored = devs.groupBy("vec_id", "label").agg(
        F.round(
            F.sqrt(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("dim", "dv2")))["dv2"],
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            8,
        ).alias("dist")
    )
    return topk_per_query(
        scored, "label", [F.desc("dist"), F.asc("vec_id")], 3
    ).select("label", "vec_id", "dist", "rn")


# ---------------------------------------------------------------------------
# e29 — pairwise cluster separation (Davies–Bouldin components, exact)
# ---------------------------------------------------------------------------


@register(
    "e29_cluster_separation",
    oracle="""
WITH pts AS (
  SELECT vec_id, label,
         list_transform(embedding,
             x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))
                       * 1000000 AS BIGINT)) AS xi
  FROM embeddings
),
dims AS (
  SELECT label, g.i AS dim, xi[g.i] AS x FROM pts, generate_series(1, 64) AS g(i)
),
stats AS (
  SELECT label, COUNT(DISTINCT vec_id) AS n FROM pts GROUP BY label
),
s2 AS (
  SELECT label, SUM(CAST(x AS HUGEINT) * x) AS s2 FROM dims GROUP BY label
),
sx AS (
  SELECT label, dim, CAST(SUM(x) AS HUGEINT) AS sx FROM dims GROUP BY label, dim
),
sqc AS (
  SELECT label, SUM(sx * sx) AS sqc FROM sx GROUP BY label
),
a AS (
  SELECT st.label, st.n, CAST(st.n AS HUGEINT) * s2.s2 - sqc.sqc AS a
  FROM stats st JOIN s2 ON s2.label = st.label JOIN sqc ON sqc.label = st.label
),
b AS (
  SELECT l.label AS label_i, r.label AS label_j,
         SUM((CAST(cj.n AS HUGEINT) * l.sx - CAST(ci.n AS HUGEINT) * r.sx)
           * (CAST(cj.n AS HUGEINT) * l.sx - CAST(ci.n AS HUGEINT) * r.sx)) AS b
  FROM sx l
  JOIN sx r ON r.dim = l.dim AND r.label <> l.label
  JOIN stats ci ON ci.label = l.label
  JOIN stats cj ON cj.label = r.label
  GROUP BY l.label, r.label
)
SELECT b.label_i, b.label_j,
       CAST(ai.n AS BIGINT) AS n_i, CAST(aj.n AS BIGINT) AS n_j,
       CAST(ai.a * CAST(aj.n AS HUGEINT) * aj.n
          + aj.a * CAST(ai.n AS HUGEINT) * ai.n AS VARCHAR) AS sep_num,
       CAST(b.b AS VARCHAR) AS sep_den,
       CAST((ai.a * CAST(aj.n AS HUGEINT) * aj.n
           + aj.a * CAST(ai.n AS HUGEINT) * ai.n) // b.b AS BIGINT) AS r_floor
FROM b JOIN a ai ON ai.label = b.label_i JOIN a aj ON aj.label = b.label_j
""",
    tags=("embedding", "cluster", "quality", "exact", "embeddings"),
    doc="Pairwise cluster-separation audit — the Davies–Bouldin "
    "(1979) similarity component R_ij = (S_i + S_j) / M_ij for "
    "every ordered label pair, computed EXACTLY: coordinates "
    "quantize to integer millionths (the deterministic transform "
    "both engines state identically), within-cluster scatter and "
    "between-centroid distance reduce to the integer identities "
    "n·Σ‖x‖² − ‖Σx‖² and ‖n_j·Σx_i − n_i·Σx_j‖², and the ratio "
    "ships as an exact num/den pair (digit strings — the q137 "
    "discipline; magnitudes are DECIMAL(38,0)-closed through sf1) "
    "plus the exact integer band r_floor = ⌊R_ij⌋ (DIV on the exact "
    "operands — non-vacuous across the fixture's 31-69 range).  "
    "This is the index an embedding-quality gate computes after "
    "e07/e10 clustering; at 100 TB the same two shuffles (per-"
    "(label,dim) partials, then a |labels|²-row reduce) carry it — "
    "cluster count, not corpus size, bounds the pairwise stage.  "
    "Production ratios beyond sf1 use doubles; the gate pins the "
    "exact-integer form.",
)
def e29_cluster_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d38 = "decimal(38,0)"
    pts = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) "
            "AS DECIMAL(18,6)) * 1000000 AS BIGINT))"
        ).alias("xi"),
    )
    dims = pts.select("label", F.posexplode("xi").alias("dim", "x"))
    stats = pts.groupBy("label").agg(F.count("*").alias("n"))
    s2 = dims.groupBy("label").agg(
        F.sum(F.col("x").cast(d38) * F.col("x")).cast(d38).alias("s2")
    )
    sx = dims.groupBy("label", "dim").agg(F.sum("x").cast(d38).alias("sx"))
    sqc = sx.groupBy("label").agg(
        F.sum(F.col("sx") * F.col("sx")).cast(d38).alias("sqc")
    )
    a = (
        stats.join(s2, "label")
        .join(sqc, "label")
        .select(
            "label",
            "n",
            (F.col("n").cast(d38) * F.col("s2") - F.col("sqc")).alias("a"),
        )
    )
    ci = F.broadcast(stats.select(F.col("label").alias("li"), F.col("n").alias("ni")))
    cj = F.broadcast(stats.select(F.col("label").alias("lj"), F.col("n").alias("nj")))
    pair = (
        sx.alias("l")
        .join(
            sx.alias("r"),
            (F.col("r.dim") == F.col("l.dim")) & (F.col("r.label") != F.col("l.label")),
        )
        .join(ci, F.col("l.label") == F.col("li"))
        .join(cj, F.col("r.label") == F.col("lj"))
    )
    diff = F.col("nj").cast(d38) * F.col("l.sx") - F.col("ni").cast(d38) * F.col("r.sx")
    b = pair.groupBy(
        F.col("l.label").alias("label_i"), F.col("r.label").alias("label_j")
    ).agg(F.sum(diff * diff).cast(d38).alias("b"))
    ai = a.select(
        F.col("label").alias("label_i"),
        F.col("n").alias("n_i"),
        F.col("a").alias("a_i"),
    )
    aj = a.select(
        F.col("label").alias("label_j"),
        F.col("n").alias("n_j"),
        F.col("a").alias("a_j"),
    )
    num = (
        F.col("a_i") * F.col("n_j").cast(d38) * F.col("n_j").cast(d38)
        + F.col("a_j") * F.col("n_i").cast(d38) * F.col("n_i").cast(d38)
    ).cast(d38)
    return (
        b.join(F.broadcast(ai), "label_i")
        .join(F.broadcast(aj), "label_j")
        .withColumn("sep_num_d", num)
        .select(
            "label_i",
            "label_j",
            F.col("n_i").cast("bigint").alias("n_i"),
            F.col("n_j").cast("bigint").alias("n_j"),
            F.col("sep_num_d").cast("string").alias("sep_num"),
            F.col("b").cast("string").alias("sep_den"),
            F.expr("CAST(sep_num_d DIV b AS BIGINT)").alias("r_floor"),
        )
    )
