"""The flagship end-to-end corpus-build pipeline as ONE oracle-checked
query: every document's final disposition after the full production
sequence a training corpus actually runs.

Stages (each individually audited elsewhere in the inventory, composed
here with explicit precedence):

1. **Benchmark holdout** (d16's rule): ``doc_id % 101 == 7`` docs are
   the eval set — held out before anything else touches them.
2. **Quality gate** (t15's Gopher rules): word count, mean word
   length, stopword floor.
3. **Canonical near-dedup** (d04/d07's MinHash-LSH): among the
   quality survivors, a doc whose verified near-dup neighborhood
   contains a smaller doc_id is a duplicate.
4. **Decontamination** (d16's 4-gram rule): survivors sharing any
   4-gram with the benchmark set are contaminated.
5. **Split** (d11's content-hash rule): what remains lands in
   train/val/test by md5(text) first byte (80/10/10).

Output: one row per document with its disposition — the audit table a
corpus release ships.  Precedence is explicit because it is POLICY
(e.g. a bench doc that would also fail quality stays 'bench_holdout';
a duplicate is counted as duplicate even if it is also contaminated) —
the gate pins the policy, not just each rule.

100 TB posture: stages 1/2/5 are map-side expressions over one scan;
stage 3 is the d04 banded-LSH shape restricted to the (smaller)
quality pool; stage 4 joins hashed grams against the eval-set-sized
benchmark grams.  Nothing here is new physics — the point is that the
COMPOSITION also stays shuffle-bounded, which is what d18 proved for
dedup alone and this extends to the whole build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flaco_spark.functions import tokens
from flaco_spark.inventory import register
from flaco_spark.operators.dedup import (
    D16_BENCH_MOD,
    D16_NGRAM,
    _SHINGLE_SQL,
    minhash_near_dup_pairs,
)
from flaco_spark.operators.text import (
    STOPWORDS,
    T15_MAX_MWL,
    T15_MAX_WORDS,
    T15_MIN_MWL,
    T15_MIN_STOP_HITS,
    T15_MIN_WORDS,
)
from flaco_spark.tables import table

_MINHASH_MOD = 576460752303423433


def _pairs_over_sql(src: str) -> str:
    """d04's banded-LSH verified-pairs CTE chain, over table ``src``
    (which must carry doc_id + text).  Byte-identical hashing to the
    d04/d20/d25 parameterization."""
    return f"""
psh AS (
  SELECT doc_id, {_SHINGLE_SQL} AS shingles FROM {src}
),
phx AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {{'a': CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {_MINHASH_MOD},
                                        'b': CAST('0x' || substr(md5(s), 17, 15) AS BIGINT) % {_MINHASH_MOD}}}) AS hp
  FROM psh
),
psig AS (
  SELECT doc_id, shingles,
         list_transform(generate_series(0, 7),
           j -> list_min(list_transform(hp, p -> (p.a + j * p.b) % {_MINHASH_MOD}))) AS sig
  FROM phx
),
pbands AS (
  SELECT doc_id, g.b AS band,
         md5(array_to_string(list_transform(list_slice(sig, g.b * 2 + 1, g.b * 2 + 2), x -> CAST(x AS VARCHAR)), '|')) AS band_key
  FROM psig, generate_series(0, 3) AS g(b)
),
pcand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM pbands a
  JOIN pbands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
ppairs AS (
  SELECT c.doc1, c.doc2
  FROM pcand c
  JOIN psh s1 ON c.doc1 = s1.doc_id
  JOIN psh s2 ON c.doc2 = s2.doc_id
  WHERE CAST(len(list_filter(s1.shingles, x -> list_contains(s2.shingles, x))) AS DOUBLE)
          / CAST(len(list_distinct(s1.shingles || s2.shingles)) AS DOUBLE) >= 0.6
)"""


_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "p01_corpus_pipeline",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
q AS (
  SELECT doc_id,
         (CAST(len(t) AS BIGINT) BETWEEN {T15_MIN_WORDS} AND {T15_MAX_WORDS})
         AND (CAST(list_aggregate(list_transform(t, x -> CAST(length(x) AS BIGINT)), 'sum') AS DOUBLE)
                / CAST(len(t) AS DOUBLE) BETWEEN {T15_MIN_MWL} AND {T15_MAX_MWL})
         AND (CAST(len(list_filter(t, x -> list_contains([{_STOP_LIST_SQL}], x))) AS BIGINT)
                >= {T15_MIN_STOP_HITS}) AS keep
  FROM toks WHERE len(t) > 0
),
pool1 AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN q ON d.doc_id = q.doc_id
  WHERE q.keep AND d.doc_id % {D16_BENCH_MOD} <> 7
),
{_pairs_over_sql("pool1")},
canon AS (
  SELECT doc2 AS doc_id, MIN(doc1) AS m FROM ppairs GROUP BY doc2
),
pool2 AS (
  SELECT p.doc_id, p.text FROM pool1 p
  LEFT JOIN canon c ON p.doc_id = c.doc_id
  WHERE LEAST(p.doc_id, COALESCE(c.m, p.doc_id)) = p.doc_id
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(t) - {D16_NGRAM - 1}, 0)),
           i -> md5(array_to_string(list_slice(t, i, i + {D16_NGRAM - 1}), ' '))
         )) AS gs
  FROM toks
),
bgrams AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % {D16_BENCH_MOD} = 7
),
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT doc_id, unnest(gs) AS g FROM grams
        WHERE doc_id IN (SELECT doc_id FROM pool2)) t
  JOIN bgrams b ON t.g = b.g
)
SELECT d.doc_id,
       CASE WHEN d.doc_id % {D16_BENCH_MOD} = 7 THEN 'bench_holdout'
            WHEN q.keep IS DISTINCT FROM TRUE THEN 'quality_reject'
            WHEN p2.doc_id IS NULL THEN 'dup_reject'
            WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
            WHEN CAST('0x' || substr(md5(d.text), 1, 2) AS BIGINT) < 204 THEN 'train'
            WHEN CAST('0x' || substr(md5(d.text), 1, 2) AS BIGINT) < 230 THEN 'val'
            ELSE 'test' END AS disposition
FROM documents d
LEFT JOIN q ON d.doc_id = q.doc_id
LEFT JOIN pool2 p2 ON d.doc_id = p2.doc_id
LEFT JOIN contaminated ct ON d.doc_id = ct.doc_id
""",
    tags=("pipeline", "dedup", "quality", "decontamination", "split", "documents"),
    doc="The flagship corpus-build pipeline as one audited relation: "
    "bench holdout (doc_id % 101 = 7) → Gopher quality gate (t15's "
    "exact rules) → canonical MinHash-LSH near-dedup among survivors "
    "(d04's 4×2 parameterization, min-id canonical) → 4-gram "
    "decontamination against the holdout (d16's rule) → content-hash "
    "80/10/10 split (d11's rule), with explicit policy precedence.  "
    "One row per document with its final disposition — the audit "
    "table a corpus release ships.  Every stage reuses the hashing "
    "and thresholds of its standalone, individually-gated query, so "
    "a disposition here is traceable to the stage that assigned it.",
)
def p01_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    is_bench = (F.col("doc_id") % D16_BENCH_MOD) == 7

    quality = docs.select(
        "doc_id",
        F.when(
            F.size(t) > 0,
            F.size(t).cast("bigint").between(T15_MIN_WORDS, T15_MAX_WORDS)
            & (
                F.aggregate(
                    F.transform(t, lambda x: F.length(x).cast("bigint")),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                ).cast("double")
                / F.size(t).cast("double")
            ).between(T15_MIN_MWL, T15_MAX_MWL)
            & (
                F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))).cast("bigint")
                >= T15_MIN_STOP_HITS
            ),
        )
        .otherwise(F.lit(False))
        .alias("keep"),
    )

    pool1 = (
        docs.join(quality, "doc_id")
        .filter(F.col("keep") & ~is_bench)
        .select("doc_id", "text")
    )
    pairs = minhash_near_dup_pairs(pool1)
    partner_min = pairs.groupBy("doc2").agg(F.min("doc1").alias("m"))
    pool2 = (
        pool1.join(partner_min, pool1.doc_id == partner_min.doc2, "left")
        .filter(
            F.least(F.col("doc_id"), F.coalesce(F.col("m"), F.col("doc_id")))
            == F.col("doc_id")
        )
        .select("doc_id", "text")
    )

    n = F.size(t) - (D16_NGRAM - 1)
    grams = F.when(
        n >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, D16_NGRAM))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    gram_rows = docs.select("doc_id", F.explode(grams).alias("g"))
    bgrams = gram_rows.filter(is_bench).select("g").distinct()
    contaminated = (
        gram_rows.join(
            pool2.select("doc_id"), "doc_id", "left_semi"
        )
        .join(F.broadcast(bgrams), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(True))
    )

    b = F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("bigint")
    return (
        docs.join(quality, "doc_id", "left")
        .join(
            pool2.select("doc_id").withColumn("in_pool2", F.lit(True)),
            "doc_id",
            "left",
        )
        .join(contaminated, "doc_id", "left")
        .select(
            "doc_id",
            F.when(is_bench, F.lit("bench_holdout"))
            .when(~F.coalesce(F.col("keep"), F.lit(False)), F.lit("quality_reject"))
            .when(F.col("in_pool2").isNull(), F.lit("dup_reject"))
            .when(F.col("is_cont").isNotNull(), F.lit("contaminated"))
            .when(b < 204, F.lit("train"))
            .when(b < 230, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("disposition"),
        )
    )


# ---------------------------------------------------------------------------
# p02 — the embedding index-build pipeline (the ANN-serving artifact)
# ---------------------------------------------------------------------------


def _p02_oracle() -> str:
    from flaco_spark.operators.similarity import (
        IVF_SEED_MOD,
        PQ_M,
        PQ_SUBDIM,
        SEED_ID_CAP,
        _dot_sql,
        _NORMS_SQL,
        _pq_d2_sql,
    )

    return f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
{_NORMS_SQL.strip().lstrip()},
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
),
codes AS (
  SELECT vec_id, m, seed_id AS code, d2 FROM (
    SELECT s.vec_id, s.m, c.seed_id,
           round({_pq_d2_sql('s.sv', 'c.ssv')}, 8) AS d2,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY round({_pq_d2_sql('s.sv', 'c.ssv')}, 8),
                                       c.seed_id) AS rnk
    FROM subs s JOIN pseeds c ON s.m = c.m) t
  WHERE rnk = 1
),
enc AS (
  SELECT vec_id,
         string_agg(CAST(code AS VARCHAR), '-' ORDER BY m) AS pq_code,
         round(list_reduce(list_prepend(0.0::DOUBLE, list(d2 ORDER BY m)),
                           (a, b) -> a + b), 8) AS total_d2
  FROM codes GROUP BY vec_id
)
SELECT c.vec_id, c.list_id, e.pq_code, e.total_d2,
       COUNT(*) OVER (PARTITION BY c.list_id) AS list_size
FROM cells c JOIN enc e ON c.vec_id = e.vec_id
"""


@register(
    "p02_index_build_pipeline",
    oracle=_p02_oracle(),
    tags=("pipeline", "similarity", "ivf", "pq", "embeddings", "flagship"),
    doc="The embedding INDEX-BUILD pipeline as one oracle-checked "
    "query: the artifact an IVFPQ deployment actually ships — per "
    "vector, its coarse inverted-list assignment (e04's argmax-cosine "
    "cell), its 8-subspace PQ code string (e11's per-subspace argmin, "
    "fixed m-order), its total quantization error (the index-quality "
    "number an offline build reports), and its list's occupancy (the "
    "load-balance statistic that decides whether nlist needs "
    "re-sizing).  e12/e15 SERVE from exactly this relation: codes "
    "are the only per-vector bytes a query touches.  Physical shape: "
    "both the coarse quantizer and all 8 codebooks ride to executors "
    "as literal constants (bounded k<=256 by the "
    "SEED_ID_CAP contract), so assignment (a map-side array_min "
    "argmin, e15's device — never a vecs×seeds crossJoin window) + "
    "encode is ONE scan-project pass with zero shuffles; the only "
    "exchange is the per-list occupancy window — and a "
    "production build writes list-partitioned files (q102's layout) "
    "from the same pass, making the occupancy count a free "
    "write-side statistic.  At 100 TB: 8 bytes/vector out, codebook "
    "constants in, no all-pairs anything.",
)
def p02_index_build_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from flaco_spark.functions import cosine, norm
    from flaco_spark.operators.similarity import (
        _lit_bigints,
        _lit_doubles,
        _lit_vecs,
        _pq_assigns_col,
        _pq_codebook_literal,
        _pq_seeds_py,
        _py_norm,
    )

    e = table(spark, sf_dir, "embeddings")
    pts = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    seeds = _pq_seeds_py(spark, sf_dir)
    if not seeds:
        return spark.createDataFrame(
            [],
            "vec_id bigint, list_id bigint, pq_code string, "
            "total_d2 double, list_size bigint",
        )
    # Coarse assignment as e15's MAP-SIDE literal argmin: 256 cosines
    # per vector against broadcast-literal centroids, picked by
    # ascending (-cos, cell) struct order (== the oracle's ORDER BY
    # seed_cos DESC, seed_id) — not a vecs×seeds crossJoin window,
    # which at 10× shuffles |corpus|×|seeds| rows through one
    # per-vector window sort (the shape e15's rewrite removed).
    coarse_ids = _lit_bigints([sid for sid, _ in seeds])
    coarse_vecs = _lit_vecs([v for _, v in seeds])
    coarse_norms = _lit_doubles([_py_norm(v) for _, v in seeds])
    cell = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.lit(len(seeds))),
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
    cells = pts.select("vec_id", "v", cell.alias("list_id"))
    assigns = _pq_assigns_col(*_pq_codebook_literal(seeds))
    enc = cells.select(
        "vec_id",
        "list_id",
        F.array_join(
            F.transform(assigns, lambda a: a["seed_id"].cast("string")), "-"
        ).alias("pq_code"),
        F.round(
            F.aggregate(assigns, F.lit(0.0), lambda acc, a: acc + a["d2"]), 8
        ).alias("total_d2"),
    )
    wl = W.partitionBy("list_id")
    return enc.select(
        "vec_id",
        "list_id",
        "pq_code",
        "total_d2",
        F.count(F.lit(1)).over(wl).cast("bigint").alias("list_size"),
    )


# ---------------------------------------------------------------------------
# p03 — training-shard export: gate → dedup → content-order → pack → manifest
# ---------------------------------------------------------------------------

P03_BUDGET = 4096  # tokens per shard
P03_MIN_TOKENS = 5  # quality floor


@register(
    "p03_shard_export_pipeline",
    oracle=rf"""
WITH base AS (
  SELECT doc_id, md5(text) AS k,
         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
gated AS (SELECT * FROM base WHERE n_tokens >= {P03_MIN_TOKENS}),
ded AS (
  SELECT k, MIN(doc_id) AS keep_id, MAX(n_tokens) AS n_tokens
  FROM gated GROUP BY k
),
ordered AS (
  SELECT k, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM ded
),
sharded AS (
  SELECT k, n_tokens, prev // {P03_BUDGET} AS shard_id FROM ordered
)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(k) AS first_key, MAX(k) AS last_key,
       md5(string_agg(k, '' ORDER BY k)) AS shard_md5
FROM sharded GROUP BY shard_id
""",
    tags=("pipeline", "export", "sharding", "prefix-sum", "documents"),
    doc="The training-data EXPORT pipeline as one audited relation — "
    "the step after p01 decides what survives: quality-gate (token "
    f"floor {P03_MIN_TOKENS}), exact-dedup (min doc_id per content "
    "hash), CONTENT-ADDRESSED global ordering (order by md5(text): "
    "reproducible run-to-run, decorrelates source/time locality — "
    "the shuffle a curriculum-neutral corpus ships with), greedy "
    f"packing into {P03_BUDGET}-token shards by running-prefix "
    "cut, and a shard MANIFEST (doc/token counts, key range, and "
    "an order-sensitive md5-of-keys fingerprint per shard — what "
    "a release signs).  The Spark plan computes the global prefix "
    "sum the SCALE-SAFE way: a two-phase hierarchical cumsum "
    "(within-bucket window over the 16 hex-prefix ranges + a "
    "16-row broadcast offset table), so no single-partition window "
    "ever sees the corpus — the oracle's flat window proves the "
    "decomposition exact.  100 TB posture: everything is one scan, "
    "one dedup shuffle, one bucket-keyed window; widen the bucket "
    "alphabet (2-3 hex chars → 256-4096 ranges) as the corpus "
    "grows.",
)
def p03_shard_export_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.md5("text").alias("k"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    gated = base.filter(F.col("n_tokens") >= P03_MIN_TOKENS)
    ded = gated.groupBy("k").agg(
        F.min("doc_id").alias("keep_id"), F.max("n_tokens").alias("n_tokens")
    )
    bucket = F.conv(F.substring("k", 1, 1), 16, 10).cast("int")
    ded = ded.withColumn("bucket", bucket)
    per_bucket = ded.groupBy("bucket").agg(F.sum("n_tokens").alias("btot"))
    offsets = per_bucket.select(
        "bucket",
        F.coalesce(
            F.sum("btot").over(
                W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("offset"),
    )
    w_in = W.partitionBy("bucket").orderBy("k").rowsBetween(
        W.unboundedPreceding, -1
    )
    sharded = (
        ded.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "prev",
            F.col("offset") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)),
        )
        .withColumn("shard_id", F.expr(f"prev DIV {P03_BUDGET}"))
    )
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.min("k").alias("first_key"),
        F.max("k").alias("last_key"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list("k")))).alias(
            "shard_md5"
        ),
    )
