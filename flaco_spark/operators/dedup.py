"""Deduplication operators over the ``documents`` table.

Four families, all shuffle-conscious for 100 TB:

- **Exact**: hash-groupBy on md5(text).  One shuffle on a short hash
  key; dominated by the scan.
- **MinHash + LSH**: shingle → minhash signature (map-side, pure
  expressions) → band bucket keys → self-join on (band, bucket) — the
  only shuffle is on the bucket key, and candidate verification
  (exact Jaccard) happens per bucket, never all-pairs.
- **SimHash**: 60-bit signature from token votes (map-side after one
  token explode + re-group by doc).
- **Embedding cosine**: sign-LSH bucketing then exact cosine within
  the bucket (see :mod:`flaco_spark.operators.similarity`).

The MinHash/LSH parameters (8 hashes, 4 bands × 2 rows) target
candidate recall at Jaccard ≳ 0.6; they are arguments, not constants,
in the reusable API below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flaco_spark.functions import (
    char_shingles,
    jaccard,
    lsh_band_key,
    minhash_signature,
    sign_lsh_bucket,
    tokens,
    word_shingles,
)
from flaco_spark.inventory import register
from flaco_spark.localrel import local_relation
from flaco_spark.tables import table

# ---------------------------------------------------------------------------
# Reusable API
# ---------------------------------------------------------------------------

# Live-cache bookkeeping is shared across operator modules (similarity
# registers its kmeans assignment here too) — see flaco_spark.cachepool.
from flaco_spark.cachepool import _LIVE_CACHES, register_cache, release_caches  # noqa: F401


def _parallelize_scan(df: DataFrame) -> DataFrame:
    """Spread a narrow scan across the session's cores before
    CPU-heavy map stages (shingling, md5 signatures).

    At 100 TB the file count gives natural parallelism and this is a
    no-op; locally a single small parquet file arrives as ONE
    partition, which would serialize the whole signature build on one
    task.  Only repartitions UP (never adds a shuffle when the scan
    is already parallel enough)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _persist_eager(df: DataFrame, release: bool = True) -> DataFrame:
    """Persist + eager count, releasing previously-live dedup caches.

    The count() materializes the cache EAGERLY in a single-consumer
    job: letting the final action populate it lazily puts several plan
    branches in a race for the same cache-block locks, which
    serializes the whole job (measured: 491 s vs 20 s at 50k docs).

    ``release=False`` is for COMPOSED pipelines that persist several
    frames in sequence and still need the earlier ones: the default
    entry-release would evict a predecessor this very plan reads,
    silently recomputing its lineage at every downstream consumption
    (measured 5× on d04 when the signature persist evicted the
    family table).  Callers passing False must release_caches()
    themselves at pipeline entry.
    """
    if release:
        release_caches()
    # Idempotent: a composed pipeline (e.g. d18 reusing d03's candidate
    # builder) may hand back an already-persisted frame — re-persisting
    # it only emits "Asked to cache already cached data" churn.
    if not df.is_cached:
        df = df.persist()
    df.count()
    register_cache(df)
    return df


def exact_dedup(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-key row per distinct text (hash-groupBy)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(key_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _pairs_over_distinct(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_mode: str = "word",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.6,
    release: bool = True,
) -> DataFrame:
    """Banded-LSH verified pairs over a frame of DISTINCT texts (the
    core d04 machinery; see :func:`minhash_near_dup_pairs`)."""
    cand_ids, sig = _minhash_candidates(
        df, text_col, key_col, shingle_mode, shingle_k, num_hashes, bands, release
    )
    s1 = sig.select(F.col("doc_id").alias("doc1"), F.col("shingles").alias("sh1"))
    s2 = sig.select(F.col("doc_id").alias("doc2"), F.col("shingles").alias("sh2"))
    return (
        cand_ids.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn("jaccard", jaccard(F.col("sh1"), F.col("sh2")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_mode: str = "word",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH with exact-Jaccard verify.

    Returns (doc1, doc2, jaccard) with doc1 < doc2, jaccard >= threshold.
    ``shingle_mode='word'`` (token n-grams) is the scale-safe default:
    char k-grams over a small shared vocabulary collide pathologically
    and blow up the LSH bucket join (observed: >10 min at 5k docs vs
    seconds with word shingles).

    PHYSICAL plan (relation unchanged): exact-duplicate texts collapse
    to their min-id representative before the LSH machinery, and the
    full pair relation is reconstructed afterwards — cross-family
    pairs expand the rep pair over both copy families (identical
    shingle sets ⇒ identical band keys and jaccard, so every
    copy×copy combination is a verified pair with the rep pair's
    jaccard), intra-family pairs are emitted directly at jaccard 1.0.
    In the mass-duplication regime (every text ×d) this cuts the
    bucket join by d² per bucket while the output — which is
    inherently quadratic in family size — is produced by cheap
    explodes instead of the shuffle join.  A text duplicated beyond
    array-collect practicality would also be beyond pair-output
    practicality (d07/d09 are the linear-output forms).
    """
    keyed = df.select(
        F.col(key_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("th"),
        F.col(text_col).alias("__text"),
    )
    release_caches()
    # ONE shuffle produces both the family table and the rep corpus:
    # texts within a th-group are byte-identical, so first(__text) is
    # deterministic and a separate rep join (which would re-shuffle
    # the text payload) is unnecessary.
    fams = _persist_eager(
        keyed.groupBy("th").agg(
            F.min("doc_id").alias("rep_id"),
            F.collect_list("doc_id").alias("ids"),
            F.count(F.lit(1)).alias("n"),
            F.first("__text").alias("__text"),
        ),
        release=False,
    )
    rep_docs = fams.select(
        F.col("rep_id").alias("doc_id"), F.col("__text").alias(text_col)
    )
    rp = _pairs_over_distinct(
        rep_docs, text_col, "doc_id", shingle_mode, shingle_k,
        num_hashes, bands, threshold, release=False,
    )
    cross = (
        rp.join(
            fams.select(F.col("rep_id").alias("doc1"), F.col("ids").alias("ids1")),
            "doc1",
        )
        .join(
            fams.select(F.col("rep_id").alias("doc2"), F.col("ids").alias("ids2")),
            "doc2",
        )
        .select(F.explode("ids1").alias("a"), "ids2", "jaccard")
        .select("a", F.explode("ids2").alias("b"), "jaccard")
        .select(
            F.least("a", "b").alias("doc1"),
            F.greatest("a", "b").alias("doc2"),
            "jaccard",
        )
    )
    intra = (
        fams.filter(F.col("n") >= 2)
        .select("ids", F.explode("ids").alias("a"))
        .select("a", F.explode("ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .select(
            F.col("a").alias("doc1"),
            F.col("b").alias("doc2"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(intra)


def _minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_mode: str = "word",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    release: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Shared MinHash-LSH candidate generation (d04 pairs, d20
    calibration): returns (candidate id pairs, persisted signature
    table with shingles + sig columns), so the calibration query
    audits EXACTLY the parameterization the dedup pass runs.
    """
    rows_per_band = num_hashes // bands
    mk = word_shingles if shingle_mode == "word" else char_shingles
    sh = _parallelize_scan(df).select(
        F.col(key_col).alias("doc_id"),
        mk(F.col(text_col), shingle_k).alias("shingles"),
    )
    # persist: the banded self-join and the verify re-join both reuse this
    # lineage; without it the (expensive) signature expression re-evaluates.
    sig = _persist_eager(
        sh.withColumn("sig", minhash_signature(F.col("shingles"), num_hashes)),
        release=release,
    )
    # The LSH self-join carries ONLY (doc_id, band, band_key) — never the
    # shingle arrays.  Co-bucketed pairs multiply row counts ×(bucket
    # size), so wide rows through this join dominate the shuffle; ids
    # keep it a few bytes per row.  Shingles re-attach afterwards, and
    # only for the (small) candidate set.
    banded = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "sig",
    ).withColumn("band_key", lsh_band_key(F.col("sig"), F.col("band"), rows_per_band))

    left = banded.select(F.col("doc_id").alias("doc1"), "band", "band_key")
    right = banded.select(F.col("doc_id").alias("doc2"), "band", "band_key")
    cand_ids = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .dropDuplicates(["doc1", "doc2"])
    )
    return cand_ids, sig


def simhash_signature_df(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id", bits: int = 60
) -> DataFrame:
    """60-bit SimHash per document.

    Token hash = first 15 hex chars of md5(token) (60 bits, keeps all
    arithmetic inside signed int64 even with the final shift).  Bit b
    votes +1/-1 by token-frequency weight; signature bit b is 1 iff
    the vote sum is positive.

    Shuffle shape: one groupBy(doc_id) with ``bits`` SUM aggregates —
    the per-bit votes are ``bits`` sibling columns, so Tungsten's
    partial (map-side) aggregation collapses each input partition to
    one 60-long row per doc BEFORE the shuffle.  The earlier
    formulation exploded every token into 60 (doc, bit, vote) rows and
    shuffled tokens×60 rows; this shuffles docs×60 longs — a ~token-
    count× reduction at corpus scale.
    """
    toks = _parallelize_scan(df).select(
        F.col(key_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    )
    # 60-bit integer from the md5 prefix (hex → decimal via conv).
    toks = toks.withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    )
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.alias("simhash"))


# ---------------------------------------------------------------------------
# Oracle-checked inventory entries
# ---------------------------------------------------------------------------


@register(
    "d01_dedup_exact",
    oracle="""
SELECT md5(text) AS text_hash,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
""",
    tags=("dedup", "documents"),
    doc="Exact dedup: one surviving id per distinct text.",
)
def d01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(table(spark, sf_dir, "documents")).select(
        "text_hash", "keep_id", "n_copies"
    )


@register(
    "d02_dedup_by_source",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique
FROM documents
GROUP BY source
""",
    tags=("dedup", "documents"),
    doc="Duplicate rate per source.",
)
def d02_dedup_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
    )


# Word 3-gram shingles (see minhash_near_dup_pairs on why not char grams).
_SHINGLE_SQL = (
    r"list_distinct(list_transform("
    r"generate_series(1, greatest(len(string_split_regex(text, '\s+')) - 2, 1)),"
    r" i -> array_to_string(list_slice(string_split_regex(text, '\s+'), i, i + 2), ' ')))"
)

@register(
    "d03_minhash_signature",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLE_SQL} AS shingles FROM documents
),
hx AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {{'a': CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 576460752303423433,
                                        'b': CAST('0x' || substr(md5(s), 17, 15) AS BIGINT) % 576460752303423433}}) AS hp
  FROM sh
),
sig AS (
  SELECT doc_id, shingles,
         list_transform(generate_series(0, 7),
           j -> list_min(list_transform(hp, p -> (p.a + j * p.b) % 576460752303423433))) AS sig
  FROM hx
)
SELECT doc_id,
       sig[1] AS mh0, sig[2] AS mh1, sig[3] AS mh2, sig[4] AS mh3,
       sig[5] AS mh4, sig[6] AS mh5, sig[7] AS mh6, sig[8] AS mh7
FROM sig
""",
    tags=("dedup", "minhash", "documents"),
    doc="MinHash signatures (8 md5-family hashes over word 3-gram shingles).",
)
def d03_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sig = d.select(
        "doc_id",
        minhash_signature(word_shingles(F.col("text"), 3), 8).alias("sig"),
    )
    return sig.select(
        "doc_id",
        *[F.element_at("sig", i + 1).alias(f"mh{i}") for i in range(8)],
    )


@register(
    "d04_minhash_lsh_pairs",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLE_SQL} AS shingles FROM documents
),
hx AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {{'a': CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 576460752303423433,
                                        'b': CAST('0x' || substr(md5(s), 17, 15) AS BIGINT) % 576460752303423433}}) AS hp
  FROM sh
),
sig AS (
  SELECT doc_id, shingles,
         list_transform(generate_series(0, 7),
           j -> list_min(list_transform(hp, p -> (p.a + j * p.b) % 576460752303423433))) AS sig
  FROM hx
),
bands AS (
  SELECT doc_id, shingles,
         g.b AS band,
         md5(array_to_string(list_transform(list_slice(sig, g.b * 2 + 1, g.b * 2 + 2), x -> CAST(x AS VARCHAR)), '|')) AS band_key
  FROM sig, generate_series(0, 3) AS g(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc1, c.doc2,
       CAST(len(list_filter(s1.shingles, x -> list_contains(s2.shingles, x))) AS DOUBLE)
         / CAST(len(list_distinct(s1.shingles || s2.shingles)) AS DOUBLE) AS jaccard
FROM cand c
JOIN sh s1 ON c.doc1 = s1.doc_id
JOIN sh s2 ON c.doc2 = s2.doc_id
WHERE CAST(len(list_filter(s1.shingles, x -> list_contains(s2.shingles, x))) AS DOUBLE)
        / CAST(len(list_distinct(s1.shingles || s2.shingles)) AS DOUBLE) >= 0.6
""",
    tags=("dedup", "minhash", "lsh", "documents"),
    doc="MinHash-LSH near-duplicate pairs (4 bands × 2 rows) with "
    "exact-Jaccard verification at ≥ 0.6.",
)
def d04_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_near_dup_pairs(table(spark, sf_dir, "documents"))


_D04_PAIRS_CTE = f"""
sh AS (
  SELECT doc_id, {_SHINGLE_SQL} AS shingles FROM documents
),
hx AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {{'a': CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 576460752303423433,
                                        'b': CAST('0x' || substr(md5(s), 17, 15) AS BIGINT) % 576460752303423433}}) AS hp
  FROM sh
),
sig AS (
  SELECT doc_id, shingles,
         list_transform(generate_series(0, 7),
           j -> list_min(list_transform(hp, p -> (p.a + j * p.b) % 576460752303423433))) AS sig
  FROM hx
),
bands AS (
  SELECT doc_id, shingles,
         g.b AS band,
         md5(array_to_string(list_transform(list_slice(sig, g.b * 2 + 1, g.b * 2 + 2), x -> CAST(x AS VARCHAR)), '|')) AS band_key
  FROM sig, generate_series(0, 3) AS g(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT c.doc1, c.doc2
  FROM cand c
  JOIN sh s1 ON c.doc1 = s1.doc_id
  JOIN sh s2 ON c.doc2 = s2.doc_id
  WHERE CAST(len(list_filter(s1.shingles, x -> list_contains(s2.shingles, x))) AS DOUBLE)
          / CAST(len(list_distinct(s1.shingles || s2.shingles)) AS DOUBLE) >= 0.6
)
"""


@register(
    "d07_dedup_canonical",
    oracle=f"""
WITH {_D04_PAIRS_CTE}
SELECT d.doc_id,
       LEAST(d.doc_id, COALESCE(p.m, d.doc_id)) AS canonical_id,
       CAST(LEAST(d.doc_id, COALESCE(p.m, d.doc_id)) <> d.doc_id AS BOOLEAN) AS is_duplicate
FROM documents d
LEFT JOIN (SELECT doc2, MIN(doc1) AS m FROM pairs GROUP BY doc2) p
       ON d.doc_id = p.doc2
""",
    tags=("dedup", "minhash", "lsh", "canonical", "documents"),
    doc="Scale-shaped near-dedup: one row PER DOCUMENT with the minimum "
    "doc_id among its verified near-duplicates as canonical id.  The "
    "pair-emitting form (d04) is quadratic in duplicate-group size "
    "(a group of d copies yields d²/2 pairs); this keeps the output "
    "linear — the form a 100 TB dedup pass actually materializes.",
)
def d07_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(docs)
    partner_min = pairs.groupBy("doc2").agg(F.min("doc1").alias("m"))
    return (
        docs.select("doc_id")
        .join(partner_min, docs.doc_id == partner_min.doc2, "left")
        .select(
            "doc_id",
            F.least(F.col("doc_id"), F.coalesce(F.col("m"), F.col("doc_id"))).alias(
                "canonical_id"
            ),
            (
                F.least(F.col("doc_id"), F.coalesce(F.col("m"), F.col("doc_id")))
                != F.col("doc_id")
            ).alias("is_duplicate"),
        )
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    src_col: str = "doc1",
    dst_col: str = "doc2",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components by min-label propagation + pointer jumping.

    Each node starts labeled with itself; every round each node (a)
    takes the minimum label among itself and its neighbors, then (b)
    POINTER-JUMPS: replaces its label with its label's label
    (path-halving — the round-bounding rewrite of Kiveris et al.,
    "Connected Components in MapReduce and Beyond", in the
    Shiloach–Vishkin shortcut form).  Propagation alone needs
    O(component diameter) rounds — fine for the small dense clusters
    near-dup graphs mostly produce, but a 100 TB corpus WILL contain
    a few chain-shaped components (serial near-copies A≈B≈C≈…)
    whose diameter is unbounded.  The jump contracts label chains
    geometrically, so convergence is O(log diameter) rounds: a
    1M-hop chain converges inside the default 20-round budget.

    Scale shape per round: one shuffle of the (node, label) table
    keyed by node (the edge join + min-aggregate) plus one label-table
    self-join keyed by label (the jump — label-table-sized, ≤ |edges|,
    never corpus-sized).  The convergence check is a count() per round
    (a metadata-sized job).

    Invariant (why the jump is sound): label(v) is always the id of a
    node in v's own component and only ever decreases, so
    label(label(v)) is also in the component and ≤ label(v); the
    fixpoint argument is unchanged — at a zero-change round every
    edge has equal labels on both ends, and the component-min node
    still holds its own id.

    Returns (node_col, component_id) — component_id = min node id in
    the component.
    """
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionAll(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .persist()
    )
    sym.count()  # materialize once; every round re-reads the edge list
    # Propagate over the edge-touched subgraph only: isolated nodes
    # (the overwhelming majority of a near-dup corpus) keep their own
    # label by definition, so iterating them is pure waste — the
    # per-round shuffle is |touched nodes| ≈ |edges|, not |corpus|.
    # They rejoin as singletons after convergence.
    touched = sym.select(F.col("src").alias("node")).dropDuplicates(["node"])
    labels = touched.withColumn("label", F.col("node"))
    for _ in range(max_iterations):
        neighbor_min = (
            labels.join(sym, labels.node == sym.src)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        propagated = (
            labels.join(neighbor_min, labels.node == neighbor_min.dst, "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            # Lineage MUST be truncated each round: the jump self-join
            # below references this frame twice, so without truncation
            # the logical plan doubles per round and Catalyst analysis
            # goes exponential.  localCheckpoint materializes to
            # executor storage with no checkpoint dir; on a real
            # cluster swap for reliable checkpoint() if executor loss
            # mid-algorithm must be survivable.
            .localCheckpoint(eager=True)
        )
        # Pointer jump: label(v) := label(label(v)).  Labels are node
        # ids inside the touched set, so the self-join keyed by label
        # always resolves; left+coalesce guards the identity rows.
        # The round's STARTING label (_old) rides along so the
        # convergence check below is a filter-count over this
        # checkpointed frame — the old separate new⋈old equi-join
        # was a whole extra shuffle join job per round for one count.
        new_labels = (
            propagated.alias("a")
            .join(
                propagated.select(
                    F.col("node").alias("_jn"), F.col("label").alias("_jl")
                ),
                F.col("a.label") == F.col("_jn"),
                "left",
            )
            .select(
                F.col("a.node").alias("node"),
                F.col("a._old").alias("_old"),
                F.least(
                    F.col("a.label"), F.coalesce("_jl", F.col("a.label"))
                ).alias("label"),
            )
            # EAGER, deliberately: a lazy checkpoint with the
            # convergence count as its materializing action does run
            # one job per round instead of two, but the A/B isolate
            # read 23.8 s vs 6.8 s at sf0.1 (same host window) — the
            # count's filter plan executes against the UNTRUNCATED
            # lineage while the checkpoint persists as a side effect,
            # so every round re-ran the whole label history.  Fewer
            # jobs is not less work; keep the eager materialize.
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        if labels.is_cached:
            labels.unpersist()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    else:
        # Exhausting the round budget without a zero-change round means
        # some component's diameter exceeds max_iterations and the
        # labels are NOT a fixpoint — returning them silently would
        # hand wrong component_ids downstream.  Fail loudly instead.
        sym.unpersist()
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"rounds ({changed} labels still changing); raise "
            "max_iterations (rounds needed ~ component diameter)"
        )
    register_cache(sym)
    register_cache(labels)
    # Singletons (no edges) are their own component.
    return nodes.select(F.col(node_col)).join(
        labels.select(
            F.col("node").alias(node_col), F.col("label").alias("_lbl")
        ),
        node_col,
        "left",
    ).select(
        node_col,
        F.coalesce("_lbl", F.col(node_col)).alias("component_id"),
    )


@register(
    "d09_dedup_components",
    oracle=f"""
WITH RECURSIVE {_D04_PAIRS_CTE},
edges AS (
  SELECT doc1 AS src, doc2 AS dst FROM pairs
  UNION ALL
  SELECT doc2 AS src, doc1 AS dst FROM pairs
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON r.node = e.src
)
SELECT node AS doc_id,
       MIN(label) AS component_id,
       CAST(MIN(label) <> node AS BOOLEAN) AS is_duplicate
FROM reach
GROUP BY node
""",
    tags=("dedup", "minhash", "lsh", "components", "iterative", "documents"),
    doc="TRANSITIVE near-dup clusters: connected components over the "
    "verified MinHash-LSH pair graph (d04 edges) by iterative "
    "min-label propagation — A~B~C all collapse to one canonical id "
    "even when A and C never co-bucket (d07's one-hop canonical form "
    "cannot see that).  The oracle computes the same fixpoint with a "
    "recursive CTE; Spark iterates one (node,label)-shuffle per round "
    "until a round changes nothing (O(log diameter) pointer-jump "
    "rounds).  PHYSICAL plan (same relation): exact-duplicate texts "
    "collapse to their min-id representative FIRST — byte-identical "
    "copies have identical shingles, hence identical band keys and "
    "jaccard-1.0 edges, so the rep graph's components re-expanded "
    "over the copy families ARE the full graph's components — which "
    "shrinks the LSH join and every CC round by the duplication "
    "factor (10× in the probe's mass-duplication regime: the exact "
    "collapse is a cheap hash-agg, the expensive stages then run on "
    "distinct texts only — the production dedup ordering).",
)
def d09_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", F.md5("text").alias("th"), "text")
    reps = keyed.groupBy("th").agg(F.min("doc_id").alias("rep_id"))
    rep_docs = (
        keyed.join(reps, "th")
        .filter(F.col("doc_id") == F.col("rep_id"))
        .select("doc_id", "text")
    )
    pairs = _pairs_over_distinct(rep_docs)
    comp = connected_components(rep_docs.select("doc_id"), pairs).select(
        F.col("doc_id").alias("rep_id"), "component_id"
    )
    return (
        keyed.select("doc_id", "th")
        .join(reps, "th")
        .join(comp, "rep_id")
        .select(
            "doc_id",
            "component_id",
            (F.col("component_id") != F.col("doc_id")).alias("is_duplicate"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_n: int = 3,
    max_df: int = 10,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via an inverted index on discriminative
    n-grams (no hashing): docs become candidates iff they share a
    shingle whose document frequency is in [2, max_df].

    The ``max_df`` cap is the scale bound: a shingle shared by d docs
    yields ≤ d(d-1)/2 candidate pairs, so capping d caps the join
    fan-out per posting — the standard inverted-index candidate
    pruning.

    Mass duplication would defeat a naive df cap: with d > max_df
    IDENTICAL copies of a document, every one of its shingles has
    df > max_df and would be pruned — exactly the heaviest duplicates
    in a real corpus would go unreported.  So the index runs over
    exact-duplicate CLASS REPRESENTATIVES (min doc_id per distinct
    text, i.e. an exact-dedup pass first): d identical copies
    contribute 1 to every df count, the cap measures genuinely
    distinct near-neighbors, and within-class duplicates are the
    exact-dedup pass's output (d01/d07), not pair fan-out here.
    Output pairs are therefore between class representatives.
    Exact Jaccard verifies candidates, as in d04.

    Physical shape: ONE shuffle of (doc_id, 8-byte posting hash)
    rows builds the capped posting lists; pairs expand map-side from
    each ≤ max_df list — no df-count join-back, no posting self-join
    (the naive index shuffles the posting set three more times).
    """
    cand, sh = _ngram_candidate_pairs(df, text_col, key_col, shingle_n, max_df)
    s1 = sh.select(F.col("doc_id").alias("doc1"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("doc2"), F.col("shingles").alias("sh2"))
    return (
        cand.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn("jaccard", jaccard(F.col("sh1"), F.col("sh2")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


def _ngram_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_n: int = 3,
    max_df: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate generation for the inverted-index dedup family
    (d08 Jaccard, d17 containment): returns (candidate id pairs,
    persisted per-representative shingle table).  See
    :func:`ngram_jaccard_pairs` for the df-cap scale argument."""
    reps = _parallelize_scan(df).groupBy(F.col(text_col)).agg(F.min(key_col).alias("doc_id"))
    sh = _persist_eager(
        reps.select(
            "doc_id",
            word_shingles(F.col(text_col), shingle_n).alias("shingles"),
        )
    )
    # Postings are keyed by a 60-bit md5 prefix instead of the raw
    # shingle string: the one big shuffle (groupBy posting key) moves
    # 8-byte keys, not n-gram text.  DuckDB computes the identical
    # key ('0x'||substr(md5(s),1,15))::BIGINT, so any hash-merge of
    # two distinct shingles prunes identically in both engines.
    postings = sh.select("doc_id", F.explode("shingles").alias("shingle")).select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("bigint").alias("shash"),
    )
    # Single-shuffle candidate generation: per posting key, collect
    # the (df-capped) doc list and expand its ≤ max_df(max_df-1)/2
    # pairs MAP-SIDE with array expressions — replaces the
    # df-count + join-back + self-join cascade (3 shuffles of the
    # full posting set) of the naive inverted index.
    ids = F.array_sort(F.col("ids"))
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.lit(max_df)),
                lambda y: F.struct(x.alias("doc1"), y.alias("doc2")),
            ),
        )
    )
    cand = (
        postings.groupBy("shash")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_df))
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.doc1").alias("doc1"), F.col("p.doc2").alias("doc2"))
        # Belt-and-braces: if one doc's distinct shingles collide in
        # the 60-bit posting hash, its id appears 2+ times in one
        # posting list and the sorted-slice expansion would emit a
        # (doc, doc) self-pair (Jaccard 1.0, absent from the oracle's
        # a.doc_id < b.doc_id output).  Astronomically rare; the
        # filter is free.
        .filter(F.col("doc1") != F.col("doc2"))
        .dropDuplicates(["doc1", "doc2"])
    )
    return cand, sh


@register(
    "d08_ngram_jaccard_pairs",
    oracle=f"""
WITH reps AS (
  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
),
sh AS (
  SELECT doc_id, {_SHINGLE_SQL} AS shingles FROM reps
),
postings AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS shash
  FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh)
),
rare AS (
  SELECT shash FROM postings GROUP BY shash
  HAVING COUNT(*) BETWEEN 2 AND 10
),
keyed AS (
  SELECT p.shash, p.doc_id FROM postings p JOIN rare r ON p.shash = r.shash
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM keyed a JOIN keyed b ON a.shash = b.shash AND a.doc_id < b.doc_id
)
SELECT c.doc1, c.doc2,
       CAST(len(list_filter(s1.shingles, x -> list_contains(s2.shingles, x))) AS DOUBLE)
         / CAST(len(list_distinct(s1.shingles || s2.shingles)) AS DOUBLE) AS jaccard
FROM cand c
JOIN sh s1 ON c.doc1 = s1.doc_id
JOIN sh s2 ON c.doc2 = s2.doc_id
WHERE CAST(len(list_filter(s1.shingles, x -> list_contains(s2.shingles, x))) AS DOUBLE)
        / CAST(len(list_distinct(s1.shingles || s2.shingles)) AS DOUBLE) >= 0.5
""",
    tags=("dedup", "ngram", "jaccard", "documents"),
    doc="n-gram Jaccard dedup via an inverted index on discriminative "
    "shingles (df in [2,10]) over exact-dup class representatives — "
    "hash-free candidate generation whose per-posting fan-out is "
    "capped by the df bound, immune to mass duplication (identical "
    "copies collapse before df counting); exact Jaccard verify at "
    "≥ 0.5.",
)
def d08_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(table(spark, sf_dir, "documents"))


_SIMHASH_SIG_CTE = r"""
toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents
),
hashed AS (
  SELECT doc_id, substr(md5(tok), 1, 15) AS hx FROM toks
),
bits AS (
  SELECT doc_id, g.b,
         CASE WHEN ((strpos('0123456789abcdef', substr(hx, 15 - (g.b // 4), 1)) - 1)
                    >> (g.b % 4)) & 1 = 1
              THEN 1 ELSE -1 END AS vote
  FROM hashed, generate_series(0, 59) AS g(b)
),
votes AS (
  SELECT doc_id, b, SUM(vote) AS v FROM bits GROUP BY doc_id, b
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
  FROM votes
  GROUP BY doc_id
)
"""


@register(
    "d05_simhash_signature",
    oracle=f"WITH {_SIMHASH_SIG_CTE} SELECT doc_id, simhash FROM sig",
    tags=("dedup", "simhash", "documents"),
    doc="60-bit SimHash signature per document (md5-derived bit votes).",
)
def d05_simhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_signature_df(table(spark, sf_dir, "documents"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance.

    Banded exact-match candidate generation: the ``bits``-bit
    signature splits into ``bands`` equal slices; two docs become
    candidates iff at least one slice matches exactly (an equi-join
    on (band, slice) — the only shuffle, and it moves two ints per
    row).  Pigeonhole guarantee: ≤ max_hamming differing bits can
    dirty at most max_hamming bands, so with bands > max_hamming
    every true pair shares a clean band — recall 1.0 at the
    threshold, no all-pairs comparison anywhere.  Candidates verify
    with bit_count(xor) ≤ max_hamming.
    """
    if bands <= max_hamming:
        raise ValueError("need bands > max_hamming for exact recall")
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    sig = _persist_eager(simhash_signature_df(df, text_col=text_col, key_col=key_col))
    banded = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "simhash",
    ).select(
        "doc_id",
        "band",
        F.expr(f"shiftright(simhash, band * {band_bits}) & {mask}").alias("slice"),
    )
    left = banded.select(F.col("doc_id").alias("doc1"), "band", "slice")
    right = banded.select(F.col("doc_id").alias("doc2"), "band", "slice")
    cand = (
        left.join(right, ["band", "slice"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .dropDuplicates(["doc1", "doc2"])
    )
    s1 = sig.select(F.col("doc_id").alias("doc1"), F.col("simhash").alias("h1"))
    s2 = sig.select(F.col("doc_id").alias("doc2"), F.col("simhash").alias("h2"))
    return (
        cand.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn("hamming", F.bit_count(F.expr("h1 ^ h2")).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )


@register(
    "d10_simhash_near_dup",
    oracle=f"""
WITH {_SIMHASH_SIG_CTE},
banded AS (
  SELECT doc_id, simhash, g.b AS band,
         (simhash >> (g.b * 15)) & 32767 AS slice
  FROM sig, generate_series(0, 3) AS g(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.slice = b.slice AND a.doc_id < b.doc_id
)
SELECT c.doc1, c.doc2,
       CAST(bit_count(xor(s1.simhash, s2.simhash)) AS INT) AS hamming
FROM cand c
JOIN sig s1 ON c.doc1 = s1.doc_id
JOIN sig s2 ON c.doc2 = s2.doc_id
WHERE bit_count(xor(s1.simhash, s2.simhash)) <= 3
""",
    tags=("dedup", "simhash", "lsh", "documents"),
    doc="SimHash near-duplicate pairs: 4×15-bit banded candidate join "
    "(pigeonhole: any pair within hamming 3 shares a clean band → "
    "recall 1.0 at the threshold), verified by bit_count(xor) ≤ 3.  "
    "Completes the signature query d05 into an actual dedup operator.",
)
def d10_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_dup_pairs(table(spark, sf_dir, "documents"))


@register(
    "d06_embedding_dedup_pairs",
    oracle="""
WITH base AS (
  SELECT vec_id, label, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, label, embedding FROM embeddings WHERE vec_id < 10
),
pts AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM base
),
bucketed AS (
  SELECT vec_id, label, v,
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
norms AS (
  SELECT vec_id,
         round(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                                             list_transform(v, x -> x * x)),
                                (acc, x) -> acc + x)), 6) AS nrm
  FROM pts
),
pairs AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         round(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])),
               (acc, x) -> acc + x), 8) AS dotp
  FROM bucketed a
  JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT p.id1, p.id2,
       p.dotp / (n1.nrm * n2.nrm) AS cos_sim
FROM pairs p
JOIN norms n1 ON p.id1 = n1.vec_id
JOIN norms n2 ON p.id2 = n2.vec_id
WHERE p.dotp / (n1.nrm * n2.nrm) >= 0.35
""",
    tags=("dedup", "embedding", "lsh"),
    doc="Embedding near-dup pairs: sign-LSH bucket (8 sampled dims) "
    "then exact cosine ≥ 0.35 within bucket.  The corpus is the base "
    "table plus planted exact copies (vec_id+100000 for vec_id < 10), "
    "so the query provably recovers known duplicates (cos = 1.0) "
    "alongside the natural near-pairs — a vacuous 0-row pass proves "
    "nothing.  Identical copies land in the same sign-LSH bucket by "
    "construction, so recall on the planted set is exactly 1.",
)
def d06_embedding_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flaco_spark.functions import cosine, norm

    e = table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding").unionAll(
        e.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    dims = (1, 9, 17, 25, 33, 41, 49, 57)
    pts = base.select(
        "vec_id",
        F.col("embedding").alias("v"),
        sign_lsh_bucket(F.col("embedding"), dims).alias("bucket"),
        norm(F.col("embedding")).alias("nrm"),
    )
    a = pts.select(
        F.col("vec_id").alias("id1"), F.col("v").alias("v1"),
        F.col("bucket"), F.col("nrm").alias("n1"),
    )
    b = pts.select(
        F.col("vec_id").alias("id2"), F.col("v").alias("v2"),
        F.col("bucket"), F.col("nrm").alias("n2"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cos_sim", cosine(F.col("v1"), F.col("v2"), F.col("n1"), F.col("n2")))
        .filter(F.col("cos_sim") >= 0.35)
        .select("id1", "id2", "cos_sim")
    )


# ---------------------------------------------------------------------------
# d11 — deterministic content-hash train/val/test split
# ---------------------------------------------------------------------------


@register(
    "d11_dataset_split",
    oracle="""
WITH bucketed AS (
  SELECT lang, n_chars,
         CAST('0x' || substr(md5(text), 1, 2) AS BIGINT) AS b
  FROM documents
)
SELECT CASE WHEN b < 204 THEN 'train'
            WHEN b < 230 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM bucketed
GROUP BY 1, 2
""",
    tags=("dedup", "split", "documents"),
    doc="Deterministic train/val/test split by CONTENT hash: md5(text) "
    "first byte maps each doc to one of 256 buckets, cut 80/10/10.  "
    "Hashing the content (not the id) sends byte-identical duplicates "
    "to the same split — the split survives re-ingestion, re-sharding "
    "and engine changes, and exact-dup leakage across train/test is "
    "structurally impossible.  Pure map-side classify + one "
    "partial-agg shuffle; at 100 TB the split column is computed at "
    "ingest and becomes a partition key.",
)
def d11_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    b = F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("bigint")
    split = (
        F.when(b < 204, "train").when(b < 230, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# d12 — deterministic class rebalancing (stratified downsample)
# ---------------------------------------------------------------------------


@register(
    "d12_class_rebalance",
    oracle="""
WITH sized AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
),
floor_n AS (SELECT MIN(n) AS m FROM sized),
ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(text), doc_id) AS rk
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM ranked, floor_n
WHERE rk <= m
GROUP BY lang
""",
    tags=("dedup", "sampling", "documents"),
    doc="Class rebalancing: deterministically downsample every "
    "language class to the smallest class's size by ranking docs "
    "within each class on md5(text) (doc_id tie-break for identical "
    "texts) and keeping the first floor-count — the reproducible "
    "stratified sample a balanced training mix needs, with no rand() "
    "anywhere.  A naive partitionBy(lang) window would put each of a "
    "handful of huge classes on ONE task at 100 TB; instead the rank "
    "comes from global_rank's range-partitioned distributed sort over "
    "(lang, md5, doc_id), converted to a per-class rank by "
    "subtracting each class's broadcast start offset — no task ever "
    "holds a whole class.  The oracle is the plain per-class window, "
    "so the hash-match machine-proves the distributed form "
    "equivalent (same device as q66 vs q61).",
)
def d12_class_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flaco_spark.operators.relational_ext import global_rank

    d = table(spark, sf_dir, "documents").withColumn("h", F.md5("text"))
    floor_n = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).agg(
        F.min("n").alias("m")
    )
    ranked, _ = global_rank(d, ["lang", "h", "doc_id"])
    # class start offsets: cumulative counts over the tiny per-class
    # aggregate (|classes| rows), broadcast back
    from pyspark.sql import Window as W

    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("cn"))
    w = W.orderBy("lang").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "lang", F.coalesce(F.sum("cn").over(w), F.lit(0)).alias("off")
    )
    return (
        ranked.join(F.broadcast(offsets), "lang")
        .crossJoin(F.broadcast(floor_n))
        .filter((F.col("_rank") - F.col("off")) <= F.col("m"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# d13 — canonicalized exact dedup (normalize, then hash-group)
# ---------------------------------------------------------------------------


@register(
    "d13_normalized_dedup",
    oracle=r"""
WITH norm AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                 ' +', ' ', 'g'))) AS h
  FROM documents
)
SELECT h AS norm_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_variants
FROM norm GROUP BY h
""",
    tags=("dedup", "normalize", "documents"),
    doc="Canonicalized exact dedup: documents hash-group on "
    "md5(normalize(text)) instead of the raw bytes, so case/"
    "punctuation/whitespace variants of the same content collapse "
    "into one class — the cheap recall win that runs BEFORE the "
    "expensive fuzzy passes (d01 raw-hash ⊂ this ⊂ d04 MinHash in "
    "recall order).  Same cost shape as d01: map-side normalize + "
    "one shuffle on a short hash key.",
)
def d13_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flaco_spark.operators.text import normalize_text

    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("norm_hash"))
        .groupBy("norm_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )


# ---------------------------------------------------------------------------
# d14 — train/test near-duplicate leakage audit
# ---------------------------------------------------------------------------


@register(
    "d14_split_leakage",
    oracle=f"""
WITH {_D04_PAIRS_CTE},
splits AS (
  SELECT doc_id,
         CASE WHEN CAST('0x' || substr(md5(text), 1, 2) AS BIGINT) < 204 THEN 'train'
              WHEN CAST('0x' || substr(md5(text), 1, 2) AS BIGINT) < 230 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT least(s1.split, s2.split) AS split_a,
       greatest(s1.split, s2.split) AS split_b,
       COUNT(*) AS n_near_dup_pairs
FROM pairs p
JOIN splits s1 ON p.doc1 = s1.doc_id
JOIN splits s2 ON p.doc2 = s2.doc_id
GROUP BY 1, 2
""",
    tags=("dedup", "split", "leakage", "audit", "documents"),
    doc="Train/test leakage audit: count verified near-duplicate "
    "pairs (d04's MinHash-LSH edges) that CROSS d11's content-hash "
    "split boundaries — exact duplicates can't leak (identical text "
    "hashes to the same split by construction) but near-duplicates "
    "can, and rows where split_a <> split_b are exactly the "
    "contaminated eval pairs a model audit must catch before "
    "training.  Reuses the engine's own dedup operators; cost = "
    "d04's pair mining + two broadcast-sized split joins.",
)
def d14_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(d)
    b = F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("bigint")
    splits = d.select(
        "doc_id",
        F.when(b < 204, "train").when(b < 230, "val").otherwise("test").alias("split"),
    )
    s1 = splits.select(F.col("doc_id").alias("doc1"), F.col("split").alias("sp1"))
    s2 = splits.select(F.col("doc_id").alias("doc2"), F.col("split").alias("sp2"))
    return (
        pairs.join(s1, "doc1")
        .join(s2, "doc2")
        .groupBy(
            F.least("sp1", "sp2").alias("split_a"),
            F.greatest("sp1", "sp2").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_near_dup_pairs"))
    )


# ---------------------------------------------------------------------------
# d15 — deterministic stratified sampling (per-language rates)
# ---------------------------------------------------------------------------

# Target per-mille keep rates per language: downsample the dominant
# language, keep the rest whole — the standard training-mix rebalance.
D15_RATES = {"en": 400, "de": 1000, "es": 1000, "fr": 1000, "zh": 700}
D15_DEFAULT_RATE = 1000


@register(
    "d15_stratified_sample",
    oracle=f"""
WITH rates(lang, keep_permille) AS (
  VALUES {", ".join(f"('{lang}', {r})" for lang, r in sorted(D15_RATES.items()))}
),
keyed AS (
  SELECT d.doc_id, d.lang, d.source,
         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 1000 AS bucket,
         COALESCE(r.keep_permille, {D15_DEFAULT_RATE}) AS keep_permille
  FROM documents d LEFT JOIN rates r ON d.lang = r.lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(*) FILTER (WHERE bucket < keep_permille) AS BIGINT) AS n_kept
FROM keyed
GROUP BY lang
""",
    tags=("dedup", "sampling", "stratified", "documents"),
    doc="Deterministic stratified sampling: per-language keep rates "
    "applied by hashing the STABLE key (md5(doc_id) mod 1000 < "
    "rate), never rand() — reruns, retries, and incremental "
    "ingestion all select the same rows, which is what makes a "
    "sampled training mix reproducible.  Pure map-side expression + "
    "one partial-aggregated groupBy(lang) for the audit counts; the "
    "sample itself never materializes on the driver.  The rate map "
    "is a broadcast-joined literal dimension (COALESCE default for "
    "unseen strata).",
)
def d15_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    rates = local_relation(
        spark, sorted(D15_RATES.items()), "lang string, keep_permille int"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 1000
    )
    keyed = (
        d.join(F.broadcast(rates), "lang", "left")
        .withColumn("keep_permille", F.coalesce("keep_permille", F.lit(D15_DEFAULT_RATE)))
        .withColumn("bucket", bucket)
    )
    return keyed.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.count(F.when(F.col("bucket") < F.col("keep_permille"), 1))
        .cast("bigint")
        .alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# d16 — benchmark decontamination (n-gram overlap vs an eval set)
# ---------------------------------------------------------------------------

D16_NGRAM = 4
D16_BENCH_MOD = 101  # doc_id % 101 == 7 plays the held-out benchmark set


@register(
    "d16_decontamination",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(t) - {D16_NGRAM - 1}, 0)),
           i -> md5(array_to_string(list_slice(t, i, i + {D16_NGRAM - 1}), ' '))
         )) AS gs
  FROM toks
),
bench AS (
  SELECT doc_id AS bench_id, unnest(gs) AS g FROM grams
  WHERE doc_id % {D16_BENCH_MOD} = 7
),
train AS (
  SELECT doc_id, unnest(gs) AS g FROM grams
  WHERE doc_id % {D16_BENCH_MOD} <> 7
)
SELECT t.doc_id,
       CAST(COUNT(DISTINCT t.g) AS BIGINT) AS n_shared_ngrams,
       CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
FROM train t JOIN bench b ON t.g = b.g
GROUP BY t.doc_id
""",
    tags=("dedup", "decontamination", "ngram", "documents"),
    doc="Train/eval decontamination (the GPT-3/PaLM 13-gram rule, "
    "here 4-gram): any training document sharing an n-gram with the "
    "held-out benchmark set is contaminated and must be dropped "
    "before training.  N-grams are hashed to fixed-width md5 keys "
    "map-side and de-duplicated per document, so the join carries "
    "(doc_id, hash) pairs — never text.  The benchmark side is "
    "eval-set-sized (tiny vs the corpus), so at 100 TB the equi-join "
    "broadcasts the benchmark grams and the whole check is one "
    "map-side pass over the training scan plus a partial-aggregated "
    "groupBy(doc_id); output is contaminated-docs-only sized.",
)
def d16_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks) - (D16_NGRAM - 1)
    # Guard the short-doc case explicitly: F.sequence(1, 0) yields the
    # DESCENDING [1, 0] (not an empty array), and slice(..., 0, k)
    # throws — a doc with fewer than D16_NGRAM tokens must contribute
    # no grams, matching the oracle's empty generate_series(1, 0).
    grams = F.when(
        n >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice(toks, i, F.lit(D16_NGRAM)))
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = _parallelize_scan(d).select(
        "doc_id", F.explode(grams).alias("g")
    )
    is_bench = (F.col("doc_id") % D16_BENCH_MOD) == 7
    bench = base.filter(is_bench).select(F.col("doc_id").alias("bench_id"), "g")
    train = base.filter(~is_bench)
    return (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").cast("bigint").alias("n_shared_ngrams"),
            F.countDistinct("bench_id").cast("bigint").alias("n_bench_docs"),
        )
    )


# ---------------------------------------------------------------------------
# d17 — containment near-dup (catches subset duplicates Jaccard misses)
# ---------------------------------------------------------------------------

D17_THRESHOLD = 0.9


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_n: int = 3,
    max_df: int = 10,
    threshold: float = D17_THRESHOLD,
) -> DataFrame:
    """Near-duplicate pairs by shingle CONTAINMENT: |A∩B| / min(|A|,|B|).

    Jaccard punishes length asymmetry — a document fully embedded in
    one 3× its size scores J = 1/3 and slips under any Jaccard
    threshold, yet for training-data dedup the smaller doc is pure
    redundancy.  Containment normalizes by the smaller shingle set,
    so truncations, quote-wrapping, and boilerplate-padding score
    ~1.0 regardless of length ratio (Broder's resemblance vs
    containment distinction).  Candidate generation and physical
    shape are shared with d08 (:func:`_ngram_candidate_pairs`).
    """
    cand, sh = _ngram_candidate_pairs(df, text_col, key_col, shingle_n, max_df)
    s1 = sh.select(F.col("doc_id").alias("doc1"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("doc2"), F.col("shingles").alias("sh2"))
    containment = (
        F.size(F.array_intersect(F.col("sh1"), F.col("sh2"))).cast("double")
        / F.least(F.size("sh1"), F.size("sh2")).cast("double")
    )
    return (
        cand.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn("containment", containment)
        .filter(F.col("containment") >= threshold)
        .select("doc1", "doc2", "containment")
    )


@register(
    "d17_containment_pairs",
    oracle=f"""
WITH reps AS (
  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
),
sh AS (
  SELECT doc_id, {_SHINGLE_SQL} AS shingles FROM reps
),
postings AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS shash
  FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh)
),
rare AS (
  SELECT shash FROM postings GROUP BY shash
  HAVING COUNT(*) BETWEEN 2 AND 10
),
keyed AS (
  SELECT p.shash, p.doc_id FROM postings p JOIN rare r ON p.shash = r.shash
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM keyed a JOIN keyed b ON a.shash = b.shash AND a.doc_id < b.doc_id
)
SELECT c.doc1, c.doc2,
       CAST(len(list_filter(s1.shingles, x -> list_contains(s2.shingles, x))) AS DOUBLE)
         / CAST(least(len(s1.shingles), len(s2.shingles)) AS DOUBLE) AS containment
FROM cand c
JOIN sh s1 ON c.doc1 = s1.doc_id
JOIN sh s2 ON c.doc2 = s2.doc_id
WHERE CAST(len(list_filter(s1.shingles, x -> list_contains(s2.shingles, x))) AS DOUBLE)
        / CAST(least(len(s1.shingles), len(s2.shingles)) AS DOUBLE) >= {D17_THRESHOLD}
""",
    tags=("dedup", "ngram", "containment", "documents"),
    doc="Containment dedup (|A∩B|/min|A|,|B| ≥ 0.9 over 3-token "
    "shingles): flags truncation/subset duplicates that Jaccard "
    "structurally misses (full embedding in a 3× doc ⇒ J = 1/3).  "
    "Same df-capped inverted index and single-shuffle physical plan "
    "as d08 — only the verify formula differs.",
)
def d17_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_containment_pairs(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# d18 — end-to-end dedup pass: cluster → keep the best-quality doc
# ---------------------------------------------------------------------------


from flaco_spark.operators.text import STOPWORDS as _D18_STOPWORDS

_D18_STOP_SQL = "', '".join(_D18_STOPWORDS)


@register(
    "d18_canonical_by_quality",
    oracle=rf"""
WITH RECURSIVE {_D04_PAIRS_CTE},
edges AS (
  SELECT doc1 AS src, doc2 AS dst FROM pairs
  UNION ALL
  SELECT doc2 AS src, doc1 AS dst FROM pairs
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON r.node = e.src
),
comp AS (
  SELECT node AS doc_id, MIN(label) AS component_id FROM reach GROUP BY node
),
quality AS (
  SELECT doc_id,
         (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
           * (1.0 - CAST(len(list_filter(toks, t -> t IN ('{_D18_STOP_SQL}'))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE)) AS q
  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents)
),
ranked AS (
  SELECT c.component_id, c.doc_id, q.q,
         COUNT(*) OVER (PARTITION BY c.component_id) AS n_members,
         ROW_NUMBER() OVER (PARTITION BY c.component_id
                            ORDER BY q.q DESC, c.doc_id) AS rnk
  FROM comp c JOIN quality q ON c.doc_id = q.doc_id
)
SELECT component_id,
       doc_id AS kept_doc,
       CAST(n_members AS BIGINT) AS n_members,
       q AS best_quality
FROM ranked WHERE rnk = 1 AND n_members >= 2
""",
    tags=("dedup", "minhash", "components", "quality", "pipeline", "documents"),
    doc="The END-TO-END dedup pass a production corpus actually runs, "
    "as one oracle-checked query: MinHash-LSH pairs (d04) → "
    "transitive clusters (d09's min-label propagation) → per-cluster "
    "CANONICAL SELECTION by quality score (t02's formula; ties break "
    "on doc_id) — keep the best-written copy, not the lowest id.  "
    "Clusters are near-dup-sized, so the per-cluster window is "
    "bounded; every stage reuses the already-verified building "
    "blocks, and the oracle recomputes the same fixpoint + argmax "
    "relationally (recursive CTE + window).",
)
def d18_canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PHYSICAL rewrite of the same relation (d09's collapse argument,
    # extended): quality q is a PURE TEXT function, so within an
    # exact-copy family every member scores identically and the
    # min-id tie-break elects the family rep; across families the
    # global (q desc, doc_id asc) winner is therefore always a rep.
    # CC, the member count (sum of family sizes), and the winner can
    # all be computed on the rep graph — parity-verified.
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", F.md5("text").alias("th"), "text")
    release_caches()
    # fams is the hub every stage reads (pairs lineage, CC node set,
    # quality, member counts) — unpersisted, its text-carrying shuffle
    # re-runs per consumer and per CC round.
    fams = _persist_eager(
        keyed.groupBy("th").agg(
            F.min("doc_id").alias("rep_id"),
            F.count(F.lit(1)).alias("fam_n"),
            F.first("text").alias("text"),
        ),
        release=False,
    )
    rep_docs = fams.select(F.col("rep_id").alias("doc_id"), "text")
    pairs = _pairs_over_distinct(rep_docs, release=False)
    comp = connected_components(rep_docs.select("doc_id"), pairs)
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*_D18_STOPWORDS)))
    quality = rep_docs.select(
        "doc_id",
        (
            (F.size(F.array_distinct(toks)).cast("double") / n_tokens)
            * (F.lit(1.0) - stop_hits.cast("double") / n_tokens)
        ).alias("q"),
    )
    joined = (
        comp.select("doc_id", "component_id")
        .join(quality, "doc_id")
        .join(fams.select(F.col("rep_id").alias("doc_id"), "fam_n"), "doc_id")
    )
    w_cnt = W.partitionBy("component_id")
    w_rnk = W.partitionBy("component_id").orderBy(F.desc("q"), F.asc("doc_id"))
    return (
        joined.withColumn("n_members", F.sum("fam_n").over(w_cnt))
        .withColumn("rnk", F.row_number().over(w_rnk))
        .filter((F.col("rnk") == 1) & (F.col("n_members") >= 2))
        .select(
            "component_id",
            F.col("doc_id").alias("kept_doc"),
            F.col("n_members").cast("bigint").alias("n_members"),
            F.col("q").alias("best_quality"),
        )
    )


# ---------------------------------------------------------------------------
# d20 — MinHash estimator calibration (estimated vs exact Jaccard)
# ---------------------------------------------------------------------------


@register(
    "d20_minhash_calibration",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLE_SQL} AS shingles FROM documents
),
hx AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {{'a': CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 576460752303423433,
                                        'b': CAST('0x' || substr(md5(s), 17, 15) AS BIGINT) % 576460752303423433}}) AS hp
  FROM sh
),
sig AS (
  SELECT doc_id, shingles,
         list_transform(generate_series(0, 7),
           j -> list_min(list_transform(hp, p -> (p.a + j * p.b) % 576460752303423433))) AS sig
  FROM hx
),
bands AS (
  SELECT doc_id, g.b AS band,
         md5(array_to_string(list_transform(list_slice(sig, g.b * 2 + 1, g.b * 2 + 2), x -> CAST(x AS VARCHAR)), '|')) AS band_key
  FROM sig, generate_series(0, 3) AS g(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc1, c.doc2,
       CAST(len(list_filter(generate_series(1, 8), i -> g1.sig[i] = g2.sig[i])) AS DOUBLE)
         / 8.0 AS est_jaccard,
       CAST(len(list_filter(g1.shingles, x -> list_contains(g2.shingles, x))) AS DOUBLE)
         / CAST(len(list_distinct(g1.shingles || g2.shingles)) AS DOUBLE) AS exact_jaccard,
       abs(CAST(len(list_filter(generate_series(1, 8), i -> g1.sig[i] = g2.sig[i])) AS DOUBLE) / 8.0
           - CAST(len(list_filter(g1.shingles, x -> list_contains(g2.shingles, x))) AS DOUBLE)
             / CAST(len(list_distinct(g1.shingles || g2.shingles)) AS DOUBLE)) <= 0.5 AS within_half
FROM cand c
JOIN sig g1 ON c.doc1 = g1.doc_id
JOIN sig g2 ON c.doc2 = g2.doc_id
""",
    tags=("dedup", "minhash", "calibration", "evidence", "documents"),
    doc="MinHash estimator calibration: for every LSH candidate pair, "
    "the signature-agreement fraction (matching coordinates / 8 — "
    "the unbiased Jaccard estimator, E[est] = J by the min-hash "
    "property) side-by-side with the EXACT shingle Jaccard, plus a "
    "|est − J| ≤ 0.5 audit flag (the 8-hash estimator's std-err is "
    "√(J(1−J)/8) ≈ 0.18 worst-case).  This is the evidence query "
    "that justifies d04's banding parameters the way e06/e09 justify "
    "the ANN indexes — parameter tuning reads THIS table, not luck.  "
    "Cost: the same banded shuffle as d04 plus an 8-term map-side "
    "comparison per candidate.",
)
def d20_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    cand, sig = _minhash_candidates(d)
    s1 = sig.select(
        F.col("doc_id").alias("doc1"),
        F.col("shingles").alias("sh1"),
        F.col("sig").alias("sig1"),
    )
    s2 = sig.select(
        F.col("doc_id").alias("doc2"),
        F.col("shingles").alias("sh2"),
        F.col("sig").alias("sig2"),
    )
    est = (
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.lit(8)),
                lambda i: F.element_at("sig1", i) == F.element_at("sig2", i),
            )
        ).cast("double")
        / F.lit(8.0)
    )
    return (
        cand.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn("est_jaccard", est)
        .withColumn("exact_jaccard", jaccard(F.col("sh1"), F.col("sh2")))
        .withColumn(
            "within_half",
            F.abs(F.col("est_jaccard") - F.col("exact_jaccard")) <= 0.5,
        )
        .select("doc1", "doc2", "est_jaccard", "exact_jaccard", "within_half")
    )


# ---------------------------------------------------------------------------
# d21 — duplicate-cluster size distribution
# ---------------------------------------------------------------------------


@register(
    "d21_cluster_size_histogram",
    oracle=f"""
WITH RECURSIVE {_D04_PAIRS_CTE},
edges AS (
  SELECT doc1 AS src, doc2 AS dst FROM pairs
  UNION ALL
  SELECT doc2 AS src, doc1 AS dst FROM pairs
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON r.node = e.src
),
comp AS (
  SELECT node AS doc_id, MIN(label) AS component_id FROM reach GROUP BY node
),
sizes AS (
  SELECT component_id, COUNT(*) AS cluster_size FROM comp GROUP BY component_id
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
       CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS n_removable
FROM sizes
GROUP BY cluster_size
""",
    tags=("dedup", "components", "histogram", "reporting", "documents"),
    doc="Duplicate-cluster size distribution: d09's transitive "
    "clusters rolled up to (cluster_size → n_clusters, docs held, "
    "docs removable) — the first table of any dedup report (real "
    "corpora are power-law: a few huge boilerplate clusters hold "
    "most of the removable mass, and THIS table is how you see "
    "them).  n_removable sums to the corpus-wide dedup yield.  Two "
    "tiny aggregations after the components fixpoint; output is "
    "distinct-sizes-sized.",
)
def d21_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(docs)
    comp = connected_components(docs.select("doc_id"), pairs)
    sizes = comp.groupBy("component_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            F.col("n_clusters").cast("bigint").alias("n_clusters"),
            (F.col("cluster_size") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_removable"),
        )
    )


# ---------------------------------------------------------------------------
# d22 — semantic dedup: cluster-then-pair (SemDeDup-shaped)
# ---------------------------------------------------------------------------

D22_THRESHOLD = 0.35


@register(
    "d22_semantic_dedup",
    oracle=f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 10
),
pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM base
),
norms AS (
  SELECT vec_id,
         round(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                                             list_transform(v, x -> x * x)),
                                (acc, x) -> acc + x)), 6) AS nrm
  FROM pts
),
seeds AS (
  SELECT p.vec_id AS seed_id, p.v AS sv, n.nrm AS sn
  FROM pts p JOIN norms n ON p.vec_id = n.vec_id
  WHERE p.vec_id % 97 = 3 AND p.vec_id < 100000
),
assigned AS (
  SELECT vec_id, seed_id AS cell FROM (
    SELECT p.vec_id, s.seed_id,
           ROW_NUMBER() OVER (
             PARTITION BY p.vec_id
             ORDER BY round(list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(generate_series(1, 64),
                                       i -> p.v[i] * s.sv[i])),
                      (acc, x) -> acc + x), 8) / (n.nrm * s.sn) DESC,
                      s.seed_id) AS rnk
    FROM pts p JOIN norms n ON p.vec_id = n.vec_id CROSS JOIN seeds s) t
  WHERE rnk = 1
),
pairs AS (
  SELECT a1.cell, a1.vec_id AS id1, a2.vec_id AS id2,
         round(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(generate_series(1, 64), i -> p1.v[i] * p2.v[i])),
               (acc, x) -> acc + x), 8) / (n1.nrm * n2.nrm) AS cos_sim
  FROM assigned a1
  JOIN assigned a2 ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
  JOIN pts p1 ON a1.vec_id = p1.vec_id
  JOIN pts p2 ON a2.vec_id = p2.vec_id
  JOIN norms n1 ON a1.vec_id = n1.vec_id
  JOIN norms n2 ON a2.vec_id = n2.vec_id
)
SELECT cell, id2 AS removed_id,
       MIN(id1) AS kept_id,
       MAX(cos_sim) AS max_sim
FROM pairs WHERE cos_sim >= {D22_THRESHOLD}
GROUP BY cell, id2
""",
    tags=("dedup", "embedding", "semantic", "kmeans"),
    doc="Semantic dedup, cluster-then-pair (the SemDeDup recipe, "
    "Abbas et al. 2023, arXiv:2303.09540): assign every embedding to "
    "its nearest seed centroid (broadcast seeds, map-side cosine — "
    "e07's assignment step), then compare pairs ONLY within a cell "
    "and drop the higher id of any pair above the similarity "
    "threshold (kept_id = lowest partner).  The corpus carries "
    "planted exact copies (vec_id+100000 for vec_id < 10) which land "
    "in their original's cell by construction, so recall on known "
    "duplicates is provably 1 — never a vacuous pass.  Scale shape: "
    "the only |corpus|-sized work is the broadcast assignment scan; "
    "pairing is per-cell, and with k grown proportionally to N "
    "(SemDeDup's operating point) cells stay O(1)-sized, so the "
    "within-cell join is linear in the corpus, never all-pairs.",
)
def d22_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from flaco_spark.functions import cosine, norm
    from flaco_spark.tables import table

    e = table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding").unionAll(
        e.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    pts = base.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("nrm", norm(F.col("v")))
    seeds = pts.filter(
        ((F.col("vec_id") % 97) == 3) & (F.col("vec_id") < 100000)
    ).select(
        F.col("vec_id").alias("seed_id"),
        F.col("v").alias("sv"),
        F.col("nrm").alias("sn"),
    )
    w = W.partitionBy("vec_id").orderBy(
        F.desc("seed_cos"), F.asc("seed_id")
    )
    # Materialized once: both sides of the within-cell self-join read
    # the cached assignment instead of re-running the broadcast
    # scoring scan (the most expensive stage) twice.
    assigned = _persist_eager(
        pts.crossJoin(F.broadcast(seeds))
        .withColumn(
            "seed_cos", cosine(F.col("v"), F.col("sv"), F.col("nrm"), F.col("sn"))
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", F.col("seed_id").alias("cell"), "v", "nrm")
    )
    a1 = assigned.select(
        F.col("cell"),
        F.col("vec_id").alias("id1"),
        F.col("v").alias("v1"),
        F.col("nrm").alias("n1"),
    )
    a2 = assigned.select(
        F.col("cell").alias("cell2"),
        F.col("vec_id").alias("id2"),
        F.col("v").alias("v2"),
        F.col("nrm").alias("n2"),
    )
    pairs = a1.join(
        a2, (a1.cell == a2.cell2) & (a1.id1 < a2.id2)
    ).withColumn(
        "cos_sim", cosine(F.col("v1"), F.col("v2"), F.col("n1"), F.col("n2"))
    )
    return (
        pairs.filter(F.col("cos_sim") >= F.lit(D22_THRESHOLD))
        .groupBy("cell", F.col("id2").alias("removed_id"))
        .agg(
            F.min("id1").alias("kept_id"),
            F.max("cos_sim").alias("max_sim"),
        )
    )


# ---------------------------------------------------------------------------
# d23 — blocklist filtering: approximate-membership prefilter + exact verify
# ---------------------------------------------------------------------------

D23_BUCKETS = 1 << 16


@register(
    "d23_blocklist_filter",
    oracle="""
WITH blocklist AS (
  SELECT DISTINCT text FROM documents WHERE doc_id % 31 = 0
)
SELECT d.doc_id, md5(d.text) AS text_hash
FROM documents d
WHERE EXISTS (SELECT 1 FROM blocklist b WHERE b.text = d.text)
""",
    tags=("dedup", "blocklist", "bloom", "semi-join", "documents"),
    doc="Blocklist removal with the Bloom-filter production shape: "
    "the blocklist (every 31st doc stands in for a takedown/opt-out "
    "list) is compressed to a broadcast set of 16-bit hash buckets; "
    "the corpus pre-filters map-side against that set (most rows "
    "exit after one hash — no shuffle), and ONLY bucket-hits proceed "
    "to the exact hash semi-join.  False positives cost one extra "
    "join row; false negatives are impossible (same-text ⇒ same "
    "bucket), so the emitted relation is EXACTLY the plain semi-join "
    "the oracle runs — approximation in the plan, none in the "
    "result, the same machine-checked-semantics contract as s01/s02.  "
    "At 100 TB the bucket set is KB-sized regardless of corpus size "
    "and the verify join touches only the hit fraction.",
)
def d23_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bl = (
        d.filter(F.col("doc_id") % 31 == 0)
        .select(F.md5(F.col("text")).alias("bh"))
        .distinct()
    )
    buckets = bl.select(
        (F.crc32(F.col("bh")) % D23_BUCKETS).cast("int").alias("bucket")
    ).distinct()
    candidates = (
        d.select("doc_id", F.md5(F.col("text")).alias("text_hash"))
        .withColumn(
            "bucket", (F.crc32(F.col("text_hash")) % D23_BUCKETS).cast("int")
        )
        .join(F.broadcast(buckets), "bucket")
    )
    return (
        candidates.join(
            F.broadcast(bl),
            candidates.text_hash == bl.bh,
            "left_semi",
        )
        .select("doc_id", "text_hash")
    )


# ---------------------------------------------------------------------------
# d19 — record linkage with blocking (fuzzy entity dedup)
# ---------------------------------------------------------------------------

D19_MAX_EDIT = 3  # levenshtein threshold for a candidate match


@register(
    "d19_record_linkage",
    oracle=f"""
WITH blocked AS (
  SELECT p_partkey, p_name, p_size,
         string_split(p_name, ' ')[-1] AS block_noun
  FROM part
)
SELECT a.p_partkey AS left_key, b.p_partkey AS right_key,
       a.p_name AS left_name, b.p_name AS right_name,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM blocked a
JOIN blocked b
  ON a.block_noun = b.block_noun
 AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {D19_MAX_EDIT}
""",
    tags=("dedup", "fuzzy", "blocking", "record-linkage", "part"),
    doc="Record linkage with blocking — the entity-resolution "
    "counterpart of the document dedup family: find part records "
    "whose names are near-identical (levenshtein <= 3) WITHOUT the "
    "all-pairs cross join.  Blocking key = (last name token, "
    "p_size): candidate pairs form only inside a block, so the "
    "comparison count is sum(|block|^2) rather than N^2 — the "
    "standard linkage discipline (Fellegi-Sunter style blocking).  "
    "Spark plan: one shuffle self-join on the composite block key "
    "(no broadcast: both sides are the full record set), "
    "`levenshtein` evaluated JVM-side inside codegen, a < b "
    "dedups the symmetric/self pairs at the join.  At 100 TB the "
    "block key choice is the scale lever: keys must keep blocks "
    "near-uniform (here noun x size ~ |vocab| x |sizes| cells); a "
    "skewed block would get AQE skew-join splitting, and a finer "
    "key (add brand) bounds it structurally.",
)
def d19_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_size",
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block_noun"),
    )
    a = p.select(
        F.col("p_partkey").alias("left_key"),
        F.col("p_name").alias("left_name"),
        F.col("p_size").alias("bs"),
        F.col("block_noun").alias("bn"),
    )
    b = p.select(
        F.col("p_partkey").alias("right_key"),
        F.col("p_name").alias("right_name"),
        F.col("p_size").alias("bs"),
        F.col("block_noun").alias("bn"),
    )
    return (
        a.join(b, ["bn", "bs"])
        .where(F.col("left_key") < F.col("right_key"))
        .where(
            F.levenshtein(F.col("left_name"), F.col("right_name")) <= D19_MAX_EDIT
        )
        .select(
            "left_key",
            "right_key",
            "left_name",
            "right_name",
            F.levenshtein(F.col("left_name"), F.col("right_name"))
            .cast("int")
            .alias("edit_dist"),
        )
    )


# ---------------------------------------------------------------------------
# d24 — exact substring dedup (token-window granularity)
# ---------------------------------------------------------------------------

D24_WINDOW = 8  # tokens per window (Lee et al. use 50 BPE tokens; the
#                 fixture's docs are short, so 8 keeps windows discriminative)
D24_FLAG_FRAC = 0.5


def exact_substring_profile(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    window: int = D24_WINDOW,
    flag_frac: float = D24_FLAG_FRAC,
) -> DataFrame:
    """Per-document duplicated-substring profile (the Spark-native form
    of Lee et al. 2021's exact substring dedup, arXiv:2107.06499).

    The suffix-array construction the paper uses is a shared-memory
    algorithm; the distributed equivalent is fixed-width token-window
    hashing: every position i contributes md5(tokens[i:i+w]), a window
    is DUPLICATED if it occurs in ≥ 2 distinct documents, and a
    document's dup_frac is the fraction of its window positions that
    are duplicated.  Unlike MinHash/SimHash (whole-document sketches),
    this is substring-granular: a unique article that embeds one
    boilerplate paragraph gets exactly that paragraph's windows
    flagged, which is the evidence a pipeline needs to CUT substrings
    rather than drop documents.

    Physical shape: explode to (window-hash, doc) postings — row count
    = total corpus token count, the same linear blow-up the suffix
    array pays — then one hash-keyed aggregation finds multi-doc
    windows and one join + per-doc aggregation computes the profile.
    Two shuffles total, both on high-cardinality uniform keys (md5
    hashes); no all-pairs stage anywhere, so the plan survives 100 TB
    (this is how the Dolma/RedPajama pipelines run the same rule).
    """
    toks = tokens(F.col(text_col))
    n_windows = F.greatest(F.size(toks) - F.lit(window - 1), F.lit(1))
    d = _parallelize_scan(df).select(
        F.col(key_col).alias("doc_id"),
        n_windows.cast("bigint").alias("n_windows"),
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, window))),
        ).alias("wins"),
    )
    d = _persist_eager(d)
    postings = d.select("doc_id", F.explode("wins").alias("h"))
    dup_hashes = (
        postings.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("h")
    )
    per_doc = (
        postings.join(dup_hashes, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dup_windows"))
    )
    frac = F.col("dup_windows").cast("double") / F.col("n_windows").cast("double")
    return (
        d.select("doc_id", "n_windows")
        .join(per_doc, "doc_id", "left")
        .withColumn("dup_windows", F.coalesce("dup_windows", F.lit(0).cast("bigint")))
        .withColumn("dup_frac", frac)
        .withColumn("flagged", frac >= F.lit(flag_frac))
    )


@register(
    "d24_exact_substring_dedup",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
wins AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(t, i, i + {D24_WINDOW - 1}), ' ')) AS h
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t) - {D24_WINDOW - 1}, 1))) AS i
        FROM toks)
),
dup AS (
  SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT w.doc_id, COUNT(*) AS dup_windows
  FROM wins w JOIN dup USING (h) GROUP BY w.doc_id
)
SELECT t.doc_id,
       CAST(greatest(len(t.t) - {D24_WINDOW - 1}, 1) AS BIGINT) AS n_windows,
       CAST(COALESCE(p.dup_windows, 0) AS BIGINT) AS dup_windows,
       CAST(COALESCE(p.dup_windows, 0) AS DOUBLE)
         / CAST(greatest(len(t.t) - {D24_WINDOW - 1}, 1) AS DOUBLE) AS dup_frac,
       CAST(COALESCE(p.dup_windows, 0) AS DOUBLE)
         / CAST(greatest(len(t.t) - {D24_WINDOW - 1}, 1) AS DOUBLE)
         >= {D24_FLAG_FRAC} AS flagged
FROM toks t LEFT JOIN per_doc p USING (doc_id)
""",
    tags=("dedup", "substring", "documents"),
    doc="Exact substring dedup at token-window granularity (the "
    "distributed form of Lee et al. 2021's suffix-array rule, "
    "arXiv:2107.06499): every 8-token window position is hashed, a "
    "window occurring in ≥ 2 distinct documents is duplicated, and "
    "each document reports its duplicated-window fraction (flagged at "
    "≥ 0.5).  Substring-granular where d03-d10 are whole-document: "
    "it localizes WHICH spans are boilerplate, the evidence needed to "
    "cut text rather than drop documents.  Postings explode = corpus "
    "token count (the suffix array's own linear cost); two "
    "uniform-key shuffles, no all-pairs — the Dolma/RedPajama shape.",
)
def d24_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_substring_profile(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# d25 — incremental ingest dedup: new batch vs frozen corpus index
# ---------------------------------------------------------------------------

D25_BATCH_MOD = 10  # doc_id % 10 == 0 → "today's batch"; rest = corpus


def incremental_dedup_status(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    batch_mod: int = D25_BATCH_MOD,
    threshold: float = 0.6,
) -> DataFrame:
    """Status of each BATCH document against the frozen corpus:
    ``exact`` (corpus has the same md5), ``near`` (LSH-verified
    Jaccard ≥ threshold with some corpus doc), else ``new``.

    This is the topology every production corpus actually runs —
    yesterday's index is FROZEN, only today's batch is scored — and
    its physical shape differs from d04's self-join in the way that
    matters at 100 TB: signatures/bands for the corpus are computed
    once (in production: READ from the signature index the last
    ingest persisted; here derived in the same job so the gate can
    check end-to-end), and the banded join is batch-side × corpus-side
    only — candidate work scales with |batch| × bucket-collision rate,
    independent of |corpus|² (corpus×corpus pairing never happens).
    The exact tier is a broadcast-sized md5 semi-join.
    """
    is_batch = (F.col("doc_id") % batch_mod) == 0
    sh = _parallelize_scan(df).select(
        F.col(key_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("th"),
        word_shingles(F.col(text_col), 3).alias("shingles"),
    )
    sig = _persist_eager(
        sh.withColumn("sig", minhash_signature(F.col("shingles"), 8))
    )
    banded = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
        "sig",
    ).withColumn("band_key", lsh_band_key(F.col("sig"), F.col("band"), 2))
    bb = banded.filter(is_batch).select(
        F.col("doc_id").alias("bid"), "band", "band_key"
    )
    bc = banded.filter(~is_batch).select(
        F.col("doc_id").alias("cid"), "band", "band_key"
    )
    cand = (
        bb.join(bc, ["band", "band_key"])
        .select("bid", "cid")
        .dropDuplicates(["bid", "cid"])
    )
    s1 = sig.select(F.col("doc_id").alias("bid"), F.col("shingles").alias("sh1"))
    s2 = sig.select(F.col("doc_id").alias("cid"), F.col("shingles").alias("sh2"))
    near_ids = (
        cand.join(s1, "bid")
        .join(s2, "cid")
        .filter(jaccard(F.col("sh1"), F.col("sh2")) >= threshold)
        .select(F.col("bid").alias("doc_id"))
        .distinct()
        .withColumn("is_near", F.lit(True))
    )
    # The corpus hash index is CORPUS-sized — never broadcast it.  A
    # plain th-keyed join lets AQE broadcast only when the corpus side
    # is actually small; at 100 TB it stays a shuffle semi-join against
    # the persisted hash index.
    corpus_th = (
        sig.filter(~is_batch).select("th").distinct().withColumn("in_corpus", F.lit(True))
    )
    return (
        sig.filter(is_batch)
        .select("doc_id", "th")
        .join(corpus_th, "th", "left")
        .join(near_ids, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("in_corpus"), F.lit("exact"))
            .when(F.col("is_near"), F.lit("near"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )


@register(
    "d25_incremental_dedup",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, md5(text) AS th, {_SHINGLE_SQL} AS shingles FROM documents
),
hx AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {{'a': CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 576460752303423433,
                                        'b': CAST('0x' || substr(md5(s), 17, 15) AS BIGINT) % 576460752303423433}}) AS hp
  FROM sh
),
sig AS (
  SELECT doc_id, shingles,
         list_transform(generate_series(0, 7),
           j -> list_min(list_transform(hp, p -> (p.a + j * p.b) % 576460752303423433))) AS sig
  FROM hx
),
bands AS (
  SELECT doc_id, g.b AS band,
         md5(array_to_string(list_transform(list_slice(sig, g.b * 2 + 1, g.b * 2 + 2), x -> CAST(x AS VARCHAR)), '|')) AS band_key
  FROM sig, generate_series(0, 3) AS g(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS bid, b.doc_id AS cid
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id % {D25_BATCH_MOD} = 0 AND b.doc_id % {D25_BATCH_MOD} <> 0
),
near AS (
  SELECT DISTINCT c.bid AS doc_id
  FROM cand c
  JOIN sh s1 ON c.bid = s1.doc_id
  JOIN sh s2 ON c.cid = s2.doc_id
  WHERE CAST(len(list_filter(s1.shingles, x -> list_contains(s2.shingles, x))) AS DOUBLE)
          / CAST(len(list_distinct(s1.shingles || s2.shingles)) AS DOUBLE) >= 0.6
)
SELECT b.doc_id,
       CASE WHEN EXISTS (SELECT 1 FROM sh c
                         WHERE c.doc_id % {D25_BATCH_MOD} <> 0 AND c.th = b.th)
            THEN 'exact'
            WHEN b.doc_id IN (SELECT doc_id FROM near) THEN 'near'
            ELSE 'new' END AS status
FROM sh b WHERE b.doc_id % {D25_BATCH_MOD} = 0
""",
    tags=("dedup", "minhash", "lsh", "incremental", "documents"),
    doc="Incremental ingest dedup — the nightly-batch topology: docs "
    "with doc_id % 10 = 0 play 'today's batch', the rest the frozen "
    "corpus, and every batch doc is classified exact (corpus md5 "
    "match — the corpus-sized hash index joins UNHINTED, so AQE "
    "broadcasts only a small corpus), near (batch-side × corpus-side "
    "banded MinHash-LSH candidates, exact-Jaccard-verified ≥ 0.6 — "
    "the SAME 4×2 parameterization d04/d20 audit), or new.  The "
    "physical contract vs d04: candidates join batch bands against "
    "corpus bands only, so work scales with |batch|, not |corpus|² "
    "(in production the corpus side is the persisted signature index "
    "of the last ingest, not recomputed).",
)
def d25_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return incremental_dedup_status(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# d26 — dataset fingerprint (order-independent content digest)
# ---------------------------------------------------------------------------


@register(
    "d26_dataset_fingerprint",
    oracle="""
WITH h AS (
  SELECT CASE WHEN CAST('0x' || substr(md5(text), 1, 2) AS BIGINT) < 204 THEN 'train'
              WHEN CAST('0x' || substr(md5(text), 1, 2) AS BIGINT) < 230 THEN 'val'
              ELSE 'test' END AS split,
         n_chars,
         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h60
  FROM documents
)
SELECT split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       bit_xor(h60) AS content_digest,
       CAST(SUM(h60 % 1000003) AS BIGINT) AS content_checksum
FROM h GROUP BY split
""",
    tags=("dedup", "fingerprint", "manifest", "documents"),
    doc="Dataset fingerprint — the reproducibility digest a corpus "
    "release ships: per split (d11's content-hash rule), doc count, "
    "char mass, and TWO order-independent content digests (bit_xor "
    "of each doc's 60-bit md5 prefix, and a modular sum — xor alone "
    "is blind to doubled docs, the sum catches multiplicity).  Any "
    "re-ingestion, re-shard, or engine migration that preserves "
    "content reproduces the digests bit-for-bit; any silent "
    "corruption, loss, or duplication moves them.  Pure map-side "
    "hashing + one partial-agg shuffle to 3 rows — free at any "
    "scale, and the cheapest end-to-end integrity check two "
    "pipelines (or two engines, as this gate itself proves) can "
    "compare.",
)
def d26_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    b = F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("bigint")
    h60 = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint")
    split = F.when(b < 204, "train").when(b < 230, "val").otherwise("test")
    return (
        d.select(split.alias("split"), "n_chars", h60.alias("h60"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.expr("bit_xor(h60)").alias("content_digest"),
            F.sum(F.col("h60") % 1000003).cast("bigint").alias("content_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# d27 — soft dedup: cluster-size-inverse sampling instead of dropping
# ---------------------------------------------------------------------------


@register(
    "d27_soft_dedup_sampling",
    oracle=f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, {_SHINGLE_SQL} AS shingles FROM documents
),
hx AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {{'a': CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 576460752303423433,
                                        'b': CAST('0x' || substr(md5(s), 17, 15) AS BIGINT) % 576460752303423433}}) AS hp
  FROM sh
),
sig AS (
  SELECT doc_id, shingles,
         list_transform(generate_series(0, 7),
           j -> list_min(list_transform(hp, p -> (p.a + j * p.b) % 576460752303423433))) AS sig
  FROM hx
),
bands AS (
  SELECT doc_id, g.b AS band,
         md5(array_to_string(list_transform(list_slice(sig, g.b * 2 + 1, g.b * 2 + 2), x -> CAST(x AS VARCHAR)), '|')) AS band_key
  FROM sig, generate_series(0, 3) AS g(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT c.doc1, c.doc2
  FROM cand c
  JOIN sh s1 ON c.doc1 = s1.doc_id
  JOIN sh s2 ON c.doc2 = s2.doc_id
  WHERE CAST(len(list_filter(s1.shingles, x -> list_contains(s2.shingles, x))) AS DOUBLE)
          / CAST(len(list_distinct(s1.shingles || s2.shingles)) AS DOUBLE) >= 0.6
),
edges AS (
  SELECT doc1 AS src, doc2 AS dst FROM pairs
  UNION ALL
  SELECT doc2 AS src, doc1 AS dst FROM pairs
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON r.node = e.src
),
comp AS (
  SELECT node AS doc_id, MIN(label) AS component_id FROM reach GROUP BY node
),
sized AS (
  SELECT c.doc_id, c.component_id,
         COUNT(*) OVER (PARTITION BY c.component_id) AS cluster_size
  FROM comp c
)
SELECT doc_id,
       component_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT)
         * cluster_size < 256 AS keep
FROM sized
""",
    tags=("dedup", "sampling", "soft-dedup", "components", "documents"),
    doc="Soft dedup — keep duplicates with probability 1/|cluster| "
    "instead of dropping them: every document gets its d09 transitive "
    "cluster's size, and survives iff md5(doc_id)'s first byte × "
    "cluster_size < 256 — a deterministic coin whose keep rate is "
    "⌈256/size⌉/256 ≈ 1/size, so every near-dup CLUSTER contributes "
    "~one expected document while which copy survives stays unbiased "
    "(hard dedup always keeps the min-id or best-quality copy — d07/"
    "d18 — which skews toward whatever correlates with id or the "
    "quality score).  This is the down-weighting recipe corpus "
    "builders use when duplication frequency itself carries signal.  "
    "Pure integer coin, no floats; adds one hash-agg + window over "
    "d09's CC output.",
)
def d27_soft_dedup_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    comp = d09_dedup_components(spark, sf_dir).select("doc_id", "component_id")
    sized = comp.withColumn(
        "cluster_size",
        F.count(F.lit(1)).over(W.partitionBy("component_id")).cast("bigint"),
    )
    byte = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast(
        "bigint"
    )
    return sized.select(
        "doc_id",
        "component_id",
        "cluster_size",
        (byte * F.col("cluster_size") < 256).alias("keep"),
    )


# ---------------------------------------------------------------------------
# d28 — domain-interleaved write order (mixture batching)
# ---------------------------------------------------------------------------


@register(
    "d28_mixture_interleave",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(text), doc_id) AS rn
  FROM documents
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rn, source, doc_id) AS BIGINT)
         AS position,
       doc_id, source, CAST(rn AS BIGINT) AS within_source_rank
FROM ranked
""",
    tags=("dedup", "mixture", "interleave", "ordering", "documents"),
    doc="Domain-interleaved WRITE ORDER: documents get a "
    "content-deterministic shuffle within their source (order by "
    "md5(text) — d11's portable-randomness device, so the order is "
    "reproducible and uncorrelated with ingestion order) and the "
    "global position round-robins across sources (sort by "
    "(within-source rank, source)) — the batch-composition policy "
    "that keeps every training window source-balanced instead of "
    "serving a million consecutive rows from one crawl (the "
    "curriculum accident that shifts early-training gradients; t16's "
    "mixture CARD says what the ratios are, this op lays the bytes "
    "out so ANY contiguous read realizes them).  Two window sorts; "
    "at 100 TB this is the final sort before the training-shard "
    "write, where the same (rank, source) key feeds a "
    "repartitionByRange so each output shard holds one contiguous, "
    "already-interleaved position range.",
)
def d28_mixture_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from flaco_spark.tables import table

    d = table(spark, sf_dir, "documents")
    w_src = W.partitionBy("source").orderBy(F.md5("text"), F.asc("doc_id"))
    ranked = d.select(
        "doc_id", "source", F.row_number().over(w_src).alias("rn")
    )
    w_all = W.orderBy("rn", "source", "doc_id")
    return ranked.select(
        F.row_number().over(w_all).cast("bigint").alias("position"),
        "doc_id",
        "source",
        F.col("rn").cast("bigint").alias("within_source_rank"),
    )


# ---------------------------------------------------------------------------
# d29 — dedup ladder: which normalization level collapses each doc
# ---------------------------------------------------------------------------


@register(
    "d29_dedup_ladder",
    oracle=r"""
WITH lv AS (
  SELECT doc_id,
         md5(text) AS h0,
         md5(lower(text)) AS h1,
         md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS h2,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                 ' +', ' ', 'g'))) AS h3
  FROM documents
),
m AS (
  SELECT doc_id,
         doc_id > MIN(doc_id) OVER (PARTITION BY h0) AS d0,
         doc_id > MIN(doc_id) OVER (PARTITION BY h1) AS d1,
         doc_id > MIN(doc_id) OVER (PARTITION BY h2) AS d2,
         doc_id > MIN(doc_id) OVER (PARTITION BY h3) AS d3
  FROM lv
)
SELECT CASE WHEN d0 THEN 'exact'
            WHEN d1 THEN 'casefold'
            WHEN d2 THEN 'whitespace'
            WHEN d3 THEN 'alnum'
            ELSE 'unique' END AS first_dup_level,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM m GROUP BY 1
""",
    tags=("dedup", "normalization", "audit", "documents"),
    doc="The DEDUP LADDER audit: for every document, the FIRST "
    "normalization level at which it becomes a duplicate of an "
    "earlier doc — exact bytes → casefold → whitespace-collapse → "
    "alphanumeric-only (d13's full normalization) — aggregated to "
    "how many docs each rung newly collapses.  This is the report "
    "that DECIDES a pipeline's normalization policy: if 'casefold' "
    "collapses almost nothing beyond 'exact', the cheaper hash "
    "suffices; if 'alnum' explodes, punctuation noise dominates and "
    "near-dedup thresholds need re-tuning (d20's calibration).  Four "
    "hash columns in one scan, four min-id windows sharing the "
    "per-hash partitioning — at 100 TB this costs four hash-key "
    "shuffles of (doc_id, 16-byte hash) pairs, never text.",
)
def d29_dedup_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from flaco_spark.tables import table

    d = table(spark, sf_dir, "documents")
    low = F.lower("text")
    ws = F.trim(F.regexp_replace(low, " +", " "))
    alnum = F.trim(
        F.regexp_replace(F.regexp_replace(low, "[^a-z0-9 ]", " "), " +", " ")
    )
    lv = d.select(
        "doc_id",
        F.md5("text").alias("h0"),
        F.md5(low).alias("h1"),
        F.md5(ws).alias("h2"),
        F.md5(alnum).alias("h3"),
    )
    def dup(h):
        return F.col("doc_id") > F.min("doc_id").over(W.partitionBy(h))

    m = lv.select(
        "doc_id",
        dup("h0").alias("d0"),
        dup("h1").alias("d1"),
        dup("h2").alias("d2"),
        dup("h3").alias("d3"),
    )
    level = (
        F.when(F.col("d0"), "exact")
        .when(F.col("d1"), "casefold")
        .when(F.col("d2"), "whitespace")
        .when(F.col("d3"), "alnum")
        .otherwise("unique")
    )
    return m.groupBy(level.alias("first_dup_level")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# d30 — Bloom-filter prefiltered decontamination (constant-size broadcast)
# ---------------------------------------------------------------------------

D30_BITS = 4096  # filter width m; k=3 positions per key
D30_BENCH_MOD = 50  # doc_id % 50 == 0 → held-out benchmark split


def _d30_pos_sql(col: str, off: int) -> str:
    """Bloom position j from md5 hex chars [3j+1 .. 3j+3] (ascii mix)."""
    a = f"ascii(substring({col}, {off + 1}, 1))"
    b = f"ascii(substring({col}, {off + 2}, 1))"
    c = f"ascii(substring({col}, {off + 3}, 1))"
    return f"(({a} * 17161 + {b} * 131 + {c}) % {D30_BITS})"


@register(
    "d30_bloom_decontamination",
    oracle=f"""
WITH bench AS (
  SELECT DISTINCT md5(text) AS k FROM documents WHERE doc_id % {D30_BENCH_MOD} = 0
),
bits AS (
  SELECT DISTINCT pos FROM (
    SELECT {_d30_pos_sql("k", 0)} AS pos FROM bench
    UNION ALL SELECT {_d30_pos_sql("k", 3)} FROM bench
    UNION ALL SELECT {_d30_pos_sql("k", 6)} FROM bench
  )
),
corpus AS (
  SELECT doc_id, source, md5(text) AS k FROM documents
),
cand AS (
  SELECT c.doc_id, c.source, c.k FROM corpus c
  JOIN bits b1 ON b1.pos = {_d30_pos_sql("c.k", 0)}
  JOIN bits b2 ON b2.pos = {_d30_pos_sql("c.k", 3)}
  JOIN bits b3 ON b3.pos = {_d30_pos_sql("c.k", 6)}
),
conta AS (
  SELECT DISTINCT c.doc_id, c.source FROM cand c
  WHERE EXISTS (SELECT 1 FROM bench b WHERE b.k = c.k)
)
SELECT c.source,
       CAST(COUNT(*) AS BIGINT) AS n_corpus,
       CAST(COALESCE(MAX(cd.n), 0) AS BIGINT) AS n_candidates,
       CAST(COALESCE(MAX(ct.n), 0) AS BIGINT) AS n_contaminated,
       CAST(COUNT(*) - COALESCE(MAX(ct.n), 0) AS BIGINT) AS n_kept
FROM corpus c
LEFT JOIN (SELECT source, COUNT(*) AS n FROM cand GROUP BY source) cd
  ON cd.source = c.source
LEFT JOIN (SELECT source, COUNT(*) AS n FROM conta GROUP BY source) ct
  ON ct.source = c.source
GROUP BY c.source
""",
    tags=("dedup", "decontamination", "bloom", "broadcast", "documents"),
    doc="Decontamination via a DISTRIBUTED Bloom-filter prefilter "
    "(Bloom 1970): the benchmark split's content hashes are folded "
    f"into an m={D30_BITS}-bit / k=3 filter built as a distinct "
    "bit-POSITION relation (a distributed aggregate — no driver "
    "sketch object, no collect), the corpus is screened map-side by "
    "joining all three of its positions against the broadcast bit "
    "set, and only the surviving candidates meet the real benchmark "
    "keys in an exact confirm join that clears Bloom false "
    "positives.  Physically DIFFERENT from d16's broadcast-the-keys "
    "strategy, and the reason this exists: the filter's broadcast "
    "size is CONSTANT in benchmark cardinality (m bits, here ≤4096 "
    "rows), so at 100 TB — where the contamination blocklist itself "
    "can outgrow a broadcast — the full corpus scan still never "
    "shuffles; only the candidate sliver (FPR ≈ (bits_set/m)^3 of "
    "the corpus plus true hits) reaches the exact join.  The "
    "screened corpus is the WHOLE documents table while the "
    "benchmark is carved from it by doc_id — the classic "
    "'eval set leaked into the crawl' scenario, which guarantees "
    "every benchmark text has at least its own verbatim copy to "
    "catch (non-vacuous true positives at every SF).  Output: "
    "per-source corpus/candidate/contaminated/kept counts — "
    "n_candidates > n_contaminated is the false-positive margin "
    "made visible, and every count is mirrored bit-for-bit by the "
    "oracle's SQL re-derivation of the same filter.",
)
def d30_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    def pos(col: F.Column, off: int) -> F.Column:
        a = F.ascii(F.substring(col, off + 1, 1))
        b = F.ascii(F.substring(col, off + 2, 1))
        c = F.ascii(F.substring(col, off + 3, 1))
        return (a * 17161 + b * 131 + c) % D30_BITS

    d = table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id", "source", F.md5(F.col("text")).alias("k")
    )
    is_bench = (F.col("doc_id") % D30_BENCH_MOD) == 0
    bench = keyed.filter(is_bench).select("k").distinct()
    corpus = keyed
    bits = (
        bench.select(pos(F.col("k"), 0).alias("pos"))
        .unionAll(bench.select(pos(F.col("k"), 3)))
        .unionAll(bench.select(pos(F.col("k"), 6)))
        .distinct()
    )
    cand = (
        corpus.join(
            F.broadcast(bits.withColumnRenamed("pos", "p1")),
            F.col("p1") == pos(F.col("k"), 0),
        )
        .join(
            F.broadcast(bits.withColumnRenamed("pos", "p2")),
            F.col("p2") == pos(F.col("k"), 3),
        )
        .join(
            F.broadcast(bits.withColumnRenamed("pos", "p3")),
            F.col("p3") == pos(F.col("k"), 6),
        )
        .select("doc_id", "source", "k")
    )
    conta = cand.join(F.broadcast(bench), "k", "left_semi").select(
        "doc_id", "source"
    ).distinct()
    per_corpus = corpus.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_corpus")
    )
    per_cand = cand.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    per_conta = conta.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_contaminated")
    )
    return (
        per_corpus.join(per_cand, "source", "left")
        .join(per_conta, "source", "left")
        .select(
            "source",
            "n_corpus",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias("n_candidates"),
            F.coalesce("n_contaminated", F.lit(0)).cast("bigint").alias("n_contaminated"),
            (F.col("n_corpus") - F.coalesce("n_contaminated", F.lit(0)))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# d31 — effective corpus size (dedup-weighted token budget)
# ---------------------------------------------------------------------------


@register(
    "d31_effective_corpus_size",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, source, md5(text) AS h,
         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
  FROM documents
),
uniq AS (
  SELECT source, h, MIN(n_tok) AS n_tok, CAST(COUNT(*) AS BIGINT) AS copies
  FROM toks GROUP BY source, h
)
SELECT t.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(t.n_tok) AS BIGINT) AS raw_tokens,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM uniq u WHERE u.source = t.source) AS unique_docs,
       (SELECT CAST(SUM(u.n_tok) AS BIGINT) FROM uniq u WHERE u.source = t.source) AS effective_tokens,
       CAST(SUM(t.n_tok) AS BIGINT)
         - (SELECT CAST(SUM(u.n_tok) AS BIGINT) FROM uniq u WHERE u.source = t.source)
         AS duplicated_tokens
FROM toks t GROUP BY t.source
""",
    tags=("dedup", "tokens", "budget", "documents"),
    doc="Effective corpus size — the dedup-weighted token budget "
    "every data-curation decision starts from: per source, raw "
    "token mass vs the EFFECTIVE mass after exact dedup (each "
    "duplicate cluster contributes its text once), and the "
    "duplicated-token overhang a dedup pass would reclaim.  This "
    "is the number that decides whether a source is worth keeping "
    "at 100 TB (a source can be 40% phantom mass), computed "
    "WITHOUT materializing the deduped corpus: one md5-grouped "
    "aggregate per source, token counts as integers (whitespace "
    "tokenizer shared with t01), all sums exact.  Shape: two "
    "partial-agg passes over (source, md5) — no pair joins, no "
    "text shuffles beyond the md5-keyed reduce.",
)
def d31_effective_corpus_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flaco_spark.tables import table as _table

    d = _table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", r"\s+")).cast("bigint").alias("n_tok"),
    )
    raw = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("raw_tokens"),
    )
    uniq = (
        toks.groupBy("source", "h")
        .agg(F.min("n_tok").alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("unique_docs"),
            F.sum("n_tok").cast("bigint").alias("effective_tokens"),
        )
    )
    return raw.join(uniq, "source").select(
        "source",
        "n_docs",
        "raw_tokens",
        "unique_docs",
        "effective_tokens",
        (F.col("raw_tokens") - F.col("effective_tokens"))
        .cast("bigint")
        .alias("duplicated_tokens"),
    )


# ---------------------------------------------------------------------------
# d32 — soft dedup weights (reweight instead of drop)
# ---------------------------------------------------------------------------


@register(
    "d32_soft_dedup_weights",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, md5(text) AS h,
         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
  FROM documents
),
cl AS (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS copies FROM toks GROUP BY h
)
SELECT t.doc_id,
       t.n_tok,
       c.copies,
       round(1.0 / c.copies, 8) AS weight,
       round(CAST(t.n_tok AS DOUBLE) / c.copies, 8) AS eff_tokens
FROM toks t JOIN cl c ON t.h = c.h
""",
    tags=("dedup", "weights", "training", "documents"),
    doc="SOFT deduplication — reweight duplicates instead of dropping "
    "them (the sampling-weight alternative to d01's hard dedup that "
    "recent data-curation work prefers when duplicates carry signal): "
    "every document gets weight 1/|its exact-hash cluster|, so each "
    "distinct text contributes exactly one document-equivalent of "
    "sampling mass and the corpus-level expected token mix equals "
    "the deduped corpus WITHOUT discarding any row (the trainer "
    "consumes the weight column directly).  Integer cluster sizes "
    "make 1/copies and n_tok/copies single IEEE divisions — "
    "deterministic, hash-matchable.  Shape: one md5-keyed count "
    "shuffle + a join back on the SAME key (co-partitioned, no "
    "second exchange); no text ever shuffles twice.  At 100 TB this "
    "is d01's exact scale story with the kept-side semantics "
    "inverted.",
)
def d32_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.md5("text").alias("h"),
        F.size(F.split("text", r"\s+")).cast("bigint").alias("n_tok"),
    )
    cl = toks.groupBy("h").agg(F.count(F.lit(1)).cast("bigint").alias("copies"))
    return toks.join(cl, "h").select(
        "doc_id",
        "n_tok",
        "copies",
        F.round(F.lit(1.0) / F.col("copies"), 8).alias("weight"),
        F.round(F.col("n_tok").cast("double") / F.col("copies"), 8).alias(
            "eff_tokens"
        ),
    )
