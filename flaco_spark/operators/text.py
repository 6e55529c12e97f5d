"""Text analysis operators over the ``documents`` table.

All of these are single-pass, map-side-only column expressions (no
shuffle except the final optional aggregation) — at 100 TB they scale
linearly with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flaco_spark.functions import tokens
from flaco_spark.inventory import register
from flaco_spark.localrel import local_relation
from flaco_spark.tables import table

# Tiny deterministic stopword lexicons for the heuristic language-ID.
# (The synthetic corpus is English-ish; docs with no hits → 'und'.)
LEXICONS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "es": ("el", "la", "de", "y", "que", "es"),
    "fr": ("le", "les", "de", "et", "est", "une"),
    "zh": ("de5", "le5", "shi4", "bu4"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "is", "in", "that", "it", "for")


def _hit_count(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_scores(text_col: Column) -> dict[str, Column]:
    toks = tokens(text_col)
    return {lang: _hit_count(toks, words) for lang, words in LEXICONS.items()}


def predict_lang(text_col: Column) -> Column:
    """Argmax language with deterministic alphabetical tie-break;
    'und' when no lexicon hits at all."""
    scores = lang_scores(text_col)
    mx = F.greatest(*scores.values())
    pred = F.when(mx == 0, "und")
    for lang in sorted(scores):  # alphabetical priority on ties
        pred = pred.when(scores[lang] == mx, lang)
    return pred


@register(
    "t01_token_stats",
    oracle=r"""
SELECT doc_id,
       CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_tokens,
       CAST(len(list_distinct(string_split_regex(text, '\s+'))) AS INT) AS n_unique,
       CAST(CAST(list_aggregate(list_transform(string_split_regex(text, '\s+'),
                                t -> CAST(length(t) AS BIGINT)), 'sum') AS BIGINT) AS DOUBLE)
         / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) AS avg_token_len
FROM documents
""",
    tags=("text", "tokens", "documents"),
    doc="Whitespace token counting: total, distinct, average length "
    "(pure map-side array expressions).",
)
def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        (total_len.cast("double") / F.size(toks).cast("double")).alias("avg_token_len"),
    )


_STOP_SQL = "', '".join(STOPWORDS)

@register(
    "t02_quality_score",
    oracle=rf"""
WITH feat AS (
  SELECT doc_id, lang, n_chars,
         string_split_regex(text, '\s+') AS toks
  FROM documents
)
SELECT doc_id, lang, n_chars,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_filter(toks, t -> t IN ('{_STOP_SQL}'))) AS DOUBLE)
         / CAST(len(toks) AS DOUBLE) AS stop_ratio,
       CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS uniq_ratio,
       (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
         * (1.0 - CAST(len(list_filter(toks, t -> t IN ('{_STOP_SQL}'))) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE)) AS quality_score,
       CASE WHEN len(toks) < 20 THEN 1 ELSE 0 END AS is_short
FROM feat
""",
    tags=("text", "quality", "documents"),
    doc="Document quality scoring: stopword ratio, uniqueness ratio, "
    "composite score, short-doc flag.",
)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks).cast("double")
    stop_ratio = _hit_count(toks, STOPWORDS).cast("double") / n_tokens
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        uniq_ratio.alias("uniq_ratio"),
        (uniq_ratio * (F.lit(1.0) - stop_ratio)).alias("quality_score"),
        F.when(F.size(toks) < 20, 1).otherwise(0).alias("is_short"),
    )


def _lexicon_sql(lang: str) -> str:
    words = "', '".join(LEXICONS[lang])
    return rf"CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t IN ('{words}'))) AS INT)"


@register(
    "t03_lang_id",
    oracle=rf"""
WITH scores AS (
  SELECT doc_id, lang AS lang_actual,
         {_lexicon_sql('de')} AS s_de,
         {_lexicon_sql('en')} AS s_en,
         {_lexicon_sql('es')} AS s_es,
         {_lexicon_sql('fr')} AS s_fr,
         {_lexicon_sql('zh')} AS s_zh
  FROM documents
)
SELECT doc_id, lang_actual,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
            WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
            WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
            WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
            WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
            ELSE 'zh' END AS lang_pred,
       s_en AS en_hits
FROM scores
""",
    tags=("text", "langid", "documents"),
    doc="Heuristic n-gram/stopword language identification with "
    "deterministic tie-breaking.",
)
def t03_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    scores = lang_scores(F.col("text"))
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        predict_lang(F.col("text")).alias("lang_pred"),
        scores["en"].alias("en_hits"),
    ).select("doc_id", "lang_actual", "lang_pred", "en_hits")


@register(
    "t04_fingerprint",
    oracle="""
SELECT doc_id,
       md5(CAST(n_chars AS VARCHAR) || ':' || text) AS fingerprint,
       substr(md5(text), 1, 16) AS short_fp
FROM documents
""",
    tags=("text", "fingerprint", "documents"),
    doc="Deterministic document fingerprinting (length-salted md5 + "
    "64-bit short form).",
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.concat(F.col("n_chars").cast("string"), F.lit(":"), F.col("text"))).alias(
            "fingerprint"
        ),
        F.substring(F.md5("text"), 1, 16).alias("short_fp"),
    )


@register(
    "t05_word_frequencies",
    oracle=r"""
WITH toks AS (
  SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents
)
SELECT token, COUNT(*) AS n
FROM toks
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 50
""",
    tags=("text", "tokens", "explode", "topk", "documents"),
    doc="Corpus word frequencies: tokenize → explode (1→N array "
    "unnest) → count → top-50.  The explode is map-side; the only "
    "shuffle is the token group-by, with partial aggregation "
    "upstream — the canonical wordcount shape at any scale.",
)
def t05_word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(50)
    )


# BPE-style pre-tokenizer pattern (GPT-2-ish, ASCII subset): a leading
# space glues to the following word/number/punct run.  The character
# classes are portable between Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


@register(
    "t06_bpe_token_count",
    oracle=rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS INT) AS n_bpe_tokens,
       CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_ws_tokens
FROM documents
""",
    tags=("text", "tokens", "bpe", "documents"),
    doc="Token counting with a BPE-style pre-tokenizer regex (word / "
    "number / punctuation runs with leading-space gluing) next to the "
    "plain whitespace count — the cost-estimation primitive for an "
    "LLM data pipeline, pure JVM regexp (no Python).",
)
def t06_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
    )


# ---------------------------------------------------------------------------
# t07 — per-document top terms by df-normalized relevance (TF-IDF family)
# ---------------------------------------------------------------------------


@register(
    "t07_top_terms_tfidf",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term
),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         CAST(t.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS score,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id
                            ORDER BY CAST(t.tf AS DOUBLE) / CAST(d.df AS DOUBLE) DESC,
                                     t.term) AS rnk
  FROM tf t JOIN df d ON t.term = d.term
  WHERE t.doc_id < 100
)
SELECT doc_id, term,
       CAST(tf AS BIGINT) AS tf,
       CAST(df AS BIGINT) AS df,
       score,
       CAST(rnk AS INT) AS rnk
FROM scored WHERE rnk <= 5
""",
    tags=("text", "tfidf", "topk", "documents"),
    doc="Per-document top-5 terms by df-normalized relevance "
    "(tf / corpus-df — the TF-IDF family with a rational weight "
    "instead of a log idf: IEEE division is correctly rounded in "
    "both engines, ln() is libm-dependent, so the score stays "
    "hash-matchable).  Corpus df comes from ALL documents; scores "
    "are ranked for the doc_id < 100 slice.  Scale shape: one "
    "(doc,term) partial-agg shuffle + one term-keyed df join + a "
    "per-doc window whose groups are vocab-of-doc sized.",
)
def t07_top_terms_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = (
        toks.filter(F.col("doc_id") < 100)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = (
        toks.dropDuplicates(["doc_id", "term"])
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    score = F.col("tf").cast("double") / F.col("df").cast("double")
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(df, "term")
        .withColumn("score", score)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


# ---------------------------------------------------------------------------
# t08 — edit-distance near-duplicate pairs (blocked levenshtein)
# ---------------------------------------------------------------------------


@register(
    "t08_edit_distance_pairs",
    oracle="""
SELECT a.p_partkey AS id1, b.p_partkey AS id2,
       a.p_name AS name1, b.p_name AS name2,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM part a
JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
""",
    tags=("text", "dedup", "similarity", "part"),
    doc="Edit-distance (Levenshtein) near-duplicate detection with "
    "attribute blocking: candidate pairs come only from a (brand, "
    "size) equi-join — an O(sum of bucket^2) candidate set instead of "
    "the O(n^2) all-pairs cross join — then the quadratic-cost "
    "levenshtein runs on candidates alone.  The standard blocked "
    "record-linkage shape: at 100 TB the blocking key bounds every "
    "bucket, the equi-join shuffles on it, and no executor ever sees "
    "the full table.  Threshold pairs with dist <= 4 (exact copies "
    "score 0).",
)
def t08_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("id1"),
        F.col("p_name").alias("name1"),
        "p_brand",
        "p_size",
    )
    b = p.select(
        F.col("p_partkey").alias("id2"),
        F.col("p_name").alias("name2"),
        "p_brand",
        "p_size",
    )
    return (
        a.join(b, ["p_brand", "p_size"])
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("edit_dist", F.levenshtein("name1", "name2"))
        .filter(F.col("edit_dist") <= 4)
        .select("id1", "id2", "name1", "name2", "edit_dist")
    )


# ---------------------------------------------------------------------------
# t09 — dictionary/pattern redaction (PII-scrub shape)
# ---------------------------------------------------------------------------

REDACT_PATTERN = r"\b(customer|value|key)\b"


@register(
    "t09_term_redaction",
    oracle=r"""
SELECT doc_id,
       regexp_replace(text, '\b(customer|value|key)\b', '<PII>', 'g')
         AS redacted,
       CAST(len(regexp_extract_all(text, '\b(customer|value|key)\b')) AS INT)
         AS n_redactions
FROM documents
WHERE doc_id < 200
""",
    tags=("text", "redaction", "documents"),
    doc="Regex-driven redaction over a document corpus — the "
    "PII-scrub pass every training-data pipeline runs (emails, "
    "phones, ids; here a term dictionary, since the synthetic corpus "
    "has no digits).  Emits the scrubbed text plus a per-doc "
    "redaction count for audit.  Pure map-side regexp_replace / "
    "regexp_extract_all column expressions — scales linearly with "
    "the scan, no shuffle at all.  The pattern subset (\\b word "
    "alternation) is chosen portable between Java regex and RE2.",
)
def t09_term_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.regexp_replace("text", REDACT_PATTERN, "<PII>").alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit(REDACT_PATTERN), 0))
        .cast("int")
        .alias("n_redactions"),
    )


# ---------------------------------------------------------------------------
# t10 — document chunking (fixed-size token windows with overlap)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 30
CHUNK_STRIDE = 20


@register(
    "t10_chunking",
    oracle=r"""
WITH starts AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(len(string_split_regex(text, '\s+')), 1), 20)) AS i
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       CAST((i - 1) // 20 AS INT) AS chunk_idx,
       CAST(len(list_slice(string_split_regex(text, '\s+'), i, i + 29)) AS INT)
         AS n_chunk_tokens,
       array_to_string(list_slice(string_split_regex(text, '\s+'), i, i + 29), ' ')
         AS chunk_text
FROM starts
""",
    tags=("text", "chunking", "documents"),
    doc="Document chunking for training-sequence preparation: each doc "
    "explodes into overlapping fixed-size token windows (30 tokens, "
    "stride 20 — the sliding-context pattern every LLM data pipeline "
    "runs before packing).  Map-side only: tokenize once, generate "
    "window starts with sequence(), slice per start, explode — a 1→N "
    "fan-out with zero shuffle; at 100 TB this scales linearly with "
    "the scan exactly like m02's frame sampling.",
)
def t10_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = tokens(F.col("text"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    chunked = d.select(
        "doc_id",
        F.col("text"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    chunk = F.slice(tokens(F.col("text")), F.col("start"), CHUNK_TOKENS)
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# t11 — greedy sequence packing (token-budget bin assignment)
# ---------------------------------------------------------------------------

PACK_BUDGET = 512


@register(
    "t11_sequence_packing",
    oracle=r"""
WITH counted AS (
  SELECT source, doc_id,
         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT source, doc_id, n_tokens,
         CAST(floor((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING)
                     - n_tokens) / 512.0) AS BIGINT) AS bin
  FROM counted
)
SELECT source, bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM packed
GROUP BY source, bin
""",
    tags=("text", "packing", "documents"),
    doc="Greedy sequence packing: concatenate documents in a "
    "deterministic order until a 512-token context budget fills, "
    "assigning each doc the bin its START offset falls in (running "
    "token cumsum over a per-source window).  Packing is inherently "
    "sequential, so the scale-out axis is the PARTITION key: each "
    "source packs independently — at 100 TB you shard by "
    "(source, day, worker) so no single window partition is "
    "unbounded, exactly as here.  One shuffle on source, then a "
    "partial-agg rollup per bin.",
)
def t11_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    counted = d.select(
        "source", "doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = counted.withColumn(
        "bin",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(float(PACK_BUDGET))
        ).cast("bigint"),
    )
    return packed.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


# ---------------------------------------------------------------------------
# t12 — text canonicalization (normalize before dedup/analysis)
# ---------------------------------------------------------------------------


def normalize_text(col: Column) -> Column:
    """lower → strip non-alphanumerics to spaces → collapse runs →
    trim: the canonical form under which case/punctuation variants of
    the same content compare equal.  Pure JVM regexp expressions."""
    lowered = F.lower(col)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9 ]", " ")
    collapsed = F.regexp_replace(stripped, r" +", " ")
    return F.trim(collapsed)


@register(
    "t12_text_normalize",
    oracle=r"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +', ' ', 'g')) AS norm_text,
       CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                       ' +', ' ', 'g'))) AS BIGINT) AS norm_len
FROM documents WHERE doc_id < 200
""",
    tags=("text", "normalize", "documents"),
    doc="Text canonicalization: lowercase, strip punctuation to "
    "spaces, collapse whitespace — the normalization pass that runs "
    "before dedup/fingerprinting so trivial formatting variants "
    "collapse (d13 builds on it).  Map-side regexp only; the regex "
    "subset is Java/RE2-portable.",
)
def t12_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    norm = normalize_text(F.col("text"))
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )


# ---------------------------------------------------------------------------
# t13 — bigram domain-fit scoring (corpus-top-bigram coverage)
# ---------------------------------------------------------------------------


@register(
    "t13_bigram_coverage",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
bigrams AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                        i -> t[i] || ' ' || t[i + 1]) AS bg
  FROM toks
),
corpus_top AS (
  SELECT b AS bigram FROM (
    SELECT unnest(bg) AS b FROM bigrams
  ) GROUP BY b ORDER BY COUNT(*) DESC, b LIMIT 20
),
top_list AS (
  SELECT list(bigram) AS tl FROM corpus_top
),
scored AS (
  SELECT g.doc_id,
         CAST(len(g.bg) AS BIGINT) AS n_bigrams,
         CAST(len(list_filter(g.bg, x -> list_contains(t.tl, x)))
              AS BIGINT) AS n_top_hits
  FROM bigrams g CROSS JOIN top_list t
)
SELECT doc_id, n_bigrams, n_top_hits,
       CAST(n_top_hits AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS coverage
FROM scored WHERE doc_id < 200
""",
    tags=("text", "bigram", "scoring", "documents"),
    doc="Domain-fit scoring by corpus-top-bigram coverage: the 20 "
    "most frequent bigrams ARE the corpus's domain signature; each "
    "document scores by the fraction of its bigrams in that set — a "
    "log-free (hence hash-matchable) proxy for in-domain perplexity, "
    "used to filter off-domain text from a training mix.  Two "
    "passes: a bigram wordcount (partial-agg shuffle + top-20), "
    "then a map-side rescan against the broadcast top set — the "
    "same broadcast-the-model shape t03's lexicons use.",
)
def t13_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = d.select("doc_id", bigrams.alias("bg"))
    top = (
        bg.select(F.explode("bg").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("b"))
        .limit(20)
        .agg(F.collect_set("b").alias("top_set"))
    )
    scored = bg.filter(F.col("doc_id") < 200).crossJoin(F.broadcast(top)).select(
        "doc_id",
        F.size("bg").cast("bigint").alias("n_bigrams"),
        F.size(
            F.filter(F.col("bg"), lambda x: F.array_contains(F.col("top_set"), x))
        )
        .cast("bigint")
        .alias("n_top_hits"),
    )
    return scored.withColumn(
        "coverage",
        F.col("n_top_hits").cast("double") / F.col("n_bigrams").cast("double"),
    )


# ---------------------------------------------------------------------------
# t14 — repetition-ratio filter (duplicate n-gram fraction, Gopher-style)
# ---------------------------------------------------------------------------


@register(
    "t14_repetition_ratio",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
tris AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                        i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) AS tg
  FROM toks
)
SELECT doc_id,
       CAST(len(tg) AS BIGINT) AS n_trigrams,
       CAST(len(list_distinct(tg)) AS BIGINT) AS n_distinct,
       CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)
         / CAST(len(tg) AS DOUBLE) AS dup_fraction,
       CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)
         / CAST(len(tg) AS DOUBLE) > 0.5 AS flagged
FROM tris
WHERE len(tg) > 0
""",
    tags=("text", "repetition", "quality", "documents"),
    doc="Repetition filter (the Gopher/MassiveText duplicate-n-gram "
    "rule): a document whose trigrams are mostly repeats of each "
    "other is boilerplate or spam, not prose — score = 1 - "
    "distinct/total trigrams, flag above 0.5.  Pure map-side array "
    "expressions (split → slide → array_distinct), no shuffle at "
    "all: at 100 TB this runs at scan speed with column pruning to "
    "(doc_id, text).",
)
def t14_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.greatest(F.size(toks) - 2, F.lit(0))
    trigrams = F.zip_with(
        F.slice(toks, 1, n),
        F.zip_with(
            F.slice(toks, 2, n), F.slice(toks, 3, n),
            lambda b, c: F.concat(b, F.lit(" "), c),
        ),
        lambda a, bc: F.concat(a, F.lit(" "), bc),
    )
    scored = (
        d.select("doc_id", trigrams.alias("tg"))
        .filter(F.size("tg") > 0)
        .select(
            "doc_id",
            F.size("tg").cast("bigint").alias("n_trigrams"),
            F.size(F.array_distinct("tg")).cast("bigint").alias("n_distinct"),
        )
    )
    dup = (
        (F.col("n_trigrams") - F.col("n_distinct")).cast("double")
        / F.col("n_trigrams").cast("double")
    )
    return scored.withColumn("dup_fraction", dup).withColumn(
        "flagged", dup > 0.5
    )


# ---------------------------------------------------------------------------
# t15 — composite quality gate (Gopher-style document rules)
# ---------------------------------------------------------------------------

T15_MIN_WORDS = 20
T15_MAX_WORDS = 100_000
T15_MIN_MWL = 3.0
T15_MAX_MWL = 10.0
T15_MIN_STOP_HITS = 2


@register(
    "t15_gopher_rules",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(list_aggregate(list_transform(t, x -> CAST(length(x) AS BIGINT)),
                             'sum') AS DOUBLE)
           / CAST(len(t) AS DOUBLE) AS mean_word_len,
         CAST(len(list_filter(t, x -> list_contains(
             ['the', 'a', 'of', 'and', 'to', 'is', 'in', 'that', 'it', 'for'],
             x))) AS BIGINT) AS stop_hits
  FROM toks WHERE len(t) > 0
)
SELECT doc_id, n_words, mean_word_len, stop_hits,
       (n_words BETWEEN {T15_MIN_WORDS} AND {T15_MAX_WORDS})
         AND (mean_word_len BETWEEN {T15_MIN_MWL} AND {T15_MAX_MWL})
         AND stop_hits >= {T15_MIN_STOP_HITS} AS keep
FROM m
""",
    tags=("text", "quality", "filter", "documents"),
    doc="Composite quality gate in the Gopher/MassiveText style: word "
    "count within bounds, mean word length within bounds, and a "
    "minimum stopword count (real prose contains function words; "
    "keyword-stuffed or non-linguistic content does not).  Each rule "
    "is a map-side array expression over the same tokenization — one "
    "scan, no shuffle, trivially scan-parallel at 100 TB; the boolean "
    "conjunction is emitted (not filtered) so downstream consumers "
    "can audit per-rule pass rates.",
)
def t15_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = d.select("doc_id", toks.alias("t")).filter(F.size("t") > 0)
    m = base.select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_words"),
        (
            F.aggregate(
                F.transform(F.col("t"), lambda x: F.length(x).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.size("t").cast("double")
        ).alias("mean_word_len"),
        F.size(F.filter(F.col("t"), lambda x: x.isin(*STOPWORDS)))
        .cast("bigint")
        .alias("stop_hits"),
    )
    keep = (
        F.col("n_words").between(T15_MIN_WORDS, T15_MAX_WORDS)
        & F.col("mean_word_len").between(T15_MIN_MWL, T15_MAX_MWL)
        & (F.col("stop_hits") >= T15_MIN_STOP_HITS)
    )
    return m.withColumn("keep", keep)


# ---------------------------------------------------------------------------
# t16 — data mixture card (per-source token accounting)
# ---------------------------------------------------------------------------


@register(
    "t16_mixture_card",
    oracle=r"""
WITH per_doc AS (
  SELECT source, len(string_split_regex(text, '\s+')) AS n_toks FROM documents
),
per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens
  FROM per_doc GROUP BY source
),
tot AS (SELECT SUM(n_tokens) AS t FROM per_source)
SELECT s.source, s.n_docs, s.n_tokens,
       CAST(s.n_tokens AS DOUBLE) / CAST(t.t AS DOUBLE) AS token_share,
       CAST(SUM(s.n_tokens) OVER (ORDER BY s.n_tokens DESC, s.source
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / CAST(t.t AS DOUBLE) AS cum_share
FROM per_source s CROSS JOIN tot t
""",
    tags=("text", "mixture", "accounting", "documents"),
    doc="Data mixture card: per-source document and token totals with "
    "each source's token share and the cumulative share in "
    "descending-size order — the accounting table every training-mix "
    "decision (upsampling weights, source caps, epoch math) reads "
    "first.  One partial-aggregated groupBy(source) collapses the "
    "corpus to |sources| rows; the share/cumulative window then runs "
    "over that tiny aggregate (global window is safe BECAUSE the "
    "input is sources-sized, not corpus-sized — same bounded-input "
    "argument as d12's class offsets).  Token counts are exact "
    "integers, shares are single IEEE divisions of identical "
    "operands — hash-stable.",
)
def t16_mixture_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    per_source = d.select(
        "source", F.size(tokens(F.col("text"))).alias("n_toks")
    ).groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
    )
    tot = per_source.agg(F.sum("n_tokens").alias("t"))
    w = (
        W.orderBy(F.desc("n_tokens"), F.asc("source"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (F.col("n_tokens").cast("double") / F.col("t").cast("double")).alias(
                "token_share"
            ),
            (
                F.sum("n_tokens").over(w).cast("double")
                / F.col("t").cast("double")
            ).alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# t17 — vocabulary growth curve (Heaps-law corpus profile)
# ---------------------------------------------------------------------------

T17_CHECKPOINTS = (50, 100, 200, 500)


@register(
    "t17_vocab_growth",
    oracle=rf"""
WITH firsts AS (
  SELECT tok, MIN(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents)
  GROUP BY tok
),
cp(n_docs) AS (VALUES {", ".join(f"({n})" for n in T17_CHECKPOINTS)})
SELECT cp.n_docs,
       CAST(COUNT(f.tok) AS BIGINT) AS vocab_size
FROM cp LEFT JOIN firsts f ON f.first_doc < cp.n_docs
GROUP BY cp.n_docs
""",
    tags=("text", "vocabulary", "profile", "documents"),
    doc="Vocabulary growth curve (the Heaps-law profile): distinct "
    "vocabulary size after the first N documents, for a ladder of "
    "checkpoints — how corpus builders detect saturation (new data "
    "stops adding vocabulary) vs drift (sudden growth = new domain "
    "or language entered the feed).  First-seen decomposition keeps "
    "it one shuffle: token → MIN(doc_id) (partial-aggregated "
    "wordcount shape); each token is then assigned map-side to the "
    "FIRST checkpoint it counts toward (a literal CASE ladder — no "
    "non-equi join, nothing corpus-sized ever broadcast), and the "
    "per-checkpoint counts cumulate over a |checkpoints|-row window "
    "— no per-checkpoint rescans, no running-distinct state (q73's "
    "trick applied corpus-wide).",
)
def t17_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    firsts = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    # Map-side: the smallest checkpoint this token's first appearance
    # precedes.  A token counts toward that checkpoint and every later
    # one, so per-bucket counts cumulated in checkpoint order give the
    # vocabulary size at each checkpoint.  Tokens first seen at or
    # after the last checkpoint fall out (NULL bucket).
    bucket = F.lit(None).cast("bigint")
    for n in sorted(T17_CHECKPOINTS, reverse=True):
        bucket = F.when(F.col("first_doc") < F.lit(n), F.lit(n)).otherwise(bucket)
    per_cp = (
        firsts.select(bucket.alias("bucket"))
        .where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    cp = local_relation(spark, [(n,) for n in T17_CHECKPOINTS], "n_docs bigint")
    w = W.orderBy("n_docs").rowsBetween(W.unboundedPreceding, 0)
    return (
        cp.join(F.broadcast(per_cp), cp.n_docs == per_cp.bucket, "left")
        .select("n_docs", F.coalesce("n_new", F.lit(0)).alias("n_new"))
        .select(
            "n_docs",
            F.sum("n_new").over(w).cast("bigint").alias("vocab_size"),
        )
    )


# ---------------------------------------------------------------------------
# t18 — char-bigram familiarity (self-trained LM quality score)
# ---------------------------------------------------------------------------


@register(
    "t18_char_bigram_lm",
    oracle="""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= 2
),
grams AS (
  SELECT doc_id, substr(text, i, 2) AS bg
  FROM docs, LATERAL unnest(generate_series(1, length(text) - 1)) AS g(i)
),
model AS (
  SELECT bg, COUNT(*) AS cnt FROM grams GROUP BY bg
),
tot AS (SELECT SUM(cnt) AS t FROM model)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(MIN(m.cnt) AS BIGINT) AS rarest_count,
       CAST(SUM(m.cnt) AS DOUBLE)
         / (CAST(COUNT(*) AS DOUBLE) * CAST((SELECT t FROM tot) AS DOUBLE))
         AS familiarity
FROM grams d JOIN model m ON d.bg = m.bg
GROUP BY d.doc_id
""",
    tags=("text", "quality", "language-model", "documents"),
    doc="Character-bigram familiarity: a self-trained corpus LM scores "
    "each document by the mean corpus probability of its char bigrams "
    "(the CCNet/Gopher perplexity-filter shape, with the n-gram model "
    "trained on the corpus itself).  Unfamiliar character patterns — "
    "wrong language, mojibake, binary spill — score low; rarest_count "
    "pinpoints the most alien bigram.  All arithmetic is integer sums "
    "until ONE final double division, so both engines produce "
    "bit-identical scores (log-prob variants differ in the last ulp "
    "between libm implementations — deliberately avoided).  Scale "
    "shape: one shuffle to train (bigram → count, charset²-bounded "
    "output), model re-joined map-side via broadcast; the per-doc "
    "aggregate is the only corpus-sized shuffle.",
)
def t18_char_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 2)
        .select("doc_id", "text")
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
        ).alias("bg"),
    )
    model = grams.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
    tot = model.agg(F.sum("cnt").alias("t"))
    return (
        grams.join(F.broadcast(model), "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.min("cnt").cast("bigint").alias("rarest_count"),
            F.sum("cnt").alias("_sum_cnt"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_bigrams",
            "rarest_count",
            (
                F.col("_sum_cnt").cast("double")
                / (F.col("n_bigrams").cast("double") * F.col("t").cast("double"))
            ).alias("familiarity"),
        )
    )


# ---------------------------------------------------------------------------
# t19 — incremental novelty: share of never-before-seen shingles
# ---------------------------------------------------------------------------


@register(
    "t19_novelty_curve",
    oracle=r"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= 5
),
shingles AS (
  SELECT DISTINCT doc_id, substr(text, i, 5) AS sh
  FROM docs, LATERAL unnest(generate_series(1, length(text) - 4)) AS g(i)
),
firsts AS (
  SELECT sh, MIN(doc_id) AS first_doc FROM shingles GROUP BY sh
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS novelty
FROM shingles s JOIN firsts f ON s.sh = f.sh
GROUP BY s.doc_id
""",
    tags=("text", "novelty", "dedup", "profile", "documents"),
    doc="Incremental novelty: for each document (in doc_id ingestion "
    "order), the share of its distinct 5-char shingles never seen in "
    "any earlier document — the memorization/contribution profile "
    "corpus builders use to decide when a feed stops adding "
    "information (novelty → 0 means the source is exhausted; a "
    "boilerplate-heavy doc scores near 0 against its antecedents).  "
    "First-seen decomposition (t17's trick at shingle granularity) "
    "needs NO shingle-keyed re-join: n_novel(doc) is just the size of "
    "first_doc's preimage — GROUP BY first_doc over the firsts "
    "relation — and n_shingles is the per-doc distinct-array size, "
    "computed map-side before any shuffle.  Total exchange surface: "
    "one shingle→MIN(doc_id) aggregate plus a doc-count-sized join "
    "(AQE broadcasts it) — the corpus-sized shingle relation is "
    "shuffled ONCE, not twice.  Integer counts + one final double "
    "division for bit-identical scores.",
)
def t19_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 5)
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(text) - 4), i -> substring(text, i, 5))"
                )
            ).alias("shs"),
        )
    )
    per_doc = d.select(
        "doc_id", F.size("shs").cast("bigint").alias("n_shingles"), "shs"
    )
    firsts = (
        per_doc.select("doc_id", F.explode("shs").alias("sh"))
        .groupBy("sh")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    novel = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_novel")
    )
    return (
        per_doc.drop("shs")
        .join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            (
                F.coalesce("n_novel", F.lit(0)).cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# t20 — typed PII detection + redaction audit (planted fixtures)
# ---------------------------------------------------------------------------

# Portable regex subset (identical semantics in Java regex and RE2):
# character classes, +, bounded repetition — no lookaround/backrefs.
PII_EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+"
PII_PHONE_RE = r"\+1-555-[0-9]{4}"


@register(
    "t20_pii_scan",
    oracle=rf"""
WITH aug AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0
                      THEN ' contact user' || CAST(doc_id AS VARCHAR)
                           || '@example.com or +1-555-'
                           || lpad(CAST(doc_id % 100 AS VARCHAR), 4, '0')
                      ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS INT) AS n_phones,
       CAST(length(regexp_replace(regexp_replace(text, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
                                  '{PII_PHONE_RE}', '[PHONE]', 'g')) AS INT)
         AS redacted_len
FROM aug
""",
    tags=("text", "pii", "redaction", "compliance", "documents"),
    doc="Typed PII detection and redaction audit — the compliance "
    "pass every training corpus runs before release: per-document "
    "email and phone counts (regexp_extract_all over a portable "
    "Java-regex/RE2 pattern subset — no lookaround, no backrefs) and "
    "the post-redaction length as the audit trail.  The synthetic "
    "corpus carries no PII, so deterministic fixtures are PLANTED "
    "(every 7th doc gains a derived email + phone) — the detector is "
    "provably non-vacuous, same policy as d06's planted duplicates.  "
    "Pure map-side: scales with the scan, no shuffle at all.",
)
def t20_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or +1-555-"),
                    F.lpad((F.col("doc_id") % 100).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), PII_EMAIL_RE, "[EMAIL]"),
        PII_PHONE_RE,
        "[PHONE]",
    )
    return aug.select(
        "doc_id",
        F.size(
            F.expr(f"regexp_extract_all(text, '{PII_EMAIL_RE}', 0)")
        ).alias("n_emails"),
        F.size(
            F.expr(f"regexp_extract_all(text, r'{PII_PHONE_RE}', 0)")
        ).alias("n_phones"),
        F.length(redacted).cast("int").alias("redacted_len"),
    )


# ---------------------------------------------------------------------------
# t21 — paragraph-level exact dedup (chunk fingerprints across docs)
# ---------------------------------------------------------------------------

T21_CHUNK = 10  # tokens per pseudo-paragraph


@register(
    "t21_paragraph_dedup",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(t, i, i + {T21_CHUNK - 1}), ' ')) AS h
  FROM toks, LATERAL unnest(generate_series(1, len(t) - {T21_CHUNK - 1},
                                            {T21_CHUNK})) AS g(i)
),
spread AS (
  SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM chunks GROUP BY h
)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       CAST(SUM(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS shared_fraction
FROM chunks c JOIN spread s ON c.h = s.h
GROUP BY c.doc_id
""",
    tags=("text", "dedup", "paragraph", "documents"),
    doc="Paragraph-level exact dedup (the Dolma/CCNet sub-document "
    "pass): documents are chunked into fixed 10-token "
    "pseudo-paragraphs, each fingerprinted (md5), and a chunk is "
    "'shared' when its fingerprint appears in more than one distinct "
    "document — catching boilerplate blocks inside otherwise-unique "
    "pages, which document-level dedup (d01) structurally misses.  "
    "Per-doc output: chunk count, shared count, shared fraction "
    "(integer counts + one double division).  Scale shape: chunking "
    "is map-side; the fingerprint spread is one wordcount-shaped "
    "shuffle with map-side partials; shared flags re-join by "
    "fingerprint.  Naturally non-vacuous: the fixture corpus shares "
    "~5% of chunks across docs.",
)
def t21_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(split(text, '\\\\s+')) - {T21_CHUNK - 1}, "
                f"{T21_CHUNK}), i -> md5(array_join(slice(split(text, '\\\\s+'), i, "
                f"{T21_CHUNK}), ' ')))"
            )
        ).alias("h"),
    )
    spread = chunks.groupBy("h").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return (
        chunks.join(spread, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_shared",
            (
                F.col("n_shared").cast("double") / F.col("n_chunks").cast("double")
            ).alias("shared_fraction"),
        )
    )


# ---------------------------------------------------------------------------
# t22 — BM25 retrieval (rational idf, deterministic fixed-order sums)
# ---------------------------------------------------------------------------

# (query_id, terms) — fixed literal queries, the shape a retrieval
# harness issues; terms indexed 0..n-1 across all queries.
T22_QUERIES = (
    ("q_hash_join", ("hash", "join")),
    ("q_stream_window_agg", ("stream", "window", "agg")),
    ("q_vector_scan", ("vector", "scan")),
)
T22_TERMS = tuple(
    dict.fromkeys(t for _, terms in T22_QUERIES for t in terms)
)
T22_TOPK = 10


def _t22_sql_contrib(i: int) -> str:
    """One term's BM25 contribution (k1=1.2, b=0.75, rational idf) —
    the SQL text mirrors the Column expression op-for-op so both
    engines run the identical IEEE sequence."""
    tf = f"CAST(tf_{i} AS DOUBLE)"
    return (
        f"((CAST(n - df_{i} AS DOUBLE) + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * (({tf} * 2.2) / ({tf} + 1.2 * (1.0 - 0.75 + 0.75 *"
        f" (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))))"
    )


def _t22_oracle() -> str:
    tf_cols = ",\n         ".join(
        f"SUM(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS tf_{i}"
        for i, t in enumerate(T22_TERMS)
    )
    df_cols = ",\n         ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(T22_TERMS))
    )
    legs = []
    for qid, terms in T22_QUERIES:
        idx = [T22_TERMS.index(t) for t in terms]
        score = " + ".join(_t22_sql_contrib(i) for i in idx)
        legs.append(
            f"SELECT '{qid}' AS query_id, doc_id, {score} AS score FROM joined"
        )
    union = "\n  UNION ALL\n  ".join(legs)
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS dl,
         {tf_cols}
  FROM toks GROUP BY doc_id
),
stats AS (
  SELECT COUNT(*) AS n, SUM(dl) AS sumdl,
         {df_cols}
  FROM per_doc
),
joined AS (SELECT * FROM per_doc CROSS JOIN stats),
scored AS (
  {union}
)
SELECT query_id, doc_id, score,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY score DESC, doc_id) AS rn
FROM scored WHERE score > 0
QUALIFY rn <= {T22_TOPK}
"""


@register(
    "t22_bm25_search",
    oracle=_t22_oracle(),
    tags=("text", "retrieval", "bm25", "topk", "documents"),
    doc="BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed query "
    "set — the canonical lexical search scorer, with the RATIONAL "
    "idf variant ((N-df+0.5)/(df+0.5), no ln(): libm-dependent "
    "logs would break cross-engine hashing, and monotonicity — "
    "hence ranking — is unchanged).  Determinism without decimal "
    "machinery: tf/df/dl/N are integer aggregates, and each doc's "
    "score is a FIXED-ORDER sum of per-term contributions written "
    "as one expression (never a float SUM() across rows), so every "
    "double is an identical IEEE sequence in both engines.  Scale "
    "shape: ONE (doc)-keyed token aggregate (map-side combine on "
    "the tokenizer explode), a 1-row stats broadcast, per-query "
    "scores via stack() in the same projection — no per-query "
    "corpus pass — then the e01-style two-phase top-k.  The df "
    "columns only exist for query terms: the posting-list width is "
    "|query vocabulary|, not |corpus vocabulary|.",
)
def t22_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flaco_spark.operators.similarity import topk_per_query

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(T22_TERMS)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sumdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(T22_TERMS))
        ],
    )

    def contrib(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        idf = (
            (F.col("n") - F.col(f"df_{i}")).cast("double") + F.lit(0.5)
        ) / (F.col(f"df_{i}").cast("double") + F.lit(0.5))
        dl_norm = F.lit(1.0) - F.lit(0.75) + F.lit(0.75) * (
            F.col("dl").cast("double")
            / (F.col("sumdl").cast("double") / F.col("n").cast("double"))
        )
        return idf * ((tf * F.lit(2.2)) / (tf + F.lit(1.2) * dl_norm))

    def qscore(terms):
        idx = [T22_TERMS.index(t) for t in terms]
        s = contrib(idx[0])
        for i in idx[1:]:
            s = s + contrib(i)
        return s

    stack_args = []
    for qid, terms in T22_QUERIES:
        stack_args.extend([F.lit(qid), qscore(terms)])
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.stack(F.lit(len(T22_QUERIES)), *stack_args).alias(
                "query_id", "score"
            ),
        )
        .filter(F.col("score") > 0)
    )
    return topk_per_query(
        scored, "query_id", [F.desc("score"), F.asc("doc_id")], T22_TOPK
    ).select("query_id", "doc_id", "score", "rn")


# ---------------------------------------------------------------------------
# t23 — RAKE keyword extraction
# ---------------------------------------------------------------------------

T23_TOPK = 2


@register(
    "t23_rake_keywords",
    oracle=rf"""
WITH tk AS (
  SELECT doc_id, i AS pos, t[i] AS tok,
         CASE WHEN t[i] IN ('{_STOP_SQL}') THEN 1 ELSE 0 END AS is_stop
  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
       LATERAL unnest(generate_series(1, len(t))) AS g(i)
),
isl AS (
  SELECT doc_id, pos, tok, is_stop,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
  FROM tk
),
words AS (SELECT doc_id, pos, tok, island FROM isl WHERE is_stop = 0),
phrases AS (
  SELECT doc_id, island,
         array_to_string(list(tok ORDER BY pos), ' ') AS phrase,
         COUNT(*) AS plen
  FROM words GROUP BY doc_id, island
),
wstats AS (
  SELECT w.doc_id, w.tok,
         CAST(SUM(p.plen) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS s
  FROM words w JOIN phrases p ON w.doc_id = p.doc_id AND w.island = p.island
  GROUP BY w.doc_id, w.tok
),
scored AS (
  SELECT DISTINCT w.doc_id, p.phrase,
         round(list_reduce(list_prepend(0.0::DOUBLE, list(ws.s ORDER BY w.pos)),
                           (acc, x) -> acc + x), 8) AS score
  FROM words w
  JOIN phrases p ON w.doc_id = p.doc_id AND w.island = p.island
  JOIN wstats ws ON w.doc_id = ws.doc_id AND w.tok = ws.tok
  GROUP BY w.doc_id, w.island, p.phrase
),
ranked AS (
  SELECT doc_id, phrase, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, phrase) AS rn
  FROM (SELECT DISTINCT doc_id, phrase, score FROM scored)
)
SELECT doc_id, phrase, score, rn FROM ranked WHERE rn <= {T23_TOPK}
""",
    tags=("text", "keywords", "rake", "documents"),
    doc=f"RAKE keyword extraction (Rose et al. 2010, *Automatic "
    "Keyword Extraction from Individual Documents*): candidate "
    "phrases are maximal stopword-free token runs (gaps-and-islands "
    "on the stopword positions), each word scores degree/freq "
    "(degree = summed length of the phrases it appears in), and a "
    "phrase scores the sum of its member words' scores — top-"
    f"{T23_TOPK} phrases per document.  Float discipline: each "
    "word score is ONE exact-integer division; the phrase score is "
    "a position-ordered left-fold of those doubles (g01's "
    "contract), so both engines run the identical IEEE sequence.  "
    "Physical shape: tokenize→window islands per doc, two "
    "wordcount-shaped aggregations, per-doc top-k window — all "
    "doc-partitioned, nothing corpus-global.",
)
def t23_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos0", "tok"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "tok",
        F.col("tok").isin(*STOPWORDS).cast("int").alias("is_stop"),
    )
    isl = tk.withColumn(
        "island",
        F.sum("is_stop").over(
            W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    words = isl.filter(F.col("is_stop") == 0).select("doc_id", "pos", "tok", "island")
    phrases = words.groupBy("doc_id", "island").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.struct("pos", "tok")))["tok"], " "
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    wstats = (
        words.join(phrases, ["doc_id", "island"])
        .groupBy("doc_id", "tok")
        .agg(
            (F.sum("plen").cast("double") / F.count(F.lit(1)).cast("double")).alias("s")
        )
    )
    scored = (
        words.join(phrases, ["doc_id", "island"])
        .join(wstats, ["doc_id", "tok"])
        .groupBy("doc_id", "island", "phrase")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("pos", "s")))["s"],
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                8,
            ).alias("score")
        )
        .select("doc_id", "phrase", "score")
        .distinct()
    )
    rank = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("phrase"))
    return (
        scored.withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= T23_TOPK)
        .select("doc_id", "phrase", "score", "rn")
    )


# ---------------------------------------------------------------------------
# t24 — query-by-document similarity search (Jaccard retrieval)
# ---------------------------------------------------------------------------

T24_MAX_DF = 100
T24_TOPK = 5

from flaco_spark.operators.dedup import _SHINGLE_SQL as _T24_SHINGLE_SQL


@register(
    "t24_jaccard_search",
    oracle=rf"""
WITH sh AS (
  SELECT doc_id, {_T24_SHINGLE_SQL} AS shingles FROM documents
),
postings AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
),
capped AS (
  SELECT s FROM postings GROUP BY s HAVING COUNT(*) <= {T24_MAX_DF}
),
cand AS (
  SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS cand_id
  FROM postings q
  JOIN capped k ON q.s = k.s
  JOIN postings c ON c.s = q.s
  WHERE q.doc_id < 3 AND c.doc_id <> q.doc_id
),
scored AS (
  SELECT ca.query_id, ca.cand_id,
         CAST(len(list_filter(s1.shingles, x -> list_contains(s2.shingles, x))) AS DOUBLE)
           / CAST(len(list_distinct(s1.shingles || s2.shingles)) AS DOUBLE) AS jaccard
  FROM cand ca
  JOIN sh s1 ON ca.query_id = s1.doc_id
  JOIN sh s2 ON ca.cand_id = s2.doc_id
)
SELECT query_id, cand_id, jaccard,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY jaccard DESC, cand_id) AS rn
FROM scored
QUALIFY rn <= {T24_TOPK}
""",
    tags=("text", "search", "jaccard", "retrieval", "documents"),
    doc=f"Query-by-document retrieval: for each query doc (doc_id < "
    "3), the top-{T24_TOPK} most similar corpus documents by exact "
    "3-gram-shingle Jaccard — 'more like this', the retrieval twin "
    "of d08's dedup (same shingles, same verify formula, but "
    "query-sided: candidates come from joining the QUERY docs' "
    f"postings — a k-doc-sized set — against the corpus index, with "
    f"shingles of document frequency > {T24_MAX_DF} dropped as "
    "non-discriminative stop-shingles, the cap that bounds candidate "
    "fan-out when a query contains boilerplate).  At 100 TB the "
    "query postings broadcast and the candidate set is "
    "|query shingles| × capped-df — independent of corpus size; "
    "exact Jaccard verifies only the candidates.",
)
def t24_jaccard_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from flaco_spark.functions import jaccard, word_shingles

    d = table(spark, sf_dir, "documents")
    sh = d.select("doc_id", word_shingles(F.col("text"), 3).alias("shingles"))
    postings = sh.select("doc_id", F.explode("shingles").alias("s"))
    capped = (
        postings.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= T24_MAX_DF)
        .select("s")
    )
    qpost = postings.filter(F.col("doc_id") < 3).join(capped, "s").select(
        F.col("doc_id").alias("query_id"), "s"
    )
    cand = (
        postings.join(F.broadcast(qpost), "s")
        .filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", F.col("doc_id").alias("cand_id"))
        .distinct()
    )
    s1 = sh.select(F.col("doc_id").alias("query_id"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("cand_id"), F.col("shingles").alias("sh2"))
    scored = (
        cand.join(s1, "query_id")
        .join(s2, "cand_id")
        .select(
            "query_id", "cand_id", jaccard(F.col("sh1"), F.col("sh2")).alias("jaccard")
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("jaccard"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= T24_TOPK)
        .select("query_id", "cand_id", "jaccard", "rn")
    )


# ---------------------------------------------------------------------------
# t25 — sentence segmentation stats
# ---------------------------------------------------------------------------


@register(
    "t25_sentence_stats",
    oracle="""
WITH sents AS (
  SELECT doc_id, trim(s) AS s
  FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '[.!?]+')) AS s
    FROM documents
  )
  WHERE length(trim(s)) > 0
),
agg AS (
  SELECT doc_id,
         COUNT(*) AS n_sentences,
         CAST(SUM(length(s)) AS BIGINT) AS total_chars,
         CAST(MAX(length(s)) AS BIGINT) AS max_len
  FROM sents GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_sentences, 0) AS n_sentences,
       COALESCE(a.total_chars, 0) AS total_chars,
       COALESCE(a.max_len, 0) AS max_len,
       CAST(CASE WHEN a.n_sentences > 0
                 THEN (a.total_chars * 100) // a.n_sentences
                 ELSE 0 END AS BIGINT) AS mean_len_x100
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
""",
    tags=("text", "sentences", "segmentation", "documents"),
    doc="Sentence segmentation stats — the chunking-policy input t10 "
    "consumes (chunk at sentence boundaries, pack to a token budget): "
    "split on terminal punctuation runs ([.!?]+ — the same regex "
    "class in both engines' RE dialects), drop whitespace-only "
    "segments, and report per-doc sentence count, character mass, "
    "longest sentence, and mean length in exact fixed-point "
    "(total*100 // n, no float division).  Docs with NO terminal "
    "punctuation survive as zero-rows via the left join — the "
    "boundary case that silently drops documents in naive "
    "split-then-aggregate pipelines.  Map-side split + one "
    "hash-aggregate; the explode fan-out is |sentences|, the same "
    "scale contract as t05's word explode.",
)
def t25_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sents = (
        d.select("doc_id", F.explode(F.split("text", r"[.!?]+")).alias("s"))
        .select("doc_id", F.trim("s").alias("s"))
        .filter(F.length("s") > 0)
    )
    agg = sents.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sentences"),
        F.sum(F.length("s")).cast("bigint").alias("total_chars"),
        F.max(F.length("s")).cast("bigint").alias("max_len"),
    )
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_sentences", F.lit(0)).alias("n_sentences"),
        F.coalesce("total_chars", F.lit(0)).alias("total_chars"),
        F.coalesce("max_len", F.lit(0)).alias("max_len"),
        F.when(
            F.col("n_sentences") > 0,
            F.floor((F.col("total_chars") * 100) / F.col("n_sentences")),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("mean_len_x100"),
    )


# ---------------------------------------------------------------------------
# t26 — character-class mix profile (script / mojibake screening)
# ---------------------------------------------------------------------------


@register(
    "t26_charclass_mix",
    oracle="""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n,
         CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS letters,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS digits,
         CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g'))
              AS BIGINT) AS spaces
  FROM documents
)
SELECT doc_id, n, letters, digits, spaces,
       n - letters - digits - spaces AS other,
       CAST(CASE WHEN n > 0 THEN (letters * 1000) // n ELSE 0 END AS BIGINT)
         AS letters_permille,
       CAST(CASE WHEN n > 0 THEN ((n - letters - digits - spaces) * 1000) // n
            ELSE 0 END AS BIGINT) AS other_permille
FROM base
""",
    tags=("text", "charclass", "script", "quality", "documents"),
    doc="Character-class mix profile: per doc, counts of ASCII "
    "letters / digits / spaces / everything-else plus exact per-mille "
    "ratios — the screening signal for mojibake (high 'other' from "
    "double-decoded UTF-8), wrong-script routing before t03's "
    "language ID, and OCR noise.  Counting is "
    "length-minus-stripped-length (one regexp_replace per class — "
    "explicit character classes only, identical in Java regex and "
    "RE2, never shorthand like \\w whose Unicode scope differs "
    "between engines); ratios are integer floor per-mille.  Pure "
    "map-side scan, the cheapest possible corpus pass.",
)
def t26_charclass_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n = F.length("text").cast("bigint")

    def cnt(cls):
        return (F.length("text") - F.length(F.regexp_replace("text", cls, ""))).cast(
            "bigint"
        )

    base = d.select(
        "doc_id",
        n.alias("n"),
        cnt("[A-Za-z]").alias("letters"),
        cnt("[0-9]").alias("digits"),
        cnt("[ ]").alias("spaces"),
    )
    other = F.col("n") - F.col("letters") - F.col("digits") - F.col("spaces")
    pm = lambda c: (
        F.when(F.col("n") > 0, F.floor((c * 1000) / F.col("n"))).otherwise(0)
    ).cast("bigint")
    return base.select(
        "doc_id",
        "n",
        "letters",
        "digits",
        "spaces",
        other.alias("other"),
        pm(F.col("letters")).alias("letters_permille"),
        pm(other).alias("other_permille"),
    )


# ---------------------------------------------------------------------------
# t27 — Rocchio pseudo-relevance feedback (two-stage retrieval)
# ---------------------------------------------------------------------------

T27_FB_K = 3  # feedback depth: top-k docs from round 1 feed the expansion


def _t27_oracle() -> str:
    tf_cols = ",\n         ".join(
        f"SUM(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS tf_{i}"
        for i, t in enumerate(T22_TERMS)
    )
    df_cols = ",\n         ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(T22_TERMS))
    )
    r1_legs = []
    for qid, terms in T22_QUERIES:
        idx = [T22_TERMS.index(t) for t in terms]
        score = " + ".join(_t22_sql_contrib(i) for i in idx)
        r1_legs.append(
            f"SELECT '{qid}' AS query_id, doc_id, {score} AS score FROM joined"
        )
    r1_union = "\n  UNION ALL\n  ".join(r1_legs)
    fb_sums = ",\n         ".join(
        f"SUM(pd.tf_{i}) AS fb_{i}" for i in range(len(T22_TERMS))
    )
    r2_legs = []
    for qid, terms in T22_QUERIES:
        qset = {T22_TERMS.index(t) for t in terms}
        parts = []
        for i in range(len(T22_TERMS)):
            w = f"CAST({6 if i in qset else 0} + f.fb_{i} AS DOUBLE) / 6.0"
            parts.append(f"(({w}) * ({_t22_sql_contrib(i)}))")
        r2_legs.append(
            f"SELECT '{qid}' AS query_id, doc_id, {' + '.join(parts)} AS score\n"
            f"  FROM joined CROSS JOIN (SELECT * FROM fbs WHERE query_id = '{qid}') f"
        )
    r2_union = "\n  UNION ALL\n  ".join(r2_legs)
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS dl,
         {tf_cols}
  FROM toks GROUP BY doc_id
),
stats AS (
  SELECT COUNT(*) AS n, SUM(dl) AS sumdl,
         {df_cols}
  FROM per_doc
),
joined AS (SELECT * FROM per_doc CROSS JOIN stats),
r1 AS (
  {r1_union}
),
fb AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id) AS rn
    FROM r1 WHERE score > 0) t
  WHERE rn <= {T27_FB_K}
),
fbs AS (
  SELECT fb.query_id,
         {fb_sums}
  FROM fb JOIN per_doc pd ON fb.doc_id = pd.doc_id
  GROUP BY fb.query_id
),
r2 AS (
  {r2_union}
)
SELECT query_id, doc_id, score,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY score DESC, doc_id) AS rn
FROM r2 WHERE score > 0
QUALIFY rn <= {T22_TOPK}
"""


@register(
    "t27_rocchio_prf",
    oracle=_t27_oracle(),
    tags=("text", "retrieval", "bm25", "rocchio", "prf", "topk", "documents"),
    doc=f"Pseudo-relevance feedback (Rocchio 1971, the two-stage "
    "retrieval loop every lexical search stack runs): round 1 is "
    "t22's BM25 ranking; the top-{T27_FB_K} documents per query are "
    "ASSUMED relevant, their term-frequency mass re-weights the "
    "query (alpha=1 on original terms, beta=1/2 spread over the "
    f"{T27_FB_K} feedback docs — weights kept as exact rationals "
    "(6·orig + fb_tf)/6, one integer numerator per term), and round "
    "2 re-ranks the corpus under the expanded weights.  The "
    "vocabulary stays the FIXED query-term set, so the posting "
    "width never grows with feedback (the bounded-expansion "
    "contract; real Rocchio also harvests new terms — that widens "
    "the tf projection the same way, by |expansion|, never "
    "|corpus vocabulary|).  Both rounds share ONE per-doc token "
    "aggregate and one stats broadcast; feedback sums are a "
    "|queries|-row relation joined back as a broadcast constant.  "
    "Fixed-order float folds throughout — hash-stable.",
)
def t27_rocchio_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flaco_spark.operators.similarity import topk_per_query

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(T22_TERMS)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sumdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(T22_TERMS))
        ],
    )
    joined = per_doc.crossJoin(F.broadcast(stats))

    def contrib(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        idf = (
            (F.col("n") - F.col(f"df_{i}")).cast("double") + F.lit(0.5)
        ) / (F.col(f"df_{i}").cast("double") + F.lit(0.5))
        dl_norm = F.lit(1.0) - F.lit(0.75) + F.lit(0.75) * (
            F.col("dl").cast("double")
            / (F.col("sumdl").cast("double") / F.col("n").cast("double"))
        )
        return idf * ((tf * F.lit(2.2)) / (tf + F.lit(1.2) * dl_norm))

    # Round 1 is t22's single stack() pass: every per-query score is a
    # column expression over the SAME (per_doc ⨯ stats) projection, so
    # the tokenize+aggregate subtree appears once, not once per query
    # leg (the unionAll shape re-planned it per leg — no exchange
    # reuse, 27 parquet scans in the physical plan).
    stack1 = []
    for qid, terms in T22_QUERIES:
        idx = [T22_TERMS.index(t) for t in terms]
        s = contrib(idx[0])
        for i in idx[1:]:
            s = s + contrib(i)
        stack1.extend([F.lit(qid), s])
    r1 = joined.select(
        "doc_id",
        F.stack(F.lit(len(T22_QUERIES)), *stack1).alias("query_id", "score"),
    )
    fb = topk_per_query(
        r1.filter(F.col("score") > 0),
        "query_id",
        [F.desc("score"), F.asc("doc_id")],
        T27_FB_K,
    ).select("query_id", "doc_id")
    fbs = fb.join(per_doc, "doc_id").groupBy("query_id").agg(
        *[F.sum(f"tf_{i}").alias(f"fb_{i}") for i in range(len(T22_TERMS))]
    )
    # Pivot the |queries|-row feedback relation to ONE row (exact
    # integer sums — a query with no feedback docs pivots to NULL,
    # which nulls its round-2 scores and the score>0 filter drops
    # them, exactly as the old empty-crossJoin leg emitted no rows).
    # One broadcast build replaces |queries| broadcasts that each
    # re-executed the whole round-1 subtree.
    fbs1 = fbs.agg(
        *[
            F.sum(
                F.when(F.col("query_id") == qid, F.col(f"fb_{i}"))
            ).alias(f"fb_{qi}_{i}")
            for qi, (qid, _) in enumerate(T22_QUERIES)
            for i in range(len(T22_TERMS))
        ]
    )
    stack2 = []
    for qi, (qid, terms) in enumerate(T22_QUERIES):
        qset = {T22_TERMS.index(t) for t in terms}
        s = None
        for i in range(len(T22_TERMS)):
            w = (
                F.lit(6 if i in qset else 0) + F.col(f"fb_{qi}_{i}")
            ).cast("double") / F.lit(6.0)
            term = w * contrib(i)
            s = term if s is None else s + term
        stack2.extend([F.lit(qid), s])
    r2 = joined.crossJoin(F.broadcast(fbs1)).select(
        "doc_id",
        F.stack(F.lit(len(T22_QUERIES)), *stack2).alias("query_id", "score"),
    )
    return topk_per_query(
        r2.filter(F.col("score") > 0),
        "query_id",
        [F.desc("score"), F.asc("doc_id")],
        T22_TOPK,
    ).select("query_id", "doc_id", "score", "rn")


# ---------------------------------------------------------------------------
# t28 — deterministic text augmentation (seeded word dropout)
# ---------------------------------------------------------------------------


@register(
    "t28_text_augmentation",
    oracle=r"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(text, '\s+') AS w,
         2 + CAST('0x' || substr(md5(text), 1, 2) AS INT) % 3 AS k
  FROM documents
),
aug AS (
  SELECT doc_id, k,
         CAST(len(w) AS BIGINT) AS n_words,
         array_to_string(
           list_transform(
             list_filter(generate_series(1, len(w)), i -> i % k != 0),
             i -> w[i]),
           ' ') AS aug_text
  FROM base
)
SELECT doc_id, CAST(k AS INT) AS k, n_words,
       CAST(CAST(n_words AS BIGINT) - n_words // k AS BIGINT) AS n_kept,
       md5(aug_text) AS aug_md5
FROM aug
""",
    tags=("text", "augmentation", "dropout", "documents"),
    doc="Deterministic TEXT AUGMENTATION (seeded word dropout): every "
    "k-th word is deleted, where k in {2,3,4} derives from the "
    "document's content hash — the augmentation-policy shape "
    "(dropout/swap/mask) training pipelines apply for robustness, "
    "made REPRODUCIBLE: the same doc always yields the same variant "
    "(content-hash seeding, d11's device), so augmented corpora are "
    "regenerable instead of stored and experiments diff cleanly.  "
    "The gate pins the exact variant via its md5 plus the n_kept = "
    "n - floor(n/k) count identity.  Pure map-side higher-order "
    "array ops (position filter + join) — zero shuffles, the "
    "cheapest possible corpus pass, and the policy generalizes to "
    "any position/hash predicate.",
)
def t28_text_augmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    k = (F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("int") % 3 + 2)
    base = d.select("doc_id", w.alias("w"), k.alias("k"))
    kept = F.filter(
        F.col("w"), lambda x, i: ((i + 1) % F.col("k")) != 0
    )
    aug_text = F.array_join(kept, " ")
    return base.select(
        "doc_id",
        F.col("k").cast("int").alias("k"),
        F.size("w").cast("bigint").alias("n_words"),
        (
            F.size("w").cast("bigint")
            - F.floor(F.size("w") / F.col("k")).cast("bigint")
        ).alias("n_kept"),
        F.md5(aug_text).alias("aug_md5"),
    )


@register(
    "t29_readability",
    oracle=r"""
WITH feat AS (
  SELECT doc_id,
         greatest(1, len(regexp_extract_all(text, '\S+'))) AS n_words,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
         greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+')))
           AS n_syllables
  FROM documents
),
scored AS (
  SELECT doc_id, n_words, n_sentences, n_syllables,
         206835 - (1015 * n_words) // n_sentences
                - (84600 * n_syllables) // n_words AS fre_x1000
  FROM feat
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       CAST(fre_x1000 AS BIGINT) AS fre_x1000,
       CASE WHEN fre_x1000 >= 90000 THEN 'very_easy'
            WHEN fre_x1000 >= 70000 THEN 'easy'
            WHEN fre_x1000 >= 50000 THEN 'standard'
            WHEN fre_x1000 >= 30000 THEN 'difficult'
            ELSE 'very_confusing' END AS band
FROM scored
""",
    tags=("text", "readability", "quality", "documents"),
    doc="Flesch reading-ease readability scoring (Flesch 1948; the "
    "document-quality feature corpus filters bucket on alongside "
    "t02's heuristics): words = non-space runs, sentences = "
    "terminal-punctuation runs, syllables = the standard vowel-run "
    "proxy ([aeiouy]+ on lowercased text), each clamped to ≥1 so "
    "empty/punctuation-free docs score instead of dividing by "
    "zero.  The formula runs in FIXED-POINT x1000 with integer "
    "floor divisions (206835 − 1015·w//s − 84600·syl//w) — no "
    "float division anywhere, so both engines produce identical "
    "integers — and the score is bucketed into the five standard "
    "bands.  Pure map-side column expressions over one scan: "
    "shuffle-free, codegen-friendly, the same 100 TB contract as "
    "t02/t14.",
)
def t29_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n_words = F.greatest(
        F.lit(1), F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)"))
    )
    n_sents = F.greatest(
        F.lit(1), F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)"))
    )
    n_syl = F.greatest(
        F.lit(1),
        F.size(F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")),
    )
    feat = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        n_syl.alias("n_syllables"),
    )
    fre = (
        F.lit(206835)
        - F.floor((1015 * F.col("n_words")) / F.col("n_sentences"))
        - F.floor((84600 * F.col("n_syllables")) / F.col("n_words"))
    )
    scored = feat.withColumn("fre_x1000", fre)
    band = (
        F.when(F.col("fre_x1000") >= 90000, "very_easy")
        .when(F.col("fre_x1000") >= 70000, "easy")
        .when(F.col("fre_x1000") >= 50000, "standard")
        .when(F.col("fre_x1000") >= 30000, "difficult")
        .otherwise("very_confusing")
    )
    return scored.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_sentences").cast("bigint").alias("n_sentences"),
        F.col("n_syllables").cast("bigint").alias("n_syllables"),
        F.col("fre_x1000").cast("bigint").alias("fre_x1000"),
        band.alias("band"),
    )


@register(
    "t30_tokenizer_fertility",
    oracle=rf"""
WITH feat AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS bpe,
         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS ws,
         CAST(length(text) AS BIGINT) AS chars
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(ws) AS BIGINT) AS total_ws_tokens,
       CAST((SUM(bpe) * 1000) // greatest(SUM(ws), 1) AS BIGINT)
         AS fertility_x1000,
       CAST((SUM(chars) * 1000) // greatest(SUM(bpe), 1) AS BIGINT)
         AS chars_per_token_x1000
FROM feat GROUP BY lang
""",
    tags=("text", "tokens", "fertility", "lang", "documents"),
    doc="Tokenizer FERTILITY audit per language — the budgeting "
    "metric multilingual-corpus work reports before training "
    "(how many subword tokens per word, how many bytes per token, "
    "per language): t06's BPE-style pre-tokenizer regex vs the "
    "whitespace word count, aggregated per lang in exact integers "
    "with fixed-point x1000 ratios (truncating integer division — "
    "no float path).  High fertility for a language flags a "
    "tokenizer that will silently tax that language's effective "
    "context length — the thing this audit exists to catch.  Pure "
    "map-side regexp counting + one partial-agg groupBy(lang): "
    "t02's 100 TB contract.",
)
def t30_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    feat = d.select(
        "lang",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
        ).cast("bigint").alias("bpe"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("ws"),
        F.length("text").cast("bigint").alias("chars"),
    )
    return feat.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("bpe").cast("bigint").alias("total_bpe_tokens"),
        F.sum("ws").cast("bigint").alias("total_ws_tokens"),
        F.expr("CAST((SUM(bpe) * 1000) DIV greatest(SUM(ws), 1) AS BIGINT)").alias(
            "fertility_x1000"
        ),
        F.expr(
            "CAST((SUM(chars) * 1000) DIV greatest(SUM(bpe), 1) AS BIGINT)"
        ).alias("chars_per_token_x1000"),
    )


# ---------------------------------------------------------------------------
# t31 — language-ID confusion audit (classifier quality per gold label)
# ---------------------------------------------------------------------------


@register(
    "t31_langid_confusion",
    oracle=rf"""
WITH scores AS (
  SELECT doc_id, lang AS lang_actual,
         {{de}} AS s_de,
         {{en}} AS s_en,
         {{es}} AS s_es,
         {{fr}} AS s_fr,
         {{zh}} AS s_zh
  FROM documents
),
pred AS (
  SELECT lang_actual,
         CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
              WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
              WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
              WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
              WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
              ELSE 'zh' END AS lang_pred
  FROM scores
),
gold AS (
  SELECT lang_actual AS lang, CAST(COUNT(*) AS BIGINT) AS gold_n,
         CAST(SUM(CASE WHEN lang_pred = lang_actual THEN 1 ELSE 0 END) AS BIGINT) AS tp
  FROM pred GROUP BY 1
),
hyp AS (
  SELECT lang_pred AS lang, CAST(COUNT(*) AS BIGINT) AS pred_n
  FROM pred GROUP BY 1
)
SELECT g.lang, g.gold_n, COALESCE(h.pred_n, 0) AS pred_n, g.tp,
       round(CAST(g.tp AS DOUBLE)
             / CAST(NULLIF(COALESCE(h.pred_n, 0), 0) AS DOUBLE), 8) AS precision_,
       round(CAST(g.tp AS DOUBLE) / CAST(g.gold_n AS DOUBLE), 8) AS recall_,
       round(CAST(2 * g.tp AS DOUBLE)
             / CAST(COALESCE(h.pred_n, 0) + g.gold_n AS DOUBLE), 8) AS f1
FROM gold g LEFT JOIN hyp h ON g.lang = h.lang
""".format(
        de=_lexicon_sql("de"),
        en=_lexicon_sql("en"),
        es=_lexicon_sql("es"),
        fr=_lexicon_sql("fr"),
        zh=_lexicon_sql("zh"),
    ),
    tags=("text", "langid", "eval", "confusion", "documents"),
    doc="Classifier-quality audit of the t03 language identifier "
    "against the corpus's gold labels — the per-class "
    "precision/recall/F1 report any lang-ID stage ships with before "
    "its predictions route documents into per-language training "
    "mixtures (a low-precision class silently pollutes that "
    "language's corpus).  Exact-count discipline: TP, gold and "
    "predicted totals are integers; precision and recall are single "
    "integer-ratio divisions, and F1 uses the algebraic identity "
    "F1 = 2·TP/(pred_n + gold_n) so it too is ONE division of "
    "exact integers — no compounded float error, no engine drift.  "
    "Physical shape: the prediction is t03's map-side expression, "
    "then two |languages|-row aggregates and a tiny join — one "
    "partial-agg scan regardless of corpus size.",
)
def t31_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("lang_actual"),
        predict_lang(F.col("text")).alias("lang_pred"),
    )
    gold = pred.groupBy(F.col("lang_actual").alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("gold_n"),
        F.sum(
            F.when(F.col("lang_pred") == F.col("lang_actual"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("tp"),
    )
    hyp = pred.groupBy(F.col("lang_pred").alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("pred_n")
    )
    j = gold.join(hyp, "lang", "left").select(
        "lang",
        "gold_n",
        F.coalesce("pred_n", F.lit(0)).cast("bigint").alias("pred_n"),
        "tp",
    )
    return j.select(
        "lang",
        "gold_n",
        "pred_n",
        "tp",
        # a never-predicted class has undefined precision — NULL, not
        # a divide-by-zero (ANSI) or an inf (non-ANSI)
        F.round(
            F.col("tp").cast("double")
            / F.nullif(F.col("pred_n"), F.lit(0)).cast("double"),
            8,
        ).alias("precision_"),
        F.round(F.col("tp").cast("double") / F.col("gold_n").cast("double"), 8).alias(
            "recall_"
        ),
        F.round(
            (F.lit(2) * F.col("tp")).cast("double")
            / (F.col("pred_n") + F.col("gold_n")).cast("double"),
            8,
        ).alias("f1"),
    )


# ---------------------------------------------------------------------------
# t32 — UTF-8 validation (mojibake screen with planted corruption)
# ---------------------------------------------------------------------------


@register(
    "t32_utf8_validation",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
       CAST(SUM(CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       true AS try_null_on_invalid,
       true AS repaired_all_valid
FROM documents GROUP BY source
""",
    tags=("text", "utf8", "validation", "quality", "documents"),
    doc="UTF-8 validity screening (is_valid_utf8 / try_validate_utf8 "
    "/ make_valid_utf8, Spark 4) — the mojibake gate a web-crawl "
    "corpus runs before tokenization, since one stray 0xFF from a "
    "mis-declared charset poisons downstream byte-level models.  "
    "Known-answer construction: docs with doc_id % 5 == 0 get a "
    "0xFF byte (never valid in UTF-8) appended to their encoded "
    "payload, the rest stay clean — so per source the invalid/valid "
    "split is closed-form and ONE wrong validity verdict breaks "
    "the hash.  Machine-checked companions: try_validate_utf8 "
    "returns NULL exactly on the corrupted rows, and "
    "make_valid_utf8's repaired output is always valid (the "
    "replacement-char repair path).  All map-side; one partial "
    "agg.",
)
def t32_utf8_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    corrupted = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.encode("text", "UTF-8"), F.unhex(F.lit("FF"))),
    ).otherwise(F.encode("text", "UTF-8"))
    # binary → string reinterpretation keeps the raw bytes (no
    # transcode), which is exactly the mis-ingested-corpus shape
    raw = d.select(
        "doc_id", "source", F.col("text").alias("orig"),
        corrupted.cast("string").alias("s"),
    )
    checked = raw.select(
        "source",
        F.is_valid_utf8("s").alias("ok"),
        (F.try_validate_utf8("s").isNull() == (F.col("doc_id") % 5 == 0)).alias(
            "try_contract"
        ),
        F.is_valid_utf8(F.make_valid_utf8("s")).alias("repaired_ok"),
    )
    return checked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).cast("bigint").alias("n_invalid"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("bigint").alias("n_valid"),
        F.min("try_contract").alias("try_null_on_invalid"),
        F.min("repaired_ok").alias("repaired_all_valid"),
    )


# ---------------------------------------------------------------------------
# t33 — token-mass inequality (Gini) per source
# ---------------------------------------------------------------------------


@register(
    "t33_length_gini",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
  FROM documents
),
r AS (
  SELECT source, n_tok,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_tok, doc_id) AS i
  FROM toks
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       round(CAST(2 * SUM(i * n_tok) - (COUNT(*) + 1) * SUM(n_tok) AS DOUBLE)
             / (COUNT(*) * SUM(n_tok)), 8) AS gini
FROM r GROUP BY source
""",
    tags=("text", "quality", "distribution", "documents"),
    doc="Token-mass inequality per source — the Gini coefficient "
    "(Gini 1912) of document lengths, the curation diagnostic that "
    "separates a source of uniform articles (G≈0) from one where a "
    "few mega-documents carry most of the token budget (G→1, the "
    "shape that breaks naive per-document sampling).  Computed in "
    "the rank form G = (2·Σ i·x_i − (n+1)·Σx)/(n·Σx) over "
    "ascending-sorted lengths: every term is an INTEGER until the "
    "single final IEEE division, so the statistic is exact and "
    "hash-matchable with no log/float accumulation (the engine's "
    "log-free discipline).  Ranks are per-source row_numbers with "
    "doc_id tie-break (ties in x make Σ i·x_i order-invariant, the "
    "tie-break just pins the plan).  Shape: one shuffle keyed by "
    "source for the rank window, then a partial-aggregated "
    "reduce — no pair joins; at 100 TB the per-source sort is the "
    "classic skew spot, and a heavy source would take q66's "
    "range-partitioned rank lane.",
)
def t33_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", r"\s+")).cast("bigint").alias("n_tok"),
    )
    ranked = toks.withColumn(
        "i",
        F.row_number().over(
            W.partitionBy("source").orderBy(F.asc("n_tok"), F.asc("doc_id"))
        ),
    )
    n = F.count(F.lit(1))
    sx = F.sum("n_tok")
    return ranked.groupBy("source").agg(
        n.cast("bigint").alias("n_docs"),
        sx.cast("bigint").alias("total_tokens"),
        F.round(
            (2 * F.sum(F.col("i") * F.col("n_tok")) - (n + 1) * sx).cast("double")
            / (n * sx),
            8,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# t34 — code-vs-prose screen (special-character mass)
# ---------------------------------------------------------------------------

# Characters that dominate source code but are rare in prose.  Counted
# by the replace-difference trick (pure string ops, both engines).
_T34_CODE_CHARS = "{}();=<>[]"


def _t34_count_sql(src: str) -> str:
    """DuckDB: total occurrences of the code-character set in src."""
    terms = [
        f"(len({src}) - len(replace({src}, '{c}', '')))"
        for c in _T34_CODE_CHARS
        if c != "'"
    ]
    return " + ".join(terms)


@register(
    "t34_code_detection",
    oracle=f"""
WITH counts AS (
  SELECT doc_id, source,
         CAST(len(text) AS BIGINT) AS n_chars,
         CAST({_t34_count_sql('text')} AS BIGINT) AS n_code_chars
  FROM documents WHERE len(text) > 0
)
SELECT doc_id, source, n_chars, n_code_chars,
       CAST((10000 * n_code_chars) // n_chars AS BIGINT) AS code_bp,
       ((10000 * n_code_chars) // n_chars >= 150) AS looks_like_code
FROM counts
""",
    tags=("text", "quality", "code", "documents"),
    doc="Code-vs-prose screen — the router every mixed web corpus "
    "needs before applying prose-shaped quality gates (t02's "
    "stopword ratio or t29's readability would junk perfectly good "
    "source code; code wants its own lane): per document, the mass "
    "of code-dominant characters ({{}}();=<>[] — braces, call "
    "syntax, assignment, comparison, indexing) as BASIS POINTS of "
    "total characters, thresholded at 1.5%.  Counting is the "
    "replace-difference trick (len minus len-after-strip per "
    "character), pure JVM string expressions; the score is one "
    "integer division — exact, no floats anywhere.  Map-side only: "
    "zero shuffles at ANY corpus size (the plan is scan → project), "
    "so the screen is free to bolt onto any ingest pass.",
)
def t34_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_code = None
    for c in _T34_CODE_CHARS:
        term = F.length("text") - F.length(F.replace(F.col("text"), F.lit(c)))
        n_code = term if n_code is None else n_code + term
    counts = d.select(
        "doc_id",
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        n_code.cast("bigint").alias("n_code_chars"),
    )
    # true integer division on both sides (Spark `div`, DuckDB `//`)
    bp_int = F.expr("10000 * n_code_chars div n_chars").cast("bigint")
    return counts.select(
        "doc_id",
        "source",
        "n_chars",
        "n_code_chars",
        bp_int.alias("code_bp"),
        (bp_int >= 150).alias("looks_like_code"),
    )


# ---------------------------------------------------------------------------
# t35 — boilerplate removal (the transform t21's report gates)
# ---------------------------------------------------------------------------


@register(
    "t35_boilerplate_removal",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id, i,
         array_to_string(list_slice(t, i, i + {T21_CHUNK - 1}), ' ') AS chunk
  FROM toks, LATERAL unnest(generate_series(1, len(t) - {T21_CHUNK - 1},
                                            {T21_CHUNK})) AS g(i)
),
spread AS (
  SELECT md5(chunk) AS h FROM chunks
  GROUP BY md5(chunk) HAVING COUNT(DISTINCT doc_id) > 1
),
kept AS (
  SELECT c.doc_id, c.i, c.chunk
  FROM chunks c ANTI JOIN spread s ON md5(c.chunk) = s.h
),
kept_agg AS (
  SELECT doc_id,
         string_agg(chunk, ' ' ORDER BY i) AS kept_join,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tails AS (
  SELECT doc_id, len(t) AS n_toks,
         COALESCE(array_to_string(
             list_slice(t, (len(t) // {T21_CHUNK}) * {T21_CHUNK} + 1,
                        len(t)), ' '), '') AS tail
  FROM toks
)
SELECT d.doc_id,
       CAST(CASE WHEN ta.n_toks >= {T21_CHUNK}
                 THEN ta.n_toks // {T21_CHUNK} ELSE 0 END
            - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       md5(CASE
             WHEN COALESCE(k.kept_join, '') <> '' AND ta.tail <> ''
               THEN k.kept_join || ' ' || ta.tail
             WHEN COALESCE(k.kept_join, '') <> '' THEN k.kept_join
             ELSE ta.tail
           END) AS cleaned_md5
FROM documents d
JOIN tails ta ON ta.doc_id = d.doc_id
LEFT JOIN kept_agg k ON k.doc_id = d.doc_id
""",
    tags=("text", "dedup", "boilerplate", "documents"),
    doc="Boilerplate REMOVAL — the transform whose report is t21: "
    "chunks shared across >1 document (CCNet/Dolma's "
    "cross-document-repetition rule on the same 10-token "
    "pseudo-paragraph grid) are STRIPPED and the document is "
    "reconstructed IN ORDER from its surviving chunks plus the "
    "sub-chunk tail; the gate hashes md5(cleaned_text) per doc, so "
    "a misordered chunk, a dropped tail, or a kept boilerplate "
    "block all break the hash — removal correctness is pinned on "
    "the reconstructed STRING, not on counts.  Scale shape: "
    "chunking is map-side; the shared-fingerprint set is one "
    "wordcount shuffle and is corpus-small (only cross-doc "
    "repeats), anti-joined by hash; reassembly groups each doc's "
    "own chunks — partitioned by doc_id, never corpus-wide.  The "
    "kept-chunk shuffle carries chunk text; the 100 TB variant "
    "carries (doc_id, i, h) and re-derives text map-side on the "
    "reassembly pass (same plan shape, documented trade).",
)
def t35_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = T21_CHUNK
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.split("text", r"\s+").alias("t")
    )
    base = d.select("doc_id", "t", F.size("t").alias("n"))
    chunks = base.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(t) >= {k} THEN "
                f"transform(sequence(1, size(t) - {k - 1}, {k}), "
                f"i -> struct(i AS i, array_join(slice(t, i, {k}), ' ') AS chunk)) "
                f"ELSE array() END"
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.i").alias("i"), F.col("c.chunk").alias("chunk"))
    shared = (
        chunks.groupBy(F.md5("chunk").alias("h"))
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h")
    )
    kept = chunks.withColumn("h", F.md5("chunk")).join(shared, "h", "left_anti")
    kept_agg = kept.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(i, chunk))), "
            "x -> x.chunk), ' ')"
        ).alias("kept_join"),
        F.count("*").alias("n_kept"),
    )
    tails = base.select(
        "doc_id",
        "n",
        F.expr(f"array_join(slice(t, (n DIV {k}) * {k} + 1, n), ' ')").alias("tail"),
    )
    total = F.when(F.col("n") >= k, F.expr(f"n DIV {k}")).otherwise(F.lit(0))
    kept_join = F.coalesce(F.col("kept_join"), F.lit(""))
    cleaned = F.when(
        (kept_join != "") & (F.col("tail") != ""),
        F.concat(kept_join, F.lit(" "), F.col("tail")),
    ).otherwise(F.when(kept_join != "", kept_join).otherwise(F.col("tail")))
    return (
        tails.join(kept_agg, "doc_id", "left")
        .select(
            "doc_id",
            (total - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.md5(cleaned).alias("cleaned_md5"),
        )
    )
