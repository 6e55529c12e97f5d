"""Reusable column-expression helpers.

Everything here is built from JVM-side ``pyspark.sql.functions``
(higher-order array functions, hashes, string ops) — no Python UDFs —
so the expressions stay inside whole-stage codegen and scale with the
executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Text
# ---------------------------------------------------------------------------


def tokens(col: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(col, r"\s+")


def char_shingles(col: Column, k: int = 5, distinct: bool = True) -> Column:
    """All k-character shingles of a string as an array<string>.

    Pure expression (sequence → transform → substr), no UDF. For a
    string shorter than k the single truncated shingle is kept so no
    document ends up with an empty set.
    """
    positions = F.sequence(F.lit(1), F.greatest(F.length(col) - F.lit(k - 1), F.lit(1)))
    sh = F.transform(positions, lambda i: col.substr(i, F.lit(k)))
    return F.array_distinct(sh) if distinct else sh


def word_shingles(col: Column, n: int = 3, distinct: bool = True) -> Column:
    """All n-token (word) shingles of a string as an array<string>.

    For documents, word shingles are far more discriminative than
    character k-grams (a small shared vocabulary makes char-grams
    collide pathologically — degenerate LSH buckets); a doc shorter
    than n tokens contributes its full token string as one shingle.
    """
    toks = tokens(col)
    positions = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    sh = F.transform(
        positions,
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(sh) if distinct else sh


# Modulus for the Carter-Wegman MinHash family: < 2^59, so
# a + 7·b stays inside signed int64 (no ANSI overflow in either engine).
MINHASH_MOD = 576_460_752_303_423_433


def minhash_signature(shingles: Column, num_hashes: int = 8) -> Column:
    """MinHash signature as array<bigint> of length ``num_hashes``.

    One md5 per shingle (not per hash function — 8× cheaper), split
    into two 60-bit integers (a, b); hash function j is the affine
    map (a + j·b) mod M (Carter-Wegman family).  md5 and 64-bit
    arithmetic are identical everywhere — including the DuckDB
    oracle, which parses the same hex with ``'0x…'::BIGINT``.
    """
    m = F.lit(MINHASH_MOD)
    hashed = F.transform(
        shingles,
        lambda s: F.struct(
            (F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % m).alias("a"),
            (F.conv(F.substring(F.md5(s), 17, 15), 16, 10).cast("bigint") % m).alias("b"),
        ),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda j: F.array_min(
            F.transform(hashed, lambda ab: (ab.getField("a") + j.cast("bigint") * ab.getField("b")) % m)
        ),
    )


def lsh_band_key(signature: Column, band: Column, rows_per_band: int) -> Column:
    """Bucket key for one LSH band: md5 of the band's signature slice."""
    start = band * rows_per_band + 1
    as_str = F.transform(F.slice(signature, start, rows_per_band), lambda x: x.cast("string"))
    return F.md5(F.concat_ws("|", as_str))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array columns (as double)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_distinct(F.concat(a, b))).cast("double")
    return inter / union


# ---------------------------------------------------------------------------
# Vectors (array<float|double> embeddings)
# ---------------------------------------------------------------------------

def _dbl_fold(products: Column) -> Column:
    """Left-fold sum in IEEE double.

    An array fold has a FIXED evaluation order (the array's element
    order), so plain double arithmetic is fully deterministic across
    partitionings and row orders — no decimal discipline needed, and
    ~50× cheaper per element (decimal ops are interpreted 128-bit
    with overflow checks; doubles stay in whole-stage codegen as
    primitive fma-able math).  The DuckDB oracles mirror the same
    fold (``list_reduce(list_prepend(0.0, ...))``), and IEEE 754
    guarantees the identical operation sequence yields bit-identical
    results engine-to-engine (verified empirically over the full
    embeddings fixture).
    """
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Deterministic dot product of two vectors (as double, 8 dp)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.round(_dbl_fold(prods), 8)


def norm(a: Column) -> Column:
    """Euclidean norm (as double, 6 dp)."""
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.round(F.sqrt(_dbl_fold(sq)), 6)


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine similarity given precomputed norms (norms are reused
    across the O(n·k) candidate pairs, computed once per row)."""
    return dot(a, b) / (norm_a * norm_b)


def sign_lsh_bucket(vec: Column, dims: tuple[int, ...]) -> Column:
    """Coordinate-sign LSH bucket id: bit j set iff vec[dims[j]] > 0.

    A deterministic, engine-portable LSH family (sampled-coordinate
    hyperplanes).  1-based dims, matching SQL array indexing.
    """
    bucket = F.lit(0)
    for j, d in enumerate(dims):
        bucket = bucket + F.when(F.element_at(vec, d) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket
