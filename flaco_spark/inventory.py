"""Central registry of the engine's query inventory (SURVEY.md §2.2).

Every operator the engine claims is registered here as a
:class:`QuerySpec`: a Spark DataFrame builder plus (where the
semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
string.  The driver harness and the local pytest suite both iterate
this registry, so "implemented" and "tested" cannot drift apart.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL over the pre-registered views; None → rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags, doc or (fn.__doc__ or "").strip())
        return fn

    return deco


# Queries whose SEMANTICS changed since their last driver-green
# CORRECTNESS row (the old row no longer describes the query):
# re-check right after the never-checked ones.
FORCE_RECHECK: frozenset[str] = frozenset(
    {
        "d06_embedding_dedup_pairs",  # non-vacuous threshold + planted dups
        "d08_ngram_jaccard_pairs",  # exact-collapse prepass + hashed postings
        "q22_idle_rich_customers",  # date-bounded anti join (non-vacuous)
        "d09_dedup_components",  # r4: pointer-jump CC rewrite (green row is r2)
    }
)

# Names that entered round 3 with no driver row yet (r1+r2 sampled the
# other 100 of 150).  They have waited longest, so they outrank queries
# REGISTERED after round 2 in the never-checked tier — otherwise a
# round that adds new queries starves the old tail (u04–u07 would slip
# a third round).
WAITING_SINCE_R2: frozenset[str] = frozenset(
    {
        "q86_nth_value_windows", "q87_ratio_to_report", "q88_gaps_and_islands",
        "q89_string_formatting", "e01_knn_bruteforce", "e02_embedding_stats",
        "e03_ann_sign_lsh", "e04_ann_ivf", "e05_label_centroids",
        "e06_lsh_recall", "e07_kmeans_iteration", "e08_scalar_quantization",
        "e09_ivf_recall", "s01_salted_agg", "s02_salted_join",
        "t01_token_stats", "t02_quality_score", "t03_lang_id",
        "t04_fingerprint", "t05_word_frequencies", "t06_bpe_token_count",
        "t07_top_terms_tfidf", "t08_edit_distance_pairs", "t09_term_redaction",
        "t10_chunking", "t11_sequence_packing", "t12_text_normalize",
        "t13_bigram_coverage", "ts01_asof_join", "ts02_sliding_window",
        "ts03_session_window", "ts04_rollup_hierarchy", "ts05_retention_cohorts",
        "ts06_funnel_conversion", "ts07_ohlc_bars", "ts08_rolling_median",
        "ts09_value_range_join", "ts10_gap_detection", "ts11_interval_range_frame",
        "ts12_vwap_bars", "ts13_zscore_anomalies", "ts14_mom_growth",
        "ts15_resample_ffill", "u01_python_udf", "u02_pandas_udf",
        "u03_grouped_pandas_udaf", "u04_map_in_arrow", "u05_arrow_python_udf",
        "u06_apply_in_arrow", "u07_cogrouped_pandas",
    }
)

# Plan-only rewrites (identical results, r1 rows remain valid
# evidence): refresh after semantics changes, before stale greens.
SOFT_RECHECK: frozenset[str] = frozenset(
    {
        "d04_minhash_lsh_pairs",  # cache lifecycle + scan parallelism
        "d05_simhash_signature",  # map-side vote aggregation rewrite
        "d07_dedup_canonical",  # inherits d04's plan changes
    }
)


def _last_green_round() -> dict[str, int]:
    """Per query, the latest driver round with a green CORRECTNESS row.

    The driver checks a prefix of the registry each round (r1 sampled
    the first 50 of 95), so ordering never-checked queries first is
    what rotates the whole inventory through the driver's gate.  Green
    = hash_match (or a rows-only row with no error for no-oracle ops).
    """
    import json
    import re
    from pathlib import Path

    seen: dict[str, int] = {}
    root = Path(__file__).resolve().parents[1]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            ok = row.get("hash_match") or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if ok:
                seen[name] = max(seen.get(name, -1), rnd)
    return seen


def load_inventory() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: fills REGISTRY).

    The returned dict is ordered so queries with no driver-green
    CORRECTNESS row yet come first (then by staleness), because the
    driver samples a prefix — this rotates coverage across rounds.
    """
    from flaco_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        relational,
        relational_ext,
        similarity,
        skew,
        text,
        timeseries,
        udf_surface,
    )
    from flaco_spark.streaming import queries  # noqa: F401

    seen = _last_green_round()
    order = list(REGISTRY)
    idx = {name: i for i, name in enumerate(order)}

    def key(n: str) -> tuple[float, int]:
        if n not in seen:
            # longest-waiting never-checked first, then newly added
            rank = -4.0 if n in WAITING_SINCE_R2 else -3.0
        elif n in FORCE_RECHECK:
            rank = -2.0  # semantics changed since the green row
        elif n in SOFT_RECHECK:
            rank = -1.0  # plan-only rewrite; old row still valid
        else:
            rank = float(seen[n])  # stalest green first
        return (rank, idx[n])

    order.sort(key=key)
    return {name: REGISTRY[name] for name in order}
