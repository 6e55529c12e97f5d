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

# Names that entered round 3 with no driver row yet (round 3 sampled
# the WAITING_SINCE_R2 backlog instead).  They have waited longest, so
# they outrank queries REGISTERED in round 4 in the never-checked tier
# — otherwise a round that adds new queries starves the old tail.
# (The round-2 backlog this set replaces is fully green in
# CORRECTNESS_r03.)
WAITING_SINCE_R3: frozenset[str] = frozenset(
    {
        "d15_stratified_sample", "d16_decontamination", "d17_containment_pairs",
        "d18_canonical_by_quality", "d20_minhash_calibration",
        "d21_cluster_size_histogram", "e10_kmeans_unrolled", "e11_pq_encode",
        "e12_pq_adc_search", "e13_pq_recall", "m06_format_sniffing",
        "m07_phash_search", "q90_pivot_revenue", "q91_unpivot_revenue",
        "q92_csv_roundtrip", "q93_jsonl_roundtrip", "q94_try_functions",
        "q95_map_higher_order", "q96_variant_extract",
        "st01_stream_windowed_counts", "st02_stream_dedup_keys",
        "st03_stream_attribution_join", "t14_repetition_ratio",
        "t15_gopher_rules", "t16_mixture_card", "t17_vocab_growth",
        "ts16_asof_directions", "ts17_concurrency_sweep", "ts18_bar_patterns",
        "u08_python_udtf", "u09_iterator_pandas_udf",
    }
)

# Plan-only rewrites (identical results, r1 rows remain valid
# evidence): refresh after semantics changes, before stale greens.
SOFT_RECHECK: frozenset[str] = frozenset(
    {
        "d04_minhash_lsh_pairs",  # r4: exact-collapse-first rewrite (same relation)
        "d05_simhash_signature",  # map-side vote aggregation rewrite
        "d07_dedup_canonical",  # inherits d04's plan changes
        "d14_split_leakage",  # r4: inherits the collapsed pair stage
        "e07_kmeans_iteration",  # r4: kmeans cache-release lifecycle change
    }
)

# Round-4 additions whose EXECUTION PATH is novel (real streaming
# jobs, the Python DataSource, table-writing layout queries, the
# PQ/IVFPQ composition): a driver-environment surprise is likeliest
# here, so within the never-checked tier they outrank plain relational
# additions — a failure found this round is fixable next round.
RISKY_NEW: frozenset[str] = frozenset(
    {
        "st04_stateful_sessionization", "st05_stream_static_enrichment",
        "st07_transform_with_state",  # state-v2 + worker protobuf bootstrap
        "st08_python_stream_source",  # streaming Python DataSource drain loop
        "st09_foreachbatch_upsert",  # multi-batch MERGE snapshot swap

        "u10_python_datasource", "q101_bucketed_join",
        "q102_partition_pruned_agg", "q99_orc_roundtrip",
        "e15_ivfpq_search", "d24_exact_substring_dedup",
        "g01_pagerank", "t22_bm25_search",
        "p01_corpus_pipeline",  # the flagship composition
        "p02_index_build_pipeline",  # flagship #2: IVF+PQ composition
        "st10_chained_stream_aggs",  # multi-stateful single query
        "p03_shard_export_pipeline",  # flagship #3: export manifest
        "m12_stereo_downmix",  # Arrow-batched PCM DSP path
        "st11_session_window_agg",  # state-store session-merge operator
        "st12_sliding_window_counts",  # overlapping-window state fan-out
        "q119_text_roundtrip",  # line-oriented sink/source + scratch swap
        "g07_hits",  # iterative with per-round broadcast jobs
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
        graph,
        layout,
        multimodal,
        pipeline,
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
        if n not in seen and n in WAITING_SINCE_R3:
            rank = -4.0  # longest-waiting never-checked first
        elif n in FORCE_RECHECK and n not in seen:
            rank = -3.5
        elif n in FORCE_RECHECK:
            # semantics changed since the green row: a STALE-WRONG row
            # is worse than a new query having no row yet (new queries
            # are locally parity-tested from day one), so these outrank
            # this round's additions.
            rank = -3.0
        elif n not in seen and n in RISKY_NEW:
            rank = -2.5  # novel execution paths: check before plain additions
        elif n not in seen:
            rank = -2.0  # this round's additions
        elif n in SOFT_RECHECK:
            rank = -1.0  # plan-only rewrite; old row still valid
        else:
            rank = float(seen[n])  # stalest green first
        return (rank, idx[n])

    order.sort(key=key)
    return {name: REGISTRY[name] for name in order}
