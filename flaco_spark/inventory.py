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


# Queries whose SEMANTICS or execution path changed since their last
# driver-green CORRECTNESS row.  Each pin records THE ROUND IT WAS SET
# and retires ITSELF: it is active only while the query's newest green
# row predates that round, so a pin that earns its fresh green row
# automatically stops outranking the never-checked backlog — the r6
# judge's "rotation footgun" (satisfied pins ranking -3.0 and silently
# burning driver slots) is now structurally impossible, not a manual
# per-round cleanup.  History: the r4/r5 pins (q12/q21/g01/g07, st07)
# cleared in CORRECTNESS_r05; the r6 pins (g11/st06/s03/q66 + the
# quantized-sum graph rewrite g01/g05/g07) all earned green rows in
# CORRECTNESS_r06 and rotate normally again.
#
# r7: widening the staleness audit to rounds without snapshot commits
# (r1/r2/r6 were silently skipped before) exposed q45: its OUTPUT
# SCHEMA changed after its r1 green row (the r2 bound-discipline
# rework added rel_err_*/within_bound columns), and as a rows-only
# query it has no oracle hash backstopping the change locally.
#
# r7 also flipped the session gap-boundary in the ts03/st11 oracles
# (hypothesis falsifier [(0,0),(0,30)]: Spark's session_window merge
# is CLOSED at the boundary, delta == gap joins; the oracles split at
# >= since birth and stayed green only because the fixtures never
# produce an exact 30:00.000000 delta).  Oracle semantics changed →
# the old green rows describe a superseded contract.
FORCE_RECHECK: dict[str, int] = {  # name -> round the pin was set
    "q45_approx_distinct": 7,
    "ts03_session_window": 7,
    "st11_session_window_agg": 7,
    # r10: m18's ORACLE changed after its r9 green row (length(text) ->
    # octet_length(encode(text)) — byte semantics matching the builder;
    # identical values on the ASCII fixtures, but a superseded contract
    # per the ts03/st11 precedent), and its decode path was restructured
    # for progressive support the same round.
    "m18_jpeg_decode": 10,
}

# Plan-only rewrites (identical results, old rows remain valid
# evidence): refresh after semantics changes, before stale greens.
# r6: the staleness audit (scripts/staleness_report.py, VERDICT r5
# task 8) flagged these five — their builders were rewritten after
# their r3 green rows (the r4 vector-family map-side campaign; local
# oracle parity stayed green throughout, so values are unchanged) but
# no driver row describes the shipped plans yet.
SOFT_RECHECK: dict[str, int] = {  # name -> round the pin was set
    "e01_knn_bruteforce": 6,
    "e03_ann_sign_lsh": 6,
    "e06_lsh_recall": 6,
    "e07_kmeans_iteration": 6,
    "ts10_gap_detection": 6,
    # r7: empty-edge-set fail-fast guard added to the builder (r6
    # ADVICE) — unreachable on any real input, values identical,
    # but the r6 green row predates the shipped source.
    "g07_hits": 7,
    # r7: the widened staleness audit (r1 rows were invisible to
    # it before) flagged these r1 greens whose builders were
    # rewritten in r2 — six broadcast-hint removals (join strategy
    # delegated to AQE; values identical, oracle-hash-verified on
    # every local run) and d05's oracle refactor to the shared
    # simhash CTE.  More soft names than surplus slots this round:
    # the overflow rolls to r8 behind the never-checked burn-down.
    "q03_shipping_priority": 7,
    "q05_local_supplier_volume": 7,
    "q10_returned_items": 7,
    "q14_promo_revenue": 7,
    "q18_large_volume_customers": 7,
    "q19_disjunctive_predicates": 7,
    "d05_simhash_signature": 7,
    # r11: encode_jpeg's component tuples were generalized for the
    # CMYK/YCCK lane (per-component quant-table ids) — 1/3-channel
    # streams are byte-identical (same tables, same ids; round-trip +
    # ImageIO cross-checks green), but the m18/m19 builders' shipped
    # code path changed after their r10 green rows.
    "m18_jpeg_decode": 11,
    "m19_jpeg_progressive_decode": 11,
    # r12: the VP8L LZ77 distance map was replaced with the spec's
    # verbatim 120-entry table (ADVICE r11 high — the generated tail
    # decoded codes ~93..120 to wrong offsets), palette out-of-range
    # indices now decode to transparent black per spec, and the
    # degenerate >=256-single-symbol writer path was fixed; decoded
    # VALUES on the m21 lane are identical (encoder and decoder share
    # the table; byte-exact round-trip + new hand-assembled tail
    # vectors green), but the shipped codec changed after m21's r11
    # green row.  (That r12 pin was retired by m21's r12 green row;
    # the r13 codec rewrite re-pins it below.)
    # r13: the staleness audit flagged 23 green rows predating their
    # builder's last rewrite — the r12 optimization campaign's
    # result-identical restructures (PQ/kmeans literal+collect work,
    # roundtrip spread, localrel call sites, stream snapshot hop) plus
    # older drift the audit's widened view now sees.  All plan-only /
    # internals changes: local oracle parity stayed green throughout
    # (driver_sim 0/343 on every r12/r13 tree).
    "d15_stratified_sample": 13,
    "e07_kmeans_iteration": 13,
    "e10_kmeans_unrolled": 13,
    "e12_pq_adc_search": 13,
    "e15_ivfpq_search": 13,
    "e20_incremental_index": 13,
    "e23_cluster_balanced_sample": 13,
    "e26_ranking_metrics": 13,
    "m11_binaryfile_ingest": 13,
    "p02_index_build_pipeline": 13,
    "q119_text_roundtrip": 13,
    "q121_mergeschema_read": 13,
    "q122_observe_metrics": 13,
    "q128_analyze_statistics": 13,
    "q129_checkpoint_lineage": 13,
    "q131_range_partitioned_sort": 13,
    "st04_stateful_sessionization": 13,
    "st06_stream_parquet_sink": 13,
    "st07_transform_with_state": 13,
    "t17_vocab_growth": 13,
    "ts09_value_range_join": 13,
    "ts22_cross_correlation": 13,
    "u10_python_datasource": 13,
    # r13 helper-level rewrites the function-granular audit cannot see
    # (its stated limitation — queued at edit time as it instructs):
    # _drain's input-derived state partitioning touches every memory-
    # sink streaming row; the m21/m22 codec internals moved (static-
    # profile VP8L codes, VP8 header memo + fused tokenizer).  Values
    # oracle-verified identical on the full registry this round.
    "st01_stream_windowed_counts": 13,
    "st02_stream_dedup_keys": 13,
    "st03_stream_attribution_join": 13,
    "st05_stream_static_enrichment": 13,
    "st10_chained_stream_aggs": 13,
    "st11_session_window_agg": 13,
    "st12_sliding_window_counts": 13,
    "st13_outer_stream_join": 13,
    "st14_stream_union": 13,
    "m21_webp_lossless_decode": 13,
    "m22_webp_lossy_decode": 13,
}


def active_pins(seen: dict[str, int] | None = None) -> tuple[set[str], set[str]]:
    """(active forced, active soft): pins whose query has NOT yet
    earned a green row in a round >= the pin round.  A fresh green row
    retires the pin automatically."""
    if seen is None:
        seen = _last_green_round()
    force = {n for n, since in FORCE_RECHECK.items() if seen.get(n, -1) < since}
    soft = {n for n, since in SOFT_RECHECK.items() if seen.get(n, -1) < since}
    return force, soft

# The r6 family-priority tuple (ts/e/m/u first within never-checked)
# is retired: those families completed in CORRECTNESS_r06, so registry
# order is again the single source of rotation truth (COVERAGE.md).

# Never-checked queries whose EXECUTION PATH is novel (real streaming
# jobs, multi-batch sinks, flagship compositions): a driver-environment
# surprise is likeliest here, so within the never-checked tier they
# outrank plain relational additions — a failure found this round is
# fixable next round.  r5: the remaining streaming backlog + p04.
RISKY_NEW: frozenset[str] = frozenset(
    {
        "st05_stream_static_enrichment",
        "st07_transform_with_state",  # state-v2 + worker protobuf bootstrap
        "st08_python_stream_source",  # streaming Python DataSource drain loop
        "st09_foreachbatch_upsert",  # multi-batch MERGE snapshot swap
        "st10_chained_stream_aggs",  # multi-stateful single query
        "st11_session_window_agg",  # state-store session-merge operator
        "st12_sliding_window_counts",  # overlapping-window state fan-out
        "st13_outer_stream_join",
        "st14_stream_union",
        "st15_stream_observed_metrics",
        "p04_stream_ingest_pipeline",  # flagship streaming composition
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

    force_active, soft_active = active_pins(seen)

    def key(n: str) -> tuple[float, int]:
        if n in force_active and n not in seen:
            rank = -3.5
        elif n in force_active:
            # semantics changed since the green row: a STALE-WRONG row
            # is worse than a new query having no row yet (new queries
            # are locally parity-tested from day one), so these outrank
            # this round's additions.  (A pin whose query earned a
            # green row in a round >= the pin round is NOT active and
            # falls through to the plain branches below.)
            rank = -3.0
        elif n not in seen and n in RISKY_NEW:
            rank = -2.5  # novel execution paths: check before plain additions
        elif n not in seen:
            rank = -2.0  # never-checked backlog, in registry order
        elif n in soft_active:
            rank = -1.0  # plan-only rewrite; old row still valid
        else:
            rank = float(seen[n])  # stalest green first
        return (rank, idx[n])

    order.sort(key=key)
    return {name: REGISTRY[name] for name in order}
