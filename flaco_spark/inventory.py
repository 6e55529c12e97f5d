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
# driver-green CORRECTNESS row, plus never-checked single stragglers
# the round-5 judge explicitly pinned (task 1: g11/st06/s03 are the
# only never-checked members of otherwise-green families; task 4: q66
# changed execution path in r5 — offsets now attach by broadcast join
# — and its last green row, r2, describes the old plan).  The r4/r5
# pins (q12/q21/g01/g07, st07) all earned fresh green rows in
# CORRECTNESS_r05 and rotate normally again.
FORCE_RECHECK: frozenset[str] = frozenset(
    {
        "g11_harmonic_centrality",  # never driver-checked (r5 judge pin)
        "st06_stream_parquet_sink",  # never driver-checked (r5 judge pin)
        "s03_hot_cold_split_join",  # never driver-checked (r5 judge pin)
        "q66_distribution_windows_dist",  # r5 plan change; green row predates it
        # r6: the graph score sums moved from src-ordered float folds
        # to exact fixed-point quantized sums (graph.py::quantized_sum,
        # SCALING.md r6) — VALUES changed in the low decimals, so the
        # r5 green rows describe superseded semantics and must be
        # re-earned, ahead of never-checked names.
        "g01_pagerank",
        "g05_personalized_pagerank",
        "g07_hits",
    }
)

# Plan-only rewrites (identical results, old rows remain valid
# evidence): refresh after semantics changes, before stale greens.
# r6: the staleness audit (scripts/staleness_report.py, VERDICT r5
# task 8) flagged these five — their builders were rewritten after
# their r3 green rows (the r4 vector-family map-side campaign; local
# oracle parity stayed green throughout, so values are unchanged) but
# no driver row describes the shipped plans yet.
SOFT_RECHECK: frozenset[str] = frozenset(
    {
        "e01_knn_bruteforce",
        "e03_ann_sign_lsh",
        "e06_lsh_recall",
        "e07_kmeans_iteration",
        "ts10_gap_detection",
    }
)

# r6 burn-down order WITHIN the never-checked tier (VERDICT r5 task 1):
# the driver samples a 50-row prefix, and in plain registry order the
# 39 q-extras would crowd out the largest untouched family (ts19–39).
# Families listed here outrank unlisted never-checked names; unlisted
# ones (the q-extras) follow in registry order and clear next round.
_ROTATION_FAMILY_PRIORITY: tuple[str, ...] = ("ts", "e", "m", "u")


def _family_rank(name: str) -> int:
    prefix = name.split("_", 1)[0].rstrip("0123456789")
    try:
        return _ROTATION_FAMILY_PRIORITY.index(prefix)
    except ValueError:
        return len(_ROTATION_FAMILY_PRIORITY)

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

    def key(n: str) -> tuple[float, int, int]:
        fam = 0
        if n in FORCE_RECHECK and n not in seen:
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
            rank = -2.0  # never-checked backlog, burned down by family
            fam = _family_rank(n)
        elif n in SOFT_RECHECK:
            rank = -1.0  # plan-only rewrite; old row still valid
        else:
            rank = float(seen[n])  # stalest green first
        return (rank, fam, idx[n])

    order.sort(key=key)
    return {name: REGISTRY[name] for name in order}
