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

    seen = _last_green_round()
    order = list(REGISTRY)
    idx = {name: i for i, name in enumerate(order)}

    def key(n: str) -> tuple[float, int]:
        if n not in seen:
            rank = -3.0  # never driver-checked: always first
        elif n in FORCE_RECHECK:
            rank = -2.0  # semantics changed since the green row
        elif n in SOFT_RECHECK:
            rank = -1.0  # plan-only rewrite; old row still valid
        else:
            rank = float(seen[n])  # stalest green first
        return (rank, idx[n])

    order.sort(key=key)
    return {name: REGISTRY[name] for name in order}
