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


def load_inventory() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: fills REGISTRY)."""
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

    return REGISTRY
