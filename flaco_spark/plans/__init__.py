"""Physical-plan inspection helpers.

Used by tests (and humans) to assert the plans we want at scale
actually materialize: filters pushed into the parquet scan, column
pruning, broadcast joins on dimension tables, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in inner.split(",") if ":" in f)
    return cols


def _node_count(df: DataFrame, *node_names: str) -> int:
    """Count physical-plan NODES by name.

    The formatted explain prints each node twice (tree overview +
    numbered detail section), so a raw substring count double-counts;
    only the ``(NN) NodeName`` detail headers are unique per node.
    """
    import re

    plan = formatted_plan(df)
    pat = re.compile(r"^\(\d+\)\s+(\w+)")
    count = 0
    for line in plan.splitlines():
        m = pat.match(line.strip())
        if m and any(m.group(1).startswith(n) for n in node_names):
            count += 1
    return count


def broadcast_join_count(df: DataFrame) -> int:
    """Broadcast joins of any flavor (hash or nested-loop)."""
    return _node_count(df, "BroadcastHashJoin", "BroadcastNestedLoopJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return _node_count(df, "SortMergeJoin")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle-exchange NODES in the physical plan
    (broadcast exchanges excluded — those move dim-sized data)."""
    return _node_count(df, "Exchange")


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)
