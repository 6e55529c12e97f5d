"""Differential test: every oracle-checkable inventory query must match
DuckDB exactly (row count, column names, and values — including
bit-identical doubles, which the exact-decimal discipline guarantees).

This mirrors the driver's CORRECTNESS gate so regressions surface
locally first.
"""

from __future__ import annotations

import math

import pytest

from flaco_spark.inventory import load_inventory

REGISTRY = load_inventory()
ORACLE_SPECS = sorted(name for name, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_SPECS = sorted(name for name, s in REGISTRY.items() if s.oracle is None)


def _canonical(df, float_exact=True):
    """pandas DataFrame → sorted list of row tuples with stable value repr."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("<null>")
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            elif isinstance(v, float):
                vals.append(repr(v) if float_exact else f"{v:.9g}")
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return cols, out


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_match(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    got = spec.builder(spark, sf_dir).toPandas()
    want = duck.execute(spec.oracle).df()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"

    g_cols, g_rows = _canonical(got)
    w_cols, w_rows = _canonical(want)
    mismatches = [i for i, (a, b) in enumerate(zip(g_rows, w_rows)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={g_rows[mismatches[0]]} duckdb={w_rows[mismatches[0]]} cols={g_cols}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
