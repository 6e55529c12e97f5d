#!/usr/bin/env python
"""Capture .explain("formatted") for the benched queries.

Usage: python scripts/capture_plans.py <out_dir> [suffix] [names...]

Writes <out_dir>/<query>_<suffix>.txt (suffix defaults to "before").
Only the named queries are captured when names are given; otherwise
the bench HEADLINE + EXTENDED sets plus the extract legs' source scan.

NOTE: builders with eager internal actions (iterative graph folds,
codebook collects) EXECUTE those actions during plan construction —
run this on an otherwise idle host, not concurrently with a bench.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import EXTENDED, HEADLINE  # noqa: E402
from flaco_spark.cachepool import release_caches  # noqa: E402
from flaco_spark.inventory import load_inventory  # noqa: E402
from flaco_spark.session import get_session  # noqa: E402


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or (HEADLINE + EXTENDED)
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="capture_plans")
    registry = load_inventory()
    for name in names:
        spec = registry[name]
        try:
            df = spec.builder(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
            print(f"# wrote {name}_{suffix}.txt", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — capture the rest anyway
            (out_dir / f"{name}_{suffix}.txt").write_text(f"ERROR: {exc}\n")
            print(f"# ERROR {name}: {exc}", file=sys.stderr)
        release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
