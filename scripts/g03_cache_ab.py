#!/usr/bin/env python
"""g03_label_propagation 100× page-cache A/B (VERDICT r8 task 5).

g03 read 13.5 s (r7) → 17.1 s (r8, requote-confirmed "real") at 100×
with ZERO builder change.  Its siblings g02/g07 already measured the
suspected mechanism — scan-dominated graph queries are I/O-bistable
on page-cache state (g02: 29.2 s cold vs 14.1 s warm in the same r8
probe) — but g03's probe row only ever recorded ONE run, so its
cross-round delta could not be attributed.  This script pins the
mechanism: isolated quiet reps alternating warm-cache and
dropped-cache (echo 3 > /proc/sys/vm/drop_caches), fresh SparkSession
per rep, spin-bracketed.

If sec_cold − sec_warm covers the r7→r8 delta, the "regression" is
fixture/page-cache layout, not code; the fix for the standing probe
is g03 joining g02/g07's runs=2 cold/warm recording.

Usage: python scripts/g03_cache_ab.py [base_sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

QUERY = "g03_label_propagation"


def _drop_page_cache() -> bool:
    try:
        subprocess.run(["sync"], check=True, timeout=120)
        Path("/proc/sys/vm/drop_caches").write_text("3\n")
        return True
    except (OSError, subprocess.SubprocessError) as exc:
        print(f"# drop_caches unavailable: {exc}", file=sys.stderr)
        return False


def _one_rep(sf_dir: str, label: str) -> dict:
    """One isolated rep in a FRESH subprocess (cold JVM, cold codegen
    — position-independent like the 100× probe's one-session-per-query
    discipline)."""
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--child", sf_dir],
            capture_output=True,
            text=True,
            timeout=900,
        )
    except subprocess.TimeoutExpired:
        row = {"error": "timeout after 900s", "label": label}
        print(f"# {label}: TIMEOUT", file=sys.stderr)
        return row
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    try:
        row = json.loads(line)
    except json.JSONDecodeError:
        row = {"error": proc.stderr[-400:]}
    row["label"] = label
    print(f"# {label}: {row}", file=sys.stderr)
    return row


def _child(sf_dir: str) -> None:
    import bench

    from flaco_spark.inventory import load_inventory
    from flaco_spark.session import get_session

    bench._wait_for_quiet(
        float(os.environ.get("PROBE_QUIET_WAIT_S", "180")),
        "g03_ab",
        membw_floor=bench.QUIET_MEMBW_MEASURE_GBPS,
    )
    pre = bench._host_probe()
    spark = get_session(app_name="g03_cache_ab")
    t0 = time.perf_counter()
    rows = load_inventory()[QUERY].builder(spark, sf_dir).count()
    sec = round(time.perf_counter() - t0, 2)
    post = bench._host_probe()
    spark.stop()
    print(
        json.dumps(
            {
                "sec": sec,
                "rows": rows,
                "spin_pre": pre["spin_sec"],
                "spin_post": post["spin_sec"],
                "membw_pre": pre["membw_gbps"],
                "membw_post": post["membw_gbps"],
            }
        )
    )


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2])
        return 0
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from flaco_spark.session import get_session
    from scripts.scale_probe import materialize

    out = tempfile.mkdtemp(prefix="flaco_g03ab_")
    try:
        spark = get_session(app_name="g03_ab_build")
        t0 = time.perf_counter()
        materialize(spark, base, out, copies=100, n_files=32)
        build_s = round(time.perf_counter() - t0, 1)
        spark.stop()
        print(f"# materialized 100x fixture in {build_s}s", file=sys.stderr)

        reps = []
        # warm (page cache hot from the build), then alternate
        # cold/warm twice so each state has two observations.
        reps.append(_one_rep(out, "warm_postbuild"))
        for i in range(2):
            dropped = _drop_page_cache()
            reps.append(_one_rep(out, f"cold_{i}" if dropped else f"nodrop_{i}"))
            reps.append(_one_rep(out, f"warm_{i}"))

        warm = [r["sec"] for r in reps if r.get("sec") and r["label"].startswith("warm")]
        cold = [r["sec"] for r in reps if r.get("sec") and r["label"].startswith("cold")]
        summary = {
            "query": QUERY,
            "scale": "100x_sf0.1",
            "build_sec": build_s,
            "reps": reps,
            "warm_secs": warm,
            "cold_secs": cold,
            "cold_minus_warm": round(min(cold) - min(warm), 2)
            if warm and cold
            else None,
            "r7_probe_sec": 13.5,
            "r8_probe_sec": 17.11,
        }
        print(json.dumps(summary))
        if out_path:
            Path(out_path).write_text(json.dumps(summary, indent=1) + "\n")
        return 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
