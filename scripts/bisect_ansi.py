#!/usr/bin/env python
"""A/B bisect for the r7 st07/p02 drift (VERDICT r7 task 1).

Suspect: the r7 `spark.sql.ansi.enabled` pin (session.py) — ANSI adds
overflow checks to arithmetic-heavy paths. Protocol per SCALING.md /
the host-noise discipline: each measurement runs in a FRESH process
(child mode), the parent interleaves variants A,B,A,B..., and the
verdict compares per-variant MINIMA; every child brackets itself with
spin probes and a child whose probes disagree >1.3x is discarded.

Child:  python scripts/bisect_ansi.py --child <ansi:true|false> [sf_dir]
Parent: python scripts/bisect_ansi.py [reps=3] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = ["st07_transform_with_state", "p02_index_build_pipeline"]


def spin() -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        x = 0
        for i in range(20_000_000):
            x += i
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def child(ansi: str, sf_dir: str) -> None:
    from flaco_spark.cachepool import release_caches
    from flaco_spark.inventory import load_inventory
    from flaco_spark.session import get_session

    pre = spin()
    spark = get_session(app_name=f"bisect_ansi_{ansi}")
    spark.conf.set("spark.sql.ansi.enabled", ansi)
    registry = load_inventory()
    out: dict[str, float] = {}
    for name in QUERIES:
        spec = registry[name]
        spec.builder(spark, sf_dir).count()  # warm-up, untimed
        release_caches()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        release_caches()
        out[name] = round(best, 4)
    post = spin()
    print(json.dumps({"ansi": ansi, "spin_pre": pre, "spin_post": post,
                      "timings": out}))


def parent(reps: int, sf_dir: str) -> None:
    results: dict[str, dict[str, list[float]]] = {
        q: {"true": [], "false": []} for q in QUERIES
    }
    discarded = 0
    for rep in range(reps):
        for ansi in ("true", "false"):
            proc = subprocess.run(
                [sys.executable, __file__, "--child", ansi, sf_dir],
                capture_output=True, text=True,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            if not line.startswith("{"):
                print(f"rep{rep} ansi={ansi}: child failed\n{proc.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            r = json.loads(line)
            ratio = max(r["spin_pre"], r["spin_post"]) / min(r["spin_pre"], r["spin_post"])
            tag = ""
            if ratio > 1.3:
                discarded += 1
                tag = "  [DISCARDED: contended]"
            else:
                for q in QUERIES:
                    results[q][ansi].append(r["timings"][q])
            print(f"rep{rep} ansi={ansi}: {r['timings']} "
                  f"spin {r['spin_pre']}/{r['spin_post']}{tag}", flush=True)
    print()
    for q in QUERIES:
        a, b = results[q]["true"], results[q]["false"]
        if a and b:
            ma, mb = min(a), min(b)
            print(f"{q}: ANSI=true min {ma:.3f}s  ANSI=false min {mb:.3f}s  "
                  f"ratio {ma / mb:.3f}")
    if discarded:
        print(f"({discarded} contended child runs discarded)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3] if len(sys.argv) > 3
              else "/root/testdata/sf0.1")
    else:
        reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        parent(reps, sf)
