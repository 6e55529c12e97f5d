#!/usr/bin/env python
"""Tree-vs-tree A/B for the r7 st07/p02 drift (VERDICT r7 task 1).

Runs the same queries from two checkouts (e.g. HEAD vs the r6 round
close) in interleaved fresh processes, spin-bracketed, comparing
per-variant minima — the only measurement shape this host's noise
respects (SCALING.md round-5/7 lessons).

Child:  python scripts/bisect_tree.py --child <repo_root> [sf_dir]
Parent: python scripts/bisect_tree.py <treeA> <treeB> [reps] [sf_dir]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

import os

QUERIES = (os.environ.get("BISECT_QUERIES")
           or "st07_transform_with_state,p02_index_build_pipeline").split(",")


def spin() -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        x = 0
        for i in range(20_000_000):
            x += i
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def child(root: str, sf_dir: str) -> None:
    sys.path.insert(0, root)
    from flaco_spark.cachepool import release_caches
    from flaco_spark.inventory import load_inventory
    from flaco_spark.session import get_session

    pre = spin()
    spark = get_session(app_name="bisect_tree")
    registry = load_inventory()
    out: dict[str, float] = {}
    for name in QUERIES:
        spec = registry[name]
        spec.builder(spark, sf_dir).count()
        release_caches()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        release_caches()
        out[name] = round(best, 4)
    post = spin()
    print(json.dumps({"root": root, "spin_pre": pre, "spin_post": post,
                      "timings": out, "ansi": spark.conf.get("spark.sql.ansi.enabled")}))


def parent(tree_a: str, tree_b: str, reps: int, sf_dir: str) -> None:
    results: dict[str, dict[str, list[float]]] = {
        q: {tree_a: [], tree_b: []} for q in QUERIES
    }
    discarded = 0
    for rep in range(reps):
        for root in (tree_a, tree_b):
            proc = subprocess.run(
                [sys.executable, __file__, "--child", root, sf_dir],
                capture_output=True, text=True, cwd=root,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            if not line.startswith("{"):
                print(f"rep{rep} {root}: child failed\n{proc.stderr[-2000:]}",
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
                    results[q][root].append(r["timings"][q])
            print(f"rep{rep} {root} (ansi={r['ansi']}): {r['timings']} "
                  f"spin {r['spin_pre']}/{r['spin_post']}{tag}", flush=True)
    print()
    for q in QUERIES:
        a, b = results[q][tree_a], results[q][tree_b]
        if a and b:
            ma, mb = min(a), min(b)
            print(f"{q}: A({tree_a}) min {ma:.3f}s  B({tree_b}) min {mb:.3f}s  "
                  f"A/B {ma / mb:.3f}")
    if discarded:
        print(f"({discarded} contended child runs discarded)")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print("usage: bisect_tree.py <tree_a> <tree_b> [reps] [sf_dir]\n"
              "       bisect_tree.py --child <tree> [sf_dir]", file=sys.stderr)
        raise SystemExit(2)
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3] if len(sys.argv) > 3
              else "/root/testdata/sf0.1")
    else:
        tree_a, tree_b = sys.argv[1], sys.argv[2]
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        sf = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
        parent(tree_a, tree_b, reps, sf)
