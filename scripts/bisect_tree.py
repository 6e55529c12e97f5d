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


def membw() -> float:
    """DRAM copy bandwidth probe (bench.py's third noise domain)."""
    import numpy as np

    n = 64 * 1024 * 1024 // 8
    a, b = np.ones(n), np.ones(n)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        np.copyto(b, a)
        best = max(best, 2 * a.nbytes / (time.perf_counter() - t0) / 1e9)
    return round(best, 1)


# r10 (VERDICT r9 task 2): the A/B must run at the >=15 GB/s
# measurement floor — reps launched below it are wasted wall-clock
# AND not within-band comparable.  Bounded wait per rep pair.
MEMBW_FLOOR = float(os.environ.get("BISECT_MEMBW_FLOOR", "15"))
GATE_WAIT_S = float(os.environ.get("BISECT_GATE_WAIT_S", "240"))


def gate(rep: int) -> float:
    t0 = time.perf_counter()
    while True:
        bw = membw()
        if bw >= MEMBW_FLOOR or time.perf_counter() - t0 > GATE_WAIT_S:
            if bw < MEMBW_FLOOR:
                print(f"rep{rep}: gate GAVE UP at {bw} GB/s", file=sys.stderr)
            return bw
        time.sleep(10)


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
        bw = gate(rep)
        if bw < MEMBW_FLOOR:
            # r10 review: a pair launched after a gate give-up is
            # guaranteed-discarded below — skip it instead of spending
            # two Spark children on numbers nothing will use.
            discarded += 2
            print(f"rep{rep}: SKIPPED (membw {bw} < {MEMBW_FLOOR})", flush=True)
            continue
        # Alternate launch order per rep (r10): the second child of a
        # pair inherits the first's page-cache warmup of the parquet
        # inputs, so a fixed A-then-B order systematically flatters B —
        # measured on g01: the second-launched tree ran ~10-15% faster
        # in back-to-back pairs regardless of which tree it was.
        order = (tree_a, tree_b) if rep % 2 == 0 else (tree_b, tree_a)
        for root in order:
            # r11 (ADVICE r10): the pair gate samples bandwidth ONCE,
            # before child A — a window closing between children went
            # undetected and the per-child discard branch was dead code.
            # Bracket each child with fresh probes; the child's band
            # reading is the WORSE of the two, so a window that closes
            # mid-child discards that child, not the whole pair.
            bw_pre = membw()
            proc = subprocess.run(
                [sys.executable, __file__, "--child", root, sf_dir],
                capture_output=True, text=True, cwd=root,
            )
            bw_child = min(bw_pre, membw())
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            if not line.startswith("{"):
                print(f"rep{rep} {root}: child failed\n{proc.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            r = json.loads(line)
            ratio = max(r["spin_pre"], r["spin_post"]) / min(r["spin_pre"], r["spin_post"])
            tag = ""
            # Discard on a shifted spin bracket OR an out-of-band
            # PER-CHILD bandwidth bracket (r10: the within-band A/B the
            # g01 adjudication needs — below-band reps are not
            # comparable evidence).
            if ratio > 1.3 or bw_child < MEMBW_FLOOR:
                discarded += 1
                tag = ("  [DISCARDED: contended]" if ratio > 1.3
                       else f"  [DISCARDED: membw {bw_child} < {MEMBW_FLOOR}]")
            else:
                for q in QUERIES:
                    results[q][root].append(r["timings"][q])
            print(f"rep{rep} {root} (ansi={r['ansi']}, membw {bw_child}): "
                  f"{r['timings']} spin {r['spin_pre']}/{r['spin_post']}{tag}",
                  flush=True)
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
