#!/usr/bin/env python
"""Band-curve probe for a flagged bench row (the t22/g01 protocol,
generalized — VERDICT r10 task 3: d04 is this round's subject).

Samples `bench.py --isolate <query>` repeatedly over wall-clock,
WITHOUT a quiet gate, recording each point's DRAM-bandwidth bracket —
the goal is points ACROSS bands so the sec-vs-band curve itself says
whether a cross-round delta is the band or the engine (SCALING.md
rounds 8-10: this host's 6-20 GB/s windows tax Spark 15-30% and last
minutes to hours; a flagged row whose timings are monotone in the
band, with no code diff, is a measurement artifact).

Usage:
    python scripts/band_curve.py <query> [hours] [sf_dir] [out_jsonl]

Appends one JSON line per point: {ts_s (monotonic within the run),
membw_gate (fresh pre-launch probe), sec, spin_pre/post,
membw_pre/post (the child's own bracket), band}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def membw() -> float:
    import numpy as np

    n = 64 * 1024 * 1024 // 8
    a, b = np.ones(n), np.ones(n)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        np.copyto(b, a)
        best = max(best, 2 * a.nbytes / (time.perf_counter() - t0) / 1e9)
    return round(best, 1)


def band(bw: float) -> str:
    return "n/a" if bw <= 0 else "<10" if bw < 10 else "10-15" if bw < 15 else ">=15"


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    query = sys.argv[1]
    hours = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out = Path(sys.argv[4]) if len(sys.argv) > 4 else REPO / f"BAND_CURVE_{query}.jsonl"
    env = dict(os.environ)
    env["BENCH_ISOLATE_QUIET_WAIT_S"] = "0"  # sample the CURRENT band
    t_end = time.monotonic() + hours * 3600
    t0 = time.monotonic()
    while time.monotonic() < t_end:
        gate_bw = membw()
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--isolate", query, sf_dir],
            capture_output=True, text=True, env=env, cwd=str(REPO),
            timeout=900,
        )
        line = ""
        for ln in (proc.stdout or "").strip().splitlines()[::-1]:
            if ln.startswith("{"):
                line = ln
                break
        if not line:
            print(f"# child failed: {proc.stderr[-500:]}", file=sys.stderr)
            time.sleep(60)
            continue
        r = json.loads(line)
        bws = [v for v in (gate_bw, r.get("membw_pre", 0), r.get("membw_post", 0)) if v > 0]
        point = {
            "ts_s": round(time.monotonic() - t0, 1),
            "membw_gate": gate_bw,
            "sec": r["sec"],
            "spin_pre": r["spin_pre"], "spin_post": r["spin_post"],
            "membw_pre": r.get("membw_pre", 0.0),
            "membw_post": r.get("membw_post", 0.0),
            "band": band(min(bws) if bws else 0.0),
        }
        with out.open("a") as fh:
            fh.write(json.dumps(point) + "\n")
        print(json.dumps(point), flush=True)
        time.sleep(180)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
