#!/usr/bin/env python
"""Root-cause probe for d16_decontamination's sf0.1 bimodality
(VERDICT r8 task 3).

Three "quiet-gated" measurements of the same half-second query spread
4.8x across rounds (0.546 / 1.251 / 2.60 s) while the 10x number got
FASTER — either a sub-resolution host-contention mode or a real
small-scale effect (broadcast-exchange build timing was the suspect).

Protocol: N isolated reps, each a FRESH process (the bimodality was
observed across processes), each rep quiet-gated, warmup + 3 timed
runs with EVERY run recorded (not just best-of), and a per-job
decomposition parsed from the Spark event log so the two modes'
timelines can be compared — if the slow mode's extra second sits in
one job (the broadcast build) vs spread across all stages (host), the
mechanism is named either way.

Usage:
    python scripts/d16_probe.py [reps] [sf_dir] [out.json]
    python scripts/d16_probe.py --child <sf_dir>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

QUERY = "d16_decontamination"


def _parse_event_log(log_dir: str) -> list[dict]:
    """Per-job wall-time decomposition from the Spark event log:
    [{job, sec, stages: [{name, sec, tasks}]}] in start order."""
    # Spark 4 writes a rolling event-log DIRECTORY per application
    # (eventlog_v2_<app>/events_1_...); collect every regular file.
    files = sorted(p for p in Path(log_dir).rglob("*") if p.is_file())
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    for f in files:
        try:
            text = f.read_text(errors="ignore")  # skip any binary sidecar
        except OSError:
            continue
        for line in text.splitlines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {"job": jid, "t0": ev["Submission Time"]}
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif kind == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["sec"] = round(
                        (ev["Completion Time"] - jobs[jid]["t0"]) / 1000.0, 3
                    )
            elif kind == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                sid = info["Stage ID"]
                sub = info.get("Submission Time")
                comp = info.get("Completion Time")
                stages[sid] = {
                    "stage": sid,
                    "name": info.get("Stage Name", "")[:60],
                    "sec": round((comp - sub) / 1000.0, 3)
                    if sub and comp
                    else None,
                    "tasks": info.get("Number of Tasks"),
                }
    out = []
    for jid in sorted(jobs):
        row = dict(jobs[jid])
        row.pop("t0", None)
        row["stages"] = [
            stages[sid]
            for sid in sorted(stages)
            if stage_to_job.get(sid) == jid
        ]
        out.append(row)
    return out


def _child(sf_dir: str) -> None:
    import bench  # repo-root bench: reuse its quiet gate + probes

    from flaco_spark.cachepool import release_caches
    from flaco_spark.inventory import load_inventory
    from flaco_spark.session import get_session

    gate = bench._wait_for_quiet(
        float(os.environ.get("D16_PROBE_QUIET_WAIT_S", "120")),
        "d16_probe",
        membw_floor=bench.QUIET_MEMBW_MEASURE_GBPS,
    )
    pre = bench._host_probe()
    log_dir = tempfile.mkdtemp(prefix="d16_eventlog_")
    spark = get_session(
        app_name="d16_probe",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{log_dir}",
            # default zstd compression would need a non-stdlib reader
            "spark.eventLog.compress": "false",
        },
    )
    builder = load_inventory()[QUERY].builder
    t0 = time.perf_counter()
    builder(spark, sf_dir).count()  # warmup (same discipline as bench)
    warm_sec = round(time.perf_counter() - t0, 4)
    release_caches()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        builder(spark, sf_dir).count()
        runs.append(round(time.perf_counter() - t0, 4))
        release_caches()
    post = bench._host_probe()
    spark.stop()  # flush the event log
    time.sleep(0.5)
    print(
        json.dumps(
            {
                "runs": runs,
                "warm_sec": warm_sec,
                "gate": gate,
                "spin_pre": pre["spin_sec"],
                "spin_post": post["spin_sec"],
                "membw_pre": pre["membw_gbps"],
                "membw_post": post["membw_gbps"],
                "jobs": _parse_event_log(log_dir),
            }
        )
    )


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2])
        return 0
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    rows = []
    for i in range(reps):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--child", sf_dir],
                capture_output=True,
                text=True,
                timeout=900,
            )
        except subprocess.TimeoutExpired:
            # A hung rep (the noisy host this probe diagnoses!) must
            # not discard every already-collected rep — record and go on.
            rows.append({"rep": i, "error": "timeout after 900s"})
            print(f"# rep {i}: TIMEOUT", file=sys.stderr)
            continue
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            row = {"error": proc.stderr[-400:]}
        row["rep"] = i
        rows.append(row)
        best = min(row.get("runs", [float("nan")]))
        print(
            f"# rep {i}: runs={row.get('runs')} best={best} "
            f"spin={row.get('spin_pre')}/{row.get('spin_post')} "
            f"membw={row.get('membw_pre')}/{row.get('membw_post')} "
            f"quiet={row.get('gate', {}).get('quiet')}"
            + (f" ERROR={row['error']!r}" if "error" in row else ""),
            file=sys.stderr,
        )
    bests = sorted(min(r["runs"]) for r in rows if r.get("runs"))
    all_runs = sorted(x for r in rows if r.get("runs") for x in r["runs"])
    summary = {
        "query": QUERY,
        "sf_dir": sf_dir,
        "reps": reps,
        "bests": bests,
        "spread_best": round(bests[-1] / bests[0], 2) if bests else None,
        "all_runs_min": all_runs[0] if all_runs else None,
        "all_runs_max": all_runs[-1] if all_runs else None,
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
    if out_path:
        Path(out_path).write_text(json.dumps(summary, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
