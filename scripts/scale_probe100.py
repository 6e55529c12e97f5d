#!/usr/bin/env python
"""100× growth-curve probe for the SLOW TAIL of the 10× probe.

The 10× probe (scripts/scale_probe.py) is the per-round regression
check; this one answers the round-4 verdict's task 6 question — does
the slow tail stay (sub-)linear from 10× to 100×?  It materializes a
key-shifted 100-copy union of sf0.1 (60M lineitem rows, 5M document
rows / 500k distinct texts ×100 copies, 2M vectors) and times ONLY
the families the 10× probe ranked slowest: the iterative graph ops
(g01/g02/g03/g05/g07 — quantized exact sums since r6), the
inverted-index dedups (d08/d09), the PQ pair (e11/e15), the XML
round-trip (q112 — probed on a bounded shard and linearly
extrapolated; its full-scale linearity was established in r5), and
the two wordcount-shaped text passes (t18/t19).

EVERY QUERY RUNS IN ITS OWN FRESH SparkSession (r6 change): at 100×
a long shared session ages — shuffle files, codegen caches, and GC
pressure accumulate, measured as g05 creeping 33.4 → 44.7 → 56.2 s
over back-to-back identical runs on a spin-verified quiet host, and
as g07 recording 84 s mid-sequence vs 18.8 s isolated.  One session
per query makes each number position-independent and matches how a
production job actually runs (one application per job).  One timed
run per query, cold engine, with a spin probe bracketing each —
recorded in the JSON so a contention window is attributable.
Curvature is reported as growth_vs_10x = sec / the newest 10× probe
second; ≤ ~10 means linear-or-better in the 10×→100× decade.

Usage:
    python scripts/scale_probe100.py [base_sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from flaco_spark.inventory import load_inventory
from flaco_spark.session import get_session
from scripts.scale_probe import materialize

PROBE_100X = [
    "t19_novelty_curve",
    "e11_pq_encode",
    "d09_dedup_components",
    "g02_triangle_count",
    "d08_ngram_jaccard_pairs",
    "e15_ivfpq_search",
    "g01_pagerank",
    "g05_personalized_pagerank",
    "t18_char_bigram_lm",
    "g03_label_propagation",
    "g07_hits",
]

# Format-ingest runtime cap (VERDICT r5 task 7): per-row text/codec
# serialization is MEASURED linear (q112: SCALE_PROBE_r05 110.2 s at
# 100x, 10.7x/decade) — re-proving a known-linear pure-I/O cost at
# full probe scale burns ~2 min per run and would burn ~20 at a
# future 1000x.  The standing probe therefore runs these rows on a
# bounded 10-copy shard and extrapolates linearly; each row records
# both the measured shard time and the extrapolation so the cap is
# visible, never silent.  r7 adds q140: the Avro round-trip's pure-
# Python codec is the same per-row cost class as q112's XML text.
SHARD_COPIES = 10
SHARDED = ["q112_xml_roundtrip", "q140_avro_roundtrip"]

# One-time evidence refresh (VERDICT r7 "What's wrong" #3: q112's 100x
# row had been a flagged extrapolation since r6): PROBE_FULL_FORMATS=1
# runs the SHARDED rows against the FULL 100x fixture instead — real
# measured numbers, extrapolated: false — at ~2 min/row extra runtime.
# The standing (unflagged) default stays the bounded shard; the flag
# exists so any round can re-earn the full-scale linearity evidence
# without editing code.
FULL_FORMATS = os.environ.get("PROBE_FULL_FORMATS") == "1"


def _spin() -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        x = 0
        for i in range(20_000_000):
            x += i
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _newest_10x_baseline(root: Path) -> dict:
    """Growth denominator: the NEWEST recorded 10× probe, so queries
    rewritten since r4 (the quantized-sum graph family) divide by the
    numbers their shipped plans actually produce at 10×."""
    # Sort by round NUMBER, not filename: lexicographic order breaks
    # the moment zero-padding runs out (r9_10x > r10_10x), same regex
    # discipline as snapshot_commits()/_last_green_round().
    def _round_no(p: Path) -> int:
        m = re.search(r"SCALE_PROBE_r(\d+)_10x", p.name)
        return int(m.group(1)) if m else -1

    candidates = sorted(
        root.glob("SCALE_PROBE_r*_10x.json"), key=_round_no, reverse=True
    ) + [root / "SCALE_PROBE_r04.json"]
    for ref_path in candidates:
        if ref_path.is_file():
            print(f"# 10x baseline: {ref_path.name}", file=sys.stderr)
            return json.loads(ref_path.read_text()).get("queries", {})
    return {}


def _timed_run(
    name: str, sf_dir: str, app: str, runs: int = 1
) -> tuple[list[float], int, dict]:
    """``runs`` back-to-back executions of ``name`` in ONE fresh
    session; returns every per-run time in order (run 0 = cold).

    runs=1 (the 100× default): cold-engine single shot — at full
    scale the data term dwarfs session warm-up.  runs=2: the caller
    wants the cold/warm split — either to use the warm number (q112's
    bounded shard, where extrapolating the fixed session warm-up ×10
    would fabricate growth: 29.6 s cold vs 10.6 s warm measured) or
    to RECORD both (g02, VERDICT r6 task 5: its cold readings span
    57–126 s on page-cache state alone vs ~17 s warm, so a plan
    regression is only distinguishable from I/O state if both numbers
    are on file)."""
    # r10 (SCALING.md round-10): gate at the 15 GB/s MEASUREMENT floor
    # and bracket every row with the membw probe too — this probe's
    # spin-only brackets were blind to the bandwidth domain, the
    # blindness that minted t22's r9 flag and this round's five
    # flat-at-10x "regressions".
    from bench import QUIET_MEMBW_MEASURE_GBPS, _membw_gbps, _wait_for_quiet

    _wait_for_quiet(
        float(os.environ.get("PROBE_QUIET_WAIT_S", "300")), f"gate_{name}",
        membw_floor=QUIET_MEMBW_MEASURE_GBPS,
    )
    spark = get_session(app_name=app)
    try:
        registry = load_inventory()
        probes = {"pre": _spin(), "membw_pre": _membw_gbps()}
        times: list[float] = []
        rows = 0
        for _ in range(runs):
            t0 = time.perf_counter()
            rows = registry[name].builder(spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 2))
        probes["post"] = _spin()
        probes["membw_post"] = _membw_gbps()
        return times, rows, probes
    finally:
        spark.stop()


def _newest_100x_baseline(root: Path, exclude: str | None) -> dict:
    """Previous round's 100x probe (requote comparison base): newest
    SCALE_PROBE_r<N>.json that is not a _10x file and not this run's
    own output path."""

    def _round_no(p: Path) -> int:
        m = re.fullmatch(r"SCALE_PROBE_r(\d+)\.json", p.name)
        return int(m.group(1)) if m else -1

    for p in sorted(root.glob("SCALE_PROBE_r*.json"), key=_round_no, reverse=True):
        if _round_no(p) < 0 or (exclude and p.resolve() == Path(exclude).resolve()):
            continue
        try:
            data = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if data.get("scale", "").startswith("100x"):
            print(f"# requote baseline: {p.name}", file=sys.stderr)
            return data.get("queries", {})
    return {}


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    root = Path(__file__).resolve().parents[1]
    ref10 = _newest_10x_baseline(root)

    out = tempfile.mkdtemp(prefix="flaco_scale100_")
    shard = tempfile.mkdtemp(prefix="flaco_scale_shard_")
    try:
        # Materialize both fixtures in one throwaway session, then
        # stop it — measurements never share a session with the build.
        spark = get_session(app_name="scale_probe_100x_build")
        t0 = time.perf_counter()
        materialize(spark, base, out, copies=100, n_files=32)
        materialize(spark, base, shard, copies=SHARD_COPIES, n_files=32)
        build_s = round(time.perf_counter() - t0, 1)
        spark.stop()
        print(f"# materialized 100x + shard tables in {build_s}s", file=sys.stderr)

        results: dict[str, dict] = {}
        for name in PROBE_100X:
            # g02 records cold AND warm (VERDICT r6 task 5): its scan
            # dominates, so the cold number measures page-cache state,
            # the warm one the plan — growth is judged on warm.  g07
            # joined in r7: back-to-back quiet-host runs read 35.8 s
            # vs 16.3 s cold / 13.4 s warm — the same I/O bistability.
            runs = 2 if name in ("g02_triangle_count", "g07_hits") else 1
            times, rows, probes = _timed_run(name, out, f"probe100_{name}", runs=runs)
            sec = times[-1] if runs > 1 else times[0]
            row: dict = {"sec": sec, "rows": rows, "spin": probes}
            if runs > 1:
                row["sec_cold"] = times[0]
                row["sec_warm"] = times[-1]
                row["warm_basis"] = "growth judged on warm; cold = I/O state"
            base10 = (ref10.get(name) or {}).get("sec")
            if base10:
                row["sec_10x"] = base10
                row["growth_vs_10x"] = round(sec / base10, 2)
            results[name] = row
            print(
                f"# {name}: {sec:.2f}s ({rows} rows, "
                f"x{row.get('growth_vs_10x', '?')}, spin {probes})",
                file=sys.stderr,
            )

        # Bounded format-ingest shards (see SHARD_COPIES note above);
        # warm run so the extrapolation scales the data term, not
        # the session warm-up.  PROBE_FULL_FORMATS=1 measures the full
        # 100x fixture instead (evidence-refresh lane).
        for name in SHARDED:
            if FULL_FORMATS:
                times, rows, probes = _timed_run(
                    name, out, f"probe100_{name}", runs=1
                )
                row = {
                    "sec": times[0],
                    "extrapolated": False,
                    "rows": rows,
                    "spin": probes,
                }
            else:
                times, rows, probes = _timed_run(
                    name, shard, f"probe100_{name}", runs=2
                )
                sec = min(times)
                factor = 100 // SHARD_COPIES
                row = {
                    "sec_shard": sec,
                    "shard_copies": SHARD_COPIES,
                    "sec": round(sec * factor, 2),
                    "extrapolated": True,
                    "rows": rows,
                    "spin": probes,
                }
            base10 = (ref10.get(name) or {}).get("sec")
            if base10:
                row["sec_10x"] = base10
                row["growth_vs_10x"] = round(row["sec"] / base10, 2)
            results[name] = row
            if FULL_FORMATS:
                print(
                    f"# {name}: {row['sec']:.2f}s MEASURED at full 100x "
                    f"({rows} rows, x{row.get('growth_vs_10x', '?')})",
                    file=sys.stderr,
                )
            else:
                print(
                    f"# {name}: {row['sec_shard']:.2f}s on {SHARD_COPIES}x shard "
                    f"(-> {row['sec']:.2f}s linear-extrapolated 100x)",
                    file=sys.stderr,
                )

        # AUTO-REQUOTE (r8, the sibling of bench.py's and the 10x
        # probe's): the per-row spin brackets ATTRIBUTE contention but
        # until now nothing acted on it — the r8 first run recorded
        # g03 at 59.6 s (vs 13.5 s in r7) inside a spin-1.2 window and
        # would have shipped it.  A row is suspect when it regressed
        # >1.15x/+0.3 s vs the previous round's 100x probe OR its own
        # spin bracket ran >=1.3x the run's quietest bracket.  Each
        # suspect re-measures once in a fresh session (same runs/
        # fixture discipline as its first pass); the re-measure is
        # adopted only when >=20% faster.  If more than 5 of the 13
        # rows are suspect the whole run is declared noisy — re-run
        # the probe instead of laundering it row by row.
        prev100 = _newest_100x_baseline(root, sys.argv[2] if len(sys.argv) > 2 else None)
        spins = [
            s
            for row in results.values()
            for s in (row["spin"]["pre"], row["spin"]["post"])
        ]
        quiet_spin = min(spins) if spins else 0.0

        def _suspect(name: str, row: dict) -> bool:
            p = (prev100.get(name) or {}).get("sec")
            regressed = p is not None and row["sec"] > max(p * 1.15, p + 0.3)
            hot = quiet_spin > 0 and (
                max(row["spin"]["pre"], row["spin"]["post"]) >= 1.3 * quiet_spin
            )
            return regressed or hot

        flagged = [n for n, row in results.items() if _suspect(n, row)]
        if len(flagged) > 5:
            print(
                f"# requote: {len(flagged)} rows suspect (>5): host too noisy "
                "for a trustworthy run — re-run the probe instead",
                file=sys.stderr,
            )
        elif flagged:
            for name in flagged:
                shard_row = name in SHARDED and not FULL_FORMATS
                runs = 2 if (name in ("g02_triangle_count", "g07_hits") or shard_row) else 1
                fixture = shard if shard_row else out
                times, rows, probes = _timed_run(
                    name, fixture, f"probe100_requote_{name}", runs=runs
                )
                sec = min(times) if shard_row else (times[-1] if runs > 1 else times[0])
                if shard_row:
                    sec = round(sec * (100 // SHARD_COPIES), 2)
                old = results[name]
                if sec < old["sec"] * 0.8:
                    old.update(
                        sec_inrun=old["sec"],
                        sec=sec,
                        rows=rows,
                        spin=probes,
                        requote="isolated quiet re-measure; first pass "
                        "bracket was contended",
                    )
                    if runs > 1 and not shard_row:
                        old["sec_cold"], old["sec_warm"] = times[0], times[-1]
                    if old.get("sec_10x"):
                        old["growth_vs_10x"] = round(sec / old["sec_10x"], 2)
                    verdict = "requoted"
                else:
                    # r8 ADVICE: record the isolated measurement and its
                    # brackets IN the row (not just stderr) so the
                    # "regression is real" verdict is auditable from the
                    # artifact, same contract as bench.py's requote log.
                    # r10: the verdict demands WITHIN-BAND evidence, the
                    # same unified rule as bench._adjudicate_isolate —
                    # a hot spin bracket (vs the run floor) or a membw
                    # bracket below the 15 GB/s measurement floor keeps
                    # the in-run number instead of minting a below-band
                    # "regression is real".
                    old["sec_isolated"] = round(sec, 2)
                    old["spin_isolated"] = probes
                    bws = [
                        probes.get(k, 0.0)
                        for k in ("membw_pre", "membw_post")
                        if probes.get(k, 0.0) > 0.0
                    ]
                    iso_spin_max = max(probes["pre"], probes["post"])
                    in_band = not bws or min(bws) >= 15.0
                    spin_ok = quiet_spin <= 0 or iso_spin_max < 1.3 * quiet_spin
                    if in_band and spin_ok:
                        old["requote"] = "re-measured, not faster — regression is real"
                        verdict = "regression_survives"
                    else:
                        old["requote"] = (
                            "isolate bracket "
                            + ("below band" if not in_band else "spin-hot")
                            + " — kept in-run, not band-conditioned evidence"
                        )
                        verdict = "isolate_contended_kept_inrun"
                print(
                    f"# requote {name}: {old.get('sec_inrun', old['sec'])}s -> "
                    f"{sec:.2f}s isolated ({verdict}, spin {probes})",
                    file=sys.stderr,
                )

        line = json.dumps(
            {
                "scale": "100x_sf0.1",
                "build_sec": build_s,
                "isolation": "one fresh SparkSession per query",
                "quiet_spin": quiet_spin,
                "queries": results,
            }
        )
        print(line)
        if len(sys.argv) > 2:
            Path(sys.argv[2]).write_text(line + "\n")
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(shard, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
