"""The bench record contract (VERDICT r8 tasks 1/2/4 + ADVICE).

BENCH_r08.json was lost because bench.py's single output JSON line
outgrew the driver's ~2 KB stdout-tail window — these tests pin the
r9 split: a length-bounded machine line (per-query numbers only) and
a BENCH_META artifact for diagnostics, plus the previous-round lookup
that must SKIP unparseable rounds so the 1.15x requote net stays
engaged after a lost record.
"""

from __future__ import annotations

import json
from pathlib import Path

import bench


def _full_size_record() -> dict:
    """A worst-realistic-case record: every headline/extended/extract
    row at a 3-digit-seconds value (wider than any real number we have
    recorded), full memory block, every band label, meta filename."""
    queries = {name: 103.1234 for name in bench.HEADLINE}
    extended = {name: 103.1234 for name in bench.EXTENDED}
    extract = {"x01_extract_parquet": 103.1234, "x02_extract_feather": 103.1234}
    memory = {
        "driver_python_peak_rss_mib": 12345.6,
        "jvm_peak_rss_mib": 123456.7,
        "process_tree_peak_rss_sum_mib": 1234567.8,
    }
    noise = {
        ph: {"membw_min_gbps": 12.3, "spin_ratio": 1.01, "quiet": False, "valid": True}
        for ph in ("extract", "headline", "extended")
    }
    return bench._compact_record(
        queries, extract, extended, memory, noise, 0.1, "BENCH_META_r99.json"
    )


def test_compact_line_fits_driver_tail_window():
    """The machine line must stay under COMPACT_LINE_MAX (< the
    driver's ~2 KB tail) even at full inventory width — the r8 failure
    mode, structurally pinned."""
    line = bench._compact_line(_full_size_record())
    assert len(line) < bench.COMPACT_LINE_MAX
    parsed = json.loads(line)  # single parseable JSON object
    assert parsed["metric"] == "headline_query_suite_total"
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert set(parsed["extended"]) == set(bench.EXTENDED)
    assert parsed["membw_band"] == {
        "extract": "10-15", "headline": "10-15", "extended": "10-15"
    }


def test_compact_line_never_carries_diagnostics():
    """Requotes / gate records / probes / notes are what sank r8 —
    they must never ride the machine line again."""
    rec = _full_size_record()
    for key in ("requotes", "quiet_gates", "host_probes", "host_probe",
                "phase_noise", "notes"):
        assert key not in rec


def test_compact_line_sheds_optional_fields_when_oversized():
    """Safety valve: a record that somehow outgrows the bound sheds
    diagnostics (meta → membw_band → memory), never query numbers."""
    rec = _full_size_record()
    rec["memory"]["pad"] = "x" * 2000
    line = bench._compact_line(rec)
    parsed = json.loads(line)
    assert "memory" not in parsed  # shed (after meta/membw_band)
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert len(line) < bench.COMPACT_LINE_MAX


def test_prev_round_timings_skips_unparseable_rounds(tmp_path: Path):
    """r8's record is parsed:null; the lookup must fall through to the
    newest round with a real per-query dict (r7) instead of returning
    {} and silently disengaging the requote net."""
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"n": 8, "rc": 0, "parsed": None, "tail": "…truncated…"})
    )
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"n": 7, "parsed": {
            "queries": {"q01_pricing_summary": 0.52},
            "extended": {"d16_decontamination": 0.546},
        }})
    )
    (tmp_path / "BENCH_r06.json").write_text(
        json.dumps({"n": 6, "parsed": {
            "queries": {"q01_pricing_summary": 0.99},
        }})
    )
    prev = bench._prev_round_timings(search_dir=tmp_path)
    assert prev == {"q01_pricing_summary": 0.52, "d16_decontamination": 0.546}


def test_prev_round_timings_filters_on_scale_factor(tmp_path: Path):
    """A baseline recorded at a different sf is no baseline: a local
    sf0.01 run must not requote against the driver's sf0.1 numbers."""
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"parsed": {"sf": 0.1,
                               "queries": {"q01_pricing_summary": 0.52}}})
    )
    assert bench._prev_round_timings(search_dir=tmp_path, sf=0.01) == {}
    assert bench._prev_round_timings(search_dir=tmp_path, sf=0.1) == {
        "q01_pricing_summary": 0.52
    }
    # sf unknown on either side -> no filter (old-record compatibility)
    assert bench._prev_round_timings(search_dir=tmp_path, sf=None) != {}


def test_prev_round_timings_empty_when_nothing_parseable(tmp_path: Path):
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({"parsed": None}))
    (tmp_path / "BENCH_r02.json").write_text("{not json")
    assert bench._prev_round_timings(search_dir=tmp_path) == {}
    assert bench._prev_round_timings(search_dir=tmp_path / "empty") == {}


def test_prev_round_timings_live_repo_sees_r07():
    """On the actual repo state (r8 unparseable), the requote baseline
    must be r7's — the exact scenario the verdict flagged as silently
    disengaging round 9's net."""
    prev = bench._prev_round_timings()
    assert prev, "requote baseline is empty — the net is disengaged"
    # r7 carried these rows; any later parseable round will too.
    assert "q01_pricing_summary" in prev
    assert "d16_decontamination" in prev


def test_next_round_from_repo_and_tmp(tmp_path: Path):
    assert bench._next_round(search_dir=tmp_path) == 1
    (tmp_path / "BENCH_r04.json").write_text("{}")
    assert bench._next_round(search_dir=tmp_path) == 5
    assert bench._next_round() >= 9  # live repo has r01..r08


def test_bw_band_labels():
    assert bench._bw_band(0.0) == "n/a"
    assert bench._bw_band(7.9) == "<10"
    assert bench._bw_band(12.7) == "10-15"
    assert bench._bw_band(15.0) == ">=15"
    assert bench._bw_band(22.3) == ">=15"


def test_adjudicate_isolate_adopt_first_and_band_floor():
    """r9 review: (a) a markedly faster isolate is adopted even when
    its bracket reads contended — contention only slows the isolate,
    so adoption is conservative-correct; (b) 'regression_survives'
    demands a bracket at the 15 GB/s measurement floor — a 12 GB/s
    window (passes the old 8 GB/s check) keeps the in-run number
    instead of minting a below-band regression verdict."""
    adj = bench._adjudicate_isolate
    # faster isolate adopted regardless of bracket state
    assert adj(2.0, 1.5, 3.0, 2.0, 4.0, 4.0) == "requoted"
    # quiet in-band bracket, not faster -> regression is real
    assert adj(2.0, 1.9, 1.0, 0.75, 16.0, 17.0) == "regression_survives"
    # 12 GB/s bracket: below the measurement band -> kept, not survived
    assert adj(2.0, 1.9, 1.0, 0.75, 12.0, 16.0) == "isolate_contended_kept_inrun"
    # spin-contended brackets -> kept
    assert adj(2.0, 1.9, 1.5, 0.8, 16.0, 16.0) == "isolate_contended_kept_inrun"
    assert adj(2.0, 1.9, 1.0, 1.5, 16.0, 16.0) == "isolate_contended_kept_inrun"
    # probe-n/a bandwidth (0.0) does not count as contended
    assert adj(2.0, 1.9, 1.0, 0.75, 0.0, 0.0) == "regression_survives"


def test_adjudicate_isolate_spin_floor_term():
    """VERDICT r9 task 3: 'regression_survives' must also pass the
    scale_probe100 suspect rule — a bracket ≥1.3x the run's quietest
    spin is contended even when it sits under the absolute 1.25x
    QUIET_SPIN_S ceiling and the band holds.  Pinned with g01's exact
    r9 numbers: spin_pre 0.939, in-band 17.3/16.4, run floor ~0.72 —
    the bracket that passed on band alone and minted the round's one
    surviving regression verdict."""
    adj = bench._adjudicate_isolate
    # g01's r9 isolate: within-band, under the absolute ceiling, but
    # 0.939 >= 1.3 * 0.72 -> contended under the unified rule
    assert adj(5.63, 6.63, 1.25, 0.939, 17.3, 16.4) == "regression_survives"
    assert (
        adj(5.63, 6.63, 1.25, 0.939, 17.3, 16.4, spin_quietest=0.72)
        == "isolate_contended_kept_inrun"
    )
    # a bracket at the run floor still survives
    assert (
        adj(2.0, 1.9, 1.0, 0.75, 16.0, 17.0, spin_quietest=0.72)
        == "regression_survives"
    )
    # floor unknown (0.0) -> term inert, absolute checks still apply
    assert adj(2.0, 1.9, 1.0, 0.75, 16.0, 17.0, spin_quietest=0.0) == "regression_survives"
    # adopt-first still outranks the floor term
    assert adj(2.0, 1.5, 1.0, 2.0, 16.0, 16.0, spin_quietest=0.5) == "requoted"


def _probe_seq(monkeypatch, probes: list[dict], gates: list):
    """Feed _measure_phase a scripted sequence of host probes and
    record quiet-gate calls."""
    it = iter(probes)
    monkeypatch.setattr(bench, "_host_probe", lambda: next(it))
    monkeypatch.setattr(
        bench,
        "_wait_for_quiet",
        lambda max_wait_s, label, membw_floor=8.0: gates.append(label) or {},
    )


def _p(spin: float, bw: float) -> dict:
    return {"spin_sec": spin, "steal_jiffies": 0.0, "membw_gbps": bw}


def test_measure_phase_retries_out_of_band_then_lands(monkeypatch):
    """VERDICT r9 task 1: a phase whose bracket lands below the
    ≥15 GB/s band re-gates and re-runs; the recorded result is the
    in-band attempt, stamped attempts=2 / band_status=target."""
    import time as _time

    calls = []
    gates: list[str] = []
    _probe_seq(
        monkeypatch,
        [_p(0.78, 12.0), _p(0.80, 11.0),   # attempt 1: out of band
         _p(0.76, 17.0), _p(0.79, 16.5)],  # attempt 2: in band
        gates,
    )
    result, probes, entry, attempts = bench._measure_phase(
        "t", lambda: calls.append(1) or len(calls),
        gate_deadline=_time.perf_counter() + 3600,
    )
    assert result == 2 and len(calls) == 2
    assert entry["attempts"] == 2 and entry["band_status"] == "target"
    assert entry["valid"] and entry["in_band"]
    assert entry["membw_min_gbps"] == 16.5
    assert gates == ["re_t"]
    assert [a["ok"] for a in attempts] == [False, True]


def test_measure_phase_stamps_best_achievable_band(monkeypatch):
    """If the host never offers a ≥15 window within the attempt
    bound, the record carries the explicit best_achievable_band stamp
    and keeps the WIDEST-bandwidth attempt's numbers."""
    import time as _time

    calls = []
    # attempt 2 is the widest-band bracket; every later attempt (up to
    # PHASE_MAX_ATTEMPTS — the probe list scales with the constant)
    # stays narrower, so the recorded result must stay attempt 2's.
    probes = [_p(0.78, 9.0), _p(0.80, 8.5),     # attempt 1
              _p(0.76, 13.0), _p(0.79, 12.0)]   # attempt 2 (best)
    for i in range(bench.PHASE_MAX_ATTEMPTS - 2):
        probes += [_p(0.77, 7.0 - i), _p(0.78, 6.6 - i)]
    _probe_seq(monkeypatch, probes, [])
    result, probes, entry, attempts = bench._measure_phase(
        "t", lambda: calls.append(1) or len(calls),
        gate_deadline=_time.perf_counter() + 3600,
    )
    assert len(calls) == bench.PHASE_MAX_ATTEMPTS
    assert entry["band_status"] == "best_achievable_band"
    assert entry["attempts"] == bench.PHASE_MAX_ATTEMPTS
    assert result == 2 and entry["membw_min_gbps"] == 12.0  # widest attempt
    assert not entry["in_band"] and entry["valid"]


def test_measure_phase_budgets_the_regate_wait(monkeypatch):
    """r10 ADVICE: the affordability check must count the up-to-300 s
    re-gate that PRECEDES a retry, not just the attempt runtime — a
    remaining budget under gate+attempt used to admit a retry that
    overran gate_deadline into the requote reserve.  With 100 s left
    (< the 300 s gate cap) and an out-of-band bracket, the phase must
    stop at one attempt even though the attempt itself is instant."""
    import time as _time

    calls = []
    _probe_seq(
        monkeypatch,
        [_p(0.78, 9.0), _p(0.80, 8.5), _p(0.78, 9.0), _p(0.80, 8.5)],
        [],
    )
    result, _, entry, attempts = bench._measure_phase(
        "t", lambda: calls.append(1) or len(calls),
        gate_deadline=_time.perf_counter() + 100.0,
    )
    assert len(calls) == 1 and entry["attempts"] == 1
    assert entry["band_status"] == "best_achievable_band"


def test_measure_phase_respects_gate_deadline(monkeypatch):
    """Past the gate deadline the phase keeps its (documented) noisy
    bracket instead of spending budget it does not have."""
    import time as _time

    calls = []
    _probe_seq(monkeypatch, [_p(0.78, 9.0), _p(0.80, 8.5)], [])
    result, _, entry, attempts = bench._measure_phase(
        "t", lambda: calls.append(1) or len(calls),
        gate_deadline=_time.perf_counter() - 1.0,
    )
    assert len(calls) == 1 and entry["attempts"] == 1
    assert entry["band_status"] == "best_achievable_band"


def test_phase_bracket_verdicts():
    b = bench._phase_bracket(_p(0.78, 17.0), _p(0.80, 16.0))
    assert b["valid"] and b["in_band"] and b["quiet"]
    b = bench._phase_bracket(_p(0.78, 12.0), _p(0.80, 16.0))
    assert b["valid"] and not b["in_band"]  # 12 < measurement floor
    b = bench._phase_bracket(_p(0.70, 17.0), _p(1.10, 16.0))
    assert not b["valid"]  # mid-phase spin shift
    b = bench._phase_bracket(_p(0.78, 0.0), _p(0.80, 0.0))
    assert b["in_band"]  # probe n/a is not evidence of contention


def test_child_budgets_never_kill_a_gating_child():
    """r8 ADVICE: timeout must exceed the child's gate budget + 240s
    measure headroom for every remaining-budget value."""
    for remaining in (0.0, 30.0, 100.0, 200.0, 500.0, 1500.0, None):
        gate, timeout = bench._child_budgets(180.0, remaining)
        assert timeout >= gate + 240.0
        assert gate >= 20.0
    # far from the deadline: full gate, full timeout
    gate, timeout = bench._child_budgets(180.0, 10_000.0)
    assert (gate, timeout) == (180.0, 600.0)
    # near the deadline: the GATE shrinks, not the headroom
    gate, timeout = bench._child_budgets(180.0, 80.0)
    assert gate == 20.0 and timeout == gate + 240.0
