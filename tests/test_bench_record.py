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
        lambda max_wait_s, label, membw_floor=8.0, adaptive=False: (
            gates.append(label) or {}
        ),
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


def test_measure_phase_skips_below_band_retry_without_band_evidence(
    monkeypatch,
):
    """r13 (VERDICT r12 task 1): on a day the host has never shown a
    >=15 GB/s window (start gate searched and failed), a spin-VALID but
    below-band bracket must record best_achievable_band after ONE
    attempt instead of burning the requote reserve on retries that
    cannot land in-band."""
    import time as _time

    calls = []
    monkeypatch.setitem(bench._RUN_BAND, "best_seen", 12.5)  # no >=15 seen
    _probe_seq(
        monkeypatch,
        [_p(0.78, 12.0), _p(0.80, 11.0)] * bench.PHASE_MAX_ATTEMPTS,
        [],
    )
    result, _, entry, attempts = bench._measure_phase(
        "t", lambda: calls.append(1) or len(calls),
        gate_deadline=_time.perf_counter() + 3600,
        require_band_evidence=True,
    )
    assert len(calls) == 1 and entry["attempts"] == 1
    assert entry["valid"] and not entry["in_band"]
    assert entry["band_status"] == "best_achievable_band"


def test_measure_phase_below_band_retry_with_band_evidence(monkeypatch):
    """Counterpart: when the run HAS seen a >=15 window, below-band
    brackets still retry exactly as before (VERDICT r9 task 1)."""
    import time as _time

    calls = []
    gates: list[str] = []
    monkeypatch.setitem(bench._RUN_BAND, "best_seen", 16.0)
    _probe_seq(
        monkeypatch,
        [_p(0.78, 12.0), _p(0.80, 11.0),
         _p(0.76, 17.0), _p(0.79, 16.5)],
        gates,
    )
    result, _, entry, attempts = bench._measure_phase(
        "t", lambda: calls.append(1) or len(calls),
        gate_deadline=_time.perf_counter() + 3600,
        require_band_evidence=True,
    )
    assert result == 2 and len(calls) == 2
    assert entry["band_status"] == "target"
    assert gates == ["re_t"]


def test_measure_phase_forces_revalidation_of_invalid_bracket(monkeypatch):
    """r13 (VERDICT r12 task 1): the r12 headline phase recorded a
    spin-INVALID bracket (mid-phase collapse) because only one attempt
    fit the phase budget.  With a hard_deadline (the run budget) still
    open, the phase must re-gate and re-run once more rather than
    record the collapsed attempt."""
    import time as _time

    calls = []
    gates: list[str] = []
    monkeypatch.setitem(bench._RUN_BAND, "best_seen", 12.0)
    _probe_seq(
        monkeypatch,
        [_p(0.70, 12.0), _p(1.60, 2.8),   # attempt 1: collapse mid-phase
         _p(0.76, 12.5), _p(0.78, 12.1)], # forced attempt: valid
        gates,
    )
    result, _, entry, attempts = bench._measure_phase(
        "t", lambda: calls.append(1) or len(calls),
        gate_deadline=_time.perf_counter() - 1.0,  # phase slice exhausted
        hard_deadline=_time.perf_counter() + 3600,
        require_band_evidence=True,
    )
    assert result == 2 and len(calls) == 2
    assert entry["valid"] and entry["attempts"] == 2
    assert gates == ["revalidate_t"]


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


# ---------------------------------------------------------------------------
# round 12: cross-round-median baselines + >=3-point regression verdicts
# (VERDICT r11 task 1 — t23/g07/g09 false-flagged against single-round
# all-time-low baselines; e10's regression_survives was one isolate)
# ---------------------------------------------------------------------------


def _write_round(tmp_path: Path, rnd: int, queries: dict, sf: float = 0.1):
    (tmp_path / f"BENCH_r{rnd:02d}.json").write_text(
        json.dumps({"parsed": {"sf": sf, "queries": queries}})
    )


def test_baseline_timings_median_over_window(tmp_path: Path):
    """The requote baseline is the per-query MEDIAN over the newest 5
    parseable rounds — one outlier round (t23's r10 all-time low) no
    longer sets the baseline."""
    # t23 history shaped like the real r7-r11 false-flag: low outlier
    # in the newest round, 3.7-4.6 elsewhere
    vals = {7: 4.6, 8: 3.7, 9: 4.1, 10: 2.31, 11: 3.4}
    for rnd, v in vals.items():
        _write_round(tmp_path, rnd, {"t23_quality_score": v})
    base = bench._baseline_timings(search_dir=tmp_path, sf=0.1)
    assert base["t23_quality_score"] == 3.7  # median, not the 2.31 outlier
    # a 3.4s reading would have flagged vs 2.31 (1.47x) but is within
    # threshold vs the median
    assert 3.4 <= base["t23_quality_score"] * bench.REQUOTE_RATIO


def test_baseline_timings_window_and_sf_filter(tmp_path: Path):
    """Only the newest `window` rounds count, and off-sf records are
    skipped entirely (old _prev_round_timings contract carries over)."""
    for rnd in range(1, 9):
        _write_round(tmp_path, rnd, {"q01": float(rnd)})
    # newest 5 rounds = 4..8 -> median 6.0
    assert bench._baseline_timings(search_dir=tmp_path, sf=0.1) == {"q01": 6.0}
    _write_round(tmp_path, 9, {"q01": 100.0}, sf=0.01)  # wrong sf
    assert bench._baseline_timings(search_dir=tmp_path, sf=0.1) == {"q01": 6.0}
    # unparseable newest round degrades by one, not to nothing
    (tmp_path / "BENCH_r10.json").write_text(json.dumps({"parsed": None}))
    assert bench._baseline_timings(search_dir=tmp_path, sf=0.1) == {"q01": 6.0}
    # a query present in only 2 rounds still gets a (2-point) median
    _write_round(tmp_path, 11, {"q01": 8.0, "rare": 1.0})
    _write_round(tmp_path, 12, {"q01": 8.0, "rare": 2.0})
    assert bench._baseline_timings(search_dir=tmp_path, sf=0.1)["rare"] == 1.5


def _fake_isolates(seq):
    """Yield _run_isolate results: quiet in-band brackets around the
    given seconds (spin 0.8/0.8, membw 16/16 passes every gate)."""
    it = iter(seq)

    def run(name, sf_dir, deadline):
        sec = next(it)
        if sec is None:
            return None, "timeout after 600s"
        return {
            "name": name, "sec": sec, "spin_pre": 0.8, "spin_post": 0.8,
            "membw_pre": 16.0, "membw_post": 16.0,
        }, None

    return run


def test_requote_pass_needs_three_points_for_regression(monkeypatch):
    """regression_survives is only minted from the median of >=3 clean
    isolate points; each surviving point triggers another isolate."""
    calls = []

    def run(name, sf_dir, deadline):
        calls.append(name)
        return {
            "name": name, "sec": 2.0, "spin_pre": 0.8, "spin_post": 0.8,
            "membw_pre": 16.0, "membw_post": 16.0,
        }, None

    monkeypatch.setattr(bench, "_run_isolate", run)
    timings = {"e10": 2.0}
    log = bench._requote_pass(timings, {"e10": 1.0}, "/dev/null")
    assert len(calls) == 3  # three points gathered, not one
    assert log[0]["outcome"] == "regression_survives"
    assert len(log[0]["points"]) == 3
    assert log[0]["sec_isolated_median"] == 2.0
    assert timings["e10"] == 2.0  # measured value kept


def test_requote_pass_adopt_first_short_circuits(monkeypatch):
    """A markedly faster isolate (<=0.8x in-run) adopts immediately —
    no extra points burned."""
    monkeypatch.setattr(bench, "_run_isolate", _fake_isolates([1.0]))
    timings = {"q": 2.0}
    log = bench._requote_pass(timings, {"q": 1.0}, "/dev/null")
    assert log[0]["outcome"] == "requoted"
    assert timings["q"] == 1.0
    assert len(log[0]["points"]) == 1


def test_requote_pass_median_requotes_inflated_inrun(monkeypatch):
    """Points that individually 'survive' (not 20% faster than the
    in-run number) but whose MEDIAN sits within threshold of the
    baseline prove the in-run number inflated: quote the median, no
    regression verdict."""
    # baseline 1.5, in-run 2.0 (flagged: >1.725 and +0.5); isolates
    # 1.7 each: >1.6 so not adopt-first, but 1.7 <= 1.725
    monkeypatch.setattr(bench, "_run_isolate", _fake_isolates([1.7, 1.7, 1.7]))
    timings = {"q": 2.0}
    log = bench._requote_pass(timings, {"q": 1.5}, "/dev/null")
    assert log[0]["outcome"] == "requoted"
    assert timings["q"] == 1.7
    assert log[0]["sec_isolated_median"] == 1.7


def test_requote_pass_contended_points_do_not_mint_verdicts(monkeypatch):
    """Below-band / spin-hot isolates never accumulate into a
    regression verdict — all-contended rows keep the in-run number
    with the contended outcome, mixed rows record
    insufficient_isolate_points."""

    def contended(name, sf_dir, deadline):
        return {
            "name": name, "sec": 2.0, "spin_pre": 0.8, "spin_post": 0.8,
            "membw_pre": 12.0, "membw_post": 12.0,  # below 15 GB/s band
        }, None

    monkeypatch.setattr(bench, "_run_isolate", contended)
    timings = {"q": 2.0}
    log = bench._requote_pass(timings, {"q": 1.0}, "/dev/null")
    assert log[0]["outcome"] == "isolate_contended_kept_inrun"
    assert timings["q"] == 2.0
    assert all(
        p["point_verdict"] == "isolate_contended_kept_inrun"
        for p in log[0]["points"]
    )
    # capped: a noisy row can't eat the whole reserve
    assert len(log[0]["points"]) <= bench.MAX_ISOLATES_PER_ROW


def test_requote_pass_isolate_failures_degrade_loudly(monkeypatch):
    monkeypatch.setattr(
        bench, "_run_isolate", _fake_isolates([None, None, None, None, None])
    )
    timings = {"q": 2.0}
    log = bench._requote_pass(timings, {"q": 1.0}, "/dev/null")
    assert log[0]["outcome"] == "isolate_failed"
    assert timings["q"] == 2.0
    assert len(log[0]["isolate_errors"]) == bench.MAX_ISOLATES_PER_ROW
