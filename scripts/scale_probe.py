#!/usr/bin/env python
"""10× scale probe: materialize a key-shifted 10-copy union of sf0.1
(≈ sf1: 6M lineitem rows, 50k docs — every document text appearing 10
times, the mass-duplication regime real corpora have) and time a
representative query slice against it.

Usage:
    python scripts/scale_probe.py [base_sf_dir] [out_json]

Writes the scaled tables to a temp dir, runs each query once warm
(best-of-2), prints one JSON line.  The 10 text copies per doc make
this a REAL dedup stress: d01 collapses them, d08's representative
collapse is what keeps its df-capped index from pruning everything
(10 copies put every shingle's df at the cap), d09's components pull
each 10-copy family into one cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from flaco_spark.inventory import load_inventory
from flaco_spark.session import get_session

COPIES = 10
# (table, key columns to shift, shift step)
SHIFTS = {
    "lineitem": (("l_orderkey",), 100_000_000),
    "orders": (("o_orderkey",), 100_000_000),
    "documents": (("doc_id",), 10_000_000),
    "embeddings": (("vec_id",), 10_000_000),
    "events": (("event_id",), 100_000_000),
}
VERBATIM = ("region", "nation", "customer", "supplier", "part")

PROBE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q07_nation_trade",
    "q18_large_volume_customers",
    "d01_dedup_exact",
    "d04_minhash_lsh_pairs",
    "d07_dedup_canonical",
    "d08_ngram_jaccard_pairs",
    "d09_dedup_components",
    "d10_simhash_near_dup",
    "t07_top_terms_tfidf",
    "m03_audio_energy_windows",
    "e01_knn_bruteforce",
    "e03_ann_sign_lsh",
    "t10_chunking",
    "t11_sequence_packing",
    "d11_dataset_split",
    "m04_phash_near_dup",
    "t08_edit_distance_pairs",
    "ts09_value_range_join",
    "q70_stats_moments",
    "q73_running_distinct",
    "q74_data_quality_audit",
    "q76_incremental_agg",
    "q77_event_transitions",
    "q78_percentile_cont_dist",
    "q79_scd2_intervals",
    "d12_class_rebalance",
    "u07_cogrouped_pandas",
    "d13_normalized_dedup",
    "t12_text_normalize",
    "ts10_gap_detection",
    "ts11_interval_range_frame",
    "q82_recursive_bfs",
    "q84_map_functions",
    "q85_schema_evolution_union",
    "e08_scalar_quantization",
    # round-3 additions: dedup/containment share d08's index; d16's
    # bench side grows with the corpus here (worst case — in prod the
    # eval set is fixed); e10 iterates 3 broadcast rounds.
    "t14_repetition_ratio",
    "d15_stratified_sample",
    "d16_decontamination",
    "d17_containment_pairs",
    "e10_kmeans_unrolled",
    "q90_pivot_revenue",
    "st01_stream_windowed_counts",
    "d18_canonical_by_quality",
    "e11_pq_encode",
    "e12_pq_adc_search",
    "m07_phash_search",
    "t17_vocab_growth",
    # round-4 additions: d22's within-cell pairing meets the 10-copy
    # regime (each copy family lands in one cell); t21's chunk spread
    # sees every chunk at df=10; d23's blocklist grows 10×; st04
    # replays 10× the per-user event history through explicit state;
    # e15 composes the IVF prune with ADC scoring at 20k vectors.
    "d22_semantic_dedup",
    "d23_blocklist_filter",
    "t18_char_bigram_lm",
    "t19_novelty_curve",
    "t21_paragraph_dedup",
    "ts21_mad_anomalies",
    "ts22_cross_correlation",
    "q98_cumulative_unique_users",
    "e15_ivfpq_search",
    "st04_stateful_sessionization",
    # round-4 second wave: q21's per-order distinct aggregate meets 10x
    # orders; d19's blocks grow with |parts| (verbatim here, so this
    # pins the fixed-block cost); g01 iterates over a 10x edge list;
    # g02's sampled wedge-close sees the densified co-occurrence graph;
    # t22's posting aggregate spans the 10x corpus.
    "q12_shipmode_priority",
    "q21_suppliers_kept_waiting",
    "d19_record_linkage",
    "t22_bm25_search",
    "g01_pagerank",
    "g02_triangle_count",
    "e13_pq_recall",
    # round-4 third wave: d24's postings explode = 10x corpus token
    # count with every window at df=10 (the mass-duplication worst
    # case for its dup-hash join); q101 pays the bucketed write's
    # one-time shuffle on 6M lineitem rows; q102 writes/prunes 30 day
    # partitions of 1M events; st05 re-broadcasts the dim per batch.
    "d24_exact_substring_dedup",
    "q101_bucketed_join",
    "q102_partition_pruned_agg",
    "st05_stream_static_enrichment",
    "p01_corpus_pipeline",
    # round-4 fifth wave
    "d25_incremental_dedup",
    "d26_dataset_fingerprint",
    "g03_label_propagation",
    "t23_rake_keywords",
    "st06_stream_parquet_sink",
    "m09_header_decode",
    "e16_rrf_fusion",
    "ts23_lttb_downsample",
    "e17_mrl_prefilter",
    "q103_target_encoding",
    "u11_arrow_udtf",
    "q104_sql_pipe_syntax",
    "q105_parameterized_sql",
    "ts24_distribution_drift",
    # round-4 sixth wave
    "st07_transform_with_state",
    "ts27_resample_interpolate",
    "g04_link_prediction",
    "q108_group_by_all",
    "m10_patch_grid",
    "p02_index_build_pipeline",
    "st08_python_stream_source",
    "e19_filtered_ann",
    "q109_session_variables",
    "ts28_business_days",
    "u13_table_arg_udtf",
    "t25_sentence_stats",
    "st09_foreachbatch_upsert",
    "q110_identifier_clause",
    "q111_sql_scripting",
    "q112_xml_roundtrip",
    "m11_binaryfile_ingest",
    "g05_personalized_pagerank",
    "ts29_ma_crossover",
    "q113_rowvalue_in",
    "t26_charclass_mix",
    "e20_incremental_index",
    "t27_rocchio_prf",
    "q114_sql_functions",
    "d28_mixture_interleave",
    "q115_collations",
    "e22_mmr_rerank",
    "q116_sql_pivot_clause",
    "ts30_state_durations",
    "t28_text_augmentation",
    "d29_dedup_ladder",
    "g06_kcore_peel",
    "u14_struct_pandas_udf",
    "e23_cluster_balanced_sample",
    "g07_hits",
    "ts31_cusum_changepoint",
    "d30_bloom_decontamination",
    "t29_readability",
    "e24_random_projection",
    "s03_hot_cold_split_join",
    "p03_shard_export_pipeline",
    "g08_clustering_coefficient",
    "q117_interval_arithmetic",
    "m12_stereo_downmix",
    "st10_chained_stream_aggs",
    "ts32_theil_sen_trend",
    "q118_lateral_column_alias",
    "t30_tokenizer_fertility",
    "g09_degree_assortativity",
    "q119_text_roundtrip",
    "e25_centroid_outliers",
    "ts33_burstiness",
    "st11_session_window_agg",
    "st12_sliding_window_counts",
    "e26_ranking_metrics",
    "ts34_autocorrelation",
    "q120_url_functions",
    "t31_langid_confusion",
    "ts35_ohlc_resample",
    "q121_mergeschema_read",
    "q122_observe_metrics",
    "q123_hll_sketch",
    "q124_xpath_functions",
    "q125_crypto_functions",
    "q126_market_basket",
    "q127_file_metadata",
    "p04_stream_ingest_pipeline",
    "d31_effective_corpus_size",
    "q128_analyze_statistics",
    "q129_checkpoint_lineage",
    "q130_join_hints",
    "m13_fft_dominant_freq",
    "t32_utf8_validation",
    "ts36_max_drawdown",
    "g11_harmonic_centrality",
    "ts37_seasonality_strength",
    "q131_range_partitioned_sort",
    "ts38_kendall_tau",
    "e27_hard_negative_mining",
    "d32_soft_dedup_weights",
    "t33_length_gini",
    "q132_inline_generator",
    "e28_embedding_outlier_screen",
    "st13_outer_stream_join",
    "ts39_interval_coverage",
    "t34_code_detection",
    "u15_array_return_pandas_udf",
    "q133_listagg",
    "st14_stream_union",
    "q134_exists_projection",
    "q135_having_subquery",
    # round-7 addition: the Avro round-trip's pure-Python codec is the
    # one format leg whose per-row cost lives in Python (mapInArrow
    # write + DataSource read) — probe it so codec-cost regressions
    # surface the same way q112's XML text costs do.
    "q140_avro_roundtrip",
    # round-8 additions: the PNG and GIF round-trips are the other two
    # pure-Python codec lanes (encode + full decode per document inside
    # mapInPandas) — probe them like q140 so codec-cost regressions
    # surface; both are map-side only, so growth should track document
    # count ~linearly.
    "m15_png_decode",
    "m16_gif_frames",
    # m17 joins from the run after SCALE_PROBE_r08_10x (added while
    # that run was in flight): decode + exact-integer 2x2 box
    # downscale — strictly the m15 cost class plus a numpy reduce, so
    # its first probe row is bounded by m15's until recorded.
    "m17_image_resize",
    # r10: the baseline + progressive JPEG codec lanes join the PNG/GIF
    # rows above for the same reason (pure-Python per-document cost).
    "m18_jpeg_decode",
    "m19_jpeg_progressive_decode",
    # r11: the CMYK/YCCK and lossless-WebP lanes (this round's codec
    # additions; their first full-probe rows land in r12 — the r11
    # record carries a PROBE_QUERIES subset run instead, added while
    # the r11 main probe was in flight, the m17 precedent).
    "m20_jpeg_cmyk_decode",
    "m21_webp_lossless_decode",
]

# r10 (VERDICT r9 task 4): PROBE_QUERIES=<comma list> restricts a run
# to named rows — the targeted within-band re-measure lane (t22's 10×
# flag) without paying the full ~190-row probe.
_subset = os.environ.get("PROBE_QUERIES")
if _subset:
    PROBE = [s.strip() for s in _subset.split(",") if s.strip()]
    # Validate BEFORE the quiet gate + 10x materialization (r10
    # review: a typo died minutes in with a bare KeyError).
    _known = load_inventory()
    _bad = [n for n in PROBE if n not in _known]
    if _bad:
        raise SystemExit(f"PROBE_QUERIES names not in the registry: {_bad}")

# r8: the probes reuse bench.py's quiet-gate (spin + steal + DRAM
# bandwidth) before measuring — the bandwidth domain reads spin-quiet
# but slows Spark stages 15-30% (SCALING.md round-8), and a probe run
# that starts inside such a window wastes its whole wall-clock.
PROBE_QUIET_WAIT_S = float(os.environ.get("PROBE_QUIET_WAIT_S", "300"))


def materialize(spark, base: str, out: str, copies: int = COPIES, n_files: int = 8) -> None:
    for name in VERBATIM:
        shutil.copy(f"{base}/{name}.parquet", f"{out}/{name}.parquet")
    for name, (keys, step) in SHIFTS.items():
        df = spark.read.parquet(f"{base}/{name}.parquet")
        parts = []
        for i in range(copies):
            d = df
            for k in keys:
                d = d.withColumn(k, F.col(k) + F.lit(i * step))
            parts.append(d)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionAll(p)
        union.coalesce(n_files).write.mode("overwrite").parquet(f"{out}/{name}.parquet")


def _spin() -> float:
    """Single-thread host-noise probe (bench.py's discipline): ~0.8 s
    quiet on this host, 1.6-2.2 s contended.  Recorded every 25
    queries so a contention window mid-run is attributable instead of
    reading as a per-query regression (the r6 first run recorded g08
    at 15.2 s vs 4.7 s isolated-quiet for exactly this reason)."""
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        x = 0
        for i in range(20_000_000):
            x += i
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _prev_round_baseline(out_path: str | None, window: int = 5) -> dict:
    """Per-query CROSS-ROUND MEDIAN of `sec` over the newest `window`
    previous SCALE_PROBE_r*_10x.json files (numeric round sort,
    excluding the file this run will write) — the reference for the
    auto-requote pass.

    r12 (VERDICT r11 task 1): comparing against only the single
    previous round minted three false "regression is real" verdicts
    in r11 (t23/g07/g09) because each baseline was that row's
    ALL-TIME LOW; the cross-round median is robust to one outlier
    round.  Returns {name: {"sec": median}} (the shape the flagging
    code reads)."""
    import re
    import statistics

    root = Path(__file__).resolve().parents[1]
    skip = Path(out_path).name if out_path else None
    rounds: list[tuple[int, Path]] = []
    for p in root.glob("SCALE_PROBE_r*_10x.json"):
        if p.name == skip:
            continue
        m = re.search(r"SCALE_PROBE_r(\d+)_10x", p.name)
        if m:
            rounds.append((int(m.group(1)), p))
    vals: dict[str, list[float]] = {}
    for _rnd, p in sorted(rounds, reverse=True)[:window]:
        try:
            rows = json.loads(p.read_text())["queries"]
        except (OSError, json.JSONDecodeError, KeyError):
            continue
        for n, row in rows.items():
            sec = row.get("sec") if isinstance(row, dict) else None
            if isinstance(sec, (int, float)):
                vals.setdefault(n, []).append(float(sec))
    return {
        n: {"sec": round(statistics.median(v), 3)} for n, v in vals.items()
    }


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from bench import _wait_for_quiet  # repo root is on sys.path

    _wait_for_quiet(PROBE_QUIET_WAIT_S, "probe10_start")
    spark = get_session(app_name="scale_probe")
    registry = load_inventory()
    out = tempfile.mkdtemp(prefix="flaco_scale10_")
    try:
        t0 = time.perf_counter()
        materialize(spark, base, out)
        build_s = round(time.perf_counter() - t0, 1)
        print(f"# materialized 10x tables in {build_s}s -> {out}", file=sys.stderr)

        probes: dict[str, float] = {"start": _spin()}
        results: dict[str, dict] = {}
        for i, name in enumerate(PROBE):
            spec = registry[name]
            spec.builder(spark, out).count()  # warm
            best, rows = float("inf"), 0
            for _ in range(2):
                t0 = time.perf_counter()
                rows = spec.builder(spark, out).count()
                best = min(best, time.perf_counter() - t0)
            results[name] = {"sec": round(best, 2), "rows": rows}
            print(f"# {name}: {best:.2f}s ({rows} rows)", file=sys.stderr)
            if (i + 1) % 25 == 0:
                probes[f"after_{i + 1}"] = _spin()
        probes["end"] = _spin()
        print(f"# host_probes: {probes}", file=sys.stderr)

        # AUTO-REQUOTE (r7; threshold tightened r8 per VERDICT r7 task
        # 7): the 25-query spin brackets MISS sub-window contention
        # bursts — r7's first run recorded d07 at 7.44 s vs 1.29 s
        # isolated with every bracket quiet, and the 1.3x threshold
        # then let st07/p02 phantoms slip (SCALING.md round-8).  Any
        # row >1.15x AND >+0.3 s over the newest previous round's probe
        # re-measures in a FRESH session on a spin-bracketed quiet
        # host; the isolated number replaces `sec` (in-run value kept
        # as sec_inrun) only when it confirms the slowdown was
        # environmental (>=20% faster).  A row that stays slow in
        # isolation is a REAL regression and keeps its measured value.
        prev = _prev_round_baseline(sys.argv[2] if len(sys.argv) > 2 else None)
        flagged = [
            n
            for n, row in results.items()
            if n in prev
            and row["sec"] > max(prev[n]["sec"] * 1.15, prev[n]["sec"] + 0.3)
        ]
        requoted = []
        if flagged:
            if len(flagged) > 12:
                print(
                    f"# requote: {len(flagged)} rows flagged (>12): host too "
                    "noisy for a trustworthy run — re-run the probe instead",
                    file=sys.stderr,
                )
            else:
                spark.stop()
                from bench import _wait_for_quiet as _gate

                from bench import _membw_gbps as _bw

                for n in flagged:
                    # r12 (VERDICT r11 task 1): a "regression is real"
                    # verdict needs the MEDIAN of >=3 in-band isolate
                    # points — one isolate is not evidence (the d04/e10
                    # precedent).  Adopt-first still short-circuits: a
                    # markedly faster point proves the in-run number
                    # inflated on its own.
                    inrun = results[n]["sec"]
                    spec = registry[n]
                    points = []  # (sec, bracket, in_band)
                    adopted = None
                    for _pt in range(4):
                        if len([p for p in points if p[2]]) >= 3:
                            break
                        _gate(PROBE_QUIET_WAIT_S, f"requote_{n}_{_pt}")
                        spark = get_session(
                            app_name=f"scale_probe_requote_{n}_{_pt}"
                        )
                        pre, bw_pre = _spin(), _bw()
                        spec.builder(spark, out).count()  # warm
                        best, rows = float("inf"), 0
                        for _ in range(2):
                            t0 = time.perf_counter()
                            rows = spec.builder(spark, out).count()
                            best = min(best, time.perf_counter() - t0)
                        post, bw_post = _spin(), _bw()
                        spark.stop()
                        bracket = {"pre": pre, "post": post,
                                   "membw_pre": bw_pre, "membw_post": bw_post}
                        bws = [v for v in (bw_pre, bw_post) if v > 0.0]
                        in_band = not bws or min(bws) >= 15.0
                        points.append((round(best, 2), bracket, in_band))
                        print(
                            f"# requote {n} point {_pt}: {best:.2f}s "
                            f"(membw {bw_pre}/{bw_post}, "
                            f"{'in' if in_band else 'below'}-band)",
                            file=sys.stderr,
                        )
                        if best < inrun * 0.8:
                            adopted = (round(best, 2), rows, bracket)
                            break
                    if adopted is not None:
                        results[n] = {
                            "sec": adopted[0],
                            "rows": adopted[1],
                            "sec_inrun": inrun,
                            "requote": "isolated quiet re-measure; in-run "
                            "window contended (sub-bracket burst)",
                            "spin": adopted[2],
                            "points": [p[0] for p in points],
                        }
                        requoted.append(n)
                        print(
                            f"# requote {n}: {inrun:.2f}s in-run -> "
                            f"{adopted[0]:.2f}s isolated",
                            file=sys.stderr,
                        )
                    else:
                        clean = sorted(p[0] for p in points if p[2])
                        results[n]["isolate_points"] = [p[0] for p in points]
                        results[n]["spin_isolated"] = points[-1][1]
                        if len(clean) >= 3:
                            med = clean[len(clean) // 2]
                            results[n]["sec_isolated"] = med
                            confirmed = med > max(
                                prev[n]["sec"] * 1.15, prev[n]["sec"] + 0.3
                            )
                            results[n]["requote"] = (
                                f"median of {len(clean)} in-band isolates "
                                + ("confirms regression"
                                   if confirmed else
                                   "within threshold — in-run number was "
                                   "inflated, quoting the median")
                            )
                            if not confirmed:
                                results[n]["sec_inrun"] = inrun
                                results[n]["sec"] = med
                                requoted.append(n)
                        else:
                            results[n]["requote"] = (
                                f"only {len(clean)} in-band isolate points "
                                "(<3) — kept in-run, no regression verdict "
                                "minted (r12 protocol)"
                            )
                        print(
                            f"# requote {n}: points "
                            f"{[p[0] for p in points]} -> "
                            f"{results[n]['requote']}",
                            file=sys.stderr,
                        )
                spark = get_session(app_name="scale_probe")

        payload = {
            "scale": "10x_sf0.1",
            "build_sec": build_s,
            "host_probes": probes,
            "queries": results,
        }
        if requoted:
            payload["requoted"] = sorted(requoted)
        line = json.dumps(payload)
        print(line)
        if len(sys.argv) > 2:
            Path(sys.argv[2]).write_text(line + "\n")
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
