#!/usr/bin/env python
"""100× growth-curve probe for the SLOW TAIL of the 10× probe.

The 10× probe (scripts/scale_probe.py) is the per-round regression
check; this one answers the round-4 verdict's task 6 question — does
the slow tail stay (sub-)linear from 10× to 100×?  It materializes a
key-shifted 100-copy union of sf0.1 (60M lineitem rows, 5M document
rows / 500k distinct texts ×100 copies, 2M vectors) and times ONLY
the families the 10× probe ranked slowest: the iterative graph ops
(g01/g02/g03/g05/g07 — now on the bucketed ordered fold), the
inverted-index dedups (d08/d09), the PQ pair (e11/e15), the XML
round-trip (q112 — exempt from the linearity bar: text-format I/O is
linear-but-heavy by nature), and the two wordcount-shaped text passes
(t18/t19).

One timed run per query, no warm-up pass: at this scale the
data-dependent term dominates and a warm-up would double a
multi-minute run for a few hundred ms of codegen.  Curvature is
reported as sec_per_10x = sec / the SCALE_PROBE_r04 10× second —
≤ ~10 means linear-or-better in the 10×→100× decade.

Usage:
    python scripts/scale_probe100.py [base_sf_dir] [out_json]
"""

from __future__ import annotations

import json
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
    "q112_xml_roundtrip",
    "g07_hits",
]


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="scale_probe_100x")
    registry = load_inventory()
    ref10 = {}
    r4 = Path(__file__).resolve().parents[1] / "SCALE_PROBE_r04.json"
    if r4.is_file():
        ref10 = json.loads(r4.read_text()).get("queries", {})
    out = tempfile.mkdtemp(prefix="flaco_scale100_")
    try:
        t0 = time.perf_counter()
        materialize(spark, base, out, copies=100, n_files=32)
        build_s = round(time.perf_counter() - t0, 1)
        print(f"# materialized 100x tables in {build_s}s -> {out}", file=sys.stderr)

        results: dict[str, dict] = {}
        for name in PROBE_100X:
            spec = registry[name]
            t0 = time.perf_counter()
            rows = spec.builder(spark, out).count()
            sec = round(time.perf_counter() - t0, 2)
            row: dict = {"sec": sec, "rows": rows}
            base10 = (ref10.get(name) or {}).get("sec")
            if base10:
                row["sec_10x_r04"] = base10
                row["growth_vs_10x"] = round(sec / base10, 2)
            results[name] = row
            print(f"# {name}: {sec:.2f}s ({rows} rows, x{row.get('growth_vs_10x', '?')})", file=sys.stderr)
        line = json.dumps(
            {"scale": "100x_sf0.1", "build_sec": build_s, "queries": results}
        )
        print(line)
        if len(sys.argv) > 2:
            Path(sys.argv[2]).write_text(line + "\n")
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
