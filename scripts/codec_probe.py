#!/usr/bin/env python
"""Codec-lane 10x probe (the M2021_PROBE shape, r12: + m22/m23).

Materializes the 10x key-shifted union of sf0.1 (scale_probe.py's
builder) and times the multimodal codec rows — the per-round codec
cost record VERDICT r11's "watch m21's cost" item reads.

Usage: python scripts/codec_probe.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from flaco_spark.inventory import load_inventory  # noqa: E402
from flaco_spark.session import get_session  # noqa: E402
from scripts.scale_probe import _spin, materialize  # noqa: E402

ROWS = [
    "m15_png_decode",
    "m18_jpeg_decode",
    "m19_jpeg_progressive_decode",
    "m20_jpeg_cmyk_decode",
    "m21_webp_lossless_decode",
    "m22_webp_lossy_decode",
    "m23_exif_metadata",
]


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (
        Path(sys.argv[2]) if len(sys.argv) > 2
        else REPO / "M_CODEC_PROBE_r12_10x.json"
    )
    spark = get_session(app_name="codec_probe")
    registry = load_inventory()
    out = tempfile.mkdtemp(prefix="flaco_codec10_")
    t0 = time.perf_counter()
    materialize(spark, base, out)
    build_s = round(time.perf_counter() - t0, 1)
    results = {}
    probes = {"start": _spin()}
    for name in ROWS:
        spec = registry[name]
        spec.builder(spark, out).count()  # warm
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = spec.builder(spark, out).count()
            best = min(best, time.perf_counter() - t0)
        results[name] = {"sec": round(best, 2), "rows": rows}
        print(f"# {name}: {best:.2f}s ({rows} rows)", file=sys.stderr)
    probes["end"] = _spin()
    payload = {
        "scale": "10x_sf0.1",
        "build_sec": build_s,
        "host_probes": probes,
        "queries": results,
    }
    out_path.write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps(payload))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
