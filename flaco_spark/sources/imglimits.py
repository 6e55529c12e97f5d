"""Shared decode pixel budget for the from-spec image codecs.

A crafted header can declare dimensions whose decode buffers dwarf
the payload (a 200-byte JPEG may claim 65535x65535 = 4.3G pixels; a
tiny PNG/WebP can claim 16k x 16k), so every decoder checks the
DECLARED pixel count against this budget BEFORE allocating — the
decompression-bomb guard class PIL ships as ``Image.MAX_IMAGE_PIXELS``
(default there: ~179M).  At 100 TB corpus scale a single hostile file
must cost a loud, catchable ``EngineError`` inside its Arrow batch,
never an executor OOM.

The budget is a module attribute so a pipeline that genuinely decodes
larger imagery can raise it deliberately:

    from flaco_spark.sources import imglimits
    imglimits.MAX_DECODE_PIXELS = 1 << 30
"""

from __future__ import annotations

from flaco_spark.errors import EngineError

MAX_DECODE_PIXELS: int = 1 << 27  # ~134M px ≈ a 11585x11585 frame


def check_pixel_budget(width: int, height: int, fmt: str) -> None:
    """Raise ``EngineError`` when a declared frame exceeds the decode
    pixel budget (checked before any pixel-sized allocation)."""
    if width * height > MAX_DECODE_PIXELS:
        raise EngineError(
            f"{fmt} frame {width}x{height} exceeds the decode pixel "
            f"budget ({MAX_DECODE_PIXELS} px) — decompression-bomb "
            "guard; raise flaco_spark.sources.imglimits."
            "MAX_DECODE_PIXELS to decode deliberately"
        )
