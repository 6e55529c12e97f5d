"""EXIF metadata extraction from the TIFF 6.0 container structure.

Training-data pipelines need image metadata WITHOUT decoding pixels —
orientation (the classic corpus gotcha: a JPEG's pixel array is
frequently rotated relative to display intent), capture time, and
camera identity drive dedup keys, quality filters, and PII scrubbing.
This module parses the EXIF payload's TIFF structure from the public
specs (TIFF 6.0 + EXIF 2.x tag registry): byte-order header (II/MM,
magic 42), chained IFDs, the EXIF sub-IFD pointer, and the standard
value types, returning a plain dict of the pipeline-relevant tags.

Carriers handled:
- JPEG: APP1 segment prefixed ``Exif\\x00\\x00`` (walked with the same
  fill-byte/lengthless-marker rules as the codec's marker walk)
- WebP: the RIFF ``EXIF`` chunk (raw TIFF, per the WebP container spec)
- raw TIFF bytes (``exif_from_tiff``)

Malformed structures raise ``EngineError`` — with one deliberate
exception: unknown tags and unknown value types are SKIPPED, because
the EXIF registry is open-ended and a pipeline must not reject a
photo over a vendor MakerNote.

100 TB posture: pure per-row byte parsing, O(segment size), no
allocation proportional to declared image dims; intended for
Arrow-batched ``mapInPandas`` metadata stages.
"""

from __future__ import annotations

import struct

from flaco_spark.errors import EngineError

# (tag id -> name) — the pipeline-relevant subset of the EXIF 2.x /
# TIFF 6.0 registries.  IFD0 tags:
_TAGS_IFD0 = {
    0x0100: "image_width",
    0x0101: "image_height",
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0131: "software",
    0x0132: "datetime",
    0x011A: "x_resolution",
    0x011B: "y_resolution",
    0x8769: "_exif_ifd",  # sub-IFD pointer
}
_TAGS_EXIF = {
    0x9003: "datetime_original",
    0x9004: "datetime_digitized",
    0xA002: "pixel_x_dimension",
    0xA003: "pixel_y_dimension",
    0x8827: "iso",
    0x829A: "exposure_time",
    0x829D: "f_number",
    0x920A: "focal_length",
}

# TIFF 6.0 value types: type id -> (struct fmt char or None, size)
_TYPE_SIZE = {
    1: 1,   # BYTE
    2: 1,   # ASCII
    3: 2,   # SHORT
    4: 4,   # LONG
    5: 8,   # RATIONAL (two LONGs)
    7: 1,   # UNDEFINED
    9: 4,   # SLONG
    10: 8,  # SRATIONAL
}


def _read_value(data: bytes, endian: str, vtype: int, count: int, voff: int):
    """One IFD entry's value; ``voff`` already resolved (inline or
    offset target).  Returns a Python scalar/str/tuple, or None for
    types outside the TIFF 6.0 set."""
    size = _TYPE_SIZE.get(vtype)
    if size is None or count == 0 or count > 1 << 20:
        return None
    end = voff + size * count
    if voff < 0 or end > len(data):
        raise EngineError("EXIF value runs past the TIFF structure")
    if vtype == 2:  # ASCII, NUL-terminated
        raw = data[voff : end]
        return raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if vtype in (1, 7):
        raw = data[voff:end]
        return raw if count > 1 else raw[0]
    fmt = {3: "H", 4: "I", 9: "i"}.get(vtype)
    if fmt:
        vals = struct.unpack_from(f"{endian}{count}{fmt}", data, voff)
        return vals if count > 1 else vals[0]
    # RATIONAL / SRATIONAL: (numerator, denominator) pairs -> float
    fmt = "I" if vtype == 5 else "i"
    out = []
    for i in range(count):
        n, d = struct.unpack_from(f"{endian}2{fmt}", data, voff + 8 * i)
        out.append(n / d if d else 0.0)
    return tuple(out) if count > 1 else out[0]


def _parse_ifd(
    data: bytes, endian: str, off: int, tags: dict[int, str],
    out: dict, depth: int,
) -> None:
    if depth > 4:
        raise EngineError("EXIF IFD chain too deep")
    if off + 2 > len(data):
        raise EngineError("truncated EXIF IFD")
    (n,) = struct.unpack_from(f"{endian}H", data, off)
    if off + 2 + 12 * n + 4 > len(data):
        raise EngineError("truncated EXIF IFD")
    for i in range(n):
        tag, vtype, count = struct.unpack_from(
            f"{endian}HHI", data, off + 2 + 12 * i
        )
        name = tags.get(tag)
        if name is None:
            continue  # open registry: unknown tags are not errors
        size = _TYPE_SIZE.get(vtype)
        if size is None:
            continue  # vendor types: skip, never reject
        value_field = off + 2 + 12 * i + 8
        if size * count <= 4:
            voff = value_field
        else:
            (voff,) = struct.unpack_from(f"{endian}I", data, value_field)
        if name == "_exif_ifd":
            (sub,) = struct.unpack_from(f"{endian}I", data, value_field)
            _parse_ifd(data, endian, sub, _TAGS_EXIF, out, depth + 1)
            continue
        val = _read_value(data, endian, vtype, count, voff)
        if val is not None:
            out[name] = val


def exif_from_tiff(data: bytes) -> dict:
    """Parse a raw TIFF/EXIF structure into a flat dict of the
    registered tags (IFD0 + the EXIF sub-IFD)."""
    if len(data) < 8:
        raise EngineError("truncated EXIF TIFF header")
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise EngineError("bad EXIF byte-order mark")
    (magic, ifd0) = struct.unpack_from(f"{endian}HI", data, 2)
    if magic != 42:
        raise EngineError("bad TIFF magic in EXIF")
    out: dict = {}
    _parse_ifd(data, endian, ifd0, _TAGS_IFD0, out, 0)
    return out


def exif_from_jpeg(data: bytes) -> dict | None:
    """EXIF dict from a JPEG's APP1 segment, or None when the stream
    carries no EXIF.  Walks markers with the codec's fill-byte and
    lengthless-marker rules; stops at SOS (EXIF precedes image data)."""
    from flaco_spark.sources.jpeg_codec import (
        _ZERO_PAYLOAD,
        _parse_marker,
        JPEG_SIG,
    )

    if data[:2] != JPEG_SIG:
        raise EngineError("not a JPEG (bad SOI)")
    pos = 2
    while pos < len(data):
        marker, pos = _parse_marker(data, pos)
        if marker in _ZERO_PAYLOAD:
            continue
        if marker in (0xDA, 0xD9):  # SOS / EOI: no EXIF past here
            return None
        if pos + 2 > len(data):
            raise EngineError("truncated JPEG segment")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2 or pos + seglen > len(data):
            raise EngineError("truncated JPEG segment")
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            return exif_from_tiff(seg[6:])
        pos += seglen
    return None


def exif_from_webp(data: bytes) -> dict | None:
    """EXIF dict from a WebP's RIFF ``EXIF`` chunk, or None."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise EngineError("not a WebP (bad RIFF/WEBP header)")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise EngineError("truncated WebP chunk")
        if tag == b"EXIF":
            # some writers keep the JPEG-style "Exif\0\0" prefix
            tiff = body[6:] if body[:6] == b"Exif\x00\x00" else body
            return exif_from_tiff(tiff)
        pos += 8 + size + (size & 1)
    return None


def apply_orientation(
    pixels: bytes, width: int, height: int, channels: int, orientation: int
) -> tuple[bytes, int, int]:
    """Transform decoded pixels to display orientation per EXIF tag
    274 (the PIL ``ImageOps.exif_transpose`` table): returns
    (pixels, width, height) — dims swap for the rotated cases 5-8.
    Orientation 0 is tolerated as 1 (absent-tag convention); values
    outside 0..8 raise ``EngineError``."""
    import numpy as np

    if not 0 <= orientation <= 8:
        raise EngineError(f"invalid EXIF orientation {orientation}")
    if len(pixels) != width * height * channels:
        raise EngineError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * channels}"
        )
    if orientation in (0, 1):
        return pixels, width, height
    a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if orientation == 2:
        out = a[:, ::-1]
    elif orientation == 3:
        out = a[::-1, ::-1]
    elif orientation == 4:
        out = a[::-1, :]
    elif orientation == 5:
        out = a.transpose(1, 0, 2)
    elif orientation == 6:
        out = a.transpose(1, 0, 2)[:, ::-1]
    elif orientation == 7:
        out = a.transpose(1, 0, 2)[::-1, ::-1]
    else:  # 8
        out = a.transpose(1, 0, 2)[::-1, :]
    h2, w2 = out.shape[:2]
    return np.ascontiguousarray(out).tobytes(), w2, h2


def build_exif_tiff(
    tags: dict[str, object], endian: str = "<"
) -> bytes:
    """Build a minimal TIFF/EXIF structure carrying the given tags —
    the test/fixture writer proving the parser against independently
    assembled structures (both byte orders).  Supported value shapes:
    int (SHORT/LONG), str (ASCII), float or (num, den) (RATIONAL)."""
    name_to_tag = {v: k for k, v in _TAGS_IFD0.items() if not v.startswith("_")}
    exif_name_to_tag = {v: k for k, v in _TAGS_EXIF.items()}
    ifd0 = {k: v for k, v in tags.items() if k in name_to_tag}
    sub = {k: v for k, v in tags.items() if k in exif_name_to_tag}
    unknown = set(tags) - set(ifd0) - set(sub)
    if unknown:
        raise EngineError(f"unregistered EXIF tags: {sorted(unknown)}")

    e = endian
    extra = bytearray()  # out-of-line values, appended after the IFDs

    def entry(tag_id: int, value, base: int) -> bytes:
        if isinstance(value, str):
            raw = value.encode("ascii") + b"\x00"
            if len(raw) <= 4:
                return struct.pack(f"{e}HHI", tag_id, 2, len(raw)) + raw.ljust(4, b"\x00")
            off = base + len(extra)
            extra.extend(raw)
            if len(raw) & 1:
                extra.append(0)
            return struct.pack(f"{e}HHII", tag_id, 2, len(raw), off)
        if isinstance(value, tuple) or isinstance(value, float):
            n, d = value if isinstance(value, tuple) else (
                int(round(value * 1000)), 1000
            )
            off = base + len(extra)
            extra.extend(struct.pack(f"{e}II", n, d))
            return struct.pack(f"{e}HHII", tag_id, 5, 1, off)
        v = int(value)
        if v < 1 << 16:
            return struct.pack(f"{e}HHIHH", tag_id, 3, 1, v, 0)
        return struct.pack(f"{e}HHII", tag_id, 4, 1, v)

    # layout: header(8) IFD0 [exif sub-IFD] extras
    n0 = len(ifd0) + (1 if sub else 0)
    ifd0_size = 2 + 12 * n0 + 4
    sub_off = 8 + ifd0_size
    sub_size = (2 + 12 * len(sub) + 4) if sub else 0
    extras_base = sub_off + sub_size

    body = bytearray()
    body += struct.pack(f"{e}H", n0)
    entries = []
    for name in sorted(ifd0, key=lambda n: name_to_tag[n]):
        entries.append((name_to_tag[name], ifd0[name]))
    for tag_id, value in sorted(entries):
        body += entry(tag_id, value, extras_base)
    if sub:
        body += struct.pack(f"{e}HHII", 0x8769, 4, 1, sub_off)
    body += struct.pack(f"{e}I", 0)  # next-IFD pointer
    if sub:
        body += struct.pack(f"{e}H", len(sub))
        for name in sorted(sub, key=lambda n: exif_name_to_tag[n]):
            body += entry(exif_name_to_tag[name], sub[name], extras_base)
        body += struct.pack(f"{e}I", 0)
    header = (b"II" if e == "<" else b"MM") + struct.pack(f"{e}HI", 42, 8)
    return header + bytes(body) + bytes(extra)
