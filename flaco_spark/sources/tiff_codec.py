"""Pure-stdlib+numpy baseline TIFF raster codec: decode + encode.

VERDICT r11 task 7 names this lane: "TIFF raster decode (baseline
strips: uncompressed / PackBits / LZW) — the scanned-document
container; the LZW core is already in gif_codec.py and the TIFF IFD
walker is already in exif.py".  Implemented from the public TIFF 6.0
specification:

- container: II/MM byte orders, magic 42, chained IFDs (page 0
  decodes, the GIF/WebP frame-0 precedent; ``tiff_page_count`` walks
  the chain);
- baseline tags: ImageWidth/Length, BitsPerSample (1 and 8),
  Compression (1 none / 5 LZW / 32773 PackBits), Photometric
  (WhiteIsZero / BlackIsZero / RGB / Palette with ColorMap expansion),
  StripOffsets/StripByteCounts/RowsPerStrip, SamplesPerPixel,
  PlanarConfiguration (chunky; planar refuses loudly), Predictor
  (1 none / 2 horizontal differencing);
- TIFF-variant LZW (spec §13): MSB-first code packing, 9-bit initial
  width, Clear=256 / EOI=257, and the EARLY code-width change (one
  code before the table fills — the documented difference from GIF's
  LSB-first LZW, which is why gif_codec's core is not reused
  directly);
- PackBits (spec §9) runs;
- 1-bit bilevel rows bit-packed MSB-first (the scanned-document
  class), expanded to 0/255 gray;
- CCITT G3/G4 and JPEG-in-TIFF compressions refuse loudly.

Verification: encode->decode round-trips across the feature matrix
AND both-direction cross-checks against the JDK's ImageIO TIFF
plugin (Java 9+ ships one) — the same discipline as the PNG/GIF/Avro
codecs (tests/test_core_api.py).

Reference parity note: the reference engine treats media as opaque
BYTEA cells (/root/reference/src/lib.rs:202-207); this module is an
extension family beyond it, per the pipeline brief.

100 TB posture: per-row byte parsing inside Arrow-batched
``mapInPandas`` stages, O(pixels) per image, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

from flaco_spark.errors import EngineError
from flaco_spark.sources.imglimits import check_pixel_budget

_COMP_NONE = 1
_COMP_CCITT_G3 = 2
_COMP_T4 = 3
_COMP_T6 = 4
_COMP_LZW = 5
_COMP_JPEG_OLD = 6
_COMP_JPEG = 7
_COMP_DEFLATE = 8
_COMP_PACKBITS = 32773


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9)
# ---------------------------------------------------------------------------


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            if i + n + 1 > len(data):
                raise EngineError("truncated PackBits literal run")
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise EngineError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per spec
    if len(out) < expected:
        raise EngineError("PackBits strip shorter than declared")
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find a run of >= 3 identical bytes
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j + 1
            continue
        # literal run up to the next >=3 repeat (or 128 bytes)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF-variant LZW (TIFF 6.0 §13): MSB-first, early change
# ---------------------------------------------------------------------------

_CLEAR, _EOI = 256, 257


def lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    hold = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise EngineError("truncated TIFF LZW strip")
            hold = (hold << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (hold >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _EOI:
            break
        if code == _CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise EngineError("invalid first TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise EngineError("TIFF LZW code out of range")
        out += entry
        prev = entry
        # EARLY CHANGE (spec §13): the decoder widens one code before
        # its table fills (len 511/1023/2047) — verified against the
        # JDK TIFFLZWDecompressor's streams
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise EngineError("TIFF LZW strip shorter than declared")
    return bytes(out[:expected])


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    hold = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal hold, nbits
        hold = (hold << width) | code
        nbits += width
        while nbits >= 8:
            out.append((hold >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # pairs with the decoder's early change: the decoder's table
        # lags this one by one entry, so the width flips when
        # next_code overflows, not one before
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # reset before the 12-bit table fills
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(_EOI, width)
    if nbits:
        out.append((hold << (8 - nbits)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# IFD plumbing
# ---------------------------------------------------------------------------


def _read_entries(data: bytes, e: str, off: int) -> tuple[dict[int, tuple], int]:
    if off + 2 > len(data):
        raise EngineError("truncated TIFF IFD")
    (n,) = struct.unpack_from(f"{e}H", data, off)
    if off + 2 + 12 * n + 4 > len(data):
        raise EngineError("truncated TIFF IFD")
    entries: dict[int, tuple] = {}
    for i in range(n):
        tag, vtype, count = struct.unpack_from(
            f"{e}HHI", data, off + 2 + 12 * i
        )
        entries[tag] = (vtype, count, off + 2 + 12 * i + 8)
    (nxt,) = struct.unpack_from(f"{e}I", data, off + 2 + 12 * n)
    return entries, nxt


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _values(data: bytes, e: str, entry: tuple) -> list[int]:
    vtype, count, voff = entry
    size = _TYPE_SIZE.get(vtype)
    if size is None:
        raise EngineError(f"unsupported TIFF value type {vtype}")
    total = size * count
    if total > 4:
        (ptr,) = struct.unpack_from(f"{e}I", data, voff)
    else:
        ptr = voff
    if ptr + total > len(data):
        raise EngineError("TIFF value overruns file")
    fmt = {1: "B", 3: "H", 4: "I"}.get(vtype)
    if fmt is None:
        raise EngineError(f"unsupported TIFF value type {vtype} here")
    return list(struct.unpack_from(f"{e}{count}{fmt}", data, ptr))


def _scalar(data: bytes, e: str, entries, tag: int, default=None) -> int | None:
    if tag not in entries:
        return default
    return _values(data, e, entries[tag])[0]


def tiff_page_count(data: bytes) -> int:
    """Number of IFDs in the chain (multi-page scanned documents)."""
    e = _order(data)
    (_, off) = struct.unpack_from(f"{e}HI", data, 2)
    n = 0
    seen = set()
    while off and off not in seen:
        seen.add(off)
        _, off = _read_entries(data, e, off)
        n += 1
        if n > 10000:
            raise EngineError("TIFF IFD chain too long")
    return n


def _order(data: bytes) -> str:
    if len(data) < 8:
        raise EngineError("truncated TIFF header")
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise EngineError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack_from(f"{e}H", data, 2)
    if magic != 42:
        raise EngineError("not a TIFF (bad magic)")
    return e


def decode_tiff(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode page 0 to (width, height, channels, pixel bytes):
    gray -> 1 channel (WhiteIsZero inverted to standard gray),
    RGB / palette -> 3 channels."""
    e = _order(data)
    (_, ifd0) = struct.unpack_from(f"{e}HI", data, 2)
    entries, _ = _read_entries(data, e, ifd0)

    w = _scalar(data, e, entries, 256)
    h = _scalar(data, e, entries, 257)
    if not w or not h:
        raise EngineError("TIFF missing ImageWidth/ImageLength")
    check_pixel_budget(w, h, "TIFF")
    comp = _scalar(data, e, entries, 259, _COMP_NONE)
    photo = _scalar(data, e, entries, 262, 1)
    spp = _scalar(data, e, entries, 277, 1)
    planar = _scalar(data, e, entries, 284, 1)
    predictor = _scalar(data, e, entries, 317, 1)
    rows_per_strip = _scalar(data, e, entries, 278, 0xFFFFFFFF)
    bits = _values(data, e, entries[258]) if 258 in entries else [1]
    if planar != 1:
        raise EngineError("planar TIFF (PlanarConfiguration=2) not supported")
    if comp in (_COMP_CCITT_G3, _COMP_T4, _COMP_T6):
        raise EngineError("CCITT-compressed TIFF not supported")
    if comp in (_COMP_JPEG_OLD, _COMP_JPEG):
        raise EngineError("JPEG-in-TIFF not supported")
    if comp not in (_COMP_NONE, _COMP_LZW, _COMP_PACKBITS):
        raise EngineError(f"unsupported TIFF compression {comp}")
    if len(set(bits)) != 1 or bits[0] not in (1, 8):
        raise EngineError(f"unsupported TIFF BitsPerSample {bits}")
    bps = bits[0]
    if bps == 1 and (spp != 1 or photo not in (0, 1)):
        raise EngineError("1-bit TIFF must be single-sample bilevel")
    if predictor not in (1, 2):
        raise EngineError(f"unsupported TIFF predictor {predictor}")
    if predictor == 2 and bits[0] == 1:
        raise EngineError("TIFF predictor 2 on bilevel data not supported")
    if predictor == 2 and comp != _COMP_LZW:
        # the JDK reader ignores the predictor outside LZW/Deflate
        # while libtiff applies it — an ambiguous file must refuse
        # loudly, never decode two ways
        raise EngineError(
            "TIFF predictor 2 outside LZW is implementation-ambiguous"
        )
    if photo == 2 and spp < 3:
        raise EngineError("RGB TIFF with fewer than 3 samples")
    if photo == 3 and spp != 1:
        raise EngineError("palette TIFF must be single-sample")
    if photo not in (0, 1, 2, 3):
        raise EngineError(f"unsupported TIFF photometric {photo}")

    offsets = _values(data, e, entries[273]) if 273 in entries else None
    counts = _values(data, e, entries[279]) if 279 in entries else None
    if not offsets or not counts or len(offsets) != len(counts):
        raise EngineError("TIFF missing strip offsets/byte counts")

    row_bytes = (w * bps * spp + 7) // 8 if bps == 1 else w * spp
    raw = bytearray()
    rows_done = 0
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise EngineError("TIFF strip overruns file")
        nrows = min(rows_per_strip, h - rows_done)
        expected = row_bytes * nrows
        strip = data[off : off + cnt]
        if comp == _COMP_NONE:
            if len(strip) < expected:
                raise EngineError("TIFF strip shorter than declared")
            dec = strip[:expected]
        elif comp == _COMP_PACKBITS:
            dec = packbits_decode(strip, expected)
        else:
            dec = lzw_decode(strip, expected)
        raw += dec
        rows_done += nrows
    if rows_done < h:
        raise EngineError("TIFF strips cover fewer rows than ImageLength")

    if bps == 1:
        arr = np.unpackbits(
            np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, row_bytes),
            axis=1,
        )[:, :w]
        # photometric 0 = WhiteIsZero: 0 -> white(255); 1 = BlackIsZero
        if photo == 0:
            arr = 1 - arr
        return w, h, 1, (arr * 255).astype(np.uint8).tobytes()

    arr = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing (LZW-only, above)
        arr = np.cumsum(arr.astype(np.int64), axis=1).astype(np.uint8)
    if photo == 0:  # WhiteIsZero gray: invert to standard gray
        arr = 255 - arr[:, :, :1]
        return w, h, 1, arr.astype(np.uint8).tobytes()
    if photo == 1:
        if spp == 1:
            return w, h, 1, arr.tobytes()
        return w, h, 1, arr[:, :, :1].tobytes()  # gray + extra samples
    if photo == 3:
        if 320 not in entries:
            raise EngineError("palette TIFF missing ColorMap")
        cmap = _values(data, e, entries[320])
        if len(cmap) != 3 * 256 and len(cmap) != 3 * (1 << bps):
            raise EngineError("TIFF ColorMap size mismatch")
        n = len(cmap) // 3
        pal = np.array(cmap, dtype=np.uint32).reshape(3, n) >> 8  # 16->8 bit
        idx = arr[:, :, 0].astype(np.int64)
        if int(idx.max()) >= n:
            raise EngineError("TIFF palette index out of range")
        rgb = np.stack([pal[0][idx], pal[1][idx], pal[2][idx]], axis=-1)
        return w, h, 3, rgb.astype(np.uint8).tobytes()
    # photo == 2: RGB (extra samples dropped)
    return w, h, 3, arr[:, :, :3].tobytes()


def encode_tiff(
    pixels: bytes, width: int, height: int, channels: int,
    compression: str = "none", endian: str = "<",
    rows_per_strip: int | None = None, predictor: int = 1,
    bilevel: bool = False, photometric: int | None = None,
) -> bytes:
    """Baseline TIFF writer for round-trips and gate fixtures: gray
    (1 channel) or RGB (3), strip layout, none/packbits/lzw
    compression, optional horizontal-differencing predictor, optional
    1-bit bilevel packing (values >= 128 become 1)."""
    comp_id = {"none": _COMP_NONE, "packbits": _COMP_PACKBITS,
               "lzw": _COMP_LZW}.get(compression)
    if comp_id is None:
        raise EngineError(f"unsupported compression {compression!r}")
    if channels not in (1, 3):
        raise EngineError("encode_tiff supports 1 or 3 channels")
    if len(pixels) != width * height * channels:
        raise EngineError("pixel buffer size mismatch")
    if predictor not in (1, 2):
        raise EngineError(f"invalid predictor {predictor}")
    if predictor == 2 and compression != "lzw":
        raise EngineError("predictor 2 is only defined for LZW output")
    if bilevel and (channels != 1 or predictor != 1):
        raise EngineError("bilevel TIFF must be 1-channel, no predictor")
    e = endian
    if rows_per_strip is None:
        rows_per_strip = height
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if bilevel:
        bitsample = 1
        photo = 1 if photometric is None else photometric
        packed = np.packbits((arr[:, :, 0] >= 128).astype(np.uint8), axis=1)
        if photo == 0:
            packed = np.packbits(
                (arr[:, :, 0] < 128).astype(np.uint8), axis=1
            )
        rows = packed
        row_bytes = packed.shape[1]
    else:
        bitsample = 8
        photo = (1 if channels == 1 else 2) if photometric is None else photometric
        work = arr.astype(np.int16)
        if predictor == 2:
            work = np.concatenate(
                [work[:, :1, :], np.diff(work, axis=1)], axis=1
            )
        rows = (work & 0xFF).astype(np.uint8).reshape(height, width * channels)
        row_bytes = width * channels

    strips = []
    for y0 in range(0, height, rows_per_strip):
        chunk = rows[y0 : y0 + rows_per_strip].tobytes()
        if comp_id == _COMP_PACKBITS:
            chunk = packbits_encode(chunk)
        elif comp_id == _COMP_LZW:
            chunk = lzw_encode(chunk)
        strips.append(chunk)

    tags: list[tuple[int, int, int, int | list[int]]] = []
    # (tag, type, count, value-or-list); offsets patched below
    nstrips = len(strips)
    tags.append((256, 4, 1, width))
    tags.append((257, 4, 1, height))
    tags.append((258, 3, channels, [bitsample] * channels))
    tags.append((259, 3, 1, comp_id))
    tags.append((262, 3, 1, photo))
    tags.append((273, 4, nstrips, None))  # strip offsets, patched
    tags.append((277, 3, 1, channels))
    tags.append((278, 4, 1, rows_per_strip))
    tags.append((279, 4, nstrips, [len(s) for s in strips]))
    if predictor == 2:
        tags.append((317, 3, 1, predictor))
    tags.sort()

    header = (b"II" if e == "<" else b"MM") + struct.pack(f"{e}HI", 42, 8)
    n = len(tags)
    ifd_size = 2 + 12 * n + 4
    extra_base = 8 + ifd_size
    extra = bytearray()

    def value_field(vtype, count, value):
        size = _TYPE_SIZE[vtype] * count
        fmt = {3: "H", 4: "I"}[vtype]
        if size <= 4:
            vals = value if isinstance(value, list) else [value]
            raw = struct.pack(f"{e}{count}{fmt}", *vals)
            return raw.ljust(4, b"\x00")
        off = extra_base + len(extra)
        extra.extend(struct.pack(f"{e}{count}{fmt}", *value))
        return struct.pack(f"{e}I", off)

    # first pass to size the extras so strip offsets are computable
    sizes = 0
    for tag, vtype, count, value in tags:
        if _TYPE_SIZE[vtype] * count > 4:
            sizes += _TYPE_SIZE[vtype] * count
    data_base = extra_base + sizes
    offs = []
    pos = data_base
    for s in strips:
        offs.append(pos)
        pos += len(s)

    body = bytearray()
    body += struct.pack(f"{e}H", n)
    for tag, vtype, count, value in tags:
        if tag == 273:
            value = offs if nstrips > 1 else offs[0]
            if nstrips > 1:
                field = value_field(vtype, count, value)
            else:
                field = struct.pack(f"{e}I", offs[0])
        else:
            field = value_field(vtype, count, value)
        body += struct.pack(f"{e}HHI", tag, vtype, count) + field
    body += struct.pack(f"{e}I", 0)
    out = bytearray(header) + body + extra
    assert len(out) == data_base
    for s in strips:
        out += s
    return bytes(out)
