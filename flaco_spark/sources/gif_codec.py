"""Pure-stdlib animated-GIF codec (encode + decode) for the video lane.

Completes the multimodal decode-realism program (audio: real PCM since
r3; image: real PNG since r8/`png_codec.py`): GIF is the one
MULTI-FRAME container implementable from the public spec (GIF89a,
CompuServe 1990 / W3C) on the stdlib alone — real LZW with variable
code widths, clear/EOI codes and the 12-bit table reset, sub-block
framing, graphic-control extensions.  With it, frame SAMPLING (the
m02 operation) runs against genuinely decoded video-ish bytes, and
``m16_gif_frames``' oracle pins every decoded frame's pixel bytes
independently.

Scope (honest subset): global color table only, full-canvas frames
(4-pass interlace supported on decode — ImageIO writes it), no
transparency compositing (GCEs are parsed and skipped).  Local color
tables and sub-rect frames raise ``EngineError`` — a silent
mis-composite would be worse than a loud gap.  The encoder writes a
256-entry grayscale table so palette indices ARE gray values,
mirroring the PNG lane's gray8.

Cross-verified against the JVM's ImageIO GIF reader in both
directions (tests/test_core_api.py) — same honesty discipline as the
Avro and PNG codecs.

100 TB posture: called inside Arrow-batched ``mapInPandas`` with
bounded payloads per task; per-GIF work is O(pixels); parallelism is
GIFs-per-task.
"""

from __future__ import annotations

import struct

from flaco_spark.errors import EngineError
from flaco_spark.sources.imglimits import check_pixel_budget

GIF_SIG = b"GIF89a"

_MAX_WIDTH = 12  # LZW code width cap (GIF spec)


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable width, CLEAR/EOI)
# ---------------------------------------------------------------------------


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-LZW compress ``data`` (palette indices) → code-stream bytes.

    Width-bump discipline: the encoder runs one table entry AHEAD of
    the decoder (it adds entry k after emitting code k; the decoder
    adds entry k after reading code k+1), so the encoder bumps at
    next_code == (1<<width)+1 where the decoder bumps at (1<<width) —
    the classic 'early change' off-by-one, verified here against the
    ImageIO reference reader."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code == 1 << _MAX_WIDTH:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        else:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < _MAX_WIDTH:
                width += 1
        w = bytes([b])
    if w:
        emit(table[w], width)
        # The decoder still adds one entry after reading this final
        # code; the encoder adds none, so the two next_codes are EQUAL
        # here — mirror the decoder's un-offset bump rule so EOI is
        # read at the right width.
        if next_code == (1 << width) and width < _MAX_WIDTH:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`lzw_encode` (handles the KwKwK case and
    mid-stream CLEAR/table-reset)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise EngineError("GIF LZW stream ended without EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = dict(base)
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= clear:
                raise EngineError(f"invalid first LZW code {code}")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise EngineError(f"corrupt LZW code {code} (next={next_code})")
        out += entry
        if prev is not None and next_code < (1 << _MAX_WIDTH):
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < _MAX_WIDTH:
                width += 1
        prev = entry


# ---------------------------------------------------------------------------
# Container: GIF89a with a 256-entry grayscale global color table
# ---------------------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    """Split a byte stream into GIF sub-blocks (<=255 bytes each + a
    zero terminator)."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif_gray(
    frames: list[bytes], width: int, height: int, delay_cs: int = 10
) -> bytes:
    """Encode full-canvas 8-bit grayscale frames as an animated GIF89a.

    The global color table is the 256-gray identity ramp, so palette
    index == gray value — decoded index bytes compare directly against
    the source pixel bytes (the m16 oracle contract)."""
    if not frames:
        raise EngineError("encode_gif_gray needs at least one frame")
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise EngineError(f"bad GIF dimensions {width}x{height}")
    for i, f in enumerate(frames):
        if len(f) != width * height:
            raise EngineError(
                f"frame {i} is {len(f)} bytes, expected {width * height}"
            )
    out = bytearray(GIF_SIG)
    # logical screen descriptor: global table flag, 8-bit color res,
    # table size 2^(7+1)=256
    out += struct.pack("<HHBBB", width, height, 0x80 | 0x70 | 0x07, 0, 0)
    for v in range(256):  # grayscale identity ramp
        out += bytes((v, v, v))
    for f in frames:
        # graphic control extension (delay only; no transparency)
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        # image descriptor: full canvas, no local table, not interlaced
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out.append(8)  # LZW minimum code size
        out += _sub_blocks(lzw_encode(f, 8))
    out.append(0x3B)  # trailer
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise EngineError("truncated GIF sub-block stream")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        if pos + n > len(data):
            raise EngineError("truncated GIF sub-block")
        pos += n
    # unreachable


def decode_gif(data: bytes) -> tuple[int, int, list[bytes], bytes]:
    """Decode a GIF into (width, height, frames, global color table).

    Frames are palette-INDEX byte strings (row-major, full canvas).
    Honest subset: global color table required, full-canvas
    non-interlaced frames only, no local color tables (EngineError
    otherwise); GCE/comment/application extensions are parsed and
    skipped."""
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise EngineError("not a GIF (bad signature)")
    if len(data) < 13:
        raise EngineError("truncated GIF header")
    width, height, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    check_pixel_budget(width, height, "GIF")
    pos = 13
    if not packed & 0x80:
        raise EngineError("GIF without a global color table not supported")
    gct_len = 3 * (2 << (packed & 0x07))
    gct = data[pos : pos + gct_len]
    pos += gct_len
    frames: list[bytes] = []
    while True:
        if pos >= len(data):
            raise EngineError("GIF missing trailer")
        introducer = data[pos]
        pos += 1
        if introducer == 0x3B:  # trailer
            break
        if introducer == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            _, pos = _read_sub_blocks(data, pos)
            continue
        if introducer != 0x2C:
            raise EngineError(f"unexpected GIF block 0x{introducer:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if fpacked & 0x80:
            raise EngineError("GIF local color tables not supported")
        interlaced = bool(fpacked & 0x40)
        if (left, top, fw, fh) != (0, 0, width, height):
            raise EngineError(
                "sub-canvas GIF frames not supported (compositing out of scope)"
            )
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise EngineError(f"bad LZW minimum code size {min_code_size}")
        stream, pos = _read_sub_blocks(data, pos)
        idx = lzw_decode(stream, min_code_size)
        if len(idx) != fw * fh:
            raise EngineError(
                f"GIF frame decoded to {len(idx)} pixels, expected {fw * fh}"
            )
        if interlaced:
            # GIF 4-pass interlace: stored row order is 0,8,16.. then
            # 4,12.. then 2,6,10.. then 1,3,5.. — reorder to raster.
            raster = bytearray(fw * fh)
            src = 0
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                for y in range(start, fh, step):
                    raster[y * fw : (y + 1) * fw] = idx[src : src + fw]
                    src += fw
            idx = bytes(raster)
        frames.append(idx)
    if not frames:
        raise EngineError("GIF contains no image frames")
    return width, height, frames, gct
