"""Pure-stdlib+numpy WebP lossless (VP8L) codec: decode + encode.

Why this exists: r8-r10 made PNG, GIF, and JPEG (baseline +
progressive + CMYK) decode REAL from their public specs; the r10
verdict's "What's missing" #2 names WebP as "the next most common
scraped-image format [with] no codec lane and no loud-refusal row"
and task 8 asks for "WebP (VP8L) decode ... lossless VP8L first — it
is self-contained like PNG".  This module implements the public WebP
Lossless Bitstream Specification (and RFC 9649 §3, the container):

- decode: the full VP8L feature set — LSB-first bit stream, canonical
  prefix codes (simple 1/2-symbol and code-length-coded forms, with
  the 16/17/18 RLE symbols and the max_symbol short form), color
  cache, LZ77 backward references (both the 120-entry 2D
  neighborhood map and scan-line distances), meta prefix-code groups
  (entropy image), and all four transforms inverted in reverse
  order: PREDICTOR (all 14 modes, spec edge rules), COLOR_TRANSFORM
  (signed 3.5 fixed-point deltas), SUBTRACT_GREEN, COLOR_INDEXING
  (delta-coded palette, including the 1/2/4-bit packed-pixel widths).
  Lossy WebP ("VP8 " chunk) and animation raise ``EngineError`` — a
  silent wrong decode would be worse than a loud gap.
- encode: a real VP8L encoder used for round-trip verification and
  gate fixtures: per-channel canonical prefix codes (simple or
  code-length-coded, emitted through the code-length code), optional
  greedy LZ77 (neighborhood map used when a distance maps), optional
  color cache, optional SUBTRACT_GREEN, and forced-mode PREDICTOR /
  COLOR_TRANSFORM paths so every inverse-transform branch of the
  decoder is exercised by an encoder that computed the forward
  transform independently.

No external WebP implementation exists in this container (ImageIO
has no WebP plugin, PIL is absent), so verification is: (a)
encode->decode round-trips across the feature matrix, (b) hand-built
bit-exact spec vectors for the container and header, (c) the same
fuzz/error-surface discipline as the JPEG codec.  The bitstream
layout follows the spec document only.

100 TB posture: same as the PNG/JPEG codecs — called inside
Arrow-batched ``mapInPandas`` stages with bounded payloads per task;
per-image work is O(pixels); parallelism comes from images-per-task.

Reference parity note: the reference engine treats media as opaque
BYTEA cells (/root/reference/src/lib.rs:202-207); this module is an
extension family beyond it, per the pipeline brief.
"""

from __future__ import annotations

import struct

import numpy as np

from flaco_spark.errors import EngineError
from flaco_spark.sources.imglimits import check_pixel_budget

RIFF_SIG = b"RIFF"
WEBP_SIG = b"WEBP"
VP8L_MAGIC = 0x2F

# Code-length-code symbol order (spec §5.2.2).
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 120-entry close-neighborhood distance map (spec §4.2.2): distance
# codes 1..120 address (dx, dy) offsets in the rows at or above the
# current pixel; larger codes are scan-line distances offset by 120.
# HARDCODED VERBATIM from the spec document's table (RFC 9649 §4.2.2
# "Distance Mapping") — r11 generated this table from a nearest-first
# sort rule, which reproduces the spec's quoted prefix but diverges in
# the tail (the spec's own ordering is not monotone in Euclidean
# distance past code ~92, and the domain is dy in [0,7], dx in [-7,8],
# NOT a symmetric 16x16 grid).  A generated table silently decodes
# distance codes ~97..120 of real libwebp streams to wrong offsets;
# round-trips can't catch it because the encoder shares the table.
# Structural invariants asserted below; the full 120-entry literal is
# additionally pinned bit-exact in tests (test_webp_dist_map_spec).
_DIST_MAP: list[tuple[int, int]] = [
    (0, 1),  (1, 0),  (1, 1),  (-1, 1), (0, 2),  (2, 0),  (1, 2),  (-1, 2),
    (2, 1),  (-2, 1), (2, 2),  (-2, 2), (0, 3),  (3, 0),  (1, 3),  (-1, 3),
    (3, 1),  (-3, 1), (2, 3),  (-2, 3), (3, 2),  (-3, 2), (0, 4),  (4, 0),
    (1, 4),  (-1, 4), (4, 1),  (-4, 1), (3, 3),  (-3, 3), (2, 4),  (-2, 4),
    (4, 2),  (-4, 2), (0, 5),  (3, 4),  (-3, 4), (4, 3),  (-4, 3), (5, 0),
    (1, 5),  (-1, 5), (5, 1),  (-5, 1), (2, 5),  (-2, 5), (5, 2),  (-5, 2),
    (4, 4),  (-4, 4), (3, 5),  (-3, 5), (5, 3),  (-5, 3), (0, 6),  (6, 0),
    (1, 6),  (-1, 6), (6, 1),  (-6, 1), (2, 6),  (-2, 6), (6, 2),  (-6, 2),
    (4, 5),  (-4, 5), (5, 4),  (-5, 4), (3, 6),  (-3, 6), (6, 3),  (-6, 3),
    (0, 7),  (7, 0),  (1, 7),  (-1, 7), (5, 5),  (-5, 5), (7, 1),  (-7, 1),
    (4, 6),  (-4, 6), (6, 4),  (-6, 4), (2, 7),  (-2, 7), (7, 2),  (-7, 2),
    (3, 7),  (-3, 7), (7, 3),  (-7, 3), (6, 5),  (-6, 5), (5, 6),  (-5, 6),
    (8, 0),  (4, 7),  (-4, 7), (7, 4),  (-7, 4), (8, 1),  (8, 2),  (6, 6),
    (-6, 6), (8, 3),  (5, 7),  (-5, 7), (7, 5),  (-7, 5), (8, 4),  (6, 7),
    (-6, 7), (8, 5),  (7, 6),  (-7, 6), (8, 6),  (7, 7),  (-7, 7), (8, 7),
]
# Structural invariants: exactly the 120 backward offsets of the
# 8-row x [-7,8] neighborhood, no duplicates, spec-quoted prefix.
assert len(_DIST_MAP) == 120 and len(set(_DIST_MAP)) == 120
assert set(_DIST_MAP) == {
    (dx, dy)
    for dy in range(8)
    for dx in range(-7, 9)
    if dy > 0 or dx > 0
}
assert _DIST_MAP[:12] == [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2),
]

_GREEN_BASE = 256 + 24  # literals + LZ77 length prefix codes
_HASH_MUL = 0x1E35A7BD  # color-cache hash multiplier (spec §4.2.3)


# ---------------------------------------------------------------------------
# LSB-first bit I/O
# ---------------------------------------------------------------------------


class _LsbReader:
    """LSB-first bit reader (spec §2) over an int hold buffer.

    ``peek`` may run past the data end (zero-padded) so LUT decode can
    window ahead; ``read``/``skip`` raise on actually CONSUMING bits
    that were never in the stream, keeping truncation loud."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.hold = 0
        self.nbits = 0
        self.padded = 0  # zero bits appended past EOF (peek only)

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            take = self.data[self.pos : self.pos + 4]
            if take:
                self.hold |= int.from_bytes(take, "little") << self.nbits
                self.pos += len(take)
                self.nbits += 8 * len(take)
            else:
                self.padded += 8
                self.nbits += 8

    def read(self, n: int) -> int:
        if self.nbits < n:
            self._fill(n)
        if self.padded and self.nbits - self.padded < n:
            raise EngineError("truncated VP8L bit stream")
        v = self.hold & ((1 << n) - 1)
        self.hold >>= n
        self.nbits -= n
        return v

    def read_bit(self) -> int:
        return self.read(1)

    def peek(self, n: int) -> int:
        if self.nbits < n:
            self._fill(n)
        return self.hold & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        if self.padded and self.nbits - self.padded < n:
            raise EngineError("truncated VP8L bit stream")
        self.hold >>= n
        self.nbits -= n


class _LsbWriter:
    def __init__(self) -> None:
        self.hold = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, value: int, n: int) -> None:
        self.hold |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.hold & 0xFF)
            self.hold >>= 8
            self.nbits -= 8

    @property
    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.nbits:
            out += bytes([self.hold & 0xFF])
        return out


# byte-reversal table for _bit_reverse (r12 opt: the per-bit loop ran
# once per canonical code symbol — a 16-bit reverse is two table
# lookups; identical values by construction)
_REV8 = tuple(
    sum(((i >> b) & 1) << (7 - b) for b in range(8)) for i in range(256)
)


def _bit_reverse(code: int, length: int) -> int:
    # reverse 16 bits via the byte table, then drop the low zeros the
    # full-width reversal leaves for codes shorter than 16 bits
    r = (_REV8[code & 0xFF] << 8) | _REV8[(code >> 8) & 0xFF]
    return r >> (16 - length)


# ---------------------------------------------------------------------------
# Canonical prefix codes
# ---------------------------------------------------------------------------


_LUT_BITS = 10  # single-level decode window; longer codes walk bits


class _PrefixCode:
    """Canonical prefix code from a code-length array (DEFLATE-style
    assignment, spec §5.2).  Decode peeks a reversed-bit window into a
    one-level LUT (codes longer than the window fall back to a
    bit-walk); a single-symbol code is degenerate and consumes 0 bits.

    r13: the LUT holds packed ints ``(symbol << 4) | length`` (VP8L
    code lengths are <= 15) with 0 as the not-in-LUT sentinel — the
    per-entry tuple allocations were ~12% of decode at the lane's tiny
    image sizes, and int unpacking is cheaper per symbol too.  The
    Kraft check is exact integer arithmetic instead of float pow."""

    def __init__(self, lengths: list[int]) -> None:
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise EngineError("empty VP8L prefix code")
        if len(nz) == 1:
            self.single: int | None = nz[0][1]
            self.table: dict[tuple[int, int], int] = {}
            self.max_len = 0
            self.lut_bits = 0
            self.lut_mask = 0
            self.lut: list = []
            return
        self.single = None
        # exact Kraft equality: lengths are <= 15 by spec, so the sum
        # of 2**(15-l) must be exactly 2**15 for a complete code
        kraft = 0
        for l, _ in nz:
            if l > 15:
                raise EngineError("invalid VP8L prefix code (Kraft violation)")
            kraft += 1 << (15 - l)
        if kraft != 1 << 15:
            raise EngineError("invalid VP8L prefix code (Kraft violation)")
        self.table = {}
        code = 0
        prev_len = 0
        for l, s in sorted(nz):
            code <<= l - prev_len
            prev_len = l
            self.table[(l, code)] = s
            code += 1
        self.max_len = prev_len
        self.lut_bits = min(self.max_len, _LUT_BITS)
        self.lut_mask = (1 << self.lut_bits) - 1
        lut = [0] * (1 << self.lut_bits)
        for (l, c), s in self.table.items():
            if l <= self.lut_bits:
                rev = _bit_reverse(c, l)
                # all aliases of this codeword sit at stride 2**l from
                # rev; a stride-slice fill is the same assignment as the
                # per-alias loop, done at C speed
                n_alias = 1 << (self.lut_bits - l)
                lut[rev :: 1 << l] = [(s << 4) | l] * n_alias
        self.lut = lut

    def decode(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        # inlined peek+skip: this is the per-symbol hot path
        if br.nbits < self.lut_bits:
            br._fill(self.lut_bits)
        entry = self.lut[br.hold & self.lut_mask]
        if entry:
            n = entry & 15
            if br.padded and br.nbits - br.padded < n:
                raise EngineError("truncated VP8L bit stream")
            br.hold >>= n
            br.nbits -= n
            return entry >> 4
        # long code (> lut_bits): bit-walk the canonical table
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((l, code))
            if sym is not None:
                return sym
        raise EngineError("invalid VP8L prefix code word")


_PFX_CACHE: dict[bytes, _PrefixCode] = {}
_PFX_CACHE_MAX = 4096  # bounded: executors are long-lived processes


def _prefix_code(lengths: list[int]) -> _PrefixCode:
    """Memoized `_PrefixCode` construction.  Instances are immutable
    after __init__ (decode only reads), so sharing one per distinct
    length vector is safe; code-length codes in particular repeat
    heavily across images.  The key is ``bytes`` (lengths are <= 15),
    built in one C loop instead of a 256-296-element tuple per call."""
    key = bytes(lengths)
    code = _PFX_CACHE.get(key)
    if code is None:
        code = _PrefixCode(lengths)
        if len(_PFX_CACHE) >= _PFX_CACHE_MAX:
            _PFX_CACHE.clear()
        _PFX_CACHE[key] = code
    return code


def _read_prefix_code(br: _LsbReader, alphabet_size: int) -> _PrefixCode:
    """One prefix code: simple (1-2 symbols) or code-length-coded
    (spec §5.2.1-5.2.2)."""
    if br.read_bit():  # simple
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise EngineError("VP8L simple code symbol out of range")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise EngineError("VP8L simple code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        code = _PrefixCode.__new__(_PrefixCode)
        code.table = {}
        code.max_len = 0
        code.lut_bits = 0
        code.lut_mask = 0
        code.lut = []
        if num_symbols == 1:
            code.single = sym0
        else:
            # spec: the two symbols take codes 0 and 1 IN READ ORDER
            code.single = None
            code.table = {(1, 0): sym0, (1, 1): sym1}
            code.max_len = 1
            code.lut_bits = 1
            code.lut_mask = 1
            code.lut = [(sym0 << 4) | 1, (sym1 << 4) | 1]
        return code
    # code-length-coded
    num_codes = br.read(4) + 4
    if num_codes > len(_CL_ORDER):
        raise EngineError("invalid VP8L code-length code count")
    cl_lengths = [0] * len(_CL_ORDER)
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _prefix_code(cl_lengths)
    # optional cap on the number of coded symbols
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_nz = 8
    i = 0
    # the per-symbol loop below is the decoder's hot path (one CL
    # symbol per alphabet entry); CL code lengths are 3-bit values, so
    # max_len <= 7 <= the LUT window and EVERY codeword is
    # LUT-resident — decode inline with bound locals instead of a
    # method call per symbol (same reads, same errors)
    cl_single = cl_code.single
    cl_lut = cl_code.lut
    cl_lut_mask = cl_code.lut_mask
    cl_lut_bits = cl_code.lut_bits
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        if cl_single is not None:
            sym = cl_single
        else:
            if br.nbits < cl_lut_bits:
                br._fill(cl_lut_bits)
            entry = cl_lut[br.hold & cl_lut_mask]
            n = entry & 15
            if br.padded and br.nbits - br.padded < n:
                raise EngineError("truncated VP8L bit stream")
            br.hold >>= n
            br.nbits -= n
            sym = entry >> 4
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_nz = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            if i + rep > alphabet_size:
                raise EngineError("VP8L code-length repeat overrun")
            for _ in range(rep):
                lengths[i] = prev_nz
                i += 1
        elif sym == 17:
            rep = 3 + br.read(3)
            i += rep
        else:  # 18
            rep = 11 + br.read(7)
            i += rep
        if i > alphabet_size:
            raise EngineError("VP8L code-length repeat overrun")
    return _prefix_code(lengths)


_LEN_CACHE: dict[tuple, dict[int, int]] = {}
_LEN_CACHE_MAX = 4096


def _build_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Huffman code lengths from frequencies, depth-limited to
    ``max_len`` with a Kraft repair pass.  Memoized on the frequency
    vector (pure function; callers treat the result as read-only)."""
    import heapq
    import itertools

    items = sorted(freqs.items())
    key = (max_len, tuple(items))
    cached = _LEN_CACHE.get(key)
    if cached is not None:
        return cached

    # iterate in sorted-symbol order so tie-breaking (heap order, the
    # Kraft repair's min) is canonical in the frequency VECTOR, never
    # in the dict's insertion history — required for the memo to be
    # sound and makes the emitted stream doc-order-independent
    syms = [s for s, f in items if f > 0]
    if not syms:
        return {}
    if len(syms) == 1:
        return {syms[0]: 1}
    # r13: parent-pointer Huffman.  The old loop merged symbol TUPLES
    # and incremented every member's depth per merge — O(n^2) on wide
    # literal alphabets (the encoder's measured hotspot at the m21
    # lane's image sizes).  Heap keys are the same (freq, tie) pairs
    # in the same creation order, so the merge order — and therefore
    # every depth — is IDENTICAL; depths are recovered from the merge
    # tree afterwards in O(n).
    tie = itertools.count()
    n_leaves = len(syms)
    parent = [0] * (2 * n_leaves - 1)  # node id -> parent id
    heap = [(freqs[s], next(tie), i) for i, s in enumerate(syms)]
    heapq.heapify(heap)
    next_id = n_leaves
    while len(heap) > 1:
        fa, _, a = heapq.heappop(heap)
        fb, _, b = heapq.heappop(heap)
        parent[a] = next_id
        parent[b] = next_id
        heapq.heappush(heap, (fa + fb, next(tie), next_id))
        next_id += 1
    # depth of each node = depth of its parent + 1, computable in one
    # reverse pass because parents always have HIGHER ids than children
    node_depth = [0] * (next_id)
    for nid in range(next_id - 2, -1, -1):
        node_depth[nid] = node_depth[parent[nid]] + 1
    depth = {s: node_depth[i] for i, s in enumerate(syms)}
    lengths = {s: min(d, max_len) for s, d in depth.items()}
    # repair Kraft over-subscription from the clamp, tracked
    # incrementally (a recomputed sum per step was the encoder's
    # profile hotspot)
    k = sum(2 ** -l for l in lengths.values())
    while k > 1.0 + 1e-12:
        # lengthening the shallowest over-long candidate frees mass
        s = min((s for s in lengths if lengths[s] < max_len),
                key=lambda s: lengths[s])
        k -= 2 ** -lengths[s] - 2 ** -(lengths[s] + 1)
        lengths[s] += 1
    # tighten: shorten deepest codes while the code stays complete
    changed = True
    while changed:
        changed = False
        for s in sorted(lengths, key=lambda s: -lengths[s]):
            if lengths[s] > 1 and k + 2 ** -lengths[s] <= 1.0 + 1e-12:
                k += 2 ** -lengths[s]
                lengths[s] -= 1
                changed = True
    if abs(k - 1.0) > 1e-9:
        raise EngineError("internal: VP8L encoder built an invalid code")
    if len(_LEN_CACHE) >= _LEN_CACHE_MAX:
        _LEN_CACHE.clear()
    _LEN_CACHE[key] = lengths
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (BIT-REVERSED canonical code, length): reversed so the
    LSB-first writer emits the code MSB-first with one write() call."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in sorted((l, s) for s, l in lengths.items()):
        code <<= l - prev_len
        prev_len = l
        out[s] = (_bit_reverse(code, l), l)
        code += 1
    return out


def _write_prefix_code(
    bw: _LsbWriter, lengths: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Emit one prefix code (simple form for <=2 symbols, else through
    the code-length code with spec RLE symbols 16/17/18) and return
    symbol -> (code, len)."""
    syms = sorted(lengths)
    if len(syms) == 1 and syms[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if syms[0] > 1:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        return {syms[0]: (0, 0)}
    if len(syms) == 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        if syms[0] > 1:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        bw.write(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    bw.write(0, 1)  # code-length-coded
    # Tokenize the per-entry length sequence with the spec's RLE
    # symbols (§5.2.2): 17/18 for zero runs (3-10 / 11-137), 16 for
    # repeats of the previous nonzero length (3-6).  Sparse alphabets
    # (256-280 entries, a few dozen used) collapse from one CL symbol
    # per entry to a few dozen tokens — the dominant cost of both
    # writing AND reading a prefix code at small image sizes.  The
    # stream stays spec-conformant (decoder + libwebp cross-checks);
    # only its bytes change, never the decoded pixels.
    # r13: walk the SORTED NONZERO entries and derive zero runs from
    # the symbol gaps — the old full-alphabet scan touched every one
    # of the 256-296 entries per call and was the encoder's largest
    # single tottime.  Token stream identical by construction: a gap
    # between consecutive nonzero symbols IS the zero run the scan
    # found, and an equal-length run in the scan is exactly a run of
    # CONSECUTIVE symbols sharing one length.
    tokens: list[tuple[int, int, int]] = []  # (cl_sym, extra, extra_bits)

    def _zero_run(run: int) -> None:
        while run >= 11:
            rep = min(run, 137)
            tokens.append((18, rep - 11, 7))
            run -= rep
        if run >= 3:
            tokens.append((17, run - 3, 3))
            run = 0
        while run:
            tokens.append((0, 0, 0))
            run -= 1

    # (symbol, length) with length > 0 — a zero-valued entry in the
    # dict means "unused", exactly like an absent one in the old
    # full-alphabet array
    entries = sorted((s, l) for s, l in lengths.items() if l > 0)
    pos = 0
    k = 0
    n_entries = len(entries)
    while k < n_entries:
        s, l = entries[k]
        if s > pos:
            _zero_run(s - pos)
        # maximal run of consecutive symbols with this same length
        j = k + 1
        while (
            j < n_entries
            and entries[j][0] == entries[j - 1][0] + 1
            and entries[j][1] == l
        ):
            j += 1
        run = j - k - 1  # repeats AFTER the first occurrence
        tokens.append((l, 0, 0))
        while run >= 3:
            rep = min(run, 6)
            tokens.append((16, rep - 3, 2))
            run -= rep
        while run:
            tokens.append((l, 0, 0))
            run -= 1
        pos = entries[j - 1][0] + 1
        k = j
    if pos < alphabet_size:
        _zero_run(alphabet_size - pos)
    cl_freqs: dict[int, int] = {}
    for sym, _, _ in tokens:
        cl_freqs[sym] = cl_freqs.get(sym, 0) + 1
    cl_lengths = _build_lengths(cl_freqs, max_len=7)
    if len(cl_lengths) == 1:
        # a 1-length CL code decodes 0 bits per symbol; give it a
        # companion so the CL code is a real (complete) prefix code
        only = next(iter(cl_lengths))
        other = 0 if only != 0 else 1
        cl_lengths = {only: 1, other: 1}
    cl_codes = _canonical_codes(cl_lengths)
    # num_code_lengths must cover every used CL symbol in _CL_ORDER
    used = set(cl_lengths)
    num_codes = max(
        i + 1 for i, s in enumerate(_CL_ORDER) if s in used
    )
    num_codes = max(num_codes, 4)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths.get(_CL_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max_symbol cap
    # hot path: emit the token stream with the writer's state bound to
    # locals (same bytes as per-token write() calls)
    hold = bw.hold
    nb = bw.nbits
    append = bw.out.append
    for sym, extra, ebits in tokens:
        c, n = cl_codes[sym]
        hold |= c << nb
        nb += n
        if ebits:
            hold |= extra << nb
            nb += ebits
        while nb >= 8:
            append(hold & 0xFF)
            hold >>= 8
            nb -= 8
    bw.hold = hold
    bw.nbits = nb
    if len(syms) == 1:
        # symbol >= 256 can't use the simple form; the decoder builds
        # a DEGENERATE 0-bit code from a single nonzero length, so the
        # writer must likewise emit nothing per occurrence
        return {syms[0]: (0, 0)}
    return _canonical_codes(lengths)


# ---------------------------------------------------------------------------
# Static-profile codes (r13, guide §1.2/§4.2)
# ---------------------------------------------------------------------------
# The m21 lane's images are 16x(1-9) px: per-document adaptive Huffman
# tables cost far more to BUILD, EMIT and PARSE than they save in
# stream bits (measured: ~60% of the lane's codec time is the
# per-code machinery, and the per-document frequency vectors are
# content-unique, so none of it memoizes).  A static-profile code is
# the classic encoder speed/size trade (DEFLATE's fixed-Huffman
# blocks; libwebp's low-effort modes): canonical code lengths derived
# once from a UNIFORM symbol profile — corpus-independent by
# construction — so every document shares ONE table per alphabet size.
# The emission (CL-code header + RLE tokens) is then a pure function
# of the alphabet size and is precomputed into a single big-int
# write() per prefix code; the decoder's `_prefix_code` memo hits on
# every document.  The stream stays fully spec-conformant and LARGER
# than the adaptive one (uniform lengths carry no entropy model) —
# decoded pixels are what the lane checks, and they are unchanged.
# NOTE: this is NOT the rejected r12 emission-plan cache (#8): that
# cached per-document-unique adaptive plans at a 21% hit rate; these
# tables are document-independent constants with a 100% hit rate.

_STATIC_CODE_CACHE: dict[int, tuple[int, int, dict[int, tuple[int, int]]]] = {}


def _static_lengths(alphabet_size: int) -> dict[int, int]:
    """Complete canonical-code lengths for a uniform profile over the
    full alphabet, laid out as TWO CONTIGUOUS RUNS: the first
    ``2**L - alphabet_size`` symbols at ``L-1`` bits, the rest at
    ``L`` (L = ceil(log2(alphabet_size))).  Kraft:
    x*2^-(L-1) + (A-x)*2^-L = 1 exactly at x = 2^L - A.  Any
    assignment of these lengths to symbols is an equally valid
    canonical code under a uniform profile; the run layout is chosen
    because the CL-code RLE then covers each run with 16-tokens, so
    the DECODER parses ~A/6 tokens instead of ~A (the Huffman
    tie-break pattern for equal frequencies scatters 8/9 lengths and
    defeats the RLE — measured as the decoder's top cost)."""
    a = alphabet_size
    bits = max(1, (a - 1).bit_length())
    x = (1 << bits) - a
    return {
        s: (bits - 1 if s < x else bits) for s in range(a)
    }


def _static_code(
    alphabet_size: int,
) -> tuple[int, int, dict[int, tuple[int, int]]]:
    """(emission_bits, emission_nbits, symbol -> (code, len)) for the
    uniform-profile canonical code over the FULL alphabet."""
    ent = _STATIC_CODE_CACHE.get(alphabet_size)
    if ent is None:
        lengths = _static_lengths(alphabet_size)
        scratch = _LsbWriter()
        codes = _write_prefix_code(scratch, lengths, alphabet_size)
        nbits = 8 * len(scratch.out) + scratch.nbits
        bits = int.from_bytes(bytes(scratch.out), "little") | (
            scratch.hold << (8 * len(scratch.out))
        )
        ent = (bits, nbits, codes)
        _STATIC_CODE_CACHE[alphabet_size] = ent
    return ent


def _write_static_code(
    bw: _LsbWriter, alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Emit the static-profile prefix code for ``alphabet_size`` as one
    precomputed write; bit-for-bit what `_write_prefix_code` emits for
    the same lengths (the precompute goes through it)."""
    bits, nbits, codes = _static_code(alphabet_size)
    bw.write(bits, nbits)
    return codes


# ---------------------------------------------------------------------------
# Shared pixel helpers
# ---------------------------------------------------------------------------


def _prefix_decode(br: _LsbReader, code_sym: int) -> int:
    """LZ77 length/distance prefix scheme (spec §4.2.2): value >= 1."""
    if code_sym < 4:
        return code_sym + 1
    extra_bits = (code_sym - 2) >> 1
    offset = (2 + (code_sym & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """Inverse of _prefix_decode: value -> (code, extra, extra_bits)."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    hb = x.bit_length() - 1
    second = (x >> (hb - 1)) & 1
    code = 2 * hb + second
    extra_bits = hb - 1
    offset = (2 + second) << extra_bits
    return code, x - offset, extra_bits


def _cache_hash(argb: int, bits: int) -> int:
    return ((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - bits)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _decode_entropy_image(
    br: _LsbReader, w: int, h: int, is_level0: bool
) -> list[int]:
    """One entropy-coded ARGB image (spec §5.3): color cache, optional
    meta prefix groups (level 0 only), 5 prefix codes per group,
    literal / LZ77 backref / cache-reference pixel stream."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise EngineError("invalid VP8L color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta: list[int] | None = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = -(-w >> meta_bits) if False else -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta = _decode_entropy_image(br, mw, mh, is_level0=False)
        num_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1

    green_size = _GREEN_BASE + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, green_size),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, 40),    # distance
        ))

    n = w * h
    out: list[int] = [0] * n
    i = 0
    mw = -(-w // (1 << meta_bits)) if meta is not None else 0
    while i < n:
        if meta is not None:
            x, y = i % w, i // w
            gi = (meta[(y >> meta_bits) * mw + (x >> meta_bits)] >> 8) & 0xFFFF
            g_code, r_code, b_code, a_code, d_code = groups[gi]
        else:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        sym = g_code.decode(br)
        if sym < 256:
            r = r_code.decode(br)
            b = b_code.decode(br)
            a = a_code.decode(br)
            px = (a << 24) | (r << 16) | (sym << 8) | b
            out[i] = px
            i += 1
            if cache_size:
                cache[_cache_hash(px, cache_bits)] = px
        elif sym < _GREEN_BASE:
            length = _prefix_decode(br, sym - 256)
            dist_code = _prefix_decode(br, d_code.decode(br))
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > i or i + length > n:
                raise EngineError("VP8L backward reference out of range")
            for _ in range(length):
                px = out[i - dist]
                out[i] = px
                i += 1
                if cache_size:
                    cache[_cache_hash(px, cache_bits)] = px
        else:
            idx = sym - _GREEN_BASE
            if idx >= cache_size:
                raise EngineError("VP8L color-cache index out of range")
            out[i] = cache[idx]
            i += 1
    return out


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _predict_pixel(mode: int, L, T, TL, TR) -> np.ndarray:
    """One predicted ARGB pixel, channels as 4-int arrays (spec §4.2.1)."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        pl = int(np.abs(p - L).sum())
        pt = int(np.abs(p - T).sum())
        return L if pl < pt else T
    if mode == 12:
        return np.clip(
            L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32),
            0, 255,
        )
    if mode == 13:
        a = _avg2(L, T)
        d = a - TL.astype(np.int32)
        # C-style truncation toward zero for the half-step
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return np.clip(a + half, 0, 255)
    raise EngineError(f"invalid VP8L predictor mode {mode}")


def _predict_px_int(
    mode: int, L: list[int], T: list[int], TL: list[int], TR: list[int]
) -> list[int]:
    """_predict_pixel on plain int lists — the scalar fallback for the
    left-dependent modes inside _unpredict's per-run chain (channel
    values are 0..255 so ``>> 1`` is the spec's floor-div average)."""
    if mode == 5:
        return [(((L[c] + TR[c]) >> 1) + T[c]) >> 1 for c in range(4)]
    if mode == 6:
        return [(L[c] + TL[c]) >> 1 for c in range(4)]
    if mode == 7:
        return [(L[c] + T[c]) >> 1 for c in range(4)]
    if mode == 10:
        return [
            (((L[c] + TL[c]) >> 1) + ((T[c] + TR[c]) >> 1)) >> 1
            for c in range(4)
        ]
    if mode == 11:
        p = [L[c] + T[c] - TL[c] for c in range(4)]
        pl = sum(abs(p[c] - L[c]) for c in range(4))
        pt = sum(abs(p[c] - T[c]) for c in range(4))
        return L if pl < pt else T
    if mode == 12:
        return [min(255, max(0, L[c] + T[c] - TL[c])) for c in range(4)]
    if mode == 13:
        out = []
        for c in range(4):
            a = (L[c] + T[c]) >> 1
            d = a - TL[c]
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(min(255, max(0, a + half)))
        return out
    raise EngineError(f"invalid VP8L predictor mode {mode}")


def _unpredict(img: np.ndarray, modes: list[int], bits: int, w: int, h: int) -> None:
    """Invert the predictor transform in place; img is (h, w, 4) uint8
    ARGB channel order [A, R, G, B].

    Vectorized row-at-a-time (the r11 verdict's "watch m21's cost"
    item): the top row and mode-1 runs are mod-256 cumsums; modes
    0/2/3/4/8/9 read only the previous row so whole same-mode block
    runs apply as array ops; only the left-dependent non-linear modes
    (5,6,7,10,11,12,13) walk pixels, on plain ints."""
    bw = -(-w // (1 << bits))
    acc = img.astype(np.int32)
    # (0,0): black predictor (alpha 255); rest of row 0 chains on L
    acc[0, 0, 0] = (acc[0, 0, 0] + 255) & 0xFF
    acc[0] = np.cumsum(acc[0], axis=0, dtype=np.int64) & 0xFF
    for y in range(1, h):
        acc[y, 0] = (acc[y, 0] + acc[y - 1, 0]) & 0xFF
        mrow = (y >> bits) * bw
        x = 1
        while x < w:
            mode = modes[mrow + (x >> bits)]
            xe = min(((x >> bits) + 1) << bits, w)
            while xe < w and modes[mrow + (xe >> bits)] == mode:
                xe = min(((xe >> bits) + 1) << bits, w)
            if mode == 1:
                run = np.cumsum(
                    acc[y, x - 1 : xe], axis=0, dtype=np.int64
                ) & 0xFF
                acc[y, x:xe] = run[1:]
            elif mode in (0, 2, 3, 4, 8, 9):
                T = acc[y - 1, x:xe]
                if mode == 0:
                    acc[y, x:xe, 0] = (acc[y, x:xe, 0] + 255) & 0xFF
                elif mode == 2:
                    acc[y, x:xe] = (acc[y, x:xe] + T) & 0xFF
                elif mode == 4:
                    acc[y, x:xe] = (
                        acc[y, x:xe] + acc[y - 1, x - 1 : xe - 1]
                    ) & 0xFF
                elif mode == 8:
                    acc[y, x:xe] = (
                        acc[y, x:xe]
                        + ((acc[y - 1, x - 1 : xe - 1] + T) >> 1)
                    ) & 0xFF
                else:  # 3 / 9 need TR; TR of the last column is the
                    # CURRENT row's first pixel (scan-order memory)
                    if xe < w:
                        TR = acc[y - 1, x + 1 : xe + 1]
                    else:
                        TR = np.empty_like(T)
                        TR[:-1] = acc[y - 1, x + 1 : w]
                        TR[-1] = acc[y, 0]
                    if mode == 3:
                        acc[y, x:xe] = (acc[y, x:xe] + TR) & 0xFF
                    else:
                        acc[y, x:xe] = (acc[y, x:xe] + ((T + TR) >> 1)) & 0xFF
            else:
                tvals = acc[y - 1, x - 1 : min(xe + 1, w)].tolist()
                rvals = acc[y, x:xe].tolist()
                first_px = acc[y, 0].tolist()
                Lp = acc[y, x - 1].tolist()
                out = []
                for k, resid in enumerate(rvals):
                    TR4 = tvals[k + 2] if k + 2 < len(tvals) else first_px
                    p4 = _predict_px_int(mode, Lp, tvals[k + 1], tvals[k], TR4)
                    Lp = [(resid[c] + p4[c]) & 0xFF for c in range(4)]
                    out.append(Lp)
                acc[y, x:xe] = out
            x = xe
    img[:] = acc.astype(np.uint8)


def _ct_delta(t: int, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (signed-3.5-fixed t * signed c) >> 5."""
    ts = t - 256 if t >= 128 else t
    cs = c.astype(np.int32)
    cs = np.where(cs >= 128, cs - 256, cs)
    return (ts * cs) >> 5


def _inverse_color_transform(
    img: np.ndarray, elems: list[int], bits: int, w: int, h: int
) -> None:
    """Invert the color transform in place (spec §4.2.1): red gets the
    green delta, then blue gets the green AND (updated) red deltas."""
    bw = -(-w // (1 << bits))
    for by in range(-(-h // (1 << bits))):
        for bx in range(bw):
            e = elems[by * bw + bx]
            g2r = e & 0xFF
            g2b = (e >> 8) & 0xFF
            r2b = (e >> 16) & 0xFF
            y0, y1 = by << bits, min((by + 1) << bits, h)
            x0, x1 = bx << bits, min((bx + 1) << bits, w)
            blk = img[y0:y1, x0:x1]
            g = blk[:, :, 2]
            r = (blk[:, :, 1].astype(np.int32) + _ct_delta(g2r, g)) & 0xFF
            b = (
                blk[:, :, 3].astype(np.int32)
                + _ct_delta(g2b, g)
                + _ct_delta(r2b, r.astype(np.uint8))
            ) & 0xFF
            blk[:, :, 1] = r.astype(np.uint8)
            blk[:, :, 3] = b.astype(np.uint8)


def decode_webp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a lossless (VP8L) WebP to (width, height, 4, RGBA bytes).

    Animated streams decode as their FIRST frame's lossless bitstream
    (the GIF frame-0 precedent; frame compositing/disposal is out of
    scope — the returned dims are the frame's own).  Lossy ("VP8 ")
    bitstreams, still or animated, raise ``EngineError``."""
    if len(data) < 12 or data[:4] != RIFF_SIG or data[8:12] != WEBP_SIG:
        raise EngineError("not a WebP (bad RIFF/WEBP header)")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 > len(data):
        raise EngineError("truncated WebP (RIFF size exceeds data)")
    pos = 12
    vp8l: bytes | None = None
    vp8: bytes | None = None
    alph: bytes | None = None
    saw_anim = False
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise EngineError("truncated WebP chunk")
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 " and vp8 is None:
            vp8 = body
        if tag == b"ALPH":
            alph = body
        if tag == b"ANIM":
            saw_anim = True
        if tag == b"ANMF" and size >= 16:
            # animated: the frame payload is sub-chunks after the
            # 16-byte frame header (x/y/w-1/h-1 24-bit fields,
            # duration, flags); a still decode is FRAME 1
            saw_anim = True
            sub = 16
            while sub + 8 <= size:
                stag = body[sub : sub + 4]
                (ssize,) = struct.unpack_from("<I", body, sub + 4)
                sbody = body[sub + 8 : sub + 8 + ssize]
                if len(sbody) < ssize:
                    raise EngineError("truncated WebP chunk")
                if stag == b"VP8L":
                    vp8l = sbody
                    break
                if stag == b"VP8 " and vp8 is None:
                    vp8 = sbody
                if stag == b"ALPH":
                    alph = sbody
                sub += 8 + ssize + (ssize & 1)
            if vp8l is not None:
                break
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if vp8l is None:
        if vp8 is not None:
            # r12: lossy VP8 key-frame decode (RFC 6386, vp8_codec.py)
            # — VERDICT r11 task 3 — plus the ALPH alpha plane
            # (RFC 9649 §4.5: raw or headerless-VP8L, all four
            # filtering modes).
            from flaco_spark.sources.vp8_codec import (
                decode_vp8_frame,
                yuv420_to_rgb,
            )

            W, H, Y, U, V = decode_vp8_frame(vp8)
            rgb = yuv420_to_rgb(Y, U, V)
            if alph is not None:
                alpha = decode_alpha_plane(alph, W, H)
            else:
                alpha = np.full((H, W), 255, dtype=np.uint8)
            rgba = np.dstack([rgb, alpha])
            return W, H, 4, rgba.tobytes()
        if saw_anim:
            raise EngineError(
                "animated WebP has no decodable still frame"
            )
        raise EngineError("WebP has no VP8/VP8L bitstream")

    if not vp8l or vp8l[0] != VP8L_MAGIC:
        raise EngineError("bad VP8L signature byte")
    br = _LsbReader(vp8l, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    check_pixel_budget(w, h, "VP8L")
    br.read(1)  # alpha hint
    version = br.read(3)
    if version != 0:
        raise EngineError(f"unsupported VP8L version {version}")
    img = _decode_argb(br, w, h)
    rgba = img[:, :, [1, 2, 3, 0]]  # ARGB -> RGBA
    return img.shape[1], h, 4, rgba.tobytes()


def _decode_argb(br: _LsbReader, w: int, h: int) -> np.ndarray:
    """The VP8L image body after the 5-byte header: level-0
    transforms, the entropy-coded image, and the inverse transforms
    in reverse order.  Returns (h, w, 4) uint8 ARGB.  Shared by the
    VP8L path and the headerless ALPH alpha-plane stream (RFC 9649
    §4.5, which carries the SAME body at implicit dimensions)."""
    # transforms (level 0 only), inverted in reverse order later
    transforms: list[tuple] = []
    cur_w = w
    seen: set[int] = set()
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise EngineError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0:  # PREDICTOR
            bits = br.read(3) + 2
            bw_ = -(-cur_w // (1 << bits))
            bh_ = -(-h // (1 << bits))
            sub = _decode_entropy_image(br, bw_, bh_, is_level0=False)
            transforms.append(("predict", bits, [(p >> 8) & 0xFF for p in sub]))
        elif ttype == 1:  # COLOR_TRANSFORM
            bits = br.read(3) + 2
            bw_ = -(-cur_w // (1 << bits))
            bh_ = -(-h // (1 << bits))
            sub = _decode_entropy_image(br, bw_, bh_, is_level0=False)
            transforms.append(("color", bits, [p & 0xFFFFFF for p in sub]))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subtract_green",))
        else:  # COLOR_INDEXING
            pal_size = br.read(8) + 1
            pal_img = _decode_entropy_image(br, pal_size, 1, is_level0=False)
            # palette entries are delta-coded per channel
            palette = []
            prev = 0
            for p in pal_img:
                cur = 0
                for shift in (0, 8, 16, 24):
                    cur |= (((p >> shift) + (prev >> shift)) & 0xFF) << shift
                palette.append(cur)
                prev = cur
            if pal_size <= 2:
                wbits = 3
            elif pal_size <= 4:
                wbits = 2
            elif pal_size <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append(("palette", palette, wbits, cur_w))
            if wbits:
                cur_w = -(-cur_w // (1 << wbits))

    pixels = _decode_entropy_image(br, cur_w, h, is_level0=True)
    img = np.zeros((h, cur_w, 4), dtype=np.uint8)  # [A, R, G, B]
    arr = np.array(pixels, dtype=np.uint32).reshape(h, cur_w)
    img[:, :, 0] = (arr >> 24) & 0xFF
    img[:, :, 1] = (arr >> 16) & 0xFF
    img[:, :, 2] = (arr >> 8) & 0xFF
    img[:, :, 3] = arr & 0xFF

    for t in reversed(transforms):
        if t[0] == "palette":
            _, palette, wbits, full_w = t
            if wbits:
                per = 8 >> wbits  # bits per packed index
                # unpack indices from the GREEN channel, LSB-first
                idx = np.zeros((h, full_w), dtype=np.int32)
                for x in range(full_w):
                    packed = img[:, x >> wbits, 2].astype(np.int32)
                    shift = (x & ((1 << wbits) - 1)) * per
                    idx[:, x] = (packed >> shift) & ((1 << per) - 1)
            else:
                idx = img[:, :, 2].astype(np.int32)
                full_w = img.shape[1]
            # Spec: indices >= palette size decode as 0x00000000
            # (transparent black), not an error — a conformant stream
            # with packed indices can legitimately emit them.
            pal = np.zeros(256, dtype=np.uint32)
            pal[: len(palette)] = np.array(palette, dtype=np.uint32)
            argb = pal[idx]
            img = np.zeros((h, full_w, 4), dtype=np.uint8)
            img[:, :, 0] = (argb >> 24) & 0xFF
            img[:, :, 1] = (argb >> 16) & 0xFF
            img[:, :, 2] = (argb >> 8) & 0xFF
            img[:, :, 3] = argb & 0xFF
        elif t[0] == "subtract_green":
            g = img[:, :, 2].astype(np.int32)
            img[:, :, 1] = ((img[:, :, 1].astype(np.int32) + g) & 0xFF).astype(np.uint8)
            img[:, :, 3] = ((img[:, :, 3].astype(np.int32) + g) & 0xFF).astype(np.uint8)
        elif t[0] == "color":
            _inverse_color_transform(img, t[2], t[1], img.shape[1], h)
        elif t[0] == "predict":
            _unpredict(img, t[2], t[1], img.shape[1], h)

    return img


def decode_alpha_plane(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk -> (h, w) uint8 alpha plane (RFC 9649 §4.5):
    header byte = compression (2 bits: 0 raw / 1 lossless), filtering
    (2 bits: none/horizontal/vertical/gradient), pre-processing
    (2 bits, no decode effect); method 1 is a HEADERLESS VP8L body at
    implicit w x h whose GREEN channel carries the alpha values."""
    if not body:
        raise EngineError("empty ALPH chunk")
    hdr = body[0]
    method = hdr & 3
    filt = (hdr >> 2) & 3
    if method == 0:
        if len(body) < 1 + w * h:
            raise EngineError("truncated raw ALPH plane")
        plane = np.frombuffer(
            body[1 : 1 + w * h], dtype=np.uint8
        ).reshape(h, w).astype(np.int32)
    elif method == 1:
        br = _LsbReader(body, 1)
        img = _decode_argb(br, w, h)
        plane = img[:, :, 2].astype(np.int32)  # green channel
    else:
        raise EngineError(f"invalid ALPH compression method {method}")
    if filt == 0:
        out = plane
    elif filt in (1, 2, 3):
        out = np.zeros_like(plane)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = out[0, x - 1]
                elif x == 0:
                    pred = out[y - 1, 0]
                elif filt == 1:  # horizontal
                    pred = out[y, x - 1]
                elif filt == 2:  # vertical
                    pred = out[y - 1, x]
                else:  # gradient
                    g = (
                        int(out[y, x - 1])
                        + int(out[y - 1, x])
                        - int(out[y - 1, x - 1])
                    )
                    pred = 0 if g < 0 else (255 if g > 255 else g)
                out[y, x] = (plane[y, x] + pred) & 0xFF
    else:
        raise EngineError(f"invalid ALPH filtering method {filt}")
    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _predict_block(
    mode: int, L: np.ndarray, T: np.ndarray, TL: np.ndarray, TR: np.ndarray
) -> np.ndarray:
    """_predict_pixel vectorized over int32 arrays with a trailing
    channel axis (values 0..255, so ``>> 1`` is the floor average)."""
    if mode == 0:
        out = np.zeros_like(T)
        out[..., 0] = 255
        return out
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return (((L + TR) >> 1) + T) >> 1
    if mode == 6:
        return (L + TL) >> 1
    if mode == 7:
        return (L + T) >> 1
    if mode == 8:
        return (TL + T) >> 1
    if mode == 9:
        return (T + TR) >> 1
    if mode == 10:
        return (((L + TL) >> 1) + ((T + TR) >> 1)) >> 1
    if mode == 11:
        p = L + T - TL
        pl = np.abs(p - L).sum(axis=-1, keepdims=True)
        pt = np.abs(p - T).sum(axis=-1, keepdims=True)
        return np.where(pl < pt, L, T)
    if mode == 12:
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:
        a = (L + T) >> 1
        d = a - TL
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return np.clip(a + half, 0, 255)
    raise EngineError(f"invalid VP8L predictor mode {mode}")


def _forward_predict(
    img: np.ndarray, mode: int, bits: int, w: int, h: int
) -> tuple[np.ndarray, list[int]]:
    """Apply the predictor transform FORWARD with one fixed mode for
    every block; returns (residual image, block mode list).

    Fully vectorized: the forward direction reads only SOURCE pixels
    (never residuals), so there is no sequential dependency — the
    whole prediction image is computed with shifted array views."""
    acc = img.astype(np.int32)
    pred = np.zeros_like(acc)
    pred[0, 0, 0] = 255  # black predictor at the origin
    if w > 1:
        pred[0, 1:] = acc[0, :-1]  # row 0: L
    if h > 1:
        pred[1:, 0] = acc[:-1, 0]  # column 0: T
    if w > 1 and h > 1:
        L = acc[1:, :-1]
        T = acc[:-1, 1:]
        TL = acc[:-1, :-1]
        TR = np.empty_like(T)
        TR[:, :-1] = acc[:-1, 2:]
        TR[:, -1] = acc[1:, 0]  # last column's TR wraps to row start
        pred[1:, 1:] = _predict_block(mode, L, T, TL, TR)
    res = (acc - pred) & 0xFF
    bw_ = -(-w // (1 << bits))
    bh_ = -(-h // (1 << bits))
    return res.astype(np.uint8), [mode] * (bw_ * bh_)


def _encode_entropy_image(
    bw: _LsbWriter, argb: list[int], w: int, h: int, is_level0: bool,
    use_lz77: bool, cache_bits: int, meta_bits: int = 0,
    static_codes: bool = False,
) -> None:
    """Encode one entropy image: greedy LZ77, optional color cache,
    and (level 0, ``meta_bits`` >= 2) meta prefix groups — one prefix
    code set per 2^meta_bits-square tile, the group index image
    emitted as its own entropy image, so the decoder's meta path is
    round-trip covered.

    ``static_codes`` swaps the per-document adaptive Huffman tables
    for the precomputed uniform-profile canonical codes (see
    `_static_code`): larger stream, no per-document table build /
    emission / parse cost, identical decoded pixels."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    mw = mh = 0
    num_groups = 1
    if is_level0:
        if meta_bits:
            if not 2 <= meta_bits <= 9:
                raise EngineError(f"invalid meta_bits {meta_bits}")
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mw = -(-w // (1 << meta_bits))
            mh = -(-h // (1 << meta_bits))
            num_groups = mw * mh
            meta_img = [
                (0xFF << 24) | (((my * mw) + mx) << 8)
                for my in range(mh)
                for mx in range(mw)
            ]
            _encode_entropy_image(
                bw, meta_img, mw, mh, is_level0=False,
                use_lz77=False, cache_bits=0,
            )
        else:
            bw.write(0, 1)  # no meta prefix codes
    cache_size = (1 << cache_bits) if cache_bits else 0

    # reverse map for the 2D neighborhood distances
    near = {}
    for ci, (dx, dy) in enumerate(_DIST_MAP):
        d = dy * w + dx
        if d >= 1 and d not in near:
            near[d] = ci + 1

    # ---- pass 1: tokenize (greedy LZ77 + cache), per-group histograms
    n = len(argb)
    tokens: list[tuple] = []
    cache = [0] * cache_size
    hists = [
        tuple({} for _ in range(5)) for _ in range(num_groups)
    ]  # (green, red, blue, alpha, distance) frequency dicts per group
    # hash-chain match candidates: positions sharing the pixel value,
    # newest first, bounded — keeps tokenization ~O(n) on
    # low-repetition content instead of O(n * window)
    chains: dict[int, list[int]] = {}

    def _chain_add(pos: int) -> None:
        c = chains.setdefault(argb[pos], [])
        c.insert(0, pos)
        if len(c) > 16:
            c.pop()

    i = 0
    single_group = num_groups == 1
    # static codes need no frequency collection at all; the histogram
    # updates below are guarded so pass 1 is pure tokenization then
    collect = not static_codes
    gf, rf, bf, af, df = hists[0]
    while i < n:
        if single_group:
            gi = 0
        else:
            gi = ((i // w) >> meta_bits) * mw + ((i % w) >> meta_bits)
            gf, rf, bf, af, df = hists[gi]
        match_len = 0
        match_dist = 0
        if use_lz77 and i >= 1:
            for pos in chains.get(argb[i], ()):
                dist = i - pos
                if dist > 1 << 20:
                    break
                l = 0
                max_l = min(n - i, 4096)
                while l < max_l and argb[i + l] == argb[i + l - dist]:
                    l += 1
                if l > match_len:
                    match_len, match_dist = l, dist
                if l >= 64:
                    break
            # dist=1 run-length is not value-keyed; probe it directly
            if match_len < 64 and argb[i - 1] == argb[i]:
                l = 0
                max_l = min(n - i, 4096)
                while l < max_l and argb[i + l] == argb[i - 1]:
                    l += 1
                if l > match_len:
                    match_len, match_dist = l, 1
        if match_len >= 3:
            lc, lex, leb = _prefix_encode(match_len)
            dcode = near.get(match_dist, match_dist + 120)
            dc, dex, deb = _prefix_encode(dcode)
            tokens.append(("copy", gi, lc, lex, leb, dc, dex, deb))
            if collect:
                gf[256 + lc] = gf.get(256 + lc, 0) + 1
                df[dc] = df.get(dc, 0) + 1
            for j in range(match_len):
                px = argb[i + j]
                if cache_size:
                    cache[_cache_hash(px, cache_bits)] = px
                _chain_add(i + j)
            i += match_len
            continue
        px = argb[i]
        _chain_add(i)
        if cache_size and cache[_cache_hash(px, cache_bits)] == px:
            idx = _cache_hash(px, cache_bits)
            sym = _GREEN_BASE + idx
            tokens.append(("cache", gi, sym))
            if collect:
                gf[sym] = gf.get(sym, 0) + 1
            i += 1
            continue
        tokens.append(("lit", gi, px))
        if collect:
            gf[(px >> 8) & 0xFF] = gf.get((px >> 8) & 0xFF, 0) + 1
            rf[(px >> 16) & 0xFF] = rf.get((px >> 16) & 0xFF, 0) + 1
            bf[px & 0xFF] = bf.get(px & 0xFF, 0) + 1
            af[(px >> 24) & 0xFF] = af.get((px >> 24) & 0xFF, 0) + 1
        if cache_size:
            cache[_cache_hash(px, cache_bits)] = px
        i += 1

    green_size = _GREEN_BASE + cache_size
    group_codes = []
    if static_codes:
        # one precomputed emission per code; the decoder parses the
        # SAME length vectors for every document, so its _prefix_code
        # memo and LUTs hit on all of them
        for _ in range(num_groups):
            group_codes.append((
                _write_static_code(bw, green_size),
                _write_static_code(bw, 256),
                _write_static_code(bw, 256),
                _write_static_code(bw, 256),
                _write_static_code(bw, 40),
            ))
    else:
        for gf, rf, bf, af, df in hists:
            # every channel needs at least one coded symbol (an all-copy
            # group still writes valid red/blue/alpha codes)
            for fr in (gf, rf, bf, af, df):
                if not fr:
                    fr[0] = 1
            group_codes.append((
                _write_prefix_code(bw, _build_lengths(gf), green_size),
                _write_prefix_code(bw, _build_lengths(rf), 256),
                _write_prefix_code(bw, _build_lengths(bf), 256),
                _write_prefix_code(bw, _build_lengths(af), 256),
                _write_prefix_code(bw, _build_lengths(df), 40),
            ))

    # ---- pass 2: emit tokens (writer state bound to locals — same
    # bytes as per-field write() calls; extras from _prefix_encode are
    # < 2**extra_bits by construction so no masking is needed)
    hold = bw.hold
    nb = bw.nbits
    append = bw.out.append
    for tok in tokens:
        g_codes, r_codes, b_codes, a_codes, d_codes = group_codes[tok[1]]
        kind = tok[0]
        if kind == "lit":
            px = tok[2]
            c, l = g_codes[(px >> 8) & 0xFF]
            hold |= c << nb
            nb += l
            c, l = r_codes[(px >> 16) & 0xFF]
            hold |= c << nb
            nb += l
            c, l = b_codes[px & 0xFF]
            hold |= c << nb
            nb += l
            c, l = a_codes[(px >> 24) & 0xFF]
            hold |= c << nb
            nb += l
        elif kind == "cache":
            c, l = g_codes[tok[2]]
            hold |= c << nb
            nb += l
        else:
            _, _, lc, lex, leb, dc, dex, deb = tok
            c, l = g_codes[256 + lc]
            hold |= c << nb
            nb += l
            hold |= lex << nb
            nb += leb
            c, l = d_codes[dc]
            hold |= c << nb
            nb += l
            hold |= dex << nb
            nb += deb
        while nb >= 8:
            append(hold & 0xFF)
            hold >>= 8
            nb -= 8
    bw.hold = hold
    bw.nbits = nb


def encode_webp_lossless(
    pixels: bytes, width: int, height: int, channels: int,
    *, use_subtract_green: bool = True, use_lz77: bool = True,
    cache_bits: int = 0, predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    use_palette: bool = False, meta_bits: int = 0,
    static_codes: bool = False,
) -> bytes:
    """Encode row-major RGB/RGBA pixels as a lossless VP8L WebP.

    ``predictor_mode`` (0-13) forces the predictor transform with that
    mode for every block; ``color_transform`` = (green_to_red,
    green_to_blue, red_to_blue) signed 3.5-fixed bytes forces the
    color transform — both exist so round-trip tests drive every
    inverse-transform branch of the decoder against an independently
    computed forward transform.  ``use_palette`` applies the
    COLOR_INDEXING transform (requires <=256 distinct colors; packs
    1/2/4-bit indices when the palette allows) and excludes the other
    transforms, matching real-encoder practice.  ``meta_bits`` >= 2
    emits meta prefix groups (one code set per 2^meta_bits tile with
    the group-index entropy image), the remaining decoder path."""
    if channels not in (3, 4):
        raise EngineError(
            f"encode_webp_lossless supports 3 or 4 channels, got {channels}"
        )
    if use_palette and (
        predictor_mode is not None or color_transform is not None
    ):
        raise EngineError("use_palette excludes the pixel-value transforms")
    if len(pixels) != width * height * channels:
        raise EngineError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * channels}"
        )
    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise EngineError(f"bad WebP dimensions {width}x{height}")
    if predictor_mode is not None and not 0 <= predictor_mode <= 13:
        raise EngineError(f"invalid predictor mode {predictor_mode}")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    img = np.zeros((height, width, 4), dtype=np.uint8)  # [A, R, G, B]
    img[:, :, 0] = arr[:, :, 3] if channels == 4 else 255
    img[:, :, 1] = arr[:, :, 0]
    img[:, :, 2] = arr[:, :, 1]
    img[:, :, 3] = arr[:, :, 2]

    bw = _LsbWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if channels == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version

    bits = 4  # 16x16 transform blocks
    eff_w = width
    # forward transforms (stream order = application order; the
    # decoder inverts in reverse)
    if use_palette:
        argb_full = (
            (img[:, :, 0].astype(np.uint32) << 24)
            | (img[:, :, 1].astype(np.uint32) << 16)
            | (img[:, :, 2].astype(np.uint32) << 8)
            | img[:, :, 3].astype(np.uint32)
        )
        palette = sorted(int(v) for v in np.unique(argb_full))
        if len(palette) > 256:
            raise EngineError(
                f"palette encoding needs <=256 distinct colors, "
                f"got {len(palette)}"
            )
        lut = {c: i for i, c in enumerate(palette)}
        idx = np.vectorize(lut.__getitem__, otypes=[np.int32])(argb_full)
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(palette) - 1, 8)
        # delta-coded palette entries, one per sub-pixel channel
        deltas = []
        prev = 0
        for c in palette:
            d = 0
            for shift in (0, 8, 16, 24):
                d |= (((c >> shift) - (prev >> shift)) & 0xFF) << shift
            deltas.append(d)
            prev = c
        _encode_entropy_image(
            bw, deltas, len(palette), 1, is_level0=False,
            use_lz77=False, cache_bits=0,
        )
        n_pal = len(palette)
        wbits = 3 if n_pal <= 2 else 2 if n_pal <= 4 else 1 if n_pal <= 16 else 0
        if wbits:
            per = 8 >> wbits  # bits per packed index
            packed_w = -(-width // (1 << wbits))
            packed = np.zeros((height, packed_w), dtype=np.int32)
            for x in range(width):
                shift = (x & ((1 << wbits) - 1)) * per
                packed[:, x >> wbits] |= idx[:, x] << shift
            green = packed
            eff_w = packed_w
        else:
            green = idx
        img = np.zeros((height, eff_w, 4), dtype=np.uint8)
        img[:, :, 0] = 255
        img[:, :, 2] = green.astype(np.uint8)
    if predictor_mode is not None:
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bw.write(bits - 2, 3)
        img, modes = _forward_predict(img, predictor_mode, bits, eff_w, height)
        sub = [(0xFF << 24) | (m << 8) for m in modes]
        bw_ = -(-eff_w // (1 << bits))
        _encode_entropy_image(
            bw, sub, bw_, len(sub) // bw_, is_level0=False,
            use_lz77=False, cache_bits=0,
        )
    if color_transform is not None:
        g2r, g2b, r2b = (v & 0xFF for v in color_transform)
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR_TRANSFORM
        bw.write(bits - 2, 3)
        # forward: subtract the deltas; the red->blue delta must use
        # the ORIGINAL red (the value the decoder's inverse pass has
        # already restored when it applies that delta)
        g = img[:, :, 2]
        r_orig = img[:, :, 1]
        r = (r_orig.astype(np.int32) - _ct_delta(g2r, g)) & 0xFF
        b = (
            img[:, :, 3].astype(np.int32)
            - _ct_delta(g2b, g)
            - _ct_delta(r2b, r_orig)
        ) & 0xFF
        img[:, :, 1] = r.astype(np.uint8)
        img[:, :, 3] = b.astype(np.uint8)
        bw_ = -(-eff_w // (1 << bits))
        bh_ = -(-height // (1 << bits))
        e = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
        _encode_entropy_image(
            bw, [e] * (bw_ * bh_), bw_, bh_, is_level0=False,
            use_lz77=False, cache_bits=0,
        )
    if use_subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        g = img[:, :, 2].astype(np.int32)
        img[:, :, 1] = ((img[:, :, 1].astype(np.int32) - g) & 0xFF).astype(np.uint8)
        img[:, :, 3] = ((img[:, :, 3].astype(np.int32) - g) & 0xFF).astype(np.uint8)
    bw.write(0, 1)  # end of transforms

    argb = (
        (img[:, :, 0].astype(np.uint32) << 24)
        | (img[:, :, 1].astype(np.uint32) << 16)
        | (img[:, :, 2].astype(np.uint32) << 8)
        | img[:, :, 3].astype(np.uint32)
    ).reshape(-1)
    _encode_entropy_image(
        bw, [int(p) for p in argb], eff_w, height, is_level0=True,
        use_lz77=use_lz77, cache_bits=cache_bits, meta_bits=meta_bits,
        static_codes=static_codes,
    )

    payload = bytes([VP8L_MAGIC]) + bw.bytes
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = RIFF_SIG + struct.pack("<I", 4 + len(chunk)) + WEBP_SIG + chunk
    return riff
