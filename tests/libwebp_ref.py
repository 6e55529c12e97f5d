"""ctypes bridge to the system libwebp — TEST-SIDE REFERENCE ONLY.

r12: `libwebp.so.7` turns out to ship in this container (r11 believed
no external WebP implementation existed and graded m21's evidence one
tier below the JPEG lanes for exactly that reason).  This wrapper
gives the test suite the canonical encoder/decoder as an independent
oracle:

- our VP8L ENCODER's streams are decoded by libwebp (byte-exact),
- real libwebp-ENCODED lossless streams are decoded by our from-spec
  decoder (byte-exact),
- real libwebp-encoded LOSSY (VP8) streams become fixtures for the
  r12 VP8 decoder.

The PRODUCT path never touches this module — the engine's codecs stay
pure from-spec Python (the gate lanes must not depend on a host
library); this is verification-grade material like the JDK ImageIO
cross-checks in the JPEG lanes.
"""

from __future__ import annotations

import ctypes

_lib = None


def load():
    """The libwebp handle, or None when the library is unavailable
    (tests that use it must skip, not fail)."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPDecodeRGBA.restype = ctypes.c_void_p
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.WebPFree.restype = None
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def decode_rgba(data: bytes) -> tuple[int, int, bytes] | None:
    """(width, height, RGBA bytes) via libwebp, or None on failure."""
    lib = load()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        return None
    out = ctypes.string_at(ptr, w.value * h.value * 4)
    lib.WebPFree(ctypes.c_void_p(ptr))
    return w.value, h.value, out


def encode_lossless_rgba(rgba: bytes, w: int, h: int) -> bytes | None:
    """A REAL libwebp lossless (VP8L) stream, or None on failure."""
    lib = load()
    if lib is None:
        return None
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    if not n:
        return None
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def encode_lossy_rgb(rgb: bytes, w: int, h: int, quality: float = 75.0) -> bytes | None:
    """A REAL libwebp lossy ("VP8 " chunk) stream, or None on failure.
    RGB input (no alpha) keeps the container a plain VP8 chunk instead
    of VP8X+ALPH."""
    lib = load()
    if lib is None:
        return None
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGB(rgb, w, h, w * 3, quality, ctypes.byref(out))
    if not n:
        return None
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def decode_yuv(data: bytes):
    """(width, height, Y, U, V numpy planes) via libwebp's
    WebPDecodeYUV — the raw decoder output surface (no colorspace
    conversion), the right plane for bit-exact VP8 comparisons."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    lib.WebPDecodeYUV.restype = ctypes.c_void_p
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    w, h = ctypes.c_int(), ctypes.c_int()
    up, vp = ctypes.c_void_p(), ctypes.c_void_p()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    ptr = lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not ptr:
        return None
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    ybuf = ctypes.string_at(ptr, stride.value * H)
    ubuf = ctypes.string_at(up.value, uv_stride.value * ch)
    vbuf = ctypes.string_at(vp.value, uv_stride.value * ch)
    lib.WebPFree(ctypes.c_void_p(ptr))
    Y = np.frombuffer(ybuf, dtype=np.uint8).reshape(H, stride.value)[:, :W].copy()
    U = np.frombuffer(ubuf, dtype=np.uint8).reshape(ch, uv_stride.value)[:, :cw].copy()
    V = np.frombuffer(vbuf, dtype=np.uint8).reshape(ch, uv_stride.value)[:, :cw].copy()
    return W, H, Y, U, V
