"""ctypes bridge to the C++ bitstream runtime (native/bic_native.cpp).

Builds libbic_native.so on first use (g++, no external deps) and caches it
next to the sources; every entry point has a pure-Python fallback, so the
framework works without a toolchain — the native path is the production
encoder tail / decoder (10-100x the Python loop).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "bic_native.cpp")
_LIB = os.path.join(_REPO, "native", "libbic_native.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    override = os.environ.get("BIC_NATIVE_LIB")
    if override:
        try:
            lib = ctypes.CDLL(override)
            _declare(lib)
            _lib = lib
            return _lib
        except OSError:
            return None
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    _declare(lib)
    _lib = lib
    return _lib


def _declare(lib):
    lib.bic_pack_tiles.restype = ctypes.c_long
    lib.bic_pack_tiles.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.bic_decide_pack.restype = ctypes.c_long
    lib.bic_decide_pack.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32)]
    lib.bic_decode_windowed.restype = ctypes.c_int
    lib.bic_decode_windowed.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_uint8)]
    lib.bic_enum_nbits.restype = ctypes.c_int
    lib.bic_enum_nbits.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.bic_encode_windowed.restype = ctypes.c_long
    lib.bic_encode_windowed.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_char_p, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.bic_cabic_encode.restype = ctypes.c_long
    lib.bic_cabic_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.bic_cabic_decode.restype = ctypes.c_int
    lib.bic_cabic_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.bic_scab_encode.restype = ctypes.c_long
    lib.bic_scab_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.bic_scab_decode.restype = ctypes.c_int
    lib.bic_scab_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    try:
        lib.bic_scab_rans_decode.restype = ctypes.c_int
        lib.bic_scab_rans_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
    except AttributeError:      # stale BIC_NATIVE_LIB override
        pass
    lib.bic_enum_roundtrip.restype = ctypes.c_long
    lib.bic_enum_roundtrip.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.bic_eg_encode_runs.restype = ctypes.c_long
    lib.bic_eg_encode_runs.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.bic_eg_decode_runs.restype = ctypes.c_int
    lib.bic_eg_decode_runs.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8)]


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def pack_tiles(header: bytes, M: int, mode, inv, rank, idx_len, weight,
               residual_bits) -> bytes | None:
    """Native encoder tail; returns the full stream bytes or None."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(mode)
    mode = np.ascontiguousarray(mode, dtype=np.int32)
    inv = np.ascontiguousarray(inv, dtype=np.uint8)
    rank = np.ascontiguousarray(rank, dtype=np.int64)
    idx_len = np.ascontiguousarray(idx_len, dtype=np.int32)
    weight = np.ascontiguousarray(weight, dtype=np.uint32).astype(np.int32)
    res = np.ascontiguousarray(residual_bits, dtype=np.uint8).reshape(n, M)
    cap = len(header) + n * (M // 2 + 64) + 1024  # generous upper bound
    out = np.zeros(cap, dtype=np.uint8)
    ln = lib.bic_pack_tiles(header, len(header), n, M,
                            _p(mode, ctypes.c_int32),
                            _p(inv, ctypes.c_uint8),
                            _p(rank, ctypes.c_int64),
                            _p(idx_len, ctypes.c_int32),
                            _p(weight, ctypes.c_int32),
                            _p(res, ctypes.c_uint8),
                            _p(out, ctypes.c_uint8), cap)
    if ln < 0:
        return None
    return out[:ln].tobytes()


def decide_pack(header: bytes, M: int, codec_id: int, weights4, has_cands,
                idx_len, inv, rank, residual4_packed) -> bytes | None:
    """Fused encoder tail: mode decision + record packing in one call.

    Arrays are the encode_analyze outputs; residual4_packed is the packed
    uint32 [T, 4, nwords] residual bank.  Returns the stream or None."""
    lib = get_lib()
    if lib is None:
        return None
    w4 = np.ascontiguousarray(weights4, dtype=np.int32)
    n = w4.shape[0]
    hc = np.ascontiguousarray(has_cands, dtype=np.uint8)
    il = np.ascontiguousarray(idx_len, dtype=np.int32)
    iv = np.ascontiguousarray(inv, dtype=np.uint8)
    rk = np.ascontiguousarray(rank, dtype=np.int64)
    r4 = np.ascontiguousarray(residual4_packed, dtype=np.uint32)
    nwords = r4.shape[-1]
    cap = len(header) + n * (M // 2 + 64) + 1024
    out = np.zeros(cap, dtype=np.uint8)
    ln = lib.bic_decide_pack(header, len(header), n, M, codec_id,
                             _p(w4, ctypes.c_int32), _p(hc, ctypes.c_uint8),
                             _p(il, ctypes.c_int32), _p(iv, ctypes.c_uint8),
                             _p(rk, ctypes.c_int64), _p(r4, ctypes.c_uint32),
                             nwords, _p(out, ctypes.c_uint8), cap, None)
    if ln < 0:
        return None
    return out[:ln].tobytes()


def decode_windowed(blob: bytes, rows: int, cols: int) -> np.ndarray | None:
    """Native decoder for codecs 4/6/7/8; returns bool image or None."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros(rows * cols, dtype=np.uint8)
    rc = lib.bic_decode_windowed(blob, len(blob), _p(out, ctypes.c_uint8))
    if rc != 0:
        return None
    return out.reshape(rows, cols).astype(bool)


def cabic_encode(img_u8: np.ndarray) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    rows, cols = img_u8.shape
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    cap = rows * cols + 4096
    out = np.zeros(cap, dtype=np.uint8)
    n = lib.bic_cabic_encode(_p(img_u8, ctypes.c_uint8), rows, cols,
                             _p(out, ctypes.c_uint8), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def cabic_decode(body: bytes, rows: int, cols: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros(rows * cols, dtype=np.uint8)
    rc = lib.bic_cabic_decode(body, len(body), rows, cols,
                              _p(out, ctypes.c_uint8))
    if rc != 0:
        return None
    return out.reshape(rows, cols).astype(bool)


def scab_encode(img_u8: np.ndarray, tmpl: int, n_stripes: int, *,
                ramp: bool = True,
                ctx_pre: np.ndarray | None = None) -> bytes | None:
    """Codec-13 payload (stripe-parallel context-adaptive arithmetic
    coding); ctx_pre is an optional uint16 [rows, cols] device-computed
    context map (must match the native incremental scan — tested)."""
    lib = get_lib()
    if lib is None:
        return None
    rows, cols = img_u8.shape
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    if ctx_pre is not None:
        ctx_pre = np.ascontiguousarray(ctx_pre, dtype=np.uint16)
        assert ctx_pre.shape == (rows, cols)
        cp = _p(ctx_pre, ctypes.c_uint16)
    else:
        cp = None
    cap = rows * cols + 4 * n_stripes + 4096
    out = np.zeros(cap, dtype=np.uint8)
    n = lib.bic_scab_encode(_p(img_u8, ctypes.c_uint8), rows, cols,
                            tmpl, n_stripes, int(ramp), cp,
                            _p(out, ctypes.c_uint8), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def scab_decode(body: bytes, rows: int, cols: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros(rows * cols, dtype=np.uint8)
    rc = lib.bic_scab_decode(body, len(body), rows, cols,
                             _p(out, ctypes.c_uint8))
    if rc != 0:
        return None
    return out.reshape(rows, cols).astype(bool)


def scab_rans_decode(body: bytes, rows: int, cols: int
                     ) -> np.ndarray | None:
    """Decode the codec-13 mode-2 (static-table interleaved rANS) payload;
    None if the native lib is unavailable (Python twin takes over)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "bic_scab_rans_decode"):
        return None
    out = np.zeros(rows * cols, dtype=np.uint8)
    rc = lib.bic_scab_rans_decode(body, len(body), rows, cols,
                                  _p(out, ctypes.c_uint8))
    if rc != 0:
        return None
    return out.reshape(rows, cols).astype(bool)


def eg_encode_runs(runs: np.ndarray) -> bytes | None:
    """EG/MELCODE run-length payload for codec 10 (byte-aligned)."""
    lib = get_lib()
    if lib is None:
        return None
    runs = np.ascontiguousarray(runs, dtype=np.int64)
    cap = int(runs.sum()) // 4 + 8 * len(runs) + 4096
    out = np.zeros(cap, dtype=np.uint8)
    n = lib.bic_eg_encode_runs(_p(runs, ctypes.c_int64), len(runs),
                               _p(out, ctypes.c_uint8), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def eg_decode_runs(payload: bytes, n_pixels: int) -> np.ndarray | None:
    """Decode codec-10 run payload to the flat 0/1 residual plane."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros(n_pixels, dtype=np.uint8)
    rc = lib.bic_eg_decode_runs(payload, len(payload), n_pixels,
                                _p(out, ctypes.c_uint8))
    if rc != 0:
        return None
    return out


def encode_windowed(img: np.ndarray, header: bytes, codec_id: int,
                    strict: bool, W: int, T: int, R: int) -> bytes | None:
    """Full native encoder for codecs 4/6/7/8 (both modes)."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    rows, cols = img.shape
    cap = rows * cols + 65536
    out = np.zeros(cap, dtype=np.uint8)
    n = lib.bic_encode_windowed(_p(img, ctypes.c_uint8), header, len(header),
                                codec_id, int(strict), W, rows, cols, T, R,
                                _p(out, ctypes.c_uint8), cap)
    if n <= 0:
        return None
    return out[:n].tobytes()
