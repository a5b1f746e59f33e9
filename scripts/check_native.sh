#!/bin/bash
# Build the native runtime with ASan+UBSan and drive every entry point
# through round-trips (the 'sanitizers' aux subsystem of SURVEY.md §5; the
# C++ is single-threaded by design, so memory safety + UB are the checks
# that matter).  Drives the lib via bare ctypes — no jax import (ASan under
# LD_PRELOAD flags unrelated jaxlib/nanobind internals otherwise).
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O1 -g -fsanitize=address,undefined -fno-sanitize-recover=all \
    -shared -fPIC -o /tmp/libbic_native_asan.so native/bic_native.cpp
ASAN_SO=$(g++ -print-file-name=libasan.so)
LD_PRELOAD="$ASAN_SO" ASAN_OPTIONS=detect_leaks=0 python - <<'PY'
import ctypes
import struct
import zlib
import numpy as np

lib = ctypes.CDLL("/tmp/libbic_native_asan.so")
u8p = ctypes.POINTER(ctypes.c_uint8)
lib.bic_encode_windowed.restype = ctypes.c_long
lib.bic_encode_windowed.argtypes = [u8p, ctypes.c_char_p, ctypes.c_long,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_uint32, ctypes.c_uint32,
                                    ctypes.c_uint32, ctypes.c_uint32,
                                    u8p, ctypes.c_long]
lib.bic_decode_windowed.restype = ctypes.c_int
lib.bic_decode_windowed.argtypes = [ctypes.c_char_p, ctypes.c_long, u8p]
lib.bic_cabic_encode.restype = ctypes.c_long
lib.bic_cabic_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p,
                                 ctypes.c_long]
lib.bic_cabic_decode.restype = ctypes.c_int
lib.bic_cabic_decode.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                 ctypes.c_int, ctypes.c_int, u8p]
lib.bic_enum_roundtrip.restype = ctypes.c_long
lib.bic_enum_roundtrip.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]


def p(a):
    return a.ctypes.data_as(u8p)


def header(codec, strict, W, rows, cols, T, R, crc):
    return b"BIC1" + struct.pack("<IBBHIIII", crc, codec, strict, W,
                                 rows, cols, T, R)


rng = np.random.RandomState(0)
for trial in range(12):
    rows = int(rng.randint(1, 80))
    cols = int(rng.randint(1, 80))
    img = (rng.rand(rows, cols) < rng.choice([0.05, 0.3, 0.7])).astype(np.uint8)
    crc = zlib.crc32(np.packbits(img.astype(bool)).tobytes())
    # windowed codecs
    for cid in (4, 6, 7, 8):
        strict = int(rng.randint(2))
        hdr = header(cid, strict, 8, rows, cols, 2, 16, crc)
        cap = rows * cols + 65536
        out = np.zeros(cap, np.uint8)
        n = lib.bic_encode_windowed(p(img), hdr, len(hdr), cid, strict, 8,
                                    rows, cols, 2, 16, p(out), cap)
        assert n > 0
        dec = np.zeros(rows * cols, np.uint8)
        rc = lib.bic_decode_windowed(out[:n].tobytes(), n, p(dec))
        assert rc == 0 and (dec.reshape(rows, cols) == img).all(), \
            (trial, cid, strict)
        # corrupt-stream decode must not crash
        bad = bytearray(out[:n].tobytes())
        if len(bad) > 40:
            bad[35] ^= 0xFF
            lib.bic_decode_windowed(bytes(bad), len(bad), p(dec))
        # truncated
        lib.bic_decode_windowed(out[:30].tobytes(), 30, p(dec))
        # header-field corruption: W=0 (div-by-zero), W=65535 (M overflow),
        # huge rows/cols (allocation bombs) must all return an error code
        for off, val in ((10, b"\x00\x00"), (10, b"\xff\xff"),
                         (12, b"\xff\xff\xff\xff"),
                         (16, b"\xff\xff\xff\xff")):
            bad = bytearray(out[:n].tobytes())
            bad[off:off + len(val)] = val
            rc = lib.bic_decode_windowed(bytes(bad), len(bad), p(dec))
            assert rc != 0, ("header fuzz accepted", off)
        # encoder must reject out-of-range W instead of smashing the stack
        for badW in (0, 65, 128):
            hdrb = header(cid, strict, badW, rows, cols, 2, 16, crc)
            assert lib.bic_encode_windowed(p(img), hdrb, len(hdrb), cid,
                                           strict, badW, rows, cols, 2, 16,
                                           p(out), cap) < 0
    # cabic
    cap = rows * cols + 4096
    out = np.zeros(cap, np.uint8)
    n = lib.bic_cabic_encode(p(img), rows, cols, p(out), cap)
    dec = np.zeros(rows * cols, np.uint8)
    lib.bic_cabic_decode(out[:n].tobytes(), n, rows, cols, p(dec))
    assert (dec.reshape(rows, cols) == img).all()
    # enum rank/unrank
    n_ = int(rng.randint(1, 300))
    w_ = int(rng.randint(0, n_ + 1))
    bits = np.zeros(n_, np.uint8)
    bits[rng.choice(n_, w_, replace=False)] = 1
    o2 = np.zeros(n_, np.uint8)
    lib.bic_enum_roundtrip(p(bits), n_, w_, p(o2))
    assert (o2 == bits).all()
print("sanitized native runtime: all round-trips clean (ASan+UBSan)")
PY
