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

# ---- codec 13 (scab): adaptive modes 0/1 + the mode-2 rANS decoder ------
lib.bic_scab_encode.restype = ctypes.c_long
lib.bic_scab_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                ctypes.POINTER(ctypes.c_uint16),
                                u8p, ctypes.c_long]
lib.bic_scab_decode.restype = ctypes.c_int
lib.bic_scab_decode.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                ctypes.c_int, ctypes.c_int, u8p]
lib.bic_scab_rans_decode.restype = ctypes.c_int
lib.bic_scab_rans_decode.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                     ctypes.c_int, ctypes.c_int, u8p]

LOGIT64 = [1, 2, 2, 3, 4, 5, 6, 8, 10, 13, 17, 22, 29, 37, 48, 61,
           78, 101, 129, 164, 209, 266, 337, 424, 531, 659, 812, 990,
           1193, 1419, 1663, 1918, 2178, 2433, 2677, 2903, 3106, 3284,
           3437, 3565, 3672, 3759, 3830, 3887, 3932, 3967, 3995, 4018,
           4035, 4048, 4059, 4067, 4074, 4079, 4083, 4086, 4088, 4090,
           4091, 4092, 4093, 4094, 4094, 4095]


def scab_ctx10(u8, r, c, top, cols):
    def px(rr, cc):
        if rr < top or cc < 0 or cc >= cols:
            return 0
        return int(u8[rr, cc])
    return ((px(r-2, c-1) << 9) | (px(r-2, c) << 8) | (px(r-2, c+1) << 7)
            | (px(r-1, c-2) << 6) | (px(r-1, c-1) << 5) | (px(r-1, c) << 4)
            | (px(r-1, c+1) << 3) | (px(r-1, c+2) << 2)
            | (px(r, c-2) << 1) | px(r, c-1))


def rans_mode2_payload(img, n_stripes, n_lanes, q):
    """Reference-independent mode-2 payload builder (serial reverse rANS,
    tmpl 10, one global q code for every context — valid, if suboptimal)."""
    rows, cols = img.shape
    stripe_rows = -(-rows // n_stripes)
    n_stripes = -(-rows // stripe_rows)
    table = LOGIT64[q]
    body = bytearray()
    body += struct.pack("<BBHi", 10, 2, n_stripes, stripe_rows)
    body += struct.pack("<BBH", n_lanes, q, 0)
    body += struct.pack("<BBH", 1, 0, 0)     # Rice bitmap, zero entries
    blobs = []
    for s in range(n_stripes):
        top = s * stripe_rows
        bot = min(rows, top + stripe_rows)
        bits, ctxs = [], []
        for r in range(top, bot):
            for c in range(cols):
                ctxs.append(scab_ctx10(img, r, c, top, cols))
                bits.append(int(img[r, c]))
        states = [1 << 16] * n_lanes
        words = []
        for t in range(len(bits) - 1, -1, -1):
            lane = t % n_lanes
            x = states[lane]
            p1 = table
            f0 = 4096 - p1
            f, b = (p1, f0) if bits[t] else (f0, 0)
            if (x >> 20) >= f:
                words.append(x & 0xFFFF)
                x >>= 16
            x = ((x // f) << 12) + (x % f) + b
            states[lane] = x
        words.reverse()
        blob = b"".join(struct.pack("<I", st) for st in states)
        blob += b"".join(struct.pack(">H", w) for w in words)
        blobs.append(blob)
    for bl in blobs:
        body += struct.pack("<I", len(bl))
    for bl in blobs:
        body += bl
    return bytes(body)


for trial in range(6):
    rows = int(rng.randint(1, 48))
    cols = int(rng.randint(1, 48))
    img = (rng.rand(rows, cols) < rng.choice([0.1, 0.5])).astype(np.uint8)
    for tmpl in (10, 12):
        for ns in (1, 2):
            cap = rows * cols + 4 * ns + 4096
            out = np.zeros(cap, np.uint8)
            n = lib.bic_scab_encode(p(img), rows, cols, tmpl, ns, 1, None,
                                    p(out), cap)
            assert n > 0
            dec = np.zeros(rows * cols, np.uint8)
            rc = lib.bic_scab_decode(out[:n].tobytes(), n, rows, cols,
                                     p(dec))
            assert rc == 0 and (dec.reshape(rows, cols) == img).all()
            # truncated / corrupt must not crash
            lib.bic_scab_decode(out[:6].tobytes(), 6, rows, cols, p(dec))
            bad = bytearray(out[:n].tobytes())
            if len(bad) > 20:
                bad[15] ^= 0xFF
                lib.bic_scab_decode(bytes(bad), len(bad), rows, cols,
                                    p(dec))
    # mode-2 rANS: independently-built payload decodes bit-exactly
    body = rans_mode2_payload(img, 2, 4, q=int(rng.randint(10, 54)))
    dec = np.zeros(rows * cols, np.uint8)
    rc = lib.bic_scab_rans_decode(body, len(body), rows, cols, p(dec))
    assert rc == 0, "rans decode failed"
    assert (dec.reshape(rows, cols) == img).all(), "rans mismatch"
    # truncation + byte fuzz: error code or garbage, never a crash
    lib.bic_scab_rans_decode(body[:10], 10, rows, cols, p(dec))
    for _ in range(8):
        bad = bytearray(body)
        bad[int(rng.randint(len(bad)))] ^= 0xFF
        lib.bic_scab_rans_decode(bytes(bad), len(bad), rows, cols, p(dec))
print("sanitized native runtime: all round-trips clean (ASan+UBSan)")
PY
