"""Real bitstream codecs: bit-exact round-trip (the BASELINE.json acceptance
metric) and size tracking of the reference's own codelength estimates."""

import os

import numpy as np
import pytest

from binary_image_compression_tpu.models import codec, ref_parity as rp
from binary_image_compression_tpu.utils import pnm

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def load(name):
    return pnm.read_pbm(os.path.join(FIX, name))


@pytest.mark.parametrize("image", ["text64.pbm", "noise96x80.pbm",
                                   "ragged75x101.pbm"])
@pytest.mark.parametrize("cid", [2, 3, 4, 6, 7, 8, 10])
def test_roundtrip_bit_exact(image, cid):
    img = load(image)
    p = codec.CodecParams(codec=cid, W=8, R=32)
    blob = codec.encode(img, p)
    np.testing.assert_array_equal(codec.decode(blob), img)


@pytest.mark.parametrize("cid", [4, 7, 8])
def test_roundtrip_causal_mode(cid):
    img = load("text64.pbm")
    p = codec.CodecParams(codec=cid, W=8, R=32, strict=False)
    blob = codec.encode(img, p)
    np.testing.assert_array_equal(codec.decode(blob), img)


@pytest.mark.parametrize("image,W", [("text64.pbm", 8),
                                     ("ragged75x101.pbm", 16)])
def test_codec1_roundtrip(image, W):
    """Decodable codec 1 (bounded full-prior-area compress1 geometry,
    compress_test.cpp:81-111; DEVIATIONS.md 5 explains why the reference's
    own over-scanning enumeration is undecodable)."""
    img = load(image)
    blob = codec.encode(img, codec.CodecParams(codec=1, W=W))
    np.testing.assert_array_equal(codec.decode(blob), img)
    # the header must record causal mode regardless of the strict flag:
    # compress1 never substitutes residuals
    blob2 = codec.encode(img, codec.CodecParams(codec=1, W=W, strict=True))
    assert blob2 == blob and not (blob[9] & 1)


def test_codec1_search_matches_enumerated_oracle(rng):
    """_search_c1's closed-form rank arithmetic against a brute-force list
    enumeration of the same ascending scan (first strict min, d == 0 exit)."""
    W, M = 8, 64
    rows = cols = 40
    img = (rng.rand(rows, cols) < 0.3).astype(np.uint8)
    o1, S = codec._c1_tables(img, W)
    for i0, j0 in [(0, 0), (0, 16), (16, 0), (16, 16), (32, 24), (8, 8)]:
        cands = []
        for y in range(0, max(i0 - W + 1, 0)):
            for x in range(cols - W + 1):
                cands.append((y, x))
        if j0 >= W:
            for y in range(max(i0 - W + 1, 0), i0 + 1):
                for x in range(j0 - W + 1):
                    cands.append((y, x))
        assert codec.c1_candidate_count(i0, j0, W, cols) == len(cands)
        P = img[i0:i0 + W, j0:j0 + W].copy()
        r1, d1 = codec._search_c1(o1, S, P, i0, j0, W, cols, M)
        r2, d2, _ = codec._search(img, P, cands, M, 0, False)
        assert (r1, d1) == ((r2, d2) if r2 is not None else (None, M + 1))
        if r1 is not None:
            assert codec._c1_rank_to_pos(r1, i0, j0, W, cols) == cands[r1]


def test_codec1_full_area_beats_windowed_on_distant_repeats():
    """codec 1's unbounded search must find a repeat that codec 4's radius
    cannot reach (the geometry is really full-prior-area)."""
    rng = np.random.RandomState(11)
    img = np.zeros((96, 96), dtype=bool)
    stamp = rng.rand(8, 8) < 0.5
    img[0:8, 0:8] = stamp
    img[88:96, 88:96] = stamp          # repeat far outside any R=8 window
    b1 = len(codec.encode(img, codec.CodecParams(codec=1, W=8)))
    b4 = len(codec.encode(img, codec.CodecParams(codec=4, W=8, R=8,
                                                 strict=False)))
    assert b1 < b4


def test_roundtrip_degenerate_images():
    for img in (np.zeros((32, 32), bool), np.ones((32, 32), bool),
                np.zeros((8, 8), bool)):
        for cid in (8, 10):
            blob = codec.encode(img, codec.CodecParams(codec=cid, W=8, R=16))
            np.testing.assert_array_equal(codec.decode(blob), img)


def test_search_fast_matches_serial(rng):
    W, M, T = 8, 64, 2
    work = (rng.rand(64, 64) < 0.3).astype(np.uint8)
    for i0, j0 in [(16, 16), (8, 40), (56, 0), (0, 24)]:
        P = work[i0:i0 + W, j0:j0 + W].copy()
        cands = codec.window_candidates(i0, j0, W, 32, 64, 64)
        for invert in (False, True):
            a = codec._search(work, P, cands, M, T, invert)
            b = codec._search_fast(work, P, cands, M, T, invert, W)
            assert a == b


def test_real_size_tracks_reference_estimate():
    """The real bitstream lands within ~5% of the reference's own codelength
    arithmetic (it can beat the estimate: mode decisions use true bit
    costs)."""
    img = load("text256.pbm")
    est_bytes = rp.compress8(img, W=16, R=128)["final"]["comp_bytes"]
    blob = codec.encode(img, codec.CodecParams(codec=8, W=16, R=128))
    assert (codec.decode(blob) == img).all()
    assert len(blob) < est_bytes * 1.06
    assert len(blob) < img.size / 8 * 0.65  # genuinely compresses


def test_header_rejects_garbage():
    with pytest.raises(ValueError):
        codec.decode(b"NOPE" + b"\x00" * 40)


def test_encode_rejects_bad_tile_width():
    img = np.zeros((32, 32), bool)
    for W in (0, 65, 128, 65535):
        with pytest.raises(ValueError, match="tile width"):
            codec.encode(img, codec.CodecParams(codec=8, W=W))


def test_decode_rejects_corrupt_header_fields():
    """Untrusted header fields (W=0/oversized, absurd dims) must raise
    ValueError, not SIGFPE/std::terminate in the native decoder."""
    import struct
    img = load("text64.pbm")
    blob = codec.encode(img, codec.CodecParams(codec=8, W=8, R=32))
    for off, val in ((10, struct.pack("<H", 0)),      # W = 0
                     (10, struct.pack("<H", 65535)),  # W overflow
                     (12, struct.pack("<I", 0)),      # rows = 0
                     (12, struct.pack("<I", 0xFFFFFFFF)),
                     (16, struct.pack("<I", 0xFFFFFFFF)),
                     (8, b"\x2a")):                   # unknown codec id
        bad = bytearray(blob)
        bad[off:off + len(val)] = val
        with pytest.raises(ValueError):
            codec.decode(bytes(bad))


def test_match_cost_uses_actual_header_bits():
    """Codecs 4/6 write only the match bit for a match record; the mode
    decision must charge 1 bit (not 2) so matches are not under-selected
    (ADVICE r1).  Encoder/decoder pairs stay bit-exact either way."""
    img = load("text256.pbm")
    for cid in (4, 6):
        p = codec.CodecParams(codec=cid, W=8, R=32)
        blob = codec.encode(img, p)
        np.testing.assert_array_equal(codec.decode(blob), img)
        # native and pure-python encoders agree on the new costs
        py = codec._encode_windowed(img, p, use_native=False)
        assert blob == py


def test_codec1_decode_rejects_corrupt_header_and_rank():
    """ADVICE r4: codec 1 must share the decode-side W guard (W=0 divided
    by zero; huge W was an allocation bomb), and a decoded candidate rank
    past the closed-form candidate count must raise a clean corrupt-stream
    ValueError instead of ZeroDivisionError in _c1_rank_to_pos."""
    import struct
    from binary_image_compression_tpu.ops.bitstream import BitWriter
    img = load("text64.pbm")
    blob = codec.encode(img, codec.CodecParams(codec=1, W=8, R=0))
    np.testing.assert_array_equal(codec.decode(blob), img)
    for val in (struct.pack("<H", 0), struct.pack("<H", 65535)):
        bad = bytearray(blob)
        bad[10:12] = val
        with pytest.raises(ValueError):
            codec.decode(bytes(bad))
    # hand-crafted stream: tile (0,0) has ZERO codec-1 candidates, so a
    # match record there implies rank >= n_cands immediately
    p = codec.CodecParams(codec=1, W=8, R=0, strict=False)
    w = BitWriter()
    hdr = codec._header(p, 32, 32, 0)
    w.write_bits(int.from_bytes(hdr, "big"), len(hdr) * 8)
    w.write_bits(1, 1)          # match at tile (0,0): impossible
    w.write_bits(0, 31)         # padding so reads don't run dry first
    with pytest.raises(ValueError, match="corrupt|integrity"):
        codec.decode(w.getvalue(), verify_crc=False)


def test_corruption_detected_by_crc():
    img = load("text64.pbm")
    blob = bytearray(codec.encode(img, codec.CodecParams(codec=8, W=8, R=32)))
    blob[100] ^= 0xFF
    with pytest.raises(ValueError, match="integrity"):
        codec.decode(bytes(blob))


@pytest.mark.parametrize("backend", ["host"])
def test_bsvd_codec_roundtrip(backend):
    img = load("text64.pbm")
    p = codec.CodecParams(codec=11, W=8)
    blob = codec.encode(img, p, K=16, learn_backend="tpu")
    np.testing.assert_array_equal(codec.decode(blob), img)


def test_archive_roundtrip():
    from binary_image_compression_tpu.models import archive
    pages = [load("text64.pbm"),
             np.roll(load("text64.pbm"), 5, axis=0),
             load("noise96x80.pbm")]  # mixed shapes
    p = codec.CodecParams(codec=8, W=8, R=32, strict=False)
    blob = archive.encode_archive(pages, p, batch_size=2)
    assert archive.page_count(blob) == 3
    for i, pg in enumerate(pages):
        np.testing.assert_array_equal(archive.decode_page(blob, i), pg)


def test_cabic_roundtrip_all_fixtures():
    for name in ("text64.pbm", "text256.pbm", "noise96x80.pbm",
                 "ragged75x101.pbm", "sparse128.pbm"):
        img = load(name)
        p = codec.CodecParams(codec=12, W=0, T=0, R=0)
        blob = codec.encode(img, p)
        np.testing.assert_array_equal(codec.decode(blob), img)


def test_cabic_beats_windowed_on_documents():
    img = load("text256.pbm")
    c8 = codec.encode(img, codec.CodecParams(codec=8, W=16, R=128,
                                             strict=False))
    c12 = codec.encode(img, codec.CodecParams(codec=12, W=0, T=0, R=0))
    assert len(c12) < len(c8)


def test_cabic_python_twin_matches_native():
    from binary_image_compression_tpu import native
    if native.get_lib() is None:
        pytest.skip("no native lib")
    img = load("text64.pbm")
    from binary_image_compression_tpu.ops.entropy import (RangeEncoder,
                                                          cabac_model_update)
    from binary_image_compression_tpu.models.codec import _ctx_template
    prob = [0x8000] * 1024
    rc = RangeEncoder()
    u8 = img.astype(np.uint8)
    for r in range(img.shape[0]):
        for c in range(img.shape[1]):
            ctx = _ctx_template(u8, r, c, *img.shape)
            rc.encode_bit(prob[ctx], int(u8[r, c]))
            prob[ctx] = cabac_model_update(prob[ctx], int(u8[r, c]))
    assert rc.finish() == native.cabic_encode(u8)
    # python decode of the native stream
    blob = codec.encode(img, codec.CodecParams(codec=12, W=0, T=0, R=0))
    from binary_image_compression_tpu.models.codec import (_decode_cabic,
                                                           HEADER_LEN)
    import binary_image_compression_tpu.native as nat
    real = nat.cabic_decode
    nat.cabic_decode = lambda *a: None  # force python path
    try:
        out = _decode_cabic(blob[HEADER_LEN:], *img.shape)
    finally:
        nat.cabic_decode = real
    np.testing.assert_array_equal(out, img)


def test_pgm_tpu_backend_matches_host(rng):
    gray = (np.abs(np.cumsum(rng.randn(96, 128), axis=1)) * 9).astype(
        np.uint32) % 256
    p10 = codec.CodecParams(codec=10, W=0, T=0, R=0)
    host = codec.encode_pgm(gray, 255, p10)
    tpu = codec.encode_pgm(gray, 255, p10, backend="tpu")
    assert host == tpu  # device MED + native EG == host path, byte-exact
    back, maxval = codec.decode_pgm(tpu)
    assert maxval == 255
    np.testing.assert_array_equal(back, gray)


def test_ppm_color_roundtrip(rng):
    y, x = np.mgrid[0:32, 0:40]
    rgb = ((((y + x) % 256).astype(np.uint32) << 16)
           | ((x % 256).astype(np.uint32) << 8)
           | (rng.randint(0, 256, (32, 40)).astype(np.uint32)))
    blob = codec.encode_ppm(rgb, 255)
    back, mv = codec.decode_ppm(blob)
    np.testing.assert_array_equal(back, rgb)
    assert mv == 255


# ---------------------------------------------------------------------------
# codec 13: stripe-parallel context-adaptive arithmetic coding
# ---------------------------------------------------------------------------

def test_scab_roundtrip_all_fixtures():
    for name in ("text64.pbm", "text256.pbm", "noise96x80.pbm",
                 "ragged75x101.pbm", "sparse128.pbm"):
        img = load(name)
        for tmpl in (10, 12):
            p = codec.CodecParams(codec=13, W=tmpl, T=0, R=0)
            blob = codec.encode(img, p)
            np.testing.assert_array_equal(codec.decode(blob), img)


def test_scab_beats_cabic_ratio():
    """The 12-bit template + count-ramped adaptation must beat codec 12
    even when striped (the r2 ratio crown, VERDICT item 7)."""
    img = load("text256.pbm")
    c12 = codec.encode(img, codec.CodecParams(codec=12, W=0, T=0, R=0))
    c13 = codec.encode(img, codec.CodecParams(codec=13, W=12, T=2, R=0))
    assert len(c13) < len(c12)


def test_scab_python_twin_matches_native():
    """Byte parity of the pure-Python twin (encoder AND decoder) with the
    native threaded stripe coder, both templates."""
    from binary_image_compression_tpu import native
    if native.get_lib() is None:
        pytest.skip("no native lib")
    import binary_image_compression_tpu.native as nat
    img = load("ragged75x101.pbm")
    for tmpl in (10, 12):
        p = codec.CodecParams(codec=13, W=tmpl, T=3, R=0)
        b_native = codec.encode(img, p)
        real_e, real_d = nat.scab_encode, nat.scab_decode
        nat.scab_encode = lambda *a, **k: None  # force python twin
        nat.scab_decode = lambda *a, **k: None
        try:
            assert codec.encode(img, p) == b_native
            np.testing.assert_array_equal(codec.decode(b_native), img)
        finally:
            nat.scab_encode, nat.scab_decode = real_e, real_d


def test_scab_device_ctx_matches_incremental():
    """The TPU context map (shifted planes, stripe-top masking) must yield
    byte-identical streams to the host incremental scan."""
    from binary_image_compression_tpu.models import compress
    for name, T in [("text64.pbm", 2), ("ragged75x101.pbm", 3)]:
        img = load(name)
        for tmpl in (10, 12):
            p = codec.CodecParams(codec=13, W=tmpl, T=T, R=0)
            assert compress.encode_scab(img, p) == codec.encode(img, p)


def test_scab_stripes_are_independent_streams():
    """Corrupting one stripe's payload must not change the pixels any OTHER
    stripe decodes (the parallel-decode contract)."""
    img = load("text256.pbm")
    p = codec.CodecParams(codec=13, W=12, T=4, R=0)
    blob = bytearray(codec.encode(img, p))
    import struct as st
    body_off = codec.HEADER_LEN
    n_stripes = blob[body_off + 2] | (blob[body_off + 3] << 8)
    stripe_rows = st.unpack("<i", blob[body_off + 4:body_off + 8])[0]
    lens = st.unpack(f"<{n_stripes}I",
                     blob[body_off + 8:body_off + 8 + 4 * n_stripes])
    # flip a byte in the middle of stripe 1's stream
    s1 = body_off + 8 + 4 * n_stripes + lens[0] + lens[1] // 2
    blob[s1] ^= 0xFF
    out = codec.decode(bytes(blob), verify_crc=False)
    rows = img.shape[0]
    np.testing.assert_array_equal(out[:stripe_rows], img[:stripe_rows])
    np.testing.assert_array_equal(out[2 * stripe_rows:],
                                  img[2 * stripe_rows:])
    assert (out[stripe_rows:2 * stripe_rows]
            != img[stripe_rows:2 * stripe_rows]).any()


def test_scab_corrupt_payload_raises():
    img = load("text64.pbm")
    blob = codec.encode(img, codec.CodecParams(codec=13, W=12, T=2, R=0))
    # truncate inside the stripe table
    with pytest.raises(ValueError):
        codec.decode(blob[:codec.HEADER_LEN + 3])
    # CRC catches stream damage
    bad = bytearray(blob)
    bad[-3] ^= 0x40
    with pytest.raises(ValueError):
        codec.decode(bytes(bad))


# ---------------------------------------------------------------------------
# codec 13 mode 2: device-assembled static-table interleaved rANS
# ---------------------------------------------------------------------------

def _twin_rans_decode(blob, shape):
    """Force the pure-Python mode-2 decoder (native disabled)."""
    from binary_image_compression_tpu import native as nat
    orig = nat.scab_rans_decode
    nat.scab_rans_decode = lambda *a, **k: None
    try:
        return codec._decode_scab_rans(blob[codec.HEADER_LEN:], *shape)
    finally:
        nat.scab_rans_decode = orig


def test_scab_rans_roundtrip_and_twin_parity():
    """The device-path payload (mode 2) round-trips bit-exactly through
    both the native C++ decoder and the Python twin, for both templates
    and several stripe counts (VERDICT r4 item 1)."""
    from binary_image_compression_tpu.models import compress
    for name in ("text256.pbm", "ragged75x101.pbm"):
        img = load(name)
        for tmpl, T in ((10, 0), (12, 2), (12, 4)):
            p = codec.CodecParams(codec=13, W=tmpl, T=T, R=0)
            blob = compress.encode_scab(img, p, entropy="device")
            assert blob[codec.HEADER_LEN + 1] == 2  # mode byte
            np.testing.assert_array_equal(codec.decode(blob), img)
            np.testing.assert_array_equal(
                _twin_rans_decode(blob, img.shape), img)


def test_scab_rans_edge_geometries():
    """Degenerate shapes: constant pages (prob clamps), single row, pixels
    fewer than lanes, ragged stripe tails — exact-no-op padding must never
    leak into decoded pixels."""
    from binary_image_compression_tpu.models import compress
    rng = np.random.RandomState(7)
    cases = [np.zeros((33, 65), bool), np.ones((16, 16), bool),
             rng.rand(1, 7) < 0.5, rng.rand(129, 67) < 0.93,
             np.eye(50, dtype=bool)]
    for img in cases:
        p = codec.CodecParams(codec=13, W=0, T=2, R=0)
        blob = compress.encode_scab(np.asarray(img), p, entropy="device")
        np.testing.assert_array_equal(codec.decode(blob), np.asarray(img))


def test_scab_rans_ratio_competitive():
    """The semi-adaptive static table must stay within a few percent of the
    host adaptive coder (on doc-class pages it actually WINS: the two-pass
    table beats adaptive warm-up)."""
    img = load("text256.pbm")
    from binary_image_compression_tpu.models import compress
    p = codec.CodecParams(codec=13, W=0, T=0, R=0)
    dev = compress.encode_scab(img, p, entropy="device")
    host = codec.encode(img, p)
    assert (codec.decode(dev) == img).all()
    assert len(dev) < len(host) * 1.10
    assert len(dev) < img.size / 8 * 0.8  # genuinely compresses


def test_scab_rans_corrupt_streams():
    """Corrupt mode-2 payloads raise ValueError (header validation or CRC),
    never crash — table section, stripe lengths, stream bytes."""
    from binary_image_compression_tpu.models import compress
    img = load("text64.pbm")
    p = codec.CodecParams(codec=13, W=0, T=2, R=0)
    blob = compress.encode_scab(img, p, entropy="device")
    rng = np.random.RandomState(3)
    for _ in range(25):
        bad = bytearray(blob)
        bad[rng.randint(codec.HEADER_LEN, len(bad))] ^= 0xFF
        try:
            out = codec.decode(bytes(bad))
        except ValueError:
            continue
        # flips landing in section pad bits are semantically dead: the
        # decode must then be EXACTLY the original (CRC verified)
        np.testing.assert_array_equal(out, img)
    with pytest.raises(ValueError):
        codec.decode(blob[:codec.HEADER_LEN + 20])


def test_scab_rans_custom_lane_count():
    """The lane count is a header field: payloads written with non-default
    n_lanes decode through both the native decoder and the twin."""
    from binary_image_compression_tpu.models import compress
    from binary_image_compression_tpu.models.codec import scab_defaults
    img = load("text64.pbm")
    p = codec.CodecParams(codec=13, W=0, T=2, R=0)
    tmpl, ns = scab_defaults(p, img.shape[0])
    sr = -(-img.shape[0] // ns)
    for nl in (4, 8, 64):
        blob = compress._encode_scab_device(img, p, tmpl, ns, sr,
                                            n_lanes=nl)
        assert blob[codec.HEADER_LEN + 8] == nl
        np.testing.assert_array_equal(codec.decode(blob), img)
        np.testing.assert_array_equal(
            _twin_rans_decode(blob, img.shape), img)


def test_pgm_tpu_rans_backend():
    """encode_pgm(backend="tpu-rans"): every plane coded as a mode-2 rANS
    stream by one vmapped device jit; decodes through the standard path."""
    rng = np.random.RandomState(4)
    img = rng.rand(128, 96) < 0.3
    gray = (np.cumsum(img, axis=1) * 5 % 256).astype(np.uint32)
    blob = codec.encode_pgm(gray, 255, backend="tpu-rans")
    g2, mv = codec.decode_pgm(blob)
    assert mv == 255
    np.testing.assert_array_equal(g2, gray)
    # per-plane streams really are mode 2
    import struct as st
    nplanes, gflag, maxval = st.unpack("<BBH", blob[4:8])
    lens = st.unpack(f"<{nplanes}I", blob[8:8 + 4 * nplanes])
    off = 8 + 4 * nplanes
    for ln in lens:
        assert blob[off + codec.HEADER_LEN + 1] == 2
        off += ln
