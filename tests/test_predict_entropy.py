"""MED predictor invertibility + entropy estimator/coder behavior."""

import math

import numpy as np
import pytest

from binary_image_compression_tpu.ops import bitpack as bp
from binary_image_compression_tpu.ops import predict, entropy, bitstream


SHAPES = [(1, 1), (4, 4), (16, 16), (17, 33), (32, 64), (40, 100)]


@pytest.mark.parametrize("shape", SHAPES)
def test_med_matches_reference_loop(rng, shape):
    p = rng.rand(*shape) < 0.4
    packed = bp.pack(p)
    r = predict.med_forward(packed, shape[1])
    expect = predict.np_med_forward(p)
    np.testing.assert_array_equal(np.asarray(bp.unpack(r, shape[1])), expect)
    # origin_zero mirrors the reference's zero-heap unwritten pP(0,0)
    r0 = predict.med_forward(packed, shape[1], origin_zero=True)
    e0 = expect.copy()
    e0[0, 0] = False
    np.testing.assert_array_equal(np.asarray(bp.unpack(r0, shape[1])), e0)


@pytest.mark.parametrize("shape", SHAPES)
def test_med_inverse_roundtrip(rng, shape):
    p = rng.rand(*shape) < 0.3
    packed = bp.pack(p)
    r = predict.med_forward(packed, shape[1])
    back = predict.med_inverse(r, shape[1])
    np.testing.assert_array_equal(np.asarray(back), np.asarray(packed))
    # dense oracle agrees
    np.testing.assert_array_equal(
        predict.np_med_inverse(predict.np_med_forward(p)), p)


def test_med_batched(rng):
    p = rng.rand(8, 16, 16) < 0.5
    packed = bp.pack(p)
    r = predict.med_forward(packed, 16)
    np.testing.assert_array_equal(np.asarray(bp.unpack(r, 16)),
                                  predict.np_med_forward(p))
    np.testing.assert_array_equal(np.asarray(predict.med_inverse(r, 16)),
                                  np.asarray(packed))


def test_predictor_matrices_invert_and_match_med():
    M = 25
    D, iD = predict.predictor_matrices(M)
    prod = bp.mul(D, M, False, iD, M, False)
    expect = np.eye(M, dtype=bool)
    np.testing.assert_array_equal(np.asarray(bp.unpack(prod, M)), expect)


def test_enum_codelength_formula():
    # enumL(n, r) == log2 C(n, r) (reference coding.cpp:19-22)
    assert entropy.enum_codelength(10, 0) == 0.0
    got = entropy.enum_codelength(256, 32)
    expect = (math.lgamma(257) - math.lgamma(33) - math.lgamma(225)) \
        * entropy.COSMOS_LOG2E
    assert got == expect
    # jnp twin close (f32)
    import jax.numpy as jnp
    j = float(entropy.enum_codelength_jnp(256, 32))
    assert abs(j - expect) < 1e-2


def test_universal_codelength():
    assert entropy.universal_codelength(100, 0) == 0.5 * math.log2(100)
    v = entropy.universal_codelength(100, 30)
    h = -(0.3 * math.log2(0.3) + 0.7 * math.log2(0.7))
    assert abs(v - (100 * h + 0.5 * math.log2(100))) < 1e-12


def test_golomb_coder_reference_semantics():
    g = entropy.GolombCoder()
    # first sample with k=1: bits = 1 + (u >> 1) + 1
    n = g.code_sample(5)
    assert n == 1 + (5 >> 1) + 1
    # k after: smallest k with (1 << k) >= 5 -> k = 3
    assert g.k == 3
    g2 = entropy.GolombCoder()
    for u in [0, 0, 1, 7, 3, 200, 0, 15]:
        g2.code_sample(u)
    # scan twin agrees with the serial coder
    import jax.numpy as jnp
    lens, total = entropy.golomb_scan(jnp.array([0, 0, 1, 7, 3, 200, 0, 15]))
    assert int(total) == g2.bitcount


def test_eg_coder_shipped_semantics():
    # as shipped: blockSize stays 1 (inc commented out), so full-block part
    # is unary; first non-eol remainder costs g+1 = 2 then g drops to 0
    c = entropy.EGCoder()
    c.code_run(3, eol=False)
    assert c.bitcount == 3 + 2  # 3 unary + (g=1)+1
    c.code_run(3, eol=False)
    assert c.bitcount == 5 + 3 + 1  # g now 0
    c2 = entropy.EGCoder()
    c2.code_run(4, eol=True)
    assert c2.bitcount == 5


def test_eg_adaptive_grows():
    c = entropy.EGCoder(adaptive=True)
    c.code_run(100, eol=False)
    assert c.bitcount < 100  # block growth beats unary


def test_bitwriter_reader_roundtrip(rng):
    w = bitstream.BitWriter()
    vals = [(rng.randint(0, 1 << b), b) for b in rng.randint(1, 25, size=50)]
    for v, b in vals:
        w.write_bits(v, b)
    data = w.getvalue()
    r = bitstream.BitReader(data)
    for v, b in vals:
        assert r.read_bits(b) == v


def test_golomb_code_roundtrip(rng):
    w = bitstream.BitWriter()
    g = entropy.GolombCoder()
    samples = list(rng.randint(0, 300, size=100))
    ks = []
    for u in samples:
        ks.append(g.k)
        bitstream.golomb_encode(w, int(u), g.k)
        g.code_sample(int(u))
    assert w.bitcount == g.bitcount  # real stream matches the estimator
    r = bitstream.BitReader(w.getvalue())
    g2 = entropy.GolombCoder()
    for u in samples:
        assert bitstream.golomb_decode(r, g2.k) == u
        g2.code_sample(int(u))


def test_enumerative_roundtrip(rng):
    for n, wt in [(16, 0), (16, 16), (256, 1), (256, 37), (100, 50)]:
        bits = np.zeros(n, dtype=bool)
        bits[rng.choice(n, size=wt, replace=False)] = True
        bw = bitstream.BitWriter()
        bitstream.enum_encode(bw, bits)
        assert bw.bitcount == bitstream.enum_nbits(n, wt)
        # integer bits are within 1 bit of the real-valued estimate
        assert bw.bitcount <= entropy.enum_codelength(n, wt) + 1
        r = bitstream.BitReader(bw.getvalue())
        out = bitstream.enum_decode(r, n, wt)
        np.testing.assert_array_equal(out, bits)


def test_pack_varlen_matches_bitwriter(rng):
    import jax.numpy as jnp
    n = 200
    lens = rng.randint(1, 33, size=n).astype(np.uint32)
    vals = np.array([rng.randint(0, 1 << min(l, 31)) for l in lens],
                    dtype=np.uint32)
    total_bits = int(lens.sum())
    words, tb = bitstream.pack_varlen(jnp.asarray(vals), jnp.asarray(lens),
                                      (total_bits + 31) // 32)
    assert int(tb) == total_bits
    got = bitstream.words_to_bytes(np.asarray(words), total_bits)
    w = bitstream.BitWriter()
    for v, l in zip(vals, lens):
        w.write_bits(int(v), int(l))
    assert got == w.getvalue()
