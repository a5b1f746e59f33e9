"""Property tests for the bit-packed core vs a dense-bool NumPy oracle.

This is the conformance checklist of SURVEY.md §2.1 (binmat ops), with the
reference's known defects fixed (col_weight bound, get_transposed shape,
mul_AtBt stub)."""

import numpy as np
import jax.numpy as jnp
import pytest

from binary_image_compression_tpu.ops import bitpack as bp


SHAPES = [(1, 1), (3, 2), (8, 32), (5, 33), (16, 64), (7, 100), (33, 129)]


def rand_bits(rng, shape, p=0.4):
    return rng.rand(*shape) < p


@pytest.mark.parametrize("shape", SHAPES)
def test_pack_unpack_roundtrip(rng, shape):
    bits = rand_bits(rng, shape)
    packed = bp.pack(bits)
    assert packed.dtype == jnp.uint32
    assert packed.shape == (shape[0], bp.nwords(shape[1]))
    out = np.asarray(bp.unpack(packed, shape[1]))
    np.testing.assert_array_equal(out, bits)
    # numpy twin agrees with jax path
    np.testing.assert_array_equal(np.asarray(packed), bp.np_pack(bits))
    np.testing.assert_array_equal(bp.np_unpack(bp.np_pack(bits), shape[1]), bits)


def test_pack_is_msb_first():
    bits = np.zeros((1, 9), dtype=bool)
    bits[0, 0] = True   # col 0 -> MSB of word 0
    bits[0, 8] = True   # col 8 -> bit 23
    packed = np.asarray(bp.pack(bits))
    assert packed[0, 0] == (1 << 31) | (1 << 23)


@pytest.mark.parametrize("shape", SHAPES)
def test_weights_and_sums(rng, shape):
    bits = rand_bits(rng, shape)
    p = bp.pack(bits)
    assert int(bp.weight(p)) == bits.sum()
    np.testing.assert_array_equal(np.asarray(bp.row_weight(p)),
                                  bits.sum(axis=1))
    np.testing.assert_array_equal(np.asarray(bp.col_weight(p, shape[1])),
                                  bits.sum(axis=0))
    assert int(bp.gf2_sum(p)) == bits.sum() % 2
    np.testing.assert_array_equal(np.asarray(bp.row_sum(p)),
                                  bits.sum(axis=1) % 2)
    colsum_bits = np.asarray(bp.unpack(bp.col_sum(p), shape[1]))[0]
    np.testing.assert_array_equal(colsum_bits, bits.sum(axis=0) % 2 == 1)


@pytest.mark.parametrize("shape", SHAPES)
def test_elementwise_and_dist(rng, shape):
    a = rand_bits(rng, shape)
    b = rand_bits(rng, shape)
    pa, pb = bp.pack(a), bp.pack(b)
    np.testing.assert_array_equal(np.asarray(bp.unpack(bp.xor(pa, pb), shape[1])), a ^ b)
    np.testing.assert_array_equal(np.asarray(bp.unpack(bp.bool_and(pa, pb), shape[1])), a & b)
    np.testing.assert_array_equal(np.asarray(bp.unpack(bp.flip(pa, shape[1]), shape[1])), ~a)
    # flip keeps padding clean: weight of flipped == size - weight
    assert int(bp.weight(bp.flip(pa, shape[1]))) == a.size - a.sum()
    assert int(bp.dist(pa, pb)) == (a ^ b).sum()


@pytest.mark.parametrize("at", [False, True])
@pytest.mark.parametrize("bt", [False, True])
def test_gf2_matmul_all_variants(rng, at, bt):
    # includes mul_AtBt, which the reference never implemented (binmat.cpp:596)
    n, k, m = 13, 37, 29
    A = rand_bits(rng, (k, n) if at else (n, k))
    B = rand_bits(rng, (m, k) if bt else (k, m))
    pa, pb = bp.pack(A), bp.pack(B)
    C = bp.mul(pa, A.shape[1], at, pb, B.shape[1], bt)
    Ad = A.T if at else A
    Bd = B.T if bt else B
    expect = (Ad.astype(np.int64) @ Bd.astype(np.int64)) % 2
    np.testing.assert_array_equal(np.asarray(bp.unpack(C, m)), expect.astype(bool))


def test_dist_matrix_and_counts(rng):
    n, m, cols = 17, 23, 77
    A = rand_bits(rng, (n, cols))
    B = rand_bits(rng, (m, cols))
    pa, pb = bp.pack(A), bp.pack(B)
    ac = np.asarray(bp.and_counts(pa, pb, cols))
    expect_and = A.astype(np.int32) @ B.astype(np.int32).T
    np.testing.assert_array_equal(ac, expect_and)
    dm = np.asarray(bp.dist_matrix(pa, pb, cols))
    expect_d = (A[:, None, :] ^ B[None, :, :]).sum(axis=-1)
    np.testing.assert_array_equal(dm, expect_d)


def test_transpose_nonsquare(rng):
    bits = rand_bits(rng, (5, 70))
    p = bp.pack(bits)
    t = bp.transpose(p, 5, 70)
    np.testing.assert_array_equal(np.asarray(bp.unpack(t, 5)), bits.T)


def test_submatrix_get_set(rng):
    bits = rand_bits(rng, (40, 90))
    p = bp.pack(bits)
    sub = bp.submatrix(p, 3, 19, 33, 65, 90)
    np.testing.assert_array_equal(np.asarray(bp.unpack(sub, 32)),
                                  bits[3:19, 33:65])
    sub2 = bp.pack(rand_bits(np.random.RandomState(7), (16, 32)))
    p2 = bp.set_submatrix(p, sub2, 3, 33, 90, 32)
    expect = bits.copy()
    expect[3:19, 33:65] = np.asarray(bp.unpack(sub2, 32))
    np.testing.assert_array_equal(np.asarray(bp.unpack(p2, 90)), expect)


def test_patchify_roundtrip(rng):
    img = rand_bits(rng, (50, 70))
    W = 16
    tiles = bp.patchify(jnp.asarray(img), W)
    assert tiles.shape == (4 * 5, W, W)
    back = np.asarray(bp.unpatchify(tiles, 50, 70, W))
    np.testing.assert_array_equal(back, img)
    # vectorize round trip (reference patch_test.cpp invariants)
    v = bp.vectorize_patches(tiles)
    assert v.shape == (20, bp.nwords(W * W))
    t2 = np.asarray(bp.unvectorize_patches(v, W))
    np.testing.assert_array_equal(t2, np.asarray(tiles))
