"""Pallas packed-domain kernels vs the bitpack oracle (interpret mode on CPU;
the compiled TPU path is validated in-bench)."""

import numpy as np
import pytest

from binary_image_compression_tpu.ops import pallas_kernels as pk
from binary_image_compression_tpu.ops import bitpack as bp


def test_packed_dist_matrix(rng):
    A = rng.rand(77, 130) < 0.4
    B = rng.rand(33, 130) < 0.6
    d = np.asarray(pk.packed_dist_matrix(bp.np_pack(A), bp.np_pack(B)))
    expect = (A[:, None, :] ^ B[None, :, :]).sum(-1)
    np.testing.assert_array_equal(d, expect)


def test_packed_dist_matrix_blocking(rng):
    A = rng.rand(300, 64) < 0.5
    B = rng.rand(16, 64) < 0.5
    d = np.asarray(pk.packed_dist_matrix(bp.np_pack(A), bp.np_pack(B),
                                         block_n=128))
    expect = (A[:, None, :] ^ B[None, :, :]).sum(-1)
    np.testing.assert_array_equal(d, expect)


def test_packed_row_weight(rng):
    A = rng.rand(200, 257) < 0.3
    w = np.asarray(pk.packed_row_weight(bp.np_pack(A)))
    np.testing.assert_array_equal(w, A.sum(1))
