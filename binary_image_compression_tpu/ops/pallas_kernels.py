"""Pallas TPU kernels for packed-domain hot ops.

The dense-f32 MXU paths (bitpack.dist_matrix, bsvd pursuit) pay a 32x
memory blow-up unpacking bits to floats.  These kernels stay in the packed
uint32 domain: XOR + population_count on the VPU over 32-bit lanes — the
"speed-of-light bitpack throughput" target of BASELINE.json.  The reference
analog is the byte-LUT popcount loop (binmat.cpp:22-37, dist at 499-512).

Kernels fall back to interpret mode off-TPU (tests run on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dist_kernel(a_ref, b_ref, out_ref):
    """out[i, k] = sum_w popcount(a[i, w] ^ b[k, w]).

    a block: [BN, Wd] uint32; b: [K, Wd] uint32 (whole dictionary in VMEM);
    out block: [BN, K] int32.  The word loop is unrolled at trace time: each
    step is a [BN, K] VPU xor+popcount+add — lane-aligned, no transposes.
    """
    nwords = a_ref.shape[1]
    acc = jnp.zeros(out_ref.shape, dtype=jnp.int32)
    for w in range(nwords):
        aw = a_ref[:, w][:, None]          # [BN, 1]
        bw = b_ref[:, w][None, :]          # [1, K]
        x = jnp.bitwise_xor(aw, bw)        # [BN, K] uint32
        acc = acc + lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


def packed_dist_matrix(a, b, *, block_n: int = 256,
                       interpret: bool | None = None):
    """All-pairs Hamming distances between packed rows, fully packed-domain.

    a: uint32 [N, Wd]; b: uint32 [K, Wd] -> int32 [N, K].
    Equivalent to bitpack.dist_matrix (tested) without the 32x unpack.
    """
    a = jnp.asarray(a, jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    N, Wd = a.shape
    K = b.shape[0]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    bn = min(block_n, N)
    # pad N to a multiple of the block
    npad = -N % bn
    if npad:
        a = jnp.pad(a, ((0, npad), (0, 0)))
    grid = ((N + npad) // bn,)
    out = pl.pallas_call(
        _dist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, Wd), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((K, Wd), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, K), lambda i: (i, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + npad, K), jnp.int32),
        interpret=interpret,
    )(a, b)
    return out[:N]


def _weight_kernel(a_ref, out_ref):
    """Row popcounts of a packed block."""
    acc = lax.population_count(a_ref[:]).astype(jnp.int32)
    out_ref[:] = acc.sum(axis=1, keepdims=True)


def packed_row_weight(a, *, block_n: int = 512, interpret: bool | None = None):
    """Row weights of packed rows via Pallas (uint32 popcount reduce)."""
    a = jnp.asarray(a, jnp.uint32)
    N, Wd = a.shape
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    bn = min(block_n, N)
    npad = -N % bn
    if npad:
        a = jnp.pad(a, ((0, npad), (0, 0)))
    out = pl.pallas_call(
        _weight_kernel,
        grid=((N + npad) // bn,),
        in_specs=[pl.BlockSpec((bn, Wd), lambda i: (i, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, 1), lambda i: (i, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + npad, 1), jnp.int32),
        interpret=interpret,
    )(a)
    return out[:N, 0]
