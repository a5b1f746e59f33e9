"""Per-tile mode decision (two adaptive Golomb contexts) ON DEVICE.

The codec-4/7/8 record layout picks, per tile, the cheapest of up to four
candidate codings {match, nomatch} x {MED-pred, nonpred}; the costs thread
TWO adaptive Golomb contexts serially through the tiles in raster order
(reference: compress8_test.cpp:236-303 with GolombCoder.cpp:29-33).  That
chain is 4 integer adds + a 4-way argmin per tile — trivially cheap, but
SERIAL, so round 2 ran it on the host fused with the record packer
(native bic_decide_pack), which forced ALL FOUR candidate residuals per
tile off the device: 4x the fetch bytes through the remote-TPU tunnel,
leaving the batch pipeline host-bound (VERDICT r2 item 1).

This kernel runs the identical integer decision in one Pallas program —
a single serial fori_loop over tiles with the two Golomb contexts as loop
carry, all inputs in SMEM — so the analyzer can gather ONLY the chosen
residual on device and the fetch shrinks ~3x.  Semantics are bit-identical
to models/compress._decide_modes (tests/test_compress_tpu.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(1 << 28)
_U32 = np.uint32(0xFFFFFFFF)


def _make_kernel(T: int, use_pred: bool, mcost: int, ncost: int):
    def golomb_cost(k, u):
        return k.astype(jnp.int32) + (u >> k.astype(jnp.int32)) + 1

    def golomb_update(acc, n, u):
        # GolombCoder.cpp:29-33 with C unsigned-32 wraparound; the k search
        # as one 32-lane vector compare (see ops/pallas_strict)
        n = (n + jnp.uint32(1)) & _U32
        acc = (acc + u.astype(jnp.uint32)) & _U32
        ks = lax.broadcasted_iota(jnp.uint32, (1, 32), 1)
        ok = ((n << ks) & _U32) >= acc
        k = jnp.min(jnp.where(ok, ks.astype(jnp.int32), 31)).astype(
            jnp.uint32)
        return acc, n, k

    def kernel(w4_ref, hc_ref, il_ref, enb_ref, out_ref):
        def body(t, carry):
            gm_acc, gm_n, gm_k, gn_acc, gn_n, gn_k = carry
            w0 = w4_ref[4 * t]
            w1 = w4_ref[4 * t + 1]
            w2 = w4_ref[4 * t + 2]
            w3 = w4_ref[4 * t + 3]
            il = il_ref[t]
            hc = hc_ref[t] != 0
            big = jnp.int32(_BIG)
            c0 = jnp.where(hc, mcost + il + golomb_cost(gm_k, w0)
                           + enb_ref[w0], big)
            c1 = (jnp.where(hc, mcost + il + golomb_cost(gm_k, w1)
                            + enb_ref[w1], big) if use_pred else big)
            c2 = ncost + golomb_cost(gn_k, w2) + enb_ref[w2]
            c3 = (ncost + golomb_cost(gn_k, w3) + enb_ref[w3]
                  if use_pred else big)
            # first-minimum 4-way argmin (matches np.argmin tie-break)
            mode = jnp.int32(0)
            best = c0
            for m, c in ((1, c1), (2, c2), (3, c3)):
                better = c < best
                mode = jnp.where(better, jnp.int32(m), mode)
                best = jnp.where(better, c, best)
            is_match = mode < 2
            weight = jnp.where(
                mode == 0, w0, jnp.where(
                    mode == 1, w1, jnp.where(mode == 2, w2, w3)))
            k_used = jnp.where(is_match, gm_k, gn_k).astype(jnp.int32)
            gm2 = golomb_update(gm_acc, gm_n, weight)
            gn2 = golomb_update(gn_acc, gn_n, weight)
            zero = jnp.int32(0)
            out_ref[pl.ds(t, 1), :] = jnp.stack(
                [mode, weight, k_used, zero, zero, zero, zero, zero]
            ).astype(jnp.int32).reshape(1, 8)
            return (jnp.where(is_match, gm2[0], gm_acc),
                    jnp.where(is_match, gm2[1], gm_n),
                    jnp.where(is_match, gm2[2], gm_k),
                    jnp.where(is_match, gn_acc, gn2[0]),
                    jnp.where(is_match, gn_n, gn2[1]),
                    jnp.where(is_match, gn_k, gn2[2]))

        z = jnp.uint32(0)
        one = jnp.uint32(1)  # Golomb.h ctor: k starts at 1
        lax.fori_loop(0, T, body, (z, z, one, z, z, one))

    return kernel


@partial(jax.jit, static_argnames=("M", "codec_id", "interpret"))
def decide_modes(weights4, has_cands, idx_len, enb, *, M: int,
                 codec_id: int = 8, interpret: bool | None = None):
    """Device mode decision: (mode, weight, k_used) int32 [T].

    weights4 int32 [T, 4] (w_match_nonpred, w_match_pred, w_nomatch_nonpred,
    w_nomatch_pred); has_cands bool [T]; idx_len int32 [T]; enb int32 [M+1]
    enumerative-codelength LUT.  Bit-identical to the host replay
    (models/compress._decide_modes)."""
    T = weights4.shape[0]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    use_pred = codec_id in (7, 8)
    mcost = 1 + (1 if use_pred else 0) + (1 if codec_id == 8 else 0)
    ncost = 2 if use_pred else 1
    kernel = _make_kernel(T, use_pred, mcost, ncost)
    vmem = pl.ANY if interpret else pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,   # w4 flat [T*4], hc [T], il [T], enb [M+1]
        grid=(1,),
        in_specs=[],
        out_specs=pl.BlockSpec((T, 8), lambda *_: (0, 0), memory_space=vmem),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8), jnp.int32),
        interpret=interpret,
    )(jnp.asarray(weights4, jnp.int32).reshape(T * 4),
      jnp.asarray(has_cands, jnp.int32).reshape(T),
      jnp.asarray(idx_len, jnp.int32).reshape(T),
      jnp.asarray(enb, jnp.int32))
    return out[:, 0], out[:, 1], out[:, 2]
