"""TPU-accelerated tile codec: jittable encoder analysis + bitstream I/O.

This is the throughput path for the BIC1 codec-8 family (models/codec.py is
the host-reference implementation; both emit byte-identical streams in
causal mode, asserted by tests/test_compress_tpu.py).

Pipeline (all on device, one jit):
  1. grouped-conv candidate distance maps over each tile's causal window
     (ops/search.window_distance_maps — the MXU form of the reference's
     dist() hot loop, compress8_test.cpp:152-198);
  2. exact serial-scan selection via lexicographic (distance, scan-key)
     masked reductions (ops/search.select_best semantics);
  3. candidate gather, inversion, MED prediction, per-mode weights;
  4. a lax.scan over tiles replaying the two adaptive Golomb contexts and
     choosing the cheapest of the 4 modes by true bit cost;
  5. residual tiles packed to uint32.

Host side packs bits (Golomb + enumerative ranks; the bignum rank arithmetic
is host/C++ work by design — it is O(tiles * W^2/64) word ops on <=300-bit
integers, negligible next to the device search).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import bitpack, search
from ..ops.bitstream import BitWriter, enum_encode, enum_nbits, golomb_encode
from ..ops.entropy import GolombCoder
from .codec import (MAGIC, CodecParams, _header, decode,  # shared
                    image_crc)


def _med_tiles(P):
    """Batched MED residual on dense tiles [T, W, W] (invertible origin)."""
    up = jnp.pad(P, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
    left = jnp.pad(P, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    upleft = jnp.pad(P, ((0, 0), (1, 0), (1, 0)))[:, :-1, :-1]
    return P ^ up ^ left ^ upleft


@partial(jax.jit, static_argnames=("W", "R", "T_thresh", "rows", "cols"))
def encode_analyze(img_bits, *, W: int, R: int, T_thresh: int,
                   rows: int, cols: int):
    """Device-side encoder analysis for codec 8 (causal-original mode).

    img_bits: bool/int [ny*W, nx*W] (zero-padded tile grid).
    Returns per-tile arrays: mode (0=m/nonpred 1=m/pred 2=n/nonpred
    3=n/pred), rank, n_cands, inv, weight, k_used, residual packed uint32.
    """
    M = W * W
    i0, j0, ny, nx = search.tile_origins(rows, cols, W)
    Tn = int(i0.shape[0])
    img = jnp.asarray(img_bits, jnp.int8)

    # NOTE: the _mxu cross-product variant is numerically identical but
    # its XLA graph compiles pathologically slowly through the axon
    # remote-compile tunnel (>10min for 512x512); revisit with a local
    # toolchain / Pallas kernel.  The grouped conv compiles in ~60s.
    d, oy, ox = search.window_distance_maps(img, i0, j0, W, R)
    key1, key2 = search.scan_keys(i0, j0, oy, ox, d.shape, W, R, cols, rows,
                                  decodable=True)
    key = jnp.minimum(key1, key2)
    bestd, bestidx, bestinv, found = search.select_best(
        d, key, T_thresh, M, invert=True)
    # any valid candidate at all?
    validf = (key < search._INF_KEY).reshape(Tn, -1)
    has_cands = validf.any(axis=1)
    n_cands = (key1 < search._INF_KEY).reshape(Tn, -1).sum(axis=1) + \
              (key2 < search._INF_KEY).reshape(Tn, -1).sum(axis=1)
    # enumeration rank including the duplicate y=i0-W row entries
    key_sel = jnp.take_along_axis(key.reshape(Tn, -1), bestidx[:, None],
                                  axis=1)[:, 0]
    rank = ((key1.reshape(Tn, -1) < key_sel[:, None]).sum(axis=1)
            + (key2.reshape(Tn, -1) < key_sel[:, None]).sum(axis=1))

    # candidate patches
    h, w = d.shape[1], d.shape[2]
    ysel = oy + bestidx // w
    xsel = ox + bestidx % w

    def grab(y, x):
        return lax.dynamic_slice(img, (y, x), (W, W))

    P2 = jax.vmap(grab)(ysel, xsel)                      # [T, W, W]
    P = jax.vmap(grab)(i0, j0)
    Pm = jnp.where(bestinv[:, None, None], 1 - P, P)
    P3 = Pm ^ P2
    dP3 = _med_tiles(P3)
    dP = _med_tiles(P)

    w_mnp = P3.sum(axis=(1, 2), dtype=jnp.int32)
    w_mp = dP3.sum(axis=(1, 2), dtype=jnp.int32)
    w_nnp = P.sum(axis=(1, 2), dtype=jnp.int32)
    w_np_ = dP.sum(axis=(1, 2), dtype=jnp.int32)

    enb = jnp.asarray([enum_nbits(M, ww) for ww in range(M + 1)],
                      dtype=jnp.int32)
    idx_len = jnp.maximum(1, jnp.ceil(
        jnp.log2(jnp.maximum(n_cands, 1).astype(jnp.float32))
    ).astype(jnp.int32))
    idx_len = jnp.where(n_cands > 0, idx_len, 0)

    ks = jnp.arange(32, dtype=jnp.uint32)

    def gstep(acc, n, k, u):
        """GolombCoder.codeSample state transition (GolombCoder.cpp:29-33)."""
        n = n + 1
        acc = acc + u.astype(jnp.uint32)
        ok = (n << ks) >= acc
        newk = jnp.where(jnp.any(ok), jnp.argmax(ok).astype(jnp.uint32),
                         jnp.uint32(31))
        return acc, n, newk

    def gcost(k, u):
        return k.astype(jnp.int32) + (u >> k.astype(jnp.int32)) + 1

    def step(carry, xs):
        (am, nm, km), (an, nn, kn) = carry
        hc, il, wm0, wm1, wn0, wn1 = xs
        big = jnp.int32(1 << 28)
        c0 = jnp.where(hc, 3 + il + gcost(km, wm0) + enb[wm0], big)
        c1 = jnp.where(hc, 3 + il + gcost(km, wm1) + enb[wm1], big)
        c2 = 2 + gcost(kn, wn0) + enb[wn0]
        c3 = 2 + gcost(kn, wn1) + enb[wn1]
        costs = jnp.stack([c0, c1, c2, c3])
        mode = jnp.argmin(costs).astype(jnp.int32)
        is_match = mode < 2
        wt = jnp.stack([wm0, wm1, wn0, wn1])[mode]
        k_used = jnp.where(is_match, km, kn).astype(jnp.int32)
        am2, nm2, km2 = gstep(am, nm, km, wt)
        an2, nn2, kn2 = gstep(an, nn, kn, wt)
        newm = jnp.where(is_match, jnp.stack([am2, nm2, km2]),
                         jnp.stack([am, nm, km]))
        newn = jnp.where(is_match, jnp.stack([an, nn, kn]),
                         jnp.stack([an2, nn2, kn2]))
        return ((newm[0], newm[1], newm[2]), (newn[0], newn[1], newn[2])), \
            (mode, wt, k_used)

    ctx0 = ((jnp.uint32(0), jnp.uint32(0), jnp.uint32(1)),
            (jnp.uint32(0), jnp.uint32(0), jnp.uint32(1)))
    _, (mode, weight, k_used) = lax.scan(
        step, ctx0, (has_cands, idx_len, w_mnp, w_mp, w_nnp, w_np_))

    res = jnp.stack([P3, dP3, P, dP])                    # [4, T, W, W]
    chosen = res[mode, jnp.arange(Tn)]                   # [T, W, W]
    res_packed = bitpack.pack(chosen.reshape(Tn, M).astype(jnp.bool_))

    return dict(mode=mode, rank=rank, n_cands=n_cands, inv=bestinv,
                weight=weight, k_used=k_used, idx_len=idx_len,
                residual=res_packed)


def encode(img: np.ndarray, params: CodecParams | None = None) -> bytes:
    """Full TPU-path encode (causal mode, codec 8): device analysis + host
    bit assembly.  Byte-identical to models/codec.encode(strict=False)."""
    params = params or CodecParams(codec=8, strict=False)
    assert params.codec == 8 and not params.strict, \
        "TPU path currently implements codec 8 causal mode"
    img = np.asarray(img, dtype=bool)
    rows, cols = img.shape
    W, R = params.W, params.R
    ny, nx = -(-rows // W), -(-cols // W)
    grid = np.zeros((ny * W, nx * W), dtype=np.int8)
    grid[:rows, :cols] = img
    out = encode_analyze(jnp.asarray(grid), W=W, R=R,
                         T_thresh=params.resolved_T(), rows=rows, cols=cols)
    # one batched transfer: per-array np.asarray costs ~25ms/buffer of
    # round-trip latency through the remote-TPU tunnel
    out = jax.device_get(out)
    M = W * W
    hdr = _header(params, rows, cols, image_crc(img))
    res_bits = bitpack.np_unpack(out["residual"], M)

    # native (C++) encoder tail when available
    from .. import native
    inv_arr = np.where(out["mode"] < 2, out["inv"], False)
    blob = native.pack_tiles(hdr, M, out["mode"], inv_arr, out["rank"],
                             np.where(out["mode"] < 2, out["idx_len"], 0),
                             out["weight"], res_bits.astype(np.uint8))
    if blob is not None:
        return blob

    wtr = BitWriter()
    wtr.write_bits(int.from_bytes(hdr, "big"), len(hdr) * 8)
    for t in range(ny * nx):
        mode = int(out["mode"][t])
        wt = int(out["weight"][t])
        k = int(out["k_used"][t])
        if mode < 2:  # match
            wtr.write_bits(1, 1)
            wtr.write_bits(mode & 1, 1)          # pred
            wtr.write_bits(int(out["inv"][t]), 1)
            wtr.write_bits(int(out["rank"][t]), int(out["idx_len"][t]))
        else:
            wtr.write_bits(0, 1)
            wtr.write_bits(mode & 1, 1)          # pred
        golomb_encode(wtr, wt, k)
        enum_encode(wtr, res_bits[t])
    return wtr.getvalue()


def encode_batch(pages: np.ndarray, params: CodecParams | None = None
                 ) -> list[bytes]:
    """Batched multi-page encode: one vmapped device analysis for the whole
    batch, then the native pack per page (host, trivially parallel).

    pages: bool [B, rows, cols], all the same size."""
    params = params or CodecParams(codec=8, strict=False)
    assert params.codec == 8 and not params.strict
    pages = np.asarray(pages, dtype=bool)
    B, rows, cols = pages.shape
    W, R = params.W, params.R
    ny, nx = -(-rows // W), -(-cols // W)
    grid = np.zeros((B, ny * W, nx * W), dtype=np.int8)
    grid[:, :rows, :cols] = pages
    T_thresh = params.resolved_T()

    analyze = jax.vmap(lambda im: encode_analyze(
        im, W=W, R=R, T_thresh=T_thresh, rows=rows, cols=cols))
    out = jax.device_get(analyze(jnp.asarray(grid)))

    from .. import native
    M = W * W
    blobs = []
    for b in range(B):
        hdr = _header(params, rows, cols, image_crc(pages[b]))
        res_bits = bitpack.np_unpack(out["residual"][b], M)
        inv_arr = np.where(out["mode"][b] < 2, out["inv"][b], False)
        blob = native.pack_tiles(
            hdr, M, out["mode"][b], inv_arr, out["rank"][b],
            np.where(out["mode"][b] < 2, out["idx_len"][b], 0),
            out["weight"][b], res_bits.astype(np.uint8))
        if blob is None:  # pure-python fallback
            blob = encode(pages[b], params)
        blobs.append(blob)
    return blobs
