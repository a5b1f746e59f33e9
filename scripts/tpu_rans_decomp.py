"""Decompose the codec-13 mode-2 device encode cost on the real chip.

Stages (cumulative jits, chained-fori differential, min-of-3):
  ctx    — scab_ctx_map only
  counts — + per-context scatter-add counts + table build
  gather — + per-pixel freq/base gather from the table
  scan   — + the interleaved-rANS lax.scan
  full   — + pack_varlen stream assembly (the shipped graph)
Also A/Bs the lane count (32 vs 64 vs 128) on the full graph: lanes cut
the scan's serial step count at 4 B/lane/stripe payload cost.

Usage: python scripts/tpu_rans_decomp.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from binary_image_compression_tpu.models import compress
    from binary_image_compression_tpu.ops import ransdevice
    from binary_image_compression_tpu.utils import pnm

    img = pnm.read_pbm(os.path.join(os.path.dirname(__file__), "..",
                                    "tests", "fixtures", "doc512.pbm"))
    rows, cols = img.shape
    S, SR, NL = 4, 128, 32
    PS = ransdevice.PSCALE

    def stage_ctx(g):
        return compress.scab_ctx_map(g, tmpl=12,
                                     stripe_rows=SR).astype(jnp.uint32).sum()

    def stage_counts(g):
        ctx = compress.scab_ctx_map(g, tmpl=12, stripe_rows=SR)
        ones, total = ransdevice.count_contexts(ctx, g)
        q, tr, qd, p_used = ransdevice.build_table(ones, total)
        return q.sum() + p_used.astype(jnp.int32).sum() + qd

    def stage_gather(g):
        ctx = compress.scab_ctx_map(g, tmpl=12, stripe_rows=SR)
        ones, total = ransdevice.count_contexts(ctx, g)
        _, _, _, p_used = ransdevice.build_table(ones, total)
        p1 = p_used[jnp.asarray(ctx, jnp.int32)]
        f0 = PS - p1
        bit = jnp.asarray(g, jnp.uint32)
        f = jnp.where(bit == 1, p1, f0)
        b = jnp.where(bit == 1, f0, 0)
        return f.sum() + b.sum()

    def stage_scan(g, n_lanes=NL):
        ctx = compress.scab_ctx_map(g, tmpl=12, stripe_rows=SR)
        ones, total = ransdevice.count_contexts(ctx, g)
        _, _, _, p_used = ransdevice.build_table(ones, total)
        p1 = p_used[jnp.asarray(ctx, jnp.int32)]
        f0 = PS - p1
        bit = jnp.asarray(g, jnp.uint32)
        f_px = jnp.where(bit == 1, p1, f0).astype(jnp.uint32)
        b_px = jnp.where(bit == 1, f0, 0).astype(jnp.uint32)
        L = SR * cols
        steps = -(-L // n_lanes)

        def to_s(a, pad):
            a = a.reshape(S, L)
            a = jnp.pad(a, ((0, 0), (0, steps * n_lanes - L)),
                        constant_values=pad)
            return a.reshape(S, steps, n_lanes).transpose(1, 0, 2)

        st, w, fl = ransdevice.rans_encode_scan(to_s(f_px, PS),
                                               to_s(b_px, 0))
        return st.sum() + w.sum() + fl.sum()

    def stage_full(g, n_lanes=NL):
        o = compress.scab_rans_page(g, tmpl=12, n_stripes=S, stripe_rows=SR,
                                    n_lanes=n_lanes)
        return o["bits"].sum() + o["states"].sum() + o["tab_bits"]

    g8 = jnp.asarray(img.astype(np.uint8))

    def chained(stage_fn, n):
        @jax.jit
        def many(g):
            def body(i, s):
                return s + stage_fn(g ^ (i & 1).astype(jnp.uint8)
                                    ).astype(jnp.uint32)
            return lax.fori_loop(0, n, body, jnp.uint32(0))
        return many

    out = {}
    for name, fn in [("ctx", stage_ctx), ("counts", stage_counts),
                     ("gather", stage_gather), ("scan", stage_scan),
                     ("full", stage_full),
                     ("full_lanes64", partial(stage_full, n_lanes=64)),
                     ("full_lanes128", partial(stage_full, n_lanes=128)),
                     ("scan_lanes128", partial(stage_scan, n_lanes=128))]:
        f1, f11 = chained(fn, 1), chained(fn, 11)
        jax.device_get(f1(g8)); jax.device_get(f11(g8))
        t1 = min(_timed(lambda: jax.device_get(f1(g8))) for _ in range(3))
        t11 = min(_timed(lambda: jax.device_get(f11(g8)))
                  for _ in range(3))
        out[name + "_ms"] = round((t11 - t1) / 10 * 1e3, 3)
        print(name, out[name + "_ms"], flush=True)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
