"""On-chip microbenchmarks for VERDICT r4 items 4 and 5.

Run on the real TPU (no concurrent TPU processes).  Sections:

  vreg   — isolate the fused-search vreg-granularity hypothesis: the same
           kernel at R=128 (useful window 2R+W = 288 lanes, 128-aligned
           chunks pad to 384) vs R=112 (useful 240, pads to 256).  If
           measured time tracks PADDED lanes (wh x span), vreg granularity
           is the cost driver; if it tracks USEFUL lanes, the padding is
           free and the ceiling is issue slots.
  strict — device-true ms/page of the strict kernel, split (phase A
           grid-2 batched per row) vs monolithic, via the chained-dispatch
           differential (fori AROUND a pallas_call compiles pathologically
           through the remote service).

Usage: python scripts/tpu_microbench.py [vreg|strict|all]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def chained_pallas_ms(make_fn, args_a, args_b, k=11, reps=3):
    """(t_k - t_1)/(k-1) with k independent dispatches forced by one tiny
    reduction jit; min-of-reps on both chain lengths."""
    import jax
    import jax.numpy as jnp
    comb = jax.jit(lambda xs: sum(x.sum(dtype=jnp.int32) for x in xs))

    def run_k(n):
        outs = [make_fn(args_a if i % 2 == 0 else args_b) for i in range(n)]
        return int(jax.device_get(comb(outs)))

    run_k(1); run_k(k)                       # warm
    t1 = min(_timed(lambda: run_k(1)) for _ in range(reps))
    tk = min(_timed(lambda: run_k(k)) for _ in range(reps))
    return (tk - t1) / (k - 1) * 1e3


def bench_vreg():
    import jax
    import jax.numpy as jnp
    from binary_image_compression_tpu.models import compress
    from binary_image_compression_tpu.utils import pnm
    img = pnm.read_pbm(os.path.join(os.path.dirname(__file__), "..",
                                    "tests", "fixtures", "doc512.pbm"))
    rows, cols = img.shape
    g = jnp.asarray(img.astype(np.int8))
    g2 = g ^ jnp.int8(1)
    out = {}
    for R in (112, 128):
        T_th = 2

        def mk(gi, R=R):
            o = compress.encode_analyze(gi, W=16, R=R, T_thresh=T_th,
                                        rows=rows, cols=cols)
            return o["rank"] + o["weights4"].sum(-1)

        ms = chained_pallas_ms(mk, g, g2)
        out[f"analysis_ms_R{R}"] = round(ms, 3)
    # model ratios (W=16): wh = R+1 rows; useful lanes 2R+W; padded = the
    # plan_groups 128-aligned span (384 at R128, 256 at R112 interior)
    useful = (129 * 288) / (113 * 240)
    padded = (129 * 384) / (113 * 256)
    meas = out["analysis_ms_R128"] / out["analysis_ms_R112"]
    out["ratio_measured"] = round(meas, 3)
    out["ratio_useful_lanes"] = round(useful, 3)
    out["ratio_padded_lanes"] = round(padded, 3)
    out["verdict"] = ("padded (vreg granularity drives cost)"
                      if abs(meas - padded) < abs(meas - useful)
                      else "useful (padding is ~free; issue-slot bound)")
    return out


def bench_strict():
    import jax
    import jax.numpy as jnp
    from binary_image_compression_tpu.ops import pallas_strict
    from binary_image_compression_tpu.utils import pnm
    img = pnm.read_pbm(os.path.join(os.path.dirname(__file__), "..",
                                    "tests", "fixtures", "doc512.pbm"))
    rows, cols = img.shape
    grid = np.zeros((512, 512), np.uint32)
    grid[:rows, :cols] = img
    g = jnp.asarray(grid)
    g2 = g ^ jnp.uint32(1)
    out = {}
    which = ((2,) if len(sys.argv) > 2 and sys.argv[2] == "unroll"
             else (0, 1, 2))
    ref = None
    for split in which:
        fn = pallas_strict._jitted(16, 128, 2, rows, cols, 512, 512,
                                   True, True, False, split=split)
        name = {0: "mono", 1: "split", 2: "split_unroll"}[split]
        ms = chained_pallas_ms(lambda gi, fn=fn: fn(gi)[0][:, 1], g, g2)
        out[f"strict_ms_{name}"] = round(ms, 2)
        b = jax.device_get(fn(g))
        if ref is None:
            ref = b
        else:
            assert (ref[0] == b[0]).all() and (ref[1] == b[1]).all(), \
                f"{name} kernel diverged on chip"
            out[f"strict_{name}_parity"] = "ok"
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    res = {}
    if which in ("vreg", "all"):
        res["vreg"] = bench_vreg()
        print(json.dumps(res, indent=1), flush=True)
    if which in ("strict", "all"):
        res["strict"] = bench_strict()
    print("FINAL " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
