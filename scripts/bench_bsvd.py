"""A/B the BSVD pursuit distance kernels: dense-f32 MXU matmul vs the
packed-uint32 Pallas XOR+popcount kernel (ops/pallas_kernels.
packed_dist_matrix).  The MXU pays a 32x unpack blow-up but rides the
systolic array; the packed kernel is VPU-bound with 1/32nd the traffic —
the crossover is row width.

    python scripts/bench_bsvd.py            # runs on the default backend
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from binary_image_compression_tpu.models import bsvd  # noqa: E402


def main():
    rng = np.random.RandomState(0)
    out = {"backend": jax.devices()[0].platform}
    for (N, M, K) in [(4096, 256, 256), (4096, 1024, 256),
                      (2048, 2048, 128)]:
        E = jnp.asarray((rng.rand(N, M) < 0.3).astype(np.int8))
        D = jnp.asarray((rng.rand(K, M) < 0.3).astype(np.int8))
        row = {}
        vals = {}
        for impl in ("mxu", "packed"):
            try:
                f = jax.jit(
                    lambda e, d, i=impl: bsvd.distances_to_atoms(e, d, i))
                vals[impl] = np.asarray(jax.block_until_ready(f(E, D)))
                t0 = time.time()
                outs = [f(E, D) for _ in range(10)]
                jax.device_get(outs[-1])
                row[impl + "_ms"] = round((time.time() - t0) / 10 * 1e3, 3)
            except Exception as e:  # pragma: no cover
                row[impl + "_ms"] = f"error: {e}"[:100]
        if len(vals) == 2:
            row["equal"] = bool((vals["mxu"] == vals["packed"]).all())
        out[f"N{N}_M{M}_K{K}"] = row
        print(f"N{N}_M{M}_K{K}", json.dumps(row), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
