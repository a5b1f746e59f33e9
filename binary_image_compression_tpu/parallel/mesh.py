"""Device meshes and sharded training/encode steps.

The reference's only parallelism is OpenMP threads (SURVEY.md §2.10); the
TPU-native equivalents built here:

* **data parallelism** — patch rows (BSVD samples) / pages sharded on the
  ``data`` mesh axis: the reference's ``#pragma omp parallel for`` over
  samples (bsvd.cpp:1057) becomes a sharded batch dimension; XLA inserts the
  psum for the change counts.
* **model ("tensor") parallelism** — dictionary atoms sharded on ``model``:
  the [N,K] distance matmul is column-parallel; argmin over K makes XLA
  all-gather along ``model`` over ICI.
* **spatial parallelism** — image tile-rows sharded on ``data`` with halo
  exchange for causal context (parallel/halo.py), the reference's implicit
  raster "sequence" dimension (SURVEY.md §5 long-context note).
* **bitstream merge** — per-shard codelengths -> exclusive offset scan ->
  gather (parallel/bitmerge.py).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None,
              model: int | None = None) -> Mesh:
    """2-D (data, model) mesh; defaults to all devices on data with model=1
    unless n_devices is even and >= 4 (then model=2)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if data is None or model is None:
        model = 2 if n % 2 == 0 and n >= 4 else 1
        data = n // model
    arr = np.array(devs).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_bsvd_state(mesh: Mesh, X, E, D, A):
    """Canonical shardings: samples on data, atoms on model."""
    s_rows = NamedSharding(mesh, P("data", None))
    s_atoms = NamedSharding(mesh, P("model", None))
    s_coefs = NamedSharding(mesh, P("data", "model"))
    return (jax.device_put(X, s_rows), jax.device_put(E, s_rows),
            jax.device_put(D, s_atoms), jax.device_put(A, s_coefs))


def sharded_train_step(mesh: Mesh):
    """jit-compiled BSVD alternation step with explicit output shardings.

    GSPMD partitions the [N_shard, K] distance matmul column-wise over
    ``model`` and row-wise over ``data``; the argmin over K and the
    majority-vote counts produce the all-gather / psum collectives over ICI
    automatically — the idiomatic pjit formulation (SURVEY.md §7 shard)."""
    from ..models import bsvd

    s_rows = NamedSharding(mesh, P("data", None))
    s_atoms = NamedSharding(mesh, P("model", None))
    s_coefs = NamedSharding(mesh, P("data", "model"))

    @jax.jit
    def step(E, D, A):
        E, D, A = bsvd.learn_train_step(E, D, A)
        E = jax.lax.with_sharding_constraint(E, s_rows)
        D = jax.lax.with_sharding_constraint(D, s_atoms)
        A = jax.lax.with_sharding_constraint(A, s_coefs)
        return E, D, A

    return step


def sharded_encode_analyze(mesh: Mesh, W: int, R: int, T_thresh: int,
                           rows: int, cols: int):
    """Tile-codec analysis with the tile grid sharded by page batch.

    Pages go on ``data`` (embarrassingly parallel); within a page the
    windowed search is already batched over tiles.  Returns a jitted fn
    [B, ny*W, nx*W] -> per-page analysis dicts (stacked)."""
    from ..models import compress

    s_pages = NamedSharding(mesh, P("data", None, None))

    @jax.jit
    def run(batch):
        batch = jax.lax.with_sharding_constraint(batch, s_pages)
        return jax.vmap(
            lambda im: compress.encode_analyze(
                im, W=W, R=R, T_thresh=T_thresh, rows=rows, cols=cols)
        )(batch)

    return run
