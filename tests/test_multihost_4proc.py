"""Real 4-process jax.distributed run with model parallelism (VERDICT r4
item 6 / r4 'missing' #3): exercises make_pod_mesh(model=2) beyond 2
processes — a (hosts=4, data=1, model=2) pod mesh over 8 global CPU
devices, page-shard bounds at nproc=4, and a model-sharded BSVD train step
whose cross-host collectives ride the hosts axis.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, os.environ["BIC_REPO"])
from binary_image_compression_tpu.parallel import multihost
from binary_image_compression_tpu.models import codec

pid = int(os.environ["BIC_PROCESS_ID"])
multihost.init_distributed()
assert jax.process_count() == 4, jax.process_count()
assert jax.process_index() == pid

# (hosts, data, model) = (4, 1, 2): model parallelism on local devices,
# hosts outermost so cross-host collectives ride the hosts axis only
mesh = multihost.make_pod_mesh(model=2)
assert dict(mesh.shape) == {"hosts": 4, "data": 1, "model": 2}, \
    dict(mesh.shape)

# page sharding at nproc=4 covers the corpus exactly once
n_pages = 10
bounds = [multihost.page_shard_bounds(n_pages, 4, s) for s in range(4)]
assert bounds[0][0] == 0 and bounds[-1][1] == n_pages
for a, b in zip(bounds, bounds[1:]):
    assert a[1] == b[0]

rng = np.random.RandomState(0)
pages = (rng.rand(n_pages, 32, 32) < 0.3)
lo, hi = multihost.page_shard_bounds(n_pages, jax.process_count(), pid)
p8 = codec.CodecParams(codec=8, W=8, R=16, strict=False)
blobs = multihost.encode_corpus_sharded(pages, params=p8, batch_size=2)
assert len(blobs) == hi - lo
for k in range(hi - lo):
    assert blobs[k] == codec.encode(pages[lo + k], p8), ("page", lo + k)

counts_local = np.zeros(n_pages, dtype=np.int64)
counts_local[lo:hi] = [len(b) for b in blobs]
from jax.experimental import multihost_utils
counts = np.asarray(multihost_utils.process_allgather(counts_local)).sum(0)
assert (counts > 0).all(), counts
offsets = multihost.merge_host_offsets(counts)
print("RESULT", pid, ",".join(map(str, counts.tolist())),
      ",".join(map(str, offsets.tolist())))

# model-sharded BSVD train step over the pod mesh: atoms on model (local
# ICI), samples on (hosts, data) (DCN); parity vs the single-device step
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from binary_image_compression_tpu.models import bsvd

N, K, M = 16, 8, 64
X = (rng.rand(N, M) < 0.4).astype(np.int8)
D0 = (rng.rand(K, M) < 0.3).astype(np.int8)
A0 = (rng.rand(N, K) < 0.2).astype(np.int8)
E0 = (X ^ (A0 @ D0) % 2).astype(np.int8)
s_rows = NamedSharding(mesh, P(("hosts", "data"), None))
s_atoms = NamedSharding(mesh, P("model", None))
s_coefs = NamedSharding(mesh, P(("hosts", "data"), "model"))
rep = NamedSharding(mesh, P())

@jax.jit
def step(E, D, A):
    E, D, A = bsvd.learn_train_step(E, D, A)
    return (jax.lax.with_sharding_constraint(E, s_rows),
            jax.lax.with_sharding_constraint(D, s_atoms),
            jax.lax.with_sharding_constraint(A, s_coefs))

E1, D1, A1 = step(jax.device_put(jnp.asarray(E0), s_rows),
                  jax.device_put(jnp.asarray(D0), s_atoms),
                  jax.device_put(jnp.asarray(A0), s_coefs))
sums = jax.jit(lambda e, d, a: (e.sum(), d.sum(), a.sum()),
               out_shardings=(rep, rep, rep))(E1, D1, A1)
got = [int(x) for x in jax.device_get(sums)]
Er, Dr, Ar = jax.jit(bsvd.learn_train_step)(
    jnp.asarray(E0), jnp.asarray(D0), jnp.asarray(A0))
want = [int(Er.sum()), int(Dr.sum()), int(Ar.sum())]
assert got == want, (got, want)
print("TRAIN", pid, ",".join(map(str, got)))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_four_process_pod_mesh(tmp_path):
    port = _free_port()
    script = tmp_path / "worker4.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(4):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(BIC_REPO=REPO,
                   BIC_COORDINATOR=f"127.0.0.1:{port}",
                   BIC_NUM_PROCESSES="4", BIC_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append({l.split()[0]: l.split()[2:] for l in out.splitlines()
                     if l.split() and l.split()[0] in ("RESULT", "TRAIN")})
    for key in ("RESULT", "TRAIN"):
        for o in outs:
            assert key in o, (key, outs)
        assert all(o[key] == outs[0][key] for o in outs), (key, outs)
