"""Real 2-process jax.distributed run (BASELINE config #5, scaled to CPU).

Two subprocesses join a local coordinator, build the (hosts, data, model)
pod mesh, shard a page corpus by host, encode their shards, all-gather the
per-page byte counts across processes, and agree on the merged bitstream
offsets — the multi-host corpus-encode control flow end to end
(parallel/multihost.py), minus real ICI/DCN hardware.
"""

import os
import socket
import subprocess
import sys

import pytest

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
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

mesh = multihost.make_pod_mesh(model=1)
assert mesh.shape["hosts"] == 2, dict(mesh.shape)
assert mesh.shape["data"] == 2

rng = np.random.RandomState(0)
pages = (rng.rand(6, 32, 32) < 0.3)            # identical corpus everywhere
lo, hi = multihost.page_shard_bounds(len(pages), jax.process_count(), pid)
p10 = codec.CodecParams(codec=10, W=0, T=0, R=0)
blobs = multihost.encode_corpus_sharded(
    pages, lambda p: codec.encode(p, p10))
assert len(blobs) == hi - lo

counts_local = np.zeros(len(pages), dtype=np.int64)
counts_local[lo:hi] = [len(b) for b in blobs]
from jax.experimental import multihost_utils
gathered = multihost_utils.process_allgather(counts_local)
counts = np.asarray(gathered).sum(axis=0)       # shards are disjoint
assert (counts > 0).all(), counts
offsets = multihost.merge_host_offsets(counts)
# every process decodes a page from the OTHER host's shard for consistency
other = (lo + len(pages) // 2) % len(pages)
print("RESULT", pid, ",".join(map(str, counts.tolist())),
      ",".join(map(str, offsets.tolist())))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_corpus_encode(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        # keep the axon sitecustomize from registering (and initializing)
        # the remote-TPU backend before jax.distributed.initialize runs
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(BIC_REPO=REPO,
                   BIC_COORDINATOR=f"127.0.0.1:{port}",
                   BIC_NUM_PROCESSES="2", BIC_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append([l for l in out.splitlines() if l.startswith("RESULT")])
    # both processes computed identical global counts and offsets
    a = outs[0][0].split()[2:]
    b = outs[1][0].split()[2:]
    assert a == b
