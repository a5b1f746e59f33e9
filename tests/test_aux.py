"""Aux subsystems: galois field, checkpointing, profiling, multihost utils."""

import numpy as np
import pytest

from binary_image_compression_tpu.utils import galois, checkpoint, profiling
from binary_image_compression_tpu.parallel import multihost


@pytest.mark.parametrize("m", [2, 4, 8])
def test_gf_field_axioms(m, rng):
    gf = galois.GF(m)
    q = gf.q
    a = rng.randint(1, q, 64)
    b = rng.randint(1, q, 64)
    c = rng.randint(0, q, 64)
    # inverses and associativity/distributivity spot checks
    np.testing.assert_array_equal(gf.mul(a, gf.inv(a)), np.ones(64, int))
    np.testing.assert_array_equal(gf.mul(a, gf.add(b, c)),
                                  gf.add(gf.mul(a, b), gf.mul(a, c)))
    np.testing.assert_array_equal(gf.div(gf.mul(a, b), b), a)
    assert gf.mul(0, q - 1) == 0


def test_gf_poly_ops():
    gf = galois.GF(8)
    p = [1, 2, 3]
    q = [5, 7]
    prod = gf.poly_mul(p, q)
    quot, rem = gf.poly_divmod(prod, q)
    np.testing.assert_array_equal(quot, gf.poly_trim(p))
    assert rem.sum() == 0
    # evaluation consistency: (p*q)(x) == p(x)*q(x)
    xs = np.arange(1, 10)
    np.testing.assert_array_equal(
        gf.poly_eval(prod, xs), gf.mul(gf.poly_eval(p, xs),
                                       gf.poly_eval(q, xs)))


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt_5")
    E = np.random.rand(4, 8) < 0.5
    D = np.random.rand(2, 8) < 0.5
    A = np.random.rand(4, 2) < 0.5
    checkpoint.save_bsvd(path, E, D, A, step=5, config={"K": 2})
    E2, D2, A2, meta = checkpoint.restore_bsvd(path)
    np.testing.assert_array_equal(E, E2)
    np.testing.assert_array_equal(D, D2)
    assert meta["step"] == 5 and meta["config"]["K"] == 2
    assert checkpoint.latest_step(str(tmp_path)) == 5


def test_pipeline_profile():
    prof = profiling.PipelineProfile()
    with prof.stage("pack", nbytes=1 << 20):
        pass
    with prof.stage("pack", nbytes=1 << 20):
        pass
    assert prof.stages["pack"].calls == 2
    assert "pack" in prof.report()


def test_page_shard_bounds():
    allp = []
    for s in range(3):
        lo, hi = multihost.page_shard_bounds(10, 3, s)
        allp.extend(range(lo, hi))
    assert allp == list(range(10))
    offs = multihost.merge_host_offsets([5, 3, 7])
    np.testing.assert_array_equal(offs, [0, 5, 8])


def test_pod_mesh_single_process():
    m = multihost.make_pod_mesh()
    assert m.shape["hosts"] == 1
    assert "data" in m.shape and "model" in m.shape
