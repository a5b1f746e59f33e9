"""TPU BSVD layer vs the reference-replay oracle (models/bsvd_ref).

Updaters share exact semantics with the reference and must match
bit-for-bit from a common state; initializers with RNG match exactly when
the reference's rand48 draws are injected (graph-grow) or are RNG-free
(partition), and within tolerance otherwise (VERDICT r1 item 7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from binary_image_compression_tpu.models import bsvd, bsvd_ref


def _X(rng, n=48, m=64, dens=0.3, no_zero_rows=True):
    X = rng.rand(n, m) < dens
    if no_zero_rows:
        X[X.sum(axis=1) == 0, 0] = True
    return X


def test_partition_init_exact(rng):
    """M <= 64 keeps the reference col_weight bug inert -> bit-equal."""
    X = _X(rng)
    K = 12
    D_ref = np.zeros((K, 64), dtype=bool)
    A_ref = np.zeros((48, K), dtype=bool)
    bsvd_ref.initialize_partition(X, D_ref, A_ref)
    D, A = bsvd.initialize_partition(jax.random.PRNGKey(0),
                                     jnp.asarray(X, jnp.int8), K)
    np.testing.assert_array_equal(np.asarray(D).astype(bool), D_ref)


def test_graph_grow_exact_with_injected_seeds(rng):
    """Replaying the reference's rand48 seed draws makes the round-robin
    deal deterministic -> bit-equal centroids (no all-zero rows, so the
    reference consumes RNG only in phase 1)."""
    X = _X(rng, n=40, m=48)
    K = 5
    seed = 987654
    D_ref = np.zeros((K, 48), dtype=bool)
    A_ref = np.zeros((40, K), dtype=bool)
    bsvd_ref.reset_rng(seed)
    bsvd_ref.initialize_graph_grow(X, D_ref, A_ref)
    # replay phase 1's rejection sampling for the seed rows
    bsvd_ref.reset_rng(seed)
    r48 = bsvd_ref._get_rng()
    taken = np.zeros(40, dtype=bool)
    seeds = []
    for _ in range(K):
        while True:
            i = r48.uniform_int(40)
            if not taken[i]:
                break
        taken[i] = True
        seeds.append(i)
    D, A = bsvd.initialize_graph_grow(jax.random.PRNGKey(0),
                                      jnp.asarray(X, jnp.int8), K,
                                      seed_idx=np.array(seeds))
    np.testing.assert_array_equal(np.asarray(D).astype(bool), D_ref)


def _common_state(rng, n=40, m=48, K=8):
    X = _X(rng, n=n, m=m)
    D = (rng.rand(K, m) < 0.25)
    A = (rng.rand(n, K) < 0.15)
    E = (A.astype(np.int64) @ D.astype(np.int64)) % 2 == 1
    E ^= X
    return X, E, D, A


def test_update_coefficients_exact(rng):
    X, E, D, A = _common_state(rng)
    E_ref, A_ref = E.copy(), A.copy()
    bsvd_ref.update_coefficients(E_ref, D, A_ref)
    Ej, Aj, _ = bsvd.update_coefficients(jnp.asarray(E, jnp.int8),
                                         jnp.asarray(D, jnp.int8),
                                         jnp.asarray(A, jnp.int8))
    np.testing.assert_array_equal(np.asarray(Ej).astype(bool), E_ref)
    np.testing.assert_array_equal(np.asarray(Aj).astype(bool), A_ref)


def test_update_coefficients_packed_matches_mxu(rng):
    X, E, D, A = _common_state(rng, m=96)
    args = (jnp.asarray(E, jnp.int8), jnp.asarray(D, jnp.int8),
            jnp.asarray(A, jnp.int8))
    Em, Am, _ = bsvd.update_coefficients(*args, distances="mxu")
    Ep, Ap, _ = bsvd.update_coefficients(*args, distances="packed")
    np.testing.assert_array_equal(np.asarray(Em), np.asarray(Ep))
    np.testing.assert_array_equal(np.asarray(Am), np.asarray(Ap))


def test_update_coefficients_gram_matches_mxu(rng):
    # the Gram/cross-carry pursuit (the reference's broken
    # update_coefficients_fast, bsvd.cpp:1116-1213, done correctly over
    # GF(2)) must choose bit-identical flips to the plain sweep
    for n, m, K in [(40, 48, 8), (64, 96, 16), (128, 64, 32)]:
        X, E, D, A = _common_state(rng, n=n, m=m, K=K)
        args = (jnp.asarray(E, jnp.int8), jnp.asarray(D, jnp.int8),
                jnp.asarray(A, jnp.int8))
        Em, Am, cm = bsvd.update_coefficients(*args, distances="mxu")
        Eg, Ag, cg = bsvd.update_coefficients(*args, distances="gram")
        np.testing.assert_array_equal(np.asarray(Em), np.asarray(Eg))
        np.testing.assert_array_equal(np.asarray(Am), np.asarray(Ag))
        assert int(cm) == int(cg)


def test_update_coefficients_gram_matches_ref(rng):
    # and therefore the reference replay too (same guarantee as the mxu
    # variant's test_update_coefficients_exact)
    X, E, D, A = _common_state(rng)
    E_ref, A_ref = E.copy(), A.copy()
    bsvd_ref.update_coefficients(E_ref, D, A_ref)
    Ej, Aj, _ = bsvd.update_coefficients(
        jnp.asarray(E, jnp.int8), jnp.asarray(D, jnp.int8),
        jnp.asarray(A, jnp.int8), distances="gram")
    np.testing.assert_array_equal(np.asarray(Ej).astype(bool), E_ref)
    np.testing.assert_array_equal(np.asarray(Aj).astype(bool), A_ref)


def test_update_dictionary_steepest_exact(rng):
    X, E, D, A = _common_state(rng)
    E_ref, D_ref = E.copy(), D.copy()
    bsvd_ref.update_dictionary_steepest(E_ref, D_ref, A)
    Ej, Dj, _ = bsvd.update_dictionary_steepest(jnp.asarray(E, jnp.int8),
                                                jnp.asarray(D, jnp.int8),
                                                jnp.asarray(A, jnp.int8))
    np.testing.assert_array_equal(np.asarray(Ej).astype(bool), E_ref)
    np.testing.assert_array_equal(np.asarray(Dj).astype(bool), D_ref)


def test_update_dictionary_proximus_exact(rng):
    X, E, D, A = _common_state(rng)
    E_ref, D_ref, A_ref = E.copy(), D.copy(), A.copy()
    bsvd_ref.update_dictionary_proximus(E_ref, D_ref, A_ref)
    Ej, Dj, Aj, _ = bsvd.update_dictionary_proximus(
        jnp.asarray(E, jnp.int8), jnp.asarray(D, jnp.int8),
        jnp.asarray(A, jnp.int8), max_inner=64)
    np.testing.assert_array_equal(np.asarray(Ej).astype(bool), E_ref)
    np.testing.assert_array_equal(np.asarray(Dj).astype(bool), D_ref)
    np.testing.assert_array_equal(np.asarray(Aj).astype(bool), A_ref)


@pytest.mark.parametrize("init", ["neighbor", "random_centroids",
                                  "partition", "graph_grow"])
def test_learn_reduces_residual_all_inits(rng, init):
    # structured rows (shared atoms + sparse noise): unstructured Bernoulli
    # data defeats centroid inits (majority vote yields near-empty atoms),
    # for the reference exactly as for this layer
    atoms = rng.rand(6, 64) < 0.35
    coefs = rng.rand(64, 6) < 0.3
    X = ((coefs.astype(int) @ atoms.astype(int)) % 2).astype(bool)
    X ^= rng.rand(64, 64) < 0.02
    X[X.sum(axis=1) == 0, 0] = True
    Xj = jnp.asarray(X, jnp.int8)
    E, D, A, iters = bsvd.learn(Xj, K=12, init=init, max_iters=20)
    assert int(E.sum()) < int(X.sum())
    np.testing.assert_array_equal(np.asarray(bsvd.residual(Xj, D, A)),
                                  np.asarray(E))


def test_learn_mdl_forward_improves():
    rng = np.random.RandomState(5)
    # structured data: a few true atoms + noise, so growing K pays
    atoms = rng.rand(4, 48) < 0.3
    coefs = rng.rand(96, 4) < 0.3
    X = ((coefs.astype(int) @ atoms.astype(int)) % 2).astype(bool)
    Xj = jnp.asarray(X, jnp.int8)
    E0, D0, A0, _ = bsvd.learn(Xj, K=1, init="random_centroids")
    L0 = float(bsvd.model_codelength(E0, D0, A0))
    E, D, A, bestL = bsvd.learn_mdl_forward(Xj, K0=1, max_k=10,
                                            init="random_centroids")
    assert bestL <= L0
    assert D.shape[0] >= 1
    np.testing.assert_array_equal(np.asarray(bsvd.residual(Xj, D, A)),
                                  np.asarray(E))


@pytest.mark.parametrize("variant", [1, 2, 3])
def test_learn_alter_reduces_residual(rng, variant):
    atoms = rng.rand(5, 48) < 0.35
    coefs = rng.rand(48, 5) < 0.3
    X = ((coefs.astype(int) @ atoms.astype(int)) % 2).astype(bool)
    X[X.sum(axis=1) == 0, 0] = True
    Xj = jnp.asarray(X, jnp.int8)
    E, D, A, iters = bsvd.learn_alter(Xj, K=8, init="random_centroids",
                                      variant=variant, max_iters=8)
    assert int(E.sum()) <= int(X.sum())
    np.testing.assert_array_equal(np.asarray(bsvd.residual(Xj, D, A)),
                                  np.asarray(E))


def test_learn_mdl_full_search():
    rng = np.random.RandomState(9)
    atoms = rng.rand(3, 32) < 0.3
    coefs = rng.rand(48, 3) < 0.3
    X = ((coefs.astype(int) @ atoms.astype(int)) % 2).astype(bool)
    Xj = jnp.asarray(X, jnp.int8)
    E, D, A, bestL = bsvd.learn_mdl_full(Xj, Kmax=8, Kstep=4, reps=2)
    assert D.shape[0] in (4, 8)
    np.testing.assert_array_equal(np.asarray(bsvd.residual(Xj, D, A)),
                                  np.asarray(E))
    assert bestL > 0


def test_learn_mdl_backward_improves():
    rng = np.random.RandomState(7)
    atoms = rng.rand(3, 48) < 0.3
    coefs = rng.rand(64, 3) < 0.3
    X = ((coefs.astype(int) @ atoms.astype(int)) % 2).astype(bool)
    Xj = jnp.asarray(X, jnp.int8)
    E0, D0, A0, _ = bsvd.learn(Xj, K=16, init="random_centroids")
    L0 = float(bsvd.model_codelength(E0, D0, A0))
    E, D, A, bestL = bsvd.learn_mdl_backward(Xj, K0=16,
                                             init="random_centroids")
    assert bestL <= L0
    assert 1 <= D.shape[0] <= 16
    np.testing.assert_array_equal(np.asarray(bsvd.residual(Xj, D, A)),
                                  np.asarray(E))
