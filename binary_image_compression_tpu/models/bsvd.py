"""TPU-native binary dictionary learning (BSVD) — the GF(2) K-SVD analog.

Model (reference bsvd.h:31-37): X (N x M patch rows) ~ A (N x K coefs) *
D (K x M atoms) over GF(2), E = X ^ A*D, minimizing |E| (Hamming) or an MDL
codelength.  This module is the TPU re-design, NOT a port:

* the reference's per-sample greedy pursuit (update_coefficients_omp,
  bsvd.cpp:1029-1107: OMP parallel-for over samples, inner while-improved
  scan over atoms with copy_row_to/dist/bool_and) becomes a *batched* MXU
  matmul: all N x K candidate distances at once via
  d = |Ei| + |Dk| - 2 <Ei, Dk>, one flip per sample per sweep inside
  lax.while_loop with convergence flags (SURVEY.md §7 hard part (c));
* the majority-vote dictionary updates (update_dictionary_steepest,
  bsvd.cpp:463-527; proximus, bsvd.cpp:530-735) become masked counts via
  matmuls: weights = A[:,k]^T (E ^ Dk) summed over users — a [1,N]x[N,M]
  product on the MXU, scanned over atoms (the reference's sequential
  per-atom residual fixup is semantically load-bearing and kept);
* learning loops (traditional / alter1-3, bsvd.cpp:1215-1434) are thin
  drivers; MDL selection (bsvd.cpp:1438-1717) reuses
  entropy.universal_codelength.

State is dense int8 0/1 on device (MXU-friendly); conversion helpers go to
and from the packed uint32 layout.  Exact reference-replay parity (rand48
init, identical update order) lives in models/bsvd_ref.py; this module
targets throughput and multi-chip sharding (parallel/mesh.py: samples on the
'data' axis, atoms on the 'model' axis).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import bitpack


def _f32(x):
    return x.astype(jnp.float32)


def distances_to_atoms(E, D, impl: str = "mxu"):
    """d[i, k] = |E_i ^ D_k| for dense 0/1 rows.

    impl="mxu" (default): one f32 matmul (the batched form of the
    reference's hot loop #1, bsvd.cpp:1065-1094).  impl="packed": pack to
    uint32 lanes and run the Pallas XOR+popcount kernel
    (ops/pallas_kernels.packed_dist_matrix) — 32x less memory traffic; wins
    for wide rows (M >= ~1024), loses to the MXU for small M (see
    scripts/bench_bsvd.py)."""
    if impl == "packed" and E.shape[1] <= 64 * 32:
        # wider rows exceed the packed kernel's VMEM scope; use the MXU
        from ..ops import bitpack, pallas_kernels
        Ep = bitpack.pack(E.astype(jnp.bool_))
        Dp = bitpack.pack(D.astype(jnp.bool_))
        return pallas_kernels.packed_dist_matrix(Ep, Dp).astype(jnp.float32)
    we = E.sum(axis=1, dtype=jnp.float32)
    wd = D.sum(axis=1, dtype=jnp.float32)
    cross = jnp.dot(_f32(E), _f32(D).T, preferred_element_type=jnp.float32)
    return we[:, None] + wd[None, :] - 2.0 * cross


def update_coefficients(E, D, A, max_flips: int | None = None,
                        distances: str = "mxu"):
    """Greedy Hamming pursuit, vectorized over samples.

    Per sweep every sample flips the single coefficient whose atom most
    reduces |E_i| (exactly the reference's inner-loop step); sweeps repeat
    under lax.while_loop until no sample improves (bounded by max_flips).
    Returns (E', A', changed_count).

    distances="gram" is the Gram-matrix formulation — the reference's
    broken update_coefficients_fast (bsvd.cpp:1116-1213) done CORRECTLY
    over GF(2): cross[i,j] = <E_i, D_j> is carried across sweeps and
    updated incrementally after each flip.  Over GF(2) the flip
    E_i ^= D_k is NOT the linear update the reference applied (that is
    exactly why its version never worked): the exact identity is

        <E ^ D_k, D_j> = <E, D_j> + G[k, j] - 2 <E & D_k, D_j>

    so the correction needs G = D D^t (computed ONCE per call, the Gram
    lever) plus one triple-overlap matmul per sweep — which replaces the
    full distance re-matmul and the O(N M) weight re-reduction of the
    plain sweep.  The flips chosen are bit-identical to distances="mxu"
    (the corrections are exact integer arithmetic; tests pin this)."""
    if distances == "gram":
        return _update_coefficients_gram(E, D, A, max_flips)
    N, M = E.shape
    K = D.shape[0]
    if max_flips is None:
        max_flips = K  # a sample can't usefully flip more atoms than exist

    Df = _f32(D)

    def sweep(state):
        E, A, active, it, changed = state
        d = distances_to_atoms(E, D, impl=distances)   # [N, K]
        w = E.sum(axis=1, dtype=jnp.float32)  # current residual weights
        bestk = jnp.argmin(d, axis=1)
        bestd = jnp.take_along_axis(d, bestk[:, None], axis=1)[:, 0]
        improve = (bestd < w) & active
        # flip chosen coef + xor chosen atom into E, only where improving
        sel = jax.nn.one_hot(bestk, K, dtype=E.dtype)
        A = jnp.where(improve[:, None], A ^ sel.astype(A.dtype), A)
        atom = jnp.take(D, bestk, axis=0)
        E = jnp.where(improve[:, None], E ^ atom, E)
        changed = changed | improve
        return E, A, improve, it + 1, changed

    def cond(state):
        _, _, active, it, _ = state
        return jnp.any(active) & (it < max_flips)

    active0 = jnp.ones((N,), dtype=bool)
    changed0 = jnp.zeros((N,), dtype=bool)
    E, A, _, _, changed = lax.while_loop(
        cond, sweep, (E, A, active0, jnp.int32(0), changed0))
    return E, A, changed.sum(dtype=jnp.int32)


def _update_coefficients_gram(E, D, A, max_flips: int | None = None):
    """Gram/cross-carry pursuit (see update_coefficients docstring).

    Carries (w, cross) so each sweep's candidate distances cost O(NK)
    element ops; the only matmul per sweep is the exact GF(2) correction
    term T[i, j] = <E_i & D_bestk_i, D_j>, evaluated on the pre-flip
    residual and masked to the improving rows."""
    N, M = E.shape
    K = D.shape[0]
    if max_flips is None:
        max_flips = K

    Df = _f32(D)
    wd = D.sum(axis=1, dtype=jnp.float32)                    # [K] |D_k|
    G = jnp.dot(Df, Df.T, preferred_element_type=jnp.float32)  # [K, K]
    cross0 = jnp.dot(_f32(E), Df.T,
                     preferred_element_type=jnp.float32)     # [N, K]
    w0 = E.sum(axis=1, dtype=jnp.float32)                    # [N]

    def sweep(state):
        E, A, w, cross, active, it, changed = state
        d = w[:, None] + wd[None, :] - 2.0 * cross           # [N, K]
        bestk = jnp.argmin(d, axis=1)
        bestd = jnp.take_along_axis(d, bestk[:, None], axis=1)[:, 0]
        improve = (bestd < w) & active
        sel = jax.nn.one_hot(bestk, K, dtype=A.dtype)
        A = jnp.where(improve[:, None], A ^ sel, A)
        atom = jnp.take(D, bestk, axis=0)                    # [N, M]
        # exact GF(2) correction: <E^Dk, Dj> = cross + G[k] - 2 <E&Dk, Dj>
        F = jnp.where(improve[:, None], E & atom, 0)
        T = jnp.dot(_f32(F), Df.T,
                    preferred_element_type=jnp.float32)      # [N, K]
        corr = jnp.take(G, bestk, axis=0) - 2.0 * T
        cross = jnp.where(improve[:, None], cross + corr, cross)
        # |E ^ Dk| = bestd, already exact
        w = jnp.where(improve, bestd, w)
        E = jnp.where(improve[:, None], E ^ atom, E)
        changed = changed | improve
        return E, A, w, cross, improve, it + 1, changed

    def cond(state):
        active, it = state[4], state[5]
        return jnp.any(active) & (it < max_flips)

    active0 = jnp.ones((N,), dtype=bool)
    changed0 = jnp.zeros((N,), dtype=bool)
    E, A, _, _, _, _, changed = lax.while_loop(
        cond, sweep, (E, A, w0, cross0, active0, jnp.int32(0), changed0))
    return E, A, changed.sum(dtype=jnp.int32)


def update_dictionary_steepest(E, D, A):
    """Majority-vote atom update with sequential residual fixup.

    Reference semantics (bsvd.cpp:463-527): per atom k over its users
    U = {i : A[i,k]}, weights_j = sum_U (E_i ^ Dk)_j, new Dk_j =
    weights_j > |U|/2; E is fixed up before the next atom.  The inner counts
    ride the MXU ([1,N] x [N,M]); the atom loop is a lax.scan carry on E/D."""
    N, M = E.shape
    K = D.shape[0]

    def per_atom(carry, k):
        E, D, changed = carry
        Dk = lax.dynamic_slice(D, (k, 0), (1, M))[0]
        users = lax.dynamic_slice(A.T, (k, 0), (1, N))[0]  # [N]
        usage = users.sum(dtype=jnp.float32)
        # weights = sum over users of (Ei ^ Dk)
        Ex = E ^ Dk[None, :]
        weights = jnp.dot(_f32(users)[None, :], _f32(Ex),
                          preferred_element_type=jnp.float32)[0]
        u = jnp.floor(usage / 2.0)
        newDk = (weights > u).astype(D.dtype)
        newDk = jnp.where(usage > 0, newDk, Dk)
        delta = Dk ^ newDk
        atom_changed = delta.sum(dtype=jnp.int32) > 0
        # residual fixup: users' rows get ^= (Dk ^ newDk)
        E = E ^ (users[:, None] * delta[None, :]).astype(E.dtype)
        D = lax.dynamic_update_slice(D, newDk[None, :], (k, 0))
        return (E, D, changed + atom_changed.astype(jnp.int32)), None

    (E, D, changed), _ = lax.scan(per_atom, (E, D, jnp.int32(0)),
                                  jnp.arange(K))
    return E, D, changed


def update_dictionary_proximus(E, D, A, max_inner: int = 8):
    """PROXIMUS rank-one alternation per atom (bsvd.cpp:530-735): alternate
    majority updates of Dk (over its user rows) and Ak (over its support
    columns) until fixpoint, with residual fixups; atoms sequential."""
    N, M = E.shape
    K = D.shape[0]

    def per_atom(carry, k):
        E, D, A, changed = carry

        def inner(state):
            E, D, A, conv, it, kch = state
            Dk = lax.dynamic_slice(D, (k, 0), (1, M))[0]
            Ak = lax.dynamic_slice(A.T, (k, 0), (1, N))[0]
            # --- atom update over users ---
            usage = Ak.sum(dtype=jnp.float32)
            Ex = E ^ Dk[None, :]
            w = jnp.dot(_f32(Ak)[None, :], _f32(Ex),
                        preferred_element_type=jnp.float32)[0]
            newDk = (w > jnp.floor(usage / 2.0)).astype(D.dtype)
            newDk = jnp.where(usage > 0, newDk, Dk)
            dd = (newDk ^ Dk).sum(dtype=jnp.int32)
            E = E ^ (Ak[:, None] * (Dk ^ newDk)[None, :]).astype(E.dtype)
            D = lax.dynamic_update_slice(D, newDk[None, :], (k, 0))
            Dk = newDk
            # --- coef update over support columns ---
            sup = Dk.sum(dtype=jnp.float32)
            Ec = E ^ Ak[:, None]
            v = jnp.dot(_f32(Ec), _f32(Dk)[:, None],
                        preferred_element_type=jnp.float32)[:, 0]
            newAk = (v > jnp.floor(sup / 2.0)).astype(A.dtype)
            newAk = jnp.where(sup > 0, newAk, Ak)
            da = (newAk ^ Ak).sum(dtype=jnp.int32)
            E = E ^ ((Ak ^ newAk)[:, None] * Dk[None, :]).astype(E.dtype)
            A = A.at[:, k].set(newAk)
            conv = (dd == 0) & (da == 0)
            return E, D, A, conv, it + 1, kch | (dd > 0)

        def cond(state):
            _, _, _, conv, it, _ = state
            return jnp.logical_not(conv) & (it < max_inner)

        E, D, A, _, _, kch = lax.while_loop(
            cond, inner, (E, D, A, jnp.bool_(False), jnp.int32(0),
                          jnp.bool_(False)))
        return (E, D, A, changed + kch.astype(jnp.int32)), None

    (E, D, A, changed), _ = lax.scan(per_atom, (E, D, A, jnp.int32(0)),
                                     jnp.arange(K))
    return E, D, A, changed


def initialize_random(key, X, K):
    """Bernoulli(0.5) atoms (initialize_model_random, bsvd.cpp:385-397)."""
    N, M = X.shape
    D = jax.random.bernoulli(key, 0.5, (K, M)).astype(jnp.int8)
    A = jnp.zeros((N, K), dtype=jnp.int8)
    return D, A


def initialize_random_centroids(key, X, K):
    """Random cluster assignment + majority centroid (bsvd.cpp:128-166)."""
    N, M = X.shape
    assign = jax.random.randint(key, (N,), 0, K)
    onehot = jax.nn.one_hot(assign, K, dtype=jnp.float32)   # [N, K]
    counts = onehot.sum(axis=0)                              # cluster sizes
    sums = jnp.dot(onehot.T, _f32(X),
                   preferred_element_type=jnp.float32)       # [K, M]
    D = (2.0 * sums >= counts[:, None]).astype(jnp.int8)
    A = onehot.astype(jnp.int8)
    return D, A


def initialize_neighbor(key, X, K):
    """Neighbor-centroid init (bsvd.cpp:227-267), batched: for K random
    seed rows, the centroid of all rows sharing support (AND-overlap > 0) —
    one [K,N] overlap matmul + one [K,M] masked-sum matmul."""
    N, M = X.shape
    idx = jax.random.randint(key, (K,), 0, N)
    seeds = jnp.take(X, idx, axis=0)                         # [K, M]
    overlap = jnp.dot(_f32(seeds), _f32(X).T,
                      preferred_element_type=jnp.float32)    # [K, N]
    # neighbors share at least one set bit with the (AND of seed and row)
    mask = (overlap > 0).astype(jnp.float32)
    u = mask.sum(axis=1)
    # centroid counts of (X_j AND seed) over neighbors, as in the reference
    s = jnp.einsum("kn,nm,km->km", mask, _f32(X), _f32(seeds))
    D = (s >= jnp.floor(u[:, None] / 2.0)).astype(jnp.int8)
    D = jnp.where((u > 0)[:, None], D, seeds.astype(jnp.int8))
    A = jnp.zeros((N, K), dtype=jnp.int8)
    return D, A


def initialize_partition(key, X, K):
    """Weight-ranked pivot-column partition (bsvd.cpp:173-219), on device.

    Columns ranked by (correct) column weight descending, ties by ascending
    index — the reference's counting-sort tie order (util.cpp:7-51 processes
    back-to-front) composed with its top-down pivot pick.  Atom k = majority
    centroid of the samples hot in the k-th ranked column; u = 0 gives the
    all-ones row like the reference's (s >= 0) comparison.  Deterministic
    (no RNG); exactly equals bsvd_ref.initialize_partition whenever M <= 64
    (where the reference's col_weight loop-bound bug is inert) —
    tests/test_bsvd_tpu.py."""
    N, M = X.shape
    colw = X.astype(jnp.int32).sum(axis=0)               # correct col weight
    # descending weight, ascending index: ascending key = (-w)*M + j
    keyv = (-colw) * M + jnp.arange(M, dtype=jnp.int32)
    pivots = jnp.argsort(keyv)[:min(K, M)]
    users = X[:, pivots].astype(jnp.float32).T           # [K', N]
    u = users.sum(axis=1)
    s = jnp.dot(users, _f32(X), preferred_element_type=jnp.float32)
    D = (s >= jnp.floor(u[:, None] / 2.0)).astype(jnp.int8)
    if D.shape[0] < K:                                   # K > M: zero-pad
        D = jnp.pad(D, ((0, K - D.shape[0]), (0, 0)))
    A = jnp.zeros((N, K), dtype=jnp.int8)
    return D, A


def _graph_grow_from_seeds(X, seed_idx, K):
    """Device core of graph-grow given the K seed row indices.

    The reference's score-never-reset quirk (bsvd.cpp:334-338) collapses its
    'best newcomer' search to *the first untaken nonzero row*, so phase 2 is
    a deterministic round-robin deal: untaken nonzero rows in ascending
    index order go to atoms 0..K-1 cyclically, then all-zero rows (which
    only increment the part sizes u[k]) fill the remaining deals.  One
    segment-sum matmul forms every part centroid."""
    N, M = X.shape
    taken = jnp.zeros((N,), bool).at[seed_idx].set(True)
    wrow = X.astype(jnp.int32).sum(axis=1)
    dealt = (~taken) & (wrow > 0)
    t = jnp.cumsum(dealt.astype(jnp.int32)) - 1          # deal rank per row
    atom = jnp.where(dealt, t % K, -1)
    onehot = jax.nn.one_hot(atom, K, dtype=jnp.float32)  # -1 -> all-zero row
    s = jnp.dot(onehot.T, _f32(X), preferred_element_type=jnp.float32)
    s = s + _f32(X[seed_idx])
    nnz = dealt.sum()
    deals_total = N - K                                  # every row assigned
    k_ar = jnp.arange(K)
    extra = (deals_total // K) + (k_ar < (deals_total % K))
    u = 1 + extra                                        # zero rows count too
    D = (s >= jnp.floor(u[:, None].astype(jnp.float32) / 2.0)).astype(
        jnp.int8)
    A = jnp.zeros((N, K), dtype=jnp.int8)
    return D, A


def initialize_graph_grow(key, X, K, seed_idx=None):
    """Support-graph growing init (bsvd.cpp:286-383), TPU formulation.

    seed_idx overrides the K random seed rows (the conformance tests inject
    the reference's rand48 draws to get bit-equal centroids)."""
    N, M = X.shape
    if seed_idx is None:
        seed_idx = jax.random.choice(key, N, (K,), replace=False)
    return _graph_grow_from_seeds(X, jnp.asarray(seed_idx, jnp.int32), K)


INITIALIZERS = {
    "neighbor": initialize_neighbor,
    "random_centroids": initialize_random_centroids,
    "random": initialize_random,
    "partition": initialize_partition,
    "graph_grow": initialize_graph_grow,
}

@dataclass
class LearnConfig:
    K: int = 64
    init: str = "neighbor"
    dict_update: str = "steepest"
    max_iters: int = 30
    seed: int = 34503498  # the reference's global default (bsvd.cpp:23)


def residual(X, D, A):
    """E = X ^ (A*D mod 2) via the MXU."""
    prod = jnp.dot(_f32(A), _f32(D), preferred_element_type=jnp.float32)
    return X ^ jnp.mod(prod, 2.0).astype(X.dtype)


@partial(jax.jit, static_argnames=("dict_update", "max_iters", "distances"))
def learn_from(X, D, A, dict_update: str = "steepest", max_iters: int = 30,
               distances: str = "mxu"):
    """learn_model_traditional from a given (D, A) state — the
    learn_model_inner unit the MDL drivers re-enter (bsvd.cpp:1215-1244,
    1515).  Returns (E, D, A, iters)."""
    E = residual(X, D, A)

    def body(state):
        E, D, A, it, changed = state
        E, A, ch_coefs = update_coefficients(E, D, A, distances=distances)
        if dict_update == "proximus":
            E, D, A, ch_atoms = update_dictionary_proximus(E, D, A)
        else:
            E, D, ch_atoms = update_dictionary_steepest(E, D, A)
        return E, D, A, it + 1, ch_coefs + ch_atoms

    def cond(state):
        _, _, _, it, changed = state
        return (changed > 0) & (it < max_iters)

    E, D, A, iters, _ = lax.while_loop(
        cond, body, (E, D, A, jnp.int32(0), jnp.int32(1)))
    return E, D, A, iters


@partial(jax.jit, static_argnames=("K", "init", "dict_update", "max_iters",
                                   "distances"))
def learn(X, K: int, init: str = "neighbor", dict_update: str = "steepest",
          max_iters: int = 30, seed: int = 34503498,
          distances: str = "mxu"):
    """learn_model_traditional (bsvd.cpp:1215-1244): alternate coef/dict
    updates until nothing changes (bounded by max_iters).  X: int8 [N, M].

    Returns (E, D, A, iters)."""
    key = jax.random.PRNGKey(seed)
    D, A = INITIALIZERS[init](key, X, K)
    return learn_from(X, D, A, dict_update=dict_update,
                      max_iters=max_iters, distances=distances)


@partial(jax.jit, static_argnames=("K", "init", "variant", "dict_update",
                                   "max_iters"))
def learn_alter(X, K: int, init: str = "neighbor", variant: int = 1,
                dict_update: str = "steepest", max_iters: int = 10,
                seed: int = 34503498):
    """Role-switching learning loops (learn_model_alter1/2/3,
    bsvd.cpp:1247-1434) on device.

    The transposed model treats A^T as the dictionary of the transposed
    residual (X^T ~ D^T A^T): variant 1 alternates a direct update pass
    with a transposed pass each outer iteration; variant 2 runs each
    orientation to convergence before switching; variant 3 applies only the
    dictionary update in both orientations (the reference's
    'for use with Proximus' mode).  Returns (E, D, A, iters)."""
    key = jax.random.PRNGKey(seed)
    D, A = INITIALIZERS[init](key, X, K)
    E = residual(X, D, A)

    def direct(E, D, A):
        E, A, c1 = update_coefficients(E, D, A)
        if dict_update == "proximus":
            E, D, A, c2 = update_dictionary_proximus(E, D, A)
        else:
            E, D, c2 = update_dictionary_steepest(E, D, A)
        return E, D, A, c1 + c2

    def transposed(E, D, A):
        Et, Dt, At = E.T, A.T, D.T   # role switch: dict' = A^T
        if variant != 3:
            Et, At2, _ = update_coefficients(Et, Dt, At)
            At = At2
        if dict_update == "proximus":
            Et, Dt, At, ch = update_dictionary_proximus(Et, Dt, At)
        else:
            Et, Dt, ch = update_dictionary_steepest(Et, Dt, At)
        return Et.T, At.T, Dt.T, ch

    def to_convergence(step, E, D, A):
        """Repeat `step` until it reports no change (bounded); returns the
        state plus the TOTAL change count of the sweep."""
        def cond(s):
            return (s[3] > 0) & (s[5] < max_iters)

        def sbody(s):
            E, D, A, _, tot, it = s
            E, D, A, ch = step(E, D, A)
            return E, D, A, ch, tot + ch, it + 1

        E, D, A, _, tot, _ = lax.while_loop(
            cond, sbody, (E, D, A, jnp.int32(1), jnp.int32(0),
                          jnp.int32(0)))
        return E, D, A, tot

    def body(state):
        E, D, A, it, _ = state
        if variant == 3:
            E, D, A, ch1 = transposed(E, D, A)
            if dict_update == "proximus":
                E, D, A, ch2 = update_dictionary_proximus(E, D, A)
            else:
                E, D, ch2 = update_dictionary_steepest(E, D, A)
        elif variant == 2:
            # alter2: each orientation runs to convergence before switching
            E, D, A, ch1 = to_convergence(direct, E, D, A)
            E, D, A, ch2 = to_convergence(transposed, E, D, A)
        else:
            E, D, A, ch1 = direct(E, D, A)
            E, D, A, ch2 = transposed(E, D, A)
        return E, D, A, it + 1, ch1 + ch2

    def cond(state):
        _, _, _, it, changed = state
        return (changed > 0) & (it < max_iters)

    E, D, A, iters, _ = lax.while_loop(
        cond, body, (E, D, A, jnp.int32(0), jnp.int32(1)))
    # re-derive E so the invariant E == X ^ AD holds exactly on exit
    return residual(X, D, A), D, A, iters


def learn_mdl_forward(X, K0: int = 4, init: str = "neighbor",
                      dict_update: str = "steepest", seed: int = 34503498,
                      max_k: int = 256, stuck_limit: int = 10,
                      verbose: bool = False):
    """MDL forward selection on device (bsvd.cpp:1463-1546): grow the
    dictionary one atom at a time — the new atom initialized from the
    CURRENT residual, the whole model re-learned — keeping the best MDL
    codelength, with the reference's stuck-counter + mean-deviation
    heuristic.  The K-growing loop is host Python (each K is a different
    compiled shape); all heavy math is the jitted learn_from.

    Returns (E, D, A, bestL)."""
    X = jnp.asarray(X, jnp.int8)
    key = jax.random.PRNGKey(seed)
    E, D, A, _ = learn(X, K0, init=init, dict_update=dict_update, seed=seed)
    bestL = float(model_codelength(E, D, A))
    best = (E, D, A)
    currD, currA = D, A
    currE = E
    stuck = sum_stuck = all_stuck = 0
    K = K0
    while stuck < stuck_limit and K < max_k:
        dev = (sum_stuck // all_stuck) if all_stuck else 0
        key, sub = jax.random.split(key)
        # one new atom from the current residual (initialize_model on E)
        atomD, _ = INITIALIZERS[init](sub, currE, 1)
        currD = jnp.concatenate([currD, atomD.astype(currD.dtype)], axis=0)
        currA = jnp.pad(currA, ((0, 0), (0, 1)))
        currE, currD, currA, _ = learn_from(X, currD, currA,
                                            dict_update=dict_update)
        currL = float(model_codelength(currE, currD, currA))
        if verbose:
            print(f"currK={K + 1} currL={currL:.0f} bestL={bestL:.0f} "
                  f"stuck={stuck} dev={dev}")
        if currL + dev < bestL:
            stuck = 0
            bestL = currL
            best = (currE, currD, currA)
        else:
            stuck += 1
            all_stuck += 1
            sum_stuck += currL - bestL
        K += 1
    E, D, A = best
    return E, D, A, bestL


def learn_mdl_backward(X, K0: int = 32, init: str = "random_centroids",
                       dict_update: str = "steepest", seed: int = 34503498,
                       stuck_limit: int = 10):
    """MDL backward selection on device (bsvd.cpp:1548-1663): start big and
    greedily remove the atom whose removal most lowers the codelength,
    re-learning after each removal, while the stuck-counter heuristic
    allows.  The removal scores for ALL atoms come from one matmul:
    |E ^ Ak (x) Dk| = |E| + |Ak||Dk| - 2 diag(A^T E D^T), with
    diag = rowsum((A^T @ E) * D).

    Returns (E, D, A, bestL)."""
    from ..ops.entropy import universal_codelength_jnp as ucl
    X = jnp.asarray(X, jnp.int8)
    N, M = X.shape
    E, D, A, _ = learn(X, K0, init=init, dict_update=dict_update, seed=seed)
    bestL = float(model_codelength(E, D, A))
    best = (E, D, A)
    stuck = sum_stuck = all_stuck = 0
    currD, currA, currE = D, A, E
    while currD.shape[0] > 1:
        dev = (sum_stuck // all_stuck) if all_stuck else 0
        K = currD.shape[0]
        # removal scores, all atoms at once
        wA = currA.sum(axis=0, dtype=jnp.float32)             # [K]
        wD = currD.sum(axis=1, dtype=jnp.float32)             # [K]
        AtE = jnp.dot(_f32(currA).T, _f32(currE),
                      preferred_element_type=jnp.float32)     # [K, M]
        overlap = (AtE * _f32(currD)).sum(axis=1)             # diag(A^T E D^T)
        wE = currE.sum(dtype=jnp.float32)
        wEk = wE + wA * wD - 2.0 * overlap                    # |E ^ Ak(x)Dk|
        tmpL = (ucl(N * M, wEk)
                - ucl(M, currD.sum(axis=1, dtype=jnp.int32))
                - ucl(N, currA.sum(axis=0, dtype=jnp.int32)))
        nextk = int(jnp.argmin(tmpL))
        keep = np.array([k for k in range(K) if k != nextk])
        nextD = jnp.take(currD, keep, axis=0)
        nextA = jnp.take(currA, keep, axis=1)
        currE, currD, currA, _ = learn_from(X, nextD, nextA,
                                            dict_update=dict_update)
        currL = float(model_codelength(currE, currD, currA))
        if currL + dev < bestL:
            stuck = 0
            bestL = currL
            best = (currE, currD, currA)
        else:
            stuck += 1
            all_stuck += 1
            sum_stuck += currL - bestL
            if stuck >= stuck_limit:
                break
    E, D, A = best
    return E, D, A, bestL


def learn_mdl_full(X, Kmax: int = 40, Kstep: int = 20, reps: int = 10,
                   init: str = "random_centroids",
                   dict_update: str = "steepest", seed: int = 34503498):
    """MDL full search (bsvd.cpp:1665-1717) on device: sweep K in steps of
    Kstep with `reps` random restarts each, keep the best codelength.  (The
    reference 'reseeds' a global its RNG singleton never re-reads — the
    stream just continues; here every restart genuinely forks the key.)

    Returns (E, D, A, bestL)."""
    X = jnp.asarray(X, jnp.int8)
    key = jax.random.PRNGKey(seed)
    best = None
    bestL = None
    K = Kstep
    while K <= Kmax:
        for _ in range(reps):
            key, sub = jax.random.split(key)
            D0, A0 = INITIALIZERS[init](sub, X, K)
            E, D, A, _ = learn_from(X, D0, A0, dict_update=dict_update)
            L = float(model_codelength(E, D, A))
            if bestL is None or L < bestL:
                bestL = L
                best = (E, D, A)
        K += Kstep
    E, D, A = best
    return E, D, A, bestL


def learn_train_step(E, D, A):
    """One alternation step (coef sweep + dict update) — the unit the
    multi-chip dryrun shards (parallel/mesh.py)."""
    E, A, _ = update_coefficients(E, D, A, max_flips=4)
    E, D, _ = update_dictionary_steepest(E, D, A)
    return E, D, A


def model_codelength(E, D, A):
    """MDL score (bsvd.cpp:1438-1461) on device."""
    from ..ops.entropy import universal_codelength_jnp as ucl
    N, M = E.shape
    K = D.shape[0]
    LE = ucl(N * M, E.sum(dtype=jnp.int32))
    LD = ucl(M, D.sum(axis=1, dtype=jnp.int32)).sum()
    LA = ucl(N, A.sum(axis=0, dtype=jnp.int32)).sum()
    return LE + LD + LA


def patchify_to_rows(img_bits, W: int):
    """image -> X rows (N x W^2 int8), the bsvd_test -I 1 path
    (bsvd_test.cpp:78-100)."""
    tiles = bitpack.patchify(jnp.asarray(img_bits), W)
    n = tiles.shape[0]
    return tiles.reshape(n, W * W).astype(jnp.int8)
