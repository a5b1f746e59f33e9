"""Causal GF(2) prediction (MED / XOR-gradient) on packed uint32 lanes.

The reference's ``med`` (pred.cpp:3-15, duplicated in coding.cpp:5-17 and in
compress7/8_test.cpp:44-56) computes, bit-serially, the residual

    r(i,j) = P(i,j) ^ P(i-1,j) ^ P(i,j-1) ^ P(i-1,j-1)

with order-1 fallbacks on the first row/column.  That is exactly

    r = (1 + S_row)(1 + S_col) P      over GF(2),

where S_row / S_col shift in zeros from above / from the left.  The author's
comment "can be very quickly implemented at block level using binary
operators" (pred.cpp:4-5) is realized here: the forward pass is three packed
shifts + XORs (HBM-bandwidth bound), and the inverse is the prefix-XOR scan
(1+S)^-1 = 1+S+S^2+... along each axis — associative_scan over rows, a
log-shift Kogge-Stone sweep within words plus a word-carry scan along columns.

Deviation from the reference (documented in DEVIATIONS.md): the reference
never writes pP(0,0), leaving whatever heap garbage the allocation held; with
zero-initialized memory that bit reads 0.  We define r(0,0) = P(0,0) (zero
prediction at the origin), which makes the transform exactly self-inverse.
``origin_zero=True`` reproduces the zero-heap reference behaviour for
codelength parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import bitpack
from .bitpack import LANE


def _shift_right_1bit(x: jnp.ndarray) -> jnp.ndarray:
    """Shift every packed row right by one bit position (col j -> j+1).

    MSB-first layout: moving to a higher column index is a logical >> within a
    word, with the LSB of word w-1 carried into the MSB of word w.
    """
    shifted = x >> jnp.uint32(1)
    carry = (x & jnp.uint32(1)) << jnp.uint32(LANE - 1)
    carry = jnp.concatenate(
        [jnp.zeros_like(carry[..., :1]), carry[..., :-1]], axis=-1)
    return shifted | carry


def _shift_down_1row(x: jnp.ndarray) -> jnp.ndarray:
    """Shift rows down by one (row i -> i+1), zero-filling the first row."""
    return jnp.concatenate(
        [jnp.zeros_like(x[..., :1, :]), x[..., :-1, :]], axis=-2)


def med_forward(packed: jnp.ndarray, cols: int, *,
                origin_zero: bool = False) -> jnp.ndarray:
    """MED residual of a packed bit image [..., rows, nwords(cols)]."""
    up = _shift_down_1row(packed)
    left = _shift_right_1bit(packed)
    upleft = _shift_right_1bit(up)
    r = packed ^ up ^ left ^ upleft
    r = r & jnp.asarray(bitpack.trail_mask(cols))
    if origin_zero:
        # reference leaves pP(0,0) unwritten (pred.cpp:6); zero-heap semantics
        r = r.at[..., 0, 0].set(r[..., 0, 0] & jnp.uint32(0x7FFFFFFF))
    return r


def _prefix_xor_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Within-row prefix XOR across the bit axis of packed words.

    Kogge-Stone inside each word (log2(32) shift/xor steps), then a word-level
    carry scan: each word is XORed with the running parity of all preceding
    words in its row.
    """
    # intra-word inclusive prefix-xor, MSB-first: bit k accumulates bits 0..k
    for s in (1, 2, 4, 8, 16):
        x = x ^ (x >> jnp.uint32(s))
    # word parity = lowest bit of the intra-prefix (prefix over all 32 bits)
    parity = x & jnp.uint32(1)
    # exclusive scan of parities along the word axis
    carry = jnp.cumsum(parity, axis=-1, dtype=jnp.uint32) - parity
    carry = (carry & jnp.uint32(1)) * jnp.uint32(0xFFFFFFFF)
    return x ^ carry


def med_inverse(residual: jnp.ndarray, cols: int) -> jnp.ndarray:
    """Exact inverse of med_forward: P = prefix-xor rows . prefix-xor cols."""
    x = _prefix_xor_bits(residual)
    x = jax.lax.associative_scan(jnp.bitwise_xor, x, axis=-2)
    return x & jnp.asarray(bitpack.trail_mask(cols))


# ---------------------------------------------------------------------------
# dense-bool twins (oracle for tests; mirror the reference loop semantics)
# ---------------------------------------------------------------------------

def np_med_forward(p: np.ndarray, *, origin_zero: bool = False) -> np.ndarray:
    """Dense-bool oracle of the reference med loop (pred.cpp:3-15)."""
    p = np.asarray(p, dtype=bool)
    r = np.zeros_like(p)
    r[..., 0, 1:] = p[..., 0, 1:] ^ p[..., 0, :-1]
    r[..., 1:, 0] = p[..., 1:, 0] ^ p[..., :-1, 0]
    r[..., 1:, 1:] = (p[..., 1:, 1:] ^ p[..., :-1, 1:]
                      ^ p[..., 1:, :-1] ^ p[..., :-1, :-1])
    r[..., 0, 0] = False if origin_zero else p[..., 0, 0]
    return r


def np_med_inverse(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r, dtype=bool)
    x = np.bitwise_xor.accumulate(r, axis=-1)
    return np.bitwise_xor.accumulate(x, axis=-2)


# ---------------------------------------------------------------------------
# compress6-style matrix predictor pair (D, iD) over vectorized patches
# ---------------------------------------------------------------------------

def predictor_matrices(M: int) -> tuple[np.ndarray, np.ndarray]:
    """The reference's bidiagonal difference matrix D and its inverse iD.

    compress6_test.cpp:64-76 builds D (M x M, ones on the diagonal and the
    first superdiagonal viewed as D[i-1,i]) and iD (upper triangular of ones);
    a vectorized patch row V encodes predictively as V @ D over GF(2).
    Returned packed (uint32) with cols = M.
    """
    D = np.zeros((M, M), dtype=bool)
    iD = np.zeros((M, M), dtype=bool)
    idx = np.arange(M)
    D[idx, idx] = True
    D[idx[:-1], idx[1:]] = True
    iu = np.triu_indices(M)
    iD[iu] = True
    return bitpack.np_pack(D), bitpack.np_pack(iD)
