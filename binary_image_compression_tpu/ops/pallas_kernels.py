"""Pallas TPU kernels for packed-domain hot ops.

The dense-f32 MXU paths (bitpack.dist_matrix, bsvd pursuit) pay a 32x
memory blow-up unpacking bits to floats.  These kernels stay in the packed
uint32 domain: XOR + population_count on the VPU over 32-bit lanes — the
"speed-of-light bitpack throughput" target of BASELINE.json.  The reference
analog is the byte-LUT popcount loop (binmat.cpp:22-37, dist at 499-512).

Kernels fall back to interpret mode off-TPU (tests run on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dist_kernel(a_ref, b_ref, out_ref):
    """out[i, k] += sum_w popcount(a[i, w] ^ b[k, w]) over this word chunk.

    a block: [BN, WC] uint32; b: [K, WC] uint32; out block: [BN, K] int32,
    revisited across the word-chunk grid dimension (zeroed at chunk 0).
    Each step is a [BN, K] VPU xor+popcount+add — lane-aligned, no
    transposes; chunking the word axis bounds live temporaries so wide rows
    (M >= 4096) stay inside the VMEM scope.
    """
    # word-chunk (reduction) dim is the LAST grid dim, so all revisits of
    # one output block are consecutive — Mosaic only keeps an output block
    # resident across consecutive grid steps
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, dtype=jnp.int32)

    nwords = a_ref.shape[1]
    for w in range(nwords):
        aw = a_ref[:, w][:, None]          # [BN, 1]
        bw = b_ref[:, w][None, :]          # [1, K]
        x = jnp.bitwise_xor(aw, bw)        # [BN, K] uint32
        out_ref[:] = out_ref[:] + lax.population_count(x).astype(jnp.int32)


def packed_dist_matrix(a, b, *, block_n: int = 256,
                       interpret: bool | None = None):
    """All-pairs Hamming distances between packed rows, fully packed-domain.

    a: uint32 [N, Wd]; b: uint32 [K, Wd] -> int32 [N, K].
    Equivalent to bitpack.dist_matrix (tested) without the 32x unpack.
    """
    a = jnp.asarray(a, jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    N, Wd = a.shape
    K = b.shape[0]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    bn = min(block_n, N)
    # Mosaic block rule: the word (lane) block must equal the full word
    # axis or be a multiple of 128.  The unrolled word loop keeps ~wc
    # [bn, K] temporaries alive, so very wide rows (Wd >= 128, M >= 4096)
    # blow the 16 MB VMEM scope — callers (bsvd.distances_to_atoms) fall
    # back to the MXU matmul there; the codec patch sizes (M = W^2 <= 1024)
    # are all comfortably inside.
    wc = Wd if Wd <= 128 or Wd % 128 else 128
    npad = -N % bn
    wpad = -Wd % wc
    if npad or wpad:
        a = jnp.pad(a, ((0, npad), (0, wpad)))
        b = jnp.pad(b, ((0, 0), (0, wpad)))
    grid = ((N + npad) // bn, (Wd + wpad) // wc)
    mem = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        _dist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, wc), lambda i, c: (i, c), memory_space=mem),
            pl.BlockSpec((K, wc), lambda i, c: (0, c), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((bn, K), lambda i, c: (i, 0),
                               memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((N + npad, K), jnp.int32),
        interpret=interpret,
    )(a, b)
    return out[:N]


_INF = 2 ** 30
_BIG = 2 ** 30


def _key_span(W: int, R: int) -> int:
    """Scan-key row stride: > any per-row x extent (2R+W+1).

    Keys only ORDER candidates (y desc, x desc within each grid; grid 1
    before grid 2), so the stride needs to exceed the window's x range, not
    the image width — keeping keys small enough that the packed-priority
    layout (packed_sel_layout) fits int32 for ANY image width."""
    return 2 * R + W + 2


def make_select_kernel(W: int, R: int, T_thresh: int, rows: int, cols: int,
                       invert: bool, h: int, w: int):
    """Kernel body for the windowed-search selection (one tile per grid step).

    Fuses ops/search.scan_keys + select_best + the rank/candidate counts into
    a single pass over the tile's [h, w] distance map — the XLA formulation
    materializes ~10 full-size int32 key/mask tensors (26ms/page on a v5e);
    here the key grids live in registers.  Semantics are bit-identical
    (tests/test_pallas.py::test_select_kernel_matches_xla): serial-scan
    early exit at T, strict-< argmin with scan-order tie-break, ranks that
    count the duplicate y=i0-W row entries of both window grids
    (reference scan: compress8_test.cpp:152-198; compress4_test.cpp:96-135).
    """
    def kernel(i0_ref, j0_ref, oy_ref, ox_ref, d_ref, out_ref):
        t = pl.program_id(0)
        out = _selection_scalars(
            d_ref[0], i0_ref[t], j0_ref[t], oy_ref[t], ox_ref[t],
            W=W, R=R, T_thresh=T_thresh, rows=rows,
            cols=cols, invert=invert, h=h, w=w)
        out_ref[0, 0, :] = jnp.stack(out).astype(jnp.int32)

    return kernel


def _selection_rowparts(i0, oy, *, W, R, cols, h, w):
    """Tile-row-invariant pieces of the selection math, hoistable out of a
    kernel's tile loop: y-range masks and scan-order row terms as [h, 1]
    columns (broadcast against per-tile [1, w] column pieces), plus the
    constant flat position grid."""
    span = _key_span(W, R)
    yyc = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0) + oy
    mini2 = jnp.maximum(i0 - W, 0)
    mini = jnp.maximum(i0 - R, 0)
    # no y bound: grid-1 candidates of bottom-edge tiles extend into the
    # zero-padded rows, exactly as the host/native enumeration does
    # (see ops/search.scan_keys); the x bounds are already tight
    rowm1 = (yyc >= mini2) & (yyc <= i0)
    rowm2 = (yyc >= mini) & (yyc <= i0 - W)
    rt1 = (i0 - yyc) * span
    rt2 = (i0 - W - yyc) * span
    flat = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w \
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return rowm1, rowm2, rt1, rt2, flat


def _selection_scalars(d, i0, j0, oy, ox, *, W, R, T_thresh, rows, cols,
                       invert, h, w, rowparts=None):
    """In-register selection math shared by the kernels; returns the 8
    per-tile scalars (bestd, dy, inv, found, rank, n_cands, has_cands, dx).

    Bit-identical to ops/search.scan_keys + select_best + the rank counts
    (the reference serial-scan semantics: early exit at T in scan order,
    strict-< argmin, duplicate y=i0-W row enumerated by both grids)."""
    M = W * W
    maxx = cols - W
    off1 = (W + 2) * _key_span(W, R)
    if rowparts is None:
        rowparts = _selection_rowparts(i0, oy, W=W, R=R, cols=cols, h=h, w=w)
    rowm1, rowm2, rt1, rt2, flat = rowparts
    xxr = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) + ox

    minj = jnp.maximum(j0 - R, 0)
    maxj2 = jnp.maximum(j0 - W, 0)
    maxj = jnp.minimum(j0 + R, maxx)

    colm1 = (xxr >= minj) & (xxr <= maxj2) & (j0 >= W)   # [1, w]
    colm2 = (xxr >= minj) & (xxr <= maxj)
    in1 = rowm1 & colm1                                  # broadcast [h, w]
    in2 = rowm2 & colm2
    ord1 = rt1 + (maxj2 - xxr)
    ord2 = off1 + rt2 + (maxj - xxr)
    key1 = jnp.where(in1, ord1, _INF)
    key2 = jnp.where(in2, ord2, _INF)
    key = jnp.minimum(key1, key2)
    valid = key < _INF

    if invert:
        dp = jnp.minimum(d, M - d)
        inv = (M - d) < d
    else:
        dp = d
        inv = jnp.zeros_like(d, dtype=jnp.bool_)

    stop = valid & (dp <= T_thresh)
    any_stop = jnp.any(stop)
    skmin = jnp.min(jnp.where(stop, key, _INF))
    dmin = jnp.min(jnp.where(valid, dp, _BIG))
    at_min = valid & (dp == dmin)
    mkmin = jnp.min(jnp.where(at_min, key, _INF))
    key_sel = jnp.where(any_stop, skmin, mkmin)
    # unique flat position of the selected key (all-INF -> index 0,
    # matching jnp.argmin over a constant row)
    sel = key == key_sel
    bestidx = jnp.min(jnp.where(sel, flat, _BIG))
    at = flat == bestidx
    bestd = jnp.min(jnp.where(at, dp, _BIG))
    bestinv = jnp.max(jnp.where(at, inv.astype(jnp.int32), 0))
    found = jnp.max(jnp.where(at, valid.astype(jnp.int32), 0))
    rank = (key1 < key_sel).astype(jnp.int32).sum() \
        + (key2 < key_sel).astype(jnp.int32).sum()
    n_cands = in1.astype(jnp.int32).sum() + in2.astype(jnp.int32).sum()
    return (bestd, bestidx // w, bestinv, found, rank, n_cands,
            jnp.any(valid).astype(jnp.int32), bestidx % w)


def packed_sel_layout(W: int, R: int, cols: int):
    """Bit layout for the single-reduction packed selection, or None if the
    (key, distance, inv) triple cannot fit below the int32 INF sentinel.

    The serial-scan selection semantics (stop-first, then lexicographic
    (d', key) argmin) collapse into ONE min-reduction over

        p = stop ? key << (db+1) | d' << 1 | inv            (< FLAG)
                 : FLAG | d' << (kb+1) | key << 1 | inv

    because scan keys are unique per candidate (ord1 < off1 <= ord2 and each
    grid's order is injective), so the packed minimum IS the reference scan
    outcome and the winning candidate's coordinates decode from the key by
    scalar arithmetic.  Keys are window-relative (_key_span), so the layout
    fits for every codec shape (W <= 32, any R up to ~2000, ANY image
    width); callers fall back to the grid selection when it doesn't.

    Requires R >= W: the R+1-row band geometry every device search variant
    shares only covers grid-1 rows i0-W..i0 when R >= W, and the
    closed-form rectangle ranks assume the same (ADVICE r3 item 1;
    models/compress routes R < W to the host encoder)."""
    if R < W:
        return None
    M = W * W
    span = _key_span(W, R)
    off1 = (W + 2) * span
    # grid-2 row terms span (R - W) rows; +1 row of x slack
    keymax = off1 + (R - W + 1) * span
    kb = keymax.bit_length()
    db = M.bit_length()                 # d' <= M
    if db + kb + 3 > 30:                # FLAG | d' | key | inv < INF = 2^30
        return None
    return dict(span=span, off1=off1, kb=kb, db=db,
                flag=1 << (db + kb + 2))


def _packed_window_keys(i0, j0, xxr, rowparts, *, W, R, cols, lay,
                        grids=(1, 2)):
    """Scan keys + validity for broadcastable (i0, j0, xxr) pieces.

    rowparts: (rowm1, rowm2, rt1, rt2) column pieces shaped to broadcast
    against xxr (the caller expands dims for group shapes).  Returns
    (key = min(key1, key2), valid).

    grids restricts which window grids contribute (static): the strict
    kernel's phase split computes grid 2 (rows <= i0-W, finalized at row
    start) in a batched pass and grid 1 (the live same-row scan) serially;
    a cell in BOTH grids then contributes its two priorities separately,
    whose min equals the combined per-cell min (keys couple identically)."""
    rowm1, rowm2, rt1, rt2 = rowparts
    off1 = lay["off1"]
    maxx = cols - W
    minj = jnp.maximum(j0 - R, 0)
    maxj2 = jnp.maximum(j0 - W, 0)
    maxj = jnp.minimum(j0 + R, maxx)
    key1 = key2 = None
    if 1 in grids:
        colm1 = (xxr >= minj) & (xxr <= maxj2) & (j0 >= W)
        in1 = rowm1 & colm1
        key1 = jnp.where(in1, rt1 + (maxj2 - xxr), _INF)
    if 2 in grids:
        colm2 = (xxr >= minj) & (xxr <= maxj)
        in2 = rowm2 & colm2
        key2 = jnp.where(in2, off1 + rt2 + (maxj - xxr), _INF)
    if key1 is None:
        return key2, key2 < _INF
    if key2 is None:
        return key1, key1 < _INF
    return jnp.minimum(key1, key2), (key1 < _INF) | (key2 < _INF)


def _packed_priority(d, key, valid, *, M, T_thresh, invert, lay):
    """The packed (stop, d', key, inv) priority grid to be min-reduced."""
    kb, db = lay["kb"], lay["db"]
    FLAG = jnp.int32(lay["flag"])
    if invert:
        dp = jnp.minimum(d, M - d)
        invb = ((M - d) < d).astype(jnp.int32)
    else:
        dp = d
        invb = jnp.zeros_like(d)
    keyv = jnp.where(valid, key, 0)     # keep shifts in-range off-window
    stop = dp <= T_thresh
    dinv = (dp << 1) | invb
    p = jnp.where(stop, (keyv << (db + 1)) | dinv,
                  FLAG | (dp << (kb + 1)) | (keyv << 1) | invb)
    return jnp.where(valid, p, _INF)


def _packed_decode(pr, i0, j0, oy, *, W, R, cols, lay):
    """Decode a packed-priority minimum into the 8 selection outputs.

    ONE implementation shared by the scalar (strict kernel) and the
    group-vectorized (fused kernel) packed paths — the bit layout, the
    key->coordinate decode and the closed-form rectangle rank/count
    arithmetic must stay bit-identical between them (ADVICE r3 item 3).
    pr/i0/j0/oy are mutually broadcastable int32 (scalars or [G, 1])."""
    span, off1 = lay["span"], lay["off1"]
    kb, db = lay["kb"], lay["db"]
    FLAG = jnp.int32(lay["flag"])
    maxx = cols - W
    minj = jnp.maximum(j0 - R, 0)
    maxj2 = jnp.maximum(j0 - W, 0)
    maxj = jnp.minimum(j0 + R, maxx)

    found = (pr < _INF).astype(jnp.int32)
    is_stop = pr < FLAG
    kmask = jnp.int32((1 << kb) - 1)
    dmask = jnp.int32((1 << db) - 1)
    key_sel = jnp.where(is_stop, pr >> (db + 1), (pr >> 1) & kmask)
    bestd = jnp.where(is_stop, (pr >> 1) & dmask, (pr >> (kb + 1)) & dmask)
    inv_s = pr & 1

    # decode the winning candidate's (y, x) from its scan key
    g2 = key_sel >= off1
    q = jnp.where(g2, key_sel - off1, key_sel)
    ry = lax.div(q, jnp.int32(span))                 # q >= 0
    xt = q - ry * span
    y = jnp.where(g2, i0 - W - ry, i0 - ry)
    x = jnp.where(g2, maxj - xt, maxj2 - xt)
    dy = jnp.where(found == 1, y - oy, 0)
    dx = jnp.where(found == 1, x, 0)
    inv_s = jnp.where(found == 1, inv_s, 0)
    bestd = jnp.where(found == 1, bestd, 0)

    # closed-form candidate counts: both window grids are rectangles in
    # (scan-row, scan-col) space, fully covered by the band (R >= W is
    # guaranteed by packed_sel_layout)
    r1 = jnp.minimum(W, i0) + 1
    c1 = jnp.where(j0 >= W, maxj2 - minj + 1, 0)
    r2 = jnp.maximum(i0 - W - jnp.maximum(i0 - R, 0) + 1, 0)
    c2 = maxj - minj + 1
    n_cands = r1 * c1 + r2 * c2

    def count_lt(ks, c, r):
        # |{(ry, xt): 0<=ry<r, 0<=xt<c, ry*span + xt < ks}| (c < span)
        nf = jnp.clip(jnp.where(ks >= c, lax.div(ks - c, jnp.int32(span))
                                + 1, 0), 0, r)
        rem = jnp.clip(ks - nf * span, 0, c)
        part = jnp.where(nf < r, rem, 0)
        return jnp.where((c > 0) & (ks > 0), nf * c + part, 0)

    rank = count_lt(key_sel, c1, r1) + \
        count_lt(jnp.where(g2, key_sel - off1, jnp.int32(-1)), c2, r2)
    rank = jnp.where(found == 1, rank, 0)
    has_cands = (n_cands > 0).astype(jnp.int32)
    return (bestd, dy, inv_s, found, rank, n_cands, has_cands, dx)


def _selection_scalars_packed(d, i0, j0, oy, *, W, R, T_thresh, cols,
                              invert, w, lay, rowparts=None, x0=0):
    """Packed-priority selection: bit-identical outputs to
    _selection_scalars but with ONE grid reduction (jnp.min over the packed
    priority) instead of ~10, and the rank / candidate counts as closed-form
    scalar rectangle arithmetic instead of masked grid sums.

    d: [h, w] distances for band columns x0..x0+w-1 (x0 static); the band
    must cover every in-window candidate row (oy <= i0 - R when unclamped)
    and column (callers chunk with plan_groups)."""
    M = W * W
    if rowparts is None:
        span = lay["span"]
        yyc = jax.lax.broadcasted_iota(jnp.int32, (d.shape[0], 1), 0) + oy
        rowm1 = (yyc >= jnp.maximum(i0 - W, 0)) & (yyc <= i0)
        rowm2 = (yyc >= jnp.maximum(i0 - R, 0)) & (yyc <= i0 - W)
        rt1 = (i0 - yyc) * span
        rt2 = (i0 - W - yyc) * span
    else:
        rowm1, rowm2, rt1, rt2 = rowparts[:4]
    xxr = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) + x0
    key, valid = _packed_window_keys(i0, j0, xxr, (rowm1, rowm2, rt1, rt2),
                                     W=W, R=R, cols=cols, lay=lay)
    p = _packed_priority(d, key, valid, M=M, T_thresh=T_thresh,
                         invert=invert, lay=lay)
    pr = jnp.min(p)                                  # the ONE reduction
    return _packed_decode(pr, i0, j0, oy, W=W, R=R, cols=cols, lay=lay)


def _selection_packed_group(d, i0, j0v, oy, *, W, R, T_thresh, cols,
                            invert, lay, rowparts, x0=0):
    """Group-vectorized packed selection: d is [G, wh, w] for G tiles of
    one tile row (shared i0/oy, per-tile j0v [G, 1, 1]; band columns
    x0..x0+w-1, x0 static).  Returns the 8 outputs as int32 [G, 1] columns.
    Same bit-exact semantics as _selection_scalars_packed (shared priority
    packing + decode), but one Mosaic op stream serves G tiles."""
    M = W * W
    rowm1, rowm2, rt1, rt2 = rowparts[:4]            # [wh, 1] pieces
    G, wh, w = d.shape
    xxr = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2) + x0
    key, valid = _packed_window_keys(
        i0, j0v, xxr, (rowm1[None], rowm2[None], rt1[None], rt2[None]),
        W=W, R=R, cols=cols, lay=lay)
    p = _packed_priority(d, key, valid, M=M, T_thresh=T_thresh,
                         invert=invert, lay=lay)
    pr = jnp.min(jnp.min(p, axis=2), axis=1, keepdims=True)   # [G, 1]
    j0c = j0v.reshape(G, 1)
    i0c = jnp.zeros((G, 1), jnp.int32) + i0
    return _packed_decode(pr, i0c, j0c, oy, W=W, R=R, cols=cols, lay=lay)


def select_windows(d, i0, j0, oy, ox, *, W: int, R: int, T_thresh: int,
                   rows: int, cols: int, invert: bool,
                   interpret: bool | None = None):
    """Pallas windowed-search selection over per-tile distance maps.

    d: int32 [T, h, w]; i0/j0/oy/ox: int32 [T].  Returns a dict with
    bestd/dy/dx/bestinv/found/rank/n_cands/has_cands, each int32 [T] —
    drop-in for the scan_keys + select_best + rank XLA stage ((dy, dx) are
    the selected candidate's window-relative offsets, i.e. bestidx divmod w).
    """
    d = jnp.asarray(d, jnp.int32)
    T, h, w = d.shape
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    sc = lambda a: jnp.asarray(a, jnp.int32).reshape(T)
    kernel = make_select_kernel(W, R, T_thresh, rows, cols, invert, h, w)
    vmem = pl.ANY if interpret else pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0),
                         memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((1, 1, 8), lambda i, *_: (i, 0, 0),
                               memory_space=vmem),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 1, 8), jnp.int32),
        interpret=interpret,
    )(sc(i0), sc(j0), sc(oy), sc(ox), d)
    out = out[:, 0, :]
    return dict(bestd=out[:, 0], dy=out[:, 1], dx=out[:, 7],
                bestinv=out[:, 2].astype(jnp.bool_),
                found=out[:, 3].astype(jnp.bool_), rank=out[:, 4],
                n_cands=out[:, 5], has_cands=out[:, 6].astype(jnp.bool_))


# ---------------------------------------------------------------------------
# fused windowed search: bit-field XOR+popcount + selection, no HBM maps
# ---------------------------------------------------------------------------

def _field_plane(img, W: int, He: int, We: int):
    """E[y, x] = the W-bit row field img[y, x:x+W] as a uint32 (bits W-1..0).

    Row-im2col in packed form: W shift-ors over the 0/1 image — the whole
    patch bank the search needs, at 1/Wth the footprint of a dense im2col."""
    gh, gw = img.shape
    imgp = jnp.zeros((He, We + W), jnp.uint32)
    imgp = lax.dynamic_update_slice(imgp, img.astype(jnp.uint32), (0, 0))
    E = jnp.zeros((He, We), jnp.uint32)
    for a in range(W):
        E = E | (imgp[:, a:a + We] << (W - 1 - a))
    return E


def plan_groups(nx: int, W: int, R: int, We: int, wh: int,
                g_env: int = 0):
    """Static x-chunked tile groups for the fused kernel.

    Returns (G, [(g0, Gs, xs, span), ...]): tiles [g0, g0+Gs) of a tile row
    evaluate band columns [xs, xs+span) — a STATIC slice (Mosaic allows
    static lane offsets; 128-aligned keeps vreg layouts clean) covering the
    union of the group's search windows [g0*W - R, (g0+Gs-1)*W + R + W).
    This removes the full-band arithmetic waste (~1.6x at 512^2/R128, more
    on wider pages) that the round-3 kernel paid because per-TILE dynamic
    lane offsets are not expressible.

    G is chosen, among candidates in (16, 8, 4, 2, 1) whose ~6 live
    [G, wh, span] int32 temporaries fit a 12 MB VMEM budget AND that emit at
    most 32 op streams per tile row (compile-time guard for wide grids), by
    MINIMUM TOTAL LANE OPS, tie-broken toward the SMALLEST G — the
    128-aligned spans make op totals identical for G <= 8 at production
    shapes, and the smaller live temporaries pipeline better (round-4
    on-chip A/B: G=1 at 1.12-1.21 ms/page vs G=4 at 1.21-1.32).  g_env
    (BIC_FUSED_GROUP) overrides — read at TRACE time: changing the env var
    after the jit cache is warm has no effect (re-run the process for A/B
    sweeps)."""
    def r128(v):
        return -(-v // 128) * 128

    def mk(G):
        groups = []
        for g0 in range(0, nx, G):
            Gs = min(G, nx - g0)
            lo = max(0, g0 * W - R)
            hi = min(We, (g0 + Gs - 1) * W + R + W)
            xs = (lo // 128) * 128
            span = min(We - xs, r128(hi - xs))
            groups.append((g0, Gs, xs, span))
        return groups

    if g_env:
        return min(g_env, nx), mk(min(g_env, nx))
    # Among VMEM-fitting choices with at most 32 op streams per tile row
    # (compile-time guard for wide grids), pick minimum total lane ops,
    # tie-broken toward the SMALLEST G: the 128-aligned spans make the op
    # totals identical for G <= 8 at production shapes, and the on-chip
    # A/B (round 4, 512^2/W16/R128, min-of-3 differential) measured G=1 at
    # 1.12-1.21 ms/page vs 1.21-1.32 for G=4 — the smaller live [G, wh,
    # span] temporaries pipeline better under Mosaic than fewer, fatter
    # streams.
    cands = []
    for G in (16, 8, 4, 2, 1):
        Gq = min(G, nx)
        groups = mk(Gq)
        mx = max(sp for _, _, _, sp in groups)
        tot = sum(Gs * sp for _, Gs, _, sp in groups)
        fits = 6 * Gq * wh * mx * 4 <= 12 * 2 ** 20
        cands.append((Gq, groups, tot, fits, len(groups)))
    ok = ([c for c in cands if c[3] and c[4] <= 32]
          or [c for c in cands if c[3]] or [cands[-1]])
    best = min(ok, key=lambda c: (c[2], c[0]))
    return best[0], best[1]


def fused_supported(ny: int, nx: int, W: int, R: int) -> bool:
    """Whether the fused kernel covers this shape.

    Requirements: W <= 32 (a tile-row field per uint32 lane), R >= W (the
    R+1-row band geometry misses grid-1 rows above i0-R otherwise — every
    device search variant shares this; models/compress routes R < W to the
    host encoder), and the per-row band block [R+nit, nx*W] u32 within a
    4 MB VMEM budget.  The round-3 SMEM cap (~4000 tiles at W=16) is gone:
    the per-tile field words are a VMEM operand now, not scalar prefetch."""
    if W > 32 or R < W:
        return False
    k = next((kk for kk in (4, 3, 2) if W * kk <= 32 and W % kk == 0), 1)
    nit = W // k
    return (R + nit) * nx * W * 4 <= 4 * 2 ** 20


def fused_search_select(img_bits, i0, j0, ny: int, nx: int, *, W: int,
                        R: int, T_thresh: int, rows: int, cols: int,
                        invert: bool, y_base=None, with_plane: bool = False,
                        interpret: bool | None = None):
    """The codec windowed search as ONE Pallas kernel per tile row.

    Replaces the distance-map + scan-key + selection XLA pipeline (which
    materializes O(T * (R+1) * (2R+W+1)) int32 tensors several times over —
    62ms/page on a v5e at 512^2/W16/R128): candidates are W-bit row fields
    XOR+popcounted against the tile rows directly from a row-band in VMEM,
    and the serial-scan selection (ops/search.select_best semantics) runs
    in-register — as the single packed-priority reduction of
    _selection_packed_group over G-tile groups when the bit layout fits
    (packed_sel_layout), else the masked-grid _selection_scalars.  Tile
    groups are unrolled with STATIC x-chunked band slices (plan_groups), so
    each tile only pays for the columns its window can reach.  The only HBM
    traffic is the field plane E (4 B/pixel) and 8 scalars per tile.
    Reference hot loop: compress8_test.cpp:152-198.

    img_bits: 0/1 [ny*W, nx*W] padded tile grid.  Requires W <= 32 and
    R >= W (fused_supported; models/compress falls back to the banded MXU
    variant / host encoder otherwise).  Returns (sel dict as select_windows,
    oy [T], ox [T]); with_plane=True also returns the field plane E for the
    caller's field-domain finish (models/compress._finish_selection_fields).

    y_base: optional traced scalar — the ABSOLUTE image row of img_bits row
    0 (may be negative).  Under parallel/tileshard the frame is a shard's
    halo-extended block: bands/gathers stay frame-relative while the causal
    masks and scan-order ranks use absolute coordinates, so sharded streams
    match the single-device enumeration exactly.
    """
    assert W <= 32, "fused search packs one tile row per uint32 lane"
    assert R >= W, "band geometry covers grid-1 rows only for R >= W"
    img = jnp.asarray(img_bits, jnp.uint32)
    gh, gw = img.shape
    T = ny * nx
    wh = R + 1
    Hp = gh - W + 1
    pad_h = max(0, wh - Hp)
    He = gh + pad_h
    We = gw
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    E = _field_plane(img, W, He, We)
    # multi-field lane packing: k W-bit row fields share one uint32 lane
    # (rows a, a+nit, .., a+(k-1)*nit), so ONE xor+popcount accumulates k
    # row distances at once — the inner loop shrinks from W to nit = W/k
    # steps (2x at W=16, 4x at W=8) with bit-identical sums (popcount is
    # oblivious to the field boundary; the fields never interact under ^).
    k = next((kk for kk in (4, 3, 2) if W * kk <= 32 and W % kk == 0), 1)
    nit = W // k
    if k > 1:
        Ex = jnp.pad(E, ((0, W), (0, 0)))
        P = jnp.zeros((He, We), jnp.uint32)
        for m in range(k):
            P = P | (Ex[m * nit:m * nit + He] << (W * (k - 1 - m)))
    else:
        P = E
    bh = R + nit
    yb = jnp.asarray([0 if y_base is None else y_base], jnp.int32)
    i0r = jnp.asarray(i0, jnp.int32).reshape(ny, nx)[:, :1]      # [ny, 1]
    oyr = jnp.clip(i0r - R, 0, max(Hp + pad_h - wh, 0))          # [ny, 1]
    bands = jax.vmap(
        lambda o: lax.dynamic_slice(P, (o, 0), (bh, We)))(oyr[:, 0])
    aoff = jnp.arange(nit, dtype=jnp.int32)
    trow = P[jnp.asarray(i0)[:, None] + aoff[None, :],
             jnp.asarray(j0)[:, None]].reshape(ny, nx, nit)

    vmem = pl.ANY if interpret else pltpu.VMEM

    lay = packed_sel_layout(W, R, cols)
    import os as _os
    genv = int(_os.environ.get("BIC_FUSED_GROUP", "0"))
    # NOTE: env knobs are read at TRACE time (jit caches the compiled
    # kernel) — changing them mid-process does not retrace; restart the
    # process for A/B runs (ADVICE r3 item 5)
    G, groups = plan_groups(nx, W, R, We, wh, genv)
    # per-tile field words: SMEM scalar-prefetch when the footprint fits
    # (Mosaic accounts prefetched operands at ~64 B/element; SMEM scalar
    # reads are cheaper than VMEM element loads), else a VMEM operand —
    # which is what lets wide grids (the round-3 ~1500-tile cap) stay on
    # the fused kernel at all
    tenv = _os.environ.get("BIC_FUSED_TROW", "")
    trow_smem = (ny * nx * nit * 64 <= 768 * 1024 if tenv == ""
                 else tenv == "smem")

    def kernel(yb_ref, i0_ref, oy_ref, trow_ref, band_ref, out_ref):
        # same positional order whether trow rides scalar prefetch (SMEM,
        # whole [ny, nx, nit] array) or a VMEM operand (per-row block)
        r = pl.program_id(0)
        i0s = i0_ref[r] + yb_ref[0]   # absolute coordinates for the masks
        oys = oy_ref[r] + yb_ref[0]

        rowparts = _selection_rowparts(i0s, oys, W=W, R=R, cols=cols,
                                       h=wh, w=We)

        def tv_splat(t, a):
            # per-tile field word splatted to [1, wh, 1]: Mosaic cannot
            # broadcast along sublanes and lanes in one op, so lanes stay
            # 1 here and the xor below broadcasts them
            w0 = trow_ref[r, t, a] if trow_smem else trow_ref[0, t, a]
            return jnp.zeros((1, wh, 1), jnp.uint32) + w0

        for g0, Gs, xs, span in groups:      # static unroll
            j0v = (jax.lax.broadcasted_iota(jnp.int32, (Gs, 1, 1), 0)
                   + g0) * W
            acc = jnp.zeros((Gs, wh, span), jnp.int32)
            for a in range(nit):   # k row fields per lane (see packing)
                tv = jnp.concatenate([tv_splat(g0 + g, a)
                                      for g in range(Gs)], axis=0)
                x = band_ref[0, a:a + wh, xs:xs + span][None] ^ tv
                acc = acc + lax.population_count(x).astype(jnp.int32)
            if lay is not None:
                outs = _selection_packed_group(
                    acc, i0s, j0v, oys, W=W, R=R, T_thresh=T_thresh,
                    cols=cols, invert=invert, lay=lay,
                    rowparts=rowparts, x0=xs)
                out_ref[0, g0:g0 + Gs, :] = jnp.concatenate(
                    outs, axis=1).astype(jnp.int32)
            else:
                # masked-grid fallback (packed layout doesn't fit): per
                # tile, dx/dy decode from the chunk-relative flat argmin
                flat = jax.lax.broadcasted_iota(
                    jnp.int32, (wh, span), 0) * span +                     jax.lax.broadcasted_iota(jnp.int32, (wh, span), 1)
                rp = rowparts[:4] + (flat,)
                for g in range(Gs):
                    outs = list(_selection_scalars(
                        acc[g], i0s, jnp.int32((g0 + g) * W), oys,
                        jnp.int32(xs), W=W, R=R, T_thresh=T_thresh,
                        rows=rows, cols=cols, invert=invert, h=wh,
                        w=span, rowparts=rp))
                    outs[7] = outs[7] + xs   # dx: chunk -> absolute column
                    out_ref[0, g0 + g:g0 + g + 1, :] = jnp.stack(
                        outs).astype(jnp.int32).reshape(1, 8)

    if trow_smem:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,   # yb, i0r, oyr, trow
            grid=(ny,),
            in_specs=[
                pl.BlockSpec((1, bh, We), lambda r, *_: (r, 0, 0),
                             memory_space=vmem),
            ],
            out_specs=pl.BlockSpec((1, nx, 8), lambda r, *_: (r, 0, 0),
                                   memory_space=vmem),
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ny,),
            in_specs=[
                pl.BlockSpec((1, nx, nit), lambda r, *_: (r, 0, 0),
                             memory_space=vmem),
                pl.BlockSpec((1, bh, We), lambda r, *_: (r, 0, 0),
                             memory_space=vmem),
            ],
            out_specs=pl.BlockSpec((1, nx, 8), lambda r, *_: (r, 0, 0),
                                   memory_space=vmem),
        )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ny, nx, 8), jnp.int32),
        interpret=interpret,
    )(yb, i0r[:, 0], oyr[:, 0], trow, bands)
    out = out.reshape(T, 8)
    sel = dict(bestd=out[:, 0], dy=out[:, 1], dx=out[:, 7],
               bestinv=out[:, 2].astype(jnp.bool_),
               found=out[:, 3].astype(jnp.bool_), rank=out[:, 4],
               n_cands=out[:, 5], has_cands=out[:, 6].astype(jnp.bool_))
    oy_full = jnp.broadcast_to(oyr, (ny, nx)).reshape(T)
    ox_full = jnp.zeros((T,), jnp.int32)
    if with_plane:
        # the single-field plane E (already computed for the kernel) lets
        # the caller finish in the FIELD domain: candidate/tile patches are
        # [T, W] uint32 gathers instead of [T, W, W] dense-pixel gathers
        return sel, oy_full, ox_full, E
    return sel, oy_full, ox_full


def _weight_kernel(a_ref, out_ref):
    """Row popcounts of a packed block."""
    acc = lax.population_count(a_ref[:]).astype(jnp.int32)
    out_ref[:] = acc.sum(axis=1, keepdims=True)


def packed_row_weight(a, *, block_n: int = 512, interpret: bool | None = None):
    """Row weights of packed rows via Pallas (uint32 popcount reduce)."""
    a = jnp.asarray(a, jnp.uint32)
    N, Wd = a.shape
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    bn = min(block_n, N)
    npad = -N % bn
    if npad:
        a = jnp.pad(a, ((0, npad), (0, 0)))
    out = pl.pallas_call(
        _weight_kernel,
        grid=((N + npad) // bn,),
        in_specs=[pl.BlockSpec((bn, Wd), lambda i: (i, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, 1), lambda i: (i, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + npad, 1), jnp.int32),
        interpret=interpret,
    )(a)
    return out[:N, 0]
