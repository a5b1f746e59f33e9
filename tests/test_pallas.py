"""Pallas packed-domain kernels vs the bitpack oracle (interpret mode on CPU;
the compiled TPU path is validated in-bench)."""

import numpy as np
import pytest

from binary_image_compression_tpu.ops import pallas_kernels as pk
from binary_image_compression_tpu.ops import bitpack as bp


def test_packed_dist_matrix(rng):
    A = rng.rand(77, 130) < 0.4
    B = rng.rand(33, 130) < 0.6
    d = np.asarray(pk.packed_dist_matrix(bp.np_pack(A), bp.np_pack(B)))
    expect = (A[:, None, :] ^ B[None, :, :]).sum(-1)
    np.testing.assert_array_equal(d, expect)


def test_packed_dist_matrix_blocking(rng):
    A = rng.rand(300, 64) < 0.5
    B = rng.rand(16, 64) < 0.5
    d = np.asarray(pk.packed_dist_matrix(bp.np_pack(A), bp.np_pack(B),
                                         block_n=128))
    expect = (A[:, None, :] ^ B[None, :, :]).sum(-1)
    np.testing.assert_array_equal(d, expect)


def test_packed_row_weight(rng):
    A = rng.rand(200, 257) < 0.3
    w = np.asarray(pk.packed_row_weight(bp.np_pack(A)))
    np.testing.assert_array_equal(w, A.sum(1))


def test_select_kernel_matches_xla(rng):
    """Fused selection kernel == scan_keys+select_best+rank (bit-exact)."""
    import jax.numpy as jnp
    from binary_image_compression_tpu.ops import search, pallas_kernels
    from binary_image_compression_tpu.models import compress
    W, R, T_thresh = 8, 16, 2
    rows = cols = 64
    img = jnp.asarray((rng.rand(rows, cols) < 0.3).astype("int8"))
    i0, j0, ny, nx = search.tile_origins(rows, cols, W)
    d, oy, ox = search.window_distance_maps_banded(img, i0, j0, W, R, ny, nx)
    for invert in (True, False):
        a = compress._select_and_pack(
            img, d, (i0, j0, oy, ox), (i0, j0, oy, ox), W=W, R=R,
            T_thresh=T_thresh, invert=invert, rows=rows, cols=cols,
            selector="pallas")
        b = compress._select_and_pack(
            img, d, (i0, j0, oy, ox), (i0, j0, oy, ox), W=W, R=R,
            T_thresh=T_thresh, invert=invert, rows=rows, cols=cols,
            selector="xla")
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"invert={invert} {k}")


@pytest.mark.parametrize("case", [
    # rows, cols, W, R, T_thresh, invert, density
    (64, 64, 16, 24, 1, True, 0.3),
    (100, 90, 16, 32, 5, True, 0.1),      # ragged dims
    (48, 48, 8, 16, 0, True, 0.5),
    (96, 128, 32, 40, 2, True, 0.2),
    (80, 80, 16, 128, 1, True, 0.05),     # R larger than the image
    (33, 70, 16, 24, 300, False, 0.4),    # huge T: every candidate stops
    (64, 200, 8, 16, 1, True, 0.3),       # x-chunked bands (nc > 1)
    (48, 250, 8, 16, 2, True, 0.2),       # x-chunked + ragged tile pad
])
def test_packed_selection_matches_grid(rng, case):
    """The single-reduction packed-priority selection (closed-form ranks,
    key-decoded coordinates) is bit-identical to the masked-grid selection
    inside the fused kernel."""
    import unittest.mock as mock

    import jax.numpy as jnp

    from binary_image_compression_tpu.ops import search
    rows, cols, W, R, T_thresh, invert, density = case
    ny, nx = -(-rows // W), -(-cols // W)
    grid = np.zeros((ny * W, nx * W), dtype=np.int8)
    grid[:rows, :cols] = rng.rand(rows, cols) < density
    i0, j0, ny, nx = search.tile_origins(rows, cols, W)
    assert pk.packed_sel_layout(W, R, cols) is not None
    outs = {}
    for name, lay_fn in (("packed", pk.packed_sel_layout),
                         ("grid", lambda *a: None)):
        with mock.patch.object(pk, "packed_sel_layout", lay_fn):
            sel, _, _ = pk.fused_search_select(
                jnp.asarray(grid), i0, j0, ny, nx, W=W, R=R,
                T_thresh=T_thresh, rows=rows, cols=cols, invert=invert)
            outs[name] = {k: np.asarray(v) for k, v in sel.items()}
    for k in outs["grid"]:
        np.testing.assert_array_equal(outs["grid"][k], outs["packed"][k],
                                      err_msg=k)


@pytest.mark.parametrize("dims", [
    (75, 101, 8, 24),     # ragged dims, single chunk
    (64, 230, 8, 16),     # x-chunked bands with a padded final chunk
])
def test_fused_search_matches_banded(rng, dims):
    """One-kernel search (field XOR+popcount + in-register selection) ==
    banded-MXU maps + selection, on ragged dims."""
    import jax
    import jax.numpy as jnp
    from binary_image_compression_tpu.models import compress
    rows, cols, W, R = dims
    img = (rng.rand(rows, cols) < 0.35)
    ny, nx = -(-rows // W), -(-cols // W)
    grid = np.zeros((ny * W, nx * W), np.int8)
    grid[:rows, :cols] = img
    kw = dict(W=W, R=R, T_thresh=1, rows=rows, cols=cols)
    a = jax.device_get(compress.encode_analyze(jnp.asarray(grid),
                                               variant="fused", **kw))
    b = jax.device_get(compress.encode_analyze(jnp.asarray(grid),
                                               variant="banded", **kw))
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_fused_supported_wide_grids_and_layout():
    """Round-4: the per-tile field words are a VMEM operand (no SMEM
    scalar-prefetch cap), and scan keys are window-relative, so the fused
    kernel + packed selection cover wide pages that round 3 routed to the
    banded fallback."""
    # 2048x2048 at W=16: T = 16384 tiles — far beyond the old ~1536 cap
    assert pk.fused_supported(128, 128, 16, 128)
    assert pk.packed_sel_layout(16, 128, 2048) is not None
    assert pk.packed_sel_layout(16, 128, 100000) is not None
    # R < W: band geometry cannot cover grid-1 rows — not supported
    assert not pk.fused_supported(8, 8, 16, 8)
    assert pk.packed_sel_layout(16, 8, 512) is None


def test_plan_groups_op_count_planner():
    """Round-4 planner: minimum total lane ops, tie-broken toward the
    smallest G (on-chip A/B: smaller live temporaries pipeline better),
    with a 32-streams-per-row compile-time cap for wide grids."""
    wh = 129
    for nx, want_g, max_streams in ((32, 1, 32), (64, 2, 32),
                                    (128, 4, 32), (1, 1, 1)):
        G, groups = pk.plan_groups(nx, 16, 128, nx * 16, wh)
        assert G == want_g, (nx, G)
        assert len(groups) <= max_streams
    # within the streams cap, the planner never picks a choice with MORE
    # total ops than per-tile chunking (G=1)
    for nx in (5, 17, 32):
        G, groups = pk.plan_groups(nx, 16, 128, nx * 16, wh)
        tot = sum(gs * sp for _, gs, _, sp in groups)
        g1 = sum(gs * sp for _, gs, _, sp in pk.plan_groups(
            nx, 16, 128, nx * 16, wh, 1)[1])
        assert tot <= g1


def test_plan_groups_cover_windows():
    """Every tile's search window columns lie inside its group's static
    band chunk, and chunk offsets are 128-aligned."""
    for nx, W, R in ((32, 16, 128), (128, 16, 128), (7, 8, 16),
                     (64, 32, 64)):
        We = nx * W
        G, groups = pk.plan_groups(nx, W, R, We, R + 1)
        seen = set()
        for g0, Gs, xs, span in groups:
            assert xs % 128 == 0 and xs + span <= We
            for g in range(Gs):
                t = g0 + g
                seen.add(t)
                lo = max(0, t * W - R)
                hi = min(We, t * W + R + W)
                assert xs <= lo and hi <= xs + span, (nx, W, R, t)
        assert seen == set(range(nx))


def test_r_less_than_w_routes_to_host(rng):
    """R < W params produce host-encoder streams (bit-exact round trip);
    encode_analyze refuses them (ADVICE r3 item 1)."""
    import pytest
    import jax.numpy as jnp
    from binary_image_compression_tpu.models import codec, compress
    img = rng.rand(48, 64) < 0.3
    p = codec.CodecParams(codec=8, W=16, R=8, strict=False)
    blob = compress.encode(img, p)
    assert blob == codec.encode(img, p)
    assert (codec.decode(blob) == img).all()
    blobs = compress.encode_batch(img[None], p)
    assert blobs[0] == blob
    with pytest.raises(ValueError, match="R >= W"):
        compress.encode_analyze(jnp.asarray(img, jnp.int8), W=16, R=8,
                                T_thresh=1, rows=48, cols=64)
