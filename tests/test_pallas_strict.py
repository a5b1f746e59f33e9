"""Strict-mode Pallas kernel: byte parity with the host strict encoder.

The residual-substitution chain (compress8_test.cpp:294-300) runs entirely
inside one Mosaic kernel (ops/pallas_strict); streams must equal
codec.encode(strict=True) bit-for-bit, including the adaptive Golomb
context replay and the in-place residual feedback into later searches."""

import os

import numpy as np
import pytest

from binary_image_compression_tpu.models import codec, compress
from binary_image_compression_tpu.ops import pallas_strict
from binary_image_compression_tpu.utils import pnm

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.parametrize("image,W,R", [("text64.pbm", 8, 16),
                                       ("text64.pbm", 8, 32),
                                       ("text64.pbm", 8, 12),
                                       ("text64.pbm", 16, 21),
                                       ("ragged75x101.pbm", 8, 24)])
def test_strict_kernel_matches_host(image, W, R):
    img = pnm.read_pbm(os.path.join(FIX, image))
    p = codec.CodecParams(codec=8, W=W, R=R, strict=True)
    assert pallas_strict.supported(W, R)
    tpu = compress.encode_strict(img, p)
    assert tpu == codec.encode(img, p)
    np.testing.assert_array_equal(codec.decode(tpu), img)


def test_strict_kernel_residual_feedback(rng):
    """An image with repeated tiles forces matches whose residuals earlier
    tiles substituted — exercising the live-plane mutation path."""
    base = (rng.rand(16, 16) < 0.4)
    img = np.tile(base, (6, 6))
    img[40:48, 40:48] ^= True
    p = codec.CodecParams(codec=8, W=8, R=40, strict=True)
    tpu = compress.encode_strict(img, p)
    assert tpu == codec.encode(img, p)
    np.testing.assert_array_equal(codec.decode(tpu), img)


def test_strict_unsupported_geometry_falls_back():
    """W outside {8, 16, 24, 32} routes to the fast native host encoder —
    NOT the pathologically-compiling lax.scan (VERDICT r2 item 8).  Any R
    is kernel-supported now (geometry radius padded to a multiple of 8,
    masks exact)."""
    img = pnm.read_pbm(os.path.join(FIX, "text64.pbm"))
    assert pallas_strict.supported(8, 12)      # R % 8 != 0: now in-kernel
    assert not pallas_strict.supported(20, 100)
    p = codec.CodecParams(codec=8, W=20, R=100, strict=True)
    import time
    t0 = time.time()
    blob = compress.encode_strict(img, p)
    assert time.time() - t0 < 30, "fallback must be the fast host encoder"
    assert blob == codec.encode(img, p)
    np.testing.assert_array_equal(codec.decode(blob), img)


def test_split_and_monolithic_kernels_identical():
    """The round-5 grid-1/grid-2 phase split (grid-2 distances batched per
    tile row off the serial chain — legal because grid-2 candidates read
    only rows finalized before the row starts, and a tile's own rows are
    untouched until its own substitution) must be bit-identical to the
    monolithic kernel, including on residual-feedback-heavy content."""
    import numpy as np
    from binary_image_compression_tpu.ops import pallas_strict
    rng = np.random.RandomState(11)
    # image built to force matches whose residuals then feed later searches
    base = (rng.rand(16, 64) < 0.4)
    img = np.vstack([base, base ^ (rng.rand(16, 64) < 0.05),
                     base, (rng.rand(16, 64) < 0.4)])
    grid = img.astype(np.uint32)
    kw = dict(W=8, R=16, T_thresh=2, rows=64, cols=64, gh=64, gw=64,
              invert=True, use_pred=True, interpret=True)
    import jax
    argv = [kw[k] for k in ("W", "R", "T_thresh", "rows", "cols",
                            "gh", "gw", "invert", "use_pred", "interpret")]
    o1, r1 = jax.device_get(pallas_strict._jitted(*argv, split=0)(grid))
    for sp in (1, 2):   # 1 = fori tail, 2 = unrolled static-chunk tail
        o2, r2 = jax.device_get(pallas_strict._jitted(*argv,
                                                      split=sp)(grid))
        np.testing.assert_array_equal(o1, o2, err_msg=f"split={sp}")
        np.testing.assert_array_equal(r1, r2, err_msg=f"split={sp}")
