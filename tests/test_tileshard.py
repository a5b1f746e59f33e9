"""Tile-row-sharded single-image analysis: byte parity with the
single-device encoder on the virtual CPU mesh (SURVEY.md §2.10 spatial
parallelism; BASELINE config #4)."""

import os

import numpy as np
import jax
import pytest

from binary_image_compression_tpu.models import codec, compress
from binary_image_compression_tpu.parallel import mesh as pmesh
from binary_image_compression_tpu.parallel import tileshard
from binary_image_compression_tpu.utils import pnm

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _mesh():
    return pmesh.make_mesh(len(jax.devices()), data=len(jax.devices()),
                           model=1)


@pytest.mark.parametrize("image,W,R", [("text256.pbm", 16, 64),
                                       ("text64.pbm", 8, 16)])
def test_tile_sharded_stream_matches_single_device(image, W, R):
    img = pnm.read_pbm(os.path.join(FIX, image))
    p = codec.CodecParams(codec=8, W=W, R=R, strict=False)
    m = _mesh()
    blob = tileshard.encode_tile_sharded(m, img, p)
    assert blob == compress.encode(img, p)
    np.testing.assert_array_equal(codec.decode(blob), img)


def test_tile_sharded_multihop_halo():
    """R spanning several shard blocks (multi-hop ppermute halo)."""
    img = pnm.read_pbm(os.path.join(FIX, "text256.pbm"))
    p = codec.CodecParams(codec=8, W=8, R=120, strict=False)
    m = _mesh()  # 8 shards x 32 rows: halo needs ceil(120/32) = 4 hops
    blob = tileshard.encode_tile_sharded(m, img, p)
    assert blob == compress.encode(img, p)


def test_tile_sharded_ragged_rows():
    """Tile-row count not divisible by the shard count (pad + drop)."""
    img = pnm.read_pbm(os.path.join(FIX, "ragged75x101.pbm"))
    p = codec.CodecParams(codec=8, W=8, R=24, strict=False)
    m = _mesh()  # ny = 10 tile rows over 8 shards -> pad to 16
    blob = tileshard.encode_tile_sharded(m, img, p)
    assert blob == compress.encode(img, p)
    np.testing.assert_array_equal(codec.decode(blob), img)
