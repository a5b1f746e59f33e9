"""C++ native runtime: equivalence with the Python bitstream layer."""

import ctypes
import os

import numpy as np
import pytest

from binary_image_compression_tpu import native
from binary_image_compression_tpu.models import codec
from binary_image_compression_tpu.ops import bitstream as bs
from binary_image_compression_tpu.utils import pnm

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native lib unavailable")


def test_enum_matches_python(rng):
    lib = native.get_lib()
    for n, w in [(16, 0), (16, 16), (64, 3), (256, 37), (256, 200),
                 (1024, 511), (100, 1)]:
        bits = np.zeros(n, np.uint8)
        bits[rng.choice(n, w, replace=False)] = 1
        out = np.zeros(n, np.uint8)
        lib.bic_enum_roundtrip(
            bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        np.testing.assert_array_equal(out, bits)
        assert lib.bic_enum_nbits(n, w) == bs.enum_nbits(n, w)


@pytest.mark.parametrize("cid,strict", [(8, False), (8, True), (7, True),
                                        (4, True), (6, False)])
def test_native_decode_matches_python(cid, strict):
    img = pnm.read_pbm(os.path.join(FIX, "text64.pbm"))
    p = codec.CodecParams(codec=cid, W=8, R=32, strict=strict)
    blob = codec.encode(img, p)
    a = codec.decode(blob)                      # native path
    b = codec.decode(blob, use_native=False)    # python path
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, img)


def test_native_decode_ragged():
    img = pnm.read_pbm(os.path.join(FIX, "ragged75x101.pbm"))
    blob = codec.encode(img, codec.CodecParams(codec=8, W=8, R=32))
    np.testing.assert_array_equal(codec.decode(blob), img)


def test_native_decode_rejects_truncated():
    img = pnm.read_pbm(os.path.join(FIX, "text64.pbm"))
    blob = codec.encode(img, codec.CodecParams(codec=8, W=8, R=32))
    assert native.decode_windowed(blob[:40], 64, 64) is None


@pytest.mark.parametrize("cid,strict", [(4, True), (6, False), (7, True),
                                        (8, True), (8, False)])
def test_native_encoder_matches_python(cid, strict):
    from binary_image_compression_tpu.models.codec import _encode_windowed
    img = pnm.read_pbm(os.path.join(FIX, "text64.pbm"))
    p = codec.CodecParams(codec=cid, W=8, R=32, strict=strict)
    assert _encode_windowed(img, p, use_native=True) == \
        _encode_windowed(img, p, use_native=False)
