"""PBM (P4) / PGM (P2, P5) / PPM (P6) image IO straight to packed arrays.

Replaces the reference's pbm.{h,cpp} and pnm.{h,cpp} (reference:
pbm.cpp:4-77, pnm.cpp:20-239).  Readers are vectorized numpy (np.unpackbits
on the raster — no per-pixel loops); PBM rasters deserialize directly into
the framework's MSB-first uint32 lane layout, so read->write round-trips are
byte-identical with the reference's writer (write_pbm, pbm.cpp:54-77).

Writer conventions matched to the reference:
  * PBM header "P4\\n<cols> <rows>\\n" (pbm.cpp:55)
  * per-row byte padding, partial final byte flushed high-bits-first
  * PGM P5 16-bit is big-endian (pnm.cpp:66-73)
"""

from __future__ import annotations

import io
import re

import numpy as np

from ..ops import bitpack


def _read_token(f) -> bytes:
    """Read one whitespace-delimited token, skipping '#' comments."""
    tok = b""
    while True:
        c = f.read(1)
        if not c:
            break
        if c == b"#":
            f.readline()
            continue
        if c.isspace():
            if tok:
                break
            continue
        tok += c
    return tok


def read_pbm(path_or_file) -> np.ndarray:
    """Read a P4 PBM into bool [rows, cols] (1 = black, as in the raster)."""
    f = open(path_or_file, "rb") if not hasattr(path_or_file, "read") \
        else path_or_file
    try:
        magic = f.read(2)
        if magic != b"P4":
            raise ValueError(f"not a P4 PBM: magic={magic!r}")
        cols = int(_read_token(f))
        rows = int(_read_token(f))
        bpr = (cols + 7) // 8
        raster = np.frombuffer(f.read(bpr * rows), dtype=np.uint8)
        if raster.size < bpr * rows:
            raise ValueError("truncated PBM raster")
        bits = np.unpackbits(raster.reshape(rows, bpr), axis=1)
        return bits[:, :cols].astype(bool)
    finally:
        if f is not path_or_file:
            f.close()


def write_pbm(bits: np.ndarray, path_or_file) -> None:
    """Write bool [rows, cols] as P4, byte-identical with pbm.cpp:54-77."""
    bits = np.asarray(bits, dtype=bool)
    rows, cols = bits.shape
    raster = np.packbits(bits, axis=1)  # MSB-first with zero padding per row
    header = f"P4\n{cols} {rows}\n".encode()
    if hasattr(path_or_file, "write"):
        path_or_file.write(header + raster.tobytes())
    else:
        with open(path_or_file, "wb") as f:
            f.write(header + raster.tobytes())


def read_pbm_packed(path_or_file):
    """Read a PBM directly into (uint32 packed [rows, w], rows, cols)."""
    bits = read_pbm(path_or_file)
    return bitpack.np_pack(bits), bits.shape[0], bits.shape[1]


def write_pbm_packed(packed: np.ndarray, cols: int, path_or_file) -> None:
    write_pbm(bitpack.np_unpack(np.asarray(packed), cols), path_or_file)


# ---------------------------------------------------------------------------
# PGM / PPM
# ---------------------------------------------------------------------------

def read_pnm(path_or_file):
    """Read P2/P5 PGM or P6 PPM.

    Returns (array, maxval): PGM -> uint32 [rows, cols]; PPM -> uint32
    [rows, cols] with 0xRRGGBB packing, matching the reference's pixel_t
    convention (pnm.cpp:214).
    """
    f = open(path_or_file, "rb") if not hasattr(path_or_file, "read") \
        else path_or_file
    try:
        magic = f.read(2)
        if magic not in (b"P2", b"P5", b"P6"):
            raise ValueError(f"unsupported PNM magic {magic!r}")
        cols = int(_read_token(f))
        rows = int(_read_token(f))
        maxval = int(_read_token(f))
        n = rows * cols
        if magic == b"P2":
            data = np.array(f.read().split()[:n], dtype=np.uint32)
            return data.reshape(rows, cols), maxval
        if magic == b"P5":
            if maxval < 256:
                raw = np.frombuffer(f.read(n), dtype=np.uint8)
                return raw.astype(np.uint32).reshape(rows, cols), maxval
            raw = np.frombuffer(f.read(2 * n), dtype=">u2")
            return raw.astype(np.uint32).reshape(rows, cols), maxval
        raw = np.frombuffer(f.read(3 * n), dtype=np.uint8).reshape(rows, cols, 3)
        packed = ((raw[..., 0].astype(np.uint32) << 16)
                  | (raw[..., 1].astype(np.uint32) << 8)
                  | raw[..., 2].astype(np.uint32))
        return packed, maxval
    finally:
        if f is not path_or_file:
            f.close()


def write_pgm(img: np.ndarray, maxval: int, path_or_file, *,
              binary: bool = True) -> None:
    """Write a PGM; binary=True -> P5 (big-endian when maxval >= 256)."""
    img = np.asarray(img)
    rows, cols = img.shape
    kind = b"P5" if binary else b"P2"
    header = kind + f"\n{cols} {rows}\n{maxval}\n".encode()
    if binary:
        payload = (img.astype(np.uint8).tobytes() if maxval < 256
                   else img.astype(">u2").tobytes())
    else:
        # reference P2 writer: tab-separated, newline every 20 (pnm.cpp:110-117)
        buf = io.StringIO()
        flat = img.ravel()
        for i, v in enumerate(flat):
            buf.write(f"{int(v)}\t")
            if (i + 1) % 20 == 0:
                buf.write("\n")
        payload = buf.getvalue().encode()
    if hasattr(path_or_file, "write"):
        path_or_file.write(header + payload)
    else:
        with open(path_or_file, "wb") as f:
            f.write(header + payload)


def write_ppm(img_rgb_packed: np.ndarray, maxval: int, path_or_file) -> None:
    """Write 0xRRGGBB-packed uint32 [rows, cols] as binary P6 (pnm.cpp:224)."""
    img = np.asarray(img_rgb_packed, dtype=np.uint32)
    rows, cols = img.shape
    rgb = np.stack([(img >> 16) & 0xFF, (img >> 8) & 0xFF, img & 0xFF],
                   axis=-1).astype(np.uint8)
    header = f"P6\n{cols} {rows}\n{maxval}\n".encode()
    if hasattr(path_or_file, "write"):
        path_or_file.write(header + rgb.tobytes())
    else:
        with open(path_or_file, "wb") as f:
            f.write(header + rgb.tobytes())
