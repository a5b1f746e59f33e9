"""BICA multi-page archive: the corpus configs of BASELINE.json (#4, #5).

Layout:  "BICA" | u32 n_pages | u64 offsets[n_pages] (byte offset of each
page blob from payload start) | page blobs (each a standalone BIC1 stream).

Encoding batches same-shaped pages through the vmapped device analysis
(models/compress.encode_batch); on a pod slice each host encodes its page
shard (parallel/multihost.page_shard_bounds) and offsets come from the
all-gathered per-page byte counts (multihost.merge_host_offsets) — payloads
are then laid out without any re-scan.  Random access decode per page.
"""

from __future__ import annotations

import struct

import numpy as np

from . import codec as codec_mod
from . import compress as compress_mod
from .codec import CodecParams

MAGIC = b"BICA"


def encode_archive(pages, params: CodecParams | None = None, *,
                   batch_size: int = 8, use_tpu: bool = True) -> bytes:
    """pages: iterable of bool [rows, cols] arrays (shapes may differ;
    same-shaped runs are batched on device)."""
    params = params or CodecParams(codec=8, strict=False)
    pages = [np.asarray(p, dtype=bool) for p in pages]
    blobs: list[bytes] = [b""] * len(pages)
    if use_tpu and params.codec == 8 and not params.strict:
        # group by shape, batch each group
        groups: dict[tuple, list[int]] = {}
        for i, p in enumerate(pages):
            groups.setdefault(p.shape, []).append(i)
        for shape, idxs in groups.items():
            for s in range(0, len(idxs), batch_size):
                chunk = idxs[s: s + batch_size]
                arr = np.stack([pages[i] for i in chunk])
                for i, b in zip(chunk,
                                compress_mod.encode_batch(arr, params)):
                    blobs[i] = b
    else:
        for i, p in enumerate(pages):
            blobs[i] = codec_mod.encode(p, params)
    offsets = np.zeros(len(blobs), dtype=np.uint64)
    pos = 0
    for i, b in enumerate(blobs):
        offsets[i] = pos
        pos += len(b)
    head = MAGIC + struct.pack("<I", len(blobs)) + offsets.tobytes()
    return head + b"".join(blobs)


def page_count(blob: bytes) -> int:
    if blob[:4] != MAGIC:
        raise ValueError("not a BICA archive")
    return struct.unpack("<I", blob[4:8])[0]


def decode_page(blob: bytes, index: int) -> np.ndarray:
    """Random-access decode of one page."""
    n = page_count(blob)
    if not 0 <= index < n:
        raise IndexError(index)
    offs = np.frombuffer(blob, dtype=np.uint64, count=n, offset=8)
    payload = 8 + 8 * n
    start = payload + int(offs[index])
    end = payload + int(offs[index + 1]) if index + 1 < n else len(blob)
    return codec_mod.decode(blob[start:end])


def decode_archive(blob: bytes, *, workers: int | None = None
                   ) -> list[np.ndarray]:
    """Decode all pages, in parallel across host cores.

    Page streams are independent and the native decoder releases the GIL
    for the duration of the ctypes call, so a thread pool gives real
    parallelism without pickling page payloads."""
    import os
    from concurrent.futures import ThreadPoolExecutor
    n = page_count(blob)
    if workers is None:
        workers = min(n, os.cpu_count() or 1)
    if n <= 1 or workers <= 1:
        return [decode_page(blob, i) for i in range(n)]
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(lambda i: decode_page(blob, i), range(n)))
