"""BICA multi-page archive: the corpus configs of BASELINE.json (#4, #5).

Layout:  "BICA" | u32 n_pages | u64 offsets[n_pages] (byte offset of each
page blob from payload start) | page blobs (each a standalone BIC1 stream).

`encode_pages` is THE batched page engine: same-shaped pages batch through
the vmapped device analysis (models/compress.encode_batch); it is shared by
the single-host archive writer below and the multi-host shard encoder
(parallel/multihost.encode_corpus_sharded), so the 2-process test exercises
the same code path as the archive bench.

Elastic encode (the reference has nothing here; BASELINE configs #4/#5 imply
hour-scale corpus runs): `encode_archive(checkpoint=path)` appends each
finished batch's blobs to a crash-safe journal — a fingerprinted append-only
log whose truncated tail record (a mid-write kill) is discarded on resume —
and a restarted run re-encodes only the missing pages, producing a final
archive byte-identical to an uninterrupted one (tests/test_archive_resume).
Random access decode per page.
"""

from __future__ import annotations

import hashlib
import os
import struct
import zlib

import numpy as np

from . import codec as codec_mod
from . import compress as compress_mod
from .codec import CodecParams

MAGIC = b"BICA"
JOURNAL_MAGIC = b"BICJ"


def encode_pages(pages, params: CodecParams | None = None, *,
                 batch_size: int = 8, use_tpu: bool = True,
                 done: dict[int, bytes] | None = None,
                 after_batch=None) -> list[bytes]:
    """Encode a page list; same-shaped runs are batched on device.

    pages: iterable of bool [rows, cols] arrays (shapes may differ).
    done: already-encoded {index: blob} to skip (resume support).
    after_batch(new: dict[int, bytes]): called after every finished batch
    with that batch's blobs (checkpoint hook)."""
    params = params or CodecParams(codec=8, strict=False)
    pages = [np.asarray(p, dtype=bool) for p in pages]
    blobs: list[bytes] = [b""] * len(pages)
    done = done or {}
    for i, b in done.items():
        if 0 <= i < len(pages):
            blobs[i] = b
    todo = [i for i in range(len(pages)) if not blobs[i]]
    if use_tpu and params.codec == 8 and not params.strict:
        # group by shape, batch each group
        groups: dict[tuple, list[int]] = {}
        for i in todo:
            groups.setdefault(pages[i].shape, []).append(i)
        for shape, idxs in groups.items():
            for s in range(0, len(idxs), batch_size):
                chunk = idxs[s: s + batch_size]
                arr = np.stack([pages[i] for i in chunk])
                new = dict(zip(chunk, compress_mod.encode_batch(arr, params)))
                for i, b in new.items():
                    blobs[i] = b
                if after_batch is not None:
                    after_batch(new)
    else:
        for s in range(0, len(todo), batch_size):
            chunk = todo[s: s + batch_size]
            new = {i: codec_mod.encode(pages[i], params) for i in chunk}
            for i, b in new.items():
                blobs[i] = b
            if after_batch is not None:
                after_batch(new)
    return blobs


def _corpus_fingerprint(pages, params: CodecParams) -> bytes:
    """Identity of (corpus, codec settings) for checkpoint validity."""
    h = hashlib.sha256()
    h.update(repr((params.codec, params.W, params.T, params.R,
                   params.strict, len(pages))).encode())
    for p in pages:
        h.update(struct.pack("<IIi", p.shape[0], p.shape[1],
                             zlib.crc32(np.packbits(p).tobytes())
                             & 0x7FFFFFFF))
    return h.digest()


def _journal_read(path: str, fp: bytes) -> dict[int, bytes]:
    """Blobs recovered from an append-only journal; a truncated tail record
    (crash mid-append) is silently discarded.  Empty on fingerprint or
    format mismatch (a DIFFERENT corpus/params must not resume from it)."""
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return {}
    if len(data) < 8 or data[:4] != JOURNAL_MAGIC:
        return {}
    (fplen,) = struct.unpack("<I", data[4:8])
    if len(data) < 8 + fplen or data[8:8 + fplen] != fp:
        return {}
    out: dict[int, bytes] = {}
    pos = 8 + fplen
    while pos + 8 <= len(data):
        idx, nb = struct.unpack("<II", data[pos:pos + 8])
        if pos + 8 + nb > len(data):
            break  # truncated tail record: the batch that died mid-write
        out[idx] = data[pos + 8: pos + 8 + nb]
        pos += 8 + nb
    return out


def _journal_append(path: str, fp: bytes, new: dict[int, bytes]) -> None:
    if not os.path.exists(path):
        with open(path, "wb") as f:
            f.write(JOURNAL_MAGIC + struct.pack("<I", len(fp)) + fp)
    with open(path, "ab") as f:
        for idx, blob in sorted(new.items()):
            f.write(struct.pack("<II", idx, len(blob)) + blob)
        f.flush()
        os.fsync(f.fileno())


def encode_archive(pages, params: CodecParams | None = None, *,
                   batch_size: int = 8, use_tpu: bool = True,
                   checkpoint: str | None = None,
                   on_progress=None) -> bytes:
    """pages: iterable of bool [rows, cols] arrays.

    checkpoint: journal path for elastic encode — each finished batch is
    appended; a killed run resumes from the journal and the final archive
    is byte-identical to an uninterrupted one.  The journal is removed on
    success.  on_progress(n_done_pages): called after every batch."""
    params = params or CodecParams(codec=8, strict=False)
    pages = [np.asarray(p, dtype=bool) for p in pages]
    done: dict[int, bytes] = {}
    fp = b""
    if checkpoint:
        fp = _corpus_fingerprint(pages, params)
        done = _journal_read(checkpoint, fp)
    n_done = len(done)

    def after_batch(new: dict[int, bytes]) -> None:
        nonlocal n_done
        if checkpoint:
            _journal_append(checkpoint, fp, new)
        n_done += len(new)
        if on_progress is not None:
            on_progress(n_done)

    blobs = encode_pages(pages, params, batch_size=batch_size,
                         use_tpu=use_tpu, done=done,
                         after_batch=after_batch)
    offsets = np.zeros(len(blobs), dtype=np.uint64)
    pos = 0
    for i, b in enumerate(blobs):
        offsets[i] = pos
        pos += len(b)
    head = MAGIC + struct.pack("<I", len(blobs)) + offsets.tobytes()
    out = head + b"".join(blobs)
    if checkpoint and os.path.exists(checkpoint):
        os.remove(checkpoint)
    return out


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
