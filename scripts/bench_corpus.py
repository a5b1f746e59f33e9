"""Corpus-scale benchmark (BASELINE.json config #4): a batch of document
pages encoded through the device-batched archive path, with bit-exact
verification on a sample.

Single-chip here; multi-chip/multi-host scaling runs the same code over the
pod mesh (parallel/multihost) and is functionally validated by
__graft_entry__.dryrun_multichip on a virtual device mesh — real scaling
efficiency needs real chips.

    python scripts/bench_corpus.py [n_pages] [batch]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from binary_image_compression_tpu.models import archive, codec  # noqa: E402
from binary_image_compression_tpu.utils import pnm  # noqa: E402


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    fix = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "doc512.pbm")
    base = pnm.read_pbm(fix)
    rng = np.random.RandomState(0)
    pages = [np.roll(base, (int(rng.randint(512)), int(rng.randint(512))),
                     axis=(0, 1)) for _ in range(n_pages)]
    params = codec.CodecParams(codec=8, W=16, R=128, strict=False)

    # warm (compile)
    archive.encode_archive(pages[:batch], params, batch_size=batch)
    t0 = time.time()
    blob = archive.encode_archive(pages, params, batch_size=batch)
    t_enc = time.time() - t0

    # verify a sample of pages bit-exactly
    for i in [0, n_pages // 2, n_pages - 1]:
        assert (archive.decode_page(blob, i) == pages[i]).all()
    t0 = time.time()
    for i in range(min(16, n_pages)):
        archive.decode_page(blob, i)
    t_dec16 = time.time() - t0

    mp = n_pages * base.size / 1e6
    raw = sum(p.size // 8 for p in pages)
    print(json.dumps({
        "metric": f"corpus encode throughput ({n_pages} pages, batch={batch})",
        "value": round(mp / t_enc, 3),
        "unit": "megapixels/s/chip",
        "encode_s": round(t_enc, 2),
        "decode_ms_per_page": round(t_dec16 / min(16, n_pages) * 1e3, 2),
        "compressed_bytes": len(blob),
        "raw_bytes": raw,
        "ratio_pct": round(100.0 * len(blob) / raw, 2),
    }))


if __name__ == "__main__":
    main()
