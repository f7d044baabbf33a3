"""Ingest benchmark: native C++ multithreaded JPEG decode vs PIL.

Writes a synthetic JPEG tree, decodes it with both backends, and prints
images/sec for each (stderr) plus a JSON summary (stdout). This quantifies
the decode-once ingest speedup vs the reference's single-threaded PIL path
(Report.md:23, SURVEY.md §3.1).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(n_images: int = 2000) -> None:
    from PIL import Image

    from satae.data.synthetic import make_synthetic_eurosat
    from satae.io import native_loader as NL

    with tempfile.TemporaryDirectory() as td:
        imgs, labels, classes = make_synthetic_eurosat(
            per_class=-(-n_images // 10), seed=0)
        paths = []
        for i in range(n_images):
            p = Path(td) / f"img_{i:05d}.jpg"
            Image.fromarray(imgs[i]).save(p, quality=90)
            paths.append(str(p))

        t0 = time.perf_counter()
        out_native = NL.decode_batch(paths, 64)
        native_ips = n_images / (time.perf_counter() - t0)

        t0 = time.perf_counter()
        out_pil = np.stack([
            np.asarray(Image.open(p).convert("RGB"), np.uint8) for p in paths])
        pil_ips = n_images / (time.perf_counter() - t0)

        exact = bool(np.abs(out_native.astype(int) - out_pil.astype(int)).max() <= 1)

    print(f"native: {native_ips:,.0f} img/s  pil: {pil_ips:,.0f} img/s  "
          f"decode-parity(+-1): {exact}", file=sys.stderr)
    print(json.dumps({"native_decode_ips": round(native_ips),
                      "pil_decode_ips": round(pil_ips),
                      "speedup": round(native_ips / pil_ips, 2),
                      "parity": exact}))


if __name__ == "__main__":
    main()
