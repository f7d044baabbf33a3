"""ctypes bindings for the native C++ loader (csrc/loader.cc).

Builds the shared library on first use (g++ + libjpeg, both baked into the
image) and caches it under csrc/build/. Falls back cleanly — callers guard on
:func:`native_available` and use PIL otherwise (satae.data.ingest).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_SO = _CSRC / "build" / "libsatae_loader.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    _SO.parent.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(_CSRC / "loader.cc"),
           "-o", str(_SO), "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        stale = _SO.exists() and \
            (_CSRC / "loader.cc").stat().st_mtime > _SO.stat().st_mtime
        if (not _SO.exists() or stale) and not _build() and not _SO.exists():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            _build_failed = True
            return None
        lib.satae_decode_jpeg_batch.restype = ctypes.c_int
        lib.satae_decode_jpeg_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def decode_batch(paths: Sequence[str], image_size: int = 64,
                 n_threads: int = 0) -> np.ndarray:
    """Decode JPEGs to (N, image_size, image_size, 3) uint8, multithreaded.

    Raises RuntimeError if any file fails to decode (zero-filled slots would
    silently poison training data).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    out = np.empty((len(paths), image_size, image_size, 3), np.uint8)
    failed = lib.satae_decode_jpeg_batch(
        blob, len(paths), image_size, image_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
    if failed:
        raise RuntimeError(f"native decode failed for {failed} file(s)")
    return out


# NOTE: a native gather_batch (threaded row memcpy for host batching) was
# removed after the HBM-resident epoch design left it consumer-less and a
# measured probe showed it LOSING to np.take at batch-64 granularity on this
# host (39 vs 26 ms per epoch of gathers; wash at full-epoch granularity) —
# ctypes call overhead dominates at small batches and 1 CPU core leaves
# nothing for threads to win. See docs/PERF.md.
