"""Pallas TPU kernels (fused matmul / conv paths) with XLA fallback.

Enable globally with ``SATAE_USE_PALLAS=1`` or per-scope with
:func:`use_pallas`. The XLA path stays permanently available
(SURVEY.md §7 build plan step 5).
"""

from __future__ import annotations

import contextlib
import os

_PALLAS_ENABLED = os.environ.get("SATAE_USE_PALLAS", "0") == "1"


def pallas_enabled() -> bool:
    return _PALLAS_ENABLED


@contextlib.contextmanager
def use_pallas(enabled: bool = True):
    global _PALLAS_ENABLED
    prev = _PALLAS_ENABLED
    _PALLAS_ENABLED = enabled
    try:
        yield
    finally:
        _PALLAS_ENABLED = prev


from satae.kernels.matmul import fused_matmul  # noqa: E402,F401
from satae.kernels.conv import conv2d_bn_act_infer  # noqa: E402,F401
