"""Strict-JSON serialization helpers (pure stdlib — importable without jax).

Python's json module emits the NON-standard ``Infinity``/``NaN`` literals
for non-finite floats, which jq/JS/strict parsers reject. Diverged grid
configs legitimately produce inf/NaN selection metrics, so every persisted
artifact goes through these helpers: non-finite floats serialize as the
strings ``"inf"``/``"-inf"``/``"nan"`` and restore to floats on load
(``float("inf")`` parses them, so readers doing ``float(meta[...])`` work
unchanged).

Lives outside satae.io.checkpoint so the CLI and the metrics logger can use
it without paying the jax+flax import at module load.

Caveat (accepted trade-off): the encoding is schema-free, so a STRING field
whose legitimate value is exactly "inf"/"-inf"/"nan" would be coerced to a
float on restore. No satae artifact stores such strings (metric fields are
floats; status fields use words like "diverged"); a collision-free tagged
encoding would break the ubiquitous ``float(meta[...])`` reader pattern.
"""

from __future__ import annotations

import json
import math
from typing import Any

_NONFINITE_STRS = ("inf", "-inf", "nan")


def json_sanitize(obj: Any) -> Any:
    """Replace non-finite floats with their string forms recursively."""
    if isinstance(obj, dict):
        return {k: json_sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [json_sanitize(v) for v in obj]
    if isinstance(obj, float) and not math.isfinite(obj):
        return str(obj)
    return obj


def json_restore(obj: Any) -> Any:
    """Inverse of :func:`json_sanitize` ('inf' -> float('inf') etc.)."""
    if isinstance(obj, dict):
        return {k: json_restore(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [json_restore(v) for v in obj]
    if isinstance(obj, str) and obj in _NONFINITE_STRS:
        return float(obj)
    return obj


def dump_strict_json(obj: Any, **kwargs) -> str:
    """json.dumps that never emits non-standard Infinity/NaN literals."""
    return json.dumps(json_sanitize(obj), allow_nan=False, **kwargs)
