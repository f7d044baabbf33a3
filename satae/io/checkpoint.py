"""Checkpointing: msgpack pytree snapshots + grid-result JSON artifacts.

Mirrors the reference's three persisted artifacts (SURVEY.md §5
checkpoint/resume):
  * best supervised-AE weights   (`AE_GLOBAL_BEST.pt`, Report.md:714-716)
  * best MLP weights             (`MLP_GLOBAL_BEST.pt`, Report.md:2725)
  * grid-search results JSON     (`validation_losses.json`, Report.md:723-729)

Improvements over the reference: checkpoints are true best-epoch snapshots
(not the live-tensor shallow copies of Report.md:705/2683), they include the
BatchNorm running statistics (torch state_dict does too, but the reference's
bug loses the correct epoch), and the grid sweep flushes results per config
so a crash mid-sweep is resumable (SURVEY.md §5 failure detection).

Format: flax.serialization msgpack of the {params, bn_state, meta} pytree —
host-portable, no pickle.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
from flax import serialization

# strict-JSON helpers live in a jax-free module (satae.utils.strict_json) so
# the CLI/logger can import them without the jax+flax load; re-exported here
# under their historical names for existing imports
from satae.utils.strict_json import (dump_strict_json,
                                     json_restore as _json_restore,
                                     json_sanitize as _json_sanitize)


def _atomic_write_text(path: Path, text: str) -> None:
    """tmp + rename so a kill mid-write never leaves a truncated file —
    resume paths json.loads these, and a torn meta would brick resume. The
    tmp name carries the pid: under multi-process execution every process
    writes the same artifacts with identical bytes (last rename wins), and a
    shared tmp path would let one process rename another's half-written
    file."""
    tmp = path.with_suffix(path.suffix + f".tmp.{os.getpid()}")
    tmp.write_text(text)
    os.replace(tmp, path)


def save_pytree(path: str | Path, pytree: Any) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host = jax.device_get(pytree)
    tmp = path.with_suffix(path.suffix + f".tmp.{os.getpid()}")
    tmp.write_bytes(serialization.to_bytes(host))
    os.replace(tmp, path)


def load_pytree(path: str | Path, like: Any) -> Any:
    """Restore into the structure of ``like`` (template pytree)."""
    return serialization.from_bytes(like, Path(path).read_bytes())


def save_model(path: str | Path, params: Any, bn_state: Any,
               meta: Optional[Dict[str, Any]] = None) -> None:
    save_pytree(path, {"params": params, "bn_state": bn_state})
    if meta is not None:
        _atomic_write_text(Path(path).with_suffix(".json"),
                           dump_strict_json(meta, indent=2))


def load_model(path: str | Path, params_like: Any, bn_state_like: Any):
    blob = load_pytree(path, {"params": params_like, "bn_state": bn_state_like})
    return blob["params"], blob["bn_state"]


def save_train_state(path: str | Path, *, params: Any, bn_state: Any,
                     opt_state: Any, epoch: int,
                     extra: Optional[Dict[str, Any]] = None) -> None:
    """Full mid-training snapshot (params + BN stats + optimizer moments +
    epoch counter) — the mid-run resume the reference lacks entirely
    (SURVEY.md §5: a crash mid-grid-search loses all in-memory state)."""
    save_pytree(path, {"params": params, "bn_state": bn_state,
                       "opt_state": opt_state})
    meta = {"epoch": int(epoch), **(extra or {})}
    _atomic_write_text(Path(path).with_suffix(".state.json"),
                       dump_strict_json(meta))


def clear_train_state(path: str | Path) -> None:
    """Remove a :func:`save_train_state` pair plus the trainer's best-epoch
    snapshot (``<path>``, ``.state.json``, ``.best.msgpack``). Call only
    once the training outcome is DURABLY recorded elsewhere (result store /
    global-best checkpoint) — removing earlier reopens the crash window the
    in-flight state exists to close."""
    path = Path(path)
    for f in (path, path.with_suffix(".state.json"),
              path.with_suffix(".best.msgpack")):
        f.unlink(missing_ok=True)


def load_train_state(path: str | Path, *, params_like: Any,
                     bn_state_like: Any, opt_state_like: Any):
    """Returns (params, bn_state, opt_state, meta)."""
    blob = load_pytree(path, {"params": params_like,
                              "bn_state": bn_state_like,
                              "opt_state": opt_state_like})
    meta = _json_restore(
        json.loads(Path(path).with_suffix(".state.json").read_text()))
    return blob["params"], blob["bn_state"], blob["opt_state"], meta


def load_grid_results(path: str | Path) -> Dict[str, Dict[str, Any]]:
    """Read a validation_losses.json with strict-JSON restore (diverged
    configs store "inf"/"nan" STRINGS; consumers doing arithmetic need them
    back as floats). The one sanctioned way to load grid results — don't
    hand-roll json.loads at call sites."""
    return GridResultStore(path).results


class GridResultStore:
    """Append-safe grid-search result store (the reference's
    validation_losses.json, flushed per config for crash resumability)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.results: Dict[str, Dict[str, Any]] = {}
        if self.path.exists():
            self.results = _json_restore(json.loads(self.path.read_text()))

    @staticmethod
    def key(**hparams) -> str:
        return json.dumps({k: hparams[k] for k in sorted(hparams)})

    def __contains__(self, key: str) -> bool:
        return key in self.results

    def record(self, key: str, value: Dict[str, Any]) -> None:
        self.results[key] = value
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(f".tmp.{os.getpid()}")
        tmp.write_text(dump_strict_json(self.results, indent=2))
        os.replace(tmp, self.path)

    def best(self, metric: str, mode: str = "min") -> Optional[Dict[str, Any]]:
        if not self.results:
            return None
        sign = 1.0 if mode == "min" else -1.0
        key = min(self.results, key=lambda k: sign * self.results[k][metric])
        return {"key": key, **self.results[key]}
