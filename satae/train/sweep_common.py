"""Shared sweep bookkeeping for the grid-search engines.

The sequential (gridsearch.py) and config-sharded (shard_sweep.py) engines
share one selection contract (reference C16/C22 semantics, Report.md:595-730,
2587-2733):

  * per-config results flush to a :class:`GridResultStore` (resumable),
  * cached configs are skipped on resume BUT the existing global-best
    checkpoint still competes with freshly trained configs (otherwise a
    resumed sweep overwrites the winner with a worse model),
  * the global best is checkpointed with full metric meta as soon as it is
    known (crash-safe),
  * if the winner lives only in the checkpoint (all fresh configs lost to
    cached ones), it is reloaded so the returned model matches the recorded
    winner; if EVERY config diverged, the least-bad end-of-run model is
    returned and still checkpointed (marked ``diverged``).

:class:`SweepBook` implements that contract once; the engines keep only
their training loops. (The vmapped engines train all configs in a single
program with no resume path; they share :func:`save_best_checkpoint`.)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from satae.io.checkpoint import (GridResultStore, _json_restore, load_model,
                                 save_model)
from satae.train.loop import TrainResult


def save_best_checkpoint(out_dir, name: str, params: Any, bn_state: Any,
                         hp: Dict[str, float], res: TrainResult,
                         diverged: bool = False) -> None:
    """Write ``<name>.msgpack`` + strict-JSON meta carrying the selection
    metrics (resume protection reads them back)."""
    meta = {**hp, "best_val_loss": res.best_val_loss,
            "best_val_acc": res.best_val_acc, "best_epoch": res.best_epoch}
    if diverged:
        meta["diverged"] = True
    save_model(Path(out_dir) / f"{name}.msgpack", params, bn_state, meta=meta)


class SweepBook:
    """Resume/selection bookkeeping shared by the sequential and sharded
    sweep engines.

    mode="min" selects by ``best_val_loss`` (AE sweeps); mode="max" selects
    by ``best_val_acc`` (MLP sweeps). Both modes degrade gracefully when
    EVERY config's selection metric is non-finite: the least-bad end-of-run
    model is returned and checkpointed with a ``diverged`` marker (in
    practice val acc is a finite mean of booleans, so the max-mode fallback
    only triggers on NaN accuracies from fully-NaN logits).
    """

    def __init__(self, out_dir: Optional[str], *, ckpt_name: str,
                 store_name: str, mode: str, hp_keys: Tuple[str, ...]):
        assert mode in ("min", "max")
        self.out_dir = out_dir
        self.ckpt_name = ckpt_name
        self.mode = mode
        self.hp_keys = hp_keys
        self.metric_key = "best_val_loss" if mode == "min" else "best_val_acc"
        self.store = GridResultStore(Path(out_dir) / store_name) \
            if out_dir else None
        self.results: Dict[str, Dict[str, float]] = {}
        self.best: Optional[TrainResult] = None
        self.best_hp: Dict[str, float] = {}
        self.fallback: Optional[TrainResult] = None
        self.fallback_hp: Dict[str, float] = {}
        self.fallback_key = float("inf")

        # resume protection: the existing global-best checkpoint competes
        # with freshly trained configs — but only when its meta actually
        # carries the selection metric AND every hp key (api.fit stamps
        # foreign encoders with meta like {"reused": true}; such provenance
        # notes are not sweep results and must neither compete nor crash
        # resolve() with a KeyError). Unreadable meta degrades the same way.
        self.ckpt_meta: Dict[str, float] = {}
        self.ckpt_metric = float("inf") if mode == "min" else -1.0
        if out_dir:
            meta_file = Path(out_dir) / f"{ckpt_name}.json"
            if meta_file.exists():
                try:
                    meta = _json_restore(json.loads(meta_file.read_text()))
                except (json.JSONDecodeError, OSError):
                    meta = {}
                def _num(v):
                    return isinstance(v, (int, float)) \
                        and not isinstance(v, bool)
                if (_num(meta.get(self.metric_key))
                        and all(_num(meta.get(k)) for k in hp_keys)):
                    self.ckpt_meta = meta
                    self.ckpt_metric = float(meta[self.metric_key])

    # -- per-config -------------------------------------------------------

    def better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def best_metric(self) -> float:
        """The value a candidate must beat to become the global best
        (current best if any, else the resumed checkpoint's)."""
        if self.best is None:
            return self.ckpt_metric
        m = self.best.best_val_loss if self.mode == "min" \
            else self.best.best_val_acc
        return m if self.better(m, self.ckpt_metric) else self.ckpt_metric

    def cached(self, key: str) -> bool:
        """True (and the cached summary copied into results) when ``key``
        was already trained by a previous run."""
        if self.store is not None and key in self.store:
            self.results[key] = self.store.results[key]
            return True
        return False

    def record(self, key: str, summary: Dict[str, float]) -> None:
        self.results[key] = summary
        if self.store is not None:
            self.store.record(key, summary)

    def offer(self, res: TrainResult, hp: Dict[str, float]) -> bool:
        """Consider a finished config for global best (checkpointing it) and
        for the all-diverged fallback. Returns True if it became the best."""
        metric = res.best_val_loss if self.mode == "min" else res.best_val_acc
        is_best = self.better(metric, self.best_metric())
        if is_best:
            self.best, self.best_hp = res, hp
            if self.out_dir:
                save_best_checkpoint(self.out_dir, self.ckpt_name,
                                     res.params, res.bn_state, hp, res)
        self.offer_fallback(res, hp)
        return is_best

    def offer_fallback(self, res: TrainResult, hp: Dict[str, float]) -> None:
        """Track the least-bad config for the all-diverged case (every
        config's selection metric inf/NaN) — used directly by engines whose
        best-epoch snapshot for this config was not retained (only
        end-of-run weights exist). Symmetric across modes: min ranks by
        val loss, max by negated val acc; NaN metrics rank worst."""
        metric = res.best_val_loss if self.mode == "min" else \
            -res.best_val_acc
        cand = float(np.nan_to_num(metric, nan=np.inf))
        if self.fallback is None or cand < self.fallback_key:
            self.fallback, self.fallback_hp, self.fallback_key = \
                res, hp, cand

    # -- epilogue ---------------------------------------------------------

    def resolve(self, template_fn: Callable[[], Tuple[Any, Any]],
                engine_name: str,
                finalize: Callable[[TrainResult], TrainResult] = lambda r: r,
                ) -> Tuple[TrainResult, Dict[str, float]]:
        """Final winner resolution. ``template_fn`` builds (params_like,
        bn_state_like) for reloading the checkpointed winner; ``finalize``
        post-processes a winner that did NOT come from the checkpoint (the
        sharded engine uses it to bring device snapshots to the host)."""
        ckpt_wins = self.best is None or \
            self.better(self.ckpt_metric,
                        self.best.best_val_loss if self.mode == "min"
                        else self.best.best_val_acc)
        if not ckpt_wins:
            return finalize(self.best), self.best_hp
        if not self.ckpt_meta:
            if self.fallback is not None:
                # every config diverged (inf/NaN selection metric): return
                # the least-bad end-of-run model — and still write the
                # checkpoint, so a later evaluate/load on out_dir never
                # sees a missing/stale global best
                fb = finalize(self.fallback)
                if self.out_dir:
                    save_best_checkpoint(self.out_dir, self.ckpt_name,
                                         fb.params, fb.bn_state,
                                         self.fallback_hp, fb, diverged=True)
                return fb, self.fallback_hp
            raise RuntimeError(
                f"{engine_name} produced no result and no prior checkpoint "
                "exists to resume from")
        # the resumed checkpoint (from cached configs) is the global best —
        # load it back so the returned model matches the recorded winner
        tmpl_p, tmpl_s = template_fn()
        params, bn_state = load_model(
            Path(self.out_dir) / f"{self.ckpt_name}.msgpack", tmpl_p, tmpl_s)
        hp = {k: float(self.ckpt_meta[k]) for k in self.hp_keys}
        loss = self.ckpt_metric if self.mode == "min" \
            else float(self.ckpt_meta.get("best_val_loss", float("inf")))
        acc = self.ckpt_metric if self.mode == "max" \
            else float(self.ckpt_meta.get("best_val_acc", 0.0))
        best = TrainResult(params, bn_state, loss, acc,
                           int(self.ckpt_meta.get("best_epoch", -1)), 0, {})
        return best, hp
