"""Hyperparameter grid searches (reference C16 and C22).

AE sweep: alpha x lr (5x9=45 configs, Report.md:595-730), fresh init per
config, early stopping (patience 15, max 80 epochs), global best by val loss.
MLP sweep: 11 lrs (Report.md:2587-2733), 30 epochs, best by val accuracy.

TPU-native improvements over the reference:
  * ONE compiled train step serves every config — alpha/lr are traced scalars
    (satae.train.steps), so the sweep never recompiles.
  * Results flush to JSON per config (resumable; the reference loses all
    in-memory state on a crash, SURVEY.md §5).
  * A vmapped sweep that trains all configs simultaneously lives in
    satae.train.vmap_sweep (the sequential path here is the
    parity-faithful baseline, selecting exactly like the reference).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from satae.config import (AETrainConfig, DataConfig, MLPTrainConfig,
                          ModelConfig)
from satae.data.pipeline import ArrayDataset
from satae.io.checkpoint import GridResultStore, save_model
from satae.train import steps as S
from satae.train.loop import LogFn, TrainResult, train_mlp, train_supervised_ae


@dataclasses.dataclass
class SweepResult:
    best: TrainResult
    best_hparams: Dict[str, float]
    results: Dict[str, Dict[str, float]]  # key -> summary metrics


def ae_grid_search(
    train_ds: ArrayDataset,
    val_ds: ArrayDataset,
    *,
    model_cfg: ModelConfig,
    data_cfg: DataConfig,
    ae_cfg: AETrainConfig,
    seed: int = 0,
    out_dir: Optional[str] = None,
    compute_dtype=jnp.float32,
    log: Optional[LogFn] = None,
    engine: str = "scan",
    save_curves: bool = False,
) -> SweepResult:
    """Sequential alpha x lr sweep with per-config result flushing and a
    global-best checkpoint (`ae_global_best.msgpack`, the reference's
    AE_GLOBAL_BEST.pt).

    engine="scan" (default): whole-epoch lax.scan programs over HBM-resident
    data, one compilation shared by all 45 configs — the fast path (0.16
    s/epoch at reference scale on a v5e). engine="steps": the per-batch host
    loop (loop.py), useful for debugging and exact reference-style batch
    accounting (keeps the epoch-remainder batch).
    """
    if engine == "scan":
        from satae.train import fast_loop
        scan_engine = fast_loop.AEScanEngine(model_cfg, data_cfg,
                                             compute_dtype)
        device_data = fast_loop.upload_ae_data(train_ds, val_ds,
                                               data_cfg.batch_size)
    else:
        train_step = S.make_ae_train_step(model_cfg, data_cfg, compute_dtype)
        eval_step = S.make_ae_eval_step(model_cfg, compute_dtype)
    store = GridResultStore(Path(out_dir) / "validation_losses.json") \
        if out_dir else None

    # On resume, the existing global-best checkpoint competes with freshly
    # trained configs — otherwise cached configs are silently excluded from
    # best selection and their checkpoint gets overwritten by a worse model.
    ckpt_val = float("inf")
    ckpt_meta: Dict[str, float] = {}
    if out_dir:
        meta_file = Path(out_dir) / "ae_global_best.json"
        if meta_file.exists():
            ckpt_meta = json.loads(meta_file.read_text())
            ckpt_val = float(ckpt_meta.get("best_val_loss", float("inf")))

    best: Optional[TrainResult] = None
    best_hp: Dict[str, float] = {}
    fallback: Optional[TrainResult] = None  # least-bad if ALL diverge
    fallback_hp: Dict[str, float] = {}
    fallback_key = float("inf")
    results: Dict[str, Dict[str, float]] = {}
    cfg_idx = -1
    for alpha in ae_cfg.alphas:
        for lr in ae_cfg.learning_rates:
            cfg_idx += 1
            key = GridResultStore.key(alpha=alpha, lr=lr)
            if store is not None and key in store:
                results[key] = store.results[key]
                if log:
                    log(f"skip cached alpha={alpha} lr={lr}")
                continue
            if engine == "scan":
                res = fast_loop.train_supervised_ae_scan(
                    train_ds, val_ds, model_cfg=model_cfg, data_cfg=data_cfg,
                    alpha=alpha, lr=lr, max_epochs=ae_cfg.max_epochs,
                    patience=ae_cfg.patience, seed=seed + cfg_idx,
                    engine=scan_engine, device_data=device_data)
            else:
                res = train_supervised_ae(
                    train_ds, val_ds, model_cfg=model_cfg, data_cfg=data_cfg,
                    alpha=alpha, lr=lr, max_epochs=ae_cfg.max_epochs,
                    patience=ae_cfg.patience, seed=seed + cfg_idx,
                    compute_dtype=compute_dtype,
                    train_step=train_step, eval_step=eval_step)
            summary = {"alpha": alpha, "lr": lr,
                       "best_val_loss": res.best_val_loss,
                       "best_val_acc": res.best_val_acc,
                       "best_epoch": res.best_epoch,
                       "epochs_run": res.epochs_run}
            results[key] = summary
            if store is not None:
                store.record(key, summary)
            if save_curves and out_dir and res.history:
                from satae.eval import plots
                plots.loss_curves(
                    res.history,
                    Path(out_dir) / "curves" / f"ae_alpha{alpha:g}_lr{lr:g}.png",
                    title=f"AE alpha={alpha:g} lr={lr:g}")
            if log:
                log(f"alpha={alpha} lr={lr}: val_loss={res.best_val_loss:.4f} "
                    f"({res.epochs_run} epochs)")
            if (best is None or res.best_val_loss < best.best_val_loss) \
                    and res.best_val_loss < ckpt_val:
                best = res
                best_hp = {"alpha": alpha, "lr": lr}
                if out_dir:
                    save_model(Path(out_dir) / "ae_global_best.msgpack",
                               res.params, res.bn_state,
                               meta={**best_hp,
                                     "best_val_loss": res.best_val_loss,
                                     "best_val_acc": res.best_val_acc,
                                     "best_epoch": res.best_epoch})
            cand = float(np.nan_to_num(res.best_val_loss, nan=np.inf))
            if fallback is None or cand < fallback_key:
                fallback, fallback_hp, fallback_key = (
                    res, {"alpha": alpha, "lr": lr}, cand)
    if best is None or (ckpt_val < best.best_val_loss):
        # The resumed checkpoint (from cached configs) is the global best —
        # load it back so the returned model matches the recorded winner.
        if not ckpt_meta:
            if fallback is not None:
                # every config diverged (inf/NaN val loss): return the
                # least-bad end-of-run model like the vmapped engine does —
                # and still write the checkpoint, so a later evaluate/load
                # on out_dir never sees a missing/stale ae_global_best
                if out_dir:
                    save_model(Path(out_dir) / "ae_global_best.msgpack",
                               fallback.params, fallback.bn_state,
                               meta={**fallback_hp,
                                     "best_val_loss": fallback.best_val_loss,
                                     "best_val_acc": fallback.best_val_acc,
                                     "best_epoch": fallback.best_epoch,
                                     "diverged": True})
                return SweepResult(fallback, fallback_hp, results)
            raise RuntimeError("AE grid search produced no result and no "
                               "prior checkpoint exists to resume from")
        from satae.io.checkpoint import load_model
        from satae.models.supervised_ae import supervised_ae_init
        import jax
        tmpl_p, tmpl_s = supervised_ae_init(
            jax.random.PRNGKey(0), model_cfg, in_ch=data_cfg.channels,
            image_size=data_cfg.image_size)
        params, bn_state = load_model(
            Path(out_dir) / "ae_global_best.msgpack", tmpl_p, tmpl_s)
        best_hp = {"alpha": float(ckpt_meta["alpha"]),
                   "lr": float(ckpt_meta["lr"])}
        best = TrainResult(params, bn_state, ckpt_val,
                           float(ckpt_meta.get("best_val_acc", 0.0)),
                           int(ckpt_meta.get("best_epoch", -1)), 0, {})
    return SweepResult(best, best_hp, results)


def mlp_grid_search(
    train_x: np.ndarray, train_y: np.ndarray,
    val_x: np.ndarray, val_y: np.ndarray,
    *,
    model_cfg: ModelConfig,
    mlp_cfg: MLPTrainConfig,
    batch_size: int = 64,
    seed: int = 0,
    out_dir: Optional[str] = None,
    log: Optional[LogFn] = None,
    engine: str = "scan",
    test_x: Optional[np.ndarray] = None,
    test_y: Optional[np.ndarray] = None,
    save_curves: bool = False,
) -> SweepResult:
    """11-point lr sweep over the latent MLP; global best by val accuracy
    (`mlp_global_best.msgpack`, the reference's MLP_GLOBAL_BEST.pt).

    Pass test_x/test_y to also record each LR's best-epoch test accuracy,
    like the reference's per-LR test evaluation (Report.md:2686-2697)."""
    if engine == "scan":
        from satae.train import fast_loop
        scan_engine = fast_loop.MLPScanEngine(model_cfg)
        device_data = fast_loop.upload_mlp_data(train_x, train_y, val_x,
                                                val_y, batch_size)
    else:
        train_step = S.make_mlp_train_step(model_cfg)
        eval_step = S.make_mlp_eval_step(model_cfg)
    store = GridResultStore(Path(out_dir) / "mlp_results.json") \
        if out_dir else None
    test_eval = S.make_mlp_eval_step(model_cfg) if test_x is not None else None

    best: Optional[TrainResult] = None
    best_hp: Dict[str, float] = {}
    results: Dict[str, Dict[str, float]] = {}

    # resume support (like the AE sweep): skip cached configs and let the
    # existing global-best checkpoint compete with freshly trained ones
    ckpt_acc = -1.0
    ckpt_meta: Dict[str, float] = {}
    if out_dir:
        meta_file = Path(out_dir) / "mlp_global_best.json"
        if meta_file.exists():
            ckpt_meta = json.loads(meta_file.read_text())
            ckpt_acc = float(ckpt_meta.get("best_val_acc", -1.0))

    for cfg_idx, lr in enumerate(mlp_cfg.learning_rates):
        key = GridResultStore.key(lr=lr)
        if store is not None and key in store:
            results[key] = store.results[key]
            if log:
                log(f"skip cached lr={lr}")
            continue
        if engine == "scan":
            res = fast_loop.train_mlp_scan(
                train_x, train_y, val_x, val_y, model_cfg=model_cfg, lr=lr,
                weight_decay=mlp_cfg.weight_decay, epochs=mlp_cfg.epochs,
                batch_size=batch_size, seed=seed + cfg_idx,
                engine=scan_engine, device_data=device_data)
        else:
            res = train_mlp(train_x, train_y, val_x, val_y,
                            model_cfg=model_cfg,
                            lr=lr, weight_decay=mlp_cfg.weight_decay,
                            epochs=mlp_cfg.epochs, batch_size=batch_size,
                            seed=seed + cfg_idx, train_step=train_step,
                            eval_step=eval_step)
        summary = {"lr": lr, "best_val_acc": res.best_val_acc,
                   "best_val_loss": res.best_val_loss,
                   "best_epoch": res.best_epoch}
        if test_eval is not None:
            from satae.data.pipeline import ArrayDataset
            from satae.train.loop import run_eval
            test_m = run_eval(test_eval, res.params, res.bn_state,
                              ArrayDataset(np.asarray(test_x, np.float32),
                                           np.asarray(test_y, np.int32)),
                              batch_size)
            summary["test_acc"] = test_m["acc"]
        results[key] = summary
        if store is not None:
            store.record(key, summary)
        if save_curves and out_dir and res.history:
            from satae.eval import plots
            plots.lr_curves(res.history,
                            Path(out_dir) / "curves" / f"mlp_lr{lr:g}.png",
                            title=f"MLP lr={lr:g}")
        if log:
            log(f"lr={lr}: val_acc={res.best_val_acc:.4f}")
        if (best is None or res.best_val_acc > best.best_val_acc) \
                and res.best_val_acc > ckpt_acc:
            best = res
            best_hp = {"lr": lr}
            if out_dir:
                save_model(Path(out_dir) / "mlp_global_best.msgpack",
                           res.params, res.bn_state,
                           meta={**best_hp, "best_val_acc": res.best_val_acc,
                                 "best_val_loss": res.best_val_loss,
                                 "best_epoch": res.best_epoch})
    if best is None or ckpt_acc > best.best_val_acc:
        # the resumed checkpoint (from cached configs) remains the winner
        if not ckpt_meta:
            raise RuntimeError("MLP grid search produced no result and no "
                               "prior checkpoint exists to resume from")
        import jax

        from satae.io.checkpoint import load_model
        from satae.models.mlp import mlp_init
        tmpl_p, tmpl_s = mlp_init(jax.random.PRNGKey(0), model_cfg,
                                  input_dim=train_x.shape[-1])
        params, bn_state = load_model(
            Path(out_dir) / "mlp_global_best.msgpack", tmpl_p, tmpl_s)
        best_hp = {"lr": float(ckpt_meta["lr"])}
        best = TrainResult(params, bn_state,
                           float(ckpt_meta.get("best_val_loss", float("inf"))),
                           ckpt_acc, int(ckpt_meta.get("best_epoch", -1)),
                           0, {})
    return SweepResult(best, best_hp, results)
