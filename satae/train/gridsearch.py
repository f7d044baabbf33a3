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
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from satae.config import (AETrainConfig, DataConfig, MLPTrainConfig,
                          ModelConfig)
from satae.data.pipeline import ArrayDataset
from satae.io.checkpoint import GridResultStore
from satae.train import steps as S
from satae.train.loop import LogFn, TrainResult, train_mlp, train_supervised_ae
from satae.train.sweep_common import SweepBook


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

    With ``ae_cfg.checkpoint_every > 0`` (and ``out_dir``, scan engine), each
    config additionally flushes its in-flight train state every N epochs
    under ``out_dir/inflight/``, so a SIGKILL mid-config retrains at most N
    epochs of that config on resume (instead of the whole config). The
    in-flight files are removed once the config's result is recorded; the
    other sweep engines (vmap/sharded) keep config-granular resume.
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
    book = SweepBook(out_dir, ckpt_name="ae_global_best",
                     store_name="validation_losses.json", mode="min",
                     hp_keys=("alpha", "lr"))

    def inflight_path(alpha: float, lr: float) -> Optional[Path]:
        if out_dir and ae_cfg.checkpoint_every and engine == "scan":
            return (Path(out_dir) / "inflight" /
                    f"ae_a{alpha:g}_lr{lr:g}.msgpack")
        return None

    def clear_inflight(path: Optional[Path]) -> None:
        if path is not None:
            from satae.io.checkpoint import clear_train_state
            clear_train_state(path)

    cfg_idx = -1
    for alpha in ae_cfg.alphas:
        for lr in ae_cfg.learning_rates:
            cfg_idx += 1
            key = GridResultStore.key(alpha=alpha, lr=lr)
            ckpt_path = inflight_path(alpha, lr)
            if book.cached(key):
                # also clears in-flight files orphaned by a crash in the
                # window after the store flush but before cleanup
                clear_inflight(ckpt_path)
                if log:
                    log(f"skip cached alpha={alpha} lr={lr}")
                continue
            if engine == "scan":
                res = fast_loop.train_supervised_ae_scan(
                    train_ds, val_ds, model_cfg=model_cfg, data_cfg=data_cfg,
                    alpha=alpha, lr=lr, max_epochs=ae_cfg.max_epochs,
                    patience=ae_cfg.patience, seed=seed + cfg_idx,
                    engine=scan_engine, device_data=device_data,
                    checkpoint_path=str(ckpt_path) if ckpt_path else None,
                    checkpoint_every=ae_cfg.checkpoint_every,
                    # per-epoch logs only for crash-resumable (synchronous)
                    # configs — they narrate the resume point; the default
                    # pipelined sweep keeps its one-line-per-config logging
                    log=log if ckpt_path else None)
            else:
                res = train_supervised_ae(
                    train_ds, val_ds, model_cfg=model_cfg, data_cfg=data_cfg,
                    alpha=alpha, lr=lr, max_epochs=ae_cfg.max_epochs,
                    patience=ae_cfg.patience, seed=seed + cfg_idx,
                    compute_dtype=compute_dtype,
                    train_step=train_step, eval_step=eval_step)
            # offer (checkpoint save) strictly BEFORE the store flush: a crash
            # between the two then costs a redundant retrain on resume, never
            # a cached-but-uncheckpointed winner excluded from selection
            book.offer(res, {"alpha": alpha, "lr": lr})
            book.record(key, {"alpha": alpha, "lr": lr,
                              "best_val_loss": res.best_val_loss,
                              "best_val_acc": res.best_val_acc,
                              "best_epoch": res.best_epoch,
                              "epochs_run": res.epochs_run})
            clear_inflight(ckpt_path)  # config is durably recorded
            if save_curves and out_dir and res.history:
                from satae.eval import plots
                plots.loss_curves(
                    res.history,
                    Path(out_dir) / "curves" / f"ae_alpha{alpha:g}_lr{lr:g}.png",
                    title=f"AE alpha={alpha:g} lr={lr:g}")
            if log:
                log(f"alpha={alpha} lr={lr}: val_loss={res.best_val_loss:.4f} "
                    f"({res.epochs_run} epochs)")

    def template():
        import jax

        from satae.models.supervised_ae import supervised_ae_init
        return supervised_ae_init(
            jax.random.PRNGKey(0), model_cfg, in_ch=data_cfg.channels,
            image_size=data_cfg.image_size)

    best, best_hp = book.resolve(template, "AE grid search")
    return SweepResult(best, best_hp, book.results)


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
    test_eval = S.make_mlp_eval_step(model_cfg) if test_x is not None else None
    book = SweepBook(out_dir, ckpt_name="mlp_global_best",
                     store_name="mlp_results.json", mode="max",
                     hp_keys=("lr",))

    for cfg_idx, lr in enumerate(mlp_cfg.learning_rates):
        key = GridResultStore.key(lr=lr)
        if book.cached(key):
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
        book.offer(res, {"lr": lr})  # checkpoint before the store flush
        book.record(key, summary)
        if save_curves and out_dir and res.history:
            from satae.eval import plots
            plots.lr_curves(res.history,
                            Path(out_dir) / "curves" / f"mlp_lr{lr:g}.png",
                            title=f"MLP lr={lr:g}")
        if log:
            log(f"lr={lr}: val_acc={res.best_val_acc:.4f}")

    def template():
        import jax

        from satae.models.mlp import mlp_init
        return mlp_init(jax.random.PRNGKey(0), model_cfg,
                        input_dim=train_x.shape[-1])

    best, best_hp = book.resolve(template, "MLP grid search")
    return SweepResult(best, best_hp, book.results)
