"""Vmapped hyperparameter sweeps: train EVERY grid config simultaneously.

The reference runs its 45 (alpha, lr) configs sequentially, each a full
training (SURVEY.md §3.3, "embarrassingly parallel across configs"). On TPU
the natural formulation is a config axis: parameters, optimizer state, BN
state, alpha and lr all carry a leading (n_configs,) dimension, the model is
``jax.vmap``-ed over it, and one scan-epoch program (satae.train.hbm) trains
all configs at once against the shared HBM-resident dataset. A 45-config
sweep costs one large fused step per batch instead of 45 separate trainings.

Early stopping stays per-config on the host (patience 15 on best val loss,
Report.md:690-697): a config whose patience is exhausted keeps computing
(vmap is SPMD) but its metrics stop counting; the sweep ends when every
config has stopped or max_epochs is reached. Selection semantics (best val
loss, true best-epoch snapshot of the global best) match the sequential path.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from satae.config import AETrainConfig, DataConfig, MLPTrainConfig, ModelConfig
from satae.data.pipeline import ArrayDataset
from satae.io.checkpoint import GridResultStore
from satae.models.mlp import mlp_init
from satae.models.supervised_ae import supervised_ae_init
from satae.train import hbm
from satae.train.gridsearch import SweepResult
from satae.train.sweep_common import save_best_checkpoint
from satae.train.loop import LogFn, TrainResult
from satae.train.optim import adam_init


def _slice_tree(tree: Any, i: int) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x[i]), tree)


def ae_vmap_grid_search(
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
    save_curves: bool = False,
) -> SweepResult:
    # keep the original Python floats for result keys so a sweep resumed by
    # the sequential engine finds identical GridResultStore keys
    hparams = [(float(a), float(lr)) for a in ae_cfg.alphas
               for lr in ae_cfg.learning_rates]
    alphas = np.array([a for a, _ in hparams], np.float32)
    lrs = np.array([lr for _, lr in hparams], np.float32)
    n_cfg = len(alphas)

    # fresh per-config inits (the reference re-inits per config, Report.md:619)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_cfg)
    vparams, vbn = jax.vmap(
        lambda k: supervised_ae_init(k, model_cfg, in_ch=data_cfg.channels,
                                     image_size=data_cfg.image_size))(keys)
    vopt = adam_init(vparams)
    vopt["step"] = jnp.zeros((n_cfg,), jnp.int32)  # per-config step counter

    epoch_fn = hbm.ae_train_epoch_body(model_cfg, data_cfg, compute_dtype)
    vepoch = jax.jit(
        jax.vmap(epoch_fn, in_axes=(0, 0, 0, None, None, None, 0, 0, 0)),
        donate_argnums=(0, 1, 2))
    eval_fn = hbm.ae_eval_body(model_cfg, compute_dtype)
    veval = jax.jit(jax.vmap(eval_fn, in_axes=(0, 0, None, None, None, 0)))

    images = jax.device_put(train_ds.images)
    labels = jax.device_put(train_ds.labels)
    val_imgs, val_labs, val_wts = hbm.padded_eval_batches(
        val_ds, data_cfg.batch_size)
    val_imgs = jax.device_put(val_imgs)
    val_labs = jax.device_put(val_labs)
    val_wts = jax.device_put(val_wts)

    alphas_d = jnp.asarray(alphas)
    lrs_d = jnp.asarray(lrs)
    cfg_keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.PRNGKey(seed + 1), jnp.arange(n_cfg))

    # per-epoch (n_cfg,) metric arrays -> per-config train/val curves
    hist_keys = ("loss", "mse", "ce", "acc")
    metric_hist: Dict[str, list] = {f"{p}_{k}": []
                                    for p in ("train", "val")
                                    for k in hist_keys}
    n_train_counted = (len(train_ds) // data_cfg.batch_size) \
        * data_cfg.batch_size
    best_val = np.full((n_cfg,), np.inf, np.float64)
    best_acc = np.zeros((n_cfg,), np.float64)
    best_epoch = np.full((n_cfg,), -1, np.int64)
    bad_epochs = np.zeros((n_cfg,), np.int64)
    active = np.ones((n_cfg,), bool)
    stopped_at = np.full((n_cfg,), ae_cfg.max_epochs, np.int64)
    global_best = np.inf
    global_best_idx = -1
    best_snapshot = None

    for epoch in range(ae_cfg.max_epochs):
        order = jnp.asarray(hbm.epoch_order(
            len(train_ds), data_cfg.batch_size, seed, epoch))
        ekeys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(cfg_keys,
                                                                epoch)
        vparams, vbn, vopt, tsum = vepoch(
            vparams, vbn, vopt, images, labels, order, ekeys, alphas_d, lrs_d)
        vsum = veval(vparams, vbn, val_imgs, val_labs, val_wts, alphas_d)
        tsum, vsum = jax.device_get((tsum, vsum))
        for k in hist_keys:
            metric_hist[f"train_{k}"].append(tsum[k] / n_train_counted)
            metric_hist[f"val_{k}"].append(vsum[k] / vsum["n"])
        val_loss = vsum["loss"] / vsum["n"]
        val_acc = vsum["acc"] / vsum["n"]

        improved = active & (val_loss < best_val)
        best_val = np.where(improved, val_loss, best_val)
        best_acc = np.where(improved, val_acc, best_acc)
        best_epoch = np.where(improved, epoch, best_epoch)
        bad_epochs = np.where(improved, 0, bad_epochs + 1)
        newly_stopped = active & (bad_epochs >= ae_cfg.patience)
        stopped_at = np.where(newly_stopped, epoch + 1, stopped_at)
        active &= ~newly_stopped

        # global-best snapshot (true best-epoch weights of the best config)
        epoch_best = int(np.argmin(np.where(improved, val_loss, np.inf)))
        if improved.any() and val_loss[epoch_best] < global_best:
            global_best = float(val_loss[epoch_best])
            global_best_idx = epoch_best
            best_snapshot = (_slice_tree(vparams, epoch_best),
                             _slice_tree(vbn, epoch_best))
        if log:
            hp = (f"(alpha={alphas[global_best_idx]}, "
                  f"lr={lrs[global_best_idx]})") if global_best_idx >= 0 \
                else "(none yet)"
            log(f"epoch {epoch:3d}: active={int(active.sum())}/{n_cfg} "
                f"global_best={global_best:.4f} {hp}")
        if not active.any():
            break

    if best_snapshot is None:
        # no config ever improved on +inf (e.g. NaN losses from epoch 0):
        # return end-of-run weights of the least-bad config instead of
        # crashing, mirroring the sequential path's graceful behavior
        global_best_idx = int(np.argmin(np.nan_to_num(best_val, nan=np.inf)))
        best_snapshot = (_slice_tree(vparams, global_best_idx),
                         _slice_tree(vbn, global_best_idx))
        global_best = float(best_val[global_best_idx])
    params, bn_state = best_snapshot
    best_hp = {"alpha": hparams[global_best_idx][0],
               "lr": hparams[global_best_idx][1]}
    gi = global_best_idx

    def cfg_history(i: int) -> Dict[str, list]:
        # truncate a config's curves at its own early stop — vmap keeps
        # training stopped configs (SPMD), but those epochs never counted
        n_hist = int(min(stopped_at[i], len(metric_hist["val_loss"])))
        return {k: [float(v[i]) for v in metric_hist[k][:n_hist]]
                for k in metric_hist}

    history = cfg_history(gi)
    if save_curves and out_dir:
        from satae.eval import plots
        for i in range(n_cfg):
            a, lr = hparams[i]
            plots.loss_curves(
                cfg_history(i),
                Path(out_dir) / "curves" / f"ae_alpha{a:g}_lr{lr:g}.png",
                title=f"AE alpha={a:g} lr={lr:g}")
    best = TrainResult(params, bn_state, global_best,
                       float(best_acc[gi]), int(best_epoch[gi]), epoch + 1,
                       history)
    if out_dir:
        save_best_checkpoint(out_dir, "ae_global_best", params, bn_state,
                             best_hp, best,
                             diverged=not np.isfinite(global_best))

    # per-config records flush AFTER the winner checkpoint: a crash between
    # the two must never leave store-cached configs whose winner weights
    # were not persisted (a sequential resume would then silently select a
    # worse model)
    results: Dict[str, Dict[str, float]] = {}
    store = GridResultStore(Path(out_dir) / "validation_losses.json") \
        if out_dir else None
    for i in range(n_cfg):
        key = GridResultStore.key(alpha=hparams[i][0], lr=hparams[i][1])
        summary = {"alpha": hparams[i][0], "lr": hparams[i][1],
                   "best_val_loss": float(best_val[i]),
                   "best_val_acc": float(best_acc[i]),
                   "best_epoch": int(best_epoch[i]),
                   "epochs_run": int(min(stopped_at[i], epoch + 1))}
        results[key] = summary
        if store is not None:
            store.record(key, summary)
    return SweepResult(best, best_hp, results)


# ---------------------------------------------------------------------------
# MLP sweep (11 lrs, fixed 30 epochs, best by val accuracy)
# ---------------------------------------------------------------------------

def mlp_vmap_grid_search(
    train_x: np.ndarray, train_y: np.ndarray,
    val_x: np.ndarray, val_y: np.ndarray,
    *,
    model_cfg: ModelConfig,
    mlp_cfg: MLPTrainConfig,
    batch_size: int = 64,
    seed: int = 0,
    out_dir: Optional[str] = None,
    log: Optional[LogFn] = None,
    test_x: Optional[np.ndarray] = None,
    test_y: Optional[np.ndarray] = None,
    save_curves: bool = False,
) -> SweepResult:
    lrs_py = [float(lr) for lr in mlp_cfg.learning_rates]  # key-stable floats
    lrs = np.asarray(lrs_py, np.float32)
    n_cfg = len(lrs)
    input_dim = train_x.shape[-1]

    keys = jax.random.split(jax.random.PRNGKey(seed), n_cfg)
    vparams, vbn = jax.vmap(
        lambda k: mlp_init(k, model_cfg, input_dim=input_dim))(keys)
    vopt = adam_init(vparams)
    vopt["step"] = jnp.zeros((n_cfg,), jnp.int32)  # per-config step counter

    # shared single-config scan bodies (satae.train.hbm), vmapped over configs
    epoch_fn = hbm.mlp_train_epoch_body(model_cfg)
    eval_fn = hbm.mlp_eval_body(model_cfg)
    vepoch = jax.jit(jax.vmap(epoch_fn,
                              in_axes=(0, 0, 0, None, None, None, 0, 0, None)),
                     donate_argnums=(0, 1, 2))
    veval = jax.jit(jax.vmap(eval_fn, in_axes=(0, 0, None, None, None)))

    xs = jax.device_put(np.asarray(train_x, np.float32))
    ys = jax.device_put(np.asarray(train_y, np.int32))
    val = ArrayDataset(np.asarray(val_x, np.float32),
                       np.asarray(val_y, np.int32))
    vx, vy, vw = hbm.padded_eval_batches(val, batch_size)
    vx, vy, vw = jax.device_put(vx), jax.device_put(vy), jax.device_put(vw)

    lrs_d = jnp.asarray(lrs)
    cfg_keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.PRNGKey(seed + 1), jnp.arange(n_cfg))

    best_acc = np.full((n_cfg,), -1.0)
    best_loss = np.full((n_cfg,), np.inf)
    best_epoch = np.full((n_cfg,), -1, np.int64)
    snapshots: Dict[int, Any] = {}
    n_counted = (len(train_y) // batch_size) * batch_size
    metric_hist: Dict[str, list] = {k: [] for k in (
        "train_loss", "train_acc", "val_loss", "val_acc")}

    for epoch in range(mlp_cfg.epochs):
        order = jnp.asarray(hbm.epoch_order(len(ys), batch_size, seed, epoch))
        ekeys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(cfg_keys,
                                                                epoch)
        vparams, vbn, vopt, tsum = vepoch(
            vparams, vbn, vopt, xs, ys, order, ekeys, lrs_d,
            jnp.asarray(mlp_cfg.weight_decay, jnp.float32))
        m, tsum = jax.device_get((veval(vparams, vbn, vx, vy, vw), tsum))
        val_acc = m["acc"] / m["n"]
        val_loss = m["loss"] / m["n"]
        metric_hist["train_loss"].append(tsum["loss"] / n_counted)
        metric_hist["train_acc"].append(tsum["acc"] / n_counted)
        metric_hist["val_loss"].append(val_loss)
        metric_hist["val_acc"].append(val_acc)
        for i in np.flatnonzero(val_acc > best_acc):
            best_acc[i] = val_acc[i]
            best_loss[i] = val_loss[i]
            best_epoch[i] = epoch
            snapshots[i] = (_slice_tree(vparams, i), _slice_tree(vbn, i))
        if log:
            log(f"epoch {epoch:3d}: best_val_acc={best_acc.max():.4f} "
                f"(lr={lrs[int(np.argmax(best_acc))]})")

    gi = int(np.argmax(best_acc))

    def cfg_history(i: int) -> Dict[str, list]:
        return {k: [float(v[i]) for v in metric_hist[k]]
                for k in metric_hist}

    # winner checkpoint FIRST, per-config store flushes after (crash between
    # the two must not leave cached configs without persisted winner weights)
    params, bn_state = snapshots[gi]
    best_hp = {"lr": lrs_py[gi]}
    best = TrainResult(params, bn_state, float(best_loss[gi]),
                       float(best_acc[gi]), int(best_epoch[gi]),
                       mlp_cfg.epochs, cfg_history(gi))
    if out_dir:
        save_best_checkpoint(out_dir, "mlp_global_best", params, bn_state,
                             best_hp, best)

    results: Dict[str, Dict[str, float]] = {}
    store = GridResultStore(Path(out_dir) / "mlp_results.json") \
        if out_dir else None
    test_batches = None
    if test_x is not None:
        tds = ArrayDataset(np.asarray(test_x, np.float32),
                           np.asarray(test_y, np.int32))
        test_batches = tuple(jax.device_put(a)
                             for a in hbm.padded_eval_batches(tds, batch_size))
        jeval_single = jax.jit(eval_fn)
    for i in range(n_cfg):
        key = GridResultStore.key(lr=lrs_py[i])
        summary = {"lr": lrs_py[i], "best_val_acc": float(best_acc[i]),
                   "best_val_loss": float(best_loss[i]),
                   "best_epoch": int(best_epoch[i])}
        if test_batches is not None and i in snapshots:
            # per-LR best-epoch test accuracy (reference Report.md:2686-2697)
            sp, sb = snapshots[i]
            tm = jax.device_get(jeval_single(sp, sb, *test_batches))
            summary["test_acc"] = float(tm["acc"] / tm["n"])
        results[key] = summary
        if store is not None:
            store.record(key, summary)

    if save_curves and out_dir:
        from satae.eval import plots
        for i in range(n_cfg):
            plots.lr_curves(
                cfg_history(i),
                Path(out_dir) / "curves" / f"mlp_lr{lrs_py[i]:g}.png",
                title=f"MLP lr={lrs_py[i]:g}")
    return SweepResult(best, best_hp, results)
