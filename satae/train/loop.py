"""Epoch-level training drivers: host control flow around the jit'd steps.

Re-implements the reference trainers with the quirks fixed:
  * AE trainer (Report.md:595-730): up to 80 epochs, per-epoch validation,
    early stopping on best val loss with patience 15. Unlike the reference's
    shallow ``state_dict()`` reference bug (Report.md:705, SURVEY.md §2), the
    returned best params/BN-state are a TRUE best-epoch snapshot.
  * MLP trainer (Report.md:2587-2733): fixed 30 epochs, best-epoch selection
    by validation accuracy.

Epoch metrics are sample-weighted means over batches, matching the reference's
``loss.item()*batch_size / total`` accounting (Report.md:657-662) — but the
device->host sync happens once per epoch, not once per step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from satae.config import DataConfig, ModelConfig
from satae.data.pipeline import ArrayDataset, iter_batches
from satae.models.mlp import mlp_init
from satae.models.supervised_ae import supervised_ae_init
from satae.train import steps as S
from satae.train.optim import adam_init

LogFn = Callable[[str], None]


@dataclasses.dataclass
class TrainResult:
    params: Any            # best-epoch snapshot (host pytree)
    bn_state: Any          # best-epoch BN running stats (host pytree)
    best_val_loss: float
    best_val_acc: float
    best_epoch: int
    epochs_run: int
    history: Dict[str, List[float]]


def _weighted_mean(metric_sums: Dict[str, float], n: int) -> Dict[str, float]:
    return {k: v / n for k, v in metric_sums.items()}


def _reduce_batches(per_batch) -> Dict[str, float]:
    """ONE device->host transfer for a whole epoch's worth of
    (metrics, batch_size) pairs — a per-step device_get would block the
    dispatch queue on every batch (the reference's `.item()` stall,
    Report.md:657)."""
    if not per_batch:
        return {}
    host = jax.device_get([metrics for metrics, _ in per_batch])
    sizes = [bs for _, bs in per_batch]
    sums: Dict[str, float] = {}
    for metrics, bs in zip(host, sizes):
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(v) * bs
    return sums


def run_eval(eval_step, params, bn_state, ds: ArrayDataset, batch_size: int,
             extra_args: Tuple = (), shard=None) -> Dict[str, float]:
    per_batch = []
    n = 0
    for imgs, labels in iter_batches(ds, batch_size, shuffle=False):
        if shard is not None:
            imgs, labels = shard(imgs, labels)
            if len(labels) == 0:
                continue
        metrics = eval_step(params, bn_state, imgs, labels, *extra_args)
        per_batch.append((metrics, len(labels)))
        n += len(labels)
    return _weighted_mean(_reduce_batches(per_batch), n)


def train_supervised_ae(
    train_ds: ArrayDataset,
    val_ds: ArrayDataset,
    *,
    model_cfg: ModelConfig,
    data_cfg: DataConfig,
    alpha: float,
    lr: float,
    max_epochs: int = 80,
    patience: int = 15,
    seed: int = 0,
    compute_dtype=jnp.float32,
    log: Optional[LogFn] = None,
    train_step=None,
    eval_step=None,
    mesh=None,
) -> TrainResult:
    """Train one (alpha, lr) supervised-AE config with early stopping.

    Pass prebuilt ``train_step``/``eval_step`` to share compilations across
    grid-search configs (alpha/lr are traced scalars in the step). Pass
    ``mesh`` (jax.sharding.Mesh) for data-parallel training: batches are
    sharded on axis 0, params/optimizer replicated, gradient and BatchNorm
    reductions become global via XLA collectives (satae.parallel.dp).
    """
    key = jax.random.PRNGKey(seed)
    init_key, key = jax.random.split(key)
    params, bn_state = supervised_ae_init(
        init_key, model_cfg, in_ch=data_cfg.channels,
        image_size=data_cfg.image_size, dtype=jnp.float32)
    opt_state = adam_init(params)
    shard = None
    dp_eval = None
    if mesh is not None:
        from satae.parallel import replicate, shard_batch
        from satae.parallel.dp import (make_dp_ae_eval_step_weighted,
                                       make_dp_ae_train_step)
        train_step = train_step or make_dp_ae_train_step(
            mesh, model_cfg, data_cfg, compute_dtype)
        eval_w = make_dp_ae_eval_step_weighted(mesh, model_cfg, compute_dtype)
        params = replicate(mesh, params)
        bn_state = replicate(mesh, bn_state)
        opt_state = replicate(mesh, opt_state)
        n_dev = mesh.devices.size
        # training: drop the sub-device remainder of each batch (standard
        # drop_last semantics — at most n_dev-1 of the shuffled epoch tail)
        shard = lambda imgs, labs: shard_batch(
            mesh, imgs[: len(imgs) // n_dev * n_dev],
            labs[: len(labs) // n_dev * n_dev])

        def dp_eval(params, bn_state, ds, alpha):
            # evaluation: zero-weight padding instead of truncation, so val
            # metrics (and therefore best-epoch selection) cover every sample;
            # metric sums stay on device until one fetch at the end
            device_sums = []
            for imgs, labs in iter_batches(ds, data_cfg.batch_size,
                                           shuffle=False):
                pad = (-len(labs)) % n_dev
                w = np.concatenate([np.ones(len(labs), np.float32),
                                    np.zeros(pad, np.float32)])
                if pad:
                    imgs = np.concatenate(
                        [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
                    labs = np.concatenate(
                        [labs, np.zeros((pad,), labs.dtype)])
                device_sums.append(eval_w(
                    params, bn_state, *shard_batch(mesh, imgs, labs, w),
                    alpha))
            sums: Dict[str, float] = {}
            for m in jax.device_get(device_sums):
                for k, v in m.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
            n = sums.pop("n")
            return {k: v / n for k, v in sums.items()}
    train_step = train_step or S.make_ae_train_step(
        model_cfg, data_cfg, compute_dtype)
    eval_step = eval_step or S.make_ae_eval_step(model_cfg, compute_dtype)

    alpha_arr = jnp.asarray(alpha, jnp.float32)
    lr_arr = jnp.asarray(lr, jnp.float32)

    history: Dict[str, List[float]] = {
        "train_loss": [], "val_loss": [], "train_mse": [], "val_mse": [],
        "train_ce": [], "val_ce": [], "train_acc": [], "val_acc": []}
    best_val = float("inf")
    best_val_acc = 0.0
    best_epoch = -1
    best_params = jax.device_get(params)
    best_bn = jax.device_get(bn_state)
    epochs_no_improve = 0
    epoch = 0

    for epoch in range(max_epochs):
        n_seen = 0
        per_batch = []
        for step_i, (imgs, labels) in enumerate(
                iter_batches(train_ds, data_cfg.batch_size, shuffle=True,
                             seed=seed, epoch=epoch)):
            if shard is not None:
                imgs, labels = shard(imgs, labels)
                if len(labels) == 0:
                    continue
            step_key = jax.random.fold_in(jax.random.fold_in(key, epoch), step_i)
            params, bn_state, opt_state, metrics = train_step(
                params, bn_state, opt_state, imgs, labels, step_key,
                alpha_arr, lr_arr)
            per_batch.append((metrics, len(labels)))
            n_seen += len(labels)
        train_m = _weighted_mean(_reduce_batches(per_batch), n_seen)
        if dp_eval is not None:
            val_m = dp_eval(params, bn_state, val_ds, alpha_arr)
        else:
            val_m = run_eval(eval_step, params, bn_state, val_ds,
                             data_cfg.batch_size, (alpha_arr,), shard=shard)
        for k in ("loss", "mse", "ce", "acc"):
            history[f"train_{k}"].append(train_m[k])
            history[f"val_{k}"].append(val_m[k])
        if log:
            log(f"epoch {epoch:3d}  train_loss={train_m['loss']:.4f} "
                f"val_loss={val_m['loss']:.4f} val_acc={val_m['acc']:.4f}")
        if val_m["loss"] < best_val:
            best_val = val_m["loss"]
            best_val_acc = val_m["acc"]
            best_epoch = epoch
            best_params = jax.device_get(params)
            best_bn = jax.device_get(bn_state)
            epochs_no_improve = 0
        else:
            epochs_no_improve += 1
            if epochs_no_improve >= patience:
                break

    return TrainResult(best_params, best_bn, best_val, best_val_acc,
                       best_epoch, epoch + 1, history)


def train_mlp(
    train_x: np.ndarray, train_y: np.ndarray,
    val_x: np.ndarray, val_y: np.ndarray,
    *,
    model_cfg: ModelConfig,
    lr: float,
    weight_decay: float = 1e-4,
    epochs: int = 30,
    batch_size: int = 64,
    seed: int = 0,
    log: Optional[LogFn] = None,
    train_step=None,
    eval_step=None,
) -> TrainResult:
    """Train the latent-MLP classifier; best-epoch selection by val accuracy."""
    key = jax.random.PRNGKey(seed)
    init_key, key = jax.random.split(key)
    params, bn_state = mlp_init(init_key, model_cfg,
                                input_dim=train_x.shape[-1])
    opt_state = adam_init(params)
    train_step = train_step or S.make_mlp_train_step(model_cfg)
    eval_step = eval_step or S.make_mlp_eval_step(model_cfg)
    lr_arr = jnp.asarray(lr, jnp.float32)
    wd_arr = jnp.asarray(weight_decay, jnp.float32)

    train_ds = ArrayDataset(train_x, train_y)
    val_ds = ArrayDataset(val_x, val_y)
    history: Dict[str, List[float]] = {
        "train_loss": [], "val_loss": [], "train_acc": [], "val_acc": []}
    best_acc = -1.0
    best_loss = float("inf")
    best_epoch = -1
    best_params = jax.device_get(params)
    best_bn = jax.device_get(bn_state)

    for epoch in range(epochs):
        per_batch = []
        for step_i, (xb, yb) in enumerate(
                iter_batches(train_ds, batch_size, shuffle=True, seed=seed,
                             epoch=epoch)):
            step_key = jax.random.fold_in(jax.random.fold_in(key, epoch), step_i)
            params, bn_state, opt_state, metrics = train_step(
                params, bn_state, opt_state, xb, yb, step_key, lr_arr, wd_arr)
            per_batch.append((metrics, len(yb)))
        train_m = _weighted_mean(_reduce_batches(per_batch), len(train_ds))
        val_m = run_eval(eval_step, params, bn_state, val_ds, batch_size)
        history["train_loss"].append(train_m["loss"])
        history["train_acc"].append(train_m["acc"])
        history["val_loss"].append(val_m["loss"])
        history["val_acc"].append(val_m["acc"])
        if log:
            log(f"epoch {epoch:3d}  train_acc={train_m['acc']:.4f} "
                f"val_acc={val_m['acc']:.4f}")
        if val_m["acc"] > best_acc:
            best_acc = val_m["acc"]
            best_loss = val_m["loss"]
            best_epoch = epoch
            best_params = jax.device_get(params)
            best_bn = jax.device_get(bn_state)

    return TrainResult(best_params, best_bn, best_loss, best_acc, best_epoch,
                       epochs, history)
