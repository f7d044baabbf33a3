"""Scan-epoch trainers: the fast path for full-scale training.

Same contract as satae.train.loop (TrainResult, early stopping, true
best-epoch snapshots) but each epoch is ONE device program over the
HBM-resident dataset (satae.train.hbm): measured 0.16 s per 14k-image epoch
on a v5e chip at the reference's batch 64 — the per-batch host loop in
loop.py costs ~100x that in dispatch alone at this batch size.

Why not the vmapped all-configs-at-once sweep (satae.train.vmap_sweep)?
Measured head-to-head at reference scale: one vmapped 45-config epoch costs
14.6 s vs 45 x 0.16 s = 7.2 s sequential — vmap over per-config conv weights
lowers to grouped convolutions, which utilize the MXU poorly at these channel
counts. Sequential scan-epochs win by ~2x and reuse ONE compilation across
all configs (alpha/lr are traced), so the grid search runs sequential+scan by
default; the vmapped path remains for cases where it wins (e.g. MLP sweeps,
where there are no convs).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from satae.config import DataConfig, ModelConfig
from satae.data.pipeline import ArrayDataset
from satae.models.mlp import mlp_init
from satae.models.supervised_ae import supervised_ae_init
from satae.train import hbm
from satae.train.loop import LogFn, TrainResult
from satae.train.optim import adam_init


_device_copy = jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x + 0, t))
"""Device-side pytree snapshot: one dispatch, no host transfer. Needed
because donated buffers are invalidated by the next epoch; the best-epoch
snapshot only moves to the host once, when training finishes."""


class AEScanEngine:
    """Compiled scan-epoch train/eval programs, shared across grid configs.

    With ``mesh``, both programs are data-parallel: the dataset and epoch
    batches are sharded over the mesh's batch axis, params replicated, and
    XLA inserts the gradient / BatchNorm psums over ICI."""

    def __init__(self, model_cfg: ModelConfig, data_cfg: DataConfig,
                 compute_dtype=jnp.float32, mesh=None,
                 mesh_axis: str = "data"):
        self.model_cfg = model_cfg
        self.data_cfg = data_cfg
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.train_epoch = jax.jit(
            hbm.ae_train_epoch_body(model_cfg, data_cfg, compute_dtype,
                                    mesh=mesh, mesh_axis=mesh_axis),
            donate_argnums=(0, 1, 2))
        self.eval_sums = jax.jit(hbm.ae_eval_body(model_cfg, compute_dtype))


def train_supervised_ae_scan(
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
    engine: Optional[AEScanEngine] = None,
    log: Optional[LogFn] = None,
    device_data=None,
    compute_dtype=None,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
) -> TrainResult:
    """Scan-epoch version of loop.train_supervised_ae (same selection
    semantics). Pass ``engine`` and ``device_data`` (from
    :func:`upload_ae_data`) to share compilations/uploads across configs.
    Pass ``mesh`` for data-parallel scan epochs (batch sharded, params
    replicated; requires batch_size divisible by the device count).

    ``checkpoint_path`` + ``checkpoint_every=k`` enables mid-training crash
    recovery: the full train state (params, BN stats, optimizer moments,
    early-stopping bookkeeping, best-epoch snapshot) is flushed every k
    epochs, and an existing checkpoint at that path is resumed from
    automatically — the recovery story the reference has none of
    (SURVEY.md §5).

    Epoch loop is PIPELINED (unless checkpointing): epoch e+1's programs are
    dispatched before epoch e's metrics are read back, hiding the host<->
    device round-trip (~2x25-30 ms through this environment's relay) behind
    device compute — measured 221 -> 123 ms per reference-scale epoch,
    numerically identical. The best-epoch snapshot is captured on device
    every epoch (one fused buffer copy) so the lagged decision can still
    point at the right weights; on early stop the already-dispatched extra
    epoch is discarded uncounted. Checkpointed runs stay synchronous so the
    saved opt_state matches the recorded epoch exactly."""
    if len(train_ds) < data_cfg.batch_size:
        raise ValueError(
            f"train split ({len(train_ds)}) is smaller than batch_size "
            f"({data_cfg.batch_size}); the scan engine trains on full "
            "batches only — reduce batch_size or use loop.train_supervised_ae")
    if engine is not None:
        if mesh is not None and engine.mesh is not mesh:
            # a hard error, not an assert: under python -O this would sail
            # into an opaque XLA sharding failure (or a wrong collective
            # topology) deep inside the first epoch
            raise ValueError(
                "engine was built with a different mesh than requested")
        if engine.model_cfg != model_cfg or engine.data_cfg != data_cfg:
            raise ValueError(
                "engine was built for a different model/data config; its "
                "compiled epoch programs close over the ORIGINAL configs — "
                "a same-shaped mismatch would silently train with the "
                "engine's hyperparameters")
        # compute_dtype=None means "inherit from engine"; anything explicit
        # must match exactly — a bf16 engine silently serving an (implicit)
        # f32 request was a real trap, so no default-coercion escape hatch.
        if compute_dtype is not None and engine.compute_dtype != compute_dtype:
            raise ValueError(
                f"engine was built with compute_dtype="
                f"{jnp.dtype(engine.compute_dtype).name}, but "
                f"{jnp.dtype(compute_dtype).name} was requested; pass "
                "compute_dtype=None to inherit the engine's dtype")
    engine = engine or AEScanEngine(
        model_cfg, data_cfg,
        jnp.float32 if compute_dtype is None else compute_dtype, mesh=mesh)
    mesh = engine.mesh
    if device_data is None:
        device_data = upload_ae_data(train_ds, val_ds, data_cfg.batch_size,
                                     mesh=mesh, mesh_axis=engine.mesh_axis)
    images, labels, val_imgs, val_labs, val_wts = device_data

    key = jax.random.PRNGKey(seed)
    init_key, key = jax.random.split(key)
    params, bn_state = supervised_ae_init(
        init_key, model_cfg, in_ch=data_cfg.channels,
        image_size=data_cfg.image_size)
    opt_state = adam_init(params)
    if mesh is not None:
        from satae.parallel import replicate
        params = replicate(mesh, params)
        bn_state = replicate(mesh, bn_state)
        opt_state = replicate(mesh, opt_state)
    alpha_arr = jnp.asarray(alpha, jnp.float32)
    lr_arr = jnp.asarray(lr, jnp.float32)

    n_train_counted = (len(train_ds) // data_cfg.batch_size) * data_cfg.batch_size
    history: Dict[str, List[float]] = {
        "train_loss": [], "val_loss": [], "train_mse": [], "val_mse": [],
        "train_ce": [], "val_ce": [], "train_acc": [], "val_acc": []}
    best_val = float("inf")
    best_val_acc = 0.0
    best_epoch = -1
    best_snapshot = _device_copy((params, bn_state))
    bad = 0
    start_epoch = 0

    from pathlib import Path

    from satae.io import checkpoint as ckpt
    if checkpoint_path and Path(checkpoint_path).exists():
        params, bn_state, opt_state, meta = ckpt.load_train_state(
            checkpoint_path, params_like=jax.device_get(params),
            bn_state_like=jax.device_get(bn_state),
            opt_state_like=jax.device_get(opt_state))
        start_epoch = meta["epoch"] + 1
        best_val = meta.get("best_val", best_val)
        best_val_acc = meta.get("best_val_acc", best_val_acc)
        best_epoch = meta.get("best_epoch", best_epoch)
        bad = meta.get("bad", 0)
        for k in history:
            history[k] = meta.get("history", {}).get(k, [])
        best_file = Path(checkpoint_path).with_suffix(".best.msgpack")
        if best_file.exists():
            best_snapshot = ckpt.load_model(best_file,
                                            jax.device_get(params),
                                            jax.device_get(bn_state))
        if mesh is not None:
            # load_train_state returned host pytrees; restore the
            # replicated-on-mesh invariant the engine's sharded epoch
            # programs were compiled against
            from satae.parallel import replicate
            params = replicate(mesh, params)
            bn_state = replicate(mesh, bn_state)
            opt_state = replicate(mesh, opt_state)
            best_snapshot = replicate(mesh, best_snapshot)
        if log:
            log(f"resumed from {checkpoint_path} at epoch {start_epoch}")
        resumed_epochs = start_epoch
        if bad >= patience:      # resumed a run that had already stopped
            start_epoch = max_epochs
    else:
        resumed_epochs = 0

    # synchronous (readback-per-epoch) execution is only needed while
    # FLUSHING in-flight state (the saved opt_state must match the epoch);
    # checkpoint_path alone (resume-only, checkpoint_every=0) keeps the
    # ~1.8x-faster pipelined loop
    pipelined = not (checkpoint_path and checkpoint_every)
    pending = None  # (epoch, device tsum, device vsum, device snapshot)
    stopped = False

    def process(p_epoch, tsum, vsum, snapshot):
        """Fold one epoch's (possibly lagged) metrics into history/early-stop
        state. Returns True when training must stop."""
        nonlocal best_val, best_val_acc, best_epoch, best_snapshot, bad, \
            epochs_done
        tsum, vsum = jax.device_get((tsum, vsum))
        nv = float(vsum["n"])
        for k in ("loss", "mse", "ce", "acc"):
            history[f"train_{k}"].append(float(tsum[k]) / n_train_counted)
            history[f"val_{k}"].append(float(vsum[k]) / nv)
        val_loss = history["val_loss"][-1]
        epochs_done = p_epoch + 1
        if log:
            log(f"epoch {p_epoch:3d}  "
                f"train_loss={history['train_loss'][-1]:.4f} "
                f"val_loss={val_loss:.4f} val_acc={history['val_acc'][-1]:.4f}")
        if val_loss < best_val:
            best_val = val_loss
            best_val_acc = history["val_acc"][-1]
            best_epoch = p_epoch
            best_snapshot = snapshot
            bad = 0
        else:
            bad += 1
        return bad >= patience

    # NOT start_epoch: a resumed already-stopped run sets start_epoch to
    # max_epochs just to skip the loop; epochs_run must stay the real count
    epochs_done = resumed_epochs
    for epoch in range(start_epoch, max_epochs):
        order = jnp.asarray(hbm.epoch_order(
            len(train_ds), data_cfg.batch_size, seed, epoch))
        ekey = jax.random.fold_in(key, epoch)
        params, bn_state, opt_state, tsum = engine.train_epoch(
            params, bn_state, opt_state, images, labels, order, ekey,
            alpha_arr, lr_arr)
        vsum = engine.eval_sums(params, bn_state, val_imgs, val_labs,
                                val_wts, alpha_arr)
        snapshot = _device_copy((params, bn_state))
        if pipelined:
            # read back LAST epoch's metrics only now — this epoch's programs
            # are already in flight, hiding the relay round-trip
            if pending is not None and process(*pending):
                pending = None  # the in-flight epoch is discarded, uncounted
                stopped = True
                break
            pending = (epoch, tsum, vsum, snapshot)
            continue
        if process(epoch, tsum, vsum, snapshot):
            stopped = True

        if checkpoint_path and checkpoint_every and \
                (epoch + 1) % checkpoint_every == 0:
            # best snapshot FIRST, then the state/meta pair: each write is
            # atomic but the pair is not — with this order a crash in
            # between leaves meta one flush old, so resume merely re-discovers
            # the improvement instead of mislabeling stale best weights.
            bp, bb = best_snapshot
            ckpt.save_model(
                Path(checkpoint_path).with_suffix(".best.msgpack"), bp, bb)
            ckpt.save_train_state(
                checkpoint_path, params=params, bn_state=bn_state,
                opt_state=opt_state, epoch=epoch,
                extra={"best_val": best_val, "best_val_acc": best_val_acc,
                       "best_epoch": best_epoch, "bad": bad,
                       "history": history})

        if stopped:
            break

    if pending is not None:
        process(*pending)  # max_epochs reached: last epoch still counts

    best_params, best_bn = jax.device_get(best_snapshot)
    return TrainResult(best_params, best_bn, best_val, best_val_acc,
                       best_epoch, epochs_done, history)


def upload_ae_data(train_ds: ArrayDataset, val_ds: ArrayDataset,
                   batch_size: int, mesh=None, mesh_axis: str = "data"):
    """Upload train arrays + padded val batches to HBM once per sweep.

    With ``mesh``, the train arrays are sharded over the batch axis (the
    dataset itself is distributed across device HBMs); val batches stay
    replicated (the eval program is cheap and runs identically per device).
    """
    val_imgs, val_labs, val_wts = hbm.padded_eval_batches(val_ds, batch_size)
    if mesh is not None:
        from satae.parallel import batch_sharding
        # sharding requires axis 0 divisible by the device count: pad with
        # zero rows — epoch_order only ever gathers indices < len(train_ds),
        # so the padding is dead weight, never training data
        n_dev = mesh.devices.size
        pad = (-len(train_ds)) % n_dev
        imgs_h, labs_h = train_ds.images, train_ds.labels
        if pad:
            imgs_h = np.concatenate(
                [imgs_h, np.zeros((pad,) + imgs_h.shape[1:], imgs_h.dtype)])
            labs_h = np.concatenate(
                [labs_h, np.zeros((pad,), labs_h.dtype)])
        images = jax.device_put(imgs_h, batch_sharding(mesh, 4, mesh_axis))
        labels = jax.device_put(labs_h, batch_sharding(mesh, 1, mesh_axis))
    else:
        images = jax.device_put(train_ds.images)
        labels = jax.device_put(train_ds.labels)
    return (images, labels, jax.device_put(val_imgs),
            jax.device_put(val_labs), jax.device_put(val_wts))


# ---------------------------------------------------------------------------
# MLP scan trainer
# ---------------------------------------------------------------------------

class MLPScanEngine:
    """Compiled MLP scan-epoch programs (shared bodies in satae.train.hbm;
    lr and weight_decay are traced, so one compilation serves every grid
    point)."""

    def __init__(self, model_cfg: ModelConfig):
        self.model_cfg = model_cfg
        self.train_epoch = jax.jit(hbm.mlp_train_epoch_body(model_cfg),
                                   donate_argnums=(0, 1, 2))
        self.eval_sums = jax.jit(hbm.mlp_eval_body(model_cfg))


def train_mlp_scan(
    train_x: np.ndarray, train_y: np.ndarray,
    val_x: np.ndarray, val_y: np.ndarray,
    *,
    model_cfg: ModelConfig,
    lr: float,
    weight_decay: float = 1e-4,
    epochs: int = 30,
    batch_size: int = 64,
    seed: int = 0,
    engine: Optional[MLPScanEngine] = None,
    log: Optional[LogFn] = None,
    device_data=None,
) -> TrainResult:
    if engine is not None and engine.model_cfg != model_cfg:
        raise ValueError(
            "engine was built for a different model config; its compiled "
            "epoch programs close over the ORIGINAL config — a same-shaped "
            "mismatch (e.g. dropout rate) would silently train with the "
            "engine's hyperparameters")
    engine = engine or MLPScanEngine(model_cfg)
    if device_data is None:
        device_data = upload_mlp_data(train_x, train_y, val_x, val_y,
                                      batch_size)
    xs, ys, vx, vy, vw = device_data

    key = jax.random.PRNGKey(seed)
    init_key, key = jax.random.split(key)
    params, bn_state = mlp_init(init_key, model_cfg,
                                input_dim=train_x.shape[-1])
    opt_state = adam_init(params)
    lr_arr = jnp.asarray(lr, jnp.float32)
    wd_arr = jnp.asarray(weight_decay, jnp.float32)

    if len(train_y) < batch_size:
        raise ValueError(
            f"train set ({len(train_y)}) is smaller than batch_size "
            f"({batch_size}); the scan engine trains on full batches only")
    n_counted = (len(train_y) // batch_size) * batch_size
    history: Dict[str, List[float]] = {
        "train_loss": [], "val_loss": [], "train_acc": [], "val_acc": []}
    best_acc, best_loss, best_epoch = -1.0, float("inf"), -1
    best_snapshot = _device_copy((params, bn_state))

    pending = None  # (epoch, device tsum, device vsum, device snapshot)

    def process(p_epoch, tsum, vsum, snapshot):
        nonlocal best_acc, best_loss, best_epoch, best_snapshot
        tsum, vsum = jax.device_get((tsum, vsum))
        nv = float(vsum["n"])
        history["train_loss"].append(float(tsum["loss"]) / n_counted)
        history["train_acc"].append(float(tsum["acc"]) / n_counted)
        history["val_loss"].append(float(vsum["loss"]) / nv)
        history["val_acc"].append(float(vsum["acc"]) / nv)
        if log:
            log(f"epoch {p_epoch:3d}  "
                f"train_acc={history['train_acc'][-1]:.4f} "
                f"val_acc={history['val_acc'][-1]:.4f}")
        if history["val_acc"][-1] > best_acc:
            best_acc = history["val_acc"][-1]
            best_loss = history["val_loss"][-1]
            best_epoch = p_epoch
            best_snapshot = snapshot

    # pipelined readback: epoch e+1 is dispatched before epoch e's metrics
    # are read (fixed epoch count, so the 1-epoch lag has no semantics at
    # all here — see train_supervised_ae_scan for the early-stopping case)
    for epoch in range(epochs):
        order = jnp.asarray(hbm.epoch_order(len(train_y), batch_size, seed,
                                            epoch))
        ekey = jax.random.fold_in(key, epoch)
        params, bn_state, opt_state, tsum = engine.train_epoch(
            params, bn_state, opt_state, xs, ys, order, ekey, lr_arr, wd_arr)
        vsum = engine.eval_sums(params, bn_state, vx, vy, vw)
        snapshot = _device_copy((params, bn_state))
        if pending is not None:
            process(*pending)
        pending = (epoch, tsum, vsum, snapshot)
    if pending is not None:
        process(*pending)

    best_params, best_bn = jax.device_get(best_snapshot)
    return TrainResult(best_params, best_bn, best_loss, best_acc, best_epoch,
                       epochs, history)


def upload_mlp_data(train_x, train_y, val_x, val_y, batch_size: int):
    val = ArrayDataset(np.asarray(val_x, np.float32),
                       np.asarray(val_y, np.int32))
    vx, vy, vw = hbm.padded_eval_batches(val, batch_size)
    return (jax.device_put(np.asarray(train_x, np.float32)),
            jax.device_put(np.asarray(train_y, np.int32)),
            jax.device_put(vx), jax.device_put(vy), jax.device_put(vw))
