"""Device-sharded hyperparameter sweeps: one grid config per device.

The reference's 45-config AE grid (Report.md:595-730) and 11-lr MLP grid
(Report.md:2611) are embarrassingly parallel across configs (SURVEY.md §3.3).
This engine shards the CONFIG axis over a ``jax.sharding.Mesh``: each round
trains ``n_devices`` configs simultaneously via ``jax.shard_map``, every
device running the standard single-config scan-epoch body (satae.train.hbm)
on its own replica of the HBM-resident dataset. Because each device sees a
plain (non-vmapped) program, the convolutions stay ordinary XLA convs — none
of the grouped-conv MXU penalty the all-configs vmap pays (see
fast_loop.py's measured head-to-head) — and there are ZERO cross-device
collectives: the mesh is used purely as a config-parallel work partitioner.

Seeding/selection parity: config ``i`` (its index in the full grid) trains
with exactly the same init key, per-epoch shuffle order, and augmentation
keys as the sequential engine (gridsearch.ae_grid_search with seed+i), so a
sharded sweep selects the same winner as the sequential one up to reduction
order.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from satae.config import (AETrainConfig, DataConfig, MLPTrainConfig,
                          ModelConfig)
from satae.data.pipeline import ArrayDataset
from satae.io.checkpoint import GridResultStore
from satae.models.mlp import mlp_init
from satae.models.supervised_ae import supervised_ae_init
# replicate-to-mesh comes from the shared parallel helpers (one copy of the
# device_put logic); host arrays go straight in — no intermediate default-
# device upload (each host->device transfer costs ~0.25 s on the relay)
from satae.parallel import replicate as _replicate
from satae.train import hbm
from satae.train.fast_loop import _device_copy
from satae.train.gridsearch import SweepResult
from satae.train.sweep_common import SweepBook
from satae.train.loop import LogFn, TrainResult
from satae.train.optim import adam_init


def _squeeze0(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: x[0], tree)


def _expand0(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: x[None], tree)


def _slice_tree(tree: Any, i: int) -> Any:
    """Slice config i out of a config-stacked pytree, ON DEVICE — snapshots
    stay in HBM (x[i] materializes a fresh buffer, immune to later buffer
    donation); the winner is brought to the host exactly once at the end."""
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def _to_host(tree: Any) -> Any:
    """device_get that also works under real multi-process execution: leaves
    spanning non-addressable devices (config shards owned by another host)
    are allgathered so every process sees the full value (process_allgather
    on a non-fully-addressable array returns it fully replicated)."""
    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(x)
    return jax.tree_util.tree_map(get, tree)


def _offerable(tree: Any) -> Any:
    """Snapshot trees handed to SweepBook.offer stay in HBM single-process
    (save_model reads the winner exactly once); under multi-process every
    process must hold the full value for the identical-bytes checkpoint
    write, so gather eagerly."""
    return _to_host(tree) if jax.process_count() > 1 else tree


def _shard_cfg_axis(mesh, tree: Any, axis: str) -> Any:
    """device_put a config-stacked pytree with axis 0 sharded over the mesh."""
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)




class ShardedSweepEngine:
    """Compiled shard_map programs: per-config single-config train epoch +
    eval, with the CONFIG axis laid manually over the mesh's first axis. On
    a 2-D (config, data) mesh (parallel.make_grid_mesh), the data axis stays
    in GSPMD's automatic mode — each config's training is itself
    data-parallel (batch sharded, gradient/BatchNorm psums over ICI) via the
    sharding constraints inside the epoch body. One compilation serves every
    round of every sweep (alpha/lr/keys are traced)."""

    def __init__(self, train_body, eval_body, mesh, *,
                 n_scalar_train: int, n_scalar_eval: int):
        # train_body(params, bn, opt, data..., order, key, scalars...) where
        # everything except the data arrays carries a leading config axis.
        self.mesh = mesh
        self.cfg_axis = mesh.axis_names[0]
        cfg = P(self.cfg_axis)
        rep = P()

        def train_dev(params, bn, opt, data, order, key, scalars):
            out = train_body(_squeeze0(params), _squeeze0(bn), _squeeze0(opt),
                             *data, order[0], key[0],
                             *(s[0] for s in scalars))
            return tuple(_expand0(t) for t in out)

        def eval_dev(params, bn, data, scalars):
            out = eval_body(_squeeze0(params), _squeeze0(bn), *data,
                            *(s[0] for s in scalars))
            return _expand0(out)

        # check_vma=False: the scan carries inside the shared epoch bodies
        # start from unvarying jnp.zeros(()) literals, which trips the
        # varying-mesh-axes check even though the manual axis carries no
        # collectives (each config is an independent training).
        self.train_round_epoch = jax.jit(
            jax.shard_map(
                train_dev, mesh=mesh,
                in_specs=(cfg, cfg, cfg, rep, cfg, cfg,
                          (cfg,) * n_scalar_train),
                out_specs=(cfg, cfg, cfg, cfg),
                axis_names={self.cfg_axis}, check_vma=False),
            donate_argnums=(0, 1, 2))
        self.eval_round = jax.jit(
            jax.shard_map(
                eval_dev, mesh=mesh,
                in_specs=(cfg, cfg, rep, (cfg,) * n_scalar_eval),
                out_specs=cfg,
                axis_names={self.cfg_axis}, check_vma=False))


def _chunk_pad(items: List, n: int) -> List[Tuple[List, np.ndarray]]:
    """Split into rounds of exactly n, padding the last round by repeating
    its final item; returns [(round_items, real_mask)]."""
    rounds = []
    for lo in range(0, len(items), n):
        chunk = list(items[lo:lo + n])
        mask = np.zeros((n,), bool)
        mask[:len(chunk)] = True
        while len(chunk) < n:
            chunk.append(chunk[-1])
        rounds.append((chunk, mask))
    return rounds


def ae_sharded_grid_search(
    train_ds: ArrayDataset,
    val_ds: ArrayDataset,
    *,
    model_cfg: ModelConfig,
    data_cfg: DataConfig,
    ae_cfg: AETrainConfig,
    mesh,
    seed: int = 0,
    out_dir: Optional[str] = None,
    compute_dtype=jnp.float32,
    log: Optional[LogFn] = None,
    save_curves: bool = False,
) -> SweepResult:
    """Config-sharded alpha x lr sweep over a 1-D or 2-D mesh (reference C16
    over the mesh). 1-D: one config per device per round. 2-D
    (parallel.make_grid_mesh): mesh axis 0 carries configs, axis 1 makes
    each config's training data-parallel (dataset batch-sharded, XLA psums
    for gradients and BatchNorm statistics over ICI). Same caching/resume/
    global-best-checkpoint contract as gridsearch.ae_grid_search."""
    cfg_axis = mesh.axis_names[0]
    dp_axis = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    n_dev = int(mesh.shape[cfg_axis])
    hparams = [(float(a), float(lr)) for a in ae_cfg.alphas
               for lr in ae_cfg.learning_rates]
    if len(train_ds) < data_cfg.batch_size:
        raise ValueError(
            f"train split ({len(train_ds)}) is smaller than batch_size "
            f"({data_cfg.batch_size}); the sharded sweep trains on full "
            "batches only — reduce batch_size")
    # resume/selection contract shared with the sequential engine
    book = SweepBook(out_dir, ckpt_name="ae_global_best",
                     store_name="validation_losses.json", mode="min",
                     hp_keys=("alpha", "lr"))
    pending: List[Tuple[int, float, float]] = []  # (cfg_idx, alpha, lr)
    for ci, (alpha, lr) in enumerate(hparams):
        key = GridResultStore.key(alpha=alpha, lr=lr)
        if book.cached(key):
            if log:
                log(f"skip cached alpha={alpha} lr={lr}")
        else:
            pending.append((ci, alpha, lr))

    engine = ShardedSweepEngine(
        hbm.ae_train_epoch_body(model_cfg, data_cfg, compute_dtype,
                                mesh=mesh if dp_axis else None,
                                mesh_axis=dp_axis or "data"),
        hbm.ae_eval_body(model_cfg, compute_dtype),
        mesh, n_scalar_train=2, n_scalar_eval=1)

    if dp_axis is None:
        images = _replicate(mesh, train_ds.images)
        labels = _replicate(mesh, train_ds.labels)
    else:
        # 2-D mesh: the dataset lives batch-sharded over the data axis
        # (replicated over configs); zero-padding rows make the sample axis
        # divisible — epoch_order never samples indices >= len(train_ds)
        from satae.parallel import batch_sharding
        n_dp = int(mesh.shape[dp_axis])
        pad = (-len(train_ds)) % n_dp
        imgs_h, labs_h = train_ds.images, train_ds.labels
        if pad:
            imgs_h = np.concatenate(
                [imgs_h, np.zeros((pad,) + imgs_h.shape[1:], imgs_h.dtype)])
            labs_h = np.concatenate([labs_h, np.zeros((pad,), labs_h.dtype)])
        images = jax.device_put(imgs_h, batch_sharding(mesh, 4, dp_axis))
        labels = jax.device_put(labs_h, batch_sharding(mesh, 1, dp_axis))
    val_data = _replicate(
        mesh, hbm.padded_eval_batches(val_ds, data_cfg.batch_size))
    n_train_counted = (len(train_ds) // data_cfg.batch_size) \
        * data_cfg.batch_size

    hist_keys = ("loss", "mse", "ce", "acc")

    for chunk, mask in _chunk_pad(pending, n_dev):
        cfg_idx = np.array([c[0] for c in chunk])
        alphas = jnp.asarray([c[1] for c in chunk], jnp.float32)
        lrs = jnp.asarray([c[2] for c in chunk], jnp.float32)

        # per-config seeding exactly like the sequential engine (seed+ci)
        base_keys = jnp.stack([jax.random.PRNGKey(seed + int(ci))
                               for ci in cfg_idx])
        split2 = jax.vmap(lambda k: tuple(jax.random.split(k)))
        init_keys, loop_keys = split2(base_keys)
        vparams, vbn = jax.vmap(
            lambda k: supervised_ae_init(k, model_cfg,
                                         in_ch=data_cfg.channels,
                                         image_size=data_cfg.image_size)
        )(init_keys)
        vopt = adam_init(vparams)
        vopt["step"] = jnp.zeros((n_dev,), jnp.int32)
        vparams = _shard_cfg_axis(mesh, vparams, cfg_axis)
        vbn = _shard_cfg_axis(mesh, vbn, cfg_axis)
        vopt = _shard_cfg_axis(mesh, vopt, cfg_axis)
        alphas = _shard_cfg_axis(mesh, alphas, cfg_axis)
        lrs = _shard_cfg_axis(mesh, lrs, cfg_axis)
        loop_keys = _shard_cfg_axis(mesh, np.asarray(loop_keys), cfg_axis)

        history = {f"{p}_{k}": [[] for _ in range(n_dev)]
                   for p in ("train", "val") for k in hist_keys}
        best_val = np.full((n_dev,), np.inf)
        best_acc = np.zeros((n_dev,))
        best_epoch = np.full((n_dev,), -1, np.int64)
        bad = np.zeros((n_dev,), np.int64)
        active = mask.copy()
        stopped_at = np.where(mask, ae_cfg.max_epochs, 0).astype(np.int64)
        round_best_snaps: Dict[int, Any] = {}

        n_processed = 0
        in_flight = None  # (epoch, device tsum, device vsum, device snapshot)

        def process(p_epoch, tsum, vsum, snap):
            """Fold one (possibly lagged) round-epoch's metrics into the
            per-config bookkeeping; True when every config has stopped."""
            nonlocal best_val, best_acc, best_epoch, bad, active, \
                stopped_at, n_processed
            tsum, vsum = _to_host((tsum, vsum))
            nv = vsum["n"]
            for k in hist_keys:
                for i in range(n_dev):
                    history[f"train_{k}"][i].append(
                        float(tsum[k][i]) / n_train_counted)
                    history[f"val_{k}"][i].append(
                        float(vsum[k][i]) / float(nv[i]))
            val_loss = vsum["loss"] / nv
            val_acc = vsum["acc"] / nv
            n_processed = p_epoch + 1

            improved = active & (val_loss < best_val)
            best_val = np.where(improved, val_loss, best_val)
            best_acc = np.where(improved, val_acc, best_acc)
            best_epoch = np.where(improved, p_epoch, best_epoch)
            bad = np.where(improved, 0, bad + 1)
            newly_stopped = active & (bad >= ae_cfg.patience)
            stopped_at = np.where(newly_stopped, p_epoch + 1, stopped_at)
            active &= ~newly_stopped

            # true best-epoch snapshots (device slices of the epoch's state
            # copy), only for configs that could still become the global
            # winner or the all-diverged fallback (the checkpoint metric
            # guards resume parity)
            sp, sb = snap
            thresh = min(book.ckpt_metric,
                         book.fallback_key if book.best is None
                         else book.best.best_val_loss)
            for i in np.flatnonzero(improved):
                if val_loss[i] < thresh:
                    round_best_snaps[i] = (_slice_tree(sp, i),
                                           _slice_tree(sb, i))
            if log:
                log(f"round epoch {p_epoch:3d}: active={int(active.sum())}"
                    f"/{int(mask.sum())} best={np.nanmin(best_val):.4f}")
            return not active.any()

        # pipelined readback: epoch e+1's round is dispatched before epoch
        # e's metrics are read (same scheme as fast_loop; the lagged stop
        # discards one in-flight epoch, uncounted)
        for epoch in range(ae_cfg.max_epochs):
            order = jnp.asarray(np.stack(
                [hbm.epoch_order(len(train_ds), data_cfg.batch_size,
                                 seed + int(ci), epoch) for ci in cfg_idx]))
            order = _shard_cfg_axis(mesh, order, cfg_axis)
            ekeys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                loop_keys, epoch)
            vparams, vbn, vopt, tsum = engine.train_round_epoch(
                vparams, vbn, vopt, (images, labels), order, ekeys,
                (alphas, lrs))
            vsum = engine.eval_round(vparams, vbn, val_data, (alphas,))
            snap = _device_copy((vparams, vbn))
            if in_flight is not None and process(*in_flight):
                in_flight = None
                break
            in_flight = (epoch, tsum, vsum, snap)
        if in_flight is not None:
            process(*in_flight)

        for i in np.flatnonzero(mask):
            ci, alpha, lr = chunk[i]
            key = GridResultStore.key(alpha=alpha, lr=lr)
            n_hist = int(min(stopped_at[i], n_processed))
            cand_hist = {k: history[k][i][:n_hist] for k in history}

            def mk_res(p, b):
                return TrainResult(p, b, float(best_val[i]),
                                   float(best_acc[i]), int(best_epoch[i]),
                                   n_hist, cand_hist)
            hp = {"alpha": alpha, "lr": lr}
            # offer (checkpoint save) strictly BEFORE the store flush: a
            # crash between the two then costs a redundant retrain on
            # resume, never a cached-but-uncheckpointed winner
            if i in round_best_snaps:
                # snapshot-backed candidate: full best + fallback offer
                book.offer(mk_res(*_offerable(round_best_snaps[i])), hp)
            else:
                # no best-epoch snapshot was retained (never crossed the
                # winner threshold): only the end-of-run weights exist, and
                # only the divergence fallback may want them — check the
                # metric first so losing configs don't materialize slices
                cand = float(np.nan_to_num(best_val[i], nan=np.inf))
                if book.fallback is None or cand < book.fallback_key:
                    book.offer_fallback(
                        mk_res(*_offerable((_slice_tree(vparams, i),
                                          _slice_tree(vbn, i)))),
                        hp)
            book.record(key, {"alpha": alpha, "lr": lr,
                              "best_val_loss": float(best_val[i]),
                              "best_val_acc": float(best_acc[i]),
                              "best_epoch": int(best_epoch[i]),
                              "epochs_run": n_hist})
            if log:
                log(f"alpha={alpha} lr={lr}: val_loss={best_val[i]:.4f} "
                    f"({n_hist} epochs)")
            if save_curves and out_dir:
                from satae.eval import plots
                plots.loss_curves(
                    cand_hist,
                    Path(out_dir) / "curves" / f"ae_alpha{alpha:g}_lr{lr:g}.png",
                    title=f"AE alpha={alpha:g} lr={lr:g}")

    def template():
        return supervised_ae_init(
            jax.random.PRNGKey(0), model_cfg, in_ch=data_cfg.channels,
            image_size=data_cfg.image_size)

    def to_host(res):
        # the winner's snapshot stayed in HBM through the sweep; bring it to
        # the host exactly once here
        res.params, res.bn_state = _to_host((res.params, res.bn_state))
        return res

    best, best_hp = book.resolve(template, "sharded AE grid search",
                                 finalize=to_host)
    return SweepResult(best, best_hp, book.results)


def mlp_sharded_grid_search(
    train_x: np.ndarray, train_y: np.ndarray,
    val_x: np.ndarray, val_y: np.ndarray,
    *,
    model_cfg: ModelConfig,
    mlp_cfg: MLPTrainConfig,
    mesh,
    batch_size: int = 64,
    seed: int = 0,
    out_dir: Optional[str] = None,
    log: Optional[LogFn] = None,
    test_x: Optional[np.ndarray] = None,
    test_y: Optional[np.ndarray] = None,
    save_curves: bool = False,
) -> SweepResult:
    """Config-sharded 11-lr MLP sweep (reference C22 over the mesh): fixed
    epochs, best by val accuracy, per-lr best-epoch test accuracy. On a 2-D
    (config, data) mesh only the config axis is used — per-config MLP
    training is far too small to data-parallelize; the extra axis computes
    replicated (correct, just redundant)."""
    cfg_axis = mesh.axis_names[0]
    n_dev = int(mesh.shape[cfg_axis])
    lrs_py = [float(lr) for lr in mlp_cfg.learning_rates]
    input_dim = int(np.shape(train_x)[-1])
    if len(train_y) < batch_size:
        raise ValueError(
            f"train set ({len(train_y)}) is smaller than batch_size "
            f"({batch_size}); the sharded sweep trains on full batches only")

    engine = ShardedSweepEngine(
        hbm.mlp_train_epoch_body(model_cfg), hbm.mlp_eval_body(model_cfg),
        mesh, n_scalar_train=2, n_scalar_eval=0)

    xs = _replicate(mesh, np.asarray(train_x, np.float32))
    ys = _replicate(mesh, np.asarray(train_y, np.int32))
    val = ArrayDataset(np.asarray(val_x, np.float32),
                       np.asarray(val_y, np.int32))
    val_data = _replicate(mesh, hbm.padded_eval_batches(val, batch_size))
    n_counted = (len(train_y) // batch_size) * batch_size

    book = SweepBook(out_dir, ckpt_name="mlp_global_best",
                     store_name="mlp_results.json", mode="max",
                     hp_keys=("lr",))
    pending: List[Tuple[int, float]] = []  # (cfg_idx, lr)
    for ci, lr in enumerate(lrs_py):
        key = GridResultStore.key(lr=lr)
        if book.cached(key):
            if log:
                log(f"skip cached lr={lr}")
        else:
            pending.append((ci, lr))

    wd = jnp.full((n_dev,), mlp_cfg.weight_decay, jnp.float32)
    wd = _shard_cfg_axis(mesh, wd, cfg_axis)

    # per-lr test evaluation resources, hoisted out of the round loop (a
    # per-round jit of a fresh closure would recompile every round)
    test_batches = None
    if test_x is not None:
        tds = ArrayDataset(np.asarray(test_x, np.float32),
                           np.asarray(test_y, np.int32))
        test_batches = tuple(jax.device_put(a) for a in
                             hbm.padded_eval_batches(tds, batch_size))
        jeval_single = jax.jit(hbm.mlp_eval_body(model_cfg))

    for chunk, mask in _chunk_pad(pending, n_dev):
        cfg_idx = np.array([c[0] for c in chunk])
        lrs = jnp.asarray([c[1] for c in chunk], jnp.float32)
        base_keys = jnp.stack([jax.random.PRNGKey(seed + int(ci))
                               for ci in cfg_idx])
        split2 = jax.vmap(lambda k: tuple(jax.random.split(k)))
        init_keys, loop_keys = split2(base_keys)
        vparams, vbn = jax.vmap(
            lambda k: mlp_init(k, model_cfg, input_dim=input_dim))(init_keys)
        vopt = adam_init(vparams)
        vopt["step"] = jnp.zeros((n_dev,), jnp.int32)
        vparams = _shard_cfg_axis(mesh, vparams, cfg_axis)
        vbn = _shard_cfg_axis(mesh, vbn, cfg_axis)
        vopt = _shard_cfg_axis(mesh, vopt, cfg_axis)
        lrs = _shard_cfg_axis(mesh, lrs, cfg_axis)
        loop_keys = _shard_cfg_axis(mesh, np.asarray(loop_keys), cfg_axis)

        history = {k: [[] for _ in range(n_dev)]
                   for k in ("train_loss", "train_acc", "val_loss", "val_acc")}
        best_acc = np.full((n_dev,), -1.0)
        best_loss = np.full((n_dev,), np.inf)
        best_epoch = np.full((n_dev,), -1, np.int64)
        snapshots: Dict[int, Any] = {}

        in_flight = None  # (epoch, device tsum, device vsum, device snapshot)

        def process(p_epoch, tsum, vsum, snap):
            tsum, vsum = _to_host((tsum, vsum))
            nv = vsum["n"]
            val_acc = vsum["acc"] / nv
            val_loss = vsum["loss"] / nv
            for i in range(n_dev):
                history["train_loss"][i].append(float(tsum["loss"][i])
                                                / n_counted)
                history["train_acc"][i].append(float(tsum["acc"][i])
                                               / n_counted)
                history["val_loss"][i].append(float(val_loss[i]))
                history["val_acc"][i].append(float(val_acc[i]))
            sp, sb = snap
            for i in np.flatnonzero(mask & (val_acc > best_acc)):
                best_acc[i] = val_acc[i]
                best_loss[i] = val_loss[i]
                best_epoch[i] = p_epoch
                snapshots[i] = (_slice_tree(sp, i), _slice_tree(sb, i))
            if log:
                log(f"round epoch {p_epoch:3d}: "
                    f"best_val_acc={best_acc.max():.4f}")

        # pipelined readback (fixed epoch count: the 1-epoch lag has no
        # semantics here at all)
        for epoch in range(mlp_cfg.epochs):
            order = jnp.asarray(np.stack(
                [hbm.epoch_order(len(train_y), batch_size, seed + int(ci),
                                 epoch) for ci in cfg_idx]))
            order = _shard_cfg_axis(mesh, order, cfg_axis)
            ekeys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                loop_keys, epoch)
            vparams, vbn, vopt, tsum = engine.train_round_epoch(
                vparams, vbn, vopt, (xs, ys), order, ekeys, (lrs, wd))
            vsum = engine.eval_round(vparams, vbn, val_data, ())
            snap = _device_copy((vparams, vbn))
            if in_flight is not None:
                process(*in_flight)
            in_flight = (epoch, tsum, vsum, snap)
        if in_flight is not None:
            process(*in_flight)

        for i in np.flatnonzero(mask):
            ci, lr = chunk[i]
            key = GridResultStore.key(lr=lr)
            summary = {"lr": lr, "best_val_acc": float(best_acc[i]),
                       "best_val_loss": float(best_loss[i]),
                       "best_epoch": int(best_epoch[i])}
            if test_batches is not None and i in snapshots:
                sp, sb = snapshots[i]
                tm = _to_host(jeval_single(sp, sb, *test_batches))
                summary["test_acc"] = float(tm["acc"] / tm["n"])
            if i in snapshots:  # checkpoint strictly before the store flush
                sp, sb = snapshots[i]
                sp, sb = _offerable((sp, sb))
                book.offer(
                    TrainResult(sp, sb, float(best_loss[i]),
                                float(best_acc[i]), int(best_epoch[i]),
                                mlp_cfg.epochs,
                                {k: history[k][i] for k in history}),
                    {"lr": lr})
            else:
                # no best-epoch snapshot (val_acc never exceeded the -1.0
                # init, e.g. all-NaN logits): only end-of-run weights
                # exist, and only the all-diverged fallback may want them —
                # mirror the AE engine so mode=max degrades like min
                # instead of resolve() raising with nothing to return
                cand = float(np.nan_to_num(-best_acc[i], nan=np.inf))
                if book.fallback is None or cand < book.fallback_key:
                    fsp, fsb = _offerable((_slice_tree(vparams, i),
                                           _slice_tree(vbn, i)))
                    book.offer_fallback(
                        TrainResult(fsp, fsb,
                                    float(best_loss[i]), float(best_acc[i]),
                                    int(best_epoch[i]), mlp_cfg.epochs,
                                    {k: history[k][i] for k in history}),
                        {"lr": lr})
            book.record(key, summary)
            if save_curves and out_dir:
                from satae.eval import plots
                plots.lr_curves(
                    {k: history[k][i] for k in history},
                    Path(out_dir) / "curves" / f"mlp_lr{lr:g}.png",
                    title=f"MLP lr={lr:g}")
            if log:
                log(f"lr={lr}: val_acc={best_acc[i]:.4f}")

    def template():
        return mlp_init(jax.random.PRNGKey(0), model_cfg,
                        input_dim=input_dim)

    def to_host(res):
        res.params, res.bn_state = _to_host((res.params, res.bn_state))
        return res

    best, best_hp = book.resolve(template, "sharded MLP grid search",
                                 finalize=to_host)
    return SweepResult(best, best_hp, book.results)
