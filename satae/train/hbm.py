"""HBM-resident dataset + whole-epoch scan programs.

The entire EuroSAT working set (20k x 64x64x3 uint8 = 236 MB) fits in HBM
with room to spare, so the TPU-native input pipeline is: upload once, and run
each training epoch as ONE jit'd ``lax.scan`` over batch indices — per-step
batch gather, augmentation, forward/backward, and Adam all inside a single
device program. Host dispatch per epoch: 1 call (vs the reference's
per-batch Python loop with a `.item()` sync every step, Report.md:635-657).

Epoch accounting:
  * train: full batches only (remainder dropped per epoch; the shuffled
    remainder differs every epoch so all samples participate over time) —
    metric sums are per-sample weighted like the reference's accounting.
  * eval: the split is zero-padded to a batch multiple with zero-weight rows;
    the scan returns exact weighted sums, so losses/accuracies are identical
    to unpadded evaluation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from satae.config import DataConfig, ModelConfig
from satae.data.augment import augment_train_batch, normalize
from satae.data.pipeline import ArrayDataset
from satae.models.supervised_ae import supervised_ae_apply
from satae.train.losses import accuracy, joint_ae_loss
from satae.train.optim import adam_update


def epoch_order(n: int, batch_size: int, seed: int, epoch: int) -> np.ndarray:
    """Shuffled full-batch index matrix (n_steps, batch_size) for one epoch.

    ``seed + epoch`` makes shuffle streams overlap diagonally across grid
    configs (config ci is seeded ``base + ci``, so ci/epoch e shares its
    permutation with ci+1/epoch e-1). DELIBERATE: shared sample orders act
    as common random numbers for the alpha/lr comparison (paired-comparison
    variance reduction, not a bias — every config still sees each sample
    once per epoch, and augmentation keys are config-distinct via fold_in),
    and golden trajectories plus cross-engine seeding parity depend on this
    exact stream. Don't "fix" it to hash-based seeding without regenerating
    both."""
    perm = np.random.default_rng(seed + epoch).permutation(n)
    n_steps = n // batch_size
    return perm[: n_steps * batch_size].reshape(n_steps, batch_size)


def padded_eval_batches(ds: ArrayDataset, batch_size: int
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(images (nb,B,H,W,C), labels (nb,B), weights (nb,B)) with zero-weight
    padding rows so every batch is full."""
    n = len(ds)
    nb = -(-n // batch_size)
    pad = nb * batch_size - n
    images = np.concatenate(
        [ds.images, np.zeros((pad,) + ds.images.shape[1:], ds.images.dtype)])
    labels = np.concatenate([ds.labels, np.zeros((pad,), ds.labels.dtype)])
    weights = np.concatenate([np.ones((n,), np.float32),
                              np.zeros((pad,), np.float32)])
    shape = (nb, batch_size)
    return (images.reshape(shape + ds.images.shape[1:]),
            labels.reshape(shape), weights.reshape(shape))


# ---------------------------------------------------------------------------
# Supervised AE: one-epoch train scan and eval scan (single-config bodies;
# vmap_sweep vmaps them over a config axis).
# ---------------------------------------------------------------------------

def ae_train_epoch_body(model_cfg: ModelConfig, data_cfg: DataConfig,
                        compute_dtype=jnp.float32, mesh=None,
                        mesh_axis: str = "data"):
    """Returns epoch_fn(params, bn, opt, images, labels, order, key, alpha,
    lr) -> (params, bn, opt, metric_sums) where metric_sums are per-sample
    weighted sums over the epoch (divide by order.size on the host).

    With ``mesh``, the per-step batch gather is constrained to batch-axis
    sharding, so the whole scan epoch runs data-parallel: the dataset lives
    sharded in HBM, each step's gathered batch is resharded over ICI
    (~1 MB/step), and XLA emits the gradient/BN psums — one device program
    per epoch per mesh, no per-step dispatch.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        batch_sh = NamedSharding(mesh, PartitionSpec(mesh_axis))

    def step(carry, batch_idx, images, labels, key, alpha, lr):
        params, bn_state, opt_state, msum = carry
        imgs_u8 = jnp.take(images, batch_idx, axis=0)
        labs = jnp.take(labels, batch_idx, axis=0)
        if mesh is not None:
            imgs_u8 = lax.with_sharding_constraint(imgs_u8, batch_sh)
            labs = lax.with_sharding_constraint(labs, batch_sh)
        step_key = jax.random.fold_in(key, batch_idx[0])
        imgs = augment_train_batch(
            step_key, imgs_u8, crop_padding=data_cfg.crop_padding,
            noise_std=data_cfg.noise_std, dtype=compute_dtype,
            rng_impl=data_cfg.aug_rng_impl)

        def loss_fn(p):
            (x_hat, logits, _z), new_bn = supervised_ae_apply(
                p, bn_state, imgs, train=True, cfg=model_cfg)
            total, mse, ce = joint_ae_loss(x_hat, logits, imgs, labs, alpha)
            return total, (new_bn, mse, ce, logits)

        (loss, (new_bn, mse, ce, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state = adam_update(params, grads, opt_state, lr)
        b = imgs.shape[0]
        msum = {"loss": msum["loss"] + loss * b, "mse": msum["mse"] + mse * b,
                "ce": msum["ce"] + ce * b,
                "acc": msum["acc"] + accuracy(logits, labs) * b}
        return (params, new_bn, opt_state, msum), None

    def epoch_fn(params, bn_state, opt_state, images, labels, order, key,
                 alpha, lr):
        zeros = jnp.zeros((), jnp.float32)
        msum = {"loss": zeros, "mse": zeros, "ce": zeros, "acc": zeros}
        (params, bn_state, opt_state, msum), _ = lax.scan(
            lambda c, idx: step(c, idx, images, labels, key, alpha, lr),
            (params, bn_state, opt_state, msum), order)
        return params, bn_state, opt_state, msum

    return epoch_fn


# ---------------------------------------------------------------------------
# Latent MLP: scan-epoch train and weighted-eval bodies (shared by
# fast_loop.MLPScanEngine and vmap_sweep.mlp_vmap_grid_search).
# ---------------------------------------------------------------------------

def mlp_train_epoch_body(model_cfg: ModelConfig):
    """Returns epoch_fn(params, bn, opt, xs, ys, order, key, lr,
    weight_decay) -> (params, bn, opt, metric_sums). lr and weight_decay are
    traced (one compilation serves every grid point)."""
    from satae.models.mlp import mlp_apply
    from satae.train.losses import cross_entropy

    def epoch_fn(params, bn_state, opt_state, xs, ys, order, key, lr,
                 weight_decay):
        def step(carry, batch_idx):
            params, bn_state, opt_state, msum = carry
            xb = jnp.take(xs, batch_idx, axis=0)
            yb = jnp.take(ys, batch_idx, axis=0)
            dkey = jax.random.fold_in(key, batch_idx[0])

            def loss_fn(p):
                logits, new_bn = mlp_apply(p, bn_state, xb, train=True,
                                           cfg=model_cfg, dropout_key=dkey)
                return cross_entropy(logits, yb), (new_bn, logits)

            (loss, (new_bn, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            params, opt_state = adam_update(params, grads, opt_state, lr,
                                            weight_decay=weight_decay)
            b = xb.shape[0]
            correct = jnp.sum(jnp.argmax(logits, -1) == yb)
            msum = {"loss": msum["loss"] + loss * b,
                    "acc": msum["acc"] + correct.astype(jnp.float32)}
            return (params, new_bn, opt_state, msum), None

        zeros = jnp.zeros((), jnp.float32)
        (params, bn_state, opt_state, msum), _ = lax.scan(
            step, (params, bn_state, opt_state,
                   {"loss": zeros, "acc": zeros}), order)
        return params, bn_state, opt_state, msum

    return epoch_fn


def mlp_eval_body(model_cfg: ModelConfig):
    """Returns eval_fn(params, bn, xs (nb,B,D), ys (nb,B), wts (nb,B)) ->
    weighted sums {loss, acc, n} (padding rows have weight 0)."""
    from satae.models.mlp import mlp_apply

    def eval_fn(params, bn_state, xs, ys, wts):
        def body(carry, batch):
            xb, yb, wb = batch
            logits, _ = mlp_apply(params, bn_state, xb, train=False,
                                  cfg=model_cfg)
            logits32 = logits.astype(jnp.float32)
            logz = jax.nn.logsumexp(logits32, axis=-1)
            tl = jnp.take_along_axis(logits32, yb[:, None], axis=-1)[:, 0]
            return {"loss": carry["loss"] + jnp.sum((logz - tl) * wb),
                    "acc": carry["acc"] +
                    jnp.sum((jnp.argmax(logits, -1) == yb) * wb),
                    "n": carry["n"] + jnp.sum(wb)}, None

        zeros = jnp.zeros((), jnp.float32)
        out, _ = lax.scan(body, {"loss": zeros, "acc": zeros, "n": zeros},
                          (xs, ys, wts))
        return out

    return eval_fn


def ae_eval_body(model_cfg: ModelConfig, compute_dtype=jnp.float32):
    """Returns eval_fn(params, bn, images (nb,B,...), labels (nb,B),
    weights (nb,B), alpha) -> weighted metric sums (divide by weights.sum())."""

    def batch_metrics(carry, batch, params, bn_state, alpha):
        imgs_u8, labs, wts = batch
        imgs = normalize(imgs_u8, compute_dtype)
        (x_hat, logits, _z), _ = supervised_ae_apply(
            params, bn_state, imgs, train=False, cfg=model_cfg)
        w = wts[:, None, None, None]
        nw = jnp.sum(wts)
        # weighted MSE/CE that ignore padding rows; f32 accumulation so the
        # selection metric is dtype-independent (bf16 logits would perturb
        # val-loss-driven early stopping / grid selection)
        se = jnp.sum(jnp.square((x_hat - imgs).astype(jnp.float32)) * w) \
            / x_hat[0].size
        logits32 = logits.astype(jnp.float32)
        logz = jax.nn.logsumexp(logits32, axis=-1)
        tl = jnp.take_along_axis(logits32, labs[:, None], axis=-1)[:, 0]
        ce = jnp.sum((logz - tl) * wts)
        correct = jnp.sum((jnp.argmax(logits, -1) == labs) * wts)
        msum = carry
        msum = {"loss": msum["loss"] + alpha * se + ce,
                "mse": msum["mse"] + se, "ce": msum["ce"] + ce,
                "acc": msum["acc"] + correct, "n": msum["n"] + nw}
        return msum, None

    def eval_fn(params, bn_state, images, labels, weights, alpha):
        zeros = jnp.zeros((), jnp.float32)
        msum = {"loss": zeros, "mse": zeros, "ce": zeros, "acc": zeros,
                "n": zeros}
        msum, _ = lax.scan(
            lambda c, b: batch_metrics(c, b, params, bn_state, alpha),
            msum, (images, labels, weights))
        return msum

    return eval_fn
