"""Jit-compiled train/eval steps — the fused TPU version of SURVEY.md §3.2.

Each AE train step fuses, in one XLA executable with donated buffers:
uint8 HBM batch -> on-device augmentation -> supervised-AE forward ->
joint alpha*MSE+CE loss -> reverse-mode grads -> Adam update.
The reference runs this as dozens of separate CUDA kernel launches plus a
host `.item()` sync every step (Report.md:635-657); here it is one program
and metrics stay on device until the host asks.

``alpha``, ``lr`` and ``weight_decay`` are traced scalars, so all 45 AE grid
configs and 11 MLP lrs share one compilation each (SURVEY.md §7 hard parts).
Two batch shapes at most get compiled (full batch + epoch remainder).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from satae.config import DataConfig, ModelConfig
from satae.data.augment import augment_train_batch, normalize
from satae.models.mlp import mlp_apply
from satae.models.supervised_ae import supervised_ae_apply
from satae.train.losses import accuracy, cross_entropy, joint_ae_loss
from satae.train.optim import adam_update

Metrics = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# Supervised AE
# ---------------------------------------------------------------------------

def ae_train_step_body(model_cfg: ModelConfig, data_cfg: DataConfig,
                       compute_dtype=jnp.float32):
    """The un-jitted step body — shared by the single-device step below and
    the sharded DP step (satae.parallel.dp), so there is exactly one source
    of truth for the train-step semantics."""

    def step(params, bn_state, opt_state, imgs_u8, labels, key, alpha, lr
             ) -> Tuple[Any, Any, Any, Metrics]:
        imgs = augment_train_batch(
            key, imgs_u8, crop_padding=data_cfg.crop_padding,
            noise_std=data_cfg.noise_std, dtype=compute_dtype,
            rng_impl=data_cfg.aug_rng_impl)

        def loss_fn(p):
            (x_hat, logits, _z), new_bn = supervised_ae_apply(
                p, bn_state, imgs, train=True, cfg=model_cfg)
            total, mse, ce = joint_ae_loss(x_hat, logits, imgs, labels, alpha)
            return total, (new_bn, mse, ce, logits)

        (loss, (new_bn, mse, ce, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state = adam_update(params, grads, opt_state, lr)
        metrics = {"loss": loss, "mse": mse, "ce": ce,
                   "acc": accuracy(logits, labels)}
        return params, new_bn, opt_state, metrics

    return step


def ae_eval_step_body(model_cfg: ModelConfig, compute_dtype=jnp.float32):
    def step(params, bn_state, imgs_u8, labels, alpha) -> Metrics:
        imgs = normalize(imgs_u8, compute_dtype)
        (x_hat, logits, _z), _ = supervised_ae_apply(
            params, bn_state, imgs, train=False, cfg=model_cfg)
        total, mse, ce = joint_ae_loss(x_hat, logits, imgs, labels, alpha)
        return {"loss": total, "mse": mse, "ce": ce,
                "acc": accuracy(logits, labels)}

    return step


def make_ae_train_step(model_cfg: ModelConfig, data_cfg: DataConfig,
                       compute_dtype=jnp.float32, donate: bool = True):
    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(ae_train_step_body(model_cfg, data_cfg, compute_dtype),
                   donate_argnums=donate_argnums)


def make_ae_eval_step(model_cfg: ModelConfig, compute_dtype=jnp.float32):
    return jax.jit(ae_eval_step_body(model_cfg, compute_dtype))


# ---------------------------------------------------------------------------
# Latent MLP
# ---------------------------------------------------------------------------

def make_mlp_train_step(model_cfg: ModelConfig, donate: bool = True):
    def step(params, bn_state, opt_state, x, labels, key, lr, weight_decay
             ) -> Tuple[Any, Any, Any, Metrics]:
        def loss_fn(p):
            logits, new_bn = mlp_apply(p, bn_state, x, train=True,
                                       cfg=model_cfg, dropout_key=key)
            return cross_entropy(logits, labels), (new_bn, logits)

        (loss, (new_bn, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state = adam_update(params, grads, opt_state, lr,
                                        weight_decay=weight_decay)
        return params, new_bn, opt_state, {"loss": loss,
                                           "acc": accuracy(logits, labels)}

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_mlp_eval_step(model_cfg: ModelConfig):
    def step(params, bn_state, x, labels) -> Metrics:
        logits, _ = mlp_apply(params, bn_state, x, train=False, cfg=model_cfg)
        return {"loss": cross_entropy(logits, labels),
                "acc": accuracy(logits, labels)}

    return jax.jit(step)


def make_mlp_predict(model_cfg: ModelConfig):
    @jax.jit
    def predict(params, bn_state, x) -> jax.Array:
        logits, _ = mlp_apply(params, bn_state, x, train=False, cfg=model_cfg)
        return jnp.argmax(logits, axis=-1)

    return predict


def make_mlp_proba(model_cfg: ModelConfig):
    """Eval-mode class probabilities (softmax over the MLP logits) — the
    serving-side confidence surface (no reference counterpart; the notebook
    only argmaxes, Report.md:3179-3184)."""
    @jax.jit
    def proba(params, bn_state, x) -> jax.Array:
        logits, _ = mlp_apply(params, bn_state, x, train=False, cfg=model_cfg)
        return jax.nn.softmax(logits, axis=-1)

    return proba
