"""Probe: does rematerialization or low-precision optimizer state move the
HBM-bandwidth-bound train step (docs/PERF.md roofline)?

Hypotheses measured here (chained-call timing, host readback closes each
window — see CLAUDE.md measurement gotchas):

1. `jax.checkpoint` over the forward (whole model / encoder-only / policy
   variants) lets XLA skip storing large early-layer activations for the
   backward pass, trading recompute FLOPs (MXU has headroom) for HBM
   traffic (the binding constraint at batch 1024).
2. bf16 Adam moments (mu, nu stored bf16, arithmetic f32) halve the
   per-step optimizer-state traffic that dominates the ~120 ms/epoch floor
   at the reference's batch 64 (dtype-insensitive floor, docs/PERF.md).

Usage: python benchmarks/remat_probe.py [--iters N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from satae.config import DataConfig, ModelConfig
from satae.data.augment import augment_train_batch
from satae.models.supervised_ae import supervised_ae_apply, supervised_ae_init
from satae.train import hbm
from satae.train.losses import accuracy, joint_ae_loss
from satae.train.optim import adam_init, adam_update

TRAIN_BATCH = 1024


def make_step(model_cfg, data_cfg, compute_dtype, remat: str,
              opt_dtype=None):
    """Variant train step. remat in {"none","full","encoder","dots"}."""

    def fwd(p, bn_state, imgs):
        (x_hat, logits, _z), new_bn = supervised_ae_apply(
            p, bn_state, imgs, train=True, cfg=model_cfg)
        return x_hat, logits, new_bn

    if remat == "full":
        fwd = jax.checkpoint(fwd)
    elif remat == "dots":
        fwd = jax.checkpoint(
            fwd, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    def step(params, bn_state, opt_state, imgs_u8, labels, key, alpha, lr):
        imgs = augment_train_batch(
            key, imgs_u8, crop_padding=data_cfg.crop_padding,
            noise_std=data_cfg.noise_std, dtype=compute_dtype)

        def loss_fn(p):
            x_hat, logits, new_bn = fwd(p, bn_state, imgs)
            total, mse, ce = joint_ae_loss(x_hat, logits, imgs, labels, alpha)
            return total, (new_bn, mse, ce, logits)

        (loss, (new_bn, mse, ce, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state = adam_update(params, grads, opt_state, lr)
        metrics = {"loss": loss, "mse": mse, "ce": ce,
                   "acc": accuracy(logits, labels)}
        return params, new_bn, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1, 2))


def time_step(step, model_cfg, data_cfg, iters: int) -> float:
    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 255, (TRAIN_BATCH, 64, 64, 3),
                                       dtype=np.uint8))
    labels = jax.device_put(rng.integers(0, 10, TRAIN_BATCH).astype(np.int32))
    alpha, lr = jnp.asarray(35.0), jnp.asarray(5e-3)
    params, bn_state = supervised_ae_init(jax.random.PRNGKey(0), model_cfg)
    opt_state = adam_init(params)
    for i in range(2):
        params, bn_state, opt_state, m = step(
            params, bn_state, opt_state, imgs, labels, jax.random.PRNGKey(i),
            alpha, lr)
    float(m["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            params, bn_state, opt_state, m = step(
                params, bn_state, opt_state, imgs, labels,
                jax.random.PRNGKey(i), alpha, lr)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms/step


# ---------------------------------------------------------------------------
# bf16 optimizer moments: epoch-scale probe at the reference's batch 64
# ---------------------------------------------------------------------------

def adam_update_lowp(params, grads, state, lr, weight_decay=0.0,
                     b1=0.9, b2=0.999, eps=1e-8):
    """Adam with moments STORED in bf16, arithmetic in f32."""
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def upd(p, g, mu, nu):
        g = g.astype(jnp.float32) + weight_decay * p
        mu32 = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g
        nu32 = b2 * nu.astype(jnp.float32) + (1.0 - b2) * (g * g)
        mhat = mu32 / bc1
        vhat = nu32 / bc2
        newp = p - lr * mhat / (jnp.sqrt(vhat) + eps)
        return newp, mu32.astype(jnp.bfloat16), nu32.astype(jnp.bfloat16)

    import jax.tree_util as jtu
    flat_p, treedef = jtu.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_mu = treedef.flatten_up_to(state["mu"])
    flat_nu = treedef.flatten_up_to(state["nu"])
    out = [upd(p, g, m, n)
           for p, g, m, n in zip(flat_p, flat_g, flat_mu, flat_nu)]
    return (treedef.unflatten([o[0] for o in out]),
            {"mu": treedef.unflatten([o[1] for o in out]),
             "nu": treedef.unflatten([o[2] for o in out]), "step": step})


def time_epoch(model_cfg, data_cfg, lowp_opt: bool, iters: int = 6) -> float:
    """One reference-scale scan epoch (14k imgs, batch 64), ms."""
    # the scan body reads hbm.adam_update at TRACE time (first call), so the
    # patch must stay in place through warmup; restored in the epilogue below
    orig = hbm.adam_update
    if lowp_opt:
        hbm.adam_update = adam_update_lowp
    try:
        return _time_epoch_inner(model_cfg, data_cfg, lowp_opt, iters)
    finally:
        # restore even on a relay/compile failure — leaving the bf16-moment
        # Adam installed would silently corrupt later training in-process
        hbm.adam_update = orig


def _time_epoch_inner(model_cfg, data_cfg, lowp_opt: bool, iters: int) -> float:
    epoch_fn = jax.jit(hbm.ae_train_epoch_body(model_cfg, data_cfg),
                       donate_argnums=(0, 1, 2))

    n = 14000
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(0, 255, (n, 64, 64, 3),
                                         dtype=np.uint8))
    labels = jax.device_put(rng.integers(0, 10, n).astype(np.int32))
    params, bn_state = supervised_ae_init(jax.random.PRNGKey(0), model_cfg)
    opt_state = adam_init(params)
    if lowp_opt:
        opt_state = {"mu": jax.tree_util.tree_map(
                         lambda x: x.astype(jnp.bfloat16), opt_state["mu"]),
                     "nu": jax.tree_util.tree_map(
                         lambda x: x.astype(jnp.bfloat16), opt_state["nu"]),
                     "step": opt_state["step"]}
    alpha, lr = jnp.asarray(35.0), jnp.asarray(5e-3)
    order = jnp.asarray(hbm.epoch_order(n, 64, 0, 0))
    for e in range(2):
        params, bn_state, opt_state, msum = epoch_fn(
            params, bn_state, opt_state, images, labels, order,
            jax.random.PRNGKey(e), alpha, lr)
    float(msum["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for e in range(iters):
            params, bn_state, opt_state, msum = epoch_fn(
                params, bn_state, opt_state, images, labels, order,
                jax.random.PRNGKey(e), alpha, lr)
        float(msum["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-epoch", action="store_true")
    args = ap.parse_args()

    model_cfg, data_cfg = ModelConfig(), DataConfig()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    results = {}
    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        for remat in ("none", "full", "dots"):
            step = make_step(model_cfg, data_cfg, dt, remat)
            ms = time_step(step, model_cfg, data_cfg, args.iters)
            key = f"step_b1024_{dt_name}_remat_{remat}"
            results[key] = round(ms, 3)
            print(f"{key}: {ms:.3f} ms/step "
                  f"({TRAIN_BATCH / ms * 1e3:,.0f} img/s)")

    if not args.skip_epoch:
        for lowp in (False, True):
            ms = time_epoch(model_cfg, data_cfg, lowp)
            key = f"epoch14k_b64_f32_{'bf16opt' if lowp else 'f32opt'}"
            results[key] = round(ms, 2)
            print(f"{key}: {ms:.2f} ms/epoch")

    with open("benchmarks/remat_probe.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
