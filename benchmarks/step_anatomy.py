"""Decompose the fused AE train step: where do the milliseconds go?

Round-4 context: the corrected roofline accounting (satae/utils/roofline.py)
puts the measured 6.9 ms bf16+rbg step at only ~37% of the v5e HBM bound and
~19% of executed-FLOPs peak — neither resource is near its roofline, so the
step is NOT purely bandwidth-bound as the r1-r3 analysis assumed. This probe
measures, in ONE session (chained-call methodology, see bench.py):

1. the single-dispatch step (bench.py's shape) vs a lax.scan of K steps in
   one program (the shape the deployed epoch loops actually run, fast_loop/
   hbm.py) — the delta is per-call dispatch/latency overhead, which is real
   for serving one step but absent at training time;
2. ablations INSIDE the scan form (so dispatch overhead cannot pollute the
   deltas): forward-only, forward+backward (no Adam), full step, eval-mode
   BN (no batch moments), no-augment, encoder+head only, decoder path only.

Writes benchmarks/step_anatomy.json and prints a table to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 1024
K = 20          # steps per scanned program
ITERS = 8       # timed dispatches per variant
WARMUP = 2


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from satae.config import DataConfig, ModelConfig
    from satae.data.augment import augment_train_batch, normalize
    from satae.models.supervised_ae import (supervised_ae_apply,
                                            supervised_ae_init)
    from satae.train.losses import joint_ae_loss
    from satae.train.optim import adam_init, adam_update

    model_cfg = ModelConfig()
    data_cfg = DataConfig(aug_rng_impl="rbg")
    dtype = jnp.bfloat16
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 255, (BATCH, 64, 64, 3),
                                       dtype=np.uint8))
    labels = jax.device_put(rng.integers(0, 10, BATCH).astype(np.int32))
    alpha, lr = jnp.asarray(35.0), jnp.asarray(5e-3)

    def fwd(params, bn_state, x, train=True):
        return supervised_ae_apply(params, bn_state, x, train=train,
                                   cfg=model_cfg)

    def make_body(mode):
        """One train-step body; `mode` selects the ablation."""
        aug = mode != "noaug"
        train_bn = mode != "evalbn"

        def body(params, bn_state, opt_state, key):
            if aug:
                x = augment_train_batch(
                    key, imgs, crop_padding=data_cfg.crop_padding,
                    noise_std=data_cfg.noise_std, dtype=dtype,
                    rng_impl=data_cfg.aug_rng_impl)
            else:
                x = normalize(imgs, dtype)

            if mode == "fwd":
                (x_hat, logits, _z), new_bn = fwd(params, bn_state, x)
                total, _, _ = joint_ae_loss(x_hat, logits, x, labels, alpha)
                return params, new_bn, opt_state, total

            if mode == "encoder":
                def loss_fn(p):
                    from satae.models.encoder import encoder_apply
                    from satae.nn import layers as L
                    z, enc_s = encoder_apply(p["encoder"],
                                             bn_state["encoder"], x,
                                             train=True, cfg=model_cfg)
                    h = L.relu(L.linear(p["head"]["fc1"], z))
                    logits = L.linear(p["head"]["fc2"], h)
                    from satae.train.losses import cross_entropy
                    return cross_entropy(logits, labels), enc_s
                (loss, enc_s), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                params, opt_state = adam_update(params, grads, opt_state, lr)
                return params, {**bn_state, "encoder": enc_s}, opt_state, loss

            if mode == "decoder":
                z0 = jnp.zeros((BATCH, model_cfg.latent_dim), dtype)

                def loss_fn(p):
                    from satae.models.decoder import decoder_apply
                    x_hat, dec_s = decoder_apply(p["decoder"],
                                                 bn_state["decoder"],
                                                 z0 + x.mean() * 0, train=True,
                                                 cfg=model_cfg, image_size=64)
                    return jnp.mean(jnp.square(
                        x_hat.astype(jnp.float32)
                        - x.astype(jnp.float32))), dec_s
                (loss, dec_s), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                params, opt_state = adam_update(params, grads, opt_state, lr)
                return params, {**bn_state, "decoder": dec_s}, opt_state, loss

            def loss_fn(p):
                (x_hat, logits, _z), new_bn = fwd(p, bn_state, x,
                                                  train=train_bn)
                total, mse, ce = joint_ae_loss(x_hat, logits, x, labels,
                                               alpha)
                return total, new_bn
            (loss, new_bn), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            if mode == "nograd_update":
                # keep the backward alive without the Adam update: fold a
                # grad reduction into the returned loss (otherwise XLA
                # dead-code-eliminates the entire backward pass)
                gsum = sum(jnp.sum(g).astype(jnp.float32)
                           for g in jax.tree_util.tree_leaves(grads))
                # 1e-30, not 0.0: XLA's algebraic simplifier may fold 0*x
                return params, new_bn, opt_state, loss + 1e-30 * gsum
            params, opt_state = adam_update(params, grads, opt_state, lr)
            return params, new_bn, opt_state, loss

        return body

    def timed_scan(mode):
        body = make_body(mode)

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def scan_k(params, bn_state, opt_state, key):
            keys = jax.random.split(key, K)

            # EVERY step's loss accumulates through the carry: returning only
            # losses[-1] lets XLA dead-code-eliminate the loss (and, for the
            # no-param-update ablations, the whole backward) of iterations
            # 0..K-2 — the first run of this probe measured fwd+bwd == fwd
            # because of exactly that.
            def step(carry, k):
                p, s, o, acc = carry
                p, s, o, loss = body(p, s, o, k)
                return (p, s, o, acc + loss.astype(jnp.float32)), None

            (params, bn_state, opt_state, acc), _ = jax.lax.scan(
                step, (params, bn_state, opt_state, jnp.float32(0)), keys)
            return params, bn_state, opt_state, acc

        params, bn_state = supervised_ae_init(jax.random.PRNGKey(0),
                                              model_cfg)
        opt_state = adam_init(params)
        for i in range(WARMUP):
            params, bn_state, opt_state, loss = scan_k(
                params, bn_state, opt_state, jax.random.PRNGKey(i))
        float(loss)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(ITERS):
                params, bn_state, opt_state, loss = scan_k(
                    params, bn_state, opt_state, jax.random.PRNGKey(i))
            float(loss)
            best = min(best, (time.perf_counter() - t0) / (ITERS * K))
        return best * 1e3  # ms per step

    def timed_single():
        from satae.train.steps import make_ae_train_step
        step = make_ae_train_step(model_cfg, data_cfg, dtype, donate=True)
        params, bn_state = supervised_ae_init(jax.random.PRNGKey(0),
                                              model_cfg)
        opt_state = adam_init(params)
        for i in range(WARMUP):
            params, bn_state, opt_state, m = step(
                params, bn_state, opt_state, imgs, labels,
                jax.random.PRNGKey(i), alpha, lr)
        float(m["loss"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(ITERS * 2):
                params, bn_state, opt_state, m = step(
                    params, bn_state, opt_state, imgs, labels,
                    jax.random.PRNGKey(i), alpha, lr)
            float(m["loss"])
            best = min(best, (time.perf_counter() - t0) / (ITERS * 2))
        return best * 1e3

    results = {"batch": BATCH, "k": K, "dtype": "bf16", "rng": "rbg"}
    results["single_dispatch_ms"] = round(timed_single(), 3)
    log(f"single-dispatch step: {results['single_dispatch_ms']} ms")
    for mode, label in (("full", "scanned full step"),
                        ("fwd", "scanned forward-only"),
                        ("nograd_update", "scanned fwd+bwd (no Adam)"),
                        ("evalbn", "scanned full, eval-mode BN"),
                        ("noaug", "scanned full, no augment"),
                        ("encoder", "scanned encoder+head step"),
                        ("decoder", "scanned decoder-only step")):
        ms = timed_scan(mode)
        results[f"scan_{mode}_ms"] = round(ms, 3)
        log(f"{label}: {ms:.3f} ms/step "
            f"({BATCH / ms * 1e3:,.0f} img/s)")

    out = Path(__file__).parent / "step_anatomy.json"
    out.write_text(json.dumps(results, indent=2))
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
