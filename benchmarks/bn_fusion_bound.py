"""Upper-bound measurement for the hypothesized fused conv+BN-stats kernel.

docs/PERF.md estimated a <=25% train-step win from fusing BatchNorm's batch
-moment reduction into the producing convolution (saving one HBM read of each
conv output in the forward pass). Before writing that kernel, measure its
CEILING directly: time the real train step against a variant whose train-mode
BN normalizes with the running statistics instead of batch statistics —
i.e. ALL batch-moment reductions (forward stats reads + their backward
contributions) removed, which strictly upper-bounds what any stats-fusion
kernel could recover (a real kernel only removes the forward stats read).

Methodology: dependency-chained calls + host readback (CLAUDE.md — the relay
lies about block_until_ready), warmup excluded.

Usage: python benchmarks/bn_fusion_bound.py [--batch 1024] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from satae.config import DataConfig, ModelConfig
    from satae.data.augment import augment_train_batch
    from satae.models.supervised_ae import (supervised_ae_apply,
                                            supervised_ae_init)
    from satae.train.losses import joint_ae_loss
    from satae.train.optim import adam_init, adam_update

    model_cfg = ModelConfig()
    data_cfg = DataConfig()

    def make_step(train_flag: bool, dtype):
        """train_flag=True: real step (batch stats). train_flag=False inside
        the loss: BN uses running stats -> all batch-moment reductions gone;
        everything else (conv fwd/bwd, losses, Adam) identical."""

        def step(params, bn_state, opt_state, imgs_u8, labels, key, alpha,
                 lr):
            imgs = augment_train_batch(
                key, imgs_u8, crop_padding=data_cfg.crop_padding,
                noise_std=data_cfg.noise_std, dtype=dtype)

            def loss_fn(p):
                (x_hat, logits, _z), new_bn = supervised_ae_apply(
                    p, bn_state, imgs, train=train_flag, cfg=model_cfg)
                total, mse, ce = joint_ae_loss(x_hat, logits, imgs, labels,
                                               alpha)
                return total, new_bn

            (loss, new_bn), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            params, opt_state = adam_update(params, grads, opt_state, lr)
            return params, new_bn, opt_state, loss

        return jax.jit(step, donate_argnums=(0, 2))

    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 255, (args.batch, 64, 64, 3),
                                       dtype=np.uint8))
    labels = jax.device_put(rng.integers(0, 10, args.batch).astype(np.int32))
    alpha, lr = jnp.asarray(35.0), jnp.asarray(5e-3)

    results = {}
    for dtype_name, dtype in (("float32", jnp.float32),
                              ("bfloat16", jnp.bfloat16)):
        for label, train_flag in (("batch_stats", True),
                                  ("no_stats_bound", False)):
            params, bn_state = supervised_ae_init(jax.random.PRNGKey(0),
                                                  model_cfg)
            opt_state = adam_init(params)
            step = make_step(train_flag, dtype)
            for i in range(args.warmup):
                params, bn_state, opt_state, loss = step(
                    params, bn_state, opt_state, imgs, labels,
                    jax.random.PRNGKey(i), alpha, lr)
            float(loss)
            t0 = time.perf_counter()
            for i in range(args.iters):
                params, bn_state, opt_state, loss = step(
                    params, bn_state, opt_state, imgs, labels,
                    jax.random.PRNGKey(i), alpha, lr)
            float(loss)  # host readback closes the chain
            dt = (time.perf_counter() - t0) / args.iters
            ips = args.batch / dt
            results[f"{dtype_name}/{label}"] = {
                "ms_per_step": round(dt * 1e3, 3),
                "images_per_sec": round(ips, 1)}
            print(f"{dtype_name:9s} {label:15s}: {dt * 1e3:7.2f} ms "
                  f"({ips:,.0f} img/s)", flush=True)

    for d in ("float32", "bfloat16"):
        base = results[f"{d}/batch_stats"]["ms_per_step"]
        bound = results[f"{d}/no_stats_bound"]["ms_per_step"]
        results[f"{d}/stats_cost_fraction"] = round(1 - bound / base, 4)
        print(f"{d}: removing ALL BN batch-moment work buys "
              f"{(1 - bound / base) * 100:.1f}% — the fusion kernel's "
              "ceiling (it could only recover the fwd stats read, a "
              "fraction of this)")
    Path("benchmarks/bn_fusion_bound.json").write_text(
        json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
