"""Headline benchmark: EuroSAT encode+classify throughput, images/sec/chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The pipeline benched is the reference's end-to-end inference path
(BASELINE.json config 4): uint8 image batch -> normalize -> frozen conv
encoder -> latent -> MLP classifier -> argmax, as one fused jit program on
the current accelerator. ``vs_baseline`` is measured against the identical
architecture running in torch on CPU (the reference notebook's CPU fallback,
Report.md:163-167; the reference publishes no throughput numbers of its own,
BASELINE.md) — measured fresh on this host each run.

Measurement methodology: each timed call consumes the previous call's output
(a scalar accumulator folded into the input), and the loop ends with a host
readback — async dispatch through the runtime therefore cannot overlap or
elide executions, so images/sec reflects real device work, not queue depth.

Supplementary numbers (train-step throughput, per-stage timings) go to
stderr and benchmarks/last_bench.json, never stdout.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

INFER_BATCH = 4096
TRAIN_BATCH = 1024
WARMUP = 2
ITERS = 20
TORCH_BATCH = 64
TORCH_ITERS = 3


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_jax() -> dict:
    import jax
    import jax.numpy as jnp

    from satae.config import DataConfig, ModelConfig
    from satae.data.augment import normalize
    from satae.models.encoder import encoder_apply
    from satae.models.mlp import mlp_apply, mlp_init
    from satae.models.supervised_ae import supervised_ae_init
    from satae.train.optim import adam_init
    from satae.train.steps import make_ae_train_step

    model_cfg = ModelConfig()
    data_cfg = DataConfig()
    dev = jax.devices()[0]
    log(f"jax device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    key = jax.random.PRNGKey(0)
    ae_params, ae_state = supervised_ae_init(key, model_cfg)
    mlp_params, mlp_state = mlp_init(key, model_cfg)

    @jax.jit
    def infer_step(enc_p, enc_s, mlp_p, mlp_s, imgs_u8, acc):
        imgs_u8 = imgs_u8 ^ (acc % 2).astype(jnp.uint8)  # serialize calls
        x = normalize(imgs_u8, jnp.float32)
        z, _ = encoder_apply(enc_p, enc_s, x, train=False, cfg=model_cfg)
        logits, _ = mlp_apply(mlp_p, mlp_s, z, train=False, cfg=model_cfg)
        return acc + jnp.sum(jnp.argmax(logits, -1)).astype(jnp.int32)

    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 255, (INFER_BATCH, 64, 64, 3),
                                       dtype=np.uint8))
    acc = jnp.zeros((), jnp.int32)
    args = (ae_params["encoder"], ae_state["encoder"], mlp_params, mlp_state)
    for _ in range(WARMUP):
        acc = infer_step(*args, imgs, acc)
    int(acc)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        acc = infer_step(*args, imgs, acc)
    int(acc)  # host readback closes the dependency chain
    dt = time.perf_counter() - t0
    infer_ips = INFER_BATCH * ITERS / dt
    log(f"jax encode+classify: {infer_ips:,.0f} images/sec "
        f"({dt / ITERS * 1e3:.2f} ms/batch of {INFER_BATCH})")

    # supplementary: fused train-step throughput (params chain step-to-step)
    train_step = make_ae_train_step(model_cfg, data_cfg, donate=True)
    imgs_t = jax.device_put(rng.integers(0, 255, (TRAIN_BATCH, 64, 64, 3),
                                         dtype=np.uint8))
    labels = jax.device_put(rng.integers(0, 10, TRAIN_BATCH).astype(np.int32))
    opt_state = adam_init(ae_params)
    alpha, lr = jnp.asarray(35.0), jnp.asarray(5e-3)
    params, bn_state = ae_params, ae_state
    for i in range(WARMUP):
        params, bn_state, opt_state, m = train_step(
            params, bn_state, opt_state, imgs_t, labels,
            jax.random.PRNGKey(i), alpha, lr)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        params, bn_state, opt_state, m = train_step(
            params, bn_state, opt_state, imgs_t, labels,
            jax.random.PRNGKey(i), alpha, lr)
    float(m["loss"])
    train_ips = TRAIN_BATCH * ITERS / (time.perf_counter() - t0)
    log(f"jax fused train step: {train_ips:,.0f} images/sec")
    return {"infer_ips": infer_ips, "train_ips": train_ips,
            "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"}


def bench_torch_cpu() -> float:
    """Identical-architecture torch-CPU inference baseline (the reference's
    CPU fallback path). Returns images/sec."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class Encoder(nn.Module):
        def __init__(self, latent_dim=64):
            super().__init__()
            blocks, chans = [], [3, 32, 64, 128, 256]
            for i in range(4):
                blocks += [nn.Conv2d(chans[i], chans[i + 1], 3, 2, 1),
                           nn.BatchNorm2d(chans[i + 1]), nn.ReLU()]
            self.conv = nn.Sequential(*blocks)
            self.fc = nn.Linear(256 * 4 * 4, latent_dim)

        def forward(self, x):
            return self.fc(self.conv(x).flatten(1))

    class MLP(nn.Module):
        def __init__(self, input_dim=64, num_classes=10):
            super().__init__()
            self.net = nn.Sequential(
                nn.Linear(input_dim, 128), nn.BatchNorm1d(128), nn.ReLU(),
                nn.Dropout(0.3), nn.Linear(128, 64), nn.BatchNorm1d(64),
                nn.ReLU(), nn.Linear(64, num_classes))

        def forward(self, x):
            return self.net(x)

    enc, mlp = Encoder().eval(), MLP().eval()
    imgs = torch.rand(TORCH_BATCH, 3, 64, 64)
    best = 0.0
    with torch.no_grad():
        enc(imgs)  # warmup
        for _ in range(3):  # best-of-3 for a stable baseline
            t0 = time.perf_counter()
            for _ in range(TORCH_ITERS):
                mlp(enc(imgs)).argmax(1)
            best = max(best, TORCH_BATCH * TORCH_ITERS /
                       (time.perf_counter() - t0))
    log(f"torch-cpu encode+classify baseline (best of 3): {best:,.0f} "
        "images/sec")
    return best


def main() -> None:
    jax_res = bench_jax()
    baseline_ips = bench_torch_cpu()
    vs = jax_res["infer_ips"] / baseline_ips
    payload = {
        "metric": "eurosat_encode_classify_images_per_sec_per_chip",
        "value": round(jax_res["infer_ips"], 1),
        "unit": "images/sec",
        "vs_baseline": round(vs, 2),
    }
    detail = {**payload, "train_images_per_sec": round(jax_res["train_ips"], 1),
              "torch_cpu_baseline_images_per_sec": round(baseline_ips, 1),
              "device": jax_res["device"],
              "infer_batch": INFER_BATCH, "train_batch": TRAIN_BATCH}
    Path("benchmarks").mkdir(exist_ok=True)
    Path("benchmarks/last_bench.json").write_text(json.dumps(detail, indent=2))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
