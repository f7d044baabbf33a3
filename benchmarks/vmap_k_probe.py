"""Probe: can packing K configs into one vmapped epoch beat K sequential
epochs at the reference's batch 64?

Context (CLAUDE.md): the 45-config vmapped epoch measured 14.6 s vs 45 x
0.16 s sequential — grouped convs waste the MXU at full fan-out. But the
sequential batch-64 epoch floor (~120 ms) is SMALL-BATCH UNDERUTILIZATION:
there is idle MXU capacity. Hypothesis: at small K (2-4), the grouped-conv
epoch costs < K sequential epochs, i.e. the K configs partially fill the
idle capacity, and the 45-config grid could run as ceil(45/K) chunked-vmap
sweeps. This probe measures the marginal cost curve epoch(K)/K.

Timing uses the dependency-chained + host-readback methodology (CLAUDE.md).
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
from satae.models.supervised_ae import supervised_ae_init
from satae.train import hbm
from satae.train.optim import adam_init

N_IMGS = 14000
BATCH = 64


def time_k(k: int, iters: int = 5) -> float:
    """ms per vmapped epoch over k configs (k=1 == the sequential floor)."""
    model_cfg, data_cfg = ModelConfig(), DataConfig()
    epoch_fn = hbm.ae_train_epoch_body(model_cfg, data_cfg)
    vepoch = jax.jit(
        jax.vmap(epoch_fn, in_axes=(0, 0, 0, None, None, None, 0, 0, 0)),
        donate_argnums=(0, 1, 2))

    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(0, 255, (N_IMGS, 64, 64, 3),
                                         dtype=np.uint8))
    labels = jax.device_put(rng.integers(0, 10, N_IMGS).astype(np.int32))
    keys = jax.random.split(jax.random.PRNGKey(0), k)
    vparams, vbn = jax.vmap(
        lambda key: supervised_ae_init(key, model_cfg))(keys)
    vopt = adam_init(vparams)
    vopt["step"] = jnp.zeros((k,), jnp.int32)
    alphas = jnp.full((k,), 35.0)
    lrs = jnp.full((k,), 5e-3)
    order = jnp.asarray(hbm.epoch_order(N_IMGS, BATCH, 0, 0))
    ekeys = jax.random.split(jax.random.PRNGKey(1), k)

    for e in range(2):  # warmup/compile
        vparams, vbn, vopt, msum = vepoch(vparams, vbn, vopt, images, labels,
                                          order, ekeys, alphas, lrs)
    float(msum["loss"][0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            vparams, vbn, vopt, msum = vepoch(vparams, vbn, vopt, images,
                                              labels, order, ekeys, alphas,
                                              lrs)
        float(msum["loss"][0])  # chained readback closes the timing loop
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    results = {}
    for k in (int(s) for s in args.ks.split(",")):
        ms = time_k(k, args.iters)
        results[f"epoch_ms_k{k}"] = round(ms, 1)
        results[f"per_config_ms_k{k}"] = round(ms / k, 1)
        print(f"k={k}: {ms:.1f} ms/epoch = {ms / k:.1f} ms/config-epoch",
              flush=True)
    Path("benchmarks/vmap_k_probe.json").write_text(
        json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
