"""Training-epoch throughput at full-EuroSAT scale (BASELINE.json config 5):
27k images through the fused augment+train input pipeline, whole epochs as
scan programs. Prints JSON with epoch seconds and images/sec for reference
batch 64 and a TPU-saturating batch 1024.

Timing: each epoch call consumes the previous epoch's params (scan-carried)
and ends with a host readback — real device work, not queue depth.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_IMAGES = 27000
EPOCHS = 5


def main() -> None:
    import jax
    import jax.numpy as jnp

    from satae.config import DataConfig, ModelConfig
    from satae.data.pipeline import ArrayDataset
    from satae.data.synthetic import make_synthetic_eurosat
    from satae.models.supervised_ae import supervised_ae_init
    from satae.train import hbm
    from satae.train.optim import adam_init

    imgs, labels, _ = make_synthetic_eurosat(per_class=N_IMAGES // 10, seed=0)
    ds = ArrayDataset(imgs, labels)
    model_cfg = ModelConfig()
    out = {}

    for batch in (64, 1024):
        data_cfg = DataConfig(batch_size=batch)
        epoch_fn = jax.jit(hbm.ae_train_epoch_body(model_cfg, data_cfg),
                           donate_argnums=(0, 1, 2))
        params, bn = supervised_ae_init(jax.random.PRNGKey(0), model_cfg)
        opt = adam_init(params)
        images = jax.device_put(ds.images)
        labs = jax.device_put(ds.labels)
        al, lr = jnp.asarray(35.0), jnp.asarray(5e-3)
        key = jax.random.PRNGKey(1)
        # warmup/compile
        order = jnp.asarray(hbm.epoch_order(len(ds), batch, 0, 0))
        params, bn, opt, ms = epoch_fn(params, bn, opt, images, labs, order,
                                       key, al, lr)
        float(ms["loss"])
        t0 = time.perf_counter()
        for e in range(1, EPOCHS + 1):
            order = jnp.asarray(hbm.epoch_order(len(ds), batch, 0, e))
            params, bn, opt, ms = epoch_fn(params, bn, opt, images, labs,
                                           order, key, al, lr)
        float(ms["loss"])
        dt = (time.perf_counter() - t0) / EPOCHS
        n_counted = (len(ds) // batch) * batch
        out[f"batch{batch}"] = {"epoch_seconds": round(dt, 3),
                                "images_per_sec": round(n_counted / dt)}
        print(f"batch={batch}: {dt:.3f} s/epoch "
              f"({n_counted / dt:,.0f} img/s)", file=sys.stderr)

    print(json.dumps({"n_images": N_IMAGES, **out}))


if __name__ == "__main__":
    main()
