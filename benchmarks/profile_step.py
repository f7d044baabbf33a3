"""Attempt a real device profile of the scanned train step (hotspot hunt).

The corrected roofline (docs/PERF.md round-4 section) puts the scanned
bf16+rbg step at ~54% of the HBM bound and ~28% of executed-FLOPs peak —
neither resource explains the 4.9 ms. This script tries jax.profiler through
the TPU relay; if the relay supports device tracing, the trace directory
can be inspected for per-op device times (the .xplane.pb protos) to find
where the unmodeled ~2x activation traffic goes. Exits gracefully when the
relay doesn't support profiling.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 1024
K = 20


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from satae.config import DataConfig, ModelConfig
    from satae.models.supervised_ae import supervised_ae_init
    from satae.train.optim import adam_init
    from satae.train.steps import ae_train_step_body

    dtype = jnp.float32 if "f32" in sys.argv[1:] else jnp.bfloat16
    out = Path(sys.argv[sys.argv.index("--out") + 1]) \
        if "--out" in sys.argv else Path("/tmp/satae_trace")
    model_cfg = ModelConfig()
    data_cfg = DataConfig(aug_rng_impl="rbg")
    body = ae_train_step_body(model_cfg, data_cfg, dtype)

    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 255, (BATCH, 64, 64, 3),
                                       dtype=np.uint8))
    labels = jax.device_put(rng.integers(0, 10, BATCH).astype(np.int32))
    alpha, lr = jnp.asarray(35.0), jnp.asarray(5e-3)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def scan_k(params, bn_state, opt_state, key):
        def step(carry, k):
            p, s, o = carry
            p, s, o, m = body(p, s, o, imgs, labels, k, alpha, lr)
            return (p, s, o), m["loss"]

        carry, losses = jax.lax.scan(step, (params, bn_state, opt_state),
                                     jax.random.split(key, K))
        return (*carry, losses[-1])

    params, bn_state = supervised_ae_init(jax.random.PRNGKey(0), model_cfg)
    opt_state = adam_init(params)
    for i in range(2):
        params, bn_state, opt_state, loss = scan_k(
            params, bn_state, opt_state, jax.random.PRNGKey(i))
    float(loss)
    log(f"warm ({dtype.__name__}); starting trace -> {out}")

    try:
        with jax.profiler.trace(str(out)):
            for i in range(3):
                params, bn_state, opt_state, loss = scan_k(
                    params, bn_state, opt_state, jax.random.PRNGKey(i))
            float(loss)
        time.sleep(1)
        planes = list(out.rglob("*.xplane.pb"))
        log(f"trace ok: {len(planes)} xplane file(s) under {out}")
        for p in planes:
            log(f"  {p} ({p.stat().st_size} bytes)")
    except Exception as e:  # noqa: BLE001 — report and exit clean
        log(f"profiling unsupported here: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
