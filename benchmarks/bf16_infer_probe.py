"""Probe: does PRE-CASTING params to bf16 (once, outside the jit) fix the
bf16 inference regression?

Round-1 finding (docs/PERF.md): bf16 encode+classify at batch 4096 measured
SLOWER than f32 (1.29M vs 1.0-1.5M img/s) — attributed to per-call
``astype`` casts inside every layer (satae/nn/layers.py keeps master params
f32 and casts to the activation dtype at use). The obvious fix was never
probed: cast the whole param/BN pytree to bf16 ONCE outside the program, so
the compiled graph sees bf16 weights and contains no casts.

Three variants, identical batch, chained-dependency timing (bench.py
methodology — each call consumes the previous call's output and the loop
ends with a host readback, because block_until_ready lies through the TPU
relay):

  f32        : f32 activations, f32 params (the shipped default)
  bf16-cast  : bf16 activations, f32 params cast per call inside the jit
  bf16-pre   : bf16 activations, params/BN pre-cast to bf16 on host

Writes benchmarks/bf16_infer_probe.json. Verdict feeds docs/PERF.md and (if
a win) the api.encode/predict path. Reference workload: the test-split
batched inference of Report.md:3179-3184.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 4096
WARMUP = 2
ITERS = 20
WINDOWS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from satae.config import ModelConfig
    from satae.data.augment import normalize
    from satae.models.encoder import encoder_apply
    from satae.models.mlp import mlp_apply, mlp_init
    from satae.models.supervised_ae import supervised_ae_init

    model_cfg = ModelConfig()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr, flush=True)

    key = jax.random.PRNGKey(0)
    ae_params, ae_state = supervised_ae_init(key, model_cfg)
    mlp_params, mlp_state = mlp_init(key, model_cfg)
    enc_p, enc_s = ae_params["encoder"], ae_state["encoder"]

    def cast_tree(tree, dtype):
        return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), tree)

    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 255, (BATCH, 64, 64, 3),
                                       dtype=np.uint8))

    def make_step(compute_dtype):
        @jax.jit
        def step(ep, es, mp, ms, imgs_u8, acc):
            imgs_u8 = imgs_u8 ^ (acc % 2).astype(jnp.uint8)  # serialize
            x = normalize(imgs_u8, compute_dtype)
            z, _ = encoder_apply(ep, es, x, train=False, cfg=model_cfg)
            logits, _ = mlp_apply(mp, ms, z, train=False, cfg=model_cfg)
            return acc + jnp.sum(jnp.argmax(logits, -1)).astype(jnp.int32)
        return step

    variants = {
        "f32": (jnp.float32, (enc_p, enc_s, mlp_params, mlp_state)),
        "bf16_cast_in_jit": (jnp.bfloat16,
                             (enc_p, enc_s, mlp_params, mlp_state)),
        "bf16_precast": (jnp.bfloat16,
                         tuple(cast_tree(t, jnp.bfloat16)
                               for t in (enc_p, enc_s, mlp_params,
                                         mlp_state))),
    }

    results = {}
    for name, (dtype, args) in variants.items():
        step = make_step(dtype)
        acc = jnp.zeros((), jnp.int32)
        for _ in range(WARMUP):
            acc = step(*args, imgs, acc)
        int(acc)
        best = 0.0
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                acc = step(*args, imgs, acc)
            int(acc)
            best = max(best, BATCH * ITERS / (time.perf_counter() - t0))
        results[name] = round(best, 1)
        print(f"{name:18s}: {best:,.0f} img/s "
              f"({BATCH * 1e3 / best:.3f} ms/batch)",
              file=sys.stderr, flush=True)

    out = {
        "batch": BATCH, "iters": ITERS, "windows": WINDOWS,
        "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
        "images_per_sec": results,
        "bf16_precast_vs_f32": round(
            results["bf16_precast"] / results["f32"], 3),
        "bf16_precast_vs_cast": round(
            results["bf16_precast"] / results["bf16_cast_in_jit"], 3),
    }
    Path("benchmarks/bf16_infer_probe.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
