"""Serving characterization: encode+classify latency/throughput vs batch
size, plus an int8-MXU bound probe.

The production serving workload is the reference's batched test-split
inference (Report.md:3179-3184) generalized to arbitrary request batch
sizes. docs/PERF.md so far records one point (batch 4096); this probe maps
the latency/throughput curve a deployment actually needs to size against:

  part 1: batch in {1, 8, 64, 256, 1024, 4096} x {f32, bf16 pre-cast}
          (the shipped api.encode/predict recipes), chained-dependency
          timing ending in a host readback (block_until_ready lies through
          the TPU relay — bench.py methodology).
  part 2: int8 bound — the encoder's 4-conv chain run as bf16 vs int8
          (int8 operands, int32 accumulation, per-layer rescale), identical
          shapes. This is a SPEED CEILING probe only (no quantization
          calibration / quality wiring): if int8 doesn't beat bf16 on the
          isolated conv chain, a full quantized serving path can't win and
          is not worth building.

Writes benchmarks/serving_probe.json; verdict feeds docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCHES = (1, 8, 64, 256, 1024, 4096)
WARMUP = 2
WINDOWS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

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

    trees = {
        "f32": (jnp.float32, (enc_p, enc_s, mlp_params, mlp_state)),
        "bf16": (jnp.bfloat16, tuple(
            cast_tree(t, jnp.bfloat16)
            for t in (enc_p, enc_s, mlp_params, mlp_state))),
    }

    def make_step(compute_dtype):
        @jax.jit
        def step(ep, es, mp, ms, imgs_u8, acc):
            imgs_u8 = imgs_u8 ^ (acc % 2).astype(jnp.uint8)  # serialize
            x = normalize(imgs_u8, compute_dtype)
            z, _ = encoder_apply(ep, es, x, train=False, cfg=model_cfg)
            logits, _ = mlp_apply(mp, ms, z, train=False, cfg=model_cfg)
            return acc + jnp.sum(jnp.argmax(logits, -1)).astype(jnp.int32)
        return step

    rng = np.random.default_rng(0)
    curve = {}
    for name, (dtype, args) in trees.items():
        step = make_step(dtype)
        curve[name] = {}
        for batch in BATCHES:
            imgs = jax.device_put(
                rng.integers(0, 255, (batch, 64, 64, 3), dtype=np.uint8))
            acc = jnp.zeros((), jnp.int32)
            iters = max(10, min(200, (1 << 20) // batch))
            for _ in range(WARMUP):
                acc = step(*args, imgs, acc)
            int(acc)
            best = 0.0
            for _ in range(WINDOWS):
                t0 = time.perf_counter()
                for _ in range(iters):
                    acc = step(*args, imgs, acc)
                int(acc)
                best = max(best, batch * iters / (time.perf_counter() - t0))
            curve[name][str(batch)] = {
                "images_per_sec": round(best, 1),
                "ms_per_batch": round(batch * 1e3 / best, 3),
            }
            print(f"{name:5s} batch {batch:5d}: {best:12,.0f} img/s  "
                  f"{batch * 1e3 / best:7.3f} ms/batch",
                  file=sys.stderr, flush=True)

    # -- part 2: int8 conv-chain bound --------------------------------------
    # The encoder's conv stack at batch 4096, stripped to the convs (no
    # BN/bias/proj): bf16xbf16->f32 vs int8xint8->int32 with a per-layer
    # f32 rescale back to int8 (the cheapest real requantization a deployed
    # int8 path would need).
    batch = 4096
    chans = (3,) + tuple(model_cfg.encoder_channels)
    ws = [np.asarray(enc_p[f"conv{i}"]["w"], np.float32)
          for i in range(len(model_cfg.encoder_channels))]

    def conv(x, w, acc_t):
        return lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_t)

    w_bf = [jnp.asarray(w, jnp.bfloat16) for w in ws]
    w_i8 = [jnp.asarray(np.clip(np.round(w / (np.abs(w).max() / 127)),
                                -127, 127), jnp.int8) for w in ws]

    @jax.jit
    def chain_bf16(imgs_u8, acc, ws):
        x = (imgs_u8 ^ (acc % 2).astype(jnp.uint8)).astype(jnp.bfloat16)
        for w in ws:
            x = conv(x, w, jnp.float32).astype(jnp.bfloat16)
        return acc + jnp.sum(x[..., 0].astype(jnp.float32)).astype(jnp.int32)

    @jax.jit
    def chain_int8(imgs_u8, acc, ws):
        x = (imgs_u8 ^ (acc % 2).astype(jnp.uint8)).astype(jnp.int8)
        for w in ws:
            y = conv(x, w, jnp.int32)
            # rescale int32 accum back into int8 range (per-layer scalar)
            x = jnp.clip(jnp.round(y.astype(jnp.float32) * (1.0 / 256)),
                         -127, 127).astype(jnp.int8)
        return acc + jnp.sum(x[..., 0].astype(jnp.int32))

    imgs = jax.device_put(
        rng.integers(0, 255, (batch, 64, 64, 3), dtype=np.uint8))
    bound = {}
    for name, fn, ws_d in (("bf16_convs", chain_bf16, w_bf),
                           ("int8_convs", chain_int8, w_i8)):
        acc = jnp.zeros((), jnp.int32)
        for _ in range(WARMUP):
            acc = fn(imgs, acc, ws_d)
        int(acc)
        best = 0.0
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(50):
                acc = fn(imgs, acc, ws_d)
            int(acc)
            best = max(best, batch * 50 / (time.perf_counter() - t0))
        bound[name] = {"images_per_sec": round(best, 1),
                       "ms_per_batch": round(batch * 1e3 / best, 3)}
        print(f"{name:11s} batch {batch}: {best:12,.0f} img/s  "
              f"{batch * 1e3 / best:7.3f} ms/batch",
              file=sys.stderr, flush=True)

    out = {
        "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
        "windows": WINDOWS,
        "encode_classify_curve": curve,
        "int8_conv_bound_batch4096": bound,
        "int8_vs_bf16_convs": round(
            bound["int8_convs"]["images_per_sec"]
            / bound["bf16_convs"]["images_per_sec"], 3),
    }
    Path("benchmarks/serving_probe.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
