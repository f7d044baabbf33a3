"""Probe: custom VJP for the subpixel k3/s2 transposed conv (round 4).

The step anatomy (benchmarks/step_anatomy.json) shows the decoder path
dominates the train step (3.3 of 4.9 ms). The shipped subpixel forward
(layers._conv_transpose_subpixel_3x3_s2) is the fast forward form, but
XLA autodiff differentiates THROUGH the decomposition: the depth-to-space
grad is a space-to-depth transpose that re-materializes every decoder-stage
gradient, and both grad convs run in the 2x2/4*Cout parity form (16/9 x the
useful taps).

Mathematically the k3/s2/p1/op1 transposed conv T_w is the adjoint of the
dense k3/s2/p1 conv C_K with K = flip_hw(w) channel-transposed. Hence:
  - dL/dx = C_K(g)           (one dense strided conv, 9/16 the executed
                              FLOPs of the subpixel grad, no s2d transpose)
  - dL/dK = weight-grad of C_K at input g with cotangent x (XLA's native
            conv weight-grad), then dL/dw = unflip/untranspose.

This probe checks the custom grads against autodiff and times three forms
of the scanned decoder-only train step and the full train step:
  a) subpixel forward + autodiff backward      (shipped)
  b) subpixel forward + custom adjoint backward (candidate)
Writes benchmarks/deconv_vjp_probe.json.
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
K = 20
ITERS = 8
WARMUP = 2


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_custom_deconv():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from satae.nn.layers import _CONV_DIMS, _conv_transpose_subpixel_3x3_s2

    @jax.custom_vjp
    def deconv(x, w):
        return _conv_transpose_subpixel_3x3_s2(x, w)

    def fwd(x, w):
        return deconv(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        # K_c: kernel of the dense adjoint conv (HWIO, contracting Cout->Cin)
        k_c = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).astype(g.dtype)
        dx = lax.conv_general_dilated(
            g, k_c, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=_CONV_DIMS)
        # dK_c = weight-grad of the dense conv at input g, cotangent x
        _, wg = jax.vjp(
            lambda kk: lax.conv_general_dilated(
                g, kk, window_strides=(2, 2), padding=((1, 1), (1, 1)),
                dimension_numbers=_CONV_DIMS), k_c)
        (dk_c,) = wg(x.astype(g.dtype))
        dw = jnp.flip(dk_c.transpose(0, 1, 3, 2), (0, 1)).astype(w.dtype)
        return dx.astype(x.dtype), dw

    deconv.defvjp(fwd, bwd)
    return deconv


def check_grads():
    """Custom adjoint backward == autodiff backward (f64-ish tolerance)."""
    import jax
    import jax.numpy as jnp

    from satae.nn.layers import _conv_transpose_subpixel_3x3_s2

    deconv = make_custom_deconv()
    key = jax.random.PRNGKey(0)
    kx, kw, kg = jax.random.split(key, 3)
    x = jax.random.normal(kx, (4, 8, 8, 16), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 16, 8), jnp.float32) * 0.1
    g = jax.random.normal(kg, (4, 16, 16, 8), jnp.float32)

    def loss_ref(x, w):
        return jnp.vdot(_conv_transpose_subpixel_3x3_s2(x, w), g)

    def loss_new(x, w):
        return jnp.vdot(deconv(x, w), g)

    # jit everything: eager grad evaluation compiles dozens of tiny programs
    # through the TPU relay (minutes each in slow sessions — CLAUDE.md)
    y0, y1 = jax.jit(lambda x, w: (_conv_transpose_subpixel_3x3_s2(x, w),
                                   deconv(x, w)))(x, w)
    np.testing.assert_allclose(y0, y1, atol=1e-6)
    gx0, gw0 = jax.jit(jax.grad(loss_ref, (0, 1)))(x, w)
    gx1, gw1 = jax.jit(jax.grad(loss_new, (0, 1)))(x, w)
    np.testing.assert_allclose(gx0, gx1, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(gw0, gw1, rtol=2e-5, atol=2e-5)
    log("grad check vs autodiff: OK")


def main():
    import jax
    import jax.numpy as jnp

    import satae.nn.layers as L
    from satae.config import DataConfig, ModelConfig
    from satae.models.supervised_ae import (supervised_ae_apply,
                                            supervised_ae_init)
    from satae.data.augment import augment_train_batch
    from satae.train.losses import joint_ae_loss
    from satae.train.optim import adam_init, adam_update

    check_grads()

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

    custom = make_custom_deconv()
    orig = L._conv_transpose_subpixel_3x3_s2

    def timed_full(use_custom):
        L._conv_transpose_subpixel_3x3_s2 = custom if use_custom else orig
        try:
            def body(params, bn_state, opt_state, key):
                x = augment_train_batch(
                    key, imgs, crop_padding=data_cfg.crop_padding,
                    noise_std=data_cfg.noise_std, dtype=dtype,
                    rng_impl=data_cfg.aug_rng_impl)

                def loss_fn(p):
                    (x_hat, logits, _z), new_bn = supervised_ae_apply(
                        p, bn_state, x, train=True, cfg=model_cfg)
                    total, _, _ = joint_ae_loss(x_hat, logits, x, labels,
                                                alpha)
                    return total, new_bn

                (loss, new_bn), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                params, opt_state = adam_update(params, grads, opt_state, lr)
                return params, new_bn, opt_state, loss

            @partial(jax.jit, donate_argnums=(0, 1, 2))
            def scan_k(params, bn_state, opt_state, key):
                def step(carry, k):
                    p, s, o, acc = carry
                    p, s, o, loss = body(p, s, o, k)
                    return (p, s, o, acc + loss.astype(jnp.float32)), None

                (params, bn_state, opt_state, acc), _ = jax.lax.scan(
                    step, (params, bn_state, opt_state, jnp.float32(0)),
                    jax.random.split(key, K))
                return params, bn_state, opt_state, acc

            params, bn_state = supervised_ae_init(jax.random.PRNGKey(0),
                                                  model_cfg)
            opt_state = adam_init(params)
            for i in range(WARMUP):
                params, bn_state, opt_state, loss = scan_k(
                    params, bn_state, opt_state, jax.random.PRNGKey(i))
            final_loss = float(loss) / K
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for i in range(ITERS):
                    params, bn_state, opt_state, loss = scan_k(
                        params, bn_state, opt_state, jax.random.PRNGKey(i))
                float(loss)
                best = min(best, (time.perf_counter() - t0) / (ITERS * K))
            return best * 1e3, final_loss
        finally:
            L._conv_transpose_subpixel_3x3_s2 = orig

    results = {"batch": BATCH, "k": K, "dtype": "bf16", "rng": "rbg"}
    for name, use_custom in (("autodiff", False), ("custom_vjp", True)):
        ms, loss = timed_full(use_custom)
        results[f"full_step_{name}_ms"] = round(ms, 3)
        results[f"full_step_{name}_mean_loss"] = loss
        log(f"full step, {name} deconv bwd: {ms:.3f} ms/step "
            f"({BATCH / ms * 1e3:,.0f} img/s), mean scanned loss {loss:.4f}")

    out = Path(__file__).parent / "deconv_vjp_probe.json"
    out.write_text(json.dumps(results, indent=2))
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
