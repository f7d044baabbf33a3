"""Pallas fused matmul: out = act((x @ w) * scale + shift) in one MXU pass.

This is the TPU-native replacement for the reference's ATen linear/GEMM
kernels (SURVEY.md §2 native-components table): bias, folded BatchNorm
(inference), and the activation ride the GEMM epilogue instead of separate
HBM round-trips.

Grid: (M/bm, N/bn) with the full K dimension resident in VMEM per tile —
every matmul in this model family has K <= 4096 (encoder im2col K = 9*C_in,
projection K = 4096, MLP K <= 128), so a (bm, K) x (K, bn) working set is at
most ~2 MB in f32, far under the ~16 MB VMEM budget. Inputs are padded to
tile multiples outside the kernel (zero K-padding contributes nothing to the
dot; padded M rows / N cols are sliced off).

Differentiable via custom_vjp: the backward matmuls dX = g @ W^T and
dW = X^T @ g reuse the same Pallas kernel (activation/scale folded into g on
the XLA side before the calls).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = ("none", "relu", "sigmoid")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mm_kernel(x_ref, w_ref, scale_ref, shift_ref, out_ref, *, act: str):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc * scale_ref[:] + shift_ref[:]
    if act == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif act == "sigmoid":
        acc = jax.nn.sigmoid(acc)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_matmul(x: jax.Array, w: jax.Array, scale: jax.Array,
                 shift: jax.Array, act: str = "none") -> jax.Array:
    """act((x @ w) * scale + shift); scale/shift broadcast over rows (N,).

    A plain linear layer is scale=1, shift=bias. A linear+folded-BN layer is
    scale=gamma*rsqrt(var+eps), shift=beta-mean*scale (+ bias folded in).
    """
    return _fused_matmul_impl(x, w, scale, shift, act)


def _fused_matmul_impl(x, w, scale, shift, act):
    assert act in _ACTS, act
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)
    bm = min(_round_up(m, 8), 256)
    bn = min(_round_up(n, 128), 256)
    mp, kp, np_ = _round_up(m, bm), _round_up(k, 128), _round_up(n, bn)

    xp = jnp.pad(x, ((0, mp - m), (0, kp - k))) if (mp, kp) != (m, k) else x
    wp = jnp.pad(w, ((0, kp - k), (0, np_ - n))) if (kp, np_) != (k, n) else w
    scale_p = jnp.pad(scale.astype(jnp.float32), (0, np_ - n))
    shift_p = jnp.pad(shift.astype(jnp.float32), (0, np_ - n))

    out = pl.pallas_call(
        functools.partial(_mm_kernel, act=act),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * np_,
            bytes_accessed=4 * (mp * kp + kp * np_ + mp * np_),
            transcendentals=mp * np_ if act == "sigmoid" else 0),
    )(xp, wp, scale_p[None, :], shift_p[None, :])
    return out[:m, :n]


def _fwd(x, w, scale, shift, act):
    y = _fused_matmul_impl(x, w, scale, shift, act)
    return y, (x, w, scale, y)


def _bwd(act, res, g):
    x, w, scale, y = res
    if act == "relu":
        g = g * (y > 0).astype(g.dtype)
    elif act == "sigmoid":
        g = g * y * (1.0 - y)
    gs = g * scale[None, :].astype(g.dtype)  # through the epilogue scale
    ones_k = jnp.ones((x.shape[1],), jnp.float32)
    zeros_k = jnp.zeros((x.shape[1],), jnp.float32)
    ones_n = jnp.ones((g.shape[1],), jnp.float32)
    zeros_n = jnp.zeros((g.shape[1],), jnp.float32)
    dx = _fused_matmul_impl(gs, w.T, ones_k, zeros_k, "none")
    dw = _fused_matmul_impl(x.T, gs, ones_n, zeros_n, "none")
    # dscale needs the pre-epilogue product z = x @ w; recompute (cheap, and
    # avoids saving a second residual the size of the output).
    z = _fused_matmul_impl(x, w, ones_n, zeros_n, "none")
    dscale = jnp.sum(g * z, axis=0).astype(scale.dtype)
    dshift = jnp.sum(g, axis=0).astype(scale.dtype)
    return dx, dw, dscale, dshift


fused_matmul.defvjp(_fwd, _bwd)


def linear_pallas(x: jax.Array, w: jax.Array, b: jax.Array,
                  act: str = "none") -> jax.Array:
    """Drop-in fused replacement for layers.linear (+ optional activation)."""
    scale = jnp.ones((w.shape[1],), jnp.float32)
    return fused_matmul(x, w, scale, b.astype(jnp.float32), act)
