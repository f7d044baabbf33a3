"""Functional NN layers (init + apply pairs) for the satae framework.

TPU-first design decisions:
  * NHWC activations / HWIO weights everywhere — the layout XLA:TPU tiles best
    (channel axis on the 128-lane dimension).
  * Pure functions over parameter pytrees; BatchNorm running statistics are
    explicit state threaded through ``apply`` (the reference's implicit
    nn.Module buffers, Report.md:293-305, made functional so the whole train
    step jits and donates).
  * ``lax.conv_general_dilated`` for both conv and transposed conv; the
    transposed conv is expressed as an input-dilated conv so both directions
    hit the same XLA conv emitter (and the same Pallas kernel when enabled).

Reference layers being re-implemented (do-not-copy; behavior only):
  Conv2d(k=3, s=2, p=1)+BatchNorm2d+ReLU blocks   Report.md:291-307
  ConvTranspose2d(k=3, s=2, p=1, output_padding=1) Report.md:370-382
  Linear                                           Report.md:309, 365, 423-427
  BatchNorm1d                                      Report.md:2554-2559
  Dropout(0.3)                                     Report.md:2556
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from satae.nn import init as inits

Params = Dict[str, jax.Array]
State = Dict[str, jax.Array]

_CONV_DIMS = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# Conv2d
# ---------------------------------------------------------------------------

def conv2d_init(key: jax.Array, in_ch: int, out_ch: int, kernel: int = 3,
                dtype=jnp.float32) -> Params:
    wk, bk = jax.random.split(key)
    return {
        "w": inits.kaiming_uniform_conv(wk, kernel, kernel, in_ch, out_ch, dtype),
        "b": inits.bias_uniform(bk, in_ch * kernel * kernel, out_ch, dtype),
    }


def conv2d(params: Params, x: jax.Array, stride: int = 1,
           padding: int = 0) -> jax.Array:
    """2-D convolution, NHWC. Matches torch.nn.Conv2d(k, stride, padding)."""
    y = lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_CONV_DIMS,
    )
    return y + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# ConvTranspose2d
# ---------------------------------------------------------------------------

def conv2d_transpose_init(key: jax.Array, in_ch: int, out_ch: int,
                          kernel: int = 3, dtype=jnp.float32) -> Params:
    wk, bk = jax.random.split(key)
    return {
        "w": inits.kaiming_uniform_conv_transpose(
            wk, kernel, kernel, in_ch, out_ch, dtype),
        "b": inits.bias_uniform(bk, out_ch * kernel * kernel, out_ch, dtype),
    }


def conv2d_transpose(params: Params, x: jax.Array, stride: int = 2,
                     padding: int = 1, output_padding: int = 1) -> jax.Array:
    """Transposed conv matching torch.nn.ConvTranspose2d semantics.

    Implemented as an input-dilated (fractionally-strided) forward conv:
    lhs_dilation=stride with explicit padding
    (k-1-p, k-1-p+output_padding) per spatial dim. For the reference's
    k=3, s=2, p=1, op=1 (Report.md:370-382) this doubles spatial dims
    (H -> 2H) exactly like PyTorch.

    The stored weight is the kernel of this *forward* dilated conv. It relates
    to a torch ConvTranspose2d weight Wt (in,out,kh,kw) by a spatial flip:
    w[h,w_,i,o] = Wt[i,o,kh-1-h,kw-1-w_]. Since the kernel is learned, the
    flip only matters when importing torch weights (see tests).
    """
    k = params["w"].shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    y = lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding=((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_CONV_DIMS,
    )
    return y + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# BatchNorm (2d over NHWC, 1d over NC) with running statistics
# ---------------------------------------------------------------------------

def batchnorm_init(ch: int, dtype=jnp.float32) -> Tuple[Params, State]:
    params = {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}
    state = {"mean": jnp.zeros((ch,), dtype), "var": jnp.ones((ch,), dtype)}
    return params, state


def batchnorm(params: Params, state: State, x: jax.Array, *, train: bool,
              momentum: float = 0.1, eps: float = 1e-5
              ) -> Tuple[jax.Array, State]:
    """BatchNorm matching torch.nn.BatchNorm1d/2d numerics.

    Train mode normalizes with biased batch statistics and updates running
    stats with the *unbiased* variance (PyTorch behavior); eval mode uses the
    running stats. Reduction axes are every axis but the last, so the same
    function serves BatchNorm2d (NHWC) and BatchNorm1d (NC).

    Under pjit with the batch axis sharded over the mesh, the means below are
    global-batch means — XLA inserts the cross-replica psums, which gives
    cross-replica BatchNorm for free (SURVEY.md §7 "Hard parts").
    """
    axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x, axes)
        var = jnp.var(x, axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean.astype(state["mean"].dtype),
            "var": (1 - momentum) * state["var"] + momentum * unbiased.astype(state["var"].dtype),
        }
    else:
        mean, var = state["mean"].astype(x.dtype), state["var"].astype(x.dtype)
        new_state = state
    inv = lax.rsqrt(var.astype(x.dtype) + jnp.asarray(eps, x.dtype))
    y = (x - mean.astype(x.dtype)) * inv
    y = y * params["scale"].astype(x.dtype) + params["bias"].astype(x.dtype)
    return y, new_state


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, in_features: int, out_features: int,
                dtype=jnp.float32) -> Params:
    wk, bk = jax.random.split(key)
    return {
        "w": inits.kaiming_uniform_linear(wk, in_features, out_features, dtype),
        "b": inits.bias_uniform(bk, in_features, out_features, dtype),
    }


def linear(params: Params, x: jax.Array) -> jax.Array:
    """Affine map x @ W + b with W stored (in, out) — MXU-natural layout."""
    return jnp.dot(x, params["w"].astype(x.dtype),
                   preferred_element_type=x.dtype) + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------

def dropout(key: Optional[jax.Array], x: jax.Array, rate: float,
            train: bool) -> jax.Array:
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train time)."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


relu = jax.nn.relu
sigmoid = jax.nn.sigmoid
