"""Parameter initializers matching PyTorch layer defaults.

The reference relies entirely on PyTorch default inits (no explicit init code
anywhere in the notebook). Those defaults matter for parity: the alpha
calibration experiment's CE/MSE ratio ~= 30 at init (Report.md:534) depends on
the init scale, and the grid-search optimum sits on top of it. PyTorch's
default for Conv2d / ConvTranspose2d / Linear is ``kaiming_uniform_(a=sqrt(5))``
which reduces to W ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)), and bias ~ U(+-1/sqrt(fan_in))
with fan_in taken from the weight tensor.

All weights here are created in TPU-friendly layouts:
  conv:            HWIO  (kh, kw, in_ch, out_ch)
  conv_transpose:  HWIO  (kh, kw, in_ch, out_ch) of the *equivalent dilated
                   forward conv* (see layers.conv2d_transpose)
  linear:          (in_features, out_features)  -- column-major out, so the
                   matmul is x @ W (MXU-natural), unlike torch's (out, in).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _uniform(key: jax.Array, shape: Tuple[int, ...], bound: float,
             dtype=jnp.float32) -> jax.Array:
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_uniform_conv(key: jax.Array, kh: int, kw: int, in_ch: int,
                         out_ch: int, dtype=jnp.float32) -> jax.Array:
    """PyTorch Conv2d default weight init, HWIO layout. fan_in = in_ch*kh*kw."""
    bound = 1.0 / math.sqrt(in_ch * kh * kw)
    return _uniform(key, (kh, kw, in_ch, out_ch), bound, dtype)


def kaiming_uniform_conv_transpose(key: jax.Array, kh: int, kw: int,
                                   in_ch: int, out_ch: int,
                                   dtype=jnp.float32) -> jax.Array:
    """PyTorch ConvTranspose2d default weight init, HWIO layout.

    torch weight shape is (in_ch, out_ch, kh, kw) and
    ``_calculate_fan_in_and_fan_out`` takes dim 1 * receptive field, so
    fan_in = out_ch*kh*kw (NOT in_ch*kh*kw).
    """
    bound = 1.0 / math.sqrt(out_ch * kh * kw)
    return _uniform(key, (kh, kw, in_ch, out_ch), bound, dtype)


def kaiming_uniform_linear(key: jax.Array, in_features: int, out_features: int,
                           dtype=jnp.float32) -> jax.Array:
    """PyTorch Linear default weight init, (in, out) layout. fan_in = in."""
    bound = 1.0 / math.sqrt(in_features)
    return _uniform(key, (in_features, out_features), bound, dtype)


def bias_uniform(key: jax.Array, fan_in: int, n: int,
                 dtype=jnp.float32) -> jax.Array:
    """PyTorch default bias init: U(+-1/sqrt(fan_in)) of the weight's fan_in."""
    bound = 1.0 / math.sqrt(fan_in)
    return _uniform(key, (n,), bound, dtype)
