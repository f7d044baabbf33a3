"""Convolutional encoder: 4 strided conv+BN+ReLU blocks -> 64-d latent.

Re-implements the reference ``Encoder`` (Report.md:287-313 / nb cell 31):
channels 3->32->64->128->256 with Conv2d(k=3, s=2, p=1)+BatchNorm2d+ReLU,
spatial 64->32->16->8->4, then flatten + Linear(256*4*4 -> latent_dim).

Differences by design (TPU-first, not a port):
  * NHWC layout; the flatten order is HWC rather than torch's CHW. This only
    permutes the projection weight's input dimension — irrelevant to training
    from scratch, handled explicitly in torch-parity tests.
  * Pure init/apply functions; BN running stats are explicit state.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from satae.config import ModelConfig
from satae.nn import layers as L


def encoder_init(key: jax.Array, cfg: ModelConfig, in_ch: int = 3,
                 image_size: int = 64, dtype=jnp.float32
                 ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    chans = (in_ch,) + tuple(cfg.encoder_channels)
    n_blocks = len(cfg.encoder_channels)
    if image_size % (2 ** n_blocks) != 0:
        raise ValueError(
            f"image_size={image_size} must be divisible by 2^{n_blocks} "
            f"(the {n_blocks} stride-2 encoder blocks halve it each time)")
    keys = jax.random.split(key, n_blocks + 1)
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    for i in range(n_blocks):
        params[f"conv{i}"] = L.conv2d_init(keys[i], chans[i], chans[i + 1],
                                           kernel=3, dtype=dtype)
        params[f"bn{i}"], state[f"bn{i}"] = L.batchnorm_init(chans[i + 1], dtype)
    spatial = image_size // (2 ** n_blocks)
    flat = cfg.encoder_channels[-1] * spatial * spatial
    params["proj"] = L.linear_init(keys[-1], flat, cfg.latent_dim, dtype)
    return params, state


def encoder_apply(params: Dict[str, Any], state: Dict[str, Any], x: jax.Array,
                  *, train: bool, cfg: ModelConfig
                  ) -> Tuple[jax.Array, Dict[str, Any]]:
    """x: (N, H, W, C) float in [0,1] -> latent (N, latent_dim)."""
    new_state: Dict[str, Any] = {}
    h = x
    for i in range(len(cfg.encoder_channels)):
        h = L.conv2d(params[f"conv{i}"], h, stride=2, padding=1)
        h, new_state[f"bn{i}"] = L.batchnorm(
            params[f"bn{i}"], state[f"bn{i}"], h, train=train,
            momentum=cfg.bn_momentum, eps=cfg.bn_eps)
        h = L.relu(h)
    h = h.reshape(h.shape[0], -1)
    z = L.linear(params["proj"], h)
    return z, new_state
