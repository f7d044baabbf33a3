"""Transposed-conv decoder: 64-d latent -> 64x64x3 reconstruction in [0,1].

Re-implements the reference ``Decoder`` (Report.md:361-389 / nb cell 36):
Linear(latent -> 256*4*4) + unflatten, then 4 ConvTranspose2d(k=3, s=2, p=1,
output_padding=1) blocks 256->128->64->32->3 — BN+ReLU after the first three,
final Sigmoid. Spatial 4->8->16->32->64.

TPU-first: transposed convs are input-dilated forward convs (see
satae.nn.layers.conv2d_transpose), NHWC layout, functional BN state.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from satae.config import ModelConfig
from satae.nn import layers as L


def decoder_init(key: jax.Array, cfg: ModelConfig, out_ch: int = 3,
                 image_size: int = 64, dtype=jnp.float32
                 ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    rev = tuple(reversed(cfg.encoder_channels))  # (256, 128, 64, 32)
    chans = rev + (out_ch,)
    n_blocks = len(rev)
    keys = jax.random.split(key, n_blocks + 1)
    spatial = image_size // (2 ** n_blocks)
    params: Dict[str, Any] = {
        "proj": L.linear_init(keys[0], cfg.latent_dim,
                              rev[0] * spatial * spatial, dtype),
    }
    state: Dict[str, Any] = {}
    for i in range(n_blocks):
        params[f"deconv{i}"] = L.conv2d_transpose_init(
            keys[i + 1], chans[i], chans[i + 1], kernel=3, dtype=dtype)
        if i < n_blocks - 1:  # BN+ReLU after all but the last block
            params[f"bn{i}"], state[f"bn{i}"] = L.batchnorm_init(chans[i + 1], dtype)
    return params, state


def decoder_apply(params: Dict[str, Any], state: Dict[str, Any], z: jax.Array,
                  *, train: bool, cfg: ModelConfig, image_size: int = 64
                  ) -> Tuple[jax.Array, Dict[str, Any]]:
    """z: (N, latent_dim) -> x_hat (N, H, W, C) in [0,1]."""
    rev = tuple(reversed(cfg.encoder_channels))
    n_blocks = len(rev)
    spatial = image_size // (2 ** n_blocks)
    new_state: Dict[str, Any] = {}
    h = L.linear(params["proj"], z)
    h = h.reshape(h.shape[0], spatial, spatial, rev[0])
    for i in range(n_blocks):
        h = L.conv2d_transpose(params[f"deconv{i}"], h, stride=2, padding=1,
                               output_padding=1)
        if i < n_blocks - 1:
            h, new_state[f"bn{i}"] = L.batchnorm(
                params[f"bn{i}"], state[f"bn{i}"], h, train=train,
                momentum=cfg.bn_momentum, eps=cfg.bn_eps)
            h = L.relu(h)
    return L.sigmoid(h), new_state
