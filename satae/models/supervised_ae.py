"""Supervised autoencoder: encoder + decoder + internal classification head.

Re-implements the reference ``SupervisedAutoencoder`` (Report.md:416-433 /
nb cell 40): ``forward(x) -> (x_hat, logits, z)`` where the internal head is
Linear(latent, 128) -> ReLU -> Linear(128, num_classes). This head only shapes
the latent space during joint training; the reported accuracy comes from the
*external* MLP (satae.models.mlp) trained on frozen latents afterwards —
both exist, per SURVEY.md §2 quirk note.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from satae.config import ModelConfig
from satae.models.decoder import decoder_apply, decoder_init
from satae.models.encoder import encoder_apply, encoder_init
from satae.nn import layers as L


def supervised_ae_init(key: jax.Array, cfg: ModelConfig, in_ch: int = 3,
                       image_size: int = 64, dtype=jnp.float32
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    ek, dk, h1, h2 = jax.random.split(key, 4)
    enc_p, enc_s = encoder_init(ek, cfg, in_ch, image_size, dtype)
    dec_p, dec_s = decoder_init(dk, cfg, in_ch, image_size, dtype)
    params = {
        "encoder": enc_p,
        "decoder": dec_p,
        "head": {
            "fc1": L.linear_init(h1, cfg.latent_dim, cfg.head_hidden, dtype),
            "fc2": L.linear_init(h2, cfg.head_hidden, cfg.num_classes, dtype),
        },
    }
    state = {"encoder": enc_s, "decoder": dec_s}
    return params, state


def supervised_ae_apply(params: Dict[str, Any], state: Dict[str, Any],
                        x: jax.Array, *, train: bool, cfg: ModelConfig
                        ) -> Tuple[Tuple[jax.Array, jax.Array, jax.Array],
                                   Dict[str, Any]]:
    """x: (N, H, W, C) in [0,1] -> ((x_hat, logits, z), new_state)."""
    image_size = x.shape[1]
    z, enc_s = encoder_apply(params["encoder"], state["encoder"], x,
                             train=train, cfg=cfg)
    x_hat, dec_s = decoder_apply(params["decoder"], state["decoder"], z,
                                 train=train, cfg=cfg, image_size=image_size)
    h = L.relu(L.linear(params["head"]["fc1"], z))
    logits = L.linear(params["head"]["fc2"], h)
    return (x_hat, logits, z), {"encoder": enc_s, "decoder": dec_s}
