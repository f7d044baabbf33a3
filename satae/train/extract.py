"""Frozen-encoder latent extraction (reference C19/C20, Report.md:2497-2510).

The reference runs eval-mode, no-grad encoder forwards per batch with a
device->host copy per batch (Report.md:2501-2510). Here the encoder apply is
one jit'd program; freezing is free (functional params are never updated
unless you update them) and batches stream through with a single host gather
at the end.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from satae.config import ModelConfig
from satae.data.augment import normalize
from satae.data.pipeline import ArrayDataset, iter_batches
from satae.models.encoder import encoder_apply


def make_encode_step(model_cfg: ModelConfig, compute_dtype=jnp.float32):
    @jax.jit
    def encode(enc_params, enc_state, imgs_u8) -> jax.Array:
        x = normalize(imgs_u8, compute_dtype)
        z, _ = encoder_apply(enc_params, enc_state, x, train=False,
                             cfg=model_cfg)
        return z

    return encode


def extract_features(enc_params: Any, enc_state: Any, ds: ArrayDataset,
                     model_cfg: ModelConfig, batch_size: int = 64,
                     encode_step=None, compute_dtype=jnp.float32
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (X (N, latent_dim) float32, y (N,) int32) on host."""
    encode_step = encode_step or make_encode_step(model_cfg, compute_dtype)
    zs = []
    for imgs, _labels in iter_batches(ds, batch_size, shuffle=False):
        zs.append(encode_step(enc_params, enc_state, imgs))
    # concatenate ON DEVICE and read back once: a per-batch np.asarray would
    # cost one host round-trip per batch (219 for the 14k train split)
    X = np.asarray(jnp.concatenate(zs, axis=0), np.float32)
    return X, np.asarray(ds.labels, np.int32)
