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
from satae.data.pipeline import ArrayDataset
from satae.models.encoder import encoder_apply


def make_encode_step(model_cfg: ModelConfig, compute_dtype=jnp.float32):
    @jax.jit
    def encode(enc_params, enc_state, imgs_u8) -> jax.Array:
        x = normalize(imgs_u8, compute_dtype)
        z, _ = encoder_apply(enc_params, enc_state, x, train=False,
                             cfg=model_cfg)
        return z

    return encode


def make_decode_step(model_cfg: ModelConfig, compute_dtype=jnp.float32,
                     image_size: int = 64):
    """Eval-mode decoder forward: latents -> reconstructed images in [0,1]
    (float32 on return). The serving inverse of :func:`make_encode_step` —
    the reference model's ``x_hat`` output (``forward`` returns
    ``(x_hat, logits, z)``, Report.md:429-433) exposed standalone. Latents
    are cast to the compute dtype at entry, matching what the decoder saw
    during training (it consumed the encoder's compute-dtype activations)."""
    from satae.models.decoder import decoder_apply

    @jax.jit
    def decode(dec_params, dec_state, z) -> jax.Array:
        x_hat, _ = decoder_apply(dec_params, dec_state,
                                 z.astype(compute_dtype), train=False,
                                 cfg=model_cfg, image_size=image_size)
        return x_hat.astype(jnp.float32)

    return decode


def extract_features(enc_params: Any, enc_state: Any, ds: ArrayDataset,
                     model_cfg: ModelConfig, batch_size: int = 64,
                     encode_step=None, compute_dtype=jnp.float32,
                     pad_multiple: int = 1
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (X (N, latent_dim) float32, y (N,) int32) on host.

    The split is uploaded to the device ONCE and encoded in large on-device
    chunks (zero-padded to a chunk multiple, sliced off after): per-batch
    host->device uploads through this environment's TPU relay cost ~0.25 s
    of round-trip latency each, which made reference-style batch-64
    streaming (~313 uploads for the three 20k-image splits) the dominant
    extraction cost — measured 87 s for ~2 s of device work. ``batch_size``
    is kept for API parity with the reference's loader-driven
    extract_features (Report.md:2497-2510) and acts as a floor for the
    chunk size. ``pad_multiple`` rounds the chunk up so it divides evenly
    over a device mesh (pass the mesh's data-axis size when ``encode_step``
    is the sharded :func:`satae.parallel.dp.make_dp_encode_step`).
    """
    encode_step = encode_step or make_encode_step(model_cfg, compute_dtype)
    n = len(ds)
    # chunk: large enough to amortize dispatches, never padding a tiny
    # dataset past the next batch multiple
    chunk = min(max(batch_size, 2048),
                -(-n // batch_size) * batch_size)
    chunk = -(-chunk // pad_multiple) * pad_multiple
    pad = (-n) % chunk
    imgs = ds.images
    if pad:
        imgs = np.concatenate(
            [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
    imgs_d = jax.device_put(imgs)  # one upload per split
    zs = [encode_step(enc_params, enc_state, imgs_d[lo:lo + chunk])
          for lo in range(0, n + pad, chunk)]
    # concatenate ON DEVICE and read back once
    X = np.asarray(jnp.concatenate(zs, axis=0)[:n], np.float32)
    return X, np.asarray(ds.labels, np.int32)
