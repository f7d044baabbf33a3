"""On-device augmentation as pure jnp functions, fused into the train step.

Replaces the reference's per-image PIL transform hot loop
(``RandomHorizontalFlip -> RandomCrop(64, padding=4) -> ToTensor ->
AddGaussianNoise(0., 0.03)``, Report.md:225-238), which re-decodes and
re-transforms every image on the host for every epoch of every grid config —
the dominant non-GPU cost in the reference (SURVEY.md §3.1). Here the batch
arrives as uint8 in HBM and the whole augmentation is vectorized jnp inside
the jit'd step: it fuses with the encoder's first conv and costs ~nothing.

Semantics parity:
  * flip p=0.5 per image (torchvision RandomHorizontalFlip default)
  * RandomCrop(64, padding=4): zero-pad 4 on each side, uniform offset in
    [0, 8]^2 (torchvision pads with fill=0 constant)
  * ToTensor: uint8/255 (flip/crop commute with the scaling)
  * additive Gaussian noise std 0.03, unclamped (Report.md:211-219)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def normalize(imgs_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 (N,H,W,C) -> float [0,1] — the val/test-time transform."""
    return imgs_u8.astype(dtype) / jnp.asarray(255.0, dtype)


def augment_train_batch(key: jax.Array, imgs_u8: jax.Array, *,
                        crop_padding: int = 4, noise_std: float = 0.03,
                        dtype=jnp.float32) -> jax.Array:
    """uint8 (N,H,W,C) -> augmented float (N,H,W,C) in ~[0,1] (+noise)."""
    n, h, w, c = imgs_u8.shape
    kf, kc, kn = jax.random.split(key, 3)
    x = normalize(imgs_u8, dtype)

    # Random horizontal flip, p=0.5 per image.
    flip = jax.random.bernoulli(kf, 0.5, (n,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)

    # RandomCrop(h, padding=crop_padding) with zero fill.
    p = crop_padding
    padded = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    offsets = jax.random.randint(kc, (n, 2), 0, 2 * p + 1)

    def crop_one(img, off):
        return lax.dynamic_slice(img, (off[0], off[1], 0), (h, w, c))

    x = jax.vmap(crop_one)(padded, offsets)

    # Additive Gaussian noise (unclamped, like the reference's AddGaussianNoise).
    x = x + jnp.asarray(noise_std, dtype) * jax.random.normal(kn, x.shape, dtype)
    return x
