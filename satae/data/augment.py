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


def flip_crop_select(x: jax.Array, flip: jax.Array, offsets: jax.Array,
                     crop_padding: int) -> jax.Array:
    """Deterministic core of flip+pad+crop as two selection matmuls.

    x: float (N,H,W,C); flip: bool (N,1); offsets: int (N,2) in [0, 2p].
    Equivalent to: flip_horizontally where flip, zero-pad by p, crop the
    (H,W) window at (off_y, off_x).
    """
    n, h, w, c = x.shape
    p = crop_padding
    hp, wp = h + 2 * p, w + 2 * p
    dtype = x.dtype
    padded = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    iy = offsets[:, 0:1] + jnp.arange(h)[None, :]                  # (N, H)
    jx = offsets[:, 1:2] + jnp.arange(w)[None, :]
    jx = jnp.where(flip, (wp - 1) - jx, jx)                        # fused flip
    sel_y = jax.nn.one_hot(iy, hp, dtype=dtype)                    # (N, H, HP)
    sel_x = jax.nn.one_hot(jx, wp, dtype=dtype)                    # (N, W, WP)
    x = jnp.einsum("nir,nrvc->nivc", sel_y, padded,
                   precision=lax.Precision.HIGHEST)
    return jnp.einsum("njv,nivc->nijc", sel_x, x,
                      precision=lax.Precision.HIGHEST)


def augment_train_batch(key: jax.Array, imgs_u8: jax.Array, *,
                        crop_padding: int = 4, noise_std: float = 0.03,
                        dtype=jnp.float32,
                        rng_impl: str = "threefry") -> jax.Array:
    """uint8 (N,H,W,C) -> augmented float (N,H,W,C) in ~[0,1] (+noise).

    TPU-native formulation: flip + random crop are *selection matmuls* on the
    MXU instead of per-image dynamic slices (which lower to serialized
    gather/dynamic-update-slice on TPU — measured 23x slower at batch 1024).
    Row selection is ``one_hot(off_y + i)``; the horizontal flip folds into
    the column selection for free (``col = W-1-off_x-j`` when flipped, since
    zero-padding is symmetric, flip commutes with pad). HIGHEST matmul
    precision keeps the selection exact (bit-preserving) in f32.

    ``rng_impl="rbg"`` re-keys the augmentation onto XLA's RngBitGenerator
    (hardware PRNG path): deterministic given the same key, ~5% faster per
    batch-64 training epoch on v5e (docs/PERF.md), but a different stream
    than threefry — opt in via ``DataConfig.aug_rng_impl``.
    """
    n, h, w, c = imgs_u8.shape
    if rng_impl == "rbg":
        # re-key onto rbg: tile the key data up to rbg's (4,)uint32 key
        # shape; a key that is already rbg-typed passes through unchanged
        kd = key if jnp.issubdtype(key.dtype, jnp.uint32) \
            else jax.random.key_data(key)
        if kd.shape[-1] < 4:
            kd = jnp.concatenate([kd, kd], axis=-1)[..., :4]
        key = jax.random.wrap_key_data(kd, impl="rbg")
    kf, kc, kn = jax.random.split(key, 3)
    x = normalize(imgs_u8, dtype)

    flip = jax.random.bernoulli(kf, 0.5, (n, 1))
    offsets = jax.random.randint(kc, (n, 2), 0, 2 * crop_padding + 1)
    x = flip_crop_select(x, flip, offsets, crop_padding)

    # Additive Gaussian noise (unclamped, like the reference's AddGaussianNoise).
    if noise_std:
        x = x + jnp.asarray(noise_std, dtype) * jax.random.normal(kn, x.shape,
                                                                  dtype)
    return x
