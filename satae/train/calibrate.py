"""Loss-scale calibration: CE/MSE ratio over many fresh inits (reference C14).

The reference trains nothing here — it initializes 1000 fresh models
(latent_dim=128, Report.md:504), runs ONE training batch through each, and
histograms ratio = CE / MSE to justify alpha in [20, 40] (result: ~30-32,
Report.md:534). Sequentially on GPU that is 1000 separate forwards; here the
whole experiment is ONE lax.scan program over the init keys (a sequential
scan, deliberately NOT a vmapped batch of models: vmapping the conv weights
lowers to grouped convolutions, measured ~50x slower at this model size —
see CLAUDE.md perf findings).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from satae.config import DataConfig, ModelConfig
from satae.data.augment import augment_train_batch
from satae.models.supervised_ae import supervised_ae_apply, supervised_ae_init
from satae.train.losses import cross_entropy, mse_loss


def loss_ratio_calibration(
    imgs_u8: np.ndarray,
    labels: np.ndarray,
    *,
    model_cfg: Optional[ModelConfig] = None,
    data_cfg: Optional[DataConfig] = None,
    n_inits: int = 1000,
    chunk: int = 50,
    seed: int = 0,
) -> np.ndarray:
    """Returns the (n_inits,) array of CE/MSE ratios at initialization.

    The reference's calibration model uses latent_dim=128 (vs 64 for the real
    training — SURVEY.md §2 quirk); we default to the same.
    """
    model_cfg = model_cfg or ModelConfig(latent_dim=128)
    data_cfg = data_cfg or DataConfig()
    image_size = imgs_u8.shape[1]

    aug_key = jax.random.PRNGKey(seed)
    # jit'd: eager execution would compile one tiny program per random op
    # through the remote-compile relay (~10 round-trips)
    aug = jax.jit(lambda k, x: augment_train_batch(
        k, x, crop_padding=data_cfg.crop_padding,
        noise_std=data_cfg.noise_std, rng_impl=data_cfg.aug_rng_impl))
    imgs = aug(aug_key, jnp.asarray(imgs_u8))
    labels_d = jnp.asarray(labels)

    def one_init(key):
        params, state = supervised_ae_init(key, model_cfg,
                                           in_ch=imgs.shape[-1],
                                           image_size=image_size)
        (x_hat, logits, _z), _ = supervised_ae_apply(params, state, imgs,
                                                     train=True, cfg=model_cfg)
        return cross_entropy(logits, labels_d) / mse_loss(x_hat, imgs)

    # lax.scan over inits, NOT vmap: vmapping per-init conv weights lowers
    # to grouped convolutions, which waste the MXU at these channel counts
    # (the repo-wide finding from the grid engines, CLAUDE.md) — measured
    # ~0.5 s/init vmapped-in-chunks vs the whole 1000-init experiment as one
    # sequential scan program. ``chunk`` splits the scan into a few
    # dispatches so huge n_inits don't build one enormous program.
    scan_ratio = jax.jit(lambda keys: jax.lax.scan(
        lambda carry, k: (carry, one_init(k)), None, keys)[1])
    base = jax.random.PRNGKey(seed + 1)
    ratios = []
    for lo in range(0, n_inits, chunk):
        n = min(chunk, n_inits - lo)
        keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            base, jnp.arange(lo, lo + n))
        ratios.append(scan_ratio(keys))  # device refs; stay in flight
    # one host readback for all chunks (per-chunk np.asarray would serialize
    # a host round-trip per chunk)
    return np.concatenate([np.asarray(r) for r in jax.device_get(ratios)])


@dataclasses.dataclass
class CalibrationSummary:
    median: float
    mean: float
    p5: float
    p95: float

    @classmethod
    def from_ratios(cls, ratios: np.ndarray) -> "CalibrationSummary":
        return cls(float(np.median(ratios)), float(np.mean(ratios)),
                   float(np.percentile(ratios, 5)),
                   float(np.percentile(ratios, 95)))
