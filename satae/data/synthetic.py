"""Synthetic EuroSAT-shaped dataset for tests and data-free benchmarking.

The build environment has zero egress and no EuroSAT copy on disk, so the
real-ingest path (satae.data.ingest) cannot be exercised against actual
Sentinel-2 patches here. This module generates a *learnable* stand-in with the
exact shapes/dtypes of EuroSAT RGB (64x64x3 uint8, 10 classes): each class has
a distinct mean color and oriented sinusoidal texture, with per-image random
phase, gain, brightness and pixel noise, so the encoder/MLP pipeline can
demonstrably separate classes (e2e tests assert >> chance accuracy).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from satae.config import EUROSAT_CLASSES

# One (R,G,B) anchor per class, loosely evoking the land-cover palette.
_PALETTE = np.array([
    [180, 160, 90],   # AnnualCrop
    [30, 90, 40],     # Forest
    [90, 140, 70],    # HerbaceousVegetation
    [120, 120, 125],  # Highway
    [150, 90, 100],   # Industrial
    [130, 170, 90],   # Pasture
    [160, 130, 70],   # PermanentCrop
    [170, 100, 80],   # Residential
    [70, 100, 140],   # River
    [20, 60, 120],    # SeaLake
], dtype=np.float32)


def make_synthetic_eurosat(per_class: int, image_size: int = 64,
                           seed: int = 0
                           ) -> Tuple[np.ndarray, np.ndarray, Tuple[str, ...]]:
    """Returns (images uint8 (N,H,W,3), labels int32 (N,), class names)."""
    rng = np.random.default_rng(seed)
    n_classes = len(EUROSAT_CLASSES)
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32)
    images = np.empty((n_classes * per_class, image_size, image_size, 3),
                      dtype=np.uint8)
    labels = np.empty((n_classes * per_class,), dtype=np.int32)
    for c in range(n_classes):
        freq = 0.15 + 0.08 * c          # class-specific spatial frequency
        angle = np.pi * c / n_classes   # class-specific orientation
        u = np.cos(angle) * xx + np.sin(angle) * yy
        phase = rng.uniform(0, 2 * np.pi, (per_class, 1, 1)).astype(np.float32)
        gain = rng.uniform(10, 35, (per_class, 1, 1)).astype(np.float32)
        brightness = rng.uniform(-18, 18, (per_class, 1, 1)).astype(np.float32)
        texture = gain * np.sin(freq * u[None] + phase) + brightness
        base = _PALETTE[c][None, None, None, :]
        imgs = base + texture[..., None]
        imgs += rng.normal(0, 6, imgs.shape).astype(np.float32)
        lo, hi = c * per_class, (c + 1) * per_class
        images[lo:hi] = np.clip(imgs, 0, 255).astype(np.uint8)
        labels[lo:hi] = c
    return images, labels, EUROSAT_CLASSES
