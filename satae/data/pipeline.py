"""Subsample, split, and batch iteration over the decode-once array cache.

Reference behavior being matched (made deterministic where it wasn't):
  * per-class cap of 2000 images via random subset — the reference's
    ``torch.randperm`` is UNSEEDED (Report.md:81, SURVEY.md §2 bug list);
    ours is seeded (DataConfig.subsample_seed).
  * 70/15/15 random split with seed 42 (Report.md:178-187). We use a seeded
    numpy permutation rather than torch.Generator bit-for-bit order; the
    split sizes and determinism contract are identical.
  * batch_size 64, train shuffled per epoch, val/test ordered (Report.md:246-250).

Batches are yielded as numpy views (zero-copy) of uint8 images; normalization
and augmentation happen on device inside the jit'd steps (satae.data.augment).
The final short batch is yielded as-is — XLA caches one extra compilation for
the remainder shape, which is cheaper and simpler than masked padding and
keeps BatchNorm statistics faithful to the reference's per-batch semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Tuple

import numpy as np

from satae.config import DataConfig
from satae.data.ingest import RawDataset


@dataclass
class ArrayDataset:
    images: np.ndarray  # uint8 (N, H, W, 3)
    labels: np.ndarray  # int32 (N,)

    def __len__(self) -> int:
        return int(self.images.shape[0])


@dataclass
class Splits:
    train: ArrayDataset
    val: ArrayDataset
    test: ArrayDataset
    classes: Tuple[str, ...]


def subsample_per_class(labels: np.ndarray, per_class: int,
                        seed: int) -> np.ndarray:
    """Seeded per-class cap (fixes the reference's unseeded randperm)."""
    rng = np.random.default_rng(seed)
    keep = []
    for c in np.unique(labels):
        idx = np.flatnonzero(labels == c)
        if len(idx) > per_class:
            idx = rng.permutation(idx)[:per_class]
        keep.append(idx)
    return np.sort(np.concatenate(keep))


def split_indices(n: int, fractions: Tuple[float, float, float],
                  seed: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Seeded 70/15/15 permutation split; sizes match torch.random_split's
    fraction semantics: floor each split, then hand the remainder out
    round-robin to the first splits (so n=20001 -> 14001/3000/3000)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    sizes = [int(f * n) for f in fractions]
    for i in range(n - sum(sizes)):
        sizes[i % len(sizes)] += 1
    lo1, lo2 = sizes[0], sizes[0] + sizes[1]
    return perm[:lo1], perm[lo1:lo2], perm[lo2:lo2 + sizes[2]]


def make_splits(raw: RawDataset, cfg: DataConfig) -> Splits:
    keep = subsample_per_class(raw.labels, cfg.per_class, cfg.subsample_seed)
    images, labels = raw.images[keep], raw.labels[keep]
    tr, va, te = split_indices(len(images), cfg.split_fractions, cfg.split_seed)
    mk = lambda idx: ArrayDataset(images[idx], labels[idx])
    return Splits(mk(tr), mk(va), mk(te), raw.classes)


def iter_batches(ds: ArrayDataset, batch_size: int, *, shuffle: bool,
                 seed: int = 0, epoch: int = 0, drop_remainder: bool = False
                 ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    n = len(ds)
    if shuffle:
        order = np.random.default_rng(seed + epoch).permutation(n)
    else:
        order = np.arange(n)
    stop = (n // batch_size) * batch_size if drop_remainder else n
    for lo in range(0, stop, batch_size):
        idx = order[lo:lo + batch_size]
        yield ds.images[idx], ds.labels[idx]


def num_batches(n: int, batch_size: int, drop_remainder: bool = False) -> int:
    return n // batch_size if drop_remainder else -(-n // batch_size)
