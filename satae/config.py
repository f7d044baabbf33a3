"""Typed configuration for the satae pipeline.

Every hyperparameter in the reference notebook is an inline literal; this module
is the single place they all live (the literals ARE the spec — see SURVEY.md §5
"Config / flag system" for the full citation list):

- per-class subsample cap 2000            (Report.md:74)
- split fractions 70/15/15, seed 42       (Report.md:178-187)
- Gaussian noise std 0.03                 (Report.md:229)
- crop padding 4                          (Report.md:227)
- batch_size 64                           (Report.md:246)
- latent_dim 64                           (Report.md:619)
- AE grid: alpha in {20,25,30,35,40}, lr in {1e-4..1e-1} (Report.md:599-600)
- AE max_epochs 80, patience 15           (Report.md:626-627)
- MLP grid: 11 lrs {1e-6..1e-1}, 30 epochs, Adam weight_decay 1e-4
                                          (Report.md:2611-2612, 2625)
- MLP dropout 0.3                         (Report.md:2556)

Unlike the reference, the per-class subsample is seeded here (the reference's
``torch.randperm`` at Report.md:81 is unseeded — a reproducibility bug we fix).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp

EUROSAT_CLASSES: Tuple[str, ...] = (
    "AnnualCrop",
    "Forest",
    "HerbaceousVegetation",
    "Highway",
    "Industrial",
    "Pasture",
    "PermanentCrop",
    "Residential",
    "River",
    "SeaLake",
)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Ingest / split / augmentation configuration (reference L1)."""

    root: Optional[str] = None  # EuroSAT directory of class subfolders; None -> synthetic
    image_size: int = 64
    channels: int = 3
    num_classes: int = 10
    per_class: int = 2000  # Report.md:74
    split_fractions: Tuple[float, float, float] = (0.70, 0.15, 0.15)  # Report.md:178
    split_seed: int = 42  # Report.md:182
    subsample_seed: int = 0  # reference is unseeded (Report.md:81); we seed it
    batch_size: int = 64  # Report.md:246
    crop_padding: int = 4  # Report.md:227
    noise_std: float = 0.03  # Report.md:229
    cache_dir: Optional[str] = None  # decode-once uint8 array cache location
    synthetic_difficulty: str = "easy"  # "hard" = non-saturating stand-in tier
    # augmentation PRNG implementation: "rbg" (XLA RngBitGenerator) is ~5%
    # faster per batch-64 epoch than threefry (measured, docs/PERF.md) and
    # still deterministic, but draws a different random stream — default
    # stays threefry so golden trajectories are stable
    aug_rng_impl: str = "threefry"

    def __post_init__(self):
        if abs(sum(self.split_fractions) - 1.0) > 1e-6:
            raise ValueError(
                f"split_fractions must sum to 1, got {self.split_fractions}")
        if self.per_class <= 0 or self.batch_size <= 0:
            raise ValueError("per_class and batch_size must be positive")
        if self.noise_std < 0 or self.crop_padding < 0:
            raise ValueError("noise_std and crop_padding must be >= 0")
        if self.aug_rng_impl not in ("threefry", "rbg"):
            raise ValueError(
                f"aug_rng_impl must be 'threefry' or 'rbg', "
                f"got {self.aug_rng_impl!r}")
        if self.synthetic_difficulty not in ("easy", "hard"):
            raise ValueError(
                f"synthetic_difficulty must be 'easy' or 'hard', "
                f"got {self.synthetic_difficulty!r}")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture configuration (reference L2)."""

    latent_dim: int = 64  # Report.md:619
    encoder_channels: Tuple[int, ...] = (32, 64, 128, 256)  # Report.md:291-307
    head_hidden: int = 128  # internal classification head, Report.md:423-427
    mlp_hidden: Tuple[int, ...] = (128, 64)  # external MLP, Report.md:2548-2566
    mlp_dropout: float = 0.3  # Report.md:2556
    num_classes: int = 10
    bn_momentum: float = 0.1  # PyTorch BatchNorm default
    bn_eps: float = 1e-5  # PyTorch BatchNorm default


@dataclasses.dataclass(frozen=True)
class AETrainConfig:
    """Supervised-AE grid search configuration (reference C16)."""

    alphas: Tuple[float, ...] = (20.0, 25.0, 30.0, 35.0, 40.0)  # Report.md:599
    learning_rates: Tuple[float, ...] = (
        1e-4, 2e-4, 5e-4, 1e-3, 2e-3, 5e-3, 1e-2, 5e-2, 1e-1,
    )  # Report.md:600
    max_epochs: int = 80  # Report.md:626
    patience: int = 15  # Report.md:627
    # mid-training crash recovery: flush the in-flight train state (params,
    # BN stats, optimizer moments, early-stop bookkeeping) every N epochs so
    # a SIGKILL mid-config retrains at most N epochs on resume. 0 = off
    # (default: checkpointed epochs run synchronously, forgoing the
    # pipelined readback — see fast_loop.train_supervised_ae_scan).
    checkpoint_every: int = 0


@dataclasses.dataclass(frozen=True)
class MLPTrainConfig:
    """Latent MLP grid search configuration (reference C22)."""

    learning_rates: Tuple[float, ...] = (
        1e-6, 5e-6, 1e-5, 5e-5, 1e-4, 5e-4, 1e-3, 5e-3, 1e-2, 5e-2, 1e-1,
    )  # Report.md:2611
    epochs: int = 30  # Report.md:2612
    weight_decay: float = 1e-4  # Report.md:2625


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Execution configuration (TPU-native; no reference analogue beyond C5)."""

    seed: int = 0
    compute_dtype: str = "float32"  # "bfloat16" for MXU-friendly throughput runs
    # fused Pallas kernels for encode/predict — numerics-validated but
    # measured ~13-18x SLOWER than XLA at these shapes (docs/PERF.md);
    # an experimentation flag, not a performance mode
    use_pallas: bool = False
    mesh_axis: str = "data"  # 1-D data-parallel mesh axis name
    n_devices: Optional[int] = None  # data-parallel device count (None = 1)
    # multi-process runtime: gates jax.distributed.initialize() before the
    # first backend touch (satae.parallel.distributed; also SATAE_MULTIHOST=1)
    multihost: bool = False
    grid_dp: int = 1  # grid mode: data-parallel devices PER CONFIG (2-D mesh)
    parallel_configs: bool = False  # vmapped grid sweep instead of sequential
    debug_nans: bool = False  # jax_debug_nans during fit (triage runs)
    save_grid_curves: bool = False  # per-config curve PNGs under out_dir/curves/


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level bundle mirroring the full notebook pipeline."""

    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    ae: AETrainConfig = dataclasses.field(default_factory=AETrainConfig)
    mlp: MLPTrainConfig = dataclasses.field(default_factory=MLPTrainConfig)
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.runtime.compute_dtype)


def default_config() -> PipelineConfig:
    return PipelineConfig()


def throughput_config(cfg: PipelineConfig,
                      batch_size: int = 1024) -> PipelineConfig:
    """Opt-in large-batch sweep recipe (`satae fit --throughput`).

    The faithful default keeps the reference's batch 64 (Report.md:246), and
    there the AE grid — 96.5% of end-to-end wall-clock — is pinned at a
    ~120 ms/epoch floor by per-step param/optimizer traffic plus small-batch
    underutilization (dtype-insensitive; every step-level lever probed is a
    measured negative — docs/PERF.md). The only escapes are multi-chip
    (config-sharded sweeps) or larger batches. This recipe trades per-step
    faithfulness for ~16x fewer optimizer steps per epoch: batch 1024 with
    each grid learning rate scaled by sqrt(B/64) (the Adam square-root
    scaling rule — variance of the per-step gradient estimate drops by the
    batch ratio). EVERYTHING selection-related is unchanged: per-config
    val-loss (AE) / val-acc (MLP) winners, early stopping, epoch accounting,
    checkpoint format. Quality must be gated per docs/PERF.md's seed-band
    protocol before trusting results at a new scale.
    """
    if batch_size % cfg.data.batch_size:
        raise ValueError(
            f"throughput batch_size {batch_size} must be a multiple of the "
            f"faithful batch_size {cfg.data.batch_size} (lr scaling rule)")
    k = math.sqrt(batch_size / cfg.data.batch_size)
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, batch_size=batch_size),
        ae=dataclasses.replace(
            cfg.ae, learning_rates=tuple(lr * k
                                         for lr in cfg.ae.learning_rates)),
        mlp=dataclasses.replace(
            cfg.mlp, learning_rates=tuple(lr * k
                                          for lr in cfg.mlp.learning_rates)),
    )
