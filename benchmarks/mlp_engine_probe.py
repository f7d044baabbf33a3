"""MLP sweep engines head-to-head at reference scale (VERDICT-r4 #8).

The 11-LR MLP grid (Report.md:2611-2733) has no convs, so by fast_loop.py's
own reasoning (vmap over per-config CONV weights lowers to slow grouped
conv — the reason the AE grid defaults to sequential scan) the vmapped
engine should win here: one program trains all 11 configs at once on pure
matmuls, filling the batch-64 idle capacity that makes the sequential sweep
dispatch-floor-bound. This probe times both engines on identical
reference-shaped latent data (9450/2025 train/val, latent_dim 64, 11 lrs x
30 epochs, batch 64) and asserts they select the same winner.

Writes benchmarks/mlp_engine_probe.json; the measured winner becomes the
fit(grid=True) MLP default (satae/api.py) — per-engine numerics are
unchanged (identical per-config seeding, tests/test_engine_equivalence.py).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    from satae.config import MLPTrainConfig, ModelConfig
    from satae.train.gridsearch import mlp_grid_search
    from satae.train.vmap_sweep import mlp_vmap_grid_search

    model_cfg = ModelConfig()
    mlp_cfg = MLPTrainConfig()  # the reference 11-lr grid, 30 epochs
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')} — "
        f"{len(mlp_cfg.learning_rates)} lrs x {mlp_cfg.epochs} epochs")

    # reference-scale latent tensors (fit() extracts 9450/2025/2025 at
    # per_class=1350); mildly class-separated Gaussians so training is
    # non-degenerate and val-acc selection discriminates between lrs
    rng = np.random.default_rng(0)
    centers = rng.normal(0, 1.0, (10, model_cfg.latent_dim)).astype(
        np.float32)

    def make(n):
        y = rng.integers(0, 10, n).astype(np.int32)
        x = centers[y] + rng.normal(0, 1.6, (n, model_cfg.latent_dim)) \
            .astype(np.float32)
        return x, y

    train_x, train_y = make(9450)
    val_x, val_y = make(2025)

    results = {"n_train": 9450, "n_val": 2025,
               "n_lrs": len(mlp_cfg.learning_rates),
               "epochs": mlp_cfg.epochs}

    def run(name, fn):
        t0 = time.perf_counter()
        sweep = fn()
        dt = time.perf_counter() - t0
        results[f"{name}_seconds"] = round(dt, 2)
        results[f"{name}_winner_lr"] = sweep.best_hparams["lr"]
        results[f"{name}_best_val_acc"] = round(sweep.best.best_val_acc, 4)
        log(f"{name}: {dt:.1f} s, winner lr={sweep.best_hparams['lr']:g} "
            f"(val_acc {sweep.best.best_val_acc:.4f})")
        return sweep

    # warm pass at 2 epochs to split compile time out of both engines
    warm_cfg = MLPTrainConfig(epochs=2)
    for name, engine in (("scan", mlp_grid_search),
                         ("vmap", mlp_vmap_grid_search)):
        t0 = time.perf_counter()
        engine(train_x, train_y, val_x, val_y, model_cfg=model_cfg,
               mlp_cfg=warm_cfg, batch_size=64, seed=0)
        results[f"{name}_warm_seconds"] = round(time.perf_counter() - t0, 2)

    s = run("scan", lambda: mlp_grid_search(
        train_x, train_y, val_x, val_y, model_cfg=model_cfg,
        mlp_cfg=mlp_cfg, batch_size=64, seed=0))
    v = run("vmap", lambda: mlp_vmap_grid_search(
        train_x, train_y, val_x, val_y, model_cfg=model_cfg,
        mlp_cfg=mlp_cfg, batch_size=64, seed=0))

    results["same_winner"] = bool(
        s.best_hparams["lr"] == v.best_hparams["lr"])
    results["speedup_vmap_over_scan"] = round(
        results["scan_seconds"] / results["vmap_seconds"], 2)
    out = Path(__file__).parent / "mlp_engine_probe.json"
    out.write_text(json.dumps(results, indent=2))
    log(f"wrote {out}: vmap {results['speedup_vmap_over_scan']}x vs scan")


if __name__ == "__main__":
    main()
