"""Vmapped sweep: all grid configs trained at once; results consistent with
the sequential path on the same tiny problem."""

import numpy as np
import pytest

from satae.config import AETrainConfig, DataConfig, MLPTrainConfig, ModelConfig
from satae.data.ingest import RawDataset
from satae.data.pipeline import make_splits
from satae.data.synthetic import make_synthetic_eurosat
from satae.train.vmap_sweep import ae_vmap_grid_search, mlp_vmap_grid_search

MODEL_CFG = ModelConfig(latent_dim=16, encoder_channels=(4, 8, 8, 16),
                        mlp_hidden=(32, 16))
DATA_CFG = DataConfig(per_class=24, image_size=32, batch_size=32)


@pytest.fixture(scope="module")
def splits():
    imgs, labels, classes = make_synthetic_eurosat(per_class=24, image_size=32,
                                                   seed=0)
    return make_splits(RawDataset(imgs, labels, classes), DATA_CFG)


def test_ae_vmap_sweep(splits, tmp_path):
    ae_cfg = AETrainConfig(alphas=(20.0, 35.0), learning_rates=(2e-3, 5e-2),
                           max_epochs=3, patience=15)
    sweep = ae_vmap_grid_search(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=DATA_CFG,
        ae_cfg=ae_cfg, seed=0, out_dir=str(tmp_path))
    assert len(sweep.results) == 4
    losses = [r["best_val_loss"] for r in sweep.results.values()]
    assert all(np.isfinite(losses))
    assert sweep.best.best_val_loss == pytest.approx(min(losses))
    assert sweep.best_hparams["alpha"] in (20.0, 35.0)
    assert (tmp_path / "validation_losses.json").exists()
    assert (tmp_path / "ae_global_best.msgpack").exists()
    # snapshot reproduces the recorded best val loss (true best-epoch weights)
    import jax.numpy as jnp
    from satae.train.loop import run_eval
    from satae.train.steps import make_ae_eval_step
    ev = make_ae_eval_step(MODEL_CFG)
    val_m = run_eval(ev, sweep.best.params, sweep.best.bn_state, splits.val,
                     DATA_CFG.batch_size,
                     (jnp.asarray(sweep.best_hparams["alpha"]),))
    assert val_m["loss"] == pytest.approx(sweep.best.best_val_loss, rel=1e-4)
    # the winner's history carries train AND val curves (reference figure
    # Report.md:2461-2469 has both lines)
    h = sweep.best.history
    assert len(h["train_loss"]) == len(h["val_loss"]) > 0
    assert all(np.isfinite(h["train_loss"]))


def test_vmap_sweeps_save_per_config_curves(splits, tmp_path):
    """save_curves=True writes one PNG per grid config (the reference's
    per-LR figures, Report.md:2706-2722)."""
    ae_cfg = AETrainConfig(alphas=(35.0,), learning_rates=(2e-3, 5e-2),
                           max_epochs=2, patience=15)
    ae_vmap_grid_search(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=DATA_CFG,
        ae_cfg=ae_cfg, seed=0, out_dir=str(tmp_path), save_curves=True)
    assert (tmp_path / "curves" / "ae_alpha35_lr0.002.png").exists()
    assert (tmp_path / "curves" / "ae_alpha35_lr0.05.png").exists()

    rng = np.random.default_rng(0)
    y = rng.integers(0, 10, 96).astype(np.int32)
    X = rng.normal(size=(96, 16)).astype(np.float32)
    mlp_cfg = MLPTrainConfig(learning_rates=(1e-3, 1e-2), epochs=2)
    sweep = mlp_vmap_grid_search(
        X[:64], y[:64], X[64:], y[64:], model_cfg=MODEL_CFG, mlp_cfg=mlp_cfg,
        batch_size=32, seed=0, out_dir=str(tmp_path), save_curves=True)
    assert (tmp_path / "curves" / "mlp_lr0.001.png").exists()
    assert (tmp_path / "curves" / "mlp_lr0.01.png").exists()
    assert len(sweep.best.history["train_acc"]) == 2  # winner history filled


def test_ae_vmap_early_stopping(splits):
    # patience 1 with a divergent lr in the grid: sweep must terminate early
    ae_cfg = AETrainConfig(alphas=(35.0,), learning_rates=(0.5,),
                           max_epochs=20, patience=1)
    sweep = ae_vmap_grid_search(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=DATA_CFG,
        ae_cfg=ae_cfg, seed=0)
    (summary,) = sweep.results.values()
    assert summary["epochs_run"] < 20


def test_mlp_vmap_sweep(splits, tmp_path):
    rng = np.random.default_rng(0)
    n_tr, n_va = 160, 64
    # learnable latents: class-dependent means
    ytr = rng.integers(0, 10, n_tr).astype(np.int32)
    yva = rng.integers(0, 10, n_va).astype(np.int32)
    centers = rng.normal(0, 2, (10, 16)).astype(np.float32)
    Xtr = centers[ytr] + rng.normal(0, 0.3, (n_tr, 16)).astype(np.float32)
    Xva = centers[yva] + rng.normal(0, 0.3, (n_va, 16)).astype(np.float32)

    mlp_cfg = MLPTrainConfig(learning_rates=(1e-4, 1e-3, 1e-2), epochs=8)
    sweep = mlp_vmap_grid_search(
        Xtr, ytr, Xva, yva, model_cfg=MODEL_CFG, mlp_cfg=mlp_cfg,
        batch_size=32, seed=0, out_dir=str(tmp_path))
    assert len(sweep.results) == 3
    assert sweep.best.best_val_acc > 0.5  # separable latents must be learned
    assert (tmp_path / "mlp_results.json").exists()
    accs = [r["best_val_acc"] for r in sweep.results.values()]
    assert sweep.best.best_val_acc == pytest.approx(max(accs))
