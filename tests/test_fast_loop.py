"""Scan-epoch trainers: same learning behavior and selection semantics as the
per-batch host loop, and the grid search wiring over both engines."""

import numpy as np
import pytest

from satae.config import AETrainConfig, DataConfig, MLPTrainConfig, ModelConfig
from satae.data.ingest import RawDataset
from satae.data.pipeline import make_splits
from satae.data.synthetic import make_synthetic_eurosat
from satae.train.fast_loop import train_mlp_scan, train_supervised_ae_scan
from satae.train.gridsearch import ae_grid_search, mlp_grid_search

MODEL_CFG = ModelConfig(latent_dim=16, encoder_channels=(4, 8, 8, 16),
                        mlp_hidden=(32, 16))
DATA_CFG = DataConfig(per_class=24, image_size=32, batch_size=32)


@pytest.fixture(scope="module")
def splits():
    imgs, labels, classes = make_synthetic_eurosat(per_class=24, image_size=32,
                                                   seed=0)
    return make_splits(RawDataset(imgs, labels, classes), DATA_CFG)


def test_ae_scan_trains_and_snapshots(splits):
    res = train_supervised_ae_scan(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=DATA_CFG,
        alpha=35.0, lr=2e-3, max_epochs=4, patience=15, seed=0)
    h = res.history
    assert len(h["val_loss"]) == res.epochs_run
    assert h["train_loss"][-1] < h["train_loss"][0]
    assert np.isfinite(res.best_val_loss)
    # true best-epoch snapshot: re-evaluating the snapshot reproduces best_val
    import jax.numpy as jnp
    from satae.train.loop import run_eval
    from satae.train.steps import make_ae_eval_step
    ev = make_ae_eval_step(MODEL_CFG)
    val_m = run_eval(ev, res.params, res.bn_state, splits.val,
                     DATA_CFG.batch_size, (jnp.asarray(35.0),))
    assert val_m["loss"] == pytest.approx(res.best_val_loss, rel=2e-3)


def test_ae_scan_early_stopping(splits):
    res = train_supervised_ae_scan(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=DATA_CFG,
        alpha=35.0, lr=0.5, max_epochs=30, patience=2, seed=0)
    assert res.epochs_run < 30


def test_mlp_scan_learns():
    rng = np.random.default_rng(0)
    centers = rng.normal(0, 2, (10, 16)).astype(np.float32)
    ytr = rng.integers(0, 10, 200).astype(np.int32)
    yva = rng.integers(0, 10, 80).astype(np.int32)
    Xtr = centers[ytr] + rng.normal(0, 0.3, (200, 16)).astype(np.float32)
    Xva = centers[yva] + rng.normal(0, 0.3, (80, 16)).astype(np.float32)
    res = train_mlp_scan(Xtr, ytr, Xva, yva, model_cfg=MODEL_CFG, lr=1e-2,
                         epochs=10, batch_size=32, seed=0)
    assert res.best_val_acc > 0.5
    assert len(res.history["val_acc"]) == 10


def test_grid_search_resume_returns_cached_global_best(splits, tmp_path):
    """Regression: a fully-cached (or partially-cached) resumed sweep must
    return the recorded global best, not crash or prefer a worse fresh
    config."""
    ae_cfg = AETrainConfig(alphas=(35.0,), learning_rates=(2e-3, 5e-2),
                           max_epochs=2, patience=15)
    first = ae_grid_search(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=DATA_CFG,
        ae_cfg=ae_cfg, seed=0, out_dir=str(tmp_path), engine="scan")
    # all configs now cached: rerun must reload the stored winner
    second = ae_grid_search(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=DATA_CFG,
        ae_cfg=ae_cfg, seed=0, out_dir=str(tmp_path), engine="scan")
    assert second.best_hparams == first.best_hparams
    assert second.best.best_val_loss == pytest.approx(
        first.best.best_val_loss, rel=1e-6)
    # and the returned params are the checkpointed winner's weights
    leaves1 = [np.asarray(x) for x in
               __import__("jax").tree_util.tree_leaves(first.best.params)]
    leaves2 = [np.asarray(x) for x in
               __import__("jax").tree_util.tree_leaves(second.best.params)]
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_cross_engine_winner_equivalence(tmp_path):
    """VERDICT-r3 #5: the scan engine (remainder batch dropped per epoch,
    pipelined early-stop decision — hbm.py/fast_loop.py) and the per-batch
    steps engine (reference-exact accounting, loop.py) must select the SAME
    winner on a discriminating sweep, with val losses in close agreement.

    Sized so the divergences are actually exercised: the hard synthetic tier
    makes configs discriminable, and the train split (70% of 240 = 168
    images at batch 32) leaves a remainder batch every epoch."""
    imgs, labels, classes = make_synthetic_eurosat(
        per_class=24, image_size=32, seed=3, difficulty="hard")
    splits = make_splits(RawDataset(imgs, labels, classes), DATA_CFG)
    ae_cfg = AETrainConfig(alphas=(35.0,),
                           learning_rates=(2e-3, 1e-2, 0.3),
                           max_epochs=5, patience=15)
    sweeps = {}
    for engine in ("scan", "steps"):
        sweeps[engine] = ae_grid_search(
            splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=DATA_CFG,
            ae_cfg=ae_cfg, seed=0, out_dir=str(tmp_path / engine),
            engine=engine)
    assert sweeps["scan"].best_hparams == sweeps["steps"].best_hparams
    # training differs by design (remainder batches participate only in the
    # steps engine), so losses agree closely but not bit-exactly
    assert sweeps["scan"].best.best_val_loss == pytest.approx(
        sweeps["steps"].best.best_val_loss, rel=0.15)
    # per-config val losses must rank identically across engines
    def ranking(sweep):
        return sorted(sweep.results,
                      key=lambda k: sweep.results[k]["best_val_loss"])
    assert ranking(sweeps["scan"]) == ranking(sweeps["steps"])


def test_ae_scan_engine_dtype_mismatch_raises(splits):
    """A bf16-built engine must reject an explicit f32 request (and vice
    versa) instead of silently training in the engine's dtype; only
    compute_dtype=None inherits."""
    import jax.numpy as jnp

    from satae.train.fast_loop import AEScanEngine
    engine = AEScanEngine(MODEL_CFG, DATA_CFG, jnp.bfloat16)
    with pytest.raises(ValueError, match="compute_dtype"):
        train_supervised_ae_scan(
            splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=DATA_CFG,
            alpha=35.0, lr=2e-3, max_epochs=1, patience=1, seed=0,
            engine=engine, compute_dtype=jnp.float32)


def test_grid_search_all_diverged_writes_checkpoint(splits, tmp_path):
    """When every config diverges (NaN val loss throughout), the sweep must
    still leave a loadable ae_global_best checkpoint in out_dir."""
    import json

    ae_cfg = AETrainConfig(alphas=(35.0,), learning_rates=(float("nan"),),
                           max_epochs=2, patience=15)
    sweep = ae_grid_search(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=DATA_CFG,
        ae_cfg=ae_cfg, seed=0, out_dir=str(tmp_path), engine="scan")
    assert sweep.best is not None
    assert (tmp_path / "ae_global_best.msgpack").exists()
    meta = json.loads((tmp_path / "ae_global_best.json").read_text())
    assert meta.get("diverged") is True


def test_grid_search_scan_engine(splits, tmp_path):
    ae_cfg = AETrainConfig(alphas=(35.0,), learning_rates=(2e-3, 5e-2),
                           max_epochs=2, patience=15)
    sweep = ae_grid_search(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=DATA_CFG,
        ae_cfg=ae_cfg, seed=0, out_dir=str(tmp_path), engine="scan")
    assert len(sweep.results) == 2
    assert (tmp_path / "ae_global_best.msgpack").exists()

    mlp_cfg = MLPTrainConfig(learning_rates=(1e-3, 1e-2), epochs=2)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 16)).astype(np.float32)
    y = rng.integers(0, 10, 200).astype(np.int32)
    msweep = mlp_grid_search(X[:150], y[:150], X[150:], y[150:],
                             model_cfg=MODEL_CFG, mlp_cfg=mlp_cfg,
                             batch_size=32, seed=0, out_dir=str(tmp_path),
                             engine="scan")
    assert len(msweep.results) == 2
    assert (tmp_path / "mlp_global_best.msgpack").exists()
