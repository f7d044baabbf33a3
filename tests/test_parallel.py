"""Multi-device DP tests on the 8-device virtual CPU mesh (SURVEY.md §4):
sharded train step numerics match the single-device step, and BN statistics
are global-batch (synchronized) under sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satae.config import DataConfig, ModelConfig
from satae.models.supervised_ae import supervised_ae_init
from satae.parallel import make_mesh, shard_batch
from satae.parallel.dp import (make_dp_ae_eval_step, make_dp_ae_train_step,
                               make_dp_encode_step)
from satae.train.optim import adam_init
from satae.train.steps import make_ae_eval_step, make_ae_train_step

MODEL_CFG = ModelConfig(latent_dim=16, encoder_channels=(4, 8, 8, 16))
DATA_CFG = DataConfig(image_size=32, batch_size=16)


def _setup(batch=16):
    key = jax.random.PRNGKey(0)
    params, bn_state = supervised_ae_init(key, MODEL_CFG, image_size=32)
    opt_state = adam_init(params)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (batch, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, batch).astype(np.int32)
    return params, bn_state, opt_state, imgs, labels


def test_mesh_creation():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    mesh2 = make_mesh(4)
    assert mesh2.devices.shape == (4,)


def test_dp_train_step_matches_single_device():
    params, bn_state, opt_state, imgs, labels = _setup()
    key = jax.random.PRNGKey(7)
    alpha = jnp.asarray(35.0)
    lr = jnp.asarray(1e-3)

    # single-device reference (no donation so we can reuse inputs)
    step1 = make_ae_train_step(MODEL_CFG, DATA_CFG, donate=False)
    p1, bn1, o1, m1 = step1(params, bn_state, opt_state, imgs, labels, key,
                            alpha, lr)

    # 8-way data-parallel
    mesh = make_mesh(8)
    stepN = make_dp_ae_train_step(mesh, MODEL_CFG, DATA_CFG, donate=False)
    imgs_sh, labels_sh = shard_batch(mesh, imgs, labels)
    pN, bnN, oN, mN = stepN(params, bn_state, opt_state, imgs_sh, labels_sh,
                            key, alpha, lr)

    # Adam's first step is ~lr*sign(g), so reduction-order float noise in the
    # sharded grads can move a near-zero-grad param by up to 2*lr; bound the
    # param check by the step size (a real sharding bug — e.g. per-replica
    # instead of global grads — shows up at O(1) relative error).
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.1e-3)
    # BN running stats equal => batch statistics were global, not per-replica
    for a, b in zip(jax.tree_util.tree_leaves(bn1),
                    jax.tree_util.tree_leaves(bnN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]), rtol=1e-5)


def test_dp_eval_and_encode_match():
    params, bn_state, _, imgs, labels = _setup()
    alpha = jnp.asarray(35.0)
    ev1 = make_ae_eval_step(MODEL_CFG)
    m1 = ev1(params, bn_state, imgs, labels, alpha)

    mesh = make_mesh(8)
    evN = make_dp_ae_eval_step(mesh, MODEL_CFG)
    imgs_sh, labels_sh = shard_batch(mesh, imgs, labels)
    mN = evN(params, bn_state, imgs_sh, labels_sh, alpha)
    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]), rtol=1e-5)

    encN = make_dp_encode_step(mesh, MODEL_CFG)
    z = encN(params["encoder"], bn_state["encoder"], imgs_sh)
    from satae.train.extract import make_encode_step
    z1 = make_encode_step(MODEL_CFG)(params["encoder"], bn_state["encoder"],
                                     imgs)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z1), atol=1e-5)


def test_dp_extract_features_matches():
    """Mesh-sharded latent extraction (the fit() path under n_devices) must
    return latents identical to the single-device extract_features, incl.
    for split sizes not divisible by the device count (VERDICT r2 weak #1)."""
    from satae.data.ingest import RawDataset
    from satae.data.pipeline import make_splits
    from satae.data.synthetic import make_synthetic_eurosat
    from satae.train.extract import extract_features, make_encode_step

    params, bn_state, _, _, _ = _setup()
    data_cfg = DataConfig(per_class=16, image_size=32, batch_size=16)
    imgs, labels, classes = make_synthetic_eurosat(per_class=16, image_size=32,
                                                   seed=0)
    splits = make_splits(RawDataset(imgs, labels, classes), data_cfg)
    # 21 images: NOT divisible by the 8-device mesh, so the pad+slice path
    # is genuinely exercised (the val split's natural 24 is a multiple of 8)
    from satae.data.pipeline import ArrayDataset
    ds = ArrayDataset(splits.val.images[:21], splits.val.labels[:21])
    assert len(ds) % 8 != 0
    X1, y1 = extract_features(params["encoder"], bn_state["encoder"], ds,
                              MODEL_CFG, data_cfg.batch_size,
                              make_encode_step(MODEL_CFG))
    mesh = make_mesh(8)
    XN, yN = extract_features(params["encoder"], bn_state["encoder"], ds,
                              MODEL_CFG, data_cfg.batch_size,
                              make_dp_encode_step(mesh, MODEL_CFG),
                              pad_multiple=8)
    np.testing.assert_allclose(XN, X1, atol=1e-5)
    np.testing.assert_array_equal(yN, y1)


def test_dp_training_loop_end_to_end():
    """Full mesh-sharded training via loop.train_supervised_ae(mesh=...)."""
    from satae.data.ingest import RawDataset
    from satae.data.pipeline import make_splits
    from satae.data.synthetic import make_synthetic_eurosat
    from satae.train.loop import train_supervised_ae

    data_cfg = DataConfig(per_class=16, image_size=32, batch_size=32)
    imgs, labels, classes = make_synthetic_eurosat(per_class=16, image_size=32,
                                                   seed=0)
    splits = make_splits(RawDataset(imgs, labels, classes), data_cfg)
    mesh = make_mesh(8)
    res = train_supervised_ae(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=data_cfg,
        alpha=35.0, lr=2e-3, max_epochs=2, patience=15, seed=0, mesh=mesh)
    assert res.epochs_run == 2
    assert np.isfinite(res.best_val_loss)
    assert res.history["train_loss"][-1] < res.history["train_loss"][0]


def test_dp_scan_epoch_matches_single_device():
    """The mesh-sharded scan epoch must produce the same training result as
    the single-device scan epoch (same order, same keys => same numerics up
    to reduction order)."""
    from satae.data.ingest import RawDataset
    from satae.data.pipeline import make_splits
    from satae.data.synthetic import make_synthetic_eurosat
    from satae.train.fast_loop import train_supervised_ae_scan

    data_cfg = DataConfig(per_class=16, image_size=32, batch_size=32)
    imgs, labels, classes = make_synthetic_eurosat(per_class=16, image_size=32,
                                                   seed=0)
    splits = make_splits(RawDataset(imgs, labels, classes), data_cfg)

    res1 = train_supervised_ae_scan(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=data_cfg,
        alpha=35.0, lr=2e-3, max_epochs=2, patience=15, seed=0)
    resN = train_supervised_ae_scan(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=data_cfg,
        alpha=35.0, lr=2e-3, max_epochs=2, patience=15, seed=0,
        mesh=make_mesh(8))
    assert resN.best_val_loss == pytest.approx(res1.best_val_loss, rel=1e-3)
    np.testing.assert_allclose(resN.history["train_loss"],
                               res1.history["train_loss"], rtol=1e-3)


def test_sharded_ae_grid_matches_sequential(tmp_path):
    """Config-sharded AE sweep (one config per device per round) selects the
    same winner with the same per-config val losses as the sequential
    engine (identical per-config seeding)."""
    from satae.config import AETrainConfig
    from satae.data.ingest import RawDataset
    from satae.data.pipeline import make_splits
    from satae.data.synthetic import make_synthetic_eurosat
    from satae.train.gridsearch import ae_grid_search
    from satae.train.shard_sweep import ae_sharded_grid_search

    data_cfg = DataConfig(per_class=24, image_size=32, batch_size=32)
    imgs, labels, classes = make_synthetic_eurosat(per_class=24,
                                                   image_size=32, seed=0)
    splits = make_splits(RawDataset(imgs, labels, classes), data_cfg)
    # 9 configs over 8 devices -> 2 rounds incl. a padded one
    ae_cfg = AETrainConfig(alphas=(20.0, 35.0, 40.0),
                           learning_rates=(1e-3, 5e-3, 5e-1),
                           max_epochs=3, patience=2)
    seq = ae_grid_search(splits.train, splits.val, model_cfg=MODEL_CFG,
                         data_cfg=data_cfg, ae_cfg=ae_cfg, seed=0)
    shd = ae_sharded_grid_search(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=data_cfg,
        ae_cfg=ae_cfg, mesh=make_mesh(8), seed=0, out_dir=str(tmp_path))
    assert shd.best_hparams == seq.best_hparams
    assert shd.best.best_val_loss == pytest.approx(
        seq.best.best_val_loss, rel=1e-4)
    assert set(shd.results) == set(seq.results)
    for k in seq.results:
        if np.isfinite(seq.results[k]["best_val_loss"]):
            assert shd.results[k]["best_val_loss"] == pytest.approx(
                seq.results[k]["best_val_loss"], rel=1e-3)
        assert shd.results[k]["best_epoch"] == seq.results[k]["best_epoch"]
    # winner history carries train AND val curves, truncated at its stop
    h = shd.best.history
    assert len(h["train_loss"]) == len(h["val_loss"]) > 0
    assert (tmp_path / "ae_global_best.msgpack").exists()
    assert (tmp_path / "validation_losses.json").exists()


def test_sharded_mlp_grid_matches_sequential(tmp_path):
    from satae.config import MLPTrainConfig
    from satae.train.gridsearch import mlp_grid_search
    from satae.train.shard_sweep import mlp_sharded_grid_search

    rng = np.random.default_rng(0)
    centers = rng.normal(0, 2, (10, 16)).astype(np.float32)
    ytr = rng.integers(0, 10, 300).astype(np.int32)
    yva = rng.integers(0, 10, 100).astype(np.int32)
    yte = rng.integers(0, 10, 100).astype(np.int32)
    Xtr = centers[ytr] + rng.normal(0, 0.3, (300, 16)).astype(np.float32)
    Xva = centers[yva] + rng.normal(0, 0.3, (100, 16)).astype(np.float32)
    Xte = centers[yte] + rng.normal(0, 0.3, (100, 16)).astype(np.float32)
    mlp_cfg = MLPTrainConfig(learning_rates=(1e-5, 1e-3, 1e-2), epochs=3)
    seq = mlp_grid_search(Xtr, ytr, Xva, yva, model_cfg=MODEL_CFG,
                          mlp_cfg=mlp_cfg, batch_size=32, seed=0,
                          test_x=Xte, test_y=yte)
    shd = mlp_sharded_grid_search(
        Xtr, ytr, Xva, yva, model_cfg=MODEL_CFG, mlp_cfg=mlp_cfg,
        mesh=make_mesh(8), batch_size=32, seed=0, out_dir=str(tmp_path),
        test_x=Xte, test_y=yte)
    assert shd.best_hparams == seq.best_hparams
    for k in seq.results:
        assert shd.results[k]["best_val_acc"] == pytest.approx(
            seq.results[k]["best_val_acc"], abs=1e-6)
        assert shd.results[k]["test_acc"] == pytest.approx(
            seq.results[k]["test_acc"], abs=1e-6)
    assert (tmp_path / "mlp_global_best.msgpack").exists()


def test_sharded_mlp_grid_no_snapshot_degrades_to_fallback(tmp_path):
    """When no config retains a best-epoch snapshot (epochs=0 is the
    reachable degenerate case), the sharded MLP sweep must degrade to the
    SweepBook fallback like the AE engine — returning end-of-run weights
    and writing mlp_global_best.msgpack — instead of resolve() raising."""
    import json

    from satae.config import MLPTrainConfig
    from satae.train.shard_sweep import mlp_sharded_grid_search

    rng = np.random.default_rng(0)
    Xtr = rng.normal(0, 1, (64, 16)).astype(np.float32)
    ytr = rng.integers(0, 10, 64).astype(np.int32)
    Xva = rng.normal(0, 1, (32, 16)).astype(np.float32)
    yva = rng.integers(0, 10, 32).astype(np.int32)
    shd = mlp_sharded_grid_search(
        Xtr, ytr, Xva, yva, model_cfg=MODEL_CFG,
        mlp_cfg=MLPTrainConfig(learning_rates=(1e-3, 1e-2), epochs=0),
        mesh=make_mesh(8), batch_size=32, seed=0, out_dir=str(tmp_path))
    assert shd.best is not None
    assert (tmp_path / "mlp_global_best.msgpack").exists()
    meta = json.loads((tmp_path / "mlp_global_best.json").read_text())
    assert meta.get("diverged") is True


def test_sharded_ae_grid_2d_mesh_matches_sequential():
    """2-D (config x data) mesh: each config trains data-parallel over the
    data axis while configs parallelize over the config axis. Selection must
    match the sequential engine; per-config val losses agree to DP reduction
    -order noise (diverged configs are chaotic and excluded)."""
    from satae.config import AETrainConfig
    from satae.data.ingest import RawDataset
    from satae.data.pipeline import make_splits
    from satae.data.synthetic import make_synthetic_eurosat
    from satae.parallel import make_grid_mesh
    from satae.train.gridsearch import ae_grid_search
    from satae.train.shard_sweep import ae_sharded_grid_search

    data_cfg = DataConfig(per_class=24, image_size=32, batch_size=32)
    imgs, labels, classes = make_synthetic_eurosat(per_class=24,
                                                   image_size=32, seed=0)
    splits = make_splits(RawDataset(imgs, labels, classes), data_cfg)
    ae_cfg = AETrainConfig(alphas=(20.0, 35.0),
                           learning_rates=(1e-3, 5e-3, 5e-1),
                           max_epochs=3, patience=2)
    seq = ae_grid_search(splits.train, splits.val, model_cfg=MODEL_CFG,
                         data_cfg=data_cfg, ae_cfg=ae_cfg, seed=0)
    shd = ae_sharded_grid_search(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=data_cfg,
        ae_cfg=ae_cfg, mesh=make_grid_mesh(4, 2), seed=0)
    assert shd.best_hparams == seq.best_hparams
    for k in seq.results:
        a = seq.results[k]["best_val_loss"]
        b = shd.results[k]["best_val_loss"]
        if np.isfinite(a) and a < 10.0:  # stable configs only
            assert b == pytest.approx(a, rel=5e-2)


def test_fit_grid_data_parallel(tmp_path):
    """api.fit(grid=True) with RuntimeConfig(n_devices=8) runs the sharded
    sweeps end to end (the path that used to raise NotImplementedError)."""
    from satae.api import SatAEPipeline
    from satae.config import (AETrainConfig, MLPTrainConfig, PipelineConfig,
                              RuntimeConfig)

    cfg = PipelineConfig(
        data=DataConfig(per_class=24, image_size=32, batch_size=32),
        model=MODEL_CFG,
        ae=AETrainConfig(alphas=(35.0,), learning_rates=(2e-3, 5e-3),
                         max_epochs=2, patience=15),
        mlp=MLPTrainConfig(learning_rates=(1e-3, 1e-2), epochs=2),
        runtime=RuntimeConfig(n_devices=8))
    pipe = SatAEPipeline(cfg)
    summary = pipe.fit(grid=True, out_dir=str(tmp_path))
    assert np.isfinite(summary.ae_val_loss)
    assert 0.0 <= summary.test_acc <= 1.0
    assert (tmp_path / "ae_global_best.msgpack").exists()
    assert (tmp_path / "mlp_global_best.msgpack").exists()


def test_fit_grid_2d_mesh(tmp_path):
    """api.fit(grid=True) with grid_dp=2 builds the 2-D config x data mesh
    (4 configs per round, each data-parallel over 2 devices)."""
    from satae.api import SatAEPipeline
    from satae.config import (AETrainConfig, MLPTrainConfig, PipelineConfig,
                              RuntimeConfig)

    cfg = PipelineConfig(
        data=DataConfig(per_class=24, image_size=32, batch_size=32),
        model=MODEL_CFG,
        ae=AETrainConfig(alphas=(35.0,), learning_rates=(2e-3, 5e-3),
                         max_epochs=2, patience=15),
        mlp=MLPTrainConfig(learning_rates=(1e-3, 1e-2), epochs=2),
        runtime=RuntimeConfig(n_devices=8, grid_dp=2))
    summary = SatAEPipeline(cfg).fit(grid=True, out_dir=str(tmp_path))
    assert np.isfinite(summary.ae_val_loss)
    assert (tmp_path / "ae_global_best.msgpack").exists()


def test_fit_single_config_data_parallel():
    """api.fit(grid=False) with n_devices uses the mesh-sharded scan-epoch
    engine end to end (dataset sharded over the mesh, grads/BN psummed)."""
    from satae.api import SatAEPipeline
    from satae.config import (AETrainConfig, MLPTrainConfig, PipelineConfig,
                              RuntimeConfig)

    cfg = PipelineConfig(
        data=DataConfig(per_class=24, image_size=32, batch_size=32),
        model=MODEL_CFG,
        ae=AETrainConfig(max_epochs=2, patience=15),
        mlp=MLPTrainConfig(epochs=2),
        runtime=RuntimeConfig(n_devices=8))
    summary = SatAEPipeline(cfg).fit(grid=False)
    assert np.isfinite(summary.ae_val_loss)
    assert 0.0 <= summary.test_acc <= 1.0


def test_mesh_sharded_encode_predict_matches_single_device():
    """Serving path: pipe.encode/predict with n_devices shard the encoder
    forward over the mesh and must match the single-device pipeline exactly,
    including a batch NOT divisible by the device count (pad+slice)."""
    from satae.api import SatAEPipeline
    from satae.config import PipelineConfig, RuntimeConfig
    from satae.models.mlp import mlp_init

    def build(n_devices):
        cfg = PipelineConfig(data=DataConfig(image_size=32, batch_size=16),
                             model=MODEL_CFG,
                             runtime=RuntimeConfig(n_devices=n_devices))
        pipe = SatAEPipeline(cfg)
        pipe.ae_params, pipe.ae_bn_state = supervised_ae_init(
            jax.random.PRNGKey(0), MODEL_CFG, image_size=32)
        pipe.mlp_params, pipe.mlp_bn_state = mlp_init(
            jax.random.PRNGKey(1), MODEL_CFG, input_dim=MODEL_CFG.latent_dim)
        return pipe

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (13, 32, 32, 3), dtype=np.uint8)  # 13 % 8 != 0
    single, sharded = build(None), build(8)
    np.testing.assert_allclose(sharded.encode(imgs), single.encode(imgs),
                               atol=1e-6)
    np.testing.assert_array_equal(sharded.predict(imgs), single.predict(imgs))
    np.testing.assert_allclose(sharded.predict_proba(imgs),
                               single.predict_proba(imgs), atol=1e-6)
    np.testing.assert_array_equal(sharded.predict_batched(imgs),
                                  single.predict(imgs))


def test_dp_multiple_steps_run():
    """Run a few sharded optimizer steps end to end (compile + execute)."""
    params, bn_state, opt_state, imgs, labels = _setup()
    mesh = make_mesh(8)
    stepN = make_dp_ae_train_step(mesh, MODEL_CFG, DATA_CFG, donate=True)
    imgs_sh, labels_sh = shard_batch(mesh, imgs, labels)
    alpha, lr = jnp.asarray(35.0), jnp.asarray(1e-3)
    losses = []
    for i in range(3):
        key = jax.random.PRNGKey(i)
        params, bn_state, opt_state, m = stepN(
            params, bn_state, opt_state, imgs_sh, labels_sh, key, alpha, lr)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch thrice -> loss must drop
