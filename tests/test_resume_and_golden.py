"""Mid-training checkpoint/resume fidelity and a golden-trajectory
determinism regression test."""

import json
from pathlib import Path

import numpy as np
import pytest

from satae.config import DataConfig, ModelConfig
from satae.data.ingest import RawDataset
from satae.data.pipeline import make_splits
from satae.data.synthetic import make_synthetic_eurosat
from satae.train.fast_loop import train_supervised_ae_scan

MODEL_CFG = ModelConfig(latent_dim=16, encoder_channels=(4, 8, 8, 16))
DATA_CFG = DataConfig(per_class=16, image_size=32, batch_size=32)


@pytest.fixture(scope="module")
def splits():
    imgs, labels, classes = make_synthetic_eurosat(per_class=16, image_size=32,
                                                   seed=0)
    return make_splits(RawDataset(imgs, labels, classes), DATA_CFG)


def test_checkpoint_resume_matches_uninterrupted(splits, tmp_path):
    """Train 4 epochs straight vs 2 epochs -> crash -> resume for 2 more:
    identical histories and best-val selection."""
    kwargs = dict(model_cfg=MODEL_CFG, data_cfg=DATA_CFG, alpha=35.0,
                  lr=2e-3, patience=15, seed=0)
    straight = train_supervised_ae_scan(splits.train, splits.val,
                                        max_epochs=4, **kwargs)

    ckpt = str(tmp_path / "state.msgpack")
    train_supervised_ae_scan(splits.train, splits.val, max_epochs=2,
                             checkpoint_path=ckpt, checkpoint_every=1,
                             **kwargs)
    assert Path(ckpt).exists()
    resumed = train_supervised_ae_scan(splits.train, splits.val, max_epochs=4,
                                       checkpoint_path=ckpt,
                                       checkpoint_every=1, **kwargs)
    assert len(resumed.history["val_loss"]) == 4
    np.testing.assert_allclose(resumed.history["val_loss"],
                               straight.history["val_loss"], rtol=1e-5)
    assert resumed.best_epoch == straight.best_epoch
    assert resumed.best_val_loss == pytest.approx(straight.best_val_loss,
                                                  rel=1e-5)


def test_checkpoint_resume_on_mesh_matches_uninterrupted(splits, tmp_path):
    """Mesh-sharded training + mid-config resume: load_train_state returns
    host pytrees, which must be re-replicated onto the mesh before the
    sharded epoch programs consume them (regression: the resume path once
    skipped re-replication)."""
    from satae.parallel import make_mesh

    mesh = make_mesh(8)
    kwargs = dict(model_cfg=MODEL_CFG, data_cfg=DATA_CFG, alpha=35.0,
                  lr=2e-3, patience=15, seed=0, mesh=mesh)
    straight = train_supervised_ae_scan(splits.train, splits.val,
                                        max_epochs=4, **kwargs)
    ckpt = str(tmp_path / "state_mesh.msgpack")
    train_supervised_ae_scan(splits.train, splits.val, max_epochs=2,
                             checkpoint_path=ckpt, checkpoint_every=1,
                             **kwargs)
    resumed = train_supervised_ae_scan(splits.train, splits.val, max_epochs=4,
                                       checkpoint_path=ckpt,
                                       checkpoint_every=1, **kwargs)
    assert len(resumed.history["val_loss"]) == 4
    np.testing.assert_allclose(resumed.history["val_loss"],
                               straight.history["val_loss"], rtol=1e-5)
    assert resumed.best_epoch == straight.best_epoch


def test_resume_only_checkpoint_path_stays_pipelined(splits, tmp_path):
    """checkpoint_path WITHOUT checkpoint_every (resume-only) must not
    silently drop to the synchronous loop: results equal the pipelined run
    and no checkpoint is written."""
    kwargs = dict(model_cfg=MODEL_CFG, data_cfg=DATA_CFG, alpha=35.0,
                  lr=2e-3, patience=15, seed=0)
    plain = train_supervised_ae_scan(splits.train, splits.val, max_epochs=3,
                                     **kwargs)
    ckpt = tmp_path / "never_written.msgpack"
    with_path = train_supervised_ae_scan(splits.train, splits.val,
                                         max_epochs=3,
                                         checkpoint_path=str(ckpt), **kwargs)
    assert not ckpt.exists()
    np.testing.assert_allclose(with_path.history["val_loss"],
                               plain.history["val_loss"], rtol=1e-6)


def test_resume_of_stopped_run_keeps_real_epoch_count(splits, tmp_path):
    """Resuming a run whose early stopping already triggered must return the
    REAL epoch count, not max_epochs (the loop-skip sentinel)."""
    kwargs = dict(model_cfg=MODEL_CFG, data_cfg=DATA_CFG, alpha=35.0,
                  lr=0.5, patience=1, seed=0)  # divergent lr stops fast
    ckpt = str(tmp_path / "state.msgpack")
    first = train_supervised_ae_scan(splits.train, splits.val, max_epochs=30,
                                     checkpoint_path=ckpt, checkpoint_every=1,
                                     **kwargs)
    assert first.epochs_run < 30
    resumed = train_supervised_ae_scan(splits.train, splits.val,
                                       max_epochs=30, checkpoint_path=ckpt,
                                       checkpoint_every=1, **kwargs)
    assert resumed.epochs_run == first.epochs_run
    assert resumed.best_epoch == first.best_epoch


GOLDEN_FILE = Path(__file__).parent / "golden" / "ae_trajectory.json"


@pytest.mark.quick
def test_golden_training_trajectory(splits):
    """Numerics regression tripwire: a fixed-seed 3-epoch run on the CPU test
    platform must reproduce the stored loss trajectory. Regenerate with
    `python tests/regen_golden.py` after an INTENTIONAL numerics change."""
    res = train_supervised_ae_scan(
        splits.train, splits.val, model_cfg=MODEL_CFG, data_cfg=DATA_CFG,
        alpha=35.0, lr=2e-3, max_epochs=3, patience=15, seed=0)
    observed = {"train_loss": res.history["train_loss"],
                "val_loss": res.history["val_loss"]}
    if not GOLDEN_FILE.exists():
        GOLDEN_FILE.parent.mkdir(exist_ok=True)
        GOLDEN_FILE.write_text(json.dumps(observed, indent=2))
        pytest.skip("golden file created; rerun to assert against it")
    golden = json.loads(GOLDEN_FILE.read_text())
    np.testing.assert_allclose(observed["train_loss"], golden["train_loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(observed["val_loss"], golden["val_loss"],
                               rtol=1e-4)
