"""Crash-resume integration: SIGKILL a grid fit mid-sweep, rerun, and the
sweep completes from the per-config store with a consistent winner.

This is the failure-detection/resume contract from SURVEY.md §5 exercised
the way it happens in production (a dead process, not a polite exception):
the GridResultStore's atomic per-config flushes plus the global-best
checkpoint must leave the out_dir resumable at any kill point.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

_CHILD = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
from satae.api import SatAEPipeline
from satae.config import (AETrainConfig, DataConfig, MLPTrainConfig,
                          ModelConfig, PipelineConfig)

cfg = PipelineConfig(
    data=DataConfig(per_class=24, image_size=32, batch_size=32),
    model=ModelConfig(latent_dim=8, encoder_channels=(4, 4, 8, 8),
                      mlp_hidden=(16, 8)),
    ae=AETrainConfig(alphas=(20.0, 35.0), learning_rates=(1e-3, 2e-3),
                     max_epochs=2, patience=15),
    mlp=MLPTrainConfig(learning_rates=(1e-3,), epochs=1),
)
summary = SatAEPipeline(cfg).fit(
    grid=True, out_dir=sys.argv[1],
    log=lambda s: print(s, flush=True))
print("FIT_DONE", summary.ae_hparams, flush=True)
"""


def test_sigkill_mid_sweep_then_resume(tmp_path):
    out = tmp_path / "run"
    env = dict(os.environ)
    # the child provisions its own CPU platform; keep it single-device
    env.pop("XLA_FLAGS", None)

    # run 1: kill as soon as the first config result hits the store
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD, str(out)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=str(Path(__file__).resolve().parent.parent))
    store_file = out / "validation_losses.json"
    deadline = time.time() + 420
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — resume still validated
        if store_file.exists() and store_file.stat().st_size > 2:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            killed = True
            break
        time.sleep(0.5)
    else:
        proc.kill()
        pytest.fail("child never wrote a grid result")

    if killed:
        n_before = len(json.loads(store_file.read_text()))
        assert 1 <= n_before <= 4

    # run 2: must complete, skipping everything the dead run recorded
    out2 = subprocess.run(
        [sys.executable, "-c", _CHILD, str(out)],
        capture_output=True, text=True, env=env, timeout=420,
        cwd=str(Path(__file__).resolve().parent.parent))
    assert out2.returncode == 0, out2.stdout + out2.stderr
    assert "FIT_DONE" in out2.stdout
    if killed and n_before:
        assert "skip cached" in out2.stdout

    # artifacts complete and consistent: all 4 configs recorded, winner
    # checkpoint loadable, meta's metric matches the store's best entry
    results = json.loads(store_file.read_text())
    assert len(results) == 4
    meta = json.loads((out / "ae_global_best.json").read_text())
    best_in_store = min(float(r["best_val_loss"]) for r in results.values())
    assert float(meta["best_val_loss"]) == pytest.approx(best_in_store)
    assert (out / "ae_global_best.msgpack").exists()
    assert (out / "mlp_global_best.msgpack").exists()


_CHILD_MIDCFG = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
from satae.config import AETrainConfig, DataConfig, ModelConfig
from satae.data.ingest import RawDataset
from satae.data.pipeline import make_splits
from satae.data.synthetic import make_synthetic_eurosat
from satae.train.gridsearch import ae_grid_search

data_cfg = DataConfig(per_class=24, image_size=32, batch_size=32)
imgs, labels, classes = make_synthetic_eurosat(per_class=24, image_size=32,
                                               seed=0)
splits = make_splits(RawDataset(imgs, labels, classes), data_cfg)
ae_cfg = AETrainConfig(alphas=(35.0,), learning_rates=(2e-3,),
                       max_epochs=40, patience=100, checkpoint_every=2)
sweep = ae_grid_search(
    splits.train, splits.val,
    model_cfg=ModelConfig(latent_dim=8, encoder_channels=(4, 4, 8, 8)),
    data_cfg=data_cfg, ae_cfg=ae_cfg, seed=0, out_dir=sys.argv[1],
    log=lambda s: print(s, flush=True))
print("SWEEP_DONE", repr(sweep.best.best_val_loss), flush=True)
"""


def _run_midcfg(out, env, **popen_kw):
    return subprocess.Popen(
        [sys.executable, "-c", _CHILD_MIDCFG, str(out)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=str(Path(__file__).resolve().parent.parent), **popen_kw)


def test_sigkill_mid_config_resumes_within_k_epochs(tmp_path):
    """VERDICT r2 #4: with AETrainConfig.checkpoint_every=k, a SIGKILL in the
    MIDDLE of a config's training resumes from the in-flight state — at most
    ~k epochs retrained, and the completed sweep's result equals an
    uninterrupted run's bit-for-bit (resume restores params+opt+history
    exactly; the epoch order/keys are functions of (seed, epoch))."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)

    # reference: uninterrupted run
    ref = _run_midcfg(tmp_path / "ref", env)
    ref_out, _ = ref.communicate(timeout=420)
    assert ref.returncode == 0, ref_out
    ref_loss = float(ref_out.split("SWEEP_DONE")[1].strip())

    # run 1: kill once the in-flight state records epoch >= 5
    out = tmp_path / "run"
    state_file = out / "inflight" / "ae_a35_lr0.002.state.json"
    proc = _run_midcfg(out, env)
    deadline = time.time() + 420
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break
        try:
            epoch = json.loads(state_file.read_text()).get("epoch", -1)
        except (FileNotFoundError, json.JSONDecodeError):
            epoch = -1
        if epoch >= 5:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            killed = True
            break
        time.sleep(0.05)
    assert killed or proc.returncode == 0, "child neither progressed nor died"

    # run 2: resumes mid-config and completes
    proc2 = _run_midcfg(out, env)
    out2, _ = proc2.communicate(timeout=420)
    assert proc2.returncode == 0, out2
    assert "SWEEP_DONE" in out2
    if killed:
        # resumed at the flushed epoch + 1 => at most (kill_epoch - flushed)
        # <= k epochs retrained before the kill point
        resumed = [ln for ln in out2.splitlines() if "resumed from" in ln]
        assert resumed, out2
        start_epoch = int(resumed[0].rsplit("epoch", 1)[1])
        assert start_epoch >= 6
        # per-epoch log lines = epochs actually retrained
        retrained = sum(1 for ln in out2.splitlines()
                        if ln.startswith("epoch "))
        assert retrained <= 40 - start_epoch + 1
    loss2 = float(out2.split("SWEEP_DONE")[1].strip())
    assert loss2 == pytest.approx(ref_loss, rel=1e-6)
    # in-flight state is cleaned up once the config is durably recorded
    if (out / "inflight").exists():
        assert not list((out / "inflight").glob("*"))


def test_single_config_inflight_survives_post_ae_crash(tmp_path, monkeypatch):
    """The single-config fit must keep the in-flight AE resume state until
    the winner checkpoint is durably written at fit end — a crash during the
    extract/mlp stages must NOT lose the trained AE (review finding r3: an
    early cleanup reopened exactly that window)."""
    from satae.api import SatAEPipeline
    from satae.config import (AETrainConfig, DataConfig, MLPTrainConfig,
                              ModelConfig, PipelineConfig)
    from satae.data.ingest import RawDataset
    from satae.data.synthetic import make_synthetic_eurosat

    cfg = PipelineConfig(
        data=DataConfig(per_class=24, image_size=32, batch_size=32),
        model=ModelConfig(latent_dim=8, encoder_channels=(4, 4, 8, 8),
                          mlp_hidden=(16, 8)),
        ae=AETrainConfig(max_epochs=4, patience=15, checkpoint_every=2),
        mlp=MLPTrainConfig(learning_rates=(1e-3,), epochs=1),
    )
    imgs, labels, classes = make_synthetic_eurosat(per_class=24,
                                                   image_size=32, seed=0)
    raw = RawDataset(imgs, labels, classes)
    out = tmp_path / "run"
    inflight = out / "inflight" / "ae_single.msgpack"

    # crash after the AE stage: extraction raises
    import satae.api as api_mod

    def boom(*a, **k):
        raise RuntimeError("injected extract crash")

    monkeypatch.setattr(api_mod, "extract_features", boom)
    with pytest.raises(RuntimeError, match="injected extract crash"):
        SatAEPipeline(cfg).fit(raw, grid=False, out_dir=str(out))
    # the trained AE's resume state must still be on disk
    assert inflight.exists() and \
        inflight.with_suffix(".state.json").exists()

    # rerun without the injection: resumes the AE (no full retrain) and
    # completes; only then is the in-flight state dropped
    monkeypatch.undo()
    logs = []
    summary = SatAEPipeline(cfg).fit(raw, grid=False, out_dir=str(out),
                                     log=logs.append)
    assert any("resumed from" in str(m) for m in logs)
    assert 0.0 <= summary.test_acc <= 1.0
    assert not inflight.exists()
    assert (out / "ae_global_best.msgpack").exists()
