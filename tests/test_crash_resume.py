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
