"""REAL multi-process execution (VERDICT-r4 #3): spawn 2 OS processes, let
jax.distributed.initialize() actually connect them into one 8-device CPU
cluster (Gloo collectives), run a cross-host DP train step and one
config-sharded sweep, and assert

  * both ranks compute identical results (same DP loss, same sweep winner,
    same per-config val losses),
  * user-facing artifacts are written by exactly one process (is_primary),
  * the shared checkpoint/store files exist and parse (identical-bytes
    all-process writes with pid-unique tmp names).

This is the unmocked counterpart of tests/test_distributed.py — the one
shape of multi-process bug (meshes built from jax.devices() across
processes, duplicate artifact writes, non-addressable-shard readbacks) runs
for real here. Full-suite tier only (two subprocess JAX startups + a Gloo
handshake are too slow for -m quick).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster(tmp_path):
    worker = Path(__file__).parent / "multihost_worker.py"
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "SATAE_MULTIHOST": "1",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out (cluster hang?)")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-4000:]}"

    r0 = json.loads((tmp_path / "proc0.json").read_text())
    r1 = json.loads((tmp_path / "proc1.json").read_text())

    # both ranks agree bit-for-bit on every readback (SPMD: same global
    # program, same global data)
    assert r0["winner"] == r1["winner"]
    np.testing.assert_allclose(r0["dp_loss"], r1["dp_loss"], rtol=0)
    np.testing.assert_allclose(r0["best_val_loss"], r1["best_val_loss"],
                               rtol=0)
    assert r0["results"] == r1["results"]
    assert set(r0["results"]) == {
        '{"alpha": 20.0, "lr": 0.001}', '{"alpha": 20.0, "lr": 0.005}',
        '{"alpha": 35.0, "lr": 0.001}', '{"alpha": 35.0, "lr": 0.005}'}
    assert np.isfinite(r0["dp_loss"])

    # exactly one primary-written artifact, from rank 0
    assert (tmp_path / "primary_0.txt").exists()
    assert not (tmp_path / "primary_1.txt").exists()

    # shared sweep artifacts exist, parse, and no tmp litter survived
    sweep = tmp_path / "sweep"
    assert (sweep / "ae_global_best.msgpack").exists()
    store = json.loads((sweep / "validation_losses.json").read_text())
    assert set(store) == set(r0["results"])
    assert not list(sweep.glob("*.tmp*"))
