"""Multi-host (multi-process) runtime initialization.

The mesh layer (satae.parallel.mesh) is device-list-driven: every mesh is
built from ``jax.devices()``, so the same sweep/DP/serving code spans hosts
the moment the JAX runtime is initialized for multi-process execution. This
module wires that entry point: an explicit, idempotent, opt-in gate around
``jax.distributed.initialize()``.

Opt-in only (``RuntimeConfig.multihost`` / ``satae fit --multihost`` /
``SATAE_MULTIHOST=1``): calling ``jax.distributed.initialize()`` on a plain
single-process run would try to reach a coordinator and hang, so it must
never be implicit. With no explicit coordinator arguments JAX auto-detects
the cluster environment (Cloud TPU pod metadata, GKE, SLURM, Open MPI);
non-auto-detectable setups pass coordinator/process env vars:
JAX_COORDINATOR_ADDRESS is read natively by jax.distributed.initialize;
JAX_NUM_PROCESSES and JAX_PROCESS_ID are NOT (jax 0.9 only auto-detects
Slurm/MPI/TPU-pod clusters), so :func:`maybe_initialize` forwards them
explicitly — the combination is exercised for real by
tests/test_multihost_real.py on a 2-process localhost CPU cluster.

Topology note (scaling-book mental model): after initialization,
``jax.devices()`` enumerates every chip in the slice; a 1-D "data" mesh over
it keeps each gradient/BN psum riding ICI within the slice. Only meshes that
place a partitioned axis ACROSS slices (not built here) would put
collectives on DCN — the data-parallel and config-sharded meshes satae
builds stay ICI-resident on any single slice. Host-side stages are already
multi-process-safe by construction: every process computes identical
results from identical seeds (synthetic gen, splits, grid bookkeeping), and
checkpoint writes are atomic (tmp+rename), so the last writer wins with
identical bytes.

The reference is single-process torch with no distributed path
(SURVEY.md §2 parallelism) — this subsystem has no counterpart to cite.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def multihost_requested(flag: Optional[bool] = None) -> bool:
    """True when multi-host init is explicitly requested via the config flag
    or the SATAE_MULTIHOST environment variable ("1"/"true"/"yes")."""
    if flag:
        return True
    return os.environ.get("SATAE_MULTIHOST", "").lower() in ("1", "true",
                                                             "yes")


def maybe_initialize(flag: Optional[bool] = None) -> bool:
    """Initialize the multi-process JAX runtime if (and only if) requested.

    Idempotent: repeated calls (e.g. fit() after the CLI already
    initialized) are no-ops. Returns True when the process is running
    multi-host after the call, False for the unchanged single-process
    default. Must run before the first jax.devices()/backend touch to take
    effect; JAX raises otherwise, and that error propagates (a half-wired
    multi-host run should fail loudly, not degrade to 1/N of the data).
    """
    global _initialized
    if not multihost_requested(flag):
        return _initialized
    if _initialized:
        return True
    import jax

    # jax.distributed.initialize() reads JAX_COORDINATOR_ADDRESS itself but
    # has no env-var path for the process topology outside managed clusters
    # (Slurm/MPI/TPU pods) — forward it so plain-subprocess launches work.
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def process_info() -> dict:
    """Process/device accounting for logs: {process_index, process_count,
    local_device_count, global_device_count}."""
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def is_primary() -> bool:
    """True on the process that should write user-facing artifacts (plots,
    reports) when duplicate writes are undesirable; checkpoint/store writes
    stay all-process (atomic, identical bytes)."""
    import jax

    return jax.process_index() == 0
