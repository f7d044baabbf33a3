"""Device mesh + sharding helpers (the TPU-native parallelism layer).

The reference has no distributed anything (SURVEY.md §2 parallelism
accounting); the TPU-native equivalent owed is batch-sharded data parallelism
over a 1-D ``jax.sharding.Mesh``: params/optimizer state replicated, batches
sharded on axis 0, gradients and BatchNorm batch statistics reduced by the
XLA collectives pjit inserts over ICI (psum; latent extraction all-gathers on
the host gather). The same mesh code spans hosts over DCN unchanged if
``jax.devices()`` does.

No NCCL/MPI analogue is written by hand — that is the point of the design
(SURVEY.md §5 "Distributed communication backend").
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_grid_mesh(n_config: int, n_data: int = 1,
                   config_axis: str = "config",
                   data_axis: str = "data") -> Mesh:
    """2-D (config x data) mesh for data-parallel grid sweeps: ``n_config``
    grid configs per round, each trained data-parallel over ``n_data``
    devices. Lay the DATA axis innermost so each config's gradient/BN
    collectives ride neighboring-device ICI links, not the long way around
    the torus."""
    need = n_config * n_data
    devices = jax.devices()
    if need > len(devices):
        raise ValueError(f"requested {need} devices "
                         f"({n_config} config x {n_data} data), "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_config, n_data)
    return Mesh(grid, (config_axis, data_axis))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard axis 0 over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays: Any, axis: str = "data"):
    """device_put host batches with axis-0 sharding (one H2D per shard)."""
    out = tuple(
        jax.device_put(a, batch_sharding(mesh, np.ndim(a), axis))
        for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
