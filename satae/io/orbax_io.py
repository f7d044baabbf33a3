"""Optional Orbax checkpoint backend (directory-based, async-capable).

The default satae format is single-file msgpack (satae.io.checkpoint) —
simple, host-portable, adequate for this model scale. Orbax is the
TPU-ecosystem standard for large sharded checkpoints; this adapter exposes
the same save/load contract on an Orbax PyTreeCheckpointer so users already
standardized on Orbax trees can point their tooling at satae runs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax


def save_model_orbax(path: str | Path, params: Any, bn_state: Any,
                     meta: Optional[Dict[str, Any]] = None) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    blob = {"params": jax.device_get(params),
            "bn_state": jax.device_get(bn_state)}
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, blob, force=True)
    if meta is not None:
        from satae.io.checkpoint import dump_strict_json

        (path.parent / (path.name + ".meta.json")).write_text(
            dump_strict_json(meta, indent=2))


def load_model_orbax(path: str | Path, params_like: Any, bn_state_like: Any):
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    template = {"params": jax.device_get(params_like),
                "bn_state": jax.device_get(bn_state_like)}
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            blob = ckptr.restore(path, item=template)
        except TypeError:  # newer orbax API
            blob = ckptr.restore(path, args=ocp.args.PyTreeRestore(template))
    return blob["params"], blob["bn_state"]
