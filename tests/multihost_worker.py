"""Subprocess body for tests/test_multihost_real.py: one rank of a REAL
2-process JAX cluster on localhost CPU (no mocks — jax.distributed.initialize
actually runs, collectives go over Gloo).

Launched with argv = (out_dir,) and env set by the parent test:
SATAE_MULTIHOST=1, JAX_COORDINATOR_ADDRESS=localhost:<port>,
JAX_NUM_PROCESSES=2, JAX_PROCESS_ID=<0|1>. Each rank contributes 4 virtual
CPU devices -> an 8-device global mesh spanning both processes.

Exercises the two multi-process surfaces satae owns (SURVEY.md §5
distributed-backend row): a data-parallel AE train step whose batch is
sharded ACROSS hosts (gradient/BN psums cross the process boundary), and one
config-sharded sweep (per-config metrics + the winner checkpoint must be
gathered from non-addressable devices). Writes proc<i>.json with every
numeric result so the parent can assert both ranks agree, and a
primary_<i>.txt marker only from the is_primary() rank.
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    out_dir = Path(sys.argv[1])

    # Platform override must precede any backend touch (the container's
    # sitecustomize pins JAX_PLATFORMS to the TPU backend — same dance as
    # tests/conftest.py). Replace, don't append: the parent pytest process
    # exports its own 8-device force flag in XLA_FLAGS.
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from satae.parallel import distributed

    # Env-driven opt-in: this is the exact production entry (fit() calls the
    # same gate) — unmocked.
    assert distributed.maybe_initialize() is True
    info = distributed.process_info()
    assert info["process_count"] == 2, info
    assert info["global_device_count"] == 8, info
    assert info["local_device_count"] == 4, info

    import jax.numpy as jnp
    import numpy as np

    from satae.config import AETrainConfig, DataConfig, ModelConfig
    from satae.data.ingest import RawDataset
    from satae.data.pipeline import make_splits
    from satae.data.synthetic import make_synthetic_eurosat
    from satae.models.supervised_ae import supervised_ae_init
    from satae.parallel import make_mesh, shard_batch
    from satae.parallel.dp import make_dp_ae_train_step
    from satae.train.optim import adam_init
    from satae.train.shard_sweep import ae_sharded_grid_search

    model_cfg = ModelConfig(latent_dim=16, encoder_channels=(4, 8, 8, 16))
    data_cfg = DataConfig(per_class=12, image_size=32, batch_size=16)
    mesh = make_mesh()  # all 8 devices, 4 per process

    # --- DP train step: batch sharded across the process boundary ---------
    params, bn = supervised_ae_init(jax.random.PRNGKey(0), model_cfg,
                                    image_size=32)
    opt = adam_init(params)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (16, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, 16).astype(np.int32)
    step = make_dp_ae_train_step(mesh, model_cfg, data_cfg, donate=False)
    imgs_sh, labels_sh = shard_batch(mesh, imgs, labels)
    _, _, _, metrics = step(params, bn, opt, imgs_sh, labels_sh,
                            jax.random.PRNGKey(7), jnp.asarray(35.0),
                            jnp.asarray(1e-3))
    dp_loss = float(jax.device_get(metrics["loss"]))  # replicated output

    # --- config-sharded sweep: 4 configs padded onto the 8-device mesh ----
    imgs_s, labels_s, classes = make_synthetic_eurosat(
        per_class=12, image_size=32, seed=0)
    splits = make_splits(RawDataset(imgs_s, labels_s, classes), data_cfg)
    ae_cfg = AETrainConfig(alphas=(20.0, 35.0), learning_rates=(1e-3, 5e-3),
                           max_epochs=2, patience=2)
    res = ae_sharded_grid_search(
        splits.train, splits.val, model_cfg=model_cfg, data_cfg=data_cfg,
        ae_cfg=ae_cfg, mesh=mesh, seed=0, out_dir=str(out_dir / "sweep"))

    # user-facing artifacts are primary-only; checkpoint/store writes above
    # were all-process with identical bytes (last rename wins)
    if distributed.is_primary():
        (out_dir / f"primary_{info['process_index']}.txt").write_text(
            "primary-only artifact")

    (out_dir / f"proc{info['process_index']}.json").write_text(json.dumps({
        "dp_loss": dp_loss,
        "winner": res.best_hparams,
        "best_val_loss": res.best.best_val_loss,
        "results": res.results,
    }, sort_keys=True))


if __name__ == "__main__":
    main()
