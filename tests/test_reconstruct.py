"""Decoder serving surface: decode / reconstruct / reconstruct_batched.

The reference model's forward returns (x_hat, logits, z) (Report.md:429-433);
x_hat — the reconstruction — is served here standalone. These tests pin the
serving path to the model forward, the mesh path to the single-device path,
and the CLI artifact surface."""

from pathlib import Path

import jax
import numpy as np
import pytest

from satae.api import SatAEPipeline
from satae.config import (AETrainConfig, DataConfig, MLPTrainConfig,
                          ModelConfig, PipelineConfig, RuntimeConfig)
from satae.data.synthetic import make_synthetic_eurosat
from satae.models.mlp import mlp_init
from satae.models.supervised_ae import supervised_ae_init

TINY = PipelineConfig(
    data=DataConfig(per_class=24, image_size=32, batch_size=32),
    model=ModelConfig(latent_dim=16, encoder_channels=(4, 8, 16, 16),
                      mlp_hidden=(32, 16)),
    ae=AETrainConfig(alphas=(35.0,), learning_rates=(2e-3,), max_epochs=2,
                     patience=15),
    mlp=MLPTrainConfig(learning_rates=(1e-3,), epochs=2),
    runtime=RuntimeConfig(seed=0),
)


def _fresh_pipe(cfg=TINY, seed=0):
    pipe = SatAEPipeline(cfg)
    pipe.ae_params, pipe.ae_bn_state = supervised_ae_init(
        jax.random.PRNGKey(seed), cfg.model, image_size=cfg.data.image_size)
    pipe.mlp_params, pipe.mlp_bn_state = mlp_init(jax.random.PRNGKey(seed),
                                                  cfg.model)
    return pipe


@pytest.fixture(scope="module")
def imgs():
    images, _, _ = make_synthetic_eurosat(per_class=4, image_size=32, seed=0)
    return images[:10]


def test_reconstruct_shape_range_and_decode_identity(imgs):
    pipe = _fresh_pipe()
    x_hat = pipe.reconstruct(imgs)
    assert x_hat.shape == (10, 32, 32, 3) and x_hat.dtype == np.float32
    assert x_hat.min() >= 0.0 and x_hat.max() <= 1.0  # decoder ends in sigmoid

    # reconstruct == decode(encode(x)): the chained path and the two-stage
    # public path are the same program pair
    z = pipe.encode(imgs)
    np.testing.assert_allclose(pipe.decode(z), x_hat, atol=1e-6)

    # bulk path matches
    np.testing.assert_allclose(pipe.reconstruct_batched(imgs), x_hat,
                               atol=1e-6)

    # defined for empty input
    assert pipe.reconstruct(imgs[:0]).shape == (0, 32, 32, 3)
    assert pipe.reconstruct_batched(imgs[:0]).shape == (0, 32, 32, 3)
    assert pipe.decode(z[:0]).shape == (0, 32, 32, 3)


def test_reconstruct_matches_model_forward(imgs):
    """Serving x_hat == the eval-mode supervised_ae_apply forward the train
    loop evaluates with (same normalize, same BN running stats)."""
    from satae.data.augment import normalize
    from satae.models.supervised_ae import supervised_ae_apply

    pipe = _fresh_pipe()
    x = normalize(jax.numpy.asarray(imgs), jax.numpy.float32)
    (x_hat_ref, _, _), _ = supervised_ae_apply(
        pipe.ae_params, pipe.ae_bn_state, x, train=False, cfg=TINY.model)
    np.testing.assert_allclose(pipe.reconstruct(imgs),
                               np.asarray(x_hat_ref), atol=1e-6)


def test_decode_rejects_bad_latents(imgs):
    pipe = _fresh_pipe()
    with pytest.raises(ValueError, match="latents"):
        pipe.decode(np.zeros((4, TINY.model.latent_dim + 1), np.float32))
    with pytest.raises(ValueError, match="latents"):
        pipe.decode(np.zeros((TINY.model.latent_dim,), np.float32))


def test_reconstruct_sees_reassigned_params(imgs):
    """The pre-cast decoder tree cache must refresh when ae_params are
    reassigned (same contract as encode's cache)."""
    pipe = _fresh_pipe(seed=0)
    r0 = pipe.reconstruct(imgs)
    pipe.ae_params, pipe.ae_bn_state = supervised_ae_init(
        jax.random.PRNGKey(1), TINY.model, image_size=TINY.data.image_size)
    r1 = pipe.reconstruct(imgs)
    assert not np.allclose(r0, r1), "reassigned decoder weights ignored"
    fresh = _fresh_pipe(seed=1)
    np.testing.assert_allclose(r1, fresh.reconstruct(imgs), atol=1e-6)


def test_mesh_reconstruct_matches_single_device(imgs):
    """n_devices=8 decode/reconstruct (batch-sharded, padded off-multiple
    input) is numerics-identical to the single-device path."""
    import dataclasses

    mesh_cfg = dataclasses.replace(
        TINY, runtime=RuntimeConfig(seed=0, n_devices=8))
    single = _fresh_pipe(TINY)
    sharded = _fresh_pipe(mesh_cfg)
    sharded.ae_params, sharded.ae_bn_state = (single.ae_params,
                                              single.ae_bn_state)
    n = 9  # deliberately not a multiple of 8
    np.testing.assert_allclose(sharded.reconstruct(imgs[:n]),
                               single.reconstruct(imgs[:n]), atol=1e-6)
    z = single.encode(imgs[:n])
    np.testing.assert_allclose(sharded.decode(z), single.decode(z),
                               atol=1e-6)


def test_bf16_reconstruct_runs(imgs):
    import dataclasses

    cfg = dataclasses.replace(TINY, runtime=RuntimeConfig(
        seed=0, compute_dtype="bfloat16"))
    x_hat = _fresh_pipe(cfg).reconstruct(imgs)
    assert x_hat.dtype == np.float32
    assert x_hat.min() >= 0.0 and x_hat.max() <= 1.0


def test_cli_reconstruct(tmp_path):
    """`satae reconstruct --images DIR`: per-image PNGs, grid figure, and
    the reconstruction-MSE CSV."""
    import csv

    from PIL import Image

    from satae.cli import main

    pipe = _fresh_pipe(PipelineConfig())  # default 64x64 model, untrained
    out = tmp_path / "run"
    out.mkdir()
    pipe.save(str(out))

    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
                        ).save(imgdir / f"img{i}.png")

    main(["reconstruct", "--out", str(out), "--images", str(imgdir)])
    dest = out / "reconstructions"
    for i in range(3):
        assert (dest / f"img{i}_recon.png").exists()
    assert (dest / "reconstruction_grid.png").exists()
    with open(dest / "reconstruction_mse.csv", newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["path", "recon_path", "mse"]
    assert len(rows) == 4
    for _, rp, e in rows[1:]:
        assert Path(rp).exists()  # CSV rows point at real recon files
        assert 0.0 <= float(e) <= 1.0

    # class-tree input: same-named files in different subdirs must yield
    # DISTINCT reconstruction PNGs (source layout mirrored under dest —
    # flattened names would collide for A_B/c vs A/B_c)
    tree = tmp_path / "tree"
    for cls in ("ClassA", "ClassB", "ClassA_img"):
        (tree / cls).mkdir(parents=True)
        Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
                        ).save(tree / cls / "img.png")
    # plus a same-stem different-extension sibling (img.jpg next to img.png)
    Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
                    ).save(tree / "ClassA" / "img.jpg")
    main(["reconstruct", "--out", str(out), "--images", str(tree),
          "--dest", str(tmp_path / "treedest")])
    assert (tmp_path / "treedest" / "ClassA" / "img_recon.png").exists()
    assert (tmp_path / "treedest" / "ClassA" / "img.png_recon.png").exists()
    assert (tmp_path / "treedest" / "ClassB" / "img_recon.png").exists()
    assert (tmp_path / "treedest" / "ClassA_img" / "img_recon.png").exists()
