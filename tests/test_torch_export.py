"""Torch checkpoint export (satae.io.torch_export): the inverse migration of
test_torch_import.py. A satae-native-initialized model is exported to the
reference state_dict layout (Report.md:291-313, 365-389, 423-427,
2552-2563), loaded STRICTLY into a reference-faithful torch model, and the
torch eval-mode forward must match satae's. Also pins import(export(tree))
bit-identity, so the two converters are exact inverses."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from satae.config import ModelConfig
from satae.io.torch_export import (mlp_to_torch_state_dict, save_torch_mlp,
                                   save_torch_sae, sae_to_torch_state_dict)
from satae.io.torch_import import (load_torch_mlp, load_torch_sae,
                                   mlp_from_torch_state_dict,
                                   sae_from_torch_state_dict)
from satae.models.mlp import mlp_apply, mlp_init
from satae.models.supervised_ae import supervised_ae_apply, supervised_ae_init
from test_torch_import import CFG, IMG, _reference_sae


def _randomized_sae_trees(seed=0):
    """Native-init trees with non-trivial BN running stats (fresh stats are
    mean 0 / var 1, which would hide a mean<->var swap in the export)."""
    params, state = supervised_ae_init(jax.random.PRNGKey(seed), CFG,
                                       image_size=IMG)
    rng = np.random.default_rng(seed)
    state = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 2.0, a.shape), a.dtype), state)
    return params, state


def _reference_mlp():
    hid = CFG.mlp_hidden
    model = tnn.Module()
    model.net = tnn.Sequential(
        tnn.Linear(CFG.latent_dim, hid[0]), tnn.BatchNorm1d(hid[0]),
        tnn.ReLU(), tnn.Dropout(0.3),
        tnn.Linear(hid[0], hid[1]), tnn.BatchNorm1d(hid[1]), tnn.ReLU(),
        tnn.Linear(hid[1], CFG.num_classes))
    return model


def _tensors(sd):
    return {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}


def test_sae_export_import_roundtrip_bit_identical():
    params, state = _randomized_sae_trees()
    sd = sae_to_torch_state_dict(params, state, CFG, image_size=IMG)
    p2, s2 = sae_from_torch_state_dict(sd, CFG, image_size=IMG)
    for orig, back in ((params, p2), (state, s2)):
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), b), orig, back)


def test_sae_export_strict_load_forward_matches():
    params, state = _randomized_sae_trees(seed=1)
    sd = sae_to_torch_state_dict(params, state, CFG, image_size=IMG)
    model = _reference_sae()
    model.load_state_dict(_tensors(sd), strict=True)
    model.eval()
    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 1, (8, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        xh_t, lg_t, z_t = model(torch.tensor(imgs).permute(0, 3, 1, 2))
    (xh_j, lg_j, z_j), _ = supervised_ae_apply(
        params, state, jnp.asarray(imgs), train=False, cfg=CFG)
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lg_j), lg_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xh_j),
                               xh_t.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_mlp_export_strict_load_forward_matches_and_roundtrips():
    params, state = mlp_init(jax.random.PRNGKey(2), CFG)
    rng = np.random.default_rng(2)
    state = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 2.0, a.shape), a.dtype), state)
    sd = mlp_to_torch_state_dict(params, state, CFG)
    model = _reference_mlp()
    model.load_state_dict(_tensors(sd), strict=True)
    model.eval()
    x = rng.normal(0, 1, (8, CFG.latent_dim)).astype(np.float32)
    with torch.no_grad():
        lg_t = model.net(torch.tensor(x))
    lg_j, _ = mlp_apply(params, state, jnp.asarray(x), train=False, cfg=CFG)
    np.testing.assert_allclose(np.asarray(lg_j), lg_t.numpy(), atol=1e-5)

    p2, s2 = mlp_from_torch_state_dict(sd, CFG)
    for orig, back in ((params, p2), (state, s2)):
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), b), orig, back)


def test_export_import_roundtrip_variant_depths():
    """Converter generality: non-default depths (3 conv blocks, 3 MLP hidden
    layers) round-trip bit-identically — the index maps aren't hardcoded to
    the reference's 4/2."""
    cfg = ModelConfig(latent_dim=12, encoder_channels=(4, 8, 8),
                      head_hidden=16, mlp_hidden=(16, 8, 4))
    params, state = supervised_ae_init(jax.random.PRNGKey(9), cfg,
                                       image_size=32)
    sd = sae_to_torch_state_dict(params, state, cfg, image_size=32)
    p2, s2 = sae_from_torch_state_dict(sd, cfg, image_size=32)
    for orig, back in ((params, p2), (state, s2)):
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), b), orig, back)

    mp, ms = mlp_init(jax.random.PRNGKey(10), cfg)
    msd = mlp_to_torch_state_dict(mp, ms, cfg)
    # dropout sits only after the first hidden block: net indices 0,1 / 4,5
    # / 7,8 / 10 for three hidden layers
    assert "net.10.weight" in msd and "net.9.weight" not in msd
    mp2, ms2 = mlp_from_torch_state_dict(msd, cfg)
    for orig, back in ((mp, mp2), (ms, ms2)):
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), b), orig, back)


def test_pipeline_export_torch_cli_roundtrip(tmp_path):
    """User surface: pipe.save -> `satae export-torch` -> pipe.load_torch
    recovers bit-identical trees (default 64x64 config)."""
    from satae.api import SatAEPipeline
    from satae.cli import main

    pipe = SatAEPipeline()
    cfg = pipe.config
    pipe.ae_params, pipe.ae_bn_state = supervised_ae_init(
        jax.random.PRNGKey(7), cfg.model, image_size=cfg.data.image_size)
    pipe.mlp_params, pipe.mlp_bn_state = mlp_init(jax.random.PRNGKey(8),
                                                  cfg.model)
    out = tmp_path / "run"
    out.mkdir()
    pipe.save(str(out))
    main(["export-torch", "--out", str(out), "--dest", str(tmp_path / "pt")])
    ae_pt = tmp_path / "pt" / "AE_GLOBAL_BEST.pt"
    mlp_pt = tmp_path / "pt" / "MLP_GLOBAL_BEST.pt"
    assert ae_pt.exists() and mlp_pt.exists()

    pipe2 = SatAEPipeline().load_torch(str(ae_pt), str(mlp_pt))
    for orig, back in ((pipe.ae_params, pipe2.ae_params),
                       (pipe.ae_bn_state, pipe2.ae_bn_state),
                       (pipe.mlp_params, pipe2.mlp_params),
                       (pipe.mlp_bn_state, pipe2.mlp_bn_state)):
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)), orig, back)


def test_pt_file_save_then_reference_loaders(tmp_path):
    """save_torch_{sae,mlp} -> load_torch_{sae,mlp}: the full .pt round trip
    a user migrating in BOTH directions exercises (Report.md:714-716, 2725).
    """
    params, state = _randomized_sae_trees(seed=4)
    save_torch_sae(str(tmp_path / "AE_GLOBAL_BEST.pt"), params, state, CFG,
                   image_size=IMG)
    p2, s2 = load_torch_sae(str(tmp_path / "AE_GLOBAL_BEST.pt"), CFG,
                            image_size=IMG)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a, np.float32), b), params, p2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a, np.float32), b), state, s2)

    mp, ms = mlp_init(jax.random.PRNGKey(5), CFG)
    save_torch_mlp(str(tmp_path / "MLP_GLOBAL_BEST.pt"), mp, ms, CFG)
    mp2, ms2 = load_torch_mlp(str(tmp_path / "MLP_GLOBAL_BEST.pt"), CFG)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a, np.float32), b), mp, mp2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a, np.float32), b), ms, ms2)


def test_torch_ae_to_satae_mlp_stage(tmp_path):
    """The notebook-user migration flow: a reference AE_GLOBAL_BEST.pt (AE
    only, no MLP yet — the notebook's state after its phase-1 grid,
    Report.md:714-716) loads via load_torch(ae_pt) and fit(reuse_ae=True)
    trains the MLP stage on that frozen encoder."""
    from satae.api import SatAEPipeline
    from satae.config import (AETrainConfig, DataConfig, MLPTrainConfig,
                              PipelineConfig, RuntimeConfig)
    from satae.data.ingest import RawDataset
    from satae.data.synthetic import make_synthetic_eurosat

    cfg = PipelineConfig(
        data=DataConfig(per_class=24, image_size=IMG, batch_size=32),
        model=CFG,
        ae=AETrainConfig(alphas=(35.0,), learning_rates=(2e-3,),
                         max_epochs=2, patience=15),
        mlp=MLPTrainConfig(learning_rates=(1e-3,), epochs=2),
        runtime=RuntimeConfig(seed=0))
    params, state = _randomized_sae_trees(seed=11)
    ae_pt = tmp_path / "AE_GLOBAL_BEST.pt"
    save_torch_sae(str(ae_pt), params, state, CFG, image_size=IMG)

    imgs, labels, classes = make_synthetic_eurosat(per_class=24,
                                                   image_size=IMG, seed=0)
    raw = RawDataset(imgs, labels, classes)
    pipe = SatAEPipeline(cfg).load_torch(str(ae_pt))  # AE only
    assert pipe.mlp_params is None
    out = tmp_path / "run"
    summary = pipe.fit(raw, reuse_ae=True, out_dir=str(out))
    assert summary.ae_hparams == {"reused": True}
    assert 0.0 <= summary.test_acc <= 1.0
    # the imported encoder trees survived fit untouched (bit-identical to
    # the .pt contents)
    p2, s2 = load_torch_sae(str(ae_pt), CFG, image_size=IMG)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)),
        pipe.ae_params, p2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)),
        pipe.ae_bn_state, s2)
    # and the run dir serves end to end
    preds = SatAEPipeline(cfg).load(str(out)).predict(imgs[:6])
    assert preds.shape == (6,)
