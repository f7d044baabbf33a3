"""Torch checkpoint import (satae.io.torch_import): a reference-faithful
torch model (the notebook's exact nn.Sequential layouts, incl. its NCHW
flatten order — Report.md:291-313, 365-389, 423-427, 2552-2563) is
randomized, its state_dict imported, and the satae eval-mode forward must
match the torch forward. This pins every layout conversion: conv OIHW->HWIO,
deconv flip+transpose, linear transposes, the CHW->HWC flatten permutations
at both projection boundaries, and BN running-stat wiring."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from satae.config import ModelConfig
from satae.io.torch_import import (load_torch_mlp, load_torch_sae,
                                   mlp_from_torch_state_dict,
                                   sae_from_torch_state_dict)
from satae.models.mlp import mlp_apply
from satae.models.supervised_ae import supervised_ae_apply

CFG = ModelConfig(latent_dim=16, encoder_channels=(4, 8, 8, 16),
                  head_hidden=32, mlp_hidden=(24, 12))
IMG = 32

torch.manual_seed(0)


def _reference_sae():
    """The notebook's SupervisedAutoencoder verbatim in structure (generic
    channels), producing its exact state_dict key layout."""
    chans = (3,) + CFG.encoder_channels
    enc_layers = []
    for i in range(4):
        enc_layers += [tnn.Conv2d(chans[i], chans[i + 1], 3, 2, 1),
                       tnn.BatchNorm2d(chans[i + 1]), tnn.ReLU()]
    spatial = IMG // 16
    enc_layers += [tnn.Flatten(),
                   tnn.Linear(chans[-1] * spatial * spatial, CFG.latent_dim)]

    rev = tuple(reversed(CFG.encoder_channels)) + (3,)
    dec_layers = [tnn.Unflatten(1, (rev[0], spatial, spatial))]
    for i in range(4):
        dec_layers.append(tnn.ConvTranspose2d(rev[i], rev[i + 1], 3, 2, 1, 1))
        if i < 3:
            dec_layers += [tnn.BatchNorm2d(rev[i + 1]), tnn.ReLU()]
    dec_layers.append(tnn.Sigmoid())

    class Dec(tnn.Module):
        def __init__(s):
            super().__init__()
            s.decoder_input = tnn.Linear(CFG.latent_dim,
                                         rev[0] * spatial * spatial)
            s.decoder = tnn.Sequential(*dec_layers)

        def forward(s, z):
            return s.decoder(s.decoder_input(z))

    class SAE(tnn.Module):
        def __init__(s):
            super().__init__()
            s.enc = tnn.Module()
            s.enc.encoder = tnn.Sequential(*enc_layers)
            s.dec = Dec()
            s.classifier = tnn.Sequential(
                tnn.Linear(CFG.latent_dim, CFG.head_hidden), tnn.ReLU(),
                tnn.Linear(CFG.head_hidden, CFG.num_classes))

        def forward(s, x):
            z = s.enc.encoder(x)
            return s.dec(z), s.classifier(z), z

    return SAE()


def _randomize_bn_stats(model):
    """Non-trivial running stats so the import of BN state is actually
    exercised (fresh BNs have mean 0 / var 1, which would hide a bug)."""
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)


def test_sae_import_forward_matches():
    model = _reference_sae().eval()
    _randomize_bn_stats(model)
    params, state = sae_from_torch_state_dict(model.state_dict(), CFG,
                                              image_size=IMG)
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (8, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        xh_t, lg_t, z_t = model(torch.tensor(imgs).permute(0, 3, 1, 2))
    (xh_j, lg_j, z_j), _ = supervised_ae_apply(
        params, state, jnp.asarray(imgs), train=False, cfg=CFG)
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lg_j), lg_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xh_j),
                               xh_t.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_mlp_import_forward_matches():
    hid = CFG.mlp_hidden
    model = tnn.Module()
    model.net = tnn.Sequential(
        tnn.Linear(CFG.latent_dim, hid[0]), tnn.BatchNorm1d(hid[0]),
        tnn.ReLU(), tnn.Dropout(0.3),
        tnn.Linear(hid[0], hid[1]), tnn.BatchNorm1d(hid[1]), tnn.ReLU(),
        tnn.Linear(hid[1], CFG.num_classes))
    model.eval()
    _randomize_bn_stats(model)
    params, state = mlp_from_torch_state_dict(model.state_dict(), CFG)
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (8, CFG.latent_dim)).astype(np.float32)
    with torch.no_grad():
        lg_t = model.net(torch.tensor(x))
    lg_j, _ = mlp_apply(params, state, jnp.asarray(x), train=False, cfg=CFG)
    np.testing.assert_allclose(np.asarray(lg_j), lg_t.numpy(), atol=1e-5)


def test_pt_file_roundtrip(tmp_path):
    """torch.save(state_dict) -> load_torch_{sae,mlp} (the user-facing .pt
    migration path, Report.md:714-716, 2725)."""
    model = _reference_sae().eval()
    torch.save(model.state_dict(), tmp_path / "AE_GLOBAL_BEST.pt")
    params, state = load_torch_sae(str(tmp_path / "AE_GLOBAL_BEST.pt"), CFG,
                                   image_size=IMG)
    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 1, (4, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        _, lg_t, _ = model(torch.tensor(imgs).permute(0, 3, 1, 2))
    (_, lg_j, _), _ = supervised_ae_apply(params, state, jnp.asarray(imgs),
                                          train=False, cfg=CFG)
    np.testing.assert_allclose(np.asarray(lg_j), lg_t.numpy(), atol=1e-5)

    hid = CFG.mlp_hidden
    mlp = tnn.Module()
    mlp.net = tnn.Sequential(
        tnn.Linear(CFG.latent_dim, hid[0]), tnn.BatchNorm1d(hid[0]),
        tnn.ReLU(), tnn.Dropout(0.3),
        tnn.Linear(hid[0], hid[1]), tnn.BatchNorm1d(hid[1]), tnn.ReLU(),
        tnn.Linear(hid[1], CFG.num_classes))
    torch.save(mlp.state_dict(), tmp_path / "MLP_GLOBAL_BEST.pt")
    p2, s2 = load_torch_mlp(str(tmp_path / "MLP_GLOBAL_BEST.pt"), CFG)
    assert p2["fc0"]["w"].shape == (CFG.latent_dim, hid[0])
    assert s2["bn1"]["mean"].shape == (hid[1],)
