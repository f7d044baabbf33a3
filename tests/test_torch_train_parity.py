"""Cross-framework train-step parity: the satae supervised-AE forward, joint
loss, and gradients must match a torch replica of the reference architecture
given identical weights and an identical batch.

This is the strongest accuracy-parity evidence available without the real
EuroSAT data (tests/test_parity_eurosat.py): if the training-mode forward
(including BatchNorm batch statistics), the alpha*MSE+CE loss, and the
backward pass agree with PyTorch's implementation to float tolerance, the
published 74.73% transfers up to data/seed stochasticity (SURVEY.md §7
"BatchNorm under jit" is called out as the classic silent gap — this test
pins it).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from satae.config import ModelConfig
from satae.models.supervised_ae import supervised_ae_apply, supervised_ae_init
from satae.train.losses import joint_ae_loss

torch.manual_seed(0)
CFG = ModelConfig(latent_dim=16, encoder_channels=(4, 8, 8, 16),
                  head_hidden=32)
IMG = 32
ALPHA = 35.0


def _build_torch_model():
    class Enc(tnn.Module):
        def __init__(s):
            super().__init__()
            chans = (3,) + CFG.encoder_channels
            s.convs = tnn.ModuleList(
                [tnn.Conv2d(chans[i], chans[i + 1], 3, 2, 1) for i in range(4)])
            s.bns = tnn.ModuleList(
                [tnn.BatchNorm2d(c) for c in CFG.encoder_channels])
            spatial = IMG // 16
            s.fc = tnn.Linear(CFG.encoder_channels[-1] * spatial * spatial,
                              CFG.latent_dim)

        def forward(s, x):
            for conv, bn in zip(s.convs, s.bns):
                x = torch.relu(bn(conv(x)))
            # match satae's NHWC flatten order: NCHW -> NHWC -> flat
            x = x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)
            return s.fc(x)

    class Dec(tnn.Module):
        def __init__(s):
            super().__init__()
            rev = tuple(reversed(CFG.encoder_channels)) + (3,)
            spatial = IMG // 16
            s.spatial = spatial
            s.fc = tnn.Linear(CFG.latent_dim, rev[0] * spatial * spatial)
            s.deconvs = tnn.ModuleList(
                [tnn.ConvTranspose2d(rev[i], rev[i + 1], 3, 2, 1, 1)
                 for i in range(4)])
            s.bns = tnn.ModuleList([tnn.BatchNorm2d(c) for c in rev[1:4]])

        def forward(s, z):
            x = s.fc(z)
            # satae reshapes to (N, H, W, C): mirror it then go NCHW
            x = x.reshape(-1, s.spatial, s.spatial,
                          tuple(reversed(CFG.encoder_channels))[0])
            x = x.permute(0, 3, 1, 2)
            for i, dc in enumerate(s.deconvs):
                x = dc(x)
                if i < 3:
                    x = torch.relu(s.bns[i](x))
            return torch.sigmoid(x)

    class SAE(tnn.Module):
        def __init__(s):
            super().__init__()
            s.enc, s.dec = Enc(), Dec()
            s.h1 = tnn.Linear(CFG.latent_dim, CFG.head_hidden)
            s.h2 = tnn.Linear(CFG.head_hidden, CFG.num_classes)

        def forward(s, x):
            z = s.enc(x)
            return s.dec(z), s.h2(torch.relu(s.h1(z))), z

    return SAE()


def _copy_params_to_torch(params, model):
    """Install satae params into the torch replica (layout conversions:
    conv HWIO->OIHW, convT equivalent-forward -> torch IOHW with spatial
    flip, linear (in,out) -> (out,in))."""
    def t(x):
        return torch.tensor(np.asarray(x))

    with torch.no_grad():
        for i in range(4):
            conv = params["encoder"][f"conv{i}"]
            model.enc.convs[i].weight.copy_(t(conv["w"]).permute(3, 2, 0, 1))
            model.enc.convs[i].bias.copy_(t(conv["b"]))
            bn = params["encoder"][f"bn{i}"]
            model.enc.bns[i].weight.copy_(t(bn["scale"]))
            model.enc.bns[i].bias.copy_(t(bn["bias"]))
        model.enc.fc.weight.copy_(t(params["encoder"]["proj"]["w"]).T)
        model.enc.fc.bias.copy_(t(params["encoder"]["proj"]["b"]))

        model.dec.fc.weight.copy_(t(params["decoder"]["proj"]["w"]).T)
        model.dec.fc.bias.copy_(t(params["decoder"]["proj"]["b"]))
        for i in range(4):
            dc = params["decoder"][f"deconv{i}"]
            # our w (kh,kw,in,out) is the flipped equivalent-forward kernel:
            # torch convT weight (in,out,kh,kw) = flip(w).transpose
            w = np.asarray(dc["w"])[::-1, ::-1].copy()
            model.dec.deconvs[i].weight.copy_(
                torch.tensor(w).permute(2, 3, 0, 1))
            model.dec.deconvs[i].bias.copy_(t(dc["b"]))
            if i < 3:
                bn = params["decoder"][f"bn{i}"]
                model.dec.bns[i].weight.copy_(t(bn["scale"]))
                model.dec.bns[i].bias.copy_(t(bn["bias"]))

        model.h1.weight.copy_(t(params["head"]["fc1"]["w"]).T)
        model.h1.bias.copy_(t(params["head"]["fc1"]["b"]))
        model.h2.weight.copy_(t(params["head"]["fc2"]["w"]).T)
        model.h2.bias.copy_(t(params["head"]["fc2"]["b"]))


def test_forward_loss_and_grads_match_torch():
    key = jax.random.PRNGKey(3)
    params, bn_state = supervised_ae_init(key, CFG, image_size=IMG)
    model = _build_torch_model().train()
    _copy_params_to_torch(params, model)

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (16, IMG, IMG, 3)).astype(np.float32)
    labels = rng.integers(0, 10, 16).astype(np.int64)

    # --- satae forward + loss + grads
    def loss_fn(p):
        (x_hat, logits, z), _ = supervised_ae_apply(
            p, bn_state, jnp.asarray(imgs), train=True, cfg=CFG)
        total, mse, ce = joint_ae_loss(x_hat, logits, jnp.asarray(imgs),
                                       jnp.asarray(labels.astype(np.int32)),
                                       ALPHA)
        return total, (x_hat, logits, mse, ce)

    (loss_j, (x_hat_j, logits_j, mse_j, ce_j)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)

    # --- torch forward + loss + grads
    x_t = torch.tensor(imgs).permute(0, 3, 1, 2)
    x_hat_t, logits_t, z_t = model(x_t)
    mse_t = tnn.MSELoss()(x_hat_t, x_t)
    ce_t = tnn.CrossEntropyLoss()(logits_t, torch.tensor(labels))
    loss_t = ALPHA * mse_t + ce_t
    loss_t.backward()

    # forward parity (train-mode BN batch statistics included)
    np.testing.assert_allclose(
        np.asarray(x_hat_j),
        x_hat_t.detach().numpy().transpose(0, 2, 3, 1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(float(mse_j), mse_t.item(), rtol=1e-5)
    np.testing.assert_allclose(float(ce_j), ce_t.item(), rtol=1e-5)
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-5)

    # gradient parity on representative tensors across the whole model
    checks = [
        (grads["encoder"]["conv0"]["w"],
         model.enc.convs[0].weight.grad.permute(2, 3, 1, 0)),
        (grads["encoder"]["bn2"]["scale"], model.enc.bns[2].weight.grad),
        (grads["encoder"]["proj"]["w"], model.enc.fc.weight.grad.T),
        (grads["decoder"]["proj"]["w"], model.dec.fc.weight.grad.T),
        (grads["decoder"]["deconv1"]["b"], model.dec.deconvs[1].bias.grad),
        (grads["head"]["fc2"]["w"], model.h2.weight.grad.T),
    ]
    for ours, theirs in checks:
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   atol=2e-4)
    # deconv weight grad needs the flip-back conversion
    g = np.asarray(grads["decoder"]["deconv0"]["w"])[::-1, ::-1]
    np.testing.assert_allclose(g.transpose(2, 3, 0, 1),
                               model.dec.deconvs[0].weight.grad.numpy(),
                               atol=2e-4)
