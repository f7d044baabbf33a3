"""Multi-step training-trajectory parity vs PyTorch: identical weights and an
identical batch SEQUENCE through 25 Adam steps must produce matching loss
curves, BatchNorm running statistics, and eval-mode predictions.

The single-step test (test_torch_train_parity.py) pins one forward+backward;
this pins the part that drifts: Adam's moment accumulation, the BN
running-stat EMA across steps, and the compounding of all of it — the
strongest proxy for the reference's 74.73% gate (Report.md:3119) available
without the real EuroSAT data (zero-egress environment).

Augmentation is deliberately bypassed (its RNG cannot be replicated in
torch); what compounds over steps — model apply, joint loss, backward, Adam,
BN state threading — is exactly what this exercises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from satae.config import ModelConfig
from satae.models.supervised_ae import supervised_ae_apply, supervised_ae_init
from satae.train.losses import joint_ae_loss
from satae.train.optim import adam_init, adam_update
from tests.test_torch_train_parity import (CFG, IMG, _build_torch_model,
                                           _copy_params_to_torch)

ALPHA = 35.0
LR = 1e-3
N_STEPS = 25
BATCH = 16


def _make_batches(seed: int = 0):
    rng = np.random.default_rng(seed)
    for _ in range(N_STEPS):
        imgs = rng.uniform(0, 1, (BATCH, IMG, IMG, 3)).astype(np.float32)
        labels = rng.integers(0, 10, BATCH).astype(np.int64)
        yield imgs, labels


def test_torch_trajectory_parity():
    key = jax.random.PRNGKey(3)
    params, bn_state = supervised_ae_init(key, CFG, image_size=IMG)
    model = _build_torch_model().train()
    _copy_params_to_torch(params, model)
    opt_t = torch.optim.Adam(model.parameters(), lr=LR)
    opt_j = adam_init(params)
    alpha = jnp.asarray(ALPHA)
    lr = jnp.asarray(LR)

    @jax.jit
    def train_step(params, bn_state, opt_state, imgs, labels):
        def loss_fn(p):
            (x_hat, logits, _z), new_bn = supervised_ae_apply(
                p, bn_state, imgs, train=True, cfg=CFG)
            total, mse, ce = joint_ae_loss(x_hat, logits, imgs, labels, alpha)
            return total, new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        params, opt_state = adam_update(params, grads, opt_state, lr)
        return params, new_bn, opt_state, loss

    losses_j, losses_t = [], []
    for imgs, labels in _make_batches():
        params, bn_state, opt_j, loss_j = train_step(
            params, bn_state, opt_j, jnp.asarray(imgs),
            jnp.asarray(labels.astype(np.int32)))
        losses_j.append(float(loss_j))

        x_t = torch.tensor(imgs).permute(0, 3, 1, 2)
        opt_t.zero_grad()
        x_hat_t, logits_t, _ = model(x_t)
        loss_t = ALPHA * tnn.MSELoss()(x_hat_t, x_t) \
            + tnn.CrossEntropyLoss()(logits_t, torch.tensor(labels))
        loss_t.backward()
        opt_t.step()
        losses_t.append(loss_t.item())

    # loss curves track step for step (compounding Adam + BN drift stays
    # within float noise, not within "roughly similar training")
    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3)
    assert losses_j[-1] < losses_j[0], "trajectory did not train"

    # BN running statistics after 25 EMA updates — the classic silent
    # divergence (SURVEY.md §7) — must match across every BN layer
    # tolerance: measured drift is ~6e-3 after 25 steps (Adam sign-noise on
    # near-zero-grad params compounds into activation statistics); a real BN
    # bug (wrong momentum, per-replica stats, biased/unbiased var mixup) is
    # O(0.1+), far outside this band
    for i in range(4):
        ours = bn_state["encoder"][f"bn{i}"]
        theirs = model.enc.bns[i]
        np.testing.assert_allclose(np.asarray(ours["mean"]),
                                   theirs.running_mean.detach().numpy(),
                                   atol=1.5e-2)
        np.testing.assert_allclose(np.asarray(ours["var"]),
                                   theirs.running_var.detach().numpy(),
                                   atol=1.5e-2)
    for i in range(3):
        ours = bn_state["decoder"][f"bn{i}"]
        theirs = model.dec.bns[i]
        np.testing.assert_allclose(np.asarray(ours["mean"]),
                                   theirs.running_mean.detach().numpy(),
                                   atol=1.5e-2)
        np.testing.assert_allclose(np.asarray(ours["var"]),
                                   theirs.running_var.detach().numpy(),
                                   atol=1.5e-2)

    # eval-mode predictions from the final state (uses the running stats):
    # same logits, same reconstruction
    model.eval()
    rng = np.random.default_rng(99)
    imgs = rng.uniform(0, 1, (BATCH, IMG, IMG, 3)).astype(np.float32)
    (x_hat_j, logits_j, _), _ = supervised_ae_apply(
        params, bn_state, jnp.asarray(imgs), train=False, cfg=CFG)
    with torch.no_grad():
        x_hat_t, logits_t, _ = model(torch.tensor(imgs).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(x_hat_j), x_hat_t.numpy().transpose(0, 2, 3, 1), atol=5e-3)
    # final-parameter spot checks (Adam sign-like updates bound drift by
    # ~2*lr per step for near-zero-grad params; require much tighter)
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["proj"]["w"]),
        model.enc.fc.weight.detach().numpy().T, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(params["head"]["fc2"]["w"]),
        model.h2.weight.detach().numpy().T, atol=5e-3)
