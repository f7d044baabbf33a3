"""Numerics parity of satae.nn.layers against torch.nn (CPU oracle).

The reference is pure PyTorch; these tests pin our conv / transposed-conv /
batchnorm / linear semantics to torch's to a tight tolerance so the rebuilt
pipeline's training dynamics match (SURVEY.md §7 "Hard parts": transposed-conv
padding semantics and BatchNorm running stats are the classic silent gaps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick
import torch
import torch.nn as tnn

from satae.nn import layers as L

torch.manual_seed(0)


def _to_jax_nhwc(x_nchw: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x_nchw.detach().numpy().transpose(0, 2, 3, 1))


def _from_torch_conv_w(w: torch.Tensor) -> jnp.ndarray:
    # torch OIHW -> HWIO
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def _from_torch_convT_w(w: torch.Tensor) -> jnp.ndarray:
    # torch convT weight (I, O, H, W) -> our HWIO equivalent-forward kernel,
    # which is the spatially flipped kernel (see layers.conv2d_transpose).
    wn = w.detach().numpy()[:, :, ::-1, ::-1]  # flip H, W
    return jnp.asarray(wn.transpose(2, 3, 0, 1))  # IOHW -> HWIO


def test_conv2d_matches_torch():
    tconv = tnn.Conv2d(3, 32, kernel_size=3, stride=2, padding=1)
    x = torch.randn(4, 3, 64, 64)
    ref = tconv(x).detach().numpy().transpose(0, 2, 3, 1)
    params = {"w": _from_torch_conv_w(tconv.weight),
              "b": jnp.asarray(tconv.bias.detach().numpy())}
    out = L.conv2d(params, _to_jax_nhwc(x), stride=2, padding=1)
    assert out.shape == ref.shape == (4, 32, 32, 32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_conv2d_transpose_matches_torch():
    tconvt = tnn.ConvTranspose2d(8, 5, kernel_size=3, stride=2, padding=1,
                                 output_padding=1)
    x = torch.randn(2, 8, 4, 4)
    ref = tconvt(x).detach().numpy().transpose(0, 2, 3, 1)
    params = {"w": _from_torch_convT_w(tconvt.weight),
              "b": jnp.asarray(tconvt.bias.detach().numpy())}
    out = L.conv2d_transpose(params, _to_jax_nhwc(x), stride=2, padding=1,
                             output_padding=1)
    assert out.shape == ref.shape == (2, 8, 8, 5)  # spatial doubled
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


@pytest.mark.parametrize("train", [True, False])
def test_batchnorm2d_matches_torch(train):
    tbn = tnn.BatchNorm2d(16)
    # give it non-trivial affine + running stats
    with torch.no_grad():
        tbn.weight.uniform_(0.5, 1.5)
        tbn.bias.uniform_(-0.5, 0.5)
        tbn.running_mean.uniform_(-0.3, 0.3)
        tbn.running_var.uniform_(0.5, 1.5)
    params = {"scale": jnp.asarray(tbn.weight.detach().numpy()),
              "bias": jnp.asarray(tbn.bias.detach().numpy())}
    state = {"mean": jnp.asarray(tbn.running_mean.numpy().copy()),
             "var": jnp.asarray(tbn.running_var.numpy().copy())}
    x = torch.randn(8, 16, 6, 6)

    tbn.train(train)
    ref = tbn(x).detach().numpy().transpose(0, 2, 3, 1)
    out, new_state = L.batchnorm(params, state, _to_jax_nhwc(x), train=train)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
    # running stats update parity (torch updates them in train mode)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               tbn.running_var.numpy(), atol=1e-4)


@pytest.mark.parametrize("train", [True, False])
def test_batchnorm1d_matches_torch(train):
    tbn = tnn.BatchNorm1d(128)
    params = {"scale": jnp.asarray(tbn.weight.detach().numpy()),
              "bias": jnp.asarray(tbn.bias.detach().numpy())}
    state = {"mean": jnp.asarray(tbn.running_mean.numpy().copy()),
             "var": jnp.asarray(tbn.running_var.numpy().copy())}
    x = torch.randn(32, 128)
    tbn.train(train)
    ref = tbn(x).detach().numpy()
    out, _ = L.batchnorm(params, state, jnp.asarray(x.numpy()), train=train)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_linear_matches_torch():
    tl = tnn.Linear(64, 128)
    x = torch.randn(16, 64)
    ref = tl(x).detach().numpy()
    params = {"w": jnp.asarray(tl.weight.detach().numpy().T),
              "b": jnp.asarray(tl.bias.detach().numpy())}
    out = L.linear(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_dropout_train_eval():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1000, 32))
    out = L.dropout(key, x, 0.3, train=True)
    kept = np.asarray(out > 0)
    assert 0.6 < kept.mean() < 0.8  # ~70% kept
    np.testing.assert_allclose(np.asarray(out)[kept], 1.0 / 0.7, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(L.dropout(None, x, 0.3, train=False)),
                                  np.asarray(x))


def test_init_distributions_match_torch_defaults():
    """PyTorch default init: W, b ~ U(+-1/sqrt(fan_in))."""
    from satae.nn import init as inits
    key = jax.random.PRNGKey(0)
    w = inits.kaiming_uniform_conv(key, 3, 3, 32, 64)
    bound = 1.0 / np.sqrt(32 * 9)
    assert float(jnp.max(jnp.abs(w))) <= bound
    assert float(jnp.std(w)) == pytest.approx(bound / np.sqrt(3), rel=0.05)
    wt = inits.kaiming_uniform_conv_transpose(key, 3, 3, 256, 128)
    assert float(jnp.max(jnp.abs(wt))) <= 1.0 / np.sqrt(128 * 9)
    wl = inits.kaiming_uniform_linear(key, 4096, 64)
    assert float(jnp.max(jnp.abs(wl))) <= 1.0 / np.sqrt(4096)


def test_subpixel_deconv_custom_vjp_matches_autodiff():
    """The subpixel deconv's adjoint backward (dense k3/s2 conv + its native
    weight-grad, layers._subpixel_bwd) must equal differentiating through the
    subpixel decomposition itself — including under vmap over per-config
    weights (the vmapped sweep engine's regime) and vs torch's own grads."""
    key = jax.random.PRNGKey(7)
    kx, kw, kg = jax.random.split(key, 3)
    x = jax.random.normal(kx, (4, 8, 8, 16), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 16, 8), jnp.float32) * 0.1
    g = jax.random.normal(kg, (4, 16, 16, 8), jnp.float32)

    def loss_custom(x, w):
        return jnp.vdot(L._conv_transpose_subpixel_3x3_s2(x, w), g)

    def subpixel_autodiff(x, w):
        # re-derive the decomposition without the custom VJP attached
        out, _ = jax.vjp(lambda xx: L._conv_transpose_subpixel_3x3_s2(xx, w),
                         x)
        return out

    def loss_dilated(x, w):
        # independent oracle: the lhs-dilated form of the same operator
        from jax import lax
        y = lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.vdot(y, g)

    gx, gw = jax.grad(loss_custom, (0, 1))(x, w)
    gx_ref, gw_ref = jax.grad(loss_dilated, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=2e-5, atol=2e-5)

    # torch oracle on the same weights
    tconvt = tnn.ConvTranspose2d(16, 8, 3, stride=2, padding=1,
                                 output_padding=1, bias=False)
    wn = np.asarray(w).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]  # HWIO->IOHW
    with torch.no_grad():
        tconvt.weight.copy_(torch.from_numpy(wn.copy()))
    xt = torch.from_numpy(
        np.asarray(x).transpose(0, 3, 1, 2).copy()).requires_grad_(True)
    gt = torch.from_numpy(np.asarray(g).transpose(0, 3, 1, 2).copy())
    (tconvt(xt) * gt).sum().backward()
    np.testing.assert_allclose(
        np.asarray(gx), xt.grad.numpy().transpose(0, 2, 3, 1),
        rtol=2e-4, atol=2e-4)
    tw_grad = tconvt.weight.grad.numpy()[:, :, ::-1, ::-1].transpose(
        2, 3, 0, 1)
    np.testing.assert_allclose(np.asarray(gw), tw_grad, rtol=2e-4, atol=2e-4)

    # vmap over stacked weights (per-config sweep regime)
    ws = jnp.stack([w, w * 0.5])
    gws = jax.vmap(lambda wi: jax.grad(loss_custom, 1)(x, wi))(ws)
    np.testing.assert_allclose(np.asarray(gws[0]), np.asarray(gw),
                               rtol=2e-5, atol=2e-5)
