"""Pallas kernel numerics vs the XLA reference path (SURVEY.md §4).

Kernels run in interpreter mode on the CPU test platform (pallas TPU kernels
compile only on TPU); the same code compiles natively on device. Numerics are
identical either way up to float reassociation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import satae.kernels.matmul as KM
from satae.config import ModelConfig
from satae.kernels.conv import bn_fold, conv2d_bn_act_infer
from satae.nn import layers as L


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    """Force interpret mode for pallas_call on the CPU test platform."""
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def test_fused_matmul_matches_xla():
    rng = np.random.default_rng(0)
    for (m, k, n) in [(64, 4096, 64), (64, 64, 128), (7, 33, 10), (1, 64, 10)]:
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
        shift = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
        ref = (x @ w) * scale + shift
        out = KM.fused_matmul(x, w, scale, shift, "none")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)
        out_relu = KM.fused_matmul(x, w, scale, shift, "relu")
        np.testing.assert_allclose(np.asarray(out_relu),
                                   np.maximum(np.asarray(ref), 0),
                                   rtol=1e-5, atol=1e-4)


def test_fused_matmul_grad_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 24)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))

    def f_pallas(x, w, s, t):
        return jnp.sum(KM.fused_matmul(x, w, s, t, "relu") ** 2)

    def f_xla(x, w, s, t):
        return jnp.sum(jnp.maximum((x @ w) * s + t, 0.0) ** 2)

    g_p = jax.grad(f_pallas, argnums=(0, 1, 2, 3))(x, w, scale, shift)
    g_x = jax.grad(f_xla, argnums=(0, 1, 2, 3))(x, w, scale, shift)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-3)


def test_conv_bn_relu_infer_matches_layers():
    rng = np.random.default_rng(2)
    key = jax.random.PRNGKey(0)
    conv_p = L.conv2d_init(key, 3, 32)
    bn_p, bn_s = L.batchnorm_init(32)
    # non-trivial BN state
    bn_s = {"mean": jnp.asarray(rng.normal(0, 0.3, 32).astype(np.float32)),
            "var": jnp.asarray(rng.uniform(0.5, 1.5, 32).astype(np.float32))}
    bn_p = {"scale": jnp.asarray(rng.uniform(0.5, 1.5, 32).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(0, 0.3, 32).astype(np.float32))}
    x = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32))

    ref = L.conv2d(conv_p, x, stride=2, padding=1)
    ref, _ = L.batchnorm(bn_p, bn_s, ref, train=False)
    ref = L.relu(ref)

    scale, shift = bn_fold(bn_p, bn_s)
    out = conv2d_bn_act_infer(x, conv_p["w"], conv_p["b"], scale, shift,
                              stride=2, padding=1, act="relu")
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_fast_infer_path_matches_reference_path():
    from satae.models.fast_infer import make_encode_classify_pallas
    from satae.models.mlp import mlp_apply, mlp_init
    from satae.models.encoder import encoder_apply, encoder_init
    from satae.data.augment import normalize

    cfg = ModelConfig(latent_dim=16, encoder_channels=(4, 8, 8, 16),
                      mlp_hidden=(32, 16))
    key = jax.random.PRNGKey(0)
    enc_p, enc_s = encoder_init(key, cfg, image_size=32)
    mlp_p, mlp_s = mlp_init(key, cfg, input_dim=16)
    imgs = np.random.default_rng(0).integers(0, 255, (8, 32, 32, 3),
                                             dtype=np.uint8)

    x = normalize(jnp.asarray(imgs))
    z_ref, _ = encoder_apply(enc_p, enc_s, x, train=False, cfg=cfg)
    logits_ref, _ = mlp_apply(mlp_p, mlp_s, z_ref, train=False, cfg=cfg)
    preds_ref = np.asarray(jnp.argmax(logits_ref, -1))

    run = make_encode_classify_pallas(cfg)
    preds = np.asarray(run(enc_p, enc_s, mlp_p, mlp_s, jnp.asarray(imgs)))
    np.testing.assert_array_equal(preds, preds_ref)
