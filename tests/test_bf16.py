"""bfloat16 compute-path smoke tests: f32 master params, bf16 activations."""

import jax
import jax.numpy as jnp
import numpy as np

from satae.config import DataConfig, ModelConfig
from satae.models.supervised_ae import supervised_ae_init
from satae.train.optim import adam_init
from satae.train.steps import make_ae_train_step

MODEL_CFG = ModelConfig(latent_dim=16, encoder_channels=(4, 8, 8, 16))
DATA_CFG = DataConfig(image_size=32, batch_size=16)


def test_bf16_train_step_finite_and_learns():
    key = jax.random.PRNGKey(0)
    params, bn = supervised_ae_init(key, MODEL_CFG, image_size=32)
    opt = adam_init(params)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (16, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, 16).astype(np.int32)
    step = make_ae_train_step(MODEL_CFG, DATA_CFG,
                              compute_dtype=jnp.bfloat16, donate=False)
    alpha, lr = jnp.asarray(35.0), jnp.asarray(1e-3)
    losses = []
    for i in range(4):
        params, bn, opt, m = step(params, bn, opt, imgs, labels,
                                  jax.random.PRNGKey(i), alpha, lr)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # master params stay f32
    assert params["encoder"]["conv0"]["w"].dtype == jnp.float32


def test_loss_f32_accumulation_under_bf16():
    from satae.train.losses import cross_entropy, mse_loss
    x = jnp.full((64, 64, 64, 3), 0.5, jnp.bfloat16)
    y = x + jnp.asarray(0.01, jnp.bfloat16)
    out = mse_loss(y, x)
    assert out.dtype == jnp.float32
    logits = jnp.zeros((32, 10), jnp.bfloat16)
    ce = cross_entropy(logits, jnp.zeros((32,), jnp.int32))
    assert ce.dtype == jnp.float32
    assert abs(float(ce) - float(np.log(10.0))) < 1e-5
