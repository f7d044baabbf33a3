"""Shape/dtype/state tests for the model family (SURVEY.md §4 implication)."""

import jax
import jax.numpy as jnp
import numpy as np

from satae.config import ModelConfig
from satae.models import (
    decoder_apply,
    decoder_init,
    encoder_apply,
    encoder_init,
    mlp_apply,
    mlp_init,
    supervised_ae_apply,
    supervised_ae_init,
)
import pytest

pytestmark = pytest.mark.quick

CFG = ModelConfig()


def test_encoder_shapes():
    key = jax.random.PRNGKey(0)
    params, state = encoder_init(key, CFG)
    x = jax.random.uniform(key, (4, 64, 64, 3))
    z, new_state = encoder_apply(params, state, x, train=True, cfg=CFG)
    assert z.shape == (4, 64)
    assert set(new_state) == {"bn0", "bn1", "bn2", "bn3"}
    # proj weight maps 256*4*4 -> 64
    assert params["proj"]["w"].shape == (4096, 64)


def test_decoder_shapes_and_range():
    key = jax.random.PRNGKey(1)
    params, state = decoder_init(key, CFG)
    z = jax.random.normal(key, (4, 64))
    x_hat, new_state = decoder_apply(params, state, z, train=True, cfg=CFG)
    assert x_hat.shape == (4, 64, 64, 3)
    assert float(jnp.min(x_hat)) >= 0.0 and float(jnp.max(x_hat)) <= 1.0
    assert set(new_state) == {"bn0", "bn1", "bn2"}  # no BN on final block


def test_supervised_ae_forward_triple():
    key = jax.random.PRNGKey(2)
    params, state = supervised_ae_init(key, CFG)
    x = jax.random.uniform(key, (2, 64, 64, 3))
    (x_hat, logits, z), new_state = supervised_ae_apply(
        params, state, x, train=True, cfg=CFG)
    assert x_hat.shape == x.shape
    assert logits.shape == (2, 10)
    assert z.shape == (2, 64)
    assert set(new_state) == {"encoder", "decoder"}


def test_mlp_shapes_and_eval_determinism():
    key = jax.random.PRNGKey(3)
    params, state = mlp_init(key, CFG)
    x = jax.random.normal(key, (8, 64))
    logits1, _ = mlp_apply(params, state, x, train=False, cfg=CFG)
    logits2, _ = mlp_apply(params, state, x, train=False, cfg=CFG)
    assert logits1.shape == (8, 10)
    np.testing.assert_array_equal(np.asarray(logits1), np.asarray(logits2))
    # train mode with dropout needs a key and differs across keys
    l3, _ = mlp_apply(params, state, x, train=True, cfg=CFG,
                      dropout_key=jax.random.PRNGKey(0))
    l4, _ = mlp_apply(params, state, x, train=True, cfg=CFG,
                      dropout_key=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(l3), np.asarray(l4))


def test_param_count_magnitude():
    """Reference model is ~4M params (SURVEY.md §2); ours should match scale."""
    key = jax.random.PRNGKey(0)
    params, _ = supervised_ae_init(key, CFG)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert 1_000_000 < n < 10_000_000


def test_invalid_image_size_raises():
    import pytest
    with pytest.raises(ValueError, match="divisible"):
        encoder_init(jax.random.PRNGKey(0), CFG, image_size=50)


def test_invalid_config_raises():
    import pytest
    from satae.config import DataConfig
    with pytest.raises(ValueError, match="sum to 1"):
        DataConfig(split_fractions=(0.5, 0.3, 0.1))
    with pytest.raises(ValueError, match="positive"):
        DataConfig(batch_size=0)


def test_encoder_jit_and_grad():
    key = jax.random.PRNGKey(0)
    params, state = encoder_init(key, CFG)
    x = jax.random.uniform(key, (2, 64, 64, 3))

    @jax.jit
    def loss_fn(p):
        z, _ = encoder_apply(p, state, x, train=True, cfg=CFG)
        return jnp.sum(z ** 2)

    g = jax.grad(loss_fn)(params)
    assert jax.tree_util.tree_structure(g) == jax.tree_util.tree_structure(params)
    assert all(bool(jnp.all(jnp.isfinite(leaf)))
               for leaf in jax.tree_util.tree_leaves(g))
