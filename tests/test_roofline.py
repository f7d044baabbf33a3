"""The analytic roofline model matches XLA's own accounting.

Pins the round-4 FLOPs-model correction: an earlier PERF.md revision counted
the subpixel transposed convs at output spatial resolution (4x their real
cost), inflating the published train FLOPs to 740 MFLOP/img and the bench
MFU to 0.61/0.75. The model in satae/utils/roofline.py is validated here
against ``compiled.cost_analysis()`` so the error class cannot recur.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satae.config import DataConfig, ModelConfig
from satae.utils import roofline


@pytest.mark.quick
def test_param_count_matches_init_tree():
    from satae.models.supervised_ae import supervised_ae_init
    for mc, dc in (
        (ModelConfig(), DataConfig()),
        (ModelConfig(latent_dim=16, encoder_channels=(4, 8, 16, 16),
                     mlp_hidden=(32, 16)), DataConfig(image_size=32)),
    ):
        params, _ = supervised_ae_init(jax.random.PRNGKey(0), mc,
                                       image_size=dc.image_size)
        real = sum(x.size for x in jax.tree_util.tree_leaves(params))
        assert roofline.param_count(mc, dc) == real


@pytest.mark.quick
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_executed_flops_match_xla_cost_analysis(dtype):
    from satae.models.supervised_ae import supervised_ae_init
    from satae.train.optim import adam_init
    from satae.train.steps import ae_train_step_body

    mc, dc, batch = ModelConfig(), DataConfig(), 256
    params, bn = supervised_ae_init(jax.random.PRNGKey(0), mc)
    opt = adam_init(params)
    comp = jax.jit(ae_train_step_body(mc, dc, dtype)).lower(
        params, bn, opt, np.zeros((batch, 64, 64, 3), np.uint8),
        np.zeros(batch, np.int32), jax.random.PRNGKey(0),
        jnp.asarray(35.0), jnp.asarray(5e-3)).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):  # older jax returns a one-element list
        ca = ca[0]
    flops = ca.get("flops")
    if not flops:
        pytest.skip("cost_analysis reports no flops on this backend")
    xla_per_image = flops / batch
    model = roofline.train_flops_per_image(mc, dc, "executed")
    # XLA's count swings ~13% between dtypes (234 f32 / 264 bf16 MFLOP/img
    # at the default config) around the analytic 255; pin to 15%.
    assert abs(model - xla_per_image) / xla_per_image < 0.15
    # and the old inflated model is excluded for good
    assert model < 0.5 * 740e6


@pytest.mark.quick
def test_utilizations_shape_and_bounds():
    mc, dc = ModelConfig(), DataConfig()
    u = roofline.step_utilizations(mc, dc, batch=1024, step_seconds=6.3e-3,
                                   dtype="bf16", device_kind="TPU v5 lite")
    assert set(u) == {"mfu", "executed_flops_util", "hbm_util",
                      "hbm_bytes_per_step", "flops_per_image_model",
                      "flops_per_image_executed"}
    assert 0 < u["mfu"] < u["executed_flops_util"] < 1
    assert 0 < u["hbm_util"] < 1
    # model FLOPs (useful math) < executed FLOPs (subpixel 16/9 + aug)
    assert u["flops_per_image_model"] < u["flops_per_image_executed"]
    # unknown device -> empty, not a KeyError
    assert roofline.step_utilizations(mc, dc, batch=1, step_seconds=1.0,
                                      dtype="bf16", device_kind="???") == {}
    # f32 moves twice the activation bytes
    b16 = roofline.train_bytes_per_image(mc, dc, 2)
    b32 = roofline.train_bytes_per_image(mc, dc, 4)
    assert b32["activations"] == 2 * b16["activations"]
    assert b32["total_ex_params"] < 2 * b16["total_ex_params"]  # uint8 input
