"""Opt-in large-batch throughput recipe (config.throughput_config +
`fit --throughput`, VERDICT-r4 #4): batch 1024 with Adam sqrt-scaled grid
lrs, selection semantics unchanged. The recipe's QUALITY gate at full scale
is a TPU measurement (docs/PERF.md); these tests pin the transform itself
and that the pipeline trains/selects end-to-end under it."""

import dataclasses
import math

import numpy as np
import pytest

from satae.config import (AETrainConfig, DataConfig, MLPTrainConfig,
                          PipelineConfig, throughput_config)

pytestmark = pytest.mark.quick


def test_scales_batch_and_lrs():
    cfg = PipelineConfig()
    tc = throughput_config(cfg)
    assert tc.data.batch_size == 1024
    k = math.sqrt(1024 / 64)
    assert k == 4.0
    np.testing.assert_allclose(
        tc.ae.learning_rates,
        [lr * k for lr in cfg.ae.learning_rates])
    np.testing.assert_allclose(
        tc.mlp.learning_rates,
        [lr * k for lr in cfg.mlp.learning_rates])
    # selection/training semantics untouched
    assert tc.ae.alphas == cfg.ae.alphas
    assert tc.ae.max_epochs == cfg.ae.max_epochs
    assert tc.ae.patience == cfg.ae.patience
    assert tc.mlp.epochs == cfg.mlp.epochs
    assert tc.mlp.weight_decay == cfg.mlp.weight_decay
    assert tc.model == cfg.model and tc.runtime == cfg.runtime
    # original is untouched (frozen dataclass replace)
    assert cfg.data.batch_size == 64


def test_custom_batch_and_validation():
    cfg = PipelineConfig()
    tc = throughput_config(cfg, batch_size=256)
    assert tc.data.batch_size == 256
    np.testing.assert_allclose(
        tc.ae.learning_rates[0], cfg.ae.learning_rates[0] * 2.0)
    with pytest.raises(ValueError, match="multiple"):
        throughput_config(cfg, batch_size=1000)  # not a multiple of 64


def test_cli_flag_applies_recipe(tmp_path):
    from satae.cli import _config_from_args, build_parser

    args = build_parser().parse_args(
        ["fit", "--throughput", "--out", str(tmp_path)])
    assert args.throughput is True
    cfg = _config_from_args(args)
    assert cfg.data.batch_size == 1024
    assert cfg.ae.learning_rates[0] == pytest.approx(4e-4)
    cfg_off = _config_from_args(
        build_parser().parse_args(["fit", "--out", str(tmp_path)]))
    assert cfg_off.data.batch_size == 64


def test_fit_grid_under_throughput_recipe(tmp_path):
    """End-to-end grid fit with the recipe applied at test scale (batch 32
    from a base of 16 — same multiple-of-base rule, same sqrt scaling): the
    sweep trains, selects by val loss, and records the SCALED lrs in the
    result store."""
    from satae.api import SatAEPipeline
    from satae.config import ModelConfig, RuntimeConfig
    from satae.io.checkpoint import load_grid_results

    base = PipelineConfig(
        data=DataConfig(per_class=16, image_size=32, batch_size=16),
        model=ModelConfig(latent_dim=16, encoder_channels=(4, 8, 8, 16)),
        ae=AETrainConfig(alphas=(20.0, 35.0), learning_rates=(1e-3, 5e-3),
                         max_epochs=2, patience=2),
        mlp=MLPTrainConfig(learning_rates=(1e-3, 1e-2), epochs=2),
        runtime=RuntimeConfig(seed=0),
    )
    cfg = throughput_config(base, batch_size=32)
    summary = SatAEPipeline(cfg).fit(grid=True, out_dir=str(tmp_path))
    assert np.isfinite(summary.test_acc)
    assert summary.ae_hparams["lr"] in {lr * math.sqrt(2)
                                        for lr in base.ae.learning_rates}
    store = load_grid_results(tmp_path / "validation_losses.json")
    lrs_seen = {v["lr"] for v in store.values()}
    assert lrs_seen == {lr * math.sqrt(2) for lr in base.ae.learning_rates}
