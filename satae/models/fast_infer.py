"""Fused Pallas inference path: uint8 batch -> latent -> class ids.

The production serving path (BASELINE.json config 4 "end-to-end inference"):
every conv/linear layer runs as ONE Pallas GEMM with the eval-mode BatchNorm
and activation folded into the epilogue (satae.kernels). Numerics are
validated against the XLA reference path in tests/test_kernels.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from satae.config import ModelConfig
from satae.data.augment import normalize
from satae.kernels.conv import bn_fold, conv2d_bn_act_infer
from satae.kernels.matmul import fused_matmul, linear_pallas


def encoder_infer_pallas(enc_params: Any, enc_state: Any, x: jax.Array,
                         cfg: ModelConfig) -> jax.Array:
    """Eval-mode encoder forward on the fused kernels. x: NHWC float."""
    h = x
    for i in range(len(cfg.encoder_channels)):
        conv = enc_params[f"conv{i}"]
        scale, shift = bn_fold(enc_params[f"bn{i}"], enc_state[f"bn{i}"],
                               cfg.bn_eps)
        h = conv2d_bn_act_infer(h, conv["w"], conv["b"], scale, shift,
                                stride=2, padding=1, act="relu")
    h = h.reshape(h.shape[0], -1)
    return linear_pallas(h, enc_params["proj"]["w"], enc_params["proj"]["b"])


def mlp_infer_pallas(mlp_params: Any, mlp_state: Any, z: jax.Array,
                     cfg: ModelConfig) -> jax.Array:
    """Eval-mode MLP forward (dropout = identity) on fused kernels."""
    h = z
    for i in range(len(cfg.mlp_hidden)):
        fc = mlp_params[f"fc{i}"]
        scale, shift = bn_fold(mlp_params[f"bn{i}"], mlp_state[f"bn{i}"],
                               cfg.bn_eps)
        shift = shift + fc["b"].astype(jnp.float32) * scale
        h = fused_matmul(h, fc["w"], scale, shift, "relu")
    last = mlp_params[f"fc{len(cfg.mlp_hidden)}"]
    return linear_pallas(h, last["w"], last["b"])


def make_encode_classify_pallas(cfg: ModelConfig, compute_dtype=jnp.float32):
    """jit'd uint8 images -> predicted classes, all-Pallas compute."""

    @jax.jit
    def run(enc_params, enc_state, mlp_params, mlp_state, imgs_u8):
        x = normalize(imgs_u8, compute_dtype)
        z = encoder_infer_pallas(enc_params, enc_state, x, cfg)
        logits = mlp_infer_pallas(mlp_params, mlp_state, z, cfg)
        return jnp.argmax(logits, axis=-1)

    return run
