"""External MLP classifier trained on frozen-encoder latents.

Re-implements the reference ``MLP`` (Report.md:2548-2566 / nb cell 63):
Linear(in,128)+BatchNorm1d+ReLU+Dropout(0.3) -> Linear(128,64)+BatchNorm1d+ReLU
-> Linear(64, num_classes). Deeper than the supervised-AE's internal head by
design (SURVEY.md §2, C21 note).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from satae.config import ModelConfig
from satae.nn import layers as L


def mlp_init(key: jax.Array, cfg: ModelConfig, input_dim: Optional[int] = None,
             dtype=jnp.float32) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    input_dim = cfg.latent_dim if input_dim is None else input_dim
    dims = (input_dim,) + tuple(cfg.mlp_hidden) + (cfg.num_classes,)
    keys = jax.random.split(key, len(dims) - 1)
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    for i in range(len(dims) - 1):
        params[f"fc{i}"] = L.linear_init(keys[i], dims[i], dims[i + 1], dtype)
        if i < len(dims) - 2:  # BN on hidden layers only
            params[f"bn{i}"], state[f"bn{i}"] = L.batchnorm_init(dims[i + 1], dtype)
    return params, state


def mlp_apply(params: Dict[str, Any], state: Dict[str, Any], x: jax.Array, *,
              train: bool, cfg: ModelConfig,
              dropout_key: Optional[jax.Array] = None
              ) -> Tuple[jax.Array, Dict[str, Any]]:
    """x: (N, input_dim) latents -> (logits (N, num_classes), new_state)."""
    n_hidden = len(cfg.mlp_hidden)
    new_state: Dict[str, Any] = {}
    h = x
    for i in range(n_hidden):
        h = L.linear(params[f"fc{i}"], h)
        h, new_state[f"bn{i}"] = L.batchnorm(
            params[f"bn{i}"], state[f"bn{i}"], h, train=train,
            momentum=cfg.bn_momentum, eps=cfg.bn_eps)
        h = L.relu(h)
        if i == 0:  # Dropout(0.3) after the first hidden block only (Report.md:2556)
            h = L.dropout(dropout_key, h, cfg.mlp_dropout, train)
    logits = L.linear(params[f"fc{n_hidden}"], h)
    return logits, new_state
