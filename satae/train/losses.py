"""Loss functions for the joint supervised-AE objective and the MLP stage.

Reference: ``loss = alpha * MSELoss()(x_hat, imgs) + CrossEntropyLoss()(logits,
labels)`` (Report.md:622-623, 649-651). Note the MSE target is the *augmented*
(noisy) input — the reference reconstructs the corrupted image, not the clean
one (criterion_recon(x_hat, imgs) at Report.md:649 where imgs already passed
AddGaussianNoise) — we match that.

All reductions are jnp ops that fuse into the jit'd train step (the reference's
cuDNN loss kernels, SURVEY.md §2 "native components" table).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mse_loss(x_hat: jax.Array, x: jax.Array) -> jax.Array:
    """Mean squared error over all elements (torch MSELoss 'mean').

    Accumulates in f32 regardless of compute dtype — with bfloat16
    activations a bf16 reduction over ~12M elements loses the loss signal."""
    d = (x_hat - x).astype(jnp.float32)
    return jnp.mean(d * d)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy from integer labels (torch CrossEntropyLoss).
    Computed in f32 (bf16-safe)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - true_logit)


def joint_ae_loss(x_hat: jax.Array, logits: jax.Array, imgs: jax.Array,
                  labels: jax.Array, alpha: jax.Array
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (total, mse, ce): total = alpha*mse + ce (Report.md:651)."""
    mse = mse_loss(x_hat, imgs)
    ce = cross_entropy(logits, labels)
    return alpha * mse + ce, mse, ce


def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
