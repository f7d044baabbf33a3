"""Data-parallel train/eval step construction over a device mesh.

Wraps the single-program steps from satae.train.steps with explicit
shardings: params / BN state / optimizer state replicated, the batch sharded
on axis 0. Because loss and BatchNorm statistics are global-batch means under
pjit, XLA emits the gradient psum and cross-replica BN reductions over ICI
automatically — this is DP with *synchronized* BatchNorm, strictly stronger
than per-replica BN (SURVEY.md §7 hard parts).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from satae.config import DataConfig, ModelConfig
from satae.data.augment import normalize
from satae.models.supervised_ae import supervised_ae_apply


def make_dp_ae_train_step(mesh: Mesh, model_cfg: ModelConfig,
                          data_cfg: DataConfig, compute_dtype=jnp.float32,
                          axis: str = "data", donate: bool = True):
    """Batch-sharded jit of the SAME step body as the single-device path
    (satae.train.steps.ae_train_step_body) — only the shardings differ."""
    from satae.train.steps import ae_train_step_body

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))
    in_shardings = (repl, repl, repl, batch_sh, batch_sh, repl, repl, repl)
    out_shardings = (repl, repl, repl, repl)
    return jax.jit(ae_train_step_body(model_cfg, data_cfg, compute_dtype),
                   in_shardings=in_shardings, out_shardings=out_shardings,
                   donate_argnums=(0, 1, 2) if donate else ())


def make_dp_ae_eval_step(mesh: Mesh, model_cfg: ModelConfig,
                         compute_dtype=jnp.float32, axis: str = "data"):
    from satae.train.steps import ae_eval_step_body

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))
    return jax.jit(ae_eval_step_body(model_cfg, compute_dtype),
                   in_shardings=(repl, repl, batch_sh, batch_sh, repl),
                   out_shardings=repl)


def make_dp_ae_eval_step_weighted(mesh: Mesh, model_cfg: ModelConfig,
                                  compute_dtype=jnp.float32,
                                  axis: str = "data"):
    """Weighted-sum eval for sharded batches: zero-weight padding rows make
    every batch divisible by the device count WITHOUT biasing metrics (the
    plain eval step would otherwise require truncating the epoch-remainder
    batch, silently changing val-loss-based model selection)."""
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))

    def step(params, bn_state, imgs_u8, labels, weights, alpha):
        imgs = normalize(imgs_u8, compute_dtype)
        (x_hat, logits, _z), _ = supervised_ae_apply(
            params, bn_state, imgs, train=False, cfg=model_cfg)
        w4 = weights[:, None, None, None]
        se = jnp.sum(jnp.square((x_hat - imgs).astype(jnp.float32)) * w4) / \
            x_hat[0].size
        logits32 = logits.astype(jnp.float32)
        logz = jax.nn.logsumexp(logits32, axis=-1)
        tl = jnp.take_along_axis(logits32, labels[:, None], axis=-1)[:, 0]
        ce = jnp.sum((logz - tl) * weights)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * weights)
        return {"loss": alpha * se + ce, "mse": se, "ce": ce, "acc": correct,
                "n": jnp.sum(weights)}

    return jax.jit(step, in_shardings=(repl, repl, batch_sh, batch_sh,
                                       batch_sh, repl),
                   out_shardings=repl)


def make_dp_encode_step(mesh: Mesh, model_cfg: ModelConfig,
                        compute_dtype=jnp.float32, axis: str = "data"):
    """Sharded frozen-encoder extraction: latents come back batch-sharded
    (the host gather is the all-gather)."""
    from satae.models.encoder import encoder_apply

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))

    def encode(enc_params, enc_state, imgs_u8):
        x = normalize(imgs_u8, compute_dtype)
        z, _ = encoder_apply(enc_params, enc_state, x, train=False,
                             cfg=model_cfg)
        return z

    return jax.jit(encode, in_shardings=(repl, repl, batch_sh),
                   out_shardings=batch_sh)


def make_dp_decode_step(mesh: Mesh, model_cfg: ModelConfig,
                        compute_dtype=jnp.float32, axis: str = "data",
                        image_size: int = 64):
    """Batch-sharded decoder forward (latents in, reconstructions out, both
    sharded on the batch axis; params replicated) — the mesh counterpart of
    :func:`satae.train.extract.make_decode_step`. Embarrassingly parallel:
    XLA emits zero collectives."""
    from satae.models.decoder import decoder_apply

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))

    def decode(dec_params, dec_state, z):
        x_hat, _ = decoder_apply(dec_params, dec_state,
                                 z.astype(compute_dtype), train=False,
                                 cfg=model_cfg, image_size=image_size)
        return x_hat.astype(jnp.float32)

    return jax.jit(decode, in_shardings=(repl, repl, batch_sh),
                   out_shardings=batch_sh)
