"""Fused inference conv: im2col + Pallas GEMM with BN+activation epilogue.

The TPU-native equivalent of the reference's cuDNN conv+batch_norm+relu
block sequence (Report.md:292-307, SURVEY.md §2 native table): for eval-mode
BatchNorm the affine normalization folds into a per-output-channel
scale/shift that rides the GEMM epilogue, so conv -> BN -> ReLU is ONE pass
through the MXU with no intermediate HBM traffic.

Patch extraction (im2col) stays in XLA — ``lax.conv_general_dilated_patches``
lowers to cheap data movement that XLA fuses with the producer; the FLOPs all
land in the Pallas kernel. Training-mode BN (live batch statistics) keeps the
XLA path (satae.nn.layers); this kernel is the inference fast path used by
models.fast_infer and benches.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from satae.kernels.matmul import fused_matmul


def bn_fold(bn_params, bn_state, eps: float = 1e-5):
    """Eval-mode BN -> (scale, shift): y = x*scale + shift."""
    inv = lax.rsqrt(bn_state["var"].astype(jnp.float32) + eps)
    scale = bn_params["scale"].astype(jnp.float32) * inv
    shift = bn_params["bias"].astype(jnp.float32) - \
        bn_state["mean"].astype(jnp.float32) * scale
    return scale, shift


def conv2d_bn_act_infer(x: jax.Array, w: jax.Array, b: jax.Array,
                        scale: Optional[jax.Array] = None,
                        shift: Optional[jax.Array] = None,
                        stride: int = 1, padding: int = 0,
                        act: str = "none") -> jax.Array:
    """act(BN(conv(x, w) + b)) for NHWC x, HWIO w, eval-mode folded BN.

    scale/shift are the bn_fold outputs (None -> identity BN). Returns NHWC.
    """
    n, h, wd, cin = x.shape
    kh, kw, cin2, cout = w.shape
    assert cin == cin2
    oh = (h + 2 * padding - kh) // stride + 1
    ow = (wd + 2 * padding - kw) // stride + 1

    # im2col: (N, OH, OW, KH*KW*CIN) patches. feature_group_count=cin keeps
    # channel-major patch order consistent with the reshaped weight below.
    patches = lax.conv_general_dilated_patches(
        x, (kh, kw), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    k = patches.shape[-1]
    patches = patches.reshape(n * oh * ow, k)

    # conv_general_dilated_patches emits features ordered (CIN, KH, KW);
    # rearrange HWIO weights to match: (CIN, KH, KW, COUT) -> (K, COUT).
    w_mat = jnp.transpose(w, (2, 0, 1, 3)).reshape(k, cout)

    if scale is None:
        scale = jnp.ones((cout,), jnp.float32)
        shift = b.astype(jnp.float32)
    else:
        # fold the conv bias through the BN affine: (z + b)*s + t = z*s + (b*s + t)
        shift = shift + b.astype(jnp.float32) * scale

    y = fused_matmul(patches, w_mat, scale, shift, act)
    return y.reshape(n, oh, ow, cout)
