"""Functional NN layers (init + apply pairs) for the satae framework.

TPU-first design decisions:
  * NHWC activations / HWIO weights everywhere — the layout XLA:TPU tiles best
    (channel axis on the 128-lane dimension).
  * Pure functions over parameter pytrees; BatchNorm running statistics are
    explicit state threaded through ``apply`` (the reference's implicit
    nn.Module buffers, Report.md:293-305, made functional so the whole train
    step jits and donates).
  * ``lax.conv_general_dilated`` for both conv and transposed conv; the
    transposed conv is expressed as an input-dilated conv so both directions
    hit the same XLA conv emitter (and the same Pallas kernel when enabled).

Reference layers being re-implemented (do-not-copy; behavior only):
  Conv2d(k=3, s=2, p=1)+BatchNorm2d+ReLU blocks   Report.md:291-307
  ConvTranspose2d(k=3, s=2, p=1, output_padding=1) Report.md:370-382
  Linear                                           Report.md:309, 365, 423-427
  BatchNorm1d                                      Report.md:2554-2559
  Dropout(0.3)                                     Report.md:2556
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from satae.nn import init as inits

Params = Dict[str, jax.Array]
State = Dict[str, jax.Array]

_CONV_DIMS = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# Conv2d
# ---------------------------------------------------------------------------

def conv2d_init(key: jax.Array, in_ch: int, out_ch: int, kernel: int = 3,
                dtype=jnp.float32) -> Params:
    wk, bk = jax.random.split(key)
    return {
        "w": inits.kaiming_uniform_conv(wk, kernel, kernel, in_ch, out_ch, dtype),
        "b": inits.bias_uniform(bk, in_ch * kernel * kernel, out_ch, dtype),
    }


def conv2d(params: Params, x: jax.Array, stride: int = 1,
           padding: int = 0) -> jax.Array:
    """2-D convolution, NHWC. Matches torch.nn.Conv2d(k, stride, padding)."""
    y = lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_CONV_DIMS,
    )
    return y + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# ConvTranspose2d
# ---------------------------------------------------------------------------

def conv2d_transpose_init(key: jax.Array, in_ch: int, out_ch: int,
                          kernel: int = 3, dtype=jnp.float32) -> Params:
    wk, bk = jax.random.split(key)
    return {
        "w": inits.kaiming_uniform_conv_transpose(
            wk, kernel, kernel, in_ch, out_ch, dtype),
        "b": inits.bias_uniform(bk, out_ch * kernel * kernel, out_ch, dtype),
    }


def conv2d_transpose(params: Params, x: jax.Array, stride: int = 2,
                     padding: int = 1, output_padding: int = 1) -> jax.Array:
    """Transposed conv matching torch.nn.ConvTranspose2d semantics.

    Implemented as an input-dilated (fractionally-strided) forward conv:
    lhs_dilation=stride with explicit padding
    (k-1-p, k-1-p+output_padding) per spatial dim. For the reference's
    k=3, s=2, p=1, op=1 (Report.md:370-382) this doubles spatial dims
    (H -> 2H) exactly like PyTorch.

    The stored weight is the kernel of this *forward* dilated conv. It relates
    to a torch ConvTranspose2d weight Wt (in,out,kh,kw) by a spatial flip:
    w[h,w_,i,o] = Wt[i,o,kh-1-h,kw-1-w_]. Since the kernel is learned, the
    flip only matters when importing torch weights (see tests).

    Fast path for the reference's exact configuration (k=3, s=2, p=1, op=1):
    the zero-inserted dilated conv wastes most MACs on inserted zeros, which
    XLA:TPU does not elide. The subpixel decomposition computes each output
    parity class from the 2x2 input window that actually feeds it — ONE dense
    2x2 conv to 4*C_out channels + a depth-to-space interleave. Derivation:
    out[2m+py, 2n+px] = sum_{a,b} x[m+a, n+b] * w[ky, kx] with ky = 1 if
    py==0 (a must be 0) else 2a, same for kx — measured ~3x faster than the
    dilated form at these shapes.
    """
    k = params["w"].shape[0]
    w = params["w"].astype(x.dtype)
    if k == 3 and stride == 2 and padding == 1 and output_padding == 1:
        y = _conv_transpose_subpixel_3x3_s2(x, w)
    else:
        lo = k - 1 - padding
        hi = k - 1 - padding + output_padding
        y = lax.conv_general_dilated(
            x, w,
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(stride, stride),
            dimension_numbers=_CONV_DIMS,
        )
    return y + params["b"].astype(x.dtype)


@jax.custom_vjp
def _conv_transpose_subpixel_3x3_s2(x: jax.Array, w: jax.Array) -> jax.Array:
    """Subpixel (depth-to-space) form of the k3/s2/p1/op1 transposed conv.

    x: (N,H,W,Cin); w: (3,3,Cin,Cout) equivalent-forward kernel. Returns
    (N,2H,2W,Cout). Builds a (2,2,Cin,4*Cout) kernel K with
    K[a,b,:, (py,px,co)] = w[ky,kx,:,co] where ky=1,a==0 for py=0 / ky=2a for
    py=1 (zero otherwise), runs one stride-1 conv over x padded (0,1)x(0,1),
    and interleaves the 4 parity planes.

    Custom VJP (round 4): the k3/s2/p1/op1 transposed conv T_w is the adjoint
    of the dense k3/s2/p1 forward conv C_K with K = flip_hw(w) channel-
    transposed, so dL/dx = C_K(g) (one dense strided conv) and dL/dw is C_K's
    native conv weight-grad at input g with cotangent x. XLA's autodiff
    instead differentiates through the subpixel decomposition — both grad
    convs in the 2x2/4*Cout parity form (16/9 x the useful taps) plus
    space-to-depth transpose materializations of every decoder-stage
    gradient, which the device profile shows as ~0.7 ms/step of pure layout
    copies. Measured on the full bf16+rbg train step (batch 1024, scanned):
    4.88 -> 4.15 ms/step, +17.5% throughput; grads equal to autodiff within
    2e-5 (benchmarks/deconv_vjp_probe.py).
    """
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    dt = x.dtype
    zero = jnp.zeros((cin, cout), dt)

    def tap(py, a, px, b):
        # weight for output parity (py,px) at input tap (a,b)
        if py == 0 and a != 0:
            return zero
        if px == 0 and b != 0:
            return zero
        ky = 1 if py == 0 else 2 * a
        kx = 1 if px == 0 else 2 * b
        return w[ky, kx]

    # K: (2, 2, Cin, 2*2*Cout), parity-major output channel layout
    K = jnp.stack([
        jnp.stack([
            jnp.concatenate([tap(py, a, px, b) for py in (0, 1)
                             for px in (0, 1)], axis=-1)
            for b in (0, 1)], axis=0)
        for a in (0, 1)], axis=0)

    y = lax.conv_general_dilated(
        x, K, window_strides=(1, 1), padding=((0, 1), (0, 1)),
        dimension_numbers=_CONV_DIMS)             # (N, H, W, 4*Cout)
    y = y.reshape(n, h, wd, 2, 2, cout)           # (..., py, px, co)
    y = y.transpose(0, 1, 3, 2, 4, 5)             # (N, H, py, W, px, co)
    return y.reshape(n, 2 * h, 2 * wd, cout)


def _subpixel_fwd(x, w):
    return _conv_transpose_subpixel_3x3_s2(x, w), (x, w)


def _subpixel_bwd(res, g):
    x, w = res
    # dense adjoint kernel: contract Cout -> Cin, spatial flip
    k_c = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)

    def dense_adjoint(kk):
        return lax.conv_general_dilated(
            g, kk, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=_CONV_DIMS)

    dx = dense_adjoint(k_c)
    _, weight_grad = jax.vjp(dense_adjoint, k_c)
    (dk_c,) = weight_grad(x)
    dw = jnp.flip(dk_c.transpose(0, 1, 3, 2), (0, 1))
    return dx, dw


_conv_transpose_subpixel_3x3_s2.defvjp(_subpixel_fwd, _subpixel_bwd)


# ---------------------------------------------------------------------------
# BatchNorm (2d over NHWC, 1d over NC) with running statistics
# ---------------------------------------------------------------------------

def batchnorm_init(ch: int, dtype=jnp.float32) -> Tuple[Params, State]:
    params = {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}
    state = {"mean": jnp.zeros((ch,), dtype), "var": jnp.ones((ch,), dtype)}
    return params, state


def batchnorm(params: Params, state: State, x: jax.Array, *, train: bool,
              momentum: float = 0.1, eps: float = 1e-5
              ) -> Tuple[jax.Array, State]:
    """BatchNorm matching torch.nn.BatchNorm1d/2d numerics.

    Train mode normalizes with biased batch statistics and updates running
    stats with the *unbiased* variance (PyTorch behavior); eval mode uses the
    running stats. Reduction axes are every axis but the last, so the same
    function serves BatchNorm2d (NHWC) and BatchNorm1d (NC).

    Under pjit with the batch axis sharded over the mesh, the means below are
    global-batch means — XLA inserts the cross-replica psums, which gives
    cross-replica BatchNorm for free (SURVEY.md §7 "Hard parts").
    """
    axes = tuple(range(x.ndim - 1))
    if train:
        # one-pass moments: jnp.var re-reads the (large) activation a second
        # time; E[x^2]-E[x]^2 lets XLA fuse both reductions into one pass —
        # the train step is HBM-bandwidth-bound (docs/PERF.md). Moments in
        # f32 regardless of compute dtype.
        xf = x.astype(jnp.float32)
        mean32 = jnp.mean(xf, axes)
        m2 = jnp.mean(jnp.square(xf), axes)
        var32 = jnp.maximum(m2 - jnp.square(mean32), 0.0)
        mean, var = mean32.astype(x.dtype), var32.astype(x.dtype)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean.astype(state["mean"].dtype),
            "var": (1 - momentum) * state["var"] + momentum * unbiased.astype(state["var"].dtype),
        }
    else:
        mean, var = state["mean"].astype(x.dtype), state["var"].astype(x.dtype)
        new_state = state
    inv = lax.rsqrt(var.astype(x.dtype) + jnp.asarray(eps, x.dtype))
    y = (x - mean.astype(x.dtype)) * inv
    y = y * params["scale"].astype(x.dtype) + params["bias"].astype(x.dtype)
    return y, new_state


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, in_features: int, out_features: int,
                dtype=jnp.float32) -> Params:
    wk, bk = jax.random.split(key)
    return {
        "w": inits.kaiming_uniform_linear(wk, in_features, out_features, dtype),
        "b": inits.bias_uniform(bk, in_features, out_features, dtype),
    }


def linear(params: Params, x: jax.Array) -> jax.Array:
    """Affine map x @ W + b with W stored (in, out) — MXU-natural layout."""
    return jnp.dot(x, params["w"].astype(x.dtype),
                   preferred_element_type=x.dtype) + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------

def dropout(key: Optional[jax.Array], x: jax.Array, rate: float,
            train: bool) -> jax.Array:
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train time)."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


relu = jax.nn.relu
sigmoid = jax.nn.sigmoid
