"""Import reference PyTorch checkpoints into satae pytrees.

A user migrating from the reference notebook holds ``.pt`` state_dicts saved
by ``torch.save(model.state_dict())`` — ``models_best/AE_GLOBAL_BEST.pt``
(Report.md:714-716) and ``mlp_best/MLP_GLOBAL_BEST.pt`` (Report.md:2725).
These helpers map them onto satae's functional (params, bn_state) pairs,
performing every layout conversion the NHWC/functional design implies:

  * conv weights: torch OIHW -> satae HWIO;
  * transposed-conv weights: torch ConvTranspose2d stores (in, out, kh, kw);
    satae stores the spatially-flipped equivalent-FORWARD kernel
    (kh, kw, in, out) for its input-dilated conv formulation
    (satae/nn/layers.py:87-90) -> transpose + flip both spatial axes;
  * linear weights: torch (out, in) -> satae (in, out);
  * the two flatten-boundary projections additionally permute the flattened
    image axis, because the reference flattens NCHW (Report.md:308-310,
    365-367) while satae flattens NHWC: the encoder projection's INPUT dim
    and the decoder projection's OUTPUT dim (and its bias) are reindexed
    from (C, H, W) order to (H, W, C) order;
  * BatchNorm: weight/bias -> scale/bias params; running_mean/var -> state;
    ``num_batches_tracked`` is dropped (satae uses torch's default constant
    momentum 0.1, under which the counter does not affect normalization).

The reference's state_dict key layout (verified against Report.md:291-313,
365-389, 423-427, 2552-2563 nn.Sequential indices):

  SupervisedAutoencoder:  enc.encoder.{3i}    Conv2d
                          enc.encoder.{3i+1}  BatchNorm2d
                          enc.encoder.{3n+1}  Linear (after Flatten at 3n)
                          dec.decoder_input   Linear
                          dec.decoder.{3i+1}  ConvTranspose2d
                          dec.decoder.{3i+2}  BatchNorm2d (first n-1 blocks)
                          classifier.{0,2}    Linear
  MLP:                    net.{0,1}           Linear+BatchNorm1d (+ Dropout)
                          net.{4,5}           Linear+BatchNorm1d
                          net.{7}             Linear

Round-trip correctness is pinned by tests/test_torch_import.py: a
reference-faithful torch model's forward must match the satae forward on the
imported weights (eval mode, running stats included).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from satae.config import ModelConfig

Params = Dict[str, Any]


def _np(v: Any) -> np.ndarray:
    """torch.Tensor | array-like -> float32 numpy array (no torch import)."""
    if hasattr(v, "detach"):  # torch.Tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _linear(sd: Mapping[str, Any], prefix: str) -> Params:
    return {"w": _np(sd[f"{prefix}.weight"]).T,
            "b": _np(sd[f"{prefix}.bias"])}


def _bn(sd: Mapping[str, Any], prefix: str) -> Tuple[Params, Params]:
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    state = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, state


def sae_from_torch_state_dict(sd: Mapping[str, Any], cfg: ModelConfig,
                              in_ch: int = 3, image_size: int = 64
                              ) -> Tuple[Params, Params]:
    """Reference ``SupervisedAutoencoder.state_dict()`` -> (params, bn_state)
    matching :func:`satae.models.supervised_ae.supervised_ae_init` trees."""
    n = len(cfg.encoder_channels)
    spatial = image_size // (2 ** n)
    c_last = cfg.encoder_channels[-1]
    got_in = int(_np(sd["enc.encoder.0.weight"]).shape[1])
    if got_in != in_ch:
        raise ValueError(
            f"state_dict expects {got_in} input channels, caller declared "
            f"{in_ch} — wrong checkpoint for this data config")

    enc_p: Params = {}
    enc_s: Params = {}
    for i in range(n):
        w = _np(sd[f"enc.encoder.{3 * i}.weight"])  # (O, I, kh, kw)
        enc_p[f"conv{i}"] = {"w": w.transpose(2, 3, 1, 0),
                             "b": _np(sd[f"enc.encoder.{3 * i}.bias"])}
        enc_p[f"bn{i}"], enc_s[f"bn{i}"] = _bn(sd, f"enc.encoder.{3 * i + 1}")
    # encoder projection: torch weight (latent, C*H*W) with CHW-flattened
    # input -> reindex input to HWC order, then transpose to satae (in, out)
    w = _np(sd[f"enc.encoder.{3 * n + 1}.weight"])
    w = w.reshape(-1, c_last, spatial, spatial).transpose(0, 2, 3, 1)
    enc_p["proj"] = {"w": w.reshape(w.shape[0], -1).T,
                     "b": _np(sd[f"enc.encoder.{3 * n + 1}.bias"])}

    rev = tuple(reversed(cfg.encoder_channels))
    dec_p: Params = {}
    dec_s: Params = {}
    # decoder projection: torch weight (C*H*W, latent) with CHW-flattened
    # OUTPUT (the Unflatten target) -> reindex output rows (and bias) to HWC
    w = _np(sd["dec.decoder_input.weight"])  # (C*H*W, latent)
    w = w.reshape(rev[0], spatial, spatial, -1).transpose(1, 2, 0, 3)
    b = _np(sd["dec.decoder_input.bias"])
    b = b.reshape(rev[0], spatial, spatial).transpose(1, 2, 0).reshape(-1)
    dec_p["proj"] = {"w": w.reshape(-1, w.shape[-1]).T, "b": b}

    for i in range(n):
        w = _np(sd[f"dec.decoder.{3 * i + 1}.weight"])  # (I, O, kh, kw)
        # satae keeps the flipped equivalent-forward kernel (kh, kw, I, O)
        dec_p[f"deconv{i}"] = {
            "w": np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1]),
            "b": _np(sd[f"dec.decoder.{3 * i + 1}.bias"]),
        }
        if i < n - 1:
            dec_p[f"bn{i}"], dec_s[f"bn{i}"] = _bn(
                sd, f"dec.decoder.{3 * i + 2}")

    params = {
        "encoder": enc_p,
        "decoder": dec_p,
        "head": {"fc1": _linear(sd, "classifier.0"),
                 "fc2": _linear(sd, "classifier.2")},
    }
    state = {"encoder": enc_s, "decoder": dec_s}
    return params, state


def mlp_from_torch_state_dict(sd: Mapping[str, Any], cfg: ModelConfig
                              ) -> Tuple[Params, Params]:
    """Reference ``MLP.state_dict()`` -> (params, state) matching
    :func:`satae.models.mlp.mlp_init` trees."""
    params: Params = {}
    state: Params = {}
    idx = 0
    for i in range(len(cfg.mlp_hidden)):
        params[f"fc{i}"] = _linear(sd, f"net.{idx}")
        params[f"bn{i}"], state[f"bn{i}"] = _bn(sd, f"net.{idx + 1}")
        # Linear, BN, ReLU (+ Dropout after the first hidden block only,
        # Report.md:2556)
        idx += 4 if i == 0 else 3
    params[f"fc{len(cfg.mlp_hidden)}"] = _linear(sd, f"net.{idx}")
    return params, state


def load_torch_sae(path: str, cfg: Optional[ModelConfig] = None,
                   in_ch: int = 3, image_size: int = 64
                   ) -> Tuple[Params, Params]:
    """Load ``AE_GLOBAL_BEST.pt`` (Report.md:714-716) from disk."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return sae_from_torch_state_dict(sd, cfg or ModelConfig(), in_ch,
                                     image_size)


def load_torch_mlp(path: str, cfg: Optional[ModelConfig] = None
                   ) -> Tuple[Params, Params]:
    """Load ``MLP_GLOBAL_BEST.pt`` (Report.md:2725) from disk."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return mlp_from_torch_state_dict(sd, cfg or ModelConfig())
