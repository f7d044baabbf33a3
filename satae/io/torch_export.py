"""Export satae pytrees as reference-format PyTorch state_dicts.

The inverse of :mod:`satae.io.torch_import`: a user moving a satae-trained
model BACK into the reference notebook's stack (``torch.save``-compatible
``.pt`` files loadable with ``model.load_state_dict(...)``, strict mode,
Report.md:714-716, 2725) gets every layout conversion undone:

  * conv weights: satae HWIO -> torch OIHW;
  * transposed-conv weights: satae stores the spatially-flipped
    equivalent-FORWARD kernel (kh, kw, in, out) for its input-dilated conv
    formulation (satae/nn/layers.py:87-90) -> unflip both spatial axes and
    transpose back to torch ConvTranspose2d's (in, out, kh, kw);
  * linear weights: satae (in, out) -> torch (out, in);
  * the two flatten-boundary projections permute the flattened image axis
    from satae's NHWC flatten order back to the reference's NCHW flatten
    (Report.md:308-310, 365-367): the encoder projection's INPUT dim and the
    decoder projection's OUTPUT dim (and its bias) are reindexed from
    (H, W, C) order to (C, H, W) order;
  * BatchNorm: scale/bias params -> weight/bias; mean/var state ->
    running_mean/running_var; ``num_batches_tracked`` is emitted as 0
    (int64) so strict ``load_state_dict`` accepts the dict — under torch's
    default constant momentum 0.1 the counter never affects normalization.

Key layout produced (identical to what the reference notebook saves —
see torch_import.py module docstring for the verified index map).

Round-trip guarantees pinned by tests/test_torch_export.py:
  * import(export(tree)) is bit-identical to the original tree;
  * a reference-faithful torch model loaded (strict) with the exported dict
    reproduces the satae eval-mode forward.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from satae.config import ModelConfig

Params = Mapping[str, Any]
StateDict = Dict[str, np.ndarray]


def _np(v: Any) -> np.ndarray:
    return np.asarray(v, np.float32)


def _linear(out: StateDict, prefix: str, p: Params) -> None:
    out[f"{prefix}.weight"] = _np(p["w"]).T
    out[f"{prefix}.bias"] = _np(p["b"])


def _bn(out: StateDict, prefix: str, p: Params, s: Params) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])
    out[f"{prefix}.running_mean"] = _np(s["mean"])
    out[f"{prefix}.running_var"] = _np(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def sae_to_torch_state_dict(params: Params, state: Params, cfg: ModelConfig,
                            image_size: int = 64) -> StateDict:
    """satae ``(params, bn_state)`` trees (the
    :func:`satae.models.supervised_ae.supervised_ae_init` layout) -> the
    reference ``SupervisedAutoencoder.state_dict()`` key/shape layout."""
    n = len(cfg.encoder_channels)
    spatial = image_size // (2 ** n)
    c_last = cfg.encoder_channels[-1]
    sd: StateDict = {}

    enc_p, enc_s = params["encoder"], state["encoder"]
    for i in range(n):
        w = _np(enc_p[f"conv{i}"]["w"])  # (kh, kw, I, O)
        sd[f"enc.encoder.{3 * i}.weight"] = w.transpose(3, 2, 0, 1)
        sd[f"enc.encoder.{3 * i}.bias"] = _np(enc_p[f"conv{i}"]["b"])
        _bn(sd, f"enc.encoder.{3 * i + 1}", enc_p[f"bn{i}"], enc_s[f"bn{i}"])
    # encoder projection: satae (H*W*C, latent) -> reindex input rows to
    # CHW order, then transpose to torch (latent, C*H*W)
    w = _np(enc_p["proj"]["w"]).T  # (latent, H*W*C)
    w = w.reshape(-1, spatial, spatial, c_last).transpose(0, 3, 1, 2)
    sd[f"enc.encoder.{3 * n + 1}.weight"] = w.reshape(w.shape[0], -1)
    sd[f"enc.encoder.{3 * n + 1}.bias"] = _np(enc_p["proj"]["b"])

    rev = tuple(reversed(cfg.encoder_channels))
    dec_p, dec_s = params["decoder"], state["decoder"]
    # decoder projection: satae (latent, H*W*C) -> reindex output (and bias)
    # to CHW order, giving torch's (C*H*W, latent)
    w = _np(dec_p["proj"]["w"]).T  # (H*W*C, latent)
    w = w.reshape(spatial, spatial, rev[0], -1).transpose(2, 0, 1, 3)
    sd["dec.decoder_input.weight"] = w.reshape(-1, w.shape[-1])
    b = _np(dec_p["proj"]["b"]).reshape(spatial, spatial, rev[0])
    sd["dec.decoder_input.bias"] = b.transpose(2, 0, 1).reshape(-1)

    for i in range(n):
        w = _np(dec_p[f"deconv{i}"]["w"])  # flipped-forward (kh, kw, I, O)
        sd[f"dec.decoder.{3 * i + 1}.weight"] = np.ascontiguousarray(
            w[::-1, ::-1].transpose(2, 3, 0, 1))
        sd[f"dec.decoder.{3 * i + 1}.bias"] = _np(dec_p[f"deconv{i}"]["b"])
        if i < n - 1:
            _bn(sd, f"dec.decoder.{3 * i + 2}", dec_p[f"bn{i}"],
                dec_s[f"bn{i}"])

    _linear(sd, "classifier.0", params["head"]["fc1"])
    _linear(sd, "classifier.2", params["head"]["fc2"])
    return sd


def mlp_to_torch_state_dict(params: Params, state: Params, cfg: ModelConfig
                            ) -> StateDict:
    """satae MLP trees (:func:`satae.models.mlp.mlp_init` layout) -> the
    reference ``MLP.state_dict()`` key/shape layout (Report.md:2552-2563)."""
    sd: StateDict = {}
    idx = 0
    for i in range(len(cfg.mlp_hidden)):
        _linear(sd, f"net.{idx}", params[f"fc{i}"])
        _bn(sd, f"net.{idx + 1}", params[f"bn{i}"], state[f"bn{i}"])
        # Linear, BN, ReLU (+ Dropout after the first hidden block only)
        idx += 4 if i == 0 else 3
    _linear(sd, f"net.{idx}", params[f"fc{len(cfg.mlp_hidden)}"])
    return sd


def _to_tensors(sd: StateDict) -> Dict[str, Any]:
    import torch

    # copy: exported leaves may be read-only views of jax buffers
    return {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}


def save_torch_sae(path: str, params: Params, state: Params,
                   cfg: ModelConfig, image_size: int = 64) -> None:
    """Write an ``AE_GLOBAL_BEST.pt``-compatible file (Report.md:714-716)."""
    import torch

    torch.save(_to_tensors(sae_to_torch_state_dict(
        params, state, cfg, image_size)), path)


def save_torch_mlp(path: str, params: Params, state: Params,
                   cfg: ModelConfig) -> None:
    """Write an ``MLP_GLOBAL_BEST.pt``-compatible file (Report.md:2725)."""
    import torch

    torch.save(_to_tensors(mlp_to_torch_state_dict(params, state, cfg)), path)
