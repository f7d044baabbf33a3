"""Property-based tests (hypothesis): layer numerics vs torch across random
shapes/strides, augmentation selection vs literal numpy, metrics vs sklearn
for arbitrary label distributions."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
from hypothesis import given, settings, strategies as st

from satae.data import augment
from satae.eval import metrics as M
from satae.nn import layers as L

import pytest

pytestmark = pytest.mark.quick


@settings(max_examples=10, deadline=None)
@given(in_ch=st.integers(1, 8), out_ch=st.integers(1, 8),
       stride=st.integers(1, 3), size=st.integers(5, 16),
       pad=st.integers(0, 2))
def test_conv2d_matches_torch_any_shape(in_ch, out_ch, stride, size, pad):
    tconv = tnn.Conv2d(in_ch, out_ch, 3, stride, pad)
    x = torch.randn(2, in_ch, size, size)
    ref = tconv(x).detach().numpy().transpose(0, 2, 3, 1)
    params = {"w": jnp.asarray(
        tconv.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "b": jnp.asarray(tconv.bias.detach().numpy())}
    out = L.conv2d(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                   stride=stride, padding=pad)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


@settings(max_examples=10, deadline=None)
@given(n=st.integers(1, 8), size=st.sampled_from([8, 12, 16]),
       pad=st.integers(1, 4), seed=st.integers(0, 100))
def test_flip_crop_select_property(n, size, pad, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (n, size, size, 3)).astype(np.float32)
    flip = rng.integers(0, 2, (n, 1)).astype(bool)
    offsets = rng.integers(0, 2 * pad + 1, (n, 2))
    out = np.asarray(augment.flip_crop_select(
        jnp.asarray(x), jnp.asarray(flip), jnp.asarray(offsets), pad))
    for i in range(n):
        img = x[i, :, ::-1, :] if flip[i, 0] else x[i]
        padded = np.pad(img, ((pad, pad), (pad, pad), (0, 0)))
        oy, ox = offsets[i]
        np.testing.assert_array_equal(out[i],
                                      padded[oy:oy + size, ox:ox + size])


@settings(max_examples=10, deadline=None)
@given(n=st.integers(1, 300), k=st.integers(2, 10), seed=st.integers(0, 50))
def test_metrics_match_sklearn_property(n, k, seed):
    from sklearn.metrics import precision_recall_fscore_support
    rng = np.random.default_rng(seed)
    y_true = rng.integers(0, k, n)
    y_pred = rng.integers(0, k, n)
    cm = M.confusion_matrix(y_true, y_pred, k)
    m = M.per_class_metrics(cm)
    p, r, f, s = precision_recall_fscore_support(
        y_true, y_pred, labels=range(k), zero_division=0)
    np.testing.assert_allclose(m["precision"], p, atol=1e-12)
    np.testing.assert_allclose(m["recall"], r, atol=1e-12)
    np.testing.assert_allclose(m["f1"], f, atol=1e-12)
    np.testing.assert_array_equal(m["support"], s)


# -- strict JSON round-trip --------------------------------------------------

_json_scalars = st.one_of(
    st.floats(allow_nan=True, allow_infinity=True),
    st.integers(-10**9, 10**9),
    st.text(max_size=8).filter(lambda s: s not in ("inf", "-inf", "nan")),
    st.booleans(), st.none())
_json_values = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=6), children, max_size=4)),
    max_leaves=12)


@settings(max_examples=50, deadline=None)
@given(obj=_json_values)
def test_strict_json_roundtrip_property(obj):
    """dump_strict_json never emits non-standard literals, and
    json_restore(json.loads(.)) reproduces the value (NaN compared by
    identity-of-kind; tuples normalize to lists like plain JSON)."""
    import json
    import math

    import pytest

    from satae.utils.strict_json import dump_strict_json, json_restore

    text = dump_strict_json(obj)
    parsed = json.loads(
        text, parse_constant=lambda s: pytest.fail(f"non-strict literal {s}"))
    restored = json_restore(parsed)

    def norm(v):
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [norm(x) for x in v]
        if isinstance(v, float) and math.isnan(v):
            return "__nan__"  # NaN != NaN; compare by kind
        return v

    assert norm(restored) == norm(obj)
