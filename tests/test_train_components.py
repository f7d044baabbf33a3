"""Unit tests: losses (torch parity + golden values), Adam (torch parity),
augmentation semantics, split determinism, metrics vs sklearn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick
import torch

from satae.config import DataConfig, ModelConfig
from satae.data import augment, pipeline
from satae.data.synthetic import make_synthetic_eurosat
from satae.eval import metrics as M
from satae.train import losses as Lo
from satae.train.optim import adam_init, adam_update


def test_mse_and_ce_match_torch():
    x_hat = np.random.default_rng(0).normal(size=(8, 16)).astype(np.float32)
    x = np.random.default_rng(1).normal(size=(8, 16)).astype(np.float32)
    ref = torch.nn.MSELoss()(torch.tensor(x_hat), torch.tensor(x)).item()
    assert float(Lo.mse_loss(jnp.asarray(x_hat), jnp.asarray(x))) == \
        pytest.approx(ref, rel=1e-6)

    logits = np.random.default_rng(2).normal(size=(16, 10)).astype(np.float32)
    labels = np.random.default_rng(3).integers(0, 10, 16)
    ref = torch.nn.CrossEntropyLoss()(torch.tensor(logits),
                                      torch.tensor(labels)).item()
    assert float(Lo.cross_entropy(jnp.asarray(logits),
                                  jnp.asarray(labels))) == \
        pytest.approx(ref, rel=1e-6)


def test_ce_at_uniform_init_is_ln10():
    """Golden value: CE of uniform logits over 10 classes = ln 10 ~= 2.30
    (the reference's initial CE scale, Report.md:534 / SURVEY.md §4)."""
    logits = jnp.zeros((32, 10))
    labels = jnp.arange(32) % 10
    assert float(Lo.cross_entropy(logits, labels)) == \
        pytest.approx(np.log(10), rel=1e-6)


def test_adam_matches_torch():
    w0 = np.random.default_rng(0).normal(size=(5, 7)).astype(np.float32)
    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([tw], lr=5e-3, weight_decay=1e-4)
    params = {"w": jnp.asarray(w0)}
    state = adam_init(params)
    for i in range(5):
        g = np.random.default_rng(10 + i).normal(size=w0.shape).astype(np.float32)
        opt.zero_grad()
        tw.grad = torch.tensor(g.copy())
        opt.step()
        params, state = adam_update(params, {"w": jnp.asarray(g)}, state,
                                    lr=jnp.asarray(5e-3), weight_decay=1e-4)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), atol=1e-6)


def test_augment_semantics():
    key = jax.random.PRNGKey(0)
    imgs = np.random.default_rng(0).integers(0, 255, (16, 64, 64, 3),
                                             dtype=np.uint8)
    out = augment.augment_train_batch(key, jnp.asarray(imgs), noise_std=0.0)
    assert out.shape == (16, 64, 64, 3)
    assert out.dtype == jnp.float32
    # with zero padding and noise 0, values stay within [0,1]
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    # deterministic per key, varies across keys
    out2 = augment.augment_train_batch(key, jnp.asarray(imgs), noise_std=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = augment.augment_train_batch(jax.random.PRNGKey(1),
                                       jnp.asarray(imgs), noise_std=0.0)
    assert not np.array_equal(np.asarray(out), np.asarray(out3))
    # noise has the configured scale
    noisy = augment.augment_train_batch(key, jnp.asarray(imgs), noise_std=0.03)
    resid = np.asarray(noisy) - np.asarray(out)
    assert np.std(resid) == pytest.approx(0.03, rel=0.05)


def test_augment_rbg_impl():
    """rbg augmentation: deterministic per key, correct noise scale/bounds,
    a different stream than threefry, and validated at the config level."""
    key = jax.random.PRNGKey(0)
    imgs = np.random.default_rng(0).integers(0, 255, (64, 64, 64, 3),
                                             dtype=np.uint8)
    out = augment.augment_train_batch(key, jnp.asarray(imgs), noise_std=0.0,
                                      rng_impl="rbg")
    assert out.shape == (64, 64, 64, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    out2 = augment.augment_train_batch(key, jnp.asarray(imgs), noise_std=0.0,
                                       rng_impl="rbg")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    tfry = augment.augment_train_batch(key, jnp.asarray(imgs), noise_std=0.0)
    assert not np.array_equal(np.asarray(out), np.asarray(tfry))
    noisy = augment.augment_train_batch(key, jnp.asarray(imgs),
                                        noise_std=0.03, rng_impl="rbg")
    resid = np.asarray(noisy) - np.asarray(out)
    assert np.std(resid) == pytest.approx(0.03, rel=0.05)
    # typed keys are accepted too
    typed = augment.augment_train_batch(jax.random.key(0), jnp.asarray(imgs),
                                        noise_std=0.0, rng_impl="rbg")
    assert typed.shape == out.shape
    # ... including a key that is ALREADY rbg-typed ((4,)uint32 key data —
    # must pass through, not get re-concatenated to an invalid (8,) key)
    rbg_key = jax.random.key(0, impl="rbg")
    native = augment.augment_train_batch(rbg_key, jnp.asarray(imgs),
                                         noise_std=0.0, rng_impl="rbg")
    assert native.shape == out.shape

    with pytest.raises(ValueError):
        DataConfig(aug_rng_impl="philox")
    assert DataConfig(aug_rng_impl="rbg").aug_rng_impl == "rbg"


def test_scan_engine_trains_with_rbg_augmentation():
    """The HBM scan-epoch trainer runs under aug_rng_impl='rbg' and reduces
    the loss (stream change only; semantics identical)."""
    from satae.data.pipeline import ArrayDataset
    from satae.train.fast_loop import train_supervised_ae_scan

    rng = np.random.default_rng(0)
    n = 96
    imgs = rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, n).astype(np.int32)
    model_cfg = ModelConfig(latent_dim=8, encoder_channels=(4, 4, 8, 8),
                            num_classes=4, mlp_hidden=(8, 8))
    data_cfg = DataConfig(image_size=32, batch_size=16, num_classes=4,
                          aug_rng_impl="rbg")
    ds = ArrayDataset(imgs, labels)
    res = train_supervised_ae_scan(
        ds, ds, model_cfg=model_cfg, data_cfg=data_cfg, alpha=20.0, lr=1e-3,
        max_epochs=3, patience=5, seed=0)
    assert np.isfinite(res.best_val_loss)
    assert res.history["train_loss"][-1] < res.history["train_loss"][0]


def test_flip_crop_select_matches_numpy():
    """The MXU selection-matmul crop must equal literal flip+pad+crop."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (6, 8, 8, 3)).astype(np.float32)
    flip = rng.integers(0, 2, (6, 1)).astype(bool)
    offsets = rng.integers(0, 9, (6, 2))
    p = 4
    out = augment.flip_crop_select(jnp.asarray(x), jnp.asarray(flip),
                                   jnp.asarray(offsets), p)
    for i in range(6):
        img = x[i, :, ::-1, :] if flip[i, 0] else x[i]
        padded = np.pad(img, ((p, p), (p, p), (0, 0)))
        oy, ox = offsets[i]
        ref = padded[oy:oy + 8, ox:ox + 8]
        np.testing.assert_array_equal(np.asarray(out[i]), ref)


def test_normalize_matches_totensor():
    imgs = np.arange(0, 256, dtype=np.uint8).reshape(1, 16, 16, 1)
    out = augment.normalize(jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(out), imgs.astype(np.float32) / 255.0)


def test_split_determinism_and_sizes():
    """70/15/15 sizes match torch.random_split semantics and are seed-stable
    (Report.md:178-187; our split is seeded like the reference's seed 42)."""
    tr, va, te = pipeline.split_indices(20000, (0.7, 0.15, 0.15), seed=42)
    assert (len(tr), len(va), len(te)) == (14000, 3000, 3000)
    tr2, va2, te2 = pipeline.split_indices(20000, (0.7, 0.15, 0.15), seed=42)
    np.testing.assert_array_equal(tr, tr2)
    all_idx = np.sort(np.concatenate([tr, va, te]))
    np.testing.assert_array_equal(all_idx, np.arange(20000))
    # remainder handling matches torch.random_split (round-robin from the
    # first split; verified against torch 2.13): 20001 -> 14001/3000/3000,
    # 20002 -> 14002/3000/3000
    tr, va, te = pipeline.split_indices(20001, (0.7, 0.15, 0.15), seed=42)
    assert (len(tr), len(va), len(te)) == (14001, 3000, 3000)
    tr, va, te = pipeline.split_indices(20002, (0.7, 0.15, 0.15), seed=42)
    assert (len(tr), len(va), len(te)) == (14002, 3000, 3000)


def test_subsample_per_class_seeded():
    labels = np.repeat(np.arange(10), 300).astype(np.int32)
    keep = pipeline.subsample_per_class(labels, 200, seed=0)
    assert len(keep) == 2000
    counts = np.bincount(labels[keep], minlength=10)
    np.testing.assert_array_equal(counts, np.full(10, 200))
    keep2 = pipeline.subsample_per_class(labels, 200, seed=0)
    np.testing.assert_array_equal(keep, keep2)


def test_make_splits_end_to_end():
    from satae.data.ingest import RawDataset
    imgs, labels, classes = make_synthetic_eurosat(per_class=50)
    raw = RawDataset(imgs, labels, classes)
    cfg = DataConfig(per_class=30)
    splits = pipeline.make_splits(raw, cfg)
    n = 30 * 10
    assert len(splits.train) == int(0.7 * n)
    assert len(splits.val) == int(0.15 * n)
    assert len(splits.test) == n - int(0.7 * n) - int(0.15 * n)


def test_confusion_and_report_match_sklearn():
    from sklearn.metrics import classification_report as sk_report
    from sklearn.metrics import confusion_matrix as sk_cm
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 10, 500)
    y_pred = rng.integers(0, 10, 500)
    cm = M.confusion_matrix(y_true, y_pred, 10)
    np.testing.assert_array_equal(cm, sk_cm(y_true, y_pred, labels=range(10)))
    ours = M.classification_report(y_true, y_pred, 10, digits=4)
    theirs = sk_report(y_true, y_pred, labels=range(10), digits=4)
    # compare the numeric table cell-for-cell (layout whitespace may differ)
    assert ours.split() == theirs.split()
    # precomputed-cm fast path (skips the device round-trip) is identical
    assert M.classification_report(y_true, y_pred, 10, digits=4, cm=cm) == ours


def test_batch_iterator_covers_dataset():
    ds = pipeline.ArrayDataset(
        np.arange(130 * 2, dtype=np.uint8).reshape(130, 2, 1, 1),
        np.arange(130, dtype=np.int32))
    seen = []
    for imgs, labels in pipeline.iter_batches(ds, 64, shuffle=True, seed=1):
        assert len(imgs) == len(labels)
        seen.extend(labels.tolist())
    assert sorted(seen) == list(range(130))
    # shuffle varies by epoch, deterministic per (seed, epoch)
    e0 = [l for _, ls in pipeline.iter_batches(ds, 64, shuffle=True, seed=1,
                                               epoch=0) for l in ls]
    e0b = [l for _, ls in pipeline.iter_batches(ds, 64, shuffle=True, seed=1,
                                                epoch=0) for l in ls]
    e1 = [l for _, ls in pipeline.iter_batches(ds, 64, shuffle=True, seed=1,
                                               epoch=1) for l in ls]
    assert e0 == e0b and e0 != e1
