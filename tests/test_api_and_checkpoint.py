"""API surface (fit/encode/predict), checkpoint round-trip, grid store."""

import json

import numpy as np
import pytest

from satae.config import (AETrainConfig, DataConfig, MLPTrainConfig,
                          ModelConfig, PipelineConfig, RuntimeConfig)
from satae.api import SatAEPipeline
from satae.data.ingest import RawDataset
from satae.data.synthetic import make_synthetic_eurosat
from satae.io.checkpoint import GridResultStore, load_pytree, save_pytree

TINY = PipelineConfig(
    data=DataConfig(per_class=24, image_size=32, batch_size=32),
    model=ModelConfig(latent_dim=16, encoder_channels=(4, 8, 16, 16),
                      mlp_hidden=(32, 16)),
    ae=AETrainConfig(alphas=(35.0,), learning_rates=(2e-3,), max_epochs=2,
                     patience=15),
    mlp=MLPTrainConfig(learning_rates=(1e-3,), epochs=2),
    runtime=RuntimeConfig(seed=0),
)


@pytest.fixture(scope="module")
def raw():
    imgs, labels, classes = make_synthetic_eurosat(per_class=24, image_size=32,
                                                   seed=0)
    return RawDataset(imgs, labels, classes)


@pytest.mark.quick
def test_fit_encode_predict_save_load(raw, tmp_path):
    pipe = SatAEPipeline(TINY)
    summary = pipe.fit(raw, grid=False, out_dir=str(tmp_path))
    assert np.isfinite(summary.ae_val_loss)
    assert 0.0 <= summary.test_acc <= 1.0

    imgs = raw.images[:10]
    z = pipe.encode(imgs)
    assert z.shape == (10, TINY.model.latent_dim)
    preds = pipe.predict(imgs)
    assert preds.shape == (10,)
    assert set(np.unique(preds)).issubset(set(range(10)))

    # persistence round-trip produces identical predictions
    pipe2 = SatAEPipeline(TINY).load(str(tmp_path))
    np.testing.assert_array_equal(pipe2.predict(imgs), preds)
    np.testing.assert_allclose(pipe2.encode(imgs), z, atol=1e-6)

    # fit artifacts exist
    assert (tmp_path / "ae_global_best.msgpack").exists()
    assert (tmp_path / "mlp_global_best.msgpack").exists()
    assert json.loads((tmp_path / "fit_summary.json").read_text())


def test_fit_reuse_ae(raw, tmp_path):
    """fit(reuse_ae=True): the notebook's phase-2 restart (reload best AE,
    train only the MLP stage, Report.md:2590-2733). The encoder must come
    through untouched; the out dir must be fully load()-able."""
    src = tmp_path / "src"
    pipe = SatAEPipeline(TINY)
    pipe.fit(raw, grid=False, out_dir=str(src))
    z_before = pipe.encode(raw.images[:8])

    # restart: AE only, then MLP stage on top
    dst = tmp_path / "dst"
    pipe2 = SatAEPipeline(TINY).load_ae(str(src))
    with pytest.raises(FileNotFoundError):
        SatAEPipeline(TINY).load_ae(str(tmp_path / "nope"))
    summary = pipe2.fit(raw, reuse_ae=True, out_dir=str(dst))
    assert summary.ae_val_loss is None
    assert summary.ae_hparams == {"reused": True}
    assert 0.0 <= summary.test_acc <= 1.0
    assert summary.stage_seconds["ae"] < 5.0  # skipped, not retrained
    # encoder untouched: identical latents
    np.testing.assert_allclose(pipe2.encode(raw.images[:8]), z_before,
                               atol=1e-6)
    # dst is a complete run dir (AE re-saved alongside the new MLP)
    pipe3 = SatAEPipeline(TINY).load(str(dst))
    np.testing.assert_array_equal(pipe3.predict(raw.images[:8]),
                                  pipe2.predict(raw.images[:8]))

    # reuse without a loaded AE is an explicit error
    with pytest.raises(ValueError, match="reuse_ae"):
        SatAEPipeline(TINY).fit(raw, reuse_ae=True)

    # AE-only pipelines: encode works, classifying surfaces raise a clear
    # error (not an opaque None-tree crash inside jit)
    ae_only = SatAEPipeline(TINY).load_ae(str(src))
    assert ae_only.encode(raw.images[:4]).shape == (4, TINY.model.latent_dim)
    for call in (lambda: ae_only.predict(raw.images[:4]),
                 lambda: ae_only.predict_proba(raw.images[:4]),
                 lambda: ae_only.predict_batched(raw.images[:4])):
        with pytest.raises(RuntimeError, match="no classifier"):
            call()
    # ...but save/export persist what exists (the migration conversion leg)
    ae_dir = tmp_path / "ae_only"
    ae_only.save(str(ae_dir))
    assert (ae_dir / "ae_global_best.msgpack").exists()
    assert not (ae_dir / "mlp_global_best.msgpack").exists()
    np.testing.assert_allclose(
        SatAEPipeline(TINY).load_ae(str(ae_dir)).encode(raw.images[:4]),
        ae_only.encode(raw.images[:4]), atol=1e-6)
    ae_only.export_torch(str(tmp_path / "ae_pt"))
    assert (tmp_path / "ae_pt" / "AE_GLOBAL_BEST.pt").exists()
    assert not (tmp_path / "ae_pt" / "MLP_GLOBAL_BEST.pt").exists()

    # same-dir reuse (the CLI --reuse-ae default) must NOT clobber the
    # winner's selection meta in ae_global_best.json
    meta_before = json.loads((src / "ae_global_best.json").read_text())
    assert "alpha" in meta_before
    SatAEPipeline(TINY).load_ae(str(src)).fit(raw, reuse_ae=True,
                                              out_dir=str(src))
    assert json.loads((src / "ae_global_best.json").read_text()) \
        == meta_before

    # ...but a reuse fit into a DIFFERENT dir holding a stale AE must
    # overwrite it (old AE + new MLP would serve garbage silently)
    stale = tmp_path / "stale"
    SatAEPipeline(TINY).fit(raw, grid=False, out_dir=str(stale))
    import jax

    from satae.models.supervised_ae import supervised_ae_init
    other = SatAEPipeline(TINY)
    other.ae_params, other.ae_bn_state = supervised_ae_init(
        jax.random.PRNGKey(99), TINY.model, image_size=TINY.data.image_size)
    other.fit(raw, reuse_ae=True, out_dir=str(stale))
    served = SatAEPipeline(TINY).load(str(stale))
    np.testing.assert_allclose(served.encode(raw.images[:4]),
                               other.encode(raw.images[:4]), atol=1e-6)

    # grid variant runs the MLP lr grid only (no validation_losses.json
    # from an AE sweep, but an mlp store + winner)
    dst2 = tmp_path / "dst2"
    pipe4 = SatAEPipeline(TINY).load_ae(str(src))
    s4 = pipe4.fit(raw, grid=True, reuse_ae=True, out_dir=str(dst2))
    assert s4.ae_hparams == {"reused": True}
    assert (dst2 / "mlp_global_best.msgpack").exists()
    assert (dst2 / "ae_global_best.msgpack").exists()
    assert not (dst2 / "validation_losses.json").exists()


def test_encode_sees_reassigned_params(raw):
    """Directly reassigning ae_params/ae_bn_state after a first encode()
    must take effect (the pre-cast tree cache once served stale weights)."""
    import jax

    from satae.models.mlp import mlp_init
    from satae.models.supervised_ae import supervised_ae_init

    def init(seed):
        return supervised_ae_init(jax.random.PRNGKey(seed), TINY.model,
                                  image_size=TINY.data.image_size)

    pipe = SatAEPipeline(TINY)
    pipe.ae_params, pipe.ae_bn_state = init(0)
    pipe.mlp_params, pipe.mlp_bn_state = mlp_init(jax.random.PRNGKey(0),
                                                  TINY.model)
    imgs = raw.images[:8]
    z0 = pipe.encode(imgs)
    pipe.ae_params, pipe.ae_bn_state = init(1)
    z1 = pipe.encode(imgs)
    assert not np.allclose(z0, z1), "reassigned encoder weights ignored"
    fresh = SatAEPipeline(TINY)
    fresh.ae_params, fresh.ae_bn_state = init(1)
    np.testing.assert_allclose(z1, fresh.encode(imgs), atol=1e-6)
    # predict_batched chains encode->MLP on device; must match predict()
    np.testing.assert_array_equal(pipe.predict_batched(imgs),
                                  pipe.predict(imgs))
    # encode_batched (fixed-chunk bulk path) must match encode()
    np.testing.assert_allclose(pipe.encode_batched(imgs), pipe.encode(imgs),
                               atol=1e-6)
    # empty input: defined, empty result
    assert pipe.predict_batched(
        np.zeros((0, 32, 32, 3), np.uint8)).shape == (0,)
    assert pipe.encode_batched(
        np.zeros((0, 32, 32, 3), np.uint8)).shape == (0, TINY.model.latent_dim)
    # probabilities: normalized, argmax-consistent, batched path identical
    probs = pipe.predict_proba(imgs)
    assert probs.shape == (len(imgs), TINY.model.num_classes)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(probs.argmax(-1), pipe.predict(imgs))
    np.testing.assert_allclose(pipe.predict_proba_batched(imgs), probs,
                               atol=1e-6)
    assert pipe.predict_proba_batched(
        np.zeros((0, 32, 32, 3), np.uint8)).shape == (0, 10)
    # ...and on the non-batched serving paths too
    empty = np.zeros((0, 32, 32, 3), np.uint8)
    assert pipe.encode(empty).shape == (0, TINY.model.latent_dim)
    assert pipe.predict(empty).shape == (0,)
    assert pipe.predict_proba(empty).shape == (0, 10)
    # [-1,1]-standardized floats must be rejected, not silently clipped
    with pytest.raises(ValueError, match="min="):
        pipe.encode(np.full((2, 32, 32, 3), -0.5, np.float32))


def test_fit_with_grid(raw, tmp_path):
    cfg = TINY
    pipe = SatAEPipeline(cfg)
    summary = pipe.fit(raw, grid=True, out_dir=str(tmp_path))
    assert summary.ae_hparams == {"alpha": 35.0, "lr": 2e-3}
    assert (tmp_path / "validation_losses.json").exists()
    assert (tmp_path / "mlp_results.json").exists()
    # grid fits must ALSO write the shared artifacts (ADVICE r2: the
    # winner-resave guard once swallowed these, breaking evaluate-after-fit
    # class names)
    assert (tmp_path / "fit_summary.json").exists()
    assert (tmp_path / "classes.json").exists()
    store = GridResultStore(tmp_path / "validation_losses.json")
    assert GridResultStore.key(alpha=35.0, lr=2e-3) in store

    # API-level resume: rerunning fit on the populated out_dir must skip
    # every cached config, reload the recorded winner from its checkpoint,
    # and select the same hparams with the same metrics
    summary2 = SatAEPipeline(cfg).fit(raw, grid=True, out_dir=str(tmp_path))
    assert summary2.ae_hparams == summary.ae_hparams
    assert summary2.mlp_hparams == summary.mlp_hparams
    assert summary2.ae_val_loss == pytest.approx(summary.ae_val_loss)


def test_pytree_roundtrip(tmp_path):
    import jax.numpy as jnp
    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))}}
    save_pytree(tmp_path / "t.msgpack", tree)
    like = {"a": jnp.zeros(5), "b": {"c": jnp.zeros((2, 3))}}
    out = load_pytree(tmp_path / "t.msgpack", like)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(5.0))
    np.testing.assert_array_equal(np.asarray(out["b"]["c"]), np.ones((2, 3)))


def test_orbax_backend_roundtrip(tmp_path):
    import jax.numpy as jnp

    from satae.io.orbax_io import load_model_orbax, save_model_orbax
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    bn = {"m": jnp.ones(3)}
    save_model_orbax(tmp_path / "ckpt", params, bn, meta={"alpha": 35.0})
    p2, b2 = load_model_orbax(tmp_path / "ckpt", params, bn)
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(np.asarray(b2["m"]), np.asarray(bn["m"]))
    assert (tmp_path / "ckpt.meta.json").exists()


def test_package_level_api_import():
    import satae

    assert hasattr(satae.SatAEPipeline, "fit")
    assert callable(satae.fit)


def test_grid_store(tmp_path):
    store = GridResultStore(tmp_path / "res.json")
    k1 = GridResultStore.key(alpha=35.0, lr=0.005)
    store.record(k1, {"best_val_loss": 0.54, "alpha": 35.0, "lr": 0.005})
    store.record(GridResultStore.key(alpha=20.0, lr=0.1),
                 {"best_val_loss": 1.2, "alpha": 20.0, "lr": 0.1})
    best = store.best("best_val_loss", "min")
    assert best["alpha"] == 35.0
    # persisted across instances
    store2 = GridResultStore(tmp_path / "res.json")
    assert k1 in store2


def test_load_grid_results_restores_strict_json(tmp_path):
    """The shared validation_losses.json loader turns strict-JSON "inf"/"nan"
    strings (diverged configs) back into floats for consumer arithmetic."""
    from satae.io.checkpoint import load_grid_results

    p = tmp_path / "validation_losses.json"
    p.write_text('{"k": {"alpha": 20.0, "lr": 0.1, "best_val_loss": "inf"},'
                 ' "j": {"alpha": 25.0, "lr": 0.1, "best_val_loss": 0.5}}')
    r = load_grid_results(p)
    assert r["k"]["best_val_loss"] == float("inf")
    assert isinstance(r["k"]["best_val_loss"], float)
    assert r["j"]["best_val_loss"] == 0.5


def test_json_artifacts_are_strict_json(tmp_path):
    """Diverged configs produce inf/NaN val losses; the persisted JSON must
    stay strict-parseable (no Infinity/NaN literals, which jq/JS reject) and
    round-trip back to floats."""
    import json
    import math

    from satae.io.checkpoint import save_model

    def strict_loads(text):
        def reject(_s):
            raise AssertionError("non-standard JSON literal emitted")
        return json.loads(text, parse_constant=reject)

    store = GridResultStore(tmp_path / "res.json")
    store.record(GridResultStore.key(alpha=20.0, lr=0.1),
                 {"best_val_loss": float("inf"), "alpha": 20.0, "lr": 0.1})
    store.record(GridResultStore.key(alpha=20.0, lr=0.05),
                 {"best_val_loss": float("nan"), "alpha": 20.0, "lr": 0.05})
    store.record(GridResultStore.key(alpha=35.0, lr=0.005),
                 {"best_val_loss": 0.54, "alpha": 35.0, "lr": 0.005})
    strict_loads((tmp_path / "res.json").read_text())
    # reload restores numerics: best() arithmetic and resume both work
    store2 = GridResultStore(tmp_path / "res.json")
    assert store2.best("best_val_loss", "min")["alpha"] == 35.0
    rows = list(store2.results.values())
    assert any(isinstance(r["best_val_loss"], float)
               and math.isinf(r["best_val_loss"]) for r in rows)

    # save_model meta: the all-diverged fallback writes best_val_loss=inf;
    # the sweep resume guard reads it back via float(...)
    save_model(tmp_path / "m.msgpack", {"w": np.zeros(2)}, {},
               meta={"best_val_loss": float("inf"), "diverged": True})
    meta = strict_loads((tmp_path / "m.json").read_text())
    assert math.isinf(float(meta["best_val_loss"]))


def test_mlp_store_invalidated_on_encoder_change(raw, tmp_path):
    """A reuse_ae grid fit into a dir whose MLP sweep was trained on a
    DIFFERENT encoder must invalidate the cached MLP results and winner:
    they were measured on the old encoder's latents, and resuming them
    would silently pair a stale MLP with the new encoder."""
    import jax

    from satae.models.supervised_ae import supervised_ae_init

    run = tmp_path / "run"
    pipe = SatAEPipeline(TINY)
    pipe.fit(raw, grid=True, out_dir=str(run))
    prov0 = json.loads((run / "mlp_provenance.json").read_text())
    store0 = (run / "mlp_results.json").read_text()
    meta0 = (run / "mlp_global_best.json").read_text()

    # same encoder, second grid fit: cache HITS (results unchanged)
    SatAEPipeline(TINY).load_ae(str(run)).fit(raw, grid=True, reuse_ae=True,
                                              out_dir=str(run))
    assert (run / "mlp_results.json").read_text() == store0
    assert json.loads((run / "mlp_provenance.json").read_text()) == prov0

    # foreign encoder: store + winner cleared and retrained
    other = SatAEPipeline(TINY)
    other.ae_params, other.ae_bn_state = supervised_ae_init(
        jax.random.PRNGKey(123), TINY.model, image_size=TINY.data.image_size)
    other.fit(raw, grid=True, reuse_ae=True, out_dir=str(run))
    prov1 = json.loads((run / "mlp_provenance.json").read_text())
    assert prov1["ae_fingerprint"] != prov0["ae_fingerprint"]
    assert (run / "mlp_results.json").read_text() != store0
    assert (run / "mlp_global_best.json").read_text() != meta0


def test_sweepbook_ignores_provenance_meta(tmp_path):
    """A checkpoint meta without selection metrics (api.fit's foreign-AE
    stamp {'reused': true}) must neither compete on resume nor crash
    resolve() with a KeyError when every fresh config diverges; a torn
    meta file degrades the same way."""
    import math

    from satae.train.loop import TrainResult
    from satae.train.sweep_common import SweepBook

    (tmp_path / "ae_global_best.json").write_text('{"reused": true}')
    book = SweepBook(str(tmp_path), ckpt_name="ae_global_best",
                     store_name="validation_losses.json", mode="min",
                     hp_keys=("alpha", "lr"))
    assert book.ckpt_meta == {}
    diverged = TrainResult({"w": np.zeros(2)}, {}, float("inf"),
                           float("nan"), -1, 3, {})
    assert not book.offer(diverged, {"alpha": 20.0, "lr": 0.1})
    res, hp = book.resolve(lambda: ({"w": np.zeros(2)}, {}), "test-sweep")
    assert math.isinf(res.best_val_loss)  # fallback, not KeyError
    assert hp == {"alpha": 20.0, "lr": 0.1}
    # the fallback was checkpointed with the diverged marker
    meta = json.loads((tmp_path / "ae_global_best.json").read_text())
    assert meta.get("diverged") is True

    # torn/truncated meta (crash mid-write predating atomic writes)
    (tmp_path / "torn" ).mkdir()
    (tmp_path / "torn" / "ae_global_best.json").write_text('{"alpha": 2')
    book2 = SweepBook(str(tmp_path / "torn"), ckpt_name="ae_global_best",
                      store_name="validation_losses.json", mode="min",
                      hp_keys=("alpha", "lr"))
    assert book2.ckpt_meta == {}


def test_save_removes_stale_selection_meta(raw, tmp_path):
    """pipe.save() into a dir whose checkpoints carried sweep meta must not
    leave the old sidecars describing weights they were never measured on
    (they'd mislabel the new checkpoints AND compete in a later sweep's
    resume protection)."""
    import jax

    from satae.models.mlp import mlp_init
    from satae.models.supervised_ae import supervised_ae_init

    run = tmp_path / "run"
    SatAEPipeline(TINY).fit(raw, grid=True, out_dir=str(run))
    assert (run / "ae_global_best.json").exists()
    assert (run / "mlp_global_best.json").exists()

    # same-dir round-trip keeps the (accurate) meta
    SatAEPipeline(TINY).load(str(run)).save(str(run))
    assert (run / "ae_global_best.json").exists()
    assert (run / "mlp_global_best.json").exists()

    # foreign weights into the same dir: stale sidecars removed
    other = SatAEPipeline(TINY)
    other.ae_params, other.ae_bn_state = supervised_ae_init(
        jax.random.PRNGKey(7), TINY.model, image_size=TINY.data.image_size)
    other.mlp_params, other.mlp_bn_state = mlp_init(jax.random.PRNGKey(8),
                                                    TINY.model)
    other.save(str(run))
    assert not (run / "ae_global_best.json").exists()
    assert not (run / "mlp_global_best.json").exists()


def test_mlp_engine_config_mismatch_raises():
    """A shared MLPScanEngine compiled for one model config must refuse a
    different config — the compiled epoch body closes over the ORIGINAL,
    so a same-shaped mismatch would silently train the wrong model."""
    import dataclasses as dc

    import pytest as _pytest

    from satae.train.fast_loop import MLPScanEngine, train_mlp_scan

    x = np.random.default_rng(0).normal(size=(64, 16)).astype(np.float32)
    y = np.zeros(64, np.int32)
    engine = MLPScanEngine(TINY.model)
    other_cfg = dc.replace(TINY.model, mlp_dropout=0.0)
    with _pytest.raises(ValueError, match="different model config"):
        train_mlp_scan(x, y, x, y, model_cfg=other_cfg, lr=1e-3,
                       epochs=1, batch_size=32, engine=engine)


def test_reuse_grid_dp_divisibility_validated(raw, tmp_path):
    """grid_dp that doesn't divide n_devices must error loudly on EVERY
    grid path — including reuse_ae fits that skip the AE sweep (the MLP
    sweep would otherwise silently run on a truncated mesh)."""
    import dataclasses as dc

    src = tmp_path / "src"
    SatAEPipeline(TINY).fit(raw, grid=False, out_dir=str(src))
    cfg = dc.replace(TINY, runtime=RuntimeConfig(seed=0, n_devices=8,
                                                 grid_dp=3))
    pipe = SatAEPipeline(cfg).load_ae(str(src))
    with pytest.raises(ValueError, match="divisible"):
        pipe.fit(raw, grid=True, reuse_ae=True, out_dir=str(tmp_path / "d"))
