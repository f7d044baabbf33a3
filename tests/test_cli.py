"""In-process CLI tests: fit -> evaluate round trip at tiny scale on the CPU
test platform (the verify skill drives the same flows on TPU)."""

import json

import pytest

from satae.cli import main


def test_cli_fit_then_evaluate(tmp_path, capsys):
    out = str(tmp_path / "run")
    main(["fit", "--per-class", "12", "--ae-epochs", "1",
          "--mlp-epochs", "1", "--out", out, "--seed", "0",
          "--cache-dir", str(tmp_path / "cache")])
    captured = capsys.readouterr().out
    summary = json.loads(captured[captured.index("{"):])
    assert 0.0 <= summary["test_acc"] <= 1.0
    assert (tmp_path / "run" / "ae_global_best.msgpack").exists()
    assert (tmp_path / "run" / "classes.json").exists()

    main(["evaluate", "--per-class", "12", "--out", out, "--seed", "0",
          "--split", "test", "--cache-dir", str(tmp_path / "cache")])
    report = capsys.readouterr().out
    assert "weighted avg" in report
    assert "accuracy:" in report
    # class names restored from classes.json, not numeric ids
    assert "SeaLake" in report
    # the report text is persisted alongside the confusion PNG
    saved = (tmp_path / "run" / "classification_report_test.txt").read_text()
    assert "weighted avg" in saved and "SeaLake" in saved
    assert (tmp_path / "run" / "confusion_test.png").exists()

    main(["extract", "--per-class", "12", "--out", out, "--seed", "0",
          "--plot", "--cache-dir", str(tmp_path / "cache")])
    import numpy as np
    z = np.load(tmp_path / "run" / "latents_test.npz")
    n_test = 120 - int(0.7 * 120) - int(0.15 * 120)
    assert z["X"].shape == (n_test, 64) and z["y"].shape == (n_test,)
    for split in ("train", "val", "test"):
        assert (tmp_path / "run" / f"latent_space_{split}.png").exists()


def test_cli_report_renders_from_artifacts(tmp_path):
    """`satae report` re-renders figures from saved artifacts alone:
    latent scatters from latents_{split}.npz + classes.json (no model)."""
    import json

    import numpy as np

    run = tmp_path / "run"
    run.mkdir()
    rng = np.random.default_rng(0)
    np.savez(run / "latents_test.npz",
             X=rng.normal(size=(40, 64)).astype(np.float32),
             y=rng.integers(0, 10, 40))
    (run / "classes.json").write_text(json.dumps(
        [f"c{i}" for i in range(10)]))
    main(["report", "--out", str(run)])
    assert (run / "latent_space_test.png").exists()
    assert not (run / "latent_space_train.png").exists()  # no npz, no plot


def test_cli_predict_images_to_csv(tmp_path):
    """Serving surface: `satae predict --images DIR` classifies a directory
    of image files against saved checkpoints and writes path,id,name CSV."""
    import csv

    import jax
    import numpy as np
    from PIL import Image

    from satae.api import SatAEPipeline
    from satae.config import EUROSAT_CLASSES
    from satae.models.mlp import mlp_init
    from satae.models.supervised_ae import supervised_ae_init

    pipe = SatAEPipeline()
    cfg = pipe.config
    pipe.ae_params, pipe.ae_bn_state = supervised_ae_init(
        jax.random.PRNGKey(0), cfg.model, image_size=cfg.data.image_size)
    pipe.mlp_params, pipe.mlp_bn_state = mlp_init(jax.random.PRNGKey(1),
                                                  cfg.model)
    pipe.classes = EUROSAT_CLASSES
    out = tmp_path / "run"
    out.mkdir()
    pipe.save(str(out))

    # class-tree layout: scan_images must recurse (ImageFolder-style dirs
    # are the natural thing a reference user points --images at)
    imgdir = tmp_path / "imgs"
    (imgdir / "ClassA").mkdir(parents=True)
    (imgdir / "ClassB").mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        sub = "ClassA" if i < 3 else "ClassB"
        Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
                        ).save(imgdir / sub / f"img{i}.png")

    main(["predict", "--out", str(out), "--images", str(imgdir)])
    with open(out / "predictions.csv", newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["path", "class_id", "class_name", "confidence"]
    assert len(rows) == 6
    for path, cid, cname, conf in rows[1:]:
        assert path.endswith(".png")
        assert EUROSAT_CLASSES[int(cid)] == cname
        assert 0.0 < float(conf) <= 1.0

    # direct predictions on the same decoded images must match the CSV
    # (scan_images order = sorted full paths: ClassA/* then ClassB/*)
    srcs = [imgdir / ("ClassA" if i < 3 else "ClassB") / f"img{i}.png"
            for i in range(5)]
    direct = pipe.predict_batched(np.stack(
        [np.asarray(Image.open(p)) for p in srcs]))
    assert [int(r[1]) for r in rows[1:]] == [int(c) for c in direct]

    # --proba adds one normalized probability column per class, with the
    # confidence column equal to the row max
    main(["predict", "--out", str(out), "--images", str(imgdir), "--proba",
          "--csv", str(out / "proba.csv")])
    with open(out / "proba.csv", newline="") as f:
        prows = list(csv.reader(f))
    assert prows[0] == (["path", "class_id", "class_name", "confidence"]
                        + [f"p_{c}" for c in EUROSAT_CLASSES])
    for r in prows[1:]:
        ps = [float(x) for x in r[4:]]
        assert abs(sum(ps) - 1.0) < 1e-2  # 4-decimal rounding
        assert abs(max(ps) - float(r[3])) < 1e-3
        assert int(np.argmax(ps)) == int(r[1])

    # --images also accepts an unextracted .zip of the same tree (like
    # --data): identical class_ids in the same sorted order
    import zipfile
    zp = tmp_path / "imgs.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        for p in sorted(imgdir.rglob("*.png")):
            zf.write(p, arcname=str(p.relative_to(imgdir)))
    main(["predict", "--out", str(out), "--images", str(zp),
          "--cache-dir", str(tmp_path / "zcache"),
          "--csv", str(out / "zip.csv")])
    with open(out / "zip.csv", newline="") as f:
        zrows = list(csv.reader(f))
    assert [r[1] for r in zrows[1:]] == [r[1] for r in rows[1:]]


def test_cli_fit_ae_torch(tmp_path, capsys):
    """`satae fit --ae-torch PT`: the notebook-user's mid-pipeline migration
    at the CLI surface — a reference AE_GLOBAL_BEST.pt in, extraction + MLP
    training only (no AE stage), a complete satae run dir out."""
    import jax

    from satae.config import PipelineConfig
    from satae.io.torch_export import save_torch_sae
    from satae.models.supervised_ae import supervised_ae_init

    cfg = PipelineConfig()  # CLI default: full-size 64x64 model
    params, state = supervised_ae_init(jax.random.PRNGKey(3), cfg.model,
                                       image_size=cfg.data.image_size)
    ae_pt = tmp_path / "AE_GLOBAL_BEST.pt"
    save_torch_sae(str(ae_pt), params, state, cfg.model,
                   image_size=cfg.data.image_size)

    out = str(tmp_path / "run")
    main(["fit", "--per-class", "12", "--mlp-epochs", "1", "--out", out,
          "--seed", "0", "--ae-torch", str(ae_pt),
          "--cache-dir", str(tmp_path / "cache")])
    captured = capsys.readouterr().out
    summary = json.loads(captured[captured.index("{"):])
    # reused=True + no val loss prove AE training was skipped (a wall-clock
    # bound here flaked under load on this 1-core host)
    assert summary["ae_hparams"] == {"reused": True}
    assert summary["ae_val_loss"] is None
    assert (tmp_path / "run" / "ae_global_best.msgpack").exists()
    assert (tmp_path / "run" / "mlp_global_best.msgpack").exists()


@pytest.mark.parametrize("aug_rng", ["threefry", "rbg"])
def test_cli_calibrate(tmp_path, capsys, aug_rng):
    """calibrate subcommand end-to-end, both PRNG streams (the --aug-rng
    wiring to loss_ratio_calibration once regressed silently)."""
    main(["calibrate", "--per-class", "8", "--n-inits", "3", "--seed", "0",
          "--aug-rng", aug_rng, "--out", str(tmp_path / "cal"),
          "--cache-dir", str(tmp_path / "cache")])
    captured = capsys.readouterr().out
    summary = json.loads(captured[captured.index("{"):])
    # CE/MSE ratio at init is architecture-determined; the reference band is
    # ~30 at 64x64 — any finite positive value proves the path end to end,
    # the scale gate lives in test_aux.py::test_calibration_ratio_scale
    assert summary["median"] > 0 and summary["p95"] >= summary["p5"]
    assert (tmp_path / "cal" / "ratio_histogram.png").exists()
    assert (tmp_path / "cal" / "calibration.json").exists()


def test_cli_report_from_artifacts(tmp_path, capsys):
    results = {f"k{i}": {"alpha": 20.0 + 5 * i, "lr": 1e-3,
                         "best_val_loss": 0.5 + i} for i in range(3)}
    (tmp_path / "validation_losses.json").write_text(json.dumps(results))
    main(["report", "--out", str(tmp_path)])
    assert (tmp_path / "gridsearch_heatmap.png").exists()
