"""Zip-archive ingestion (the form EuroSAT is distributed in) and the
no-silent-synthetic-fallback contract of load_dataset.

Reference context: the notebook assumes a pre-unzipped class tree for
ImageFolder (Report.md:22-39); satae ingests the archive directly.
"""

import zipfile
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from satae.config import DataConfig
from satae.data.ingest import load_dataset, load_folder, load_zip
from satae.data.synthetic import make_synthetic_eurosat


@pytest.fixture(scope="module")
def tree_and_zip(tmp_path_factory):
    """A tiny class tree plus a EuroSAT.zip-style archive of it (class tree
    nested inside one top-level wrapper folder, as the real distribution)."""
    base = tmp_path_factory.mktemp("zipsrc")
    root = base / "tree"
    imgs, labels, classes = make_synthetic_eurosat(per_class=4, seed=1)
    keep = [c for c in classes[:3]]
    for i in range(len(imgs)):
        cls = classes[labels[i]]
        if cls not in keep:
            continue
        d = root / cls
        d.mkdir(parents=True, exist_ok=True)
        Image.fromarray(imgs[i]).save(d / f"img_{i:04d}.png")
    zp = base / "EuroSAT.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        for p in sorted(root.rglob("*")):
            if p.is_file():
                zf.write(p, arcname=str(Path("2750") / p.relative_to(root)))
    return root, zp


def test_load_zip_matches_folder(tree_and_zip, tmp_path):
    root, zp = tree_and_zip
    ref = load_folder(str(root), 64)
    ds = load_zip(str(zp), 64, cache_dir=str(tmp_path))
    assert ds.classes == ref.classes
    np.testing.assert_array_equal(ds.labels, ref.labels)
    np.testing.assert_array_equal(ds.images, ref.images)


def test_load_zip_extracts_once(tree_and_zip, tmp_path):
    _, zp = tree_and_zip
    ds1 = load_zip(str(zp), 64, cache_dir=str(tmp_path))
    extracted = [d for d in tmp_path.iterdir() if d.is_dir()]
    assert len(extracted) == 1
    marker = extracted[0] / ".satae_extract_complete"
    assert marker.exists()
    stamp = marker.stat().st_mtime_ns
    ds2 = load_zip(str(zp), 64, cache_dir=str(tmp_path))
    assert marker.stat().st_mtime_ns == stamp  # no re-extraction
    np.testing.assert_array_equal(ds1.images, ds2.images)


def test_corrupt_decode_cache_recovers(tree_and_zip, tmp_path):
    """A torn .npz decode cache (crash mid-write before the atomic replace
    existed) must be discarded and re-decoded, not raise forever."""
    root, _ = tree_and_zip
    ref = load_folder(str(root), 64, cache_dir=str(tmp_path))
    (cache,) = tmp_path.glob("*.npz")
    cache.write_bytes(b"PK\x03\x04 torn")
    ds = load_folder(str(root), 64, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(ds.images, ref.images)
    # and the rewritten cache is loadable again
    ds2 = load_folder(str(root), 64, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(ds2.images, ref.images)


def test_load_dataset_accepts_zip_root(tree_and_zip, tmp_path):
    root, zp = tree_and_zip
    cfg = DataConfig(root=str(zp), cache_dir=str(tmp_path))
    ds = load_dataset(cfg)
    assert ds.classes == load_folder(str(root), 64).classes


def test_load_dataset_missing_root_raises(tmp_path):
    cfg = DataConfig(root=str(tmp_path / "nonexistent"))
    with pytest.raises(FileNotFoundError, match="neither a directory"):
        load_dataset(cfg)
    # a non-zip file root also raises rather than training on synthetic
    f = tmp_path / "data.tar"
    f.write_bytes(b"x")
    with pytest.raises(FileNotFoundError):
        load_dataset(DataConfig(root=str(f)))


def test_interrupted_extraction_recovers(tree_and_zip, tmp_path):
    """A dest dir without the completion marker (crash mid-extract) is
    re-extracted, not served half-empty."""
    _, zp = tree_and_zip
    from satae.data.ingest import _zip_extract_dir
    dest = _zip_extract_dir(str(zp), str(tmp_path))
    dest.mkdir(parents=True)
    (dest / "2750").mkdir()  # simulate partial extraction, no marker
    ds = load_zip(str(zp), 64, cache_dir=str(tmp_path))
    assert len(ds) > 0
    assert (dest / ".satae_extract_complete").exists()


def test_macos_metadata_ignored(tree_and_zip, tmp_path):
    """macOS-rezipped archives carry a top-level __MACOSX/ tree of '._*'
    AppleDouble resource forks with image suffixes; neither may become a
    class or an image (PIL cannot decode resource forks, and '__MACOSX'
    as a class label would silently corrupt every label)."""
    root, zp = tree_and_zip
    zp2 = tmp_path / "EuroSAT_mac.zip"
    with zipfile.ZipFile(zp) as src, zipfile.ZipFile(zp2, "w") as dst:
        for item in src.infolist():
            data = src.read(item.filename)
            dst.writestr(item, data)
            if item.filename.endswith(".png"):
                p = Path(item.filename)
                dst.writestr(str(Path("__MACOSX") / p.parent / f"._{p.name}"),
                             b"\x00\x05\x16\x07 not an image")
        dst.writestr(".DS_Store", b"junk")
    ref = load_folder(str(root), 64)
    ds = load_zip(str(zp2), 64, cache_dir=str(tmp_path / "cache"))
    assert ds.classes == ref.classes
    np.testing.assert_array_equal(ds.images, ref.images)


def test_one_class_zip(tmp_path):
    """A sole subdir holding images directly is a CLASS dir, not a wrapper:
    the tree-root search must stop a level above it (descending into it
    would present a classless folder to load_folder)."""
    imgs, labels, classes = make_synthetic_eurosat(per_class=3, seed=2)
    zp = tmp_path / "one_class.zip"
    import io
    from PIL import Image as PILImage
    with zipfile.ZipFile(zp, "w") as zf:
        for i in range(3):
            buf = io.BytesIO()
            PILImage.fromarray(imgs[i]).save(buf, format="PNG")
            zf.writestr(f"wrapper/Forest/img_{i}.png", buf.getvalue())
    ds = load_zip(str(zp), 64, cache_dir=str(tmp_path / "cache"))
    assert ds.classes == ("Forest",)
    assert len(ds) == 3


def test_replaced_zip_evicts_stale_extraction(tree_and_zip, tmp_path):
    """Replacing the archive (new mtime/size) re-extracts under a new key
    AND removes the superseded extraction dir + its decode .npz cache —
    without eviction every refresh would leak a full dataset copy."""
    import os
    import time
    _, zp = tree_and_zip
    zp2 = tmp_path / "EuroSAT.zip"
    zp2.write_bytes(zp.read_bytes())
    cache = tmp_path / "cache"
    load_zip(str(zp2), 64, cache_dir=str(cache))
    old_dirs = {d.name for d in cache.iterdir() if d.is_dir()}
    old_npz = {f.name for f in cache.glob("*.npz")}
    assert old_dirs and old_npz
    os.utime(zp2, (time.time() + 10, time.time() + 10))  # new identity
    load_zip(str(zp2), 64, cache_dir=str(cache))
    new_dirs = {d.name for d in cache.iterdir() if d.is_dir()}
    assert len(new_dirs) == 1 and new_dirs != old_dirs  # old dir evicted
    assert not (old_npz & {f.name for f in cache.glob("*.npz")})


def test_hidden_dirs_inside_class_trees_excluded(tree_and_zip, tmp_path):
    """Images nested in hidden/metadata subdirs of a class dir (Jupyter's
    .ipynb_checkpoints being the classic) must not become labeled training
    images — they are duplicate/stale copies."""
    root, _ = tree_and_zip
    import shutil
    polluted = tmp_path / "tree"
    shutil.copytree(root, polluted)
    ref = load_folder(str(root), 64)
    cls_dir = sorted(d for d in polluted.iterdir() if d.is_dir())[0]
    junk = cls_dir / ".ipynb_checkpoints"
    junk.mkdir()
    src = sorted(cls_dir.glob("*.png"))[0]
    (junk / f"{src.stem}-checkpoint.png").write_bytes(src.read_bytes())
    ds = load_folder(str(polluted), 64)
    assert len(ds) == len(ref)
    np.testing.assert_array_equal(ds.labels, ref.labels)


def test_zip_stem_with_glob_metacharacters(tree_and_zip, tmp_path):
    """Archive names like 'EuroSAT[2024].zip' must still ingest AND still
    evict their own superseded extractions (an unescaped glob pattern would
    treat [2024] as a character class and leak a dataset copy per
    replacement)."""
    import os
    import time
    _, zp = tree_and_zip
    zp2 = tmp_path / "EuroSAT[2024].zip"
    zp2.write_bytes(zp.read_bytes())
    cache = tmp_path / "cache"
    ds = load_zip(str(zp2), 64, cache_dir=str(cache))
    assert len(ds) > 0
    old_dirs = {d.name for d in cache.iterdir() if d.is_dir()}
    os.utime(zp2, (time.time() + 10, time.time() + 10))
    load_zip(str(zp2), 64, cache_dir=str(cache))
    new_dirs = {d.name for d in cache.iterdir() if d.is_dir()}
    assert len(new_dirs) == 1 and new_dirs != old_dirs


def test_same_second_zip_replacement_reextracts(tree_and_zip, tmp_path):
    """A same-size archive replaced within the same wall-clock second must
    still get a fresh extraction (identity hashes mtime at ns resolution;
    whole-second truncation would silently serve the previous archive)."""
    import os
    _, zp = tree_and_zip
    zp2 = tmp_path / "EuroSAT.zip"
    zp2.write_bytes(zp.read_bytes())
    cache = tmp_path / "cache"
    load_zip(str(zp2), 64, cache_dir=str(cache))
    old_dirs = {d.name for d in cache.iterdir() if d.is_dir()}
    st = os.stat(zp2)
    # same size, same whole second, different nanoseconds
    os.utime(zp2, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    load_zip(str(zp2), 64, cache_dir=str(cache))
    new_dirs = {d.name for d in cache.iterdir() if d.is_dir()}
    assert new_dirs != old_dirs


def test_corrupt_image_error_names_file(tree_and_zip, tmp_path):
    """A truncated/corrupt image must fail with the offending PATH in the
    message — PIL's bare 'image file is truncated' OSError 20k files into a
    real EuroSAT decode is undebuggable."""
    root, _ = tree_and_zip
    bad_root = tmp_path / "tree"
    import shutil
    shutil.copytree(root, bad_root)
    victim = sorted(bad_root.rglob("*.png"))[0]
    victim.write_bytes(victim.read_bytes()[:40])  # truncate mid-header
    with pytest.raises(ValueError, match=victim.name):
        load_folder(str(bad_root), 64)


def test_concurrent_extraction_safe(tree_and_zip, tmp_path):
    """N processes ingesting the same archive into one fresh cache dir must
    all succeed with identical data (each extracts privately; exactly one
    atomic rename wins) — the docstring's concurrency contract, exercised
    for real."""
    import subprocess
    import sys

    _, zp = tree_and_zip
    cache = tmp_path / "cache"
    script = (
        "import sys; sys.path.insert(0, {root!r})\n"
        "from satae.data.ingest import load_zip\n"
        "ds = load_zip({zp!r}, 64, cache_dir={cache!r})\n"
        "print(len(ds), ','.join(ds.classes))\n"
    ).format(root=str(Path(__file__).resolve().parent.parent),
             zp=str(zp), cache=str(cache))
    procs = [subprocess.Popen([sys.executable, "-c", script],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE)
             for _ in range(3)]
    outs = [p.communicate(timeout=300) for p in procs]
    assert all(p.returncode == 0 for p in procs), \
        [e.decode()[-500:] for _, e in outs]
    lines = {o.decode().strip().splitlines()[-1] for o, _ in outs}
    assert len(lines) == 1  # identical count + classes from every process
    dirs = [d for d in cache.iterdir() if d.is_dir()]
    assert len(dirs) == 1  # one extraction survives, no leaked tmp dirs
