"""Native C++ loader: build, decode parity with PIL, and the ingest
integration (decode-once cache)."""

import numpy as np
import pytest
from PIL import Image

from satae.data.synthetic import make_synthetic_eurosat
from satae.io import native_loader as NL


@pytest.fixture(scope="module")
def jpeg_tree(tmp_path_factory):
    """A tiny ImageFolder-style tree of JPEGs from synthetic images."""
    root = tmp_path_factory.mktemp("eurosat")
    imgs, labels, classes = make_synthetic_eurosat(per_class=6, seed=0)
    paths = []
    for i in range(len(imgs)):
        d = root / classes[labels[i]]
        d.mkdir(exist_ok=True)
        p = d / f"img_{i:04d}.jpg"
        Image.fromarray(imgs[i]).save(p, quality=95)
        paths.append(p)
    return root, paths


def test_native_builds():
    assert NL.native_available(), "native loader failed to build"


def test_native_decode_matches_pil(jpeg_tree):
    _, paths = jpeg_tree
    sel = [str(p) for p in paths[:16]]
    ours = NL.decode_batch(sel, 64)
    for i, p in enumerate(sel):
        with Image.open(p) as im:
            ref = np.asarray(im.convert("RGB"), np.uint8)
        # same libjpeg under both; decodes should agree exactly (allow +-1
        # for library version differences in IDCT rounding)
        diff = np.abs(ours[i].astype(int) - ref.astype(int))
        assert diff.max() <= 1, f"decode mismatch for {p}: max diff {diff.max()}"


def test_native_decode_resize(jpeg_tree):
    _, paths = jpeg_tree
    out = NL.decode_batch([str(paths[0])], 32)
    assert out.shape == (1, 32, 32, 3)
    assert out.any()


def test_native_decode_failure_raises(tmp_path):
    bad = tmp_path / "not_a_jpeg.jpg"
    bad.write_bytes(b"hello world")
    with pytest.raises(RuntimeError):
        NL.decode_batch([str(bad)], 64)


def test_ingest_uses_native_and_caches(jpeg_tree, tmp_path):
    from satae.data.ingest import load_folder
    root, paths = jpeg_tree
    ds = load_folder(str(root), 64, cache_dir=str(tmp_path))
    assert len(ds) == len(paths)
    assert ds.images.shape[1:] == (64, 64, 3)
    assert len(ds.classes) == 10
    # labels follow sorted class-dir order (ImageFolder semantics)
    assert ds.classes == tuple(sorted(ds.classes))
    # second load hits the .npz cache and is identical
    ds2 = load_folder(str(root), 64, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(ds.images, ds2.images)
    np.testing.assert_array_equal(ds.labels, ds2.labels)
    caches = list(tmp_path.glob("*.npz"))
    assert len(caches) == 1
