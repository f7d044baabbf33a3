"""Synthetic dataset tiers: shapes, determinism, and hard-tier properties."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from satae.data.synthetic import _HARD, make_synthetic_eurosat


def test_shapes_and_dtypes_both_tiers():
    for diff in ("easy", "hard"):
        imgs, labels, classes = make_synthetic_eurosat(
            per_class=12, image_size=32, seed=0, difficulty=diff)
        assert imgs.shape == (120, 32, 32, 3) and imgs.dtype == np.uint8
        assert labels.shape == (120,) and labels.dtype == np.int32
        assert len(classes) == 10


def test_deterministic_per_seed():
    for diff in ("easy", "hard"):
        a = make_synthetic_eurosat(per_class=8, image_size=32, seed=3,
                                   difficulty=diff)
        b = make_synthetic_eurosat(per_class=8, image_size=32, seed=3,
                                   difficulty=diff)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        c = make_synthetic_eurosat(per_class=8, image_size=32, seed=4,
                                   difficulty=diff)
        assert not np.array_equal(a[0], c[0])


def test_unknown_difficulty_rejected():
    with pytest.raises(ValueError, match="difficulty"):
        make_synthetic_eurosat(per_class=4, difficulty="medium")


def test_hard_tier_label_noise_fraction():
    per_class = 100
    _, labels, _ = make_synthetic_eurosat(per_class=per_class, image_size=32,
                                          seed=0, difficulty="hard")
    clean = np.repeat(np.arange(10), per_class)
    flipped = (labels != clean).mean()
    # flips go to OTHER classes only, so the differing fraction equals the
    # configured rate exactly (up to rounding)
    assert flipped == pytest.approx(_HARD["label_noise"], abs=0.002)


def test_hard_tier_color_pairs_overlap():
    """Classes c and c+5 share most of their palette: their mean colors must
    be much closer to each other than the easy tier's are."""
    per_class = 64
    # hard tier: pairs nearly share a palette (small within-pair distance);
    # easy tier: every class keeps a distinct color (no pair structure)
    for diff, max_ratio in (("hard", 0.45), ("easy", None)):
        imgs, _labels, _ = make_synthetic_eurosat(
            per_class=per_class, image_size=32, seed=0, difficulty=diff)
        clean = np.repeat(np.arange(10), per_class)  # pre-label-noise blocks
        means = np.stack([imgs[clean == c].mean(axis=(0, 1, 2))
                          for c in range(10)])
        within_pair = np.mean([np.linalg.norm(means[c] - means[c + 5])
                               for c in range(5)])
        across = np.mean([np.linalg.norm(means[c] - means[(c + 1) % 5])
                          for c in range(5)])
        if max_ratio is not None:
            assert within_pair < max_ratio * across, \
                f"{diff}: within-pair color distance {within_pair:.1f} not " \
                f"small vs cross-group {across:.1f}"
        else:
            assert within_pair > 0.8 * across, \
                f"{diff}: easy tier should have NO pair collapse " \
                f"({within_pair:.1f} vs {across:.1f})"


def test_synthetic_npz_cache_roundtrip(tmp_path):
    """With cache_dir set, the generated stand-in is cached like real
    decoded images (bitwise-identical reload); the key pins per_class,
    image_size, seed and difficulty."""
    import numpy as np

    from satae.config import DataConfig
    from satae.data.ingest import load_dataset

    cfg = DataConfig(per_class=6, image_size=32, synthetic_difficulty="hard",
                     cache_dir=str(tmp_path))
    a = load_dataset(cfg)
    files = list(tmp_path.glob("synthetic_*.npz"))
    assert len(files) == 1
    b = load_dataset(cfg)
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.labels, b.labels)
    assert a.classes == b.classes
    # a different generation parameter gets its own cache entry
    load_dataset(DataConfig(per_class=6, image_size=32,
                            synthetic_difficulty="easy",
                            cache_dir=str(tmp_path)))
    assert len(list(tmp_path.glob("synthetic_*.npz"))) == 2


def test_synthetic_cache_corrupt_file_self_heals(tmp_path):
    """A truncated cache (interrupted write) is deleted and regenerated
    rather than crashing every subsequent run."""
    import numpy as np

    from satae.config import DataConfig
    from satae.data.ingest import load_dataset

    cfg = DataConfig(per_class=4, image_size=32, cache_dir=str(tmp_path))
    a = load_dataset(cfg)
    (cache_file,) = tmp_path.glob("synthetic_*.npz")
    cache_file.write_bytes(b"not a zip")
    b = load_dataset(cfg)  # must regenerate, not raise
    np.testing.assert_array_equal(a.images, b.images)
    # regenerated cache is valid again
    c = load_dataset(cfg)
    np.testing.assert_array_equal(a.images, c.images)
