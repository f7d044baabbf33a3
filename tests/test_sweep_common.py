"""Direct tests of the shared sweep bookkeeping (satae.train.sweep_common).

The engines' integration tests (resume, all-diverged, winner selection)
cover SweepBook end-to-end; these pin the contract itself so a future
engine can rely on it without re-deriving the semantics.
"""

import json
import math

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from satae.io.checkpoint import GridResultStore
from satae.train.loop import TrainResult
from satae.train.sweep_common import SweepBook, save_best_checkpoint


def _res(metric, *, mode="min", tag=0.0):
    """A TrainResult whose params identify it (tag) and whose selection
    metric is `metric` under the given mode."""
    loss = metric if mode == "min" else 1.0
    acc = metric if mode == "max" else 0.5
    return TrainResult({"w": np.full((2,), tag, np.float32)}, {},
                       loss, acc, 3, 10, {})


def _book(tmp_path, mode="min"):
    return SweepBook(str(tmp_path), ckpt_name="ae_global_best",
                     store_name="validation_losses.json", mode=mode,
                     hp_keys=("alpha", "lr"))


def test_offer_tracks_best_and_checkpoints(tmp_path):
    book = _book(tmp_path)
    assert book.offer(_res(1.0, tag=1), {"alpha": 20.0, "lr": 1e-3})
    assert not book.offer(_res(2.0, tag=2), {"alpha": 20.0, "lr": 1e-2})
    assert book.offer(_res(0.5, tag=3), {"alpha": 35.0, "lr": 1e-3})
    meta = json.loads((tmp_path / "ae_global_best.json").read_text())
    assert meta["best_val_loss"] == 0.5 and meta["alpha"] == 35.0
    best, hp = book.resolve(lambda: ({"w": np.zeros(2, np.float32)}, {}),
                            "test sweep")
    assert hp == {"alpha": 35.0, "lr": 1e-3}
    assert best.params["w"][0] == 3  # the winner's own weights, not a reload


def test_resume_checkpoint_competes_and_reloads(tmp_path):
    # a previous run checkpointed a winner at 0.4
    save_best_checkpoint(str(tmp_path), "ae_global_best",
                         {"w": np.full((2,), 9.0, np.float32)}, {},
                         {"alpha": 25.0, "lr": 2e-3}, _res(0.4, tag=9))
    book = _book(tmp_path)
    assert book.ckpt_metric == 0.4
    # a fresh config WORSE than the checkpoint never becomes best...
    assert not book.offer(_res(0.6, tag=1), {"alpha": 20.0, "lr": 1e-3})
    # ...and resolve reloads the checkpointed winner (params included)
    best, hp = book.resolve(lambda: ({"w": np.zeros(2, np.float32)}, {}),
                            "test sweep")
    assert hp == {"alpha": 25.0, "lr": 2e-3}
    assert best.best_val_loss == 0.4
    np.testing.assert_array_equal(best.params["w"], 9.0)
    # a fresh config BETTER than the checkpoint takes over
    book2 = _book(tmp_path)
    assert book2.offer(_res(0.3, tag=2), {"alpha": 30.0, "lr": 1e-3})
    best2, hp2 = book2.resolve(lambda: (None, None), "test sweep")
    assert hp2 == {"alpha": 30.0, "lr": 1e-3}
    assert best2.params["w"][0] == 2


def test_all_diverged_fallback_checkpoints(tmp_path):
    book = _book(tmp_path)
    assert not book.offer(_res(float("nan"), tag=1), {"alpha": 20.0, "lr": 0.1})
    assert not book.offer(_res(float("inf"), tag=2), {"alpha": 25.0, "lr": 0.1})
    finalized = []
    best, hp = book.resolve(lambda: (None, None), "test sweep",
                            finalize=lambda r: finalized.append(r) or r)
    # least-bad ordering (inherited from the engines' nan_to_num keying):
    # inf-diverged beats NaN-diverged, so the second config is the fallback
    assert hp["alpha"] == 25.0
    assert finalized, "finalize hook must run on the fallback"
    meta = json.loads((tmp_path / "ae_global_best.json").read_text(),
                      parse_constant=lambda s: pytest.fail("non-strict JSON"))
    assert meta["diverged"] is True
    assert math.isinf(float(meta["best_val_loss"]))


def test_empty_sweep_raises(tmp_path):
    with pytest.raises(RuntimeError, match="no result"):
        _book(tmp_path).resolve(lambda: (None, None), "test sweep")


def test_max_mode_mlp_contract(tmp_path):
    book = SweepBook(str(tmp_path), ckpt_name="mlp_global_best",
                     store_name="mlp_results.json", mode="max",
                     hp_keys=("lr",))
    assert book.offer(_res(0.7, mode="max", tag=1), {"lr": 1e-4})
    assert not book.offer(_res(0.6, mode="max", tag=2), {"lr": 1e-3})
    assert book.fallback_hp == {"lr": 1e-4}  # symmetric fallback tracking
    meta = json.loads((tmp_path / "mlp_global_best.json").read_text())
    assert meta["best_val_acc"] == 0.7
    # resume: checkpoint at 0.7 beats a fresh 0.65
    book2 = SweepBook(str(tmp_path), ckpt_name="mlp_global_best",
                      store_name="mlp_results.json", mode="max",
                      hp_keys=("lr",))
    assert not book2.offer(_res(0.65, mode="max", tag=3), {"lr": 5e-4})
    best, hp = book2.resolve(lambda: ({"w": np.zeros(2, np.float32)}, {}),
                             "test sweep")
    assert hp == {"lr": 1e-4} and best.best_val_acc == 0.7


def test_max_mode_all_diverged_fallback(tmp_path):
    """mode='max' degrades like mode='min' when every config's selection
    metric is non-finite (NaN accuracies from fully-NaN logits): least-bad
    end-of-run model returned + checkpointed with the diverged marker
    (VERDICT r2 weak #4 symmetrization)."""
    book = SweepBook(str(tmp_path), ckpt_name="mlp_global_best",
                     store_name="mlp_results.json", mode="max",
                     hp_keys=("lr",))
    assert not book.offer(_res(float("nan"), mode="max", tag=1), {"lr": 1e-4})
    assert not book.offer(_res(float("nan"), mode="max", tag=2), {"lr": 1e-3})
    best, hp = book.resolve(lambda: (None, None), "test sweep")
    assert hp == {"lr": 1e-4}  # first NaN config wins the tie (cand equal)
    assert best.params["w"][0] == 1
    meta = json.loads((tmp_path / "mlp_global_best.json").read_text(),
                      parse_constant=lambda s: pytest.fail("non-strict JSON"))
    assert meta["diverged"] is True


def test_max_mode_finite_beats_nan(tmp_path):
    """A finite-accuracy config must out-rank any NaN config in the max-mode
    fallback ordering."""
    book = SweepBook(None, ckpt_name="mlp_global_best",
                     store_name="mlp_results.json", mode="max",
                     hp_keys=("lr",))
    book.offer(_res(float("nan"), mode="max", tag=1), {"lr": 1e-4})
    book.offer(_res(0.1, mode="max", tag=2), {"lr": 1e-3})
    assert book.fallback_hp == {"lr": 1e-3}
    # 0.1 is finite, so it also simply became the best
    assert book.best_hp == {"lr": 1e-3}


def test_cached_results_roundtrip(tmp_path):
    book = _book(tmp_path)
    key = GridResultStore.key(alpha=20.0, lr=1e-3)
    book.record(key, {"alpha": 20.0, "lr": 1e-3, "best_val_loss": 0.9})
    book2 = _book(tmp_path)
    assert book2.cached(key)
    assert book2.results[key]["best_val_loss"] == 0.9
    assert not book2.cached(GridResultStore.key(alpha=20.0, lr=1e-2))
