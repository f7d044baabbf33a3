"""parity_vs_reference.md evidence-pack writer (satae/eval/parity_report.py)
— exercised locally on constructed confusion matrices so the real-EuroSAT
gate's report path is verified before a data-bearing environment runs it."""

import numpy as np
import pytest

from satae.eval.metrics import per_class_metrics
from satae.eval.parity_report import (REFERENCE_CLASSES, REFERENCE_PER_CLASS,
                                      check_parity_gate,
                                      forest_sealake_confusion,
                                      write_parity_report)

pytestmark = pytest.mark.quick


def _cm_diag(n=30):
    """Near-diagonal 10-class confusion matrix (no Forest collapse)."""
    cm = np.eye(10, dtype=np.int64) * n
    cm[0, 2] = 3  # a little off-diagonal mass
    return cm


def _cm_forest_collapse(n=30):
    """Reference-like structure: Forest mostly predicted SeaLake."""
    cm = np.eye(10, dtype=np.int64) * n
    f, s = 1, 9
    cm[f, f] = 1
    cm[f, s] = n - 1
    return cm


def test_report_contains_all_reference_rows(tmp_path):
    cm = _cm_diag()
    m = per_class_metrics(cm)
    text = write_parity_report(m, cm, REFERENCE_CLASSES,
                               tmp_path / "parity_vs_reference.md")
    assert (tmp_path / "parity_vs_reference.md").exists()
    for name in REFERENCE_PER_CLASS:
        assert f"| {name} |" in text
    assert "| macro avg |" in text and "| weighted avg |" in text
    # deltas are signed
    assert "+0." in text or "-0." in text
    # near-perfect run does NOT reproduce the reference collapse
    assert "does NOT reproduce" in text


def test_report_detects_reference_confusion_structure(tmp_path):
    cm = _cm_forest_collapse()
    m = per_class_metrics(cm)
    text = write_parity_report(m, cm, REFERENCE_CLASSES, tmp_path / "p.md")
    assert "Same confusion structure as the reference." in text
    fs = forest_sealake_confusion(cm, REFERENCE_CLASSES)
    assert fs["forest_to_sealake"] == pytest.approx(29 / 30)
    assert fs["forest_recall"] == pytest.approx(1 / 30)


def test_report_aggregate_and_explicit_test_acc(tmp_path):
    cm = _cm_diag()
    m = per_class_metrics(cm)
    text = write_parity_report(m, cm, REFERENCE_CLASSES, tmp_path / "p.md",
                               test_acc=0.75)
    assert "**0.7500** vs reference **0.7473**" in text
    assert "+0.0027" in text


def test_class_subset_rows_marked_not_run(tmp_path):
    """Runs on a class subset degrade gracefully: unmatched reference rows
    render as 'not run', no crash, no misaligned indices."""
    classes = ("Forest", "SeaLake", "River")
    cm = np.diag([20, 20, 20]).astype(np.int64)
    m = per_class_metrics(cm)
    text = write_parity_report(m, cm, classes, tmp_path / "p.md")
    assert "| AnnualCrop | 0.6173 | not run |" in text
    assert "| Forest | 0.9167 | 1.0000 |" in text


def _cm_reference_like():
    """A 10-class CM with the reference's headline shape: ~0.747 aggregate
    accuracy with a Forest->SeaLake collapse (Report.md:3218-3233 structure,
    300 samples/class)."""
    cm = np.eye(10, dtype=np.int64) * 243  # 0.81 recall rows
    for i in range(10):
        cm[i, (i + 1) % 10] = 57
    f, s = 1, 9
    cm[f] = 0
    cm[f, f] = 11          # Forest recall 0.0367
    cm[f, s] = 289         # collapse into SeaLake
    cm[s] = 0
    cm[s, s] = 294         # SeaLake recall 0.98
    cm[s, f] = 6
    return cm              # (8*243 + 11 + 294) / 3000 = 0.7497 accuracy


def test_gate_passes_at_reference_accuracy(tmp_path):
    """The full evidence-pack render + gate on a reference-shaped CM: the
    exact flow test_parity_eurosat runs in a data-bearing environment."""
    cm = _cm_reference_like()
    m = per_class_metrics(cm)
    assert m["accuracy"] == pytest.approx(0.7497, abs=1e-4)
    text = write_parity_report(m, cm, REFERENCE_CLASSES, tmp_path / "p.md",
                               test_acc=m["accuracy"])
    assert "Same confusion structure as the reference." in text
    check_parity_gate(m["accuracy"])  # no raise at/above the headline
    check_parity_gate(0.7473)         # boundary: >= is a pass


def test_gate_fails_correctly_below_headline(tmp_path):
    """VERDICT-r4 #6: the gate must FAIL below 0.747 — a gate that cannot
    fail proves nothing. The render still succeeds (evidence pack is always
    written); only the assertion trips, with both numbers in the message."""
    cm = np.eye(10, dtype=np.int64) * 21
    for i in range(10):
        cm[i, (i + 1) % 10] = 9  # 0.70 accuracy, below the gate
    m = per_class_metrics(cm)
    assert m["accuracy"] == pytest.approx(0.70)
    text = write_parity_report(m, cm, REFERENCE_CLASSES, tmp_path / "p.md",
                               test_acc=m["accuracy"])
    assert "Aggregate test accuracy" in text  # report written regardless
    with pytest.raises(AssertionError, match="parity miss.*0.7000"):
        check_parity_gate(m["accuracy"])
    with pytest.raises(AssertionError, match="0.7469.*0.7473"):
        check_parity_gate(0.7469)
    with pytest.raises(AssertionError):  # NaN accuracy must not pass
        check_parity_gate(float("nan"))


def test_no_forest_sealake_section_for_synthetic_classes(tmp_path):
    classes = tuple(f"class{i}" for i in range(10))
    cm = _cm_diag()
    m = per_class_metrics(cm)
    text = write_parity_report(m, cm, classes, tmp_path / "p.md")
    assert "Forest <-> SeaLake" not in text
    assert forest_sealake_confusion(cm, classes) is None
