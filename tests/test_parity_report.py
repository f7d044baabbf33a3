"""parity_vs_reference.md evidence-pack writer (satae/eval/parity_report.py)
— exercised locally on constructed confusion matrices so the real-EuroSAT
gate's report path is verified before a data-bearing environment runs it."""

import numpy as np
import pytest

from satae.eval.metrics import per_class_metrics
from satae.eval.parity_report import (REFERENCE_CLASSES, REFERENCE_PER_CLASS,
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


def test_no_forest_sealake_section_for_synthetic_classes(tmp_path):
    classes = tuple(f"class{i}" for i in range(10))
    cm = _cm_diag()
    m = per_class_metrics(cm)
    text = write_parity_report(m, cm, classes, tmp_path / "p.md")
    assert "Forest <-> SeaLake" not in text
    assert forest_sealake_confusion(cm, classes) is None
