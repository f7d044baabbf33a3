"""Reference-parity evidence pack for the real-EuroSAT gate (VERDICT-r3 #4).

The reference publishes one full per-class evaluation table
(Report.md:3218-3233, transcribed in BASELINE.md): per-class
precision/recall/F1/support, macro and weighted averages, and the 74.73%
headline. ``write_parity_report`` renders a satae run's evaluation
side-by-side against that table with per-class deltas, plus the
Forest→SeaLake confusion-structure check the reference's narration leans on
(Forest recall 0.0375 with SeaLake precision 0.4282 — the notebook's famous
failure mode, Report.md:3221/3229), so the first environment with the
dataset closes the WHOLE BASELINE.md §table in one run, not just the
aggregate.

Parity caveat carried from BASELINE.md:31: the reference's per-class numbers
sit on an UNSEEDED 2000/class subsample and a best-checkpoint shallow-copy
quirk, so per-class deltas are evidence, not gates; the asserted gate stays
aggregate test accuracy >= 0.747.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

# Report.md:3218-3233 (class index = alphabetical EuroSAT order).
REFERENCE_CLASSES = (
    "AnnualCrop", "Forest", "HerbaceousVegetation", "Highway", "Industrial",
    "Pasture", "PermanentCrop", "Residential", "River", "SeaLake")
REFERENCE_PER_CLASS = {
    # name: (precision, recall, f1, support)
    "AnnualCrop": (0.6173, 0.9346, 0.7435, 321),
    "Forest": (0.9167, 0.0375, 0.0721, 293),
    "HerbaceousVegetation": (0.8945, 0.6610, 0.7602, 295),
    "Highway": (0.9414, 0.9040, 0.9223, 302),
    "Industrial": (0.9525, 0.9525, 0.9525, 295),
    "Pasture": (0.8800, 0.4731, 0.6154, 279),
    "PermanentCrop": (0.8533, 0.7111, 0.7758, 270),
    "Residential": (0.9833, 0.9365, 0.9593, 315),
    "River": (0.8433, 0.8057, 0.8241, 314),
    "SeaLake": (0.4282, 0.9810, 0.5962, 316),
}
REFERENCE_AGGREGATE = {
    "accuracy": 0.7473,                      # Report.md:3119, 3231
    "macro": (0.8311, 0.7397, 0.7221),       # Report.md:3232
    "weighted": (0.8272, 0.7473, 0.7247),    # Report.md:3233
}


def check_parity_gate(test_acc: float,
                      threshold: float = REFERENCE_AGGREGATE["accuracy"],
                      ) -> None:
    """The real-EuroSAT acceptance gate: aggregate test accuracy must reach
    the reference headline (0.7473, Report.md:3119). Raises AssertionError
    below the threshold; per-class deltas stay evidence-only (module
    docstring caveat). Factored out of the EUROSAT_DIR-gated integration
    test so its failure mode is itself testable without the dataset
    (tests/test_parity_report.py)."""
    if not test_acc >= threshold:  # NaN also fails
        raise AssertionError(
            f"real-EuroSAT parity miss: test accuracy {test_acc:.4f} < "
            f"reference headline {threshold:.4f} (Report.md:3119)")


def forest_sealake_confusion(cm: np.ndarray,
                             classes: Sequence[str]) -> Optional[Dict]:
    """Fraction of true-Forest samples predicted SeaLake (and the reverse) —
    the reference's dominant confusion. None when the class names don't
    cover both (e.g. synthetic runs with renamed classes)."""
    names = list(classes)
    if "Forest" not in names or "SeaLake" not in names:
        return None
    f, s = names.index("Forest"), names.index("SeaLake")
    cm = np.asarray(cm, np.float64)
    f_total, s_total = cm[f].sum(), cm[s].sum()
    return {
        "forest_to_sealake": float(cm[f, s] / f_total) if f_total else 0.0,
        "forest_recall": float(cm[f, f] / f_total) if f_total else 0.0,
        "sealake_to_forest": float(cm[s, f] / s_total) if s_total else 0.0,
        "sealake_recall": float(cm[s, s] / s_total) if s_total else 0.0,
    }


def write_parity_report(metrics: Dict, cm: np.ndarray,
                        classes: Sequence[str], out_path: Path,
                        test_acc: Optional[float] = None) -> str:
    """Render parity_vs_reference.md from an evaluate() result.

    ``metrics``: the dict from satae.eval.metrics.per_class_metrics (or
    api.evaluate, which embeds it). Rows are matched by class NAME, so
    class-subset runs degrade gracefully (unmatched reference rows show
    as 'not run').
    """
    m = metrics
    acc = test_acc if test_acc is not None else m["accuracy"]
    lines = [
        "# Real-EuroSAT parity vs the reference (Report.md:3218-3233)",
        "",
        f"Aggregate test accuracy: **{acc:.4f}** vs reference "
        f"**{REFERENCE_AGGREGATE['accuracy']:.4f}** "
        f"(delta {acc - REFERENCE_AGGREGATE['accuracy']:+.4f}; "
        "gate: >= 0.747).",
        "",
        "Per-class deltas (satae - reference). Caveat: the reference's rows "
        "sit on an unseeded subsample (BASELINE.md:31), so these are "
        "evidence of matching structure, not exact-reproduction gates.",
        "",
        "| class | P ref | P satae | dP | R ref | R satae | dR | F1 ref | "
        "F1 satae | dF1 | n ref | n satae |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    names = list(classes)
    for ref_name, (rp, rr, rf, rn) in REFERENCE_PER_CLASS.items():
        if ref_name in names:
            i = names.index(ref_name)
            p, r, f1 = m["precision"][i], m["recall"][i], m["f1"][i]
            n = int(m["support"][i])
            lines.append(
                f"| {ref_name} | {rp:.4f} | {p:.4f} | {p - rp:+.4f} "
                f"| {rr:.4f} | {r:.4f} | {r - rr:+.4f} "
                f"| {rf:.4f} | {f1:.4f} | {f1 - rf:+.4f} | {rn} | {n} |")
        else:
            lines.append(f"| {ref_name} | {rp:.4f} | not run | — | {rr:.4f} "
                         f"| not run | — | {rf:.4f} | not run | — | {rn} "
                         "| — |")
    mp, mr, mf = REFERENCE_AGGREGATE["macro"]
    wp, wr, wf = REFERENCE_AGGREGATE["weighted"]
    lines += [
        f"| macro avg | {mp:.4f} | {m['macro_precision']:.4f} "
        f"| {m['macro_precision'] - mp:+.4f} | {mr:.4f} "
        f"| {m['macro_recall']:.4f} | {m['macro_recall'] - mr:+.4f} "
        f"| {mf:.4f} | {m['macro_f1']:.4f} | {m['macro_f1'] - mf:+.4f} "
        f"| 3000 | {int(np.sum(m['support']))} |",
        f"| weighted avg | {wp:.4f} | {m['weighted_precision']:.4f} "
        f"| {m['weighted_precision'] - wp:+.4f} | {wr:.4f} "
        f"| {m['weighted_recall']:.4f} | {m['weighted_recall'] - wr:+.4f} "
        f"| {wf:.4f} | {m['weighted_f1']:.4f} | {m['weighted_f1'] - wf:+.4f} "
        f"| 3000 | {int(np.sum(m['support']))} |",
    ]
    fs = forest_sealake_confusion(cm, classes)
    if fs is not None:
        lines += [
            "",
            "## Forest <-> SeaLake confusion structure",
            "",
            "The reference's dominant failure: Forest recall 0.0375 — nearly "
            "every Forest tile predicted SeaLake (SeaLake precision 0.4282, "
            "Report.md:3221/3229).",
            "",
            f"- satae Forest recall: **{fs['forest_recall']:.4f}** "
            "(reference 0.0375)",
            f"- satae true-Forest predicted SeaLake: "
            f"**{fs['forest_to_sealake']:.4f}** of Forest samples",
            f"- satae SeaLake recall: **{fs['sealake_recall']:.4f}** "
            "(reference 0.9810)",
            f"- satae true-SeaLake predicted Forest: "
            f"**{fs['sealake_to_forest']:.4f}**",
            "",
            ("Same confusion structure as the reference."
             if fs["forest_to_sealake"] > 0.5 else
             "satae does NOT reproduce the reference's Forest->SeaLake "
             "collapse (a better-conditioned run — the reference attributes "
             "its collapse to an unlucky unseeded subsample/selection, "
             "which satae's seeded pipeline fixed by design)."),
        ]
    text = "\n".join(lines) + "\n"
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(text)
    return text
