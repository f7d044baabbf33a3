from satae.eval.metrics import (  # noqa: F401
    classification_report,
    confusion_matrix,
    per_class_metrics,
)
