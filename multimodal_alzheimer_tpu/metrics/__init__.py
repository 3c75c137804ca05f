from multimodal_alzheimer_tpu.metrics.classification import (
    confusion_matrix,
    f1_per_class,
    f1_macro,
    matthews_corrcoef,
    balanced_accuracy,
)
from multimodal_alzheimer_tpu.metrics.bootstrap import bootstrap_metric

__all__ = [
    "confusion_matrix",
    "f1_per_class",
    "f1_macro",
    "matthews_corrcoef",
    "balanced_accuracy",
    "bootstrap_metric",
]
