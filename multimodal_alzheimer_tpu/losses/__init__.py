from multimodal_alzheimer_tpu.losses.classification import (
    weighted_cross_entropy,
    focal_loss,
    make_criterion,
)

__all__ = ["weighted_cross_entropy", "focal_loss", "make_criterion"]
