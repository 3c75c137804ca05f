from multimodal_alzheimer_tpu.ops.quantile import masked_nonzero_quantile
from multimodal_alzheimer_tpu.ops.normalization import (
    zscore_normalize,
    mri_per_scan_zscore,
    mri_per_scan_minmax,
    normalize_pet,
    normalize_mri,
    compute_split_stats,
)

__all__ = [
    "masked_nonzero_quantile",
    "zscore_normalize",
    "mri_per_scan_zscore",
    "mri_per_scan_minmax",
    "normalize_pet",
    "normalize_mri",
    "compute_split_stats",
]
