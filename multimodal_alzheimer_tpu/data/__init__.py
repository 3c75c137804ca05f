from multimodal_alzheimer_tpu.data.dataset import MultiModalDataset
from multimodal_alzheimer_tpu.data.pairing import (
    find_corresponding_samples,
    merge_two_dfs,
    expand_pairings,
)
from multimodal_alzheimer_tpu.data.nifti import load_nifti, save_nifti

__all__ = [
    "MultiModalDataset",
    "find_corresponding_samples",
    "merge_two_dfs",
    "expand_pairings",
    "load_nifti",
    "save_nifti",
]
