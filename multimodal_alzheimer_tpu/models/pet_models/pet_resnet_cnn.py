"""PET classifier on the Med3D ResNet backbone (PET_CNN_ResNet parity).

Reference: pkg/models/pet_models/pet_resnet_cnn.py:15-92 — identical
backbone+head recipe to Anat_CNN but consuming the PET volume. (The
reference implements it standalone instead of via Base_Model; here it
shares AnatCNN's structure with a different input key.)
"""

from __future__ import annotations

from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN


class PETResNetCNN(AnatCNN):
    input_key: str = "pet1451"

    @classmethod
    def from_hparams(cls, hparams: dict, **overrides):
        overrides.setdefault("input_key", "pet1451")
        return super().from_hparams(hparams, **overrides)
