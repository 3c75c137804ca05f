"""Stage-3 all-modalities fusion (reference All_Modalities_Fusion parity).

Reference: pkg/models/fusion_models/all_modalities_fusion.py:12-137. Loads
the three stage-2 models, cuts each classifier to its pre-ReLU 64-d fused
vector (``model_fuse[:-2]``, :29-31), concatenates (anat_pet, anat_tab,
pet_tab) (:74-77) and classifies with Linear(192->64) -> ReLU ->
Linear(n_classes).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion import (
    AnatPETFusion,
)
from multimodal_alzheimer_tpu.models.fusion_models.pet_tabular_fusion import (
    PETTabularFusion,
)
from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion import (
    TabularMRIFusion,
)


class AllModalitiesFusion(nn.Module):
    n_classes: int
    model_anat_pet: AnatPETFusion
    model_anat_tab: TabularMRIFusion
    model_pet_tab: PETTabularFusion
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_hparams(cls, hparams: dict, anat_pet_hparams: dict,
                     anat_tab_hparams: dict, pet_tab_hparams: dict,
                     pet_hparams: dict, mri_hparams: dict,
                     tab_hparams: dict, **overrides) -> "AllModalitiesFusion":
        sub = {}
        if "dtype" in overrides:
            sub["dtype"] = overrides["dtype"]
        kwargs = dict(
            n_classes=hparams["n_classes"],
            model_anat_pet=AnatPETFusion.from_hparams(
                anat_pet_hparams, pet_hparams, mri_hparams, **sub),
            model_anat_tab=TabularMRIFusion.from_hparams(
                anat_tab_hparams, mri_hparams, tab_hparams, **sub),
            model_pet_tab=PETTabularFusion.from_hparams(
                pet_tab_hparams, pet_hparams, tab_hparams, **sub),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> dict:
        out_anat_pet = self.model_anat_pet(batch, train)["embeddings"]["fusion"]
        out_anat_tab = self.model_anat_tab(batch, train)["embeddings"]["fusion"]
        out_pet_tab = self.model_pet_tab(batch, train)["embeddings"]["fusion"]
        h = jnp.concatenate([out_anat_pet, out_anat_tab, out_pet_tab], axis=1)
        fused = nn.Dense(64, dtype=self.dtype, name="stage3out")(h)
        logits = nn.Dense(self.n_classes, dtype=self.dtype,
                          name="cls3")(nn.relu(fused))
        return {"logits": logits.astype(jnp.float32),
                "embeddings": {"fusion": fused}}
