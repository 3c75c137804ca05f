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
from jax import lax

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
    freeze_towers: bool = False  # stop_gradient at the stage-2 taps
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_hparams(cls, hparams: dict, anat_pet_hparams: dict,
                     anat_tab_hparams: dict, pet_tab_hparams: dict,
                     pet_hparams: dict, mri_hparams: dict,
                     tab_hparams: dict, **overrides) -> "AllModalitiesFusion":
        sub = {}
        if "dtype" in overrides:
            sub["dtype"] = overrides["dtype"]
        # Stage-3's lr_pretrained governs EVERYTHING below it (reference
        # all_modalities_fusion.py:33-47, unfreeze list :106-125): the
        # stage-2 checkpoints' own lr_pretrained keys are not consulted.
        # Sub-model freezing is forced off; the single control point is
        # this model's three taps.
        sub["freeze_towers"] = False
        kwargs = dict(
            n_classes=hparams["n_classes"],
            model_anat_pet=AnatPETFusion.from_hparams(
                anat_pet_hparams, pet_hparams, mri_hparams, **sub),
            model_anat_tab=TabularMRIFusion.from_hparams(
                anat_tab_hparams, mri_hparams, tab_hparams, **sub),
            model_pet_tab=PETTabularFusion.from_hparams(
                pet_tab_hparams, pet_hparams, tab_hparams, **sub),
        )
        if "lr_pretrained" in hparams:
            kwargs["freeze_towers"] = not hparams["lr_pretrained"]
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> dict:
        out_anat_pet = self.model_anat_pet(batch, train)["embeddings"]["fusion"]
        out_anat_tab = self.model_anat_tab(batch, train)["embeddings"]["fusion"]
        out_pet_tab = self.model_pet_tab(batch, train)["embeddings"]["fusion"]
        if self.freeze_towers:
            # torch requires_grad=False parity: zero updates either way,
            # but none of the three stage-2 backwards (nor their stage-1
            # towers') are emitted. BN stats still update in train mode.
            out_anat_pet = lax.stop_gradient(out_anat_pet)
            out_anat_tab = lax.stop_gradient(out_anat_tab)
            out_pet_tab = lax.stop_gradient(out_pet_tab)
        h = jnp.concatenate([out_anat_pet, out_anat_tab, out_pet_tab], axis=1)
        fused = nn.Dense(64, dtype=self.dtype, name="stage3out")(h)
        logits = nn.Dense(self.n_classes, dtype=self.dtype,
                          name="cls3")(nn.relu(fused))
        return {"logits": logits.astype(jnp.float32),
                "embeddings": {"fusion": fused}}
