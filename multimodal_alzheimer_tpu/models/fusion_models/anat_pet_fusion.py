"""Stage-2 PET+MRI late fusion (reference Anat_PET_CNN parity).

Reference: pkg/models/fusion_models/anat_pet_fusion.py:11-127. The
reference loads stage-1 checkpoints and surgically truncates them
(model[:-3]/model[:-1] for PET -> 64-d, conv_seg[:2] for MRI -> 512-d GAP);
here the stage-1 modules are submodules whose embedding taps are read
directly, and the checkpoint grafting happens at the parameter level
(train/checkpoint.py:graft_params).

Head: reduce_dim_mri Linear(512->64)+ReLU; fuse = Linear(128->64) -> ReLU ->
Linear(n_classes). The stage-3 tap is the *pre-ReLU* output of the first
fuse Linear (the reference's ``model_fuse[:-2]`` cut,
all_modalities_fusion.py:29-31).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN
from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import SmallPETCNN


def _pet_tap(pet_out: dict, n_classes: int) -> jnp.ndarray:
    """The reference's 2-class cut is GAP features, 3-class the dense
    output (anat_pet_fusion.py:28-31); fall back to GAP when no hidden
    Linear exists."""
    emb = pet_out["embeddings"]
    if n_classes != 2 and "dense" in emb:
        return emb["dense"]
    return emb["gap"]


class AnatPETFusion(nn.Module):
    n_classes: int
    pet_model: SmallPETCNN
    mri_model: AnatCNN
    freeze_towers: bool = False  # stop_gradient at the stage-1 taps
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_hparams(cls, hparams: dict, pet_hparams: dict,
                     mri_hparams: dict, **overrides) -> "AnatPETFusion":
        sub = {}
        if "dtype" in overrides:  # shared compute dtype for the sub-towers
            sub["dtype"] = overrides["dtype"]
        # Freezing of everything below this fusion is decided by THIS
        # stage's lr_pretrained (reference anat_pet_fusion.py:34-40) —
        # the stage-1 hparams' own lr_pretrained keys are not consulted,
        # so the MRI tower's derived freeze_backbone is forced off and
        # control lives solely at this model's taps.
        kwargs = dict(
            n_classes=hparams["n_classes"],
            pet_model=SmallPETCNN.from_hparams(pet_hparams, **sub),
            mri_model=AnatCNN.from_hparams(mri_hparams, freeze_backbone=False,
                                           **sub),
        )
        if "lr_pretrained" in hparams:
            kwargs["freeze_towers"] = not hparams["lr_pretrained"]
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, batch: dict, train: bool = False,
                 towers: dict | None = None,
                 return_towers: bool = False) -> dict:
        """``towers`` optionally supplies precomputed stage-1 outputs
        ({'pet': ..., 'mri': ...} full output dicts) so a stage-3 parent
        can run each frozen tower once and feed every consumer
        (all_modalities_fusion.py ``share_towers``). ``return_towers``
        adds the tower output dicts to the result for that reuse."""
        towers = towers or {}
        pet_out = (towers["pet"] if "pet" in towers
                   else self.pet_model(batch, train))
        mri_out = (towers["mri"] if "mri" in towers
                   else self.mri_model(batch, train))
        if self.freeze_towers:
            # torch requires_grad=False parity: identical (zero) updates to
            # optimizer-side freezing, but no backward through the towers.
            # BN batch_stats in the towers still update in train mode.
            pet_out = jax.tree.map(lax.stop_gradient, pet_out)
            mri_out = jax.tree.map(lax.stop_gradient, mri_out)
        out_pet = _pet_tap(pet_out, self.n_classes)
        out_mri = mri_out["embeddings"]["backbone_gap"]

        out_mri = nn.relu(nn.Dense(64, dtype=self.dtype,
                                   name="reduce_dim_mri")(out_mri))
        h = jnp.concatenate([out_pet, out_mri], axis=1)
        fused = nn.Dense(64, dtype=self.dtype, name="stage2out")(h)
        logits = nn.Dense(self.n_classes, dtype=self.dtype,
                          name="cls2")(nn.relu(fused))
        out = {"logits": logits.astype(jnp.float32),
               "embeddings": {"fusion": fused}}
        if return_towers:
            out["towers"] = {"pet": pet_out, "mri": mri_out}
        return out

    def fusion_tap(self) -> str:
        return "fusion"
