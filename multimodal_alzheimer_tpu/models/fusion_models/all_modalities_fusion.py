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
    # Run each frozen stage-1 tower ONCE and feed every consuming stage-2
    # head, instead of the reference's duplicated forwards (its stage-2
    # submodules each own a private copy of the same grafted PET/MRI/tab
    # tower, all_modalities_fusion.py:66-79 — identical params, identical
    # inputs, so the duplicate compute is pure waste XLA cannot CSE away
    # across distinct param arrays). Only legal when every stage-2
    # sub-model has freeze_towers=True (otherwise gradients would flow to
    # one shared copy instead of two private ones) and the duplicate
    # tower param/stat subtrees are identical — which the frozen grafting
    # regime guarantees by construction (train_all_modalities_fusion.py
    # grafts the same stage-1 checkpoint into both copies; see
    # checkpoint.sync_tower_duplicates / assert_tower_duplicates_equal).
    # Canonical copies: pet/mri from model_anat_pet, tab from
    # model_anat_tab; the other copies' variables are carried untouched
    # (checkpoint-structure compat) but never read in the forward.
    # With tower dropout active, sharing draws ONE mask per tower instead
    # of two independent ones — stochastically equivalent, not
    # bit-identical; all reference fusion regimes run towers dropout-free.
    share_towers: bool = False
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_hparams(cls, hparams: dict, anat_pet_hparams: dict,
                     anat_tab_hparams: dict, pet_tab_hparams: dict,
                     pet_hparams: dict, mri_hparams: dict,
                     tab_hparams: dict, **overrides) -> "AllModalitiesFusion":
        sub = {}
        if "dtype" in overrides:
            sub["dtype"] = overrides["dtype"]
        # Stage-1 tower freezing inside each stage-2 sub-model follows that
        # stage-2 checkpoint's own saved lr_pretrained: the reference's
        # load_from_checkpoint re-runs e.g. Anat_PET_CNN.__init__ with the
        # stage-2 hparams, which sets requires_grad=False on the stage-1
        # towers when that lr_pretrained is falsy (anat_pet_fusion.py:34-40)
        # — so even an *unfrozen* stage-3 run (lr_pretrained set,
        # unfreeze list all_modalities_fusion.py:106-125) never updates
        # stage-1 towers unless the stage-2 hparams unfroze them.
        kwargs = dict(
            n_classes=hparams["n_classes"],
            model_anat_pet=AnatPETFusion.from_hparams(
                anat_pet_hparams, pet_hparams, mri_hparams,
                freeze_towers=not anat_pet_hparams.get("lr_pretrained"),
                **sub),
            model_anat_tab=TabularMRIFusion.from_hparams(
                anat_tab_hparams, mri_hparams, tab_hparams,
                freeze_towers=not anat_tab_hparams.get("lr_pretrained"),
                **sub),
            model_pet_tab=PETTabularFusion.from_hparams(
                pet_tab_hparams, pet_hparams, tab_hparams,
                freeze_towers=not pet_tab_hparams.get("lr_pretrained"),
                **sub),
        )
        if "lr_pretrained" in hparams:
            kwargs["freeze_towers"] = not hparams["lr_pretrained"]
        # share_towers auto-derives from the frozen regime (the reference
        # default: no stage-2 lr_pretrained => towers frozen => duplicate
        # forwards are provably redundant). Explicit override wins.
        kwargs["share_towers"] = all(
            kwargs[m].freeze_towers for m in
            ("model_anat_pet", "model_anat_tab", "model_pet_tab"))
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, batch: dict, train: bool = False,
                 towers: dict | None = None,
                 fusion_inputs: dict | None = None) -> dict:
        # ``towers`` optionally supplies externally-computed stage-1 tower
        # output dicts (keys 'pet'/'mri'/'tab') that replace the in-graph
        # forwards — the int8 serving path (inference/quantize.py) feeds
        # the quantized MRI backbone's outputs this way. Only meaningful
        # under share_towers (frozen regime); ignored during init.
        # Sharing must not change the variable tree: during init, run the
        # unshared graph so every duplicate tower's params/stats exist for
        # checkpoint grafting and save/restore.
        #
        # ``fusion_inputs`` goes one level further: externally-computed
        # stage-2 fusion embeddings (keys 'anat_pet'/'anat_tab'/'pet_tab',
        # each (B, 64)) skip all three sub-models entirely, so only the
        # stage-3 head (stage3out/cls3) runs — and, unlike ``towers``,
        # init too builds head-only params. This is the vectorized-HPO
        # hook (train/fusion_hpo.py): K trials vmap the head over ONE
        # shared frozen sub-model forward per step.
        if towers and not self.share_towers:
            raise ValueError("external towers require share_towers=True")
        if fusion_inputs is not None:
            if not self.freeze_towers:
                raise ValueError(
                    "fusion_inputs requires freeze_towers=True (a trainable "
                    "sub-model cannot be computed externally)")
            out_anat_pet = fusion_inputs["anat_pet"]
            out_anat_tab = fusion_inputs["anat_tab"]
            out_pet_tab = fusion_inputs["pet_tab"]
        elif self.share_towers and not self.is_initializing():
            if not (self.model_anat_pet.freeze_towers
                    and self.model_anat_tab.freeze_towers
                    and self.model_pet_tab.freeze_towers):
                raise ValueError(
                    "share_towers=True requires freeze_towers=True on all "
                    "three stage-2 sub-models (sharing an unfrozen tower "
                    "would merge two independently-trained copies)")
            ext = towers or {}
            ap = self.model_anat_pet(
                batch, train,
                towers={k: ext[k] for k in ("pet", "mri") if k in ext},
                return_towers=True)
            at_towers = {"mri": ap["towers"]["mri"]}
            if "tab" in ext:
                at_towers["tab"] = ext["tab"]
            at = self.model_anat_tab(batch, train, towers=at_towers,
                                     return_towers=True)
            pt = self.model_pet_tab(
                batch, train, towers={"pet": ap["towers"]["pet"],
                                      "tab": at["towers"]["tab"]})
            out_anat_pet = ap["embeddings"]["fusion"]
            out_anat_tab = at["embeddings"]["fusion"]
            out_pet_tab = pt["embeddings"]["fusion"]
        else:
            out_anat_pet = self.model_anat_pet(batch,
                                               train)["embeddings"]["fusion"]
            out_anat_tab = self.model_anat_tab(batch,
                                               train)["embeddings"]["fusion"]
            out_pet_tab = self.model_pet_tab(batch,
                                             train)["embeddings"]["fusion"]
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
