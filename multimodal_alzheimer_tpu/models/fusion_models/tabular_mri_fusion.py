"""Stage-2 MRI+tabular fusion (reference Tabular_MRT_Model parity).

Reference: pkg/models/fusion_models/tabular_mri_fusion.py:11-124.
``reduce_tab`` = Linear(1024->512)+ReLU on the tabular decoder embedding;
concat order (tabular, MRI) (:76-78); fuse head Linear(1024->64) -> ReLU ->
Linear(n_classes); stage-3 tap = pre-ReLU fused 64-d.

The reference's ``requires_Grad`` typo (:30) means its tabular encoder is
never truly frozen — freezing here is explicit via optimizer param groups
(train/optim.py), with the typo's *effective* behavior (encoder excluded
from the optimizer unless ``lr_pretrained``) reproduced.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN
from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import TabularMLP


class TabularMRIFusion(nn.Module):
    n_classes: int
    mri_model: AnatCNN
    tab_model: TabularMLP
    freeze_towers: bool = False  # stop_gradient at the stage-1 taps
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_hparams(cls, hparams: dict, mri_hparams: dict,
                     tab_hparams: dict, **overrides) -> "TabularMRIFusion":
        sub = {}
        if "dtype" in overrides:
            sub["dtype"] = overrides["dtype"]
        kwargs = dict(
            n_classes=hparams["n_classes"],
            mri_model=AnatCNN.from_hparams(mri_hparams, freeze_backbone=False,
                                           **sub),
            tab_model=TabularMLP.from_hparams(tab_hparams, **sub),
        )
        if "lr_pretrained" in hparams:
            kwargs["freeze_towers"] = not hparams["lr_pretrained"]
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, batch: dict, train: bool = False,
                 towers: dict | None = None,
                 return_towers: bool = False) -> dict:
        """``towers``/``return_towers``: see anat_pet_fusion.py — stage-3
        shared-tower reuse of precomputed frozen stage-1 outputs."""
        towers = towers or {}
        mri_out = (towers["mri"] if "mri" in towers
                   else self.mri_model(batch, train))
        tab_out = (towers["tab"] if "tab" in towers
                   else self.tab_model(batch, train))
        if self.freeze_towers:
            # torch requires_grad=False parity (zero updates either way);
            # skips the tower backward entirely. The tab branch's
            # requires_Grad-typo semantics are unchanged: excluded from
            # the optimizer, zero update, stats still tracked.
            mri_out = jax.tree.map(lax.stop_gradient, mri_out)
            tab_out = jax.tree.map(lax.stop_gradient, tab_out)
        emb_tab = tab_out["embeddings"]["decoder"]
        out_mri = mri_out["embeddings"]["backbone_gap"]

        out_tab = nn.relu(nn.Dense(512, dtype=self.dtype,
                                   name="reduce_tab")(emb_tab))
        h = jnp.concatenate([out_tab, out_mri], axis=1)
        fused = nn.Dense(64, dtype=self.dtype, name="stage2out")(h)
        logits = nn.Dense(self.n_classes, dtype=self.dtype,
                          name="cls2")(nn.relu(fused))
        out = {"logits": logits.astype(jnp.float32),
               "embeddings": {"fusion": fused}}
        if return_towers:
            out["towers"] = {"mri": mri_out, "tab": tab_out}
        return out

    def fusion_tap(self) -> str:
        return "fusion"
