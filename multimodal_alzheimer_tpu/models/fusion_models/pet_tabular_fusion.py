"""Stage-2 PET+tabular fusion (reference PET_TABULAR_CNN parity).

Reference: pkg/models/fusion_models/pet_tabular_fusion.py:15-149. The
reference's tabular branch is a TabPFN whose 1024-d decoder activations are
hooked out of a per-step CPU forward (:80-97); here the tabular branch is
the on-device TabularMLP's 'decoder' tap (a documented divergence).

``reduce_tab`` is either 1024->512->64 (``simple_dim_red``) or 1024->64
(:54-57); fuse head Linear(128->64) -> ReLU -> Linear(n_classes); stage-3
tap is the pre-ReLU fused 64-d vector.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion import _pet_tap
from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import SmallPETCNN
from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import TabularMLP


class PETTabularFusion(nn.Module):
    n_classes: int
    pet_model: SmallPETCNN
    tab_model: TabularMLP
    simple_dim_red: bool = False
    freeze_towers: bool = False  # stop_gradient at the stage-1 taps
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_hparams(cls, hparams: dict, pet_hparams: dict,
                     tab_hparams: dict, **overrides) -> "PETTabularFusion":
        sub = {}
        if "dtype" in overrides:
            sub["dtype"] = overrides["dtype"]
        kwargs = dict(
            n_classes=hparams["n_classes"],
            pet_model=SmallPETCNN.from_hparams(pet_hparams, **sub),
            tab_model=TabularMLP.from_hparams(tab_hparams, **sub),
            simple_dim_red=bool(hparams.get("simple_dim_red", False)),
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
        pet_out = (towers["pet"] if "pet" in towers
                   else self.pet_model(batch, train))
        tab_out = (towers["tab"] if "tab" in towers
                   else self.tab_model(batch, train))
        if self.freeze_towers:
            # torch requires_grad=False parity; see tabular_mri_fusion.py.
            pet_out = jax.tree.map(lax.stop_gradient, pet_out)
            tab_out = jax.tree.map(lax.stop_gradient, tab_out)
        out_pet = _pet_tap(pet_out, self.n_classes)
        emb_tab = tab_out["embeddings"]["decoder"]

        if self.simple_dim_red:
            h_tab = nn.relu(nn.Dense(512, dtype=self.dtype,
                                     name="reduce_tab_0")(emb_tab))
            out_tab = nn.relu(nn.Dense(64, dtype=self.dtype,
                                       name="reduce_tab_1")(h_tab))
        else:
            out_tab = nn.relu(nn.Dense(64, dtype=self.dtype,
                                       name="reduce_tab")(emb_tab))

        h = jnp.concatenate([out_pet, out_tab], axis=1)
        fused = nn.Dense(64, dtype=self.dtype, name="stage2out")(h)
        logits = nn.Dense(self.n_classes, dtype=self.dtype,
                          name="cls2")(nn.relu(fused))
        out = {"logits": logits.astype(jnp.float32),
               "embeddings": {"fusion": fused}}
        if return_towers:
            out["towers"] = {"pet": pet_out, "tab": tab_out}
        return out

    def fusion_tap(self) -> str:
        return "fusion"
