"""Intermediate feature-map PET+MRI fusion (reference PET_MRI_FMF parity).

Reference: pkg/models/fusion_models/anat_pet_featuremapfusion.py:20-172.
Two identical conv towers produce 3D feature maps, fused by channel concat
or voxelwise max (``fusion_mode`` in {'concatenate', 'maxout'}, :116-124),
then a fusion conv tower + GAP + Dense(64) + classifier.

Note: the reference has a latent channel-count bug for
``n_layers_fusion > 1`` (``n_in_fusion *= 2``, :79 — SURVEY quirks
register); only 1 layer is ever used. This implementation chains channels
correctly, which is identical for the configurations the reference runs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models.layers import (
    ConvTower3D,
    global_avg_pool,
    max_pool3d,
)


class PETMRIFeatureMapFusion(nn.Module):
    n_classes: int
    fusion_mode: str = "maxout"  # 'concatenate' | 'maxout'
    conv_out: Sequence[int] = (8, 16, 32)
    filter_size: Sequence[int] = (5, 5, 3)
    batchnorm: bool = False
    n_layers_fusion: int = 1
    n_out_fusion: int = 64
    filter_size_fusion: int = 3
    batchnorm_fusion: bool = False
    bn_torch_stats: bool = False
    dropout_conv_p: Optional[float] = None
    dropout_dense_p: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_hparams(cls, hparams: dict, **overrides) -> "PETMRIFeatureMapFusion":
        assert hparams["fusion_mode"] in ("concatenate", "maxout")
        kwargs = dict(
            n_classes=hparams["n_classes"],
            fusion_mode=hparams["fusion_mode"],
            conv_out=tuple(hparams["conv_out"]),
            filter_size=tuple(hparams["filter_size"]),
            batchnorm=bool(hparams.get("batchnorm", False)),
            n_layers_fusion=int(hparams.get("n_layers_fusion", 1)),
            n_out_fusion=int(hparams.get("n_out_fusion", 64)),
            filter_size_fusion=int(hparams.get("filter_size_fusion", 3)),
            batchnorm_fusion=bool(hparams.get("batchnorm_fusion", False)),
            dropout_conv_p=hparams.get("dropout_conv_p"),
            dropout_dense_p=hparams.get("dropout_dense_p"),
            bn_torch_stats=bool(hparams.get("bn_torch_stats", False)),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> dict:
        x_pet = batch["pet1451"][..., None].astype(self.dtype)
        x_mri = batch["mri"][..., None].astype(self.dtype)

        tower = dict(conv_out=self.conv_out, filter_size=self.filter_size,
                     use_batchnorm=self.batchnorm,
                     dropout_p=self.dropout_conv_p, dtype=self.dtype,
                     bn_torch_stats=self.bn_torch_stats)
        out_pet = ConvTower3D(**tower, name="backbone_pet")(x_pet, train)
        out_mri = ConvTower3D(**tower, name="backbone_mri")(x_mri, train)

        if self.fusion_mode == "concatenate":
            fused = jnp.concatenate([out_pet, out_mri], axis=-1)
        else:
            fused = jnp.maximum(out_pet, out_mri)

        for i in range(self.n_layers_fusion):
            fused = nn.Conv(self.n_out_fusion,
                            (self.filter_size_fusion,) * 3, padding="SAME",
                            dtype=self.dtype, name=f"fusion_conv_{i}")(fused)
            if self.batchnorm_fusion:
                from multimodal_alzheimer_tpu.models.layers import (
                    batch_norm,
                )

                fused = batch_norm(train, f"fusion_bn_{i}", self.dtype,
                                   self.bn_torch_stats)(fused)
            fused = nn.relu(fused)
            fused = max_pool3d(fused)

        h = global_avg_pool(fused)
        if self.dropout_dense_p is not None:
            h = nn.Dropout(rate=self.dropout_dense_p, name="dense_dropout")(
                h, deterministic=not train)
        h = nn.relu(nn.Dense(64, dtype=self.dtype, name="hidden")(h))
        logits = nn.Dense(self.n_classes, dtype=self.dtype, name="cls")(h)
        return {"logits": logits.astype(jnp.float32),
                "embeddings": {"dense": h}}
