"""Configurable classifier head over a 3D feature map (conv_seg parity).

The reference replaces MedicalNet's ``conv_seg`` with
[BN3d?] -> (Conv3d -> [BN3d] -> ReLU -> MaxPool(2))* -> GAP -> Flatten ->
(Linear -> [BN1d] -> ReLU)* -> Linear(n_classes) -> ReLU
(reference: mri_models/anat_cnn.py:33-79, pet_models/pet_resnet_cnn.py:37-81).

Two reference quirks are reproduced behind flags:
  * ``trailing_relu`` (default True): the final ReLU after the classifier
    Linear clamps logits >= 0 (anat_cnn.py:77) — a known reference quirk.
  * The fusion embedding corresponds to ``conv_seg[:2]`` (the reference's
    stage-2 surgery, anat_pet_fusion.py:32): with no conv layers that is
    the (optionally BN'd) GAP feature vector — exposed here as
    ``embeddings['backbone_gap']``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models.layers import (
    batch_norm,
    global_avg_pool,
    max_pool3d,
)


class ClassifierHead3D(nn.Module):
    n_classes: int
    conv_out: Sequence[int] = ()
    filter_size: Sequence[int] = ()
    linear_out: Sequence[int] = ()
    batchnorm_begin: bool = False
    batchnorm_conv: bool = False
    batchnorm_dense: bool = False
    trailing_relu: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_torch_stats: bool = False

    @nn.compact
    def __call__(self, fmap: jnp.ndarray, train: bool = False) -> dict:
        x = fmap
        if self.batchnorm_begin:
            x = batch_norm(train, "bn_begin", self.dtype,
                           self.bn_torch_stats)(x)

        # conv_seg[:2] tap: with no extra convs this is the (BN'd) GAP
        # feature the stage-2 fusions consume as a 512/2048-d vector.
        tap = global_avg_pool(x)

        for i, (features, kernel) in enumerate(
                zip(self.conv_out, self.filter_size)):
            x = nn.Conv(features, (kernel,) * 3, padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            if self.batchnorm_conv:
                x = batch_norm(train, f"bn_conv_{i}", self.dtype,
                               self.bn_torch_stats)(x)
            x = nn.relu(x)
            x = max_pool3d(x)

        h = global_avg_pool(x)
        for i, features in enumerate(self.linear_out):
            h = nn.Dense(features, dtype=self.dtype, name=f"dense_{i}")(h)
            if self.batchnorm_dense:
                h = batch_norm(train, f"bn_dense_{i}", self.dtype,
                               self.bn_torch_stats)(h)
            h = nn.relu(h)
        logits = nn.Dense(self.n_classes, dtype=self.dtype, name="cls")(h)
        if self.trailing_relu:
            logits = nn.relu(logits)
        return {"logits": logits.astype(jnp.float32),
                "embeddings": {"backbone_gap": tap}}

    @classmethod
    def kwargs_from_hparams(cls, hparams: dict) -> dict:
        return dict(
            n_classes=hparams["n_classes"],
            conv_out=tuple(hparams.get("conv_out") or ()),
            filter_size=tuple(hparams.get("filter_size") or ()),
            linear_out=tuple(hparams.get("linear_out") or ()),
            batchnorm_begin=bool(hparams.get("batchnorm_begin", False)),
            batchnorm_conv=bool(hparams.get("batchnorm_conv", False)),
            batchnorm_dense=bool(hparams.get("batchnorm_dense", False)),
            bn_torch_stats=bool(hparams.get("bn_torch_stats", False)),
        )
