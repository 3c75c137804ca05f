"""MRI classifier: Med3D ResNet backbone + configurable head (Anat_CNN).

Reference: pkg/models/mri_models/anat_cnn.py:13-136. The backbone is a
MedicalNet 3D ResNet (depth 10/18/50; feature width 512 or 2048) and the
head mirrors the ``conv_seg`` replacement, including the trailing ReLU on
the logits (anat_cnn.py:77). The reference's stage-2 surgery
(``conv_seg[:2]`` -> 512-d GAP embedding) is the ``backbone_gap`` tap.

Consumes batch key 'mri' of shape (B, D, H, W).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from multimodal_alzheimer_tpu.models.heads import ClassifierHead3D
from multimodal_alzheimer_tpu.models.resnet3d import (
    FEATURE_WIDTH,
    MedicalNetResNet3D,
)


class AnatCNN(nn.Module):
    n_classes: int
    resnet_depth: int = 18
    conv_out: Sequence[int] = ()
    filter_size: Sequence[int] = ()
    linear_out: Sequence[int] = ()
    batchnorm_begin: bool = False
    batchnorm_conv: bool = False
    batchnorm_dense: bool = False
    trailing_relu: bool = True
    freeze_backbone: bool = False  # stop_gradient below the head (see below)
    stem_s2d: bool = True   # numerically-exact fast stem (resnet3d.py)
    dilated: bool = True    # Med3D parity; False = fast strided mode
    remat: bool = False     # rematerialize blocks (larger batches)
    fused_bn: object = False  # False|"hybrid"|"full"|"torch_stats"
    maxpool_impl: str = "xla"  # "xla" | "sf" | "wf" (resnet3d.py stem pool)
    bn_torch_stats: bool = False  # torch running-var EMA (head + backbone)
    dtype: jnp.dtype = jnp.float32
    input_key: str = "mri"

    @classmethod
    def from_hparams(cls, hparams: dict, **overrides) -> "AnatCNN":
        kwargs = ClassifierHead3D.kwargs_from_hparams(hparams)
        kwargs["resnet_depth"] = hparams.get("resnet_depth", 18)
        if kwargs["resnet_depth"] not in FEATURE_WIDTH:
            raise ValueError(
                "hparams['resnet_depth'] is not in [10, 18, 34, 50]")
        # The reference freezes the backbone when ``lr_pretrained`` is None
        # (anat_cnn.py:111-126: requires_grad=False => torch never runs the
        # backbone backward). Derive that only when the key is explicitly
        # present — entry-point hparams always carry it, while tests/bench
        # building ad-hoc models keep full differentiability.
        if "lr_pretrained" in hparams:
            kwargs["freeze_backbone"] = not hparams["lr_pretrained"]
        if hparams.get("bn_torch_stats"):
            kwargs["bn_torch_stats"] = True
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> dict:
        x = batch[self.input_key]
        if x.ndim == 4:
            x = x[..., None]
        x = x.astype(self.dtype)
        fmap = MedicalNetResNet3D(depth=self.resnet_depth,
                                  stem_s2d=self.stem_s2d,
                                  dilated=self.dilated,
                                  remat=self.remat,
                                  fused_bn=("torch_stats"
                                            if self.bn_torch_stats
                                            else self.fused_bn),
                                  maxpool_impl=self.maxpool_impl,
                                  dtype=self.dtype,
                                  name="backbone")(x, train)
        if self.freeze_backbone:
            # Matches torch requires_grad=False semantics: parameter
            # updates are identical to optimizer-side freezing (both are
            # exactly zero), but the backbone dgrad/wgrad work is never
            # emitted. BatchNorm batch_stats still update in train mode
            # (a mutable-collection side effect, unaffected by AD).
            fmap = lax.stop_gradient(fmap)
        out = ClassifierHead3D(
            n_classes=self.n_classes,
            conv_out=self.conv_out,
            filter_size=self.filter_size,
            linear_out=self.linear_out,
            batchnorm_begin=self.batchnorm_begin,
            batchnorm_conv=self.batchnorm_conv,
            batchnorm_dense=self.batchnorm_dense,
            trailing_relu=self.trailing_relu,
            dtype=self.dtype,
            bn_torch_stats=self.bn_torch_stats,
            name="head")(fmap, train)
        return out

    def fusion_tap(self) -> str:
        return "backbone_gap"
