"""Input-level PET+MRI early fusion (reference PET_MRI_EF parity).

Reference: pkg/models/fusion_models/early_fusion.py:19-118 — the PET and
MRI volumes are stacked as a 2-channel input (general_step:89,
``torch.stack((pet, mri), dim=1)``; channels-last here) into the same
conv/dense recipe as Small_PET_CNN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models.layers import ConvTower3D, global_avg_pool


class PETMRIEarlyFusion(nn.Module):
    n_classes: int
    conv_out: Sequence[int] = (8, 16, 32, 64)
    filter_size: Sequence[int] = (5, 5, 3, 3)
    batchnorm: bool = False
    linear_out: int = 64
    dropout_conv_p: Optional[float] = None
    dropout_dense_p: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_hparams(cls, hparams: dict, **overrides) -> "PETMRIEarlyFusion":
        kwargs = dict(
            n_classes=hparams["n_classes"],
            conv_out=tuple(hparams["conv_out"]),
            filter_size=tuple(hparams["filter_size"]),
            batchnorm=bool(hparams.get("batchnorm", False)),
            linear_out=int(hparams.get("linear_out") or 0),
            dropout_conv_p=hparams.get("dropout_conv_p"),
            dropout_dense_p=hparams.get("dropout_dense_p"),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> dict:
        x = jnp.stack([batch["pet1451"], batch["mri"]], axis=-1)
        x = x.astype(self.dtype)
        x = ConvTower3D(self.conv_out, self.filter_size, self.batchnorm,
                        self.dropout_conv_p, self.dtype, name="convs")(
                            x, train)
        h = global_avg_pool(x)
        if self.dropout_dense_p is not None and self.linear_out:
            h = nn.Dropout(rate=self.dropout_dense_p, name="dense_dropout")(
                h, deterministic=not train)
        embeddings = {"gap": h}
        if self.linear_out:
            h = nn.relu(nn.Dense(self.linear_out, dtype=self.dtype,
                                 name="hidden")(h))
            embeddings["dense"] = h
        logits = nn.Dense(self.n_classes, dtype=self.dtype, name="cls")(h)
        return {"logits": logits.astype(jnp.float32),
                "embeddings": embeddings}
