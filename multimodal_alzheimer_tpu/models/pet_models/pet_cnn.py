"""Small configurable 3D PET CNN (reference Small_PET_CNN parity).

Architecture (reference: pkg/models/pet_models/pet_cnn.py:14-45):
n x (Conv3d 'same' -> [BN3d] -> ReLU -> MaxPool3d(2) -> [Dropout]) ->
GAP -> Flatten -> [Dropout -> Linear -> ReLU] -> Linear(n_classes).

Instead of the reference's post-hoc ``nn.Sequential`` slicing for fusion
(anat_pet_fusion.py:28-31 cuts ``model[:-3]`` for 2-class / ``model[:-1]``
for 3-class), embedding taps are first-class outputs:
  * ``embeddings['gap']``     == the ``model[:-3]`` cut: post-GAP features
    (with the dense dropout applied, as the reference's truncated Sequential
    keeps that Dropout module),
  * ``embeddings['dense']``   == the ``model[:-1]`` cut: post-ReLU output of
    the hidden Linear.

The module consumes the whole batch dict (key 'pet1451', shape (B, D, H, W))
and adds the channel axis itself — the equivalent of general_step's
``x.unsqueeze(1)`` (pet_cnn.py:60-64), but channels-last for TPU.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models.layers import (
    ConvTower3D,
    global_avg_pool,
    traced_dropout,
)


class SmallPETCNN(nn.Module):
    n_classes: int
    conv_out: Sequence[int] = (8, 16, 32, 64)
    filter_size: Sequence[int] = (5, 5, 3, 3)
    batchnorm: bool = False
    linear_out: int = 64  # 0/falsy disables the hidden Linear
    dropout_conv_p: Optional[float] = None
    dropout_dense_p: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    input_key: str = "pet1451"
    bn_torch_stats: bool = False  # torch running-var EMA (PARITY div. 3)
    s2d_pool: bool = True  # fused parity-decomposed conv+relu+pool (exact)

    @classmethod
    def from_hparams(cls, hparams: dict, **overrides) -> "SmallPETCNN":
        kwargs = dict(
            n_classes=hparams["n_classes"],
            conv_out=tuple(hparams["conv_out"]),
            filter_size=tuple(hparams["filter_size"]),
            batchnorm=bool(hparams.get("batchnorm", False)),
            linear_out=int(hparams.get("linear_out") or 0),
            dropout_conv_p=hparams.get("dropout_conv_p"),
            dropout_dense_p=hparams.get("dropout_dense_p"),
            bn_torch_stats=bool(hparams.get("bn_torch_stats", False)),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, batch: dict, train: bool = False,
                 dropout_conv_rate=None, dropout_dense_rate=None) -> dict:
        """``dropout_conv_rate``/``dropout_dense_rate`` (optional, traced)
        override the static dropout attributes with runtime values —
        same bernoulli-keep semantics (``layers.traced_dropout``), so
        ``jax.vmap`` trains K HPO trials with K different rates in one
        program (train/vmap_hpo.py); 0.0 is bit-exact no-dropout. The
        default ``None`` keeps the static ``nn.Dropout`` path."""
        x = batch[self.input_key]
        if x.ndim == 4:
            x = x[..., None]  # (B, D, H, W) -> NDHWC
        x = x.astype(self.dtype)

        x = ConvTower3D(self.conv_out, self.filter_size, self.batchnorm,
                        self.dropout_conv_p, self.dtype,
                        self.bn_torch_stats, self.s2d_pool,
                        name="convs")(x, train,
                                      dropout_rate=dropout_conv_rate)
        h = global_avg_pool(x)
        if dropout_dense_rate is not None and self.linear_out:
            if train:
                h = traced_dropout(self, h, dropout_dense_rate, self.dtype)
        elif self.dropout_dense_p is not None and self.linear_out:
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

    def fusion_tap(self) -> str:
        """Which embedding the stage-2 fusion uses (anat_pet_fusion.py:28-31):
        the 2-class checkpoints are cut to the GAP features, the 3-class
        ones to the hidden dense output."""
        return "gap" if self.n_classes == 2 else "dense"


class RandomBenchmarkAllCN(SmallPETCNN):
    """Predict-all-CN floor baseline (reference pet_cnn.py:85-90)."""

    @nn.compact
    def __call__(self, batch: dict, train: bool = False) -> dict:
        out = super().__call__(batch, train)
        logits = jnp.zeros_like(out["logits"])
        logits = logits.at[..., 0].set(1.0)
        out["logits"] = logits
        return out
