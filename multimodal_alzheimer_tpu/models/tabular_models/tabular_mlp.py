"""On-device tabular classifier (TabPFN replacement).

The reference's tabular branch is a pretrained TabPFN transformer fit on
the train split at construction, whose 1024-d decoder activations feed the
fusion heads via a forward hook — and whose forward pass runs on **CPU
inside every training step** (reference:
tabular_models/dl_approach.py:47-78, fusion_models/tabular_mri_fusion.py:66-76).

TPU-native replacement (per BASELINE.json configs: "tabular-only MLP"): a
standardizing MLP over the 9 clinical features with a built-in 1024-d
embedding tap so the stage-2/3 fusion heads consume the same-width feature
as the reference's TabPFN hook. This is a *documented metric-level
divergence* (SURVEY.md hard part 3): balanced-accuracy/MCC parity, not
logit parity, on the tabular branch.

Consumes batch key 'tabular' of shape (B, 9).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models.layers import traced_dropout


class TabularMLP(nn.Module):
    n_classes: int
    hidden: Sequence[int] = (256, 1024)
    dropout_p: float = 0.0
    # Train-split feature standardization (mean/std per feature); identity
    # by default. Stored as hparams so checkpoints are self-contained.
    feature_mean: Sequence[float] | None = None
    feature_std: Sequence[float] | None = None
    dtype: jnp.dtype = jnp.float32
    input_key: str = "tabular"
    # Migration escape hatch: when this key is present in the batch, its
    # value is used as the 1024-d decoder embedding directly (the MLP trunk
    # is skipped). Lets reference users feed TabPFN decoder activations
    # computed offline (reference dl_approach.py:71-78) into converted
    # stage-2/3 fusion checkpoints — exact logit parity on the fusion path.
    embedding_key: str = "tabular_embedding"

    @classmethod
    def from_hparams(cls, hparams: dict, **overrides) -> "TabularMLP":
        kwargs = dict(
            n_classes=hparams["n_classes"],
            hidden=tuple(hparams.get("hidden", (256, 1024))),
            dropout_p=float(hparams.get("dropout_p", 0.0)),
            feature_mean=(tuple(hparams["feature_mean"])
                          if hparams.get("feature_mean") is not None else None),
            feature_std=(tuple(hparams["feature_std"])
                         if hparams.get("feature_std") is not None else None),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, batch: dict, train: bool = False,
                 dropout_rate=None) -> dict:
        """Forward pass.

        ``dropout_rate`` (optional, traced) overrides the static
        ``dropout_p`` attribute — same masking semantics as ``nn.Dropout``
        (bernoulli keep mask, survivors scaled by 1/keep) but with the rate
        as a runtime value, so ``jax.vmap`` can train K trials with K
        different dropout rates in one program (train/vmap_hpo.py). The
        default ``None`` keeps the static ``nn.Dropout`` path bit-for-bit.
        """
        if self.embedding_key and self.embedding_key in batch:
            h = batch[self.embedding_key].astype(self.dtype)
            embeddings = {"decoder": h}
            logits = nn.Dense(self.n_classes, dtype=self.dtype,
                              name="cls")(h)
            return {"logits": logits.astype(jnp.float32),
                    "embeddings": embeddings}
        x = batch[self.input_key].astype(self.dtype)
        if x.ndim == 3:  # tolerate the reference's unsqueeze(1)
            x = x[:, 0, :]
        if self.feature_mean is not None:
            x = (x - jnp.asarray(self.feature_mean, self.dtype)) / \
                jnp.asarray(self.feature_std, self.dtype)
        h = x
        for i, width in enumerate(self.hidden):
            h = nn.Dense(width, dtype=self.dtype, name=f"dense_{i}")(h)
            h = nn.relu(h)
            if dropout_rate is not None:
                if train:
                    h = traced_dropout(self, h, dropout_rate, self.dtype)
            elif self.dropout_p:
                h = nn.Dropout(rate=self.dropout_p, name=f"dropout_{i}")(
                    h, deterministic=not train)
        # 'decoder' tap: same role (and default width, 1024) as the
        # reference's TabPFN decoder-hook embedding (dl_approach.py:71-78).
        embeddings = {"decoder": h}
        logits = nn.Dense(self.n_classes, dtype=self.dtype, name="cls")(h)
        return {"logits": logits.astype(jnp.float32),
                "embeddings": embeddings}

    def fusion_tap(self) -> str:
        return "decoder"


def compute_feature_stats(features) -> tuple[list, list]:
    """Per-feature mean/std over the train split (for standardization)."""
    import numpy as np

    arr = np.asarray(features, dtype=np.float64)
    mean = arr.mean(axis=0)
    std = arr.std(axis=0)
    std = np.where(std == 0, 1.0, std)
    return mean.tolist(), std.tolist()
