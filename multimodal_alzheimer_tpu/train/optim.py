"""Optimizers: per-group Adam with torch semantics + ReduceLROnPlateau.

The reference builds torch Adam with per-parameter-group learning rates —
head at ``lr``, pretrained backbone frozen or at ``lr_pretrained``
(reference: mri_models/anat_cnn.py:111-128) — and torch's
``weight_decay`` (L2 added to the gradient *before* the Adam moments, which
is NOT AdamW). Equivalent optax chain per group:
``add_decayed_weights(l2) -> scale_by_adam() -> scale(-lr)``, composed with
``optax.multi_transform``; frozen groups are ``optax.set_to_zero()``.

``PlateauScheduler`` reproduces ``torch.optim.lr_scheduler.ReduceLROnPlateau``
defaults (mode 'min', factor, patience=10, rel threshold 1e-4, cooldown 0)
as a host-side object producing an ``lr_scale`` multiplier; the train step
multiplies the (linear-in-lr) updates by it, which keeps Adam moments
intact across LR drops exactly like torch.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import optax

FROZEN = "frozen"


def adam_group(lr: float, l2_reg: float = 0.0) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay=l2) equivalent."""
    parts = []
    if l2_reg:
        parts.append(optax.add_decayed_weights(l2_reg))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def build_optimizer(group_lrs: Dict[str, Optional[float]],
                    label_fn: Callable,
                    params=None,
                    l2_reg: float = 0.0) -> optax.GradientTransformation:
    """Multi-group optimizer.

    Args:
      group_lrs: group name -> lr (None => frozen: no updates, matching
        ``requires_grad = False`` / exclusion from the torch optimizer).
      label_fn: maps a param path tuple (module names) -> group name.
      params: unused (labels are computed lazily from the tree passed to
        ``optimizer.init``); kept for call-site clarity.
      l2_reg: torch-style weight decay, applied to all non-frozen groups
        (the reference passes one ``weight_decay`` for the whole optimizer).
    """
    transforms = {}
    for name, lr in group_lrs.items():
        transforms[name] = (optax.set_to_zero() if lr is None
                            else adam_group(lr, l2_reg))
    if FROZEN not in transforms:
        transforms[FROZEN] = optax.set_to_zero()

    def path_labels(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        labels = {}
        for path, _ in flat:
            keys = tuple(getattr(p, "key", getattr(p, "idx", str(p)))
                         for p in path)
            labels[keys] = label_fn(keys)
        def rebuild(path, _):
            keys = tuple(getattr(p, "key", getattr(p, "idx", str(p)))
                         for p in path)
            return labels[keys]
        return jax.tree_util.tree_map_with_path(rebuild, tree)

    return optax.multi_transform(transforms, path_labels)


def single_lr_optimizer(lr: float, l2_reg: float = 0.0):
    """Whole-model Adam (stage-1 training, e.g. pet_cnn.py:72-74)."""
    return adam_group(lr, l2_reg)


def head_pretrained_label_fn(head_prefixes: tuple,
                             pretrained_lr: Optional[float]):
    """Label fn for the reference's head/backbone split: params whose path
    starts with one of ``head_prefixes`` train at 'head' lr; everything
    else is 'pretrained' (or frozen when ``pretrained_lr`` is None) —
    mirroring anat_cnn.py:111-126."""

    def label(path: tuple) -> str:
        if any(path[0] == p or p in path for p in head_prefixes):
            return "head"
        return FROZEN if pretrained_lr is None else "pretrained"

    return label


class PlateauScheduler:
    """torch ReduceLROnPlateau parity (host-side, emits an lr multiplier)."""

    def __init__(self, factor: float, patience: int = 10,
                 threshold: float = 1e-4, mode: str = "min",
                 cooldown: int = 0, min_lr_scale: float = 0.0):
        assert mode == "min"
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.cooldown = cooldown
        self.min_lr_scale = min_lr_scale
        self.best = float("inf")
        self.num_bad_epochs = 0
        self.cooldown_counter = 0
        self.lr_scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr_scale = max(self.lr_scale * self.factor,
                                    self.min_lr_scale)
                self.cooldown_counter = self.cooldown
                self.num_bad_epochs = 0
        return self.lr_scale


class EarlyStopping:
    """Lightning EarlyStopping(monitor, mode='min', patience) parity
    (reference: train_pet_cnn.py:185-188): stop after ``patience``
    consecutive epochs without improvement (min_delta 0)."""

    def __init__(self, patience: int, mode: str = "min"):
        assert mode == "min"
        self.patience = patience
        self.best = float("inf")
        self.wait = 0

    def step(self, metric: float) -> bool:
        """Returns True when training should stop."""
        if metric < self.best:
            self.best = metric
            self.wait = 0
            return False
        self.wait += 1
        return self.wait >= self.patience
