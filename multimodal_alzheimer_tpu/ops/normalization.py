"""On-device volume normalization (the reference's per-sample host hot path).

The reference normalizes each scan inside 32 DataLoader worker *processes*
(reference: pkg/utils/dataloader.py:183-321); here normalization is a
jit-compiled device function that batches via ``vmap`` and fuses into the
training step, so volumes stream host->HBM raw and never round-trip.

Supported modes (dataloader.py parity):
  * PET: z-score with train-split global stats (dataloader.py:213-217),
  * MRI 'per_scan_norm'='normalize': per-scan z-score over nonzero brain
    voxels, then re-masked (dataloader.py:252-260),
  * MRI 'per_scan_norm'='min_max': quantile min-max into [0,1] with clamping,
    then re-masked (dataloader.py:261-270),
  * MRI 'all_scan_norm': z-score with precomputed split stats
    (dataloader.py:274-278).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.ops.quantile import (
    masked_nonzero_mean_std,
    masked_nonzero_quantile,
)


def zscore_normalize(volume: jnp.ndarray, mean, std) -> jnp.ndarray:
    """(x - mean) / std — torchvision.Normalize semantics on a volume."""
    return (volume - mean) / std


def normalize_pet(volume: jnp.ndarray, mean: float, std: float) -> jnp.ndarray:
    """PET z-score with train-split constants (e.g. 0.5145/0.5383)."""
    return zscore_normalize(volume, mean, std)


def mri_per_scan_zscore(volume: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-scan z-score over nonzero brain voxels, re-masked afterwards."""
    mean, std = masked_nonzero_mean_std(volume, mask)
    return zscore_normalize(volume, mean, std) * mask


def mri_per_scan_minmax(volume: jnp.ndarray, mask: jnp.ndarray,
                        quantile: float = 0.99) -> jnp.ndarray:
    """Quantile min-max into [0,1] over nonzero brain voxels, re-masked.

    quant_max = Q(q), quant_min = Q(1-q); scale, clamp, re-mask
    (reference: dataloader.py:261-270).
    """
    quants = masked_nonzero_quantile(volume, mask, (quantile, 1.0 - quantile))
    quant_max, quant_min = quants[0], quants[1]
    out = (volume - quant_min) / (quant_max - quant_min)
    out = jnp.clip(out, 0.0, 1.0)
    return out * mask


def normalize_mri(volume: jnp.ndarray, mask: jnp.ndarray | None,
                  normalize_mri_cfg: dict | None,
                  quantile: float = 0.99) -> jnp.ndarray:
    """Dispatch on the reference's ``normalize_mri`` config dict.

    Config shapes (dataloader.py docstring:47-57):
      {'per_scan_norm': 'normalize'} | {'per_scan_norm': 'min_max'} |
      {'all_scan_norm': {'mean': m, 'std': s}} | None
    """
    if normalize_mri_cfg is None:
        return volume
    assert len(normalize_mri_cfg) == 1
    if "per_scan_norm" in normalize_mri_cfg:
        mode = normalize_mri_cfg["per_scan_norm"]
        if mode == "normalize":
            return mri_per_scan_zscore(volume, mask)
        if mode == "min_max":
            assert 0.0 <= quantile <= 1.0
            return mri_per_scan_minmax(volume, mask, quantile)
        raise ValueError(
            'If you want to normalize per scan you have to pass either '
            '"normalize" or "min_max"')
    if "all_scan_norm" in normalize_mri_cfg:
        stats = normalize_mri_cfg["all_scan_norm"]
        return zscore_normalize(volume, stats["mean"], stats["std"])
    raise ValueError('If you use the argument "normalize_mri" only '
                     '"per_scan_norm" or "all_scan_norm" are allowed as keys!')


# Batched variants: leading batch axis, jit-compiled once per shape.
batched_per_scan_zscore = jax.jit(jax.vmap(mri_per_scan_zscore))
batched_per_scan_minmax = jax.jit(
    jax.vmap(mri_per_scan_minmax, in_axes=(0, 0, None)),
    static_argnums=(2,))


def batched_mri_per_scan_minmax(volume: jnp.ndarray, mask: jnp.ndarray,
                                quantile: float = 0.99) -> jnp.ndarray:
    """Batched quantile min-max — the production (fast) MRI path.

    Same outputs as ``vmap(mri_per_scan_minmax)`` but the exact quantiles
    come from the Pallas radix-select kernel instead of a full ~903k-voxel
    sort per scan (sort: ~319 ms at batch 128 on v5e; kernel: ~34 ms —
    both measured round 3). Falls back to the sort oracle
    off-TPU (the kernel's interpreter mode is far slower than XLA:CPU's
    sort, and tests compare the two for parity anyway).
    """
    if jax.default_backend() != "tpu":
        return batched_per_scan_minmax(volume, mask, quantile)
    from multimodal_alzheimer_tpu.ops.pallas_norm import per_scan_minmax

    return per_scan_minmax(volume, mask, quantile)


def batched_minmax_apply(volume: jnp.ndarray, mask: jnp.ndarray,
                         qmin: jnp.ndarray, qmax: jnp.ndarray) -> jnp.ndarray:
    """(x - qmin)/(qmax - qmin) -> clamp [0,1] -> remask with given (B,)
    per-scan quantiles — the memoized production min-max path.

    Per-scan quantiles depend only on the raw volume (training-invariant),
    so the dataset memoizes them per sample (data/dataset.py) and the step
    only pays this elementwise pass instead of the 32-pass radix selection
    every step. Deliberately plain XLA, NOT the Pallas apply kernel: on
    raw (un-tiled) operands ``ops/pallas_norm.minmax_apply`` pays pad +
    reshape + unpad copies (~3 extra full passes over the 91^3 batch),
    while XLA fuses this whole chain into one read of vol+mask and one
    write (the Pallas apply only wins inside ``per_scan_minmax`` where the
    operands are already tiled for the selection kernel).
    """
    expand = (slice(None),) + (None,) * (volume.ndim - 1)
    out = (volume - qmin[expand]) / (qmax - qmin)[expand]
    return jnp.clip(out, 0.0, 1.0) * mask


def batched_normalize_mri(volume: jnp.ndarray, mask: jnp.ndarray | None,
                          normalize_mri_cfg: dict | None,
                          quantile: float = 0.99,
                          qminmax: jnp.ndarray | None = None) -> jnp.ndarray:
    """Batch-level ``normalize_mri`` dispatch (fast paths where they exist).

    Semantics of ``vmap(normalize_mri)`` over a (B, ...) volume batch; the
    min_max mode routes through the Pallas radix-select quantiles on TPU,
    or — when ``qminmax`` (B, 2) [Q(1-q), Q(q)] memoized per-scan
    quantiles are supplied — skips the selection entirely.
    """
    if normalize_mri_cfg is None:
        return volume
    assert len(normalize_mri_cfg) == 1
    if mask is None:
        mask = jnp.ones_like(volume)
    if "per_scan_norm" in normalize_mri_cfg:
        mode = normalize_mri_cfg["per_scan_norm"]
        if mode == "normalize":
            return jax.vmap(mri_per_scan_zscore)(volume, mask)
        if mode == "min_max":
            assert 0.0 <= quantile <= 1.0
            if qminmax is not None:
                return batched_minmax_apply(volume, mask,
                                            qminmax[:, 0], qminmax[:, 1])
            return batched_mri_per_scan_minmax(volume, mask, quantile)
        raise ValueError(
            'If you want to normalize per scan you have to pass either '
            '"normalize" or "min_max"')
    if "all_scan_norm" in normalize_mri_cfg:
        stats = normalize_mri_cfg["all_scan_norm"]
        return zscore_normalize(volume, stats["mean"], stats["std"])
    raise ValueError('If you use the argument "normalize_mri" only '
                     '"per_scan_norm" or "all_scan_norm" are allowed as keys!')


@partial(jax.jit, static_argnames=("batch_size",))
def _split_stats_step(carry, volume, batch_size=None):
    mean_x, mean_x2, count = carry
    return (mean_x + jnp.mean(volume), mean_x2 + jnp.mean(volume ** 2),
            count + 1)


def compute_split_stats(volumes_iter) -> tuple[float, float]:
    """Streaming split-level mean/std over an iterable of volumes.

    Parity with pkg/utils/standardization.py:34-55: accumulates per-scan
    means of x and x**2, then ``std = sqrt(E[mean_x2] - mean**2)`` (a
    mean-of-means estimator, not a true pooled std — reproduced as-is since
    the reference's published constants were computed this way).
    """
    carry = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
    for vol in volumes_iter:
        carry = _split_stats_step(carry, jnp.asarray(vol))
    mean_x, mean_x2, count = carry
    mean = mean_x / count
    std = jnp.sqrt(mean_x2 / count - mean ** 2)
    return float(mean), float(std)
