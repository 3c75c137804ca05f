"""Exact quantiles over the nonzero-masked voxel set.

The reference computes per-scan MRI normalization bounds with
``torch.quantile(data_masked_mri, q, interpolation='linear')`` where
``data_masked_mri`` is the flattened brain-masked volume with all zero
entries dropped (reference: pkg/utils/dataloader.py:244-264). The voxel count
is data-dependent, which XLA cannot express directly — instead, invalid
voxels are replaced with +inf so one sort pushes them to the tail, and rank
arithmetic uses the dynamic valid count. This is exact (not approximate)
linear-interpolation quantile parity on fixed-size buffers.
"""

from __future__ import annotations

import jax.numpy as jnp


def _valid_values(volume: jnp.ndarray, mask: jnp.ndarray | None):
    """Flattened (values, validity) where valid == nonzero after masking.

    Note the reference's semantics: masking multiplies the volume by the
    binary mask and then drops *all* zeros — so zero-valued voxels inside the
    brain are excluded from the statistics as well.
    """
    vals = volume.reshape(-1)
    if mask is not None:
        vals = vals * mask.reshape(-1)
    valid = vals != 0
    return vals, valid


def masked_nonzero_quantile(
    volume: jnp.ndarray,
    mask: jnp.ndarray | None,
    qs: tuple[float, ...] | jnp.ndarray,
) -> jnp.ndarray:
    """Exact linear-interpolation quantiles of the nonzero masked voxels.

    Args:
      volume: any-shape float array (one scan).
      mask: optional binary mask, same shape (1 = keep voxel).
      qs: quantile levels in [0, 1]; a static tuple or a traced array.

    Returns:
      (len(qs),) array of quantile values, matching
      ``torch.quantile(values, q, interpolation='linear')``.
    """
    vals, valid = _valid_values(volume, mask)
    dtype = vals.dtype
    # Invalid entries sort to the tail.
    sort_vals = jnp.where(valid, vals, jnp.array(jnp.inf, dtype))
    sorted_vals = jnp.sort(sort_vals)
    n = jnp.sum(valid)

    qs_arr = jnp.asarray(qs, dtype=jnp.float32)
    rank = qs_arr * (n - 1).astype(jnp.float32)
    lo = jnp.clip(jnp.floor(rank).astype(jnp.int32), 0, sorted_vals.size - 1)
    hi = jnp.clip(lo + 1, 0, sorted_vals.size - 1)
    # When rank is integral, frac = 0 so v_hi never leaks in.
    frac = (rank - lo.astype(jnp.float32)).astype(dtype)
    v_lo = sorted_vals[lo]
    v_hi = jnp.where(hi < n, sorted_vals[hi], v_lo)  # guard tail +inf
    return v_lo + frac * (v_hi - v_lo)


def host_masked_nonzero_quantile(volume, mask, qs) -> "np.ndarray":
    """Numpy twin of :func:`masked_nonzero_quantile` for host-side memoing.

    Exact selection via ``np.partition`` with the same f32 rank arithmetic
    as the device paths (rank = q*(n-1) in f32; linear interpolation in
    f32), so memoized values agree with the Pallas radix-select kernel on
    the selected order statistics bit-for-bit and with the interpolated
    result to ~1 ulp. Used by data/dataset.py to compute per-sample
    min-max bounds once (they depend only on the raw volume, not on
    training state) instead of every step.
    """
    import numpy as np

    vals = volume.astype(np.float32, copy=False).ravel()
    if mask is not None:
        vals = vals * mask.astype(np.float32, copy=False).ravel()
    vals = vals[vals != 0.0]
    n = vals.size
    if n < 2:
        raise ValueError(f"need >= 2 valid voxels, got {n}")
    ranks = [np.float32(q) * np.float32(n - 1) for q in qs]
    los = [int(np.floor(r)) for r in ranks]
    his = [min(lo + 1, n - 1) for lo in los]
    # One shared introselect for every requested order statistic (a
    # second np.partition call would re-scan all ~900k voxels; measured
    # 48.5 -> ~25 ms/volume on a 1-core host for the (1-q, q) pair).
    part = np.partition(vals, sorted(set(los + his)))
    out = np.empty(len(qs), np.float32)
    for i, (rank, lo, hi) in enumerate(zip(ranks, los, his)):
        frac = np.float32(rank) - np.float32(lo)
        out[i] = part[lo] + frac * (part[hi] - part[lo])
    return out


def masked_nonzero_mean_std(
    volume: jnp.ndarray,
    mask: jnp.ndarray | None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean and Bessel-corrected std of the nonzero masked voxels.

    Matches ``torch.std_mean`` (unbiased) over the same value set the
    reference uses for 'per_scan_norm': 'normalize'
    (reference: dataloader.py:252-260). Two-pass for fp32 accuracy.
    """
    vals, valid = _valid_values(volume, mask)
    n = jnp.sum(valid).astype(vals.dtype)
    total = jnp.sum(jnp.where(valid, vals, 0))
    mean = total / n
    sq = jnp.where(valid, (vals - mean) ** 2, 0)
    var = jnp.sum(sq) / jnp.maximum(n - 1, 1)
    return mean, jnp.sqrt(var)
