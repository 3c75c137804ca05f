"""Normalization parity vs the reference's torch math (dataloader.py:206-281)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from multimodal_alzheimer_tpu.ops import (
    compute_split_stats,
    masked_nonzero_quantile,
    mri_per_scan_minmax,
    mri_per_scan_zscore,
    normalize_mri,
    normalize_pet,
)
from multimodal_alzheimer_tpu.ops.quantile import masked_nonzero_mean_std
from multimodal_alzheimer_tpu.ops import pallas_norm


SHAPE = (19, 23, 17)  # small volume; same code path as 91x109x91


def _volume_and_mask(seed=0, shape=SHAPE):
    rng = np.random.default_rng(seed)
    vol = (rng.normal(size=shape) * 400 + 900).astype(np.float32)
    mask = (rng.random(shape) > 0.4).astype(np.float32)
    return vol, mask


def _torch_masked_values(vol, mask):
    """Reference recipe: mask, flatten, drop zeros (dataloader.py:244-249)."""
    data = torch.tensor(vol) * torch.tensor(mask)
    data = data.reshape(-1)
    return data[data.nonzero()]


@pytest.mark.parametrize("q", [0.95, 0.98, 0.99, 1.0])
def test_masked_quantile_matches_torch(q):
    vol, mask = _volume_and_mask()
    vals = _torch_masked_values(vol, mask)
    expected_max = torch.quantile(vals, q, interpolation="linear").item()
    expected_min = torch.quantile(vals, 1 - q, interpolation="linear").item()

    ours = masked_nonzero_quantile(jnp.asarray(vol), jnp.asarray(mask),
                                   (q, 1.0 - q))
    np.testing.assert_allclose(np.asarray(ours[0]), expected_max, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours[1]), expected_min, rtol=1e-5)


def test_masked_quantile_without_mask():
    vol, _ = _volume_and_mask(seed=1)
    vals = torch.tensor(vol).reshape(-1)
    vals = vals[vals.nonzero()]
    expected = torch.quantile(vals, 0.5, interpolation="linear").item()
    ours = masked_nonzero_quantile(jnp.asarray(vol), None, (0.5,))
    np.testing.assert_allclose(np.asarray(ours[0]), expected, rtol=1e-5)


def test_masked_mean_std_matches_torch_std_mean():
    vol, mask = _volume_and_mask(seed=2)
    vals = _torch_masked_values(vol, mask)
    std_t, mean_t = torch.std_mean(vals)
    mean_o, std_o = masked_nonzero_mean_std(jnp.asarray(vol), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(mean_o), mean_t.item(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(std_o), std_t.item(), rtol=1e-4)


def test_per_scan_zscore_matches_reference_recipe():
    vol, mask = _volume_and_mask(seed=3)
    vals = _torch_masked_values(vol, mask)
    std_t, mean_t = torch.std_mean(vals)
    expected = ((torch.tensor(vol) - mean_t) / std_t) * torch.tensor(mask)

    ours = mri_per_scan_zscore(jnp.asarray(vol), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours), expected.numpy(),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("q", [0.95, 0.99])
def test_per_scan_minmax_matches_reference_recipe(q):
    vol, mask = _volume_and_mask(seed=4)
    vals = _torch_masked_values(vol, mask)
    qmax = torch.quantile(vals, q, interpolation="linear")
    qmin = torch.quantile(vals, 1 - q, interpolation="linear")
    expected = (torch.tensor(vol) - qmin) / (qmax - qmin)
    expected[expected > 1] = 1
    expected[expected < 0] = 0
    expected = expected * torch.tensor(mask)

    ours = mri_per_scan_minmax(jnp.asarray(vol), jnp.asarray(mask), q)
    np.testing.assert_allclose(np.asarray(ours), expected.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_normalize_pet():
    vol, _ = _volume_and_mask(seed=5)
    out = normalize_pet(jnp.asarray(vol), 0.5145, 0.5383)
    np.testing.assert_allclose(np.asarray(out), (vol - 0.5145) / 0.5383,
                               rtol=1e-5)


def test_normalize_mri_dispatch():
    vol, mask = _volume_and_mask(seed=6)
    v, m = jnp.asarray(vol), jnp.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(normalize_mri(v, m, {"per_scan_norm": "normalize"})),
        np.asarray(mri_per_scan_zscore(v, m)))
    np.testing.assert_allclose(
        np.asarray(normalize_mri(v, m, {"per_scan_norm": "min_max"}, 0.98)),
        np.asarray(mri_per_scan_minmax(v, m, 0.98)))
    stats = {"all_scan_norm": {"mean": 426.9336, "std": 1018.7830}}
    np.testing.assert_allclose(
        np.asarray(normalize_mri(v, m, stats)),
        (vol - 426.9336) / 1018.7830, rtol=1e-4)
    assert normalize_mri(v, m, None) is v
    with pytest.raises(ValueError):
        normalize_mri(v, m, {"per_scan_norm": "bogus"})
    with pytest.raises(ValueError):
        normalize_mri(v, m, {"bogus": 1})


def test_pallas_zscore_matches_xla(monkeypatch):
    vols = np.stack([_volume_and_mask(seed=s)[0] for s in (7, 8)])
    masks = np.stack([_volume_and_mask(seed=s)[1] for s in (7, 8)])
    expected = jax.vmap(mri_per_scan_zscore)(jnp.asarray(vols),
                                             jnp.asarray(masks))
    ours = pallas_norm.per_scan_zscore(jnp.asarray(vols), jnp.asarray(masks),
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected),
                               rtol=2e-3, atol=2e-4)


def test_pallas_minmax_apply_matches_xla():
    vols = np.stack([_volume_and_mask(seed=s)[0] for s in (9, 10)])
    masks = np.stack([_volume_and_mask(seed=s)[1] for s in (9, 10)])
    q = 0.98
    expected = jax.vmap(lambda v, m: mri_per_scan_minmax(v, m, q))(
        jnp.asarray(vols), jnp.asarray(masks))
    quants = jax.vmap(
        lambda v, m: masked_nonzero_quantile(v, m, (1.0 - q, q)))(
            jnp.asarray(vols), jnp.asarray(masks))
    ours = pallas_norm.minmax_apply(jnp.asarray(vols), jnp.asarray(masks),
                                    quants[:, 0], quants[:, 1],
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("qs", [(0.99, 0.01), (1.0, 0.0), (0.5,)])
def test_pallas_radix_select_matches_sort_oracle(qs):
    """The radix-select kernel replaces the full-sort oracle on the
    production TPU min_max path. The selected order statistics are
    bit-identical; the final linear interpolation may differ by 1 ulp
    because XLA's FMA contraction of v_lo + frac*(v_hi - v_lo) varies
    between the two separately-jitted programs — hence rtol ~1 f32 ulp."""
    vols = np.stack([_volume_and_mask(seed=s)[0] for s in (12, 13, 14)])
    masks = np.stack([_volume_and_mask(seed=s)[1] for s in (12, 13, 14)])
    got = pallas_norm.batched_masked_quantiles(
        jnp.asarray(vols), jnp.asarray(masks), qs, interpret=True)
    want = np.stack([
        np.asarray(masked_nonzero_quantile(jnp.asarray(v), jnp.asarray(m),
                                           qs))
        for v, m in zip(vols, masks)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-7, atol=0)


def test_pallas_radix_select_duplicates_and_negatives():
    """Heavy duplicates (integer-valued floats) exercise the cnt_le >
    lo+1 branch of the hi pass; negatives exercise the sign-flip keys."""
    rng = np.random.default_rng(15)
    vols = np.round(rng.normal(size=(2,) + SHAPE) * 4).astype(np.float32)
    masks = np.ones_like(vols)
    qs = (0.99, 0.01, 0.5)
    got = pallas_norm.batched_masked_quantiles(
        jnp.asarray(vols), jnp.asarray(masks), qs, interpret=True)
    want = np.stack([
        np.asarray(masked_nonzero_quantile(jnp.asarray(v), jnp.asarray(m),
                                           qs))
        for v, m in zip(vols, masks)])
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pallas_per_scan_minmax_matches_oracle():
    """Fused select+apply vs the sort-oracle path; tolerance covers the
    1-ulp FMA-contraction freedom in the quantile interpolation (see
    test_pallas_radix_select_matches_sort_oracle)."""
    vols = np.stack([_volume_and_mask(seed=s)[0] for s in (16, 17)])
    masks = np.stack([_volume_and_mask(seed=s)[1] for s in (16, 17)])
    q = 0.99
    want = jax.vmap(lambda v, m: mri_per_scan_minmax(v, m, q))(
        jnp.asarray(vols), jnp.asarray(masks))
    got = pallas_norm.per_scan_minmax(jnp.asarray(vols), jnp.asarray(masks),
                                      q, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-9)


def test_batched_normalize_mri_dispatch():
    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
    )

    vols = np.stack([_volume_and_mask(seed=s)[0] for s in (18, 19)])
    masks = np.stack([_volume_and_mask(seed=s)[1] for s in (18, 19)])
    v, m = jnp.asarray(vols), jnp.asarray(masks)
    np.testing.assert_allclose(
        np.asarray(batched_normalize_mri(v, m, {"per_scan_norm":
                                                "normalize"})),
        np.asarray(jax.vmap(mri_per_scan_zscore)(v, m)))
    np.testing.assert_allclose(
        np.asarray(batched_normalize_mri(v, m, {"per_scan_norm": "min_max"},
                                         0.98)),
        np.asarray(jax.vmap(lambda a, b: mri_per_scan_minmax(a, b, 0.98))(
            v, m)), rtol=1e-6, atol=1e-7)
    # mask=None means all voxels valid
    np.testing.assert_allclose(
        np.asarray(batched_normalize_mri(v, None,
                                         {"per_scan_norm": "normalize"})),
        np.asarray(jax.vmap(mri_per_scan_zscore)(v, jnp.ones_like(v))))
    assert batched_normalize_mri(v, m, None) is v
    with pytest.raises(ValueError):
        batched_normalize_mri(v, m, {"per_scan_norm": "bogus"})
    with pytest.raises(ValueError):
        batched_normalize_mri(v, m, {"bogus": 1})


def test_compute_split_stats_matches_reference_estimator():
    """standardization.py:34-55 mean-of-means estimator parity."""
    rng = np.random.default_rng(11)
    vols = [rng.normal(size=SHAPE).astype(np.float32) * (i + 1)
            for i in range(5)]
    mean_x = sum(torch.tensor(v).mean() for v in vols) / len(vols)
    mean_x2 = sum((torch.tensor(v) ** 2).mean() for v in vols) / len(vols)
    std = torch.sqrt(mean_x2 - mean_x ** 2)

    mean_o, std_o = compute_split_stats(vols)
    np.testing.assert_allclose(mean_o, mean_x.item(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(std_o, std.item(), rtol=1e-4)
