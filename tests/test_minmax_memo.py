"""Memoized per-scan min-max quantiles (the steady-state production path).

Per-scan quantiles depend only on the raw volume — training-invariant —
so data/dataset.py memoizes them per sample (host np.partition with the
device paths' f32 rank arithmetic) and get_device_preprocess() skips the
per-step quantile selection. These tests pin:

* host/device quantile agreement (order stats exact, interpolation ~1 ulp),
* normalized-output parity between the memoized apply and the full
  in-step selection path,
* dataset plumbing: key presence, sidecar persistence, the
  transform-hook guard, and f16 cache-dtype consistency.
"""

import numpy as np
import pytest

from multimodal_alzheimer_tpu.data import MultiModalDataset
from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split
from multimodal_alzheimer_tpu.ops.quantile import (
    host_masked_nonzero_quantile,
    masked_nonzero_quantile,
)

MINMAX = {"per_scan_norm": "min_max"}


@pytest.fixture(scope="module")
def split(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_memo")
    return write_synthetic_split(str(out), n_subjects=(8, 3, 3), seed=7)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("with_mask", [True, False])
def test_host_quantile_matches_device_oracle(seed, with_mask):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    vol = rng.normal(900, 400, (11, 13, 9)).astype(np.float32)
    # duplicates + exact zeros inside the mask (both are dropped)
    vol[rng.random(vol.shape) < 0.1] = 0.0
    vol[rng.random(vol.shape) < 0.2] = 123.25
    mask = ((rng.random(vol.shape) > 0.3).astype(np.float32)
            if with_mask else None)
    qs = (0.01, 0.5, 0.98, 0.99, 1.0, 0.0)
    host = host_masked_nonzero_quantile(vol, mask, qs)
    dev = np.asarray(masked_nonzero_quantile(
        jnp.asarray(vol), None if mask is None else jnp.asarray(mask), qs))
    np.testing.assert_allclose(host, dev, rtol=2e-7, atol=0)


def test_host_quantile_rejects_degenerate():
    vol = np.zeros((4, 4, 4), np.float32)
    vol[0, 0, 0] = 1.0
    with pytest.raises(ValueError):
        host_masked_nonzero_quantile(vol, None, (0.5,))


def test_memoized_apply_matches_in_step_selection():
    """batched_normalize_mri(qminmax=memo) == the full selection path."""
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
    )

    rng = np.random.default_rng(3)
    vol = rng.normal(900, 400, (4, 11, 13, 9)).astype(np.float32)
    mask = (rng.random(vol.shape) > 0.3).astype(np.float32)
    q = 0.98
    memo = np.stack([host_masked_nonzero_quantile(
        vol[i], mask[i], (1.0 - q, q)) for i in range(vol.shape[0])])
    full = batched_normalize_mri(jnp.asarray(vol), jnp.asarray(mask),
                                 MINMAX, q)
    memoized = batched_normalize_mri(jnp.asarray(vol), jnp.asarray(mask),
                                     MINMAX, q, qminmax=jnp.asarray(memo))
    np.testing.assert_allclose(np.asarray(memoized), np.asarray(full),
                               rtol=0, atol=1e-6)


def test_dataset_attaches_and_persists_bounds(split, tmp_path):
    cache = tmp_path / "vol_cache"
    ds = MultiModalDataset(split["train"], modalities=["t1w"],
                           normalize_mri=MINMAX, quantile=0.98,
                           cache_dir=str(cache))
    item = ds[0]
    assert "mri_qminmax" in item
    bounds = item["mri_qminmax"]
    assert bounds.shape == (2,) and bounds.dtype == np.float32
    expected = host_masked_nonzero_quantile(
        item["mri"], item.get("mri_mask"), (0.02, 0.98))
    np.testing.assert_array_equal(bounds, expected)
    assert bounds[0] < bounds[1]

    # sidecar persisted: a fresh instance reads it without recomputing
    sidecars = list(cache.glob("*.q.npy"))
    assert sidecars, "expected a persisted quantile sidecar"
    ds2 = MultiModalDataset(split["train"], modalities=["t1w"],
                            normalize_mri=MINMAX, quantile=0.98,
                            cache_dir=str(cache))
    np.testing.assert_array_equal(ds2[0]["mri_qminmax"], bounds)
    # host-normalized parity items never carry the memo key
    assert "mri_qminmax" not in ds.host_normalized_item(0)


def test_memo_guards(split):
    # transform hook could be a random augmentation -> no memo
    ds = MultiModalDataset(split["train"], modalities=["t1w"],
                           normalize_mri=MINMAX,
                           transform_mri=lambda v: v)
    assert "mri_qminmax" not in ds[0]
    # opt-out flag
    ds = MultiModalDataset(split["train"], modalities=["t1w"],
                           normalize_mri=MINMAX, memoize_minmax=False)
    assert "mri_qminmax" not in ds[0]
    # z-score mode has nothing to memoize
    ds = MultiModalDataset(split["train"], modalities=["t1w"],
                           normalize_mri={"per_scan_norm": "normalize"})
    assert "mri_qminmax" not in ds[0]


def test_preprocess_consumes_memo_and_matches(split):
    import jax.numpy as jnp

    ds_memo = MultiModalDataset(split["train"], modalities=["t1w"],
                                normalize_mri=MINMAX, quantile=0.98)
    ds_plain = MultiModalDataset(split["train"], modalities=["t1w"],
                                 normalize_mri=MINMAX, quantile=0.98,
                                 memoize_minmax=False)
    idxs = range(min(3, len(ds_memo)))

    def collate(ds):
        items = [ds[i] for i in idxs]
        return {k: jnp.asarray(np.stack([it[k] for it in items]))
                for k in items[0]}

    out_memo = ds_memo.get_device_preprocess()(collate(ds_memo))
    out_plain = ds_plain.get_device_preprocess()(collate(ds_plain))
    assert "mri_qminmax" not in out_memo and "mri_mask" not in out_memo
    assert set(out_memo) == set(out_plain)
    np.testing.assert_allclose(np.asarray(out_memo["mri"]),
                               np.asarray(out_plain["mri"]),
                               rtol=0, atol=1e-6)


def test_memo_respects_cache_dtype(split, tmp_path):
    """f16-narrowed volumes: bounds computed from the narrowed values."""
    ds = MultiModalDataset(split["train"], modalities=["t1w"],
                           normalize_mri=MINMAX, quantile=0.98,
                           cache_dir=str(tmp_path / "c16"),
                           cache_dtype="float16")
    item = ds[0]
    assert item["mri"].dtype == np.float16
    expected = host_masked_nonzero_quantile(
        item["mri"], item.get("mri_mask"), (0.02, 0.98))
    np.testing.assert_array_equal(item["mri_qminmax"], expected)


def test_memo_evicts_stale_quantiles(split):
    """ADVICE r3 #3: rebinding the percentile drops the old quantile's
    in-memory entries (an HPO sweep over many percentiles would
    otherwise accumulate dead entries forever) while still serving the
    right bounds for the new one."""
    ds = MultiModalDataset(split["train"], modalities=["t1w"],
                           normalize_mri=MINMAX, quantile=0.99)
    b99 = ds[0]["mri_qminmax"]
    assert set(k[1] for k in ds._minmax_memo) == {0.99}
    ds.quantile = 0.95
    b95 = ds[0]["mri_qminmax"]
    assert set(k[1] for k in ds._minmax_memo) == {0.95}
    assert not np.array_equal(b95, b99)
    ds.quantile = 0.99
    np.testing.assert_array_equal(ds[0]["mri_qminmax"], b99)
    assert set(k[1] for k in ds._minmax_memo) == {0.99}
