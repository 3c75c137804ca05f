"""Dataset + NIfTI IO tests on synthetic ADNI-like fixtures."""

import numpy as np
import pytest
import torch

from multimodal_alzheimer_tpu.data import MultiModalDataset, load_nifti, save_nifti
from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split
from multimodal_alzheimer_tpu.data.tabular import tabular_vector


@pytest.fixture(scope="module")
def split(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    return write_synthetic_split(str(out), n_subjects=(10, 3, 3), seed=0)


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8, np.float64])
def test_nifti_roundtrip(tmp_path, compress, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        vol = rng.normal(size=(7, 9, 5)).astype(dtype)
    else:
        vol = rng.integers(0, 100, size=(7, 9, 5)).astype(dtype)
    path = tmp_path / ("v.nii.gz" if compress else "v.nii")
    save_nifti(path, vol)
    back = load_nifti(path, dtype=np.float64)
    np.testing.assert_allclose(back, vol.astype(np.float64))


def test_pet_only_dataset(split):
    ds = MultiModalDataset(split["train"], modalities=["pet1451"],
                           normalize_pet={"mean": 0.5145, "std": 0.5383})
    assert len(ds) > 0
    item = ds[0]
    assert set(item) == {"pet1451", "label"}
    assert item["pet1451"].shape == (19, 23, 17)
    # host-normalized parity with torchvision Normalize semantics
    norm = ds.host_normalized_item(0)
    expected = (torch.tensor(item["pet1451"]) - 0.5145) / 0.5383
    np.testing.assert_allclose(norm["pet1451"], expected.numpy(), rtol=1e-5)


def test_mri_dataset_per_scan_minmax(split):
    ds = MultiModalDataset(split["train"], modalities=["t1w"],
                           normalize_mri={"per_scan_norm": "min_max"},
                           quantile=0.98)
    item = ds[0]
    assert {"mri", "mri_mask", "label"} <= set(item)
    norm = ds.host_normalized_item(0)
    assert "mri_mask" not in norm
    # reference recipe oracle
    vol = torch.tensor(item["mri"])
    mask = torch.tensor(item["mri_mask"])
    vals = (vol * mask).reshape(-1)
    vals = vals[vals.nonzero()]
    qmax = torch.quantile(vals, 0.98, interpolation="linear")
    qmin = torch.quantile(vals, 0.02, interpolation="linear")
    expected = (vol - qmin) / (qmax - qmin)
    expected[expected > 1] = 1
    expected[expected < 0] = 0
    expected *= mask
    np.testing.assert_allclose(norm["mri"], expected.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_binary_classification_drops_mci(split):
    ds3 = MultiModalDataset(split["train"], modalities=["tabular"])
    ds2 = MultiModalDataset(split["train"], modalities=["tabular"],
                            binary_classification=True)
    ds2b = MultiModalDataset(split["train"], modalities=["tabular"],
                             binary_classification=2)
    assert len(ds2) == len(ds2b) < len(ds3)
    assert ds2.label_mapping == {"CN": 0, "Dementia": 1}
    assert ds3.label_mapping == {"CN": 0, "MCI": 1, "Dementia": 2}
    labels2 = {int(ds2[i]["label"]) for i in range(len(ds2))}
    assert labels2 <= {0, 1}


def test_label_distribution(split):
    ds = MultiModalDataset(split["train"], modalities=["tabular"])
    counts, normalized = ds.get_label_distribution()
    assert counts.shape == (3,)
    np.testing.assert_allclose(np.nansum(normalized), 1.0, rtol=1e-6)
    # class weights as the reference builds them (train_pet_cnn.py:166-167)
    weights = 1 - normalized
    assert np.all(weights[~np.isnan(weights)] >= 0)


def test_tabular_whole_brain_compat(split):
    ds = MultiModalDataset(split["train"], modalities=["tabular"])
    row = ds.ds.iloc[0]
    vec_bug = tabular_vector(row, compat_whole_brain_bug=True)
    vec_fix = tabular_vector(row, compat_whole_brain_bug=False)
    assert vec_bug[4] == vec_bug[1]  # PTEDUCAT duplicated (dataloader.py:301)
    assert vec_fix[4] == np.float32(row["WholeBrain"])
    item = ds[0]
    assert item["tabular"].shape == (9,)


def test_fused_dataset_all_modalities(split):
    ds = MultiModalDataset(split["train"],
                           modalities=["pet1451", "t1w", "tabular"],
                           normalize_pet={"mean": 0.5, "std": 0.6},
                           normalize_mri={"per_scan_norm": "normalize"})
    if len(ds) == 0:
        pytest.skip("synthetic seed produced no fully-paired triples")
    item = ds[0]
    assert {"pet1451", "mri", "mri_mask", "tabular", "label"} <= set(item)


def test_device_preprocess_matches_host(split):
    import jax.numpy as jnp

    ds = MultiModalDataset(split["train"], modalities=["t1w"],
                           normalize_mri={"per_scan_norm": "normalize"})
    items = [ds[i] for i in range(min(3, len(ds)))]
    batch = {
        "mri": jnp.stack([i["mri"] for i in items]),
        "mri_mask": jnp.stack([i["mri_mask"] for i in items]),
        "label": jnp.stack([i["label"] for i in items]),
    }
    out = ds.get_device_preprocess()(batch)
    assert "mri_mask" not in out
    for k, item in enumerate(items):
        host = ds.host_normalized_item(k)
        np.testing.assert_allclose(np.asarray(out["mri"][k]), host["mri"],
                                   rtol=2e-3, atol=2e-4)


def test_volume_cache(tmp_path, split):
    ds_cold = MultiModalDataset(split["train"], modalities=["t1w"],
                                cache_dir=str(tmp_path / "vc"))
    item1 = ds_cold[0]
    # second dataset instance hits the cache (mmap path)
    ds_warm = MultiModalDataset(split["train"], modalities=["t1w"],
                                cache_dir=str(tmp_path / "vc"))
    item2 = ds_warm[0]
    np.testing.assert_array_equal(item1["mri"], item2["mri"])
    import os

    entries = os.listdir(tmp_path / "vc")
    assert any(e.endswith(".npy") for e in entries)


def test_volume_cache_f16(tmp_path, split):
    """Half-width cache: volumes travel as float16 (half the page-cache,
    collate and H2D bytes), the device preprocess upcasts before
    normalization, and normalized outputs stay within float16's ~5e-4
    relative error of the f32 path (ADNI ranges: PET ~N(0.5,0.5), MRI
    0-3000 — both fit comfortably)."""
    import jax.numpy as jnp

    kw = dict(modalities=["t1w"],
              normalize_mri={"per_scan_norm": "normalize"})
    ds32 = MultiModalDataset(split["train"], **kw)
    ds16 = MultiModalDataset(split["train"], cache_dir=str(tmp_path / "vc"),
                             cache_dtype="float16", **kw)
    item32, item16 = ds32[0], ds16[0]
    assert item16["mri"].dtype == np.float16
    assert item16["mri_mask"].dtype == np.float16
    np.testing.assert_allclose(item16["mri"].astype(np.float32),
                               item32["mri"], rtol=1e-3, atol=1e-3)
    # warm read serves the narrow mmap entry
    item_warm = MultiModalDataset(split["train"],
                                  cache_dir=str(tmp_path / "vc"),
                                  cache_dtype="float16", **kw)[0]
    assert item_warm["mri"].dtype == np.float16
    np.testing.assert_array_equal(item_warm["mri"], item16["mri"])

    # device preprocess upcasts, then normalized volumes track f32 closely
    def norm(ds, item):
        batch = {"mri": jnp.asarray(item["mri"])[None],
                 "mri_mask": jnp.asarray(item["mri_mask"])[None]}
        out = ds.get_device_preprocess()(batch)
        assert out["mri"].dtype == jnp.float32
        return np.asarray(out["mri"][0])

    n32, n16 = norm(ds32, item32), norm(ds16, item16)
    # per-scan z-scored values are O(1); 3e-3 absolute ~ f16 quantization
    # of inputs propagated through the affine normalization
    np.testing.assert_allclose(n16, n32, atol=3e-3)

    # f32 and f16 cache entries never collide (dtype is part of the key)
    ds_mixed = MultiModalDataset(split["train"],
                                 cache_dir=str(tmp_path / "vc"), **kw)
    assert ds_mixed[0]["mri"].dtype == np.float32


def test_loader_buffer_recycling_no_corruption():
    """Recycled host buffers must never corrupt already-yielded batches.

    The loader reuses batch buffers once their device transfer completes
    (pipeline.py collate_into/free_q); every yielded device batch must
    still equal a fresh collation of the same samples.
    """
    import numpy as np

    from multimodal_alzheimer_tpu.data.pipeline import DataLoader

    class _DS:
        def __len__(self):
            return 11  # ragged tail: 3 full batches of 3 + one of 2

        def __getitem__(self, i):
            rng = np.random.default_rng(100 + i)
            # (3, 5)-batched small f32 arrays are exactly the class the
            # CPU backend zero-copy-aliases in device_put (alignment
            # dependent) — the shape that exposed the recycling race.
            return {"x": rng.normal(size=(7, 5)).astype(np.float32),
                    "small": rng.normal(size=(5,)).astype(np.float32),
                    "label": np.int32(i)}

    ds = _DS()
    loader = DataLoader(ds, batch_size=3, shuffle=False, prefetch=1,
                        num_workers=2, device_put=True)
    seen = [{k: np.asarray(v).copy() for k, v in b.items()}
            for b in loader]
    assert len(seen) == 4
    order = list(range(11))
    for bi, batch in enumerate(seen):
        idx = order[bi * 3:bi * 3 + 3]
        np.testing.assert_array_equal(batch["label"], np.asarray(idx))
        for j, i in enumerate(idx):
            np.testing.assert_array_equal(batch["x"][j], ds[i]["x"])
            np.testing.assert_array_equal(batch["small"][j],
                                          ds[i]["small"])
    # many epochs re-exercise recycling under varying thread timing;
    # values must stay exact every time (the aliasing race corrupted
    # already-yielded batches only under load)
    for _ in range(5):
        seen2 = [{k: np.asarray(v).copy() for k, v in b.items()}
                 for b in loader]
        for a, b in zip(seen, seen2):
            np.testing.assert_array_equal(a["x"], b["x"])
            np.testing.assert_array_equal(a["small"], b["small"])


class _FailingDS:
    """__getitem__ raises mid-epoch, like a corrupt NIfTI decode
    (data/native_io.py raises IOError on truncated gzip streams)."""

    def __init__(self, fail_at=7, n=12):
        self.fail_at = fail_at
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i == self.fail_at:
            raise IOError(f"corrupt volume at index {i}")
        return {"x": np.full((4,), i, np.float32), "label": np.int32(i)}


@pytest.mark.parametrize("device_put", [True, False])
def test_loader_propagates_decode_errors(device_put):
    """torch-DataLoader parity: a worker decode failure must raise in the
    consuming process, never silently truncate the epoch (which would
    corrupt gradients/metrics with no signal)."""
    from multimodal_alzheimer_tpu.data.pipeline import DataLoader

    loader = DataLoader(_FailingDS(), batch_size=3, shuffle=False,
                        num_workers=2, device_put=device_put)
    with pytest.raises(IOError, match="corrupt volume"):
        for _ in loader:
            pass


def test_trainer_raises_on_loader_error():
    """Trainer.fit must surface a mid-epoch loader failure, not finish a
    short epoch."""
    from multimodal_alzheimer_tpu.data.pipeline import DataLoader
    from multimodal_alzheimer_tpu.losses import make_criterion
    from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import (
        TabularMLP,
    )
    from multimodal_alzheimer_tpu.train.loop import Trainer
    from multimodal_alzheimer_tpu.train.optim import single_lr_optimizer

    class _TabFailingDS(_FailingDS):
        def __getitem__(self, i):
            if i == self.fail_at:
                raise IOError(f"corrupt volume at index {i}")
            return {"tabular": np.full((9,), i, np.float32),
                    "label": np.int32(i % 2)}

    hparams = {"lr": 1e-3, "max_epochs": 1, "n_classes": 2,
               "loss_class_weights": None}
    model = TabularMLP.from_hparams({"n_classes": 2, "hidden": (8,)})
    trainer = Trainer(model, hparams, single_lr_optimizer(hparams["lr"]),
                      make_criterion(hparams), logger=None,
                      log_confusion_images=False)
    loader = DataLoader(_TabFailingDS(), batch_size=3, shuffle=False,
                        num_workers=2)
    state = trainer.init_state(next(iter(DataLoader(
        _TabFailingDS(fail_at=99), batch_size=3))))
    with pytest.raises(IOError, match="corrupt volume"):
        trainer.fit(state, loader, loader, max_epochs=1)


def test_loader_rejects_prefetch_zero():
    from multimodal_alzheimer_tpu.data.pipeline import DataLoader

    with pytest.raises(ValueError, match="prefetch"):
        DataLoader(_FailingDS(), batch_size=3, prefetch=0)
