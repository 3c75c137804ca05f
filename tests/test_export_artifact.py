"""Deployment CLI (tools/export_artifact.py): checkpoint -> StableHLO
artifact across model families and modes, reload-parity-checked by the
tool itself (it exits nonzero on drift)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import export_artifact  # noqa: E402

from multimodal_alzheimer_tpu.train.checkpoint import (  # noqa: E402
    load_checkpoint,
    save_checkpoint,
)


def _anat_ckpt(tmp_path, shape=(12, 14, 12)):
    from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN

    hparams = {"n_classes": 3, "resnet_depth": 10, "linear_out": [],
               "lr": 1e-3, "norm_percentile": 0.99}
    model = AnatCNN.from_hparams(hparams)
    rng = np.random.default_rng(0)
    batch = {"mri": jnp.asarray(
        rng.normal(900, 400, (2,) + shape).astype(np.float32))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    path = tmp_path / "mri_ckpt"
    save_checkpoint(path, variables, hparams)
    return str(path)


def _pet_ckpt(tmp_path):
    from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import (
        SmallPETCNN,
    )

    hparams = {"n_classes": 3, "conv_out": [4, 8], "filter_size": [5, 3],
               "linear_out": 8, "lr": 1e-3,
               "norm_mean": 0.5145, "norm_std": 0.5383}
    model = SmallPETCNN.from_hparams(hparams)
    rng = np.random.default_rng(1)
    batch = {"pet1451": jnp.asarray(
        rng.normal(0.5, 0.5, (2, 17, 18, 16)).astype(np.float32))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    path = tmp_path / "pet_ckpt"
    save_checkpoint(path, variables, hparams)
    return str(path)


@pytest.mark.parametrize("mode", ["float", "folded", "int8"])
def test_export_anat_cnn_modes(tmp_path, mode):
    ckpt = _anat_ckpt(tmp_path)
    out = tmp_path / f"mri_{mode}.shlo"
    export_artifact.main([
        ckpt, "--model", "anat_cnn", "--mode", mode, "--out", str(out),
        "--batch", "2", "--volume-shape", "12", "14", "12",
        "--synthetic-calib"])
    assert out.exists() and out.stat().st_size > 1000

    # The artifact stands alone: reload and serve a raw (unnormalized)
    # batch without touching the checkpoint or model class.
    from multimodal_alzheimer_tpu.inference.export import load_exported

    serve = load_exported(out.read_bytes())
    rng = np.random.default_rng(3)
    batch = {
        "mri": jnp.asarray(rng.normal(900, 400, (2, 12, 14, 12))
                           .astype(np.float32)),
        "mri_mask": jnp.asarray((rng.random((2, 12, 14, 12)) > 0.35)
                                .astype(np.float32)),
    }
    got = serve(batch)
    assert got["logits"].shape == (2, 3)
    np.testing.assert_allclose(np.asarray(got["probs"]).sum(-1), 1.0,
                               rtol=1e-5)


def test_export_pet_cnn_int8_and_float(tmp_path):
    ckpt = _pet_ckpt(tmp_path)
    for mode in ("float", "int8"):
        out = tmp_path / f"pet_{mode}.shlo"
        export_artifact.main([
            ckpt, "--model", "pet_cnn", "--mode", mode, "--out", str(out),
            "--batch", "2", "--volume-shape", "17", "18", "16",
            "--synthetic-calib"])
        assert out.exists()
    # int8 without a calibration set refuses loudly: absmax scales from
    # synthetic activations silently degrade production accuracy.
    with pytest.raises(SystemExit, match="calib"):
        export_artifact.main([
            ckpt, "--model", "pet_cnn", "--mode", "int8",
            "--out", str(tmp_path / "y.shlo"),
            "--batch", "2", "--volume-shape", "17", "18", "16"])
    # folded is meaningless for the BN-free PET tower — clear error.
    with pytest.raises(SystemExit, match="folded"):
        export_artifact.main([
            ckpt, "--model", "pet_cnn", "--mode", "folded",
            "--out", str(tmp_path / "x.shlo"),
            "--batch", "2", "--volume-shape", "17", "18", "16"])


def test_export_stage2_fusion_folded_and_int8(tmp_path):
    """anat_pet_fusion: the loader resolves the stage-1 sub-checkpoints
    via embedded paths; folded and int8 modes route the MRI tower
    through fold_mri_fusion / quantize_mri_fusion."""
    from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion import (  # noqa: E501
        AnatPETFusion,
    )

    pet_ckpt, mri_ckpt = _pet_ckpt(tmp_path), _anat_ckpt(tmp_path)
    _, pet_hp, _ = load_checkpoint(pet_ckpt)
    _, mri_hp, _ = load_checkpoint(mri_ckpt)
    hparams = {"n_classes": 3, "lr": 1e-3, "lr_pretrained": None,
               "path_pet": pet_ckpt, "path_mri": mri_ckpt}
    fusion = AnatPETFusion.from_hparams(hparams, pet_hp, mri_hp)
    rng = np.random.default_rng(7)
    batch = {
        "pet1451": jnp.asarray(rng.normal(0.5, 0.5, (2, 12, 14, 12))
                               .astype(np.float32)),
        "mri": jnp.asarray(rng.normal(900, 400, (2, 12, 14, 12))
                           .astype(np.float32)),
    }
    variables = fusion.init(jax.random.PRNGKey(0), batch, train=False)
    path = tmp_path / "ap_ckpt"
    save_checkpoint(path, variables, hparams)

    for mode in ("folded", "int8"):
        out = tmp_path / f"ap_{mode}.shlo"
        export_artifact.main([
            str(path), "--model", "anat_pet_fusion", "--mode", mode,
            "--out", str(out), "--batch", "2",
            "--volume-shape", "12", "14", "12", "--synthetic-calib"])
        assert out.exists()


def test_export_tabular_and_early_fusion(tmp_path):
    from multimodal_alzheimer_tpu.models.fusion_models.early_fusion import (
        PETMRIEarlyFusion,
    )
    from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import (
        TabularMLP,
    )

    rng = np.random.default_rng(11)
    tab_hp = {"n_classes": 3, "hidden": [16, 32], "lr": 1e-3}
    tab = TabularMLP.from_hparams(tab_hp)
    tb = {"tabular": jnp.asarray(rng.normal(size=(2, 9))
                                 .astype(np.float32))}
    tv = tab.init(jax.random.PRNGKey(0), tb, train=False)
    tpath = tmp_path / "tab_ckpt"
    save_checkpoint(tpath, tv, tab_hp)
    out = tmp_path / "tab.shlo"
    export_artifact.main([str(tpath), "--model", "tabular",
                          "--mode", "float", "--out", str(out),
                          "--batch", "2"])
    assert out.exists()
    # int8 has no path for the MLP — clear error, not silence.
    with pytest.raises(SystemExit, match="int8"):
        export_artifact.main([str(tpath), "--model", "tabular",
                              "--mode", "int8",
                              "--out", str(tmp_path / "x.shlo"),
                              "--batch", "2"])

    ef_hp = {"n_classes": 2, "conv_out": [4, 8], "filter_size": [5, 3],
             "linear_out": 8, "lr": 1e-3, "norm_mean": 0.51,
             "norm_std": 0.54}
    ef = PETMRIEarlyFusion.from_hparams(ef_hp)
    eb = {
        "pet1451": jnp.asarray(rng.normal(0.5, 0.5, (2, 17, 18, 16))
                               .astype(np.float32)),
        "mri": jnp.asarray(rng.normal(900, 400, (2, 17, 18, 16))
                           .astype(np.float32)),
    }
    ev = ef.init(jax.random.PRNGKey(0), eb, train=False)
    epath = tmp_path / "ef_ckpt"
    save_checkpoint(epath, ev, ef_hp)
    out2 = tmp_path / "ef.shlo"
    export_artifact.main([str(epath), "--model", "early_fusion",
                          "--mode", "float", "--out", str(out2),
                          "--batch", "2",
                          "--volume-shape", "17", "18", "16"])
    assert out2.exists()


def test_export_uses_checkpoint_quantile(tmp_path):
    """The fused preprocessing must come from the checkpoint's hparams
    (norm_percentile), not a hardcoded default."""
    ckpt = _anat_ckpt(tmp_path)
    # rewrite the quantile in the saved hparams
    variables, hparams, _ = load_checkpoint(ckpt)
    hparams["norm_percentile"] = 0.9
    save_checkpoint(ckpt, variables, hparams)

    out = tmp_path / "q90.shlo"
    export_artifact.main([
        ckpt, "--model", "anat_cnn", "--mode", "float", "--out", str(out),
        "--batch", "2", "--volume-shape", "12", "14", "12"])

    from multimodal_alzheimer_tpu.inference.export import load_exported
    from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN
    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
    )

    rng = np.random.default_rng(5)
    raw = {
        "mri": jnp.asarray(rng.normal(900, 400, (2, 12, 14, 12))
                           .astype(np.float32)),
        "mri_mask": jnp.asarray((rng.random((2, 12, 14, 12)) > 0.35)
                                .astype(np.float32)),
    }
    got = load_exported(out.read_bytes())(raw)

    model = AnatCNN.from_hparams(hparams)
    pre = dict(raw)
    pre["mri"] = batched_normalize_mri(pre["mri"], pre.pop("mri_mask"),
                                       {"per_scan_norm": "min_max"}, 0.9)
    ref = model.apply(variables, pre, train=False)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=2e-4, atol=2e-5)
