"""AOT export: serialize -> reload -> identical outputs, no model code."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.inference.export import export_model, load_exported
from multimodal_alzheimer_tpu.models import SmallPETCNN, TabularMLP


def test_export_roundtrip_tabular():
    model = TabularMLP.from_hparams({"n_classes": 3, "hidden": (16, 32)})
    batch = {"tabular": jnp.zeros((4, 9))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    rng = np.random.default_rng(0)
    x = {"tabular": jnp.asarray(rng.normal(size=(4, 9)).astype(np.float32))}
    expected = model.apply(variables, x, train=False)["logits"]

    blob = export_model(model, variables, batch)
    assert isinstance(blob, bytes) and len(blob) > 0
    serve = load_exported(blob)
    out = serve(x)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(expected), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["probs"]).sum(axis=1), 1.0,
                               rtol=1e-5)


def test_export_with_preprocess():
    from multimodal_alzheimer_tpu.ops.normalization import normalize_pet

    model = SmallPETCNN.from_hparams({
        "n_classes": 2, "conv_out": (4,), "filter_size": (3,),
        "linear_out": 8})

    def preprocess(batch):
        out = dict(batch)
        out["pet1451"] = normalize_pet(out["pet1451"], 0.5145, 0.5383)
        return out

    batch = {"pet1451": jnp.zeros((2, 16, 16, 16))}
    variables = model.init(jax.random.PRNGKey(0), preprocess(batch),
                           train=False)
    blob = export_model(model, variables, batch, preprocess)
    serve = load_exported(blob)
    rng = np.random.default_rng(1)
    x = {"pet1451": jnp.asarray(
        rng.normal(size=(2, 16, 16, 16)).astype(np.float32))}
    out = serve(x)
    expected = model.apply(variables, preprocess(x), train=False)["logits"]
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(expected), rtol=1e-5)


def test_export_with_memoized_minmax_preprocess():
    """Artifact round-trip for the steady-state serving path: memoized
    per-scan quantile bounds consumed inside the exported preprocess
    (the combination tools/bench_serving.py measures on the real chip).
    """
    from multimodal_alzheimer_tpu.models import AnatCNN
    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
    )
    from multimodal_alzheimer_tpu.ops.quantile import (
        host_masked_nonzero_quantile,
    )

    model = AnatCNN.from_hparams(
        {"n_classes": 3, "resnet_depth": 10, "linear_out": (),
         "batchnorm_begin": False, "lr": 1e-3})

    def preprocess(batch):
        out = dict(batch)
        out["mri"] = batched_normalize_mri(
            out["mri"], out.pop("mri_mask"),
            {"per_scan_norm": "min_max"}, 0.98,
            qminmax=out.pop("mri_qminmax"))
        return out

    rng = np.random.default_rng(2)
    vol = rng.normal(900, 400, (2, 12, 14, 12)).astype(np.float32)
    mask = (rng.random(vol.shape) > 0.3).astype(np.float32)
    memo = np.stack([host_masked_nonzero_quantile(
        vol[i], mask[i], (0.02, 0.98)) for i in range(2)])
    x = {"mri": jnp.asarray(vol), "mri_mask": jnp.asarray(mask),
         "mri_qminmax": jnp.asarray(memo)}

    variables = model.init(jax.random.PRNGKey(0), preprocess(x), train=False)
    expected = model.apply(variables, preprocess(x), train=False)["logits"]

    serve = load_exported(export_model(model, variables, x, preprocess))
    out = serve(x)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(expected), rtol=1e-5, atol=1e-5)
