"""int8 PTQ serving path (inference/quantize.py).

Three layers of evidence:
  1. BN folding is exact: the folded-f32 backbone forward reproduces the
     float model's eval feature map (algebraic identity, fp tolerance).
  2. The int8 building blocks are bit-exact integer arithmetic: conv vs
     a numpy int32 oracle; int8 maxpool commutes with requantization.
  3. End-to-end drift is bounded: calibrated int8 logits agree with the
     float model on argmax and stay within a small relative error.

Reference: no counterpart (the reference serves fp32 checkpoints);
the output contract mirrors inference/predictor.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.inference import quantize as Q
from multimodal_alzheimer_tpu.models import AnatCNN


def _model_and_batch(depth=10, dilated=True, seed=0, spatial=(20, 24, 20)):
    model = AnatCNN.from_hparams(
        {"n_classes": 3, "resnet_depth": depth, "linear_out": (),
         "lr": 1e-3}, dilated=dilated)
    rng = np.random.default_rng(seed)
    batch = {"mri": jnp.asarray(
        rng.normal(0, 1, (2,) + spatial).astype(np.float32))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    # Non-trivial running stats so BN folding is actually exercised
    # (init leaves mean=0, var=1, where folding is trivially right).
    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jnp.abs(
            jax.random.normal(jax.random.PRNGKey(1), a.shape)),
        variables["batch_stats"])
    return model, variables, batch


@pytest.mark.parametrize("dilated", [True, False])
def test_folded_forward_matches_float(dilated):
    model, variables, batch = _model_and_batch(dilated=dilated)
    folded = Q.fold_backbone(variables, 10)
    fmap = Q.folded_backbone_apply(folded, batch["mri"][..., None],
                                   depth=10, dilated=dilated)

    from multimodal_alzheimer_tpu.models.resnet3d import MedicalNetResNet3D
    backbone = MedicalNetResNet3D(depth=10, dilated=dilated)
    bvars = {"params": variables["params"]["backbone"],
             "batch_stats": variables["batch_stats"]["backbone"]}
    ref = backbone.apply(bvars, batch["mri"][..., None], train=False)
    np.testing.assert_allclose(np.asarray(fmap), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_int8_conv_matches_numpy_oracle():
    rng = np.random.default_rng(3)
    x = rng.integers(-127, 128, (2, 6, 7, 6, 8)).astype(np.int8)
    w = rng.integers(-127, 128, (3, 3, 3, 8, 16)).astype(np.int8)
    entry = {"wq": jnp.asarray(w), "scale": jnp.ones((16,), jnp.float32),
             "bias": jnp.zeros((16,), jnp.float32)}
    out = Q._conv_int8(entry, jnp.asarray(x), 1, 1)

    xn = x.astype(np.int32)
    xp = np.pad(xn, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros(out.shape, np.int32)
    for d in range(3):
        for h in range(3):
            for ww in range(3):
                patch = xp[:, d:d + 6, h:h + 7, ww:ww + 6, :]
                ref += np.einsum("bdhwc,co->bdhwo", patch,
                                 w[d, h, ww].astype(np.int32))
    np.testing.assert_array_equal(np.asarray(out).astype(np.int32), ref)


def test_int8_maxpool_commutes_with_requant():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 2, (2, 9, 10, 9, 8)).astype(np.float32))
    s = 0.037
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    pooled_q = Q._max_pool_int8(q)
    pooled_f = Q._max_pool_f32(x)
    q_of_pool = jnp.clip(jnp.round(pooled_f / s), -127, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(pooled_q),
                                  np.asarray(q_of_pool))


@pytest.mark.parametrize("dilated", [True, False])
def test_int8_e2e_drift_bounded(dilated):
    model, variables, batch = _model_and_batch(dilated=dilated)
    serve, qtree = Q.quantize_anat_cnn(model, variables, [batch])
    err = Q.quantization_error(model, variables, serve, batch)
    # Random-weight nets are the hard case for PTQ (no trained structure
    # to absorb rounding), and the trailing-ReLU quirk clamps most random
    # logits to ~0, which inflates *relative* logit error — the
    # probability drift is the meaningful bound (observed ~1e-4 here;
    # 1.4% logits on the real 91^3 flagship, tools/bench_serving.py).
    assert err["argmax_agree"] == 1.0, err
    assert err["logit_max_rel_err"] < 0.2, err
    assert err["prob_max_abs_err"] < 0.01, err


def test_serve_contract_and_embedding_tap():
    model, variables, batch = _model_and_batch()
    serve, _ = Q.quantize_anat_cnn(model, variables, [batch])
    out = serve(batch)
    assert set(out) == {"logits", "probs", "embeddings"}
    assert out["logits"].shape == (2, 3)
    assert "backbone_gap" in out["embeddings"]
    assert out["embeddings"]["backbone_gap"].shape == (2, 512)
    np.testing.assert_allclose(
        np.asarray(out["probs"].sum(-1)), 1.0, rtol=1e-5)


def test_folded_float_serve():
    """fold_anat_cnn: the BN-folded float serving path. In f32 it equals
    the float model (folding is exact algebra); the production bf16
    variant keeps argmax and the Predictor output contract."""
    model, variables, batch = _model_and_batch(seed=3)

    serve32, _ = Q.fold_anat_cnn(model, variables, dtype=jnp.float32)
    ref = model.apply(variables, batch, train=False)
    out32 = serve32(batch)
    np.testing.assert_allclose(np.asarray(out32["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=2e-4, atol=2e-5)

    serve16, _ = Q.fold_anat_cnn(model, variables)  # bf16 default
    out16 = serve16(batch)
    assert set(out16) == {"logits", "probs", "embeddings"}
    assert out16["logits"].dtype == jnp.float32
    assert "backbone_gap" in out16["embeddings"]
    err = Q.quantization_error(model, variables, serve16, batch)
    assert err["argmax_agree"] == 1.0, err
    assert err["prob_max_abs_err"] < 0.05, err


def test_int8_pet_resnet_family():
    """PETResNetCNN (the PET Med3D classifier) quantizes through the
    same path — it shares AnatCNN's structure with a different input
    key (pet_resnet_cnn.py)."""
    from multimodal_alzheimer_tpu.models.pet_models.pet_resnet_cnn import (
        PETResNetCNN,
    )

    model = PETResNetCNN.from_hparams(
        {"n_classes": 3, "resnet_depth": 10, "linear_out": (),
         "lr": 1e-3})
    rng = np.random.default_rng(6)
    batch = {"pet1451": jnp.asarray(
        rng.normal(0.5, 0.5, (2, 20, 24, 20)).astype(np.float32))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    serve, _ = Q.quantize_anat_cnn(model, variables, [batch])
    err = Q.quantization_error(model, variables, serve, batch)
    assert err["argmax_agree"] == 1.0, err
    assert err["prob_max_abs_err"] < 0.01, err


def test_int8_stem_layout_override():
    """stem_s2d=False forces the plain stride-2 stem (a measured serving
    knob, BASELINE.md) — logits must agree with the default s2d layout
    (both are exact formulations of the same conv); forcing s2d on a
    multi-channel input must raise."""
    model, variables, batch = _model_and_batch(seed=2)
    serve_s2d, qt_s2d = Q.quantize_anat_cnn(model, variables, [batch])
    serve_plain, qt_plain = Q.quantize_anat_cnn(model, variables, [batch],
                                                stem_s2d=False)
    assert qt_s2d["config"]["stem_s2d"] and not qt_plain["config"]["stem_s2d"]
    a = np.asarray(serve_s2d(batch)["logits"])
    b = np.asarray(serve_plain(batch)["logits"])
    # Same int8 weights/scales; conv layouts differ only in summation
    # grouping of the f32 epilogue, so drift is fp-noise level.
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)

    rng = np.random.default_rng(8)
    batch2 = {"mri": jnp.asarray(
        rng.normal(0, 1, (2, 20, 24, 20, 2)).astype(np.float32))}
    variables2 = model.init(jax.random.PRNGKey(0), batch2, train=False)
    with pytest.raises(ValueError, match="single input channel"):
        Q.quantize_anat_cnn(model, variables2, [batch2], stem_s2d=True)


def test_int8_multichannel_stem_falls_back():
    """A backbone initialized on a multi-channel volume (e.g. the early-
    fusion PET+MRI concat) stores plain 7^3 conv1 params — the model's
    own forward skips the s2d stem (resnet3d.py), and the quantizer must
    derive the same decision from the calibration input, not from the
    stem_s2d attribute (which stays True)."""
    model = AnatCNN.from_hparams(
        {"n_classes": 3, "resnet_depth": 10, "linear_out": (),
         "lr": 1e-3})
    assert model.stem_s2d
    rng = np.random.default_rng(5)
    batch = {"mri": jnp.asarray(
        rng.normal(0, 1, (2, 20, 24, 20, 2)).astype(np.float32))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    serve, qtree = Q.quantize_anat_cnn(model, variables, [batch])
    assert not qtree["config"]["stem_s2d"]
    err = Q.quantization_error(model, variables, serve, batch)
    assert err["argmax_agree"] == 1.0, err
    assert err["prob_max_abs_err"] < 0.01, err


def test_int8_bottleneck_depth50():
    """Depth-50 (Bottleneck x4 expansion, 2048-wide features) through
    the same fold/calibrate/quantize path."""
    model, variables, batch = _model_and_batch(depth=50,
                                               spatial=(16, 16, 16))
    serve, _ = Q.quantize_anat_cnn(model, variables, [batch])
    err = Q.quantization_error(model, variables, serve, batch)
    assert err["argmax_agree"] == 1.0, err
    assert err["prob_max_abs_err"] < 0.01, err
    out = serve(batch)
    assert out["embeddings"]["backbone_gap"].shape == (2, 2048)


def _fusion_and_batch():
    from multimodal_alzheimer_tpu.models.fusion_models.all_modalities_fusion import (  # noqa: E501
        AllModalitiesFusion,
    )
    from multimodal_alzheimer_tpu.train.checkpoint import (
        sync_tower_duplicates,
    )

    pet_hp = {"n_classes": 3, "conv_out": (4,), "filter_size": (3,),
              "linear_out": 8}
    mri_hp = {"n_classes": 3, "resnet_depth": 10}
    tab_hp = {"n_classes": 3, "hidden": (16, 32)}
    hp2 = {"n_classes": 3}  # no lr_pretrained -> frozen towers
    fusion = AllModalitiesFusion.from_hparams(
        {"n_classes": 3, "lr": 1e-3, "lr_pretrained": None},
        hp2, hp2, hp2, pet_hp, mri_hp, tab_hp)
    assert fusion.share_towers
    rng = np.random.default_rng(7)
    s = 16
    batch = {
        "pet1451": jnp.asarray(rng.normal(size=(2, s, s, s))
                               .astype(np.float32)),
        "mri": jnp.asarray(rng.normal(size=(2, s, s, s))
                           .astype(np.float32)),
        "tabular": jnp.asarray(rng.normal(size=(2, 9)).astype(np.float32)),
    }
    variables = sync_tower_duplicates(
        fusion.init(jax.random.PRNGKey(0), batch, train=False))
    return fusion, variables, batch


def test_int8_fusion_serve_drift_bounded():
    fusion, variables, batch = _fusion_and_batch()
    serve, _ = Q.quantize_all_modalities_fusion(fusion, variables, [batch])
    err = Q.quantization_error(fusion, variables, serve, batch)
    assert err["argmax_agree"] == 1.0, err
    assert err["prob_max_abs_err"] < 0.01, err
    out = serve(batch)
    assert set(out) == {"logits", "probs", "embeddings"}
    assert out["logits"].shape == (2, 3)
    assert "fusion" in out["embeddings"]


def test_int8_serve_exports_to_stablehlo():
    """The int8 graph must survive the AOT export round-trip (the
    deployment artifact path, inference/export.py) bit-identically."""
    import jax.numpy as jnp_
    from jax import export as jax_export

    model, variables, batch = _model_and_batch()
    serve, _ = Q.quantize_anat_cnn(model, variables, [batch])
    exported = jax_export.export(jax.jit(serve))(batch)
    blob = bytes(exported.serialize())
    reloaded = jax_export.deserialize(blob)
    out_live = serve(batch)
    out_art = reloaded.call(batch)
    # The artifact recompiles through a different pipeline; the integer
    # convs are bit-exact but the f32 epilogue/head may re-associate.
    np.testing.assert_allclose(np.asarray(out_live["logits"]),
                               np.asarray(out_art["logits"]),
                               rtol=1e-6, atol=1e-6)
    assert out_art["logits"].dtype == jnp_.float32


def test_int8_predictor_padding_and_mesh():
    """The int8 serve core plugs into Predictor (padding of ragged
    tails, DP mesh sharding) and matches the bare serve fn."""
    from multimodal_alzheimer_tpu.inference.predictor import Predictor
    from multimodal_alzheimer_tpu.parallel import make_mesh

    model, variables, batch = _model_and_batch()
    serve, _ = Q.quantize_anat_cnn(model, variables, [batch])
    ref = np.asarray(serve(batch)["logits"])

    # ragged tail: 1 sample padded to the fixed batch of 2
    pred = Predictor(model, variables, batch_size=2, serve_fn=serve)
    out = pred.predict_batch({"mri": np.asarray(batch["mri"])[:1]})
    assert out["logits"].shape == (1, 3)
    np.testing.assert_allclose(out["logits"], ref[:1], rtol=1e-5,
                               atol=1e-6)

    # 8-device data-parallel mesh: identical results
    rng = np.random.default_rng(11)
    batch8 = {"mri": rng.normal(0, 1, (8, 20, 24, 20))
              .astype(np.float32)}
    ref8 = np.asarray(serve({"mri": jnp.asarray(batch8["mri"])})["logits"])
    pred8 = Predictor(model, variables, batch_size=8, serve_fn=serve,
                      mesh=make_mesh(8))
    out8 = pred8.predict_batch(batch8)
    np.testing.assert_allclose(out8["logits"], ref8, rtol=1e-5, atol=1e-6)


def test_int8_stage2_fusion_serves():
    """Stage-2 fusions (PET+MRI, MRI+tabular) serve with the int8 MRI
    tower through their towers hook — argmax-identical logits."""
    from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion import (  # noqa: E501
        AnatPETFusion,
    )
    from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion import (  # noqa: E501
        TabularMRIFusion,
    )

    pet_hp = {"n_classes": 3, "conv_out": (4,), "filter_size": (3,),
              "linear_out": 8}
    mri_hp = {"n_classes": 3, "resnet_depth": 10}
    tab_hp = {"n_classes": 3, "hidden": (16, 32)}
    hp2 = {"n_classes": 3, "lr": 1e-3, "lr_pretrained": None}
    rng = np.random.default_rng(9)
    s = 16
    batch = {
        "pet1451": jnp.asarray(rng.normal(size=(2, s, s, s))
                               .astype(np.float32)),
        "mri": jnp.asarray(rng.normal(size=(2, s, s, s))
                           .astype(np.float32)),
        "tabular": jnp.asarray(rng.normal(size=(2, 9)).astype(np.float32)),
    }
    models = [
        AnatPETFusion.from_hparams(hp2, pet_hp, mri_hp),
        TabularMRIFusion.from_hparams(hp2, mri_hp, tab_hp),
    ]
    for fusion in models:
        variables = fusion.init(jax.random.PRNGKey(0), batch, train=False)
        serve, _ = Q.quantize_mri_fusion(fusion, variables, [batch])
        err = Q.quantization_error(fusion, variables, serve, batch)
        assert err["argmax_agree"] == 1.0, (type(fusion).__name__, err)
        assert err["prob_max_abs_err"] < 0.01, (type(fusion).__name__, err)


def test_folded_fusion_serves():
    """BN-folded MRI tower through the fusion towers hook: in f32 the
    stage-3 and stage-2 serves equal the float models (exact algebra);
    bf16 keeps argmax."""
    fusion, variables, batch = _fusion_and_batch()
    serve32, _ = Q.fold_all_modalities_fusion(fusion, variables,
                                              dtype=jnp.float32)
    err = Q.quantization_error(fusion, variables, serve32, batch)
    assert err["argmax_agree"] == 1.0, err
    assert err["prob_max_abs_err"] < 1e-3, err

    serve16, _ = Q.fold_all_modalities_fusion(fusion, variables)
    err16 = Q.quantization_error(fusion, variables, serve16, batch)
    assert err16["argmax_agree"] == 1.0, err16

    from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion import (  # noqa: E501
        TabularMRIFusion,
    )

    mri_hp = {"n_classes": 3, "resnet_depth": 10}
    tab_hp = {"n_classes": 3, "hidden": (16, 32)}
    hp2 = {"n_classes": 3, "lr": 1e-3, "lr_pretrained": None}
    rng = np.random.default_rng(13)
    batch2 = {
        "mri": jnp.asarray(rng.normal(size=(2, 16, 16, 16))
                           .astype(np.float32)),
        "tabular": jnp.asarray(rng.normal(size=(2, 9)).astype(np.float32)),
    }
    f2 = TabularMRIFusion.from_hparams(hp2, mri_hp, tab_hp)
    v2 = f2.init(jax.random.PRNGKey(0), batch2, train=False)
    serve2, _ = Q.fold_mri_fusion(f2, v2, dtype=jnp.float32)
    err2 = Q.quantization_error(f2, v2, serve2, batch2)
    assert err2["argmax_agree"] == 1.0, err2
    assert err2["prob_max_abs_err"] < 1e-3, err2


def _pet_model_and_batch(hparams=None, seed=20, spatial=(17, 18, 16),
                         init_seed=0):
    from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import (
        SmallPETCNN,
    )

    hp = {"n_classes": 3, "conv_out": (4, 16, 32),
          "filter_size": (5, 3, 3), "linear_out": 8}
    hp.update(hparams or {})
    model = SmallPETCNN.from_hparams(hp)
    rng = np.random.default_rng(seed)
    batch = {"pet1451": jnp.asarray(
        rng.normal(0.5, 0.5, (2,) + spatial).astype(np.float32))}
    variables = model.init(jax.random.PRNGKey(init_seed), batch,
                           train=False)
    return model, variables, batch


def test_pet_calib_graph_matches_float():
    """The calibration (folded f32) PET tower graph — parity-decomposed
    fused blocks included — reproduces the float model's eval logits
    (same algebra as tests/test_s2d_pool.py, here through the quantizer's
    own traversal). Covers fused (cin 1, 4) AND naive (cin 16) blocks
    plus the odd-extent padding path."""
    model, variables, batch = _pet_model_and_batch()
    specs = Q._pet_block_specs(model, variables)
    assert [sp["fused"] for sp in specs] == [True, True, False]
    tree = Q._pet_calib_tree(Q.fold_pet_tower(model, variables, specs),
                             specs)
    ctx = Q._CalibCtx()
    fmap = Q._pet_tower_forward(tree, batch["pet1451"][..., None], ctx,
                                specs)
    p = variables["params"]
    h = jnp.mean(fmap, axis=(1, 2, 3))
    h = jax.nn.relu(h @ p["hidden"]["kernel"] + p["hidden"]["bias"])
    logits = h @ p["cls"]["kernel"] + p["cls"]["bias"]
    ref = model.apply(variables, batch, train=False)["logits"]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_pet_calib_graph_matches_float_bn():
    """BN blocks through the FUSED calib graph: eval-mode BN folds into
    conv kernel+bias before the parity decomposition, so the folded f32
    graph must reproduce the float model's eval logits exactly (not just
    within int8 drift bounds)."""
    model, variables, batch = _pet_model_and_batch(
        {"conv_out": (4, 8), "filter_size": (5, 3), "batchnorm": True,
         "linear_out": 8})
    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jnp.abs(
            jax.random.normal(jax.random.PRNGKey(2), a.shape)),
        variables["batch_stats"])
    specs = Q._pet_block_specs(model, variables)
    assert all(sp["fused"] for sp in specs)
    tree = Q._pet_calib_tree(Q.fold_pet_tower(model, variables, specs),
                             specs)
    fmap = Q._pet_tower_forward(tree, batch["pet1451"][..., None],
                                Q._CalibCtx(), specs)
    p = variables["params"]
    h = jnp.mean(fmap, axis=(1, 2, 3))
    h = jax.nn.relu(h @ p["hidden"]["kernel"] + p["hidden"]["bias"])
    logits = h @ p["cls"]["kernel"] + p["cls"]["bias"]
    ref = model.apply(variables, batch, train=False)["logits"]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_int8_pet_cnn_drift_bounded():
    model, variables, batch = _pet_model_and_batch()
    serve, qtree = Q.quantize_pet_cnn(model, variables, [batch])
    err = Q.quantization_error(model, variables, serve, batch)
    assert err["argmax_agree"] == 1.0, err
    assert err["prob_max_abs_err"] < 0.01, err
    out = serve(batch)
    assert set(out) == {"logits", "probs", "embeddings"}
    assert set(out["embeddings"]) == {"gap", "dense"}
    assert out["embeddings"]["gap"].shape == (2, 32)
    assert out["embeddings"]["dense"].shape == (2, 8)


def test_int8_pet_cnn_bn_folds():
    """batchnorm=True PET towers: BN folds into the conv kernel+bias
    first, so small-C_in blocks still take the FUSED parity-decomposed
    path (BN towers previously fell back to the naive conv XLA emits
    ~8-20x above roofline) — drift stays bounded through it."""
    model, variables, batch = _pet_model_and_batch(
        {"conv_out": (4, 8), "filter_size": (5, 3), "batchnorm": True})
    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jnp.abs(
            jax.random.normal(jax.random.PRNGKey(1), a.shape)),
        variables["batch_stats"])
    specs = Q._pet_block_specs(model, variables)
    assert all(sp["fused"] for sp in specs)  # cin 1 and 4, odd kernels
    serve, _ = Q.quantize_pet_cnn(model, variables, [batch])
    err = Q.quantization_error(model, variables, serve, batch)
    assert err["argmax_agree"] == 1.0, err
    assert err["prob_max_abs_err"] < 0.01, err


def test_int8_pet_cnn_no_hidden_linear():
    """linear_out=0 (the 2-class GAP-cut family): head is a single
    Dense, embeddings carry only 'gap'."""
    model, variables, batch = _pet_model_and_batch(
        {"n_classes": 2, "linear_out": 0})
    serve, _ = Q.quantize_pet_cnn(model, variables, [batch])
    out = serve(batch)
    assert set(out["embeddings"]) == {"gap"}
    err = Q.quantization_error(model, variables, serve, batch)
    assert err["argmax_agree"] == 1.0, err
    assert err["prob_max_abs_err"] < 0.01, err


def test_int8_fusion_serve_both_towers():
    """quantize_pet=True swaps the shared PET tower for its int8 serve
    alongside the MRI one — stage-3 and stage-2 drift stays bounded; a
    PET-less fusion rejects the flag."""
    fusion, variables, batch = _fusion_and_batch()
    serve, qtree = Q.quantize_all_modalities_fusion(
        fusion, variables, [batch], quantize_pet=True)
    assert set(qtree) == {"mri", "pet"}
    err = Q.quantization_error(fusion, variables, serve, batch)
    assert err["argmax_agree"] == 1.0, err
    assert err["prob_max_abs_err"] < 0.01, err

    from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion import (  # noqa: E501
        AnatPETFusion,
    )
    from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion import (  # noqa: E501
        TabularMRIFusion,
    )

    pet_hp = {"n_classes": 3, "conv_out": (4,), "filter_size": (3,),
              "linear_out": 8}
    mri_hp = {"n_classes": 3, "resnet_depth": 10}
    hp2 = {"n_classes": 3, "lr": 1e-3, "lr_pretrained": None}
    rng = np.random.default_rng(17)
    s = 16
    batch2 = {
        "pet1451": jnp.asarray(rng.normal(size=(2, s, s, s))
                               .astype(np.float32)),
        "mri": jnp.asarray(rng.normal(size=(2, s, s, s))
                           .astype(np.float32)),
    }
    f2 = AnatPETFusion.from_hparams(hp2, pet_hp, mri_hp)
    v2 = f2.init(jax.random.PRNGKey(0), batch2, train=False)
    serve2, _ = Q.quantize_mri_fusion(f2, v2, [batch2], quantize_pet=True)
    err2 = Q.quantization_error(f2, v2, serve2, batch2)
    assert err2["argmax_agree"] == 1.0, err2
    assert err2["prob_max_abs_err"] < 0.01, err2

    tab_hp = {"n_classes": 3, "hidden": (16, 32)}
    batch3 = {"mri": batch2["mri"],
              "tabular": jnp.asarray(rng.normal(size=(2, 9))
                                     .astype(np.float32))}
    f3 = TabularMRIFusion.from_hparams(hp2, mri_hp, tab_hp)
    v3 = f3.init(jax.random.PRNGKey(0), batch3, train=False)
    with pytest.raises(ValueError, match="pet_model"):
        Q.quantize_mri_fusion(f3, v3, [batch3], quantize_pet=True)


def test_int8_fusion_serve_exports():
    """The full 3-stage int8 deployment (quantized MRI+PET towers fed
    through the external-towers hook) exports to a StableHLO artifact
    and reloads bit-faithfully — the production serving artifact."""
    from multimodal_alzheimer_tpu.inference.export import (
        export_serve_fn,
        load_exported,
    )

    fusion, variables, batch = _fusion_and_batch()
    serve, _ = Q.quantize_all_modalities_fusion(
        fusion, variables, [batch], quantize_pet=True)
    blob = export_serve_fn(serve, batch)
    reloaded = load_exported(blob)
    live = serve(batch)
    art = reloaded(batch)
    np.testing.assert_allclose(np.asarray(art["logits"]),
                               np.asarray(live["logits"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(art["probs"]),
                               np.asarray(live["probs"]),
                               rtol=1e-6, atol=1e-6)


def test_external_towers_require_share():
    fusion, variables, batch = _fusion_and_batch()
    unshared = fusion.clone(share_towers=False)
    mri_out = {"logits": jnp.zeros((2, 3)),
               "embeddings": {"backbone_gap": jnp.zeros((2, 512))}}
    with pytest.raises(ValueError, match="share_towers"):
        unshared.apply(variables, batch, train=False,
                       towers={"mri": mri_out})
