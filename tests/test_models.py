"""Model zoo: shapes, embedding taps, quirk flags, init/apply sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models import (
    AllModalitiesFusion,
    AnatCNN,
    AnatPETFusion,
    PETMRIEarlyFusion,
    PETMRIFeatureMapFusion,
    PETResNetCNN,
    PETTabularFusion,
    RandomBenchmarkAllCN,
    SmallPETCNN,
    TabularMLP,
    TabularMRIFusion,
)

B = 2
VOL = (B, 32, 40, 32)  # small volume; divisible enough for 3-4 pools


def _batch(keys=("pet1451", "mri", "tabular"), seed=0):
    rng = np.random.default_rng(seed)
    batch = {"label": jnp.asarray(rng.integers(0, 3, B), jnp.int32)}
    if "pet1451" in keys:
        batch["pet1451"] = jnp.asarray(rng.normal(size=VOL), jnp.float32)
    if "mri" in keys:
        batch["mri"] = jnp.asarray(rng.normal(size=VOL), jnp.float32)
    if "tabular" in keys:
        batch["tabular"] = jnp.asarray(rng.normal(size=(B, 9)), jnp.float32)
    return batch


def _init_apply(model, batch, train=False):
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    rngs = {"dropout": jax.random.PRNGKey(1)} if train else {}
    if train:
        out, _ = model.apply(variables, batch, train=True, rngs=rngs,
                             mutable=["batch_stats"])
    else:
        out = model.apply(variables, batch, train=False)
    return variables, out


@pytest.mark.parametrize("n_classes", [2, 3])
def test_small_pet_cnn_shapes_and_taps(n_classes):
    model = SmallPETCNN.from_hparams({
        "n_classes": n_classes, "conv_out": (8, 16), "filter_size": (5, 3),
        "batchnorm": True, "linear_out": 64,
        "dropout_conv_p": 0.1, "dropout_dense_p": 0.3})
    batch = _batch(("pet1451",))
    variables, out = _init_apply(model, batch)
    assert out["logits"].shape == (B, n_classes)
    assert out["embeddings"]["gap"].shape == (B, 16)
    assert out["embeddings"]["dense"].shape == (B, 64)
    assert model.fusion_tap() == ("gap" if n_classes == 2 else "dense")
    # train-mode apply with dropout + BN mutation works
    _init_apply(model, batch, train=True)


def test_small_pet_cnn_no_hidden_linear():
    model = SmallPETCNN.from_hparams({
        "n_classes": 3, "conv_out": (8, 16), "filter_size": (3, 3),
        "linear_out": False})
    _, out = _init_apply(model, _batch(("pet1451",)))
    assert out["logits"].shape == (B, 3)
    assert "dense" not in out["embeddings"]


def test_random_benchmark_all_cn():
    model = RandomBenchmarkAllCN.from_hparams({
        "n_classes": 3, "conv_out": (8,), "filter_size": (3,),
        "linear_out": 16})
    _, out = _init_apply(model, _batch(("pet1451",)))
    preds = np.asarray(jnp.argmax(out["logits"], axis=-1))
    np.testing.assert_array_equal(preds, np.zeros(B))


@pytest.mark.parametrize("depth,width", [(10, 512), (18, 512), (34, 512), (50, 2048)])
def test_anat_cnn_depths(depth, width):
    model = AnatCNN.from_hparams({
        "n_classes": 3, "resnet_depth": depth, "linear_out": (32,),
        "batchnorm_begin": True})
    batch = _batch(("mri",))
    _, out = _init_apply(model, batch)
    assert out["logits"].shape == (B, 3)
    assert out["embeddings"]["backbone_gap"].shape == (B, width)
    # trailing ReLU quirk: logits clamped >= 0 (anat_cnn.py:77)
    assert np.asarray(out["logits"]).min() >= 0


def test_anat_cnn_bad_depth():
    with pytest.raises(ValueError):
        AnatCNN.from_hparams({"n_classes": 3, "resnet_depth": 99})


def test_trailing_relu_flag_off():
    model = AnatCNN.from_hparams(
        {"n_classes": 3, "resnet_depth": 10}, trailing_relu=False)
    _, out = _init_apply(model, _batch(("mri",)))
    assert np.asarray(out["logits"]).min() < 0  # unclamped logits


def test_pet_resnet_cnn():
    model = PETResNetCNN.from_hparams({"n_classes": 2, "resnet_depth": 10})
    _, out = _init_apply(model, _batch(("pet1451",)))
    assert out["logits"].shape == (B, 2)


def test_tabular_mlp():
    model = TabularMLP.from_hparams({
        "n_classes": 3, "hidden": (32, 1024),
        "feature_mean": [0.0] * 9, "feature_std": [1.0] * 9})
    _, out = _init_apply(model, _batch(("tabular",)))
    assert out["logits"].shape == (B, 3)
    assert out["embeddings"]["decoder"].shape == (B, 1024)


PET_HP = {"n_classes": 3, "conv_out": (8, 16), "filter_size": (5, 3),
          "linear_out": 64}
MRI_HP = {"n_classes": 3, "resnet_depth": 10}
TAB_HP = {"n_classes": 3, "hidden": (32, 1024)}


def test_anat_pet_fusion():
    model = AnatPETFusion.from_hparams({"n_classes": 3}, PET_HP, MRI_HP)
    _, out = _init_apply(model, _batch(("pet1451", "mri")))
    assert out["logits"].shape == (B, 3)
    assert out["embeddings"]["fusion"].shape == (B, 64)


def test_pet_tabular_fusion_both_dim_reds():
    for simple in (False, True):
        model = PETTabularFusion.from_hparams(
            {"n_classes": 3, "simple_dim_red": simple}, PET_HP, TAB_HP)
        variables, out = _init_apply(model, _batch(("pet1451", "tabular")))
        assert out["logits"].shape == (B, 3)
        params = variables["params"]
        if simple:
            assert "reduce_tab_0" in params and "reduce_tab_1" in params
        else:
            assert "reduce_tab" in params


def test_tabular_mri_fusion():
    model = TabularMRIFusion.from_hparams({"n_classes": 2}, MRI_HP, TAB_HP)
    _, out = _init_apply(model, _batch(("mri", "tabular")))
    assert out["logits"].shape == (B, 2)
    assert out["embeddings"]["fusion"].shape == (B, 64)


def test_all_modalities_fusion():
    model = AllModalitiesFusion.from_hparams(
        {"n_classes": 3}, {"n_classes": 3}, {"n_classes": 3},
        {"n_classes": 3}, PET_HP, MRI_HP, TAB_HP)
    variables, out = _init_apply(model, _batch())
    assert out["logits"].shape == (B, 3)
    # stage-2 submodules present in the param tree for grafting
    for sub in ("model_anat_pet", "model_anat_tab", "model_pet_tab"):
        assert sub in variables["params"]


def test_early_fusion():
    model = PETMRIEarlyFusion.from_hparams({
        "n_classes": 2, "conv_out": (8, 16), "filter_size": (5, 3),
        "linear_out": 32})
    _, out = _init_apply(model, _batch(("pet1451", "mri")))
    assert out["logits"].shape == (B, 2)


@pytest.mark.parametrize("mode", ["concatenate", "maxout"])
def test_featuremap_fusion(mode):
    model = PETMRIFeatureMapFusion.from_hparams({
        "n_classes": 2, "fusion_mode": mode, "conv_out": (8, 16),
        "filter_size": (5, 3), "n_layers_fusion": 1, "n_out_fusion": 32,
        "filter_size_fusion": 3})
    _, out = _init_apply(model, _batch(("pet1451", "mri")))
    assert out["logits"].shape == (B, 2)


def test_gradients_flow():
    """End-to-end grad through a fusion model (no stop_gradient leaks)."""
    model = AnatPETFusion.from_hparams({"n_classes": 3}, PET_HP, MRI_HP)
    batch = _batch(("pet1451", "mri"))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    from multimodal_alzheimer_tpu.losses import weighted_cross_entropy

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return weighted_cross_entropy(out["logits"], batch["label"])

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


@pytest.mark.parametrize("impl", ["sf", "wf"])
def test_anat_cnn_maxpool_impl_parity(impl):
    """maxpool_impl variants: identical forward, identical gradients.

    The stem pool backwards (ops/maxpool.py) are parity-tested at op level
    in tests/test_maxpool_vjp.py; this locks in the model-level wiring.
    """
    batch = _batch(keys=("mri",))
    hp = {"n_classes": 3, "resnet_depth": 10}
    ref = AnatCNN.from_hparams(hp)
    alt = AnatCNN.from_hparams(hp, maxpool_impl=impl)
    variables = ref.init(jax.random.PRNGKey(0), batch, train=False)

    out_ref = ref.apply(variables, batch, train=False)
    out_alt = alt.apply(variables, batch, train=False)
    np.testing.assert_array_equal(np.asarray(out_ref["logits"]),
                                  np.asarray(out_alt["logits"]))

    def loss(model):
        def fn(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"])
            return jnp.sum(out["logits"] ** 2)
        return jax.grad(fn)(variables["params"])

    g_ref, g_alt = loss(ref), loss(alt)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-6),
        g_ref, g_alt)
