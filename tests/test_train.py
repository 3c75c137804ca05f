"""Training harness: loss decreases, optimizer groups, schedulers, ckpts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.losses import make_criterion
from multimodal_alzheimer_tpu.models import SmallPETCNN, TabularMLP
from multimodal_alzheimer_tpu.train import (
    EarlyStopping,
    PlateauScheduler,
    TrainState,
    TopKCheckpointManager,
    build_optimizer,
    graft_params,
    head_pretrained_label_fn,
    load_checkpoint,
    make_eval_step,
    make_train_step,
    save_checkpoint,
    single_lr_optimizer,
)

HP = {"n_classes": 2, "conv_out": (4, 8), "filter_size": (3, 3),
      "linear_out": 16, "lr": 1e-3}


def _pet_batch(n=8, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    vols = rng.normal(size=(n, 16, 16, 16)).astype(np.float32)
    # make the task learnable: class 1 volumes have higher mean
    vols += labels[:, None, None, None] * 2.0
    return {"pet1451": jnp.asarray(vols),
            "label": jnp.asarray(labels, jnp.int32)}


def test_train_step_reduces_loss():
    model = SmallPETCNN.from_hparams(HP)
    criterion = make_criterion({"loss_class_weights": None})
    optimizer = single_lr_optimizer(HP["lr"])
    batch = _pet_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = TrainState.create(variables, optimizer)
    step = make_train_step(model, criterion, optimizer)

    rng = jax.random.PRNGKey(1)
    first_loss = None
    for i in range(30):
        rng, sub = jax.random.split(rng)
        state, aux = step(state, batch, sub)
        if first_loss is None:
            first_loss = float(aux["loss"])
    assert float(aux["loss"]) < first_loss * 0.5
    assert int(state.step) == 30


def test_eval_step_contract():
    model = SmallPETCNN.from_hparams(HP)
    criterion = make_criterion({"loss_class_weights": None})
    batch = _pet_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = make_eval_step(model, criterion)(variables, batch)
    assert set(out) >= {"loss", "logits", "labels"}
    assert out["logits"].shape == (8, 2)


def test_multi_group_optimizer_freezes_backbone():
    """Frozen group params must not move; head params must move
    (anat_cnn.py:111-126 semantics)."""
    model = SmallPETCNN.from_hparams(HP)
    criterion = make_criterion({"loss_class_weights": None})
    batch = _pet_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    label_fn = head_pretrained_label_fn(("cls", "hidden"),
                                        pretrained_lr=None)
    optimizer = build_optimizer({"head": 1e-2}, label_fn,
                                variables["params"], l2_reg=1e-2)
    # snapshot before the step: the donated state aliases these buffers
    conv0 = np.asarray(
        variables["params"]["convs"]["block_0"]["conv"]["kernel"])
    head_before = np.asarray(variables["params"]["cls"]["kernel"])

    state = TrainState.create(variables, optimizer)
    step = make_train_step(model, criterion, optimizer)
    state2, _ = step(state, batch, jax.random.PRNGKey(1))

    conv0_after = state2.params["convs"]["block_0"]["conv"]["kernel"]
    np.testing.assert_array_equal(conv0, np.asarray(conv0_after))
    head_after = state2.params["cls"]["kernel"]
    assert np.abs(np.asarray(head_after) - head_before).max() > 0


def test_torch_adam_parity_dense_layer():
    """One Adam step on a linear regression matches torch.optim.Adam
    (incl. weight_decay-as-L2 semantics)."""
    import torch

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    x = rng.normal(size=(16, 4)).astype(np.float32)
    y = rng.normal(size=(16, 3)).astype(np.float32)
    lr, wd = 1e-2, 1e-2

    # torch
    wt = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    for _ in range(3):
        opt.zero_grad()
        loss = ((torch.tensor(x) @ wt - torch.tensor(y)) ** 2).mean()
        loss.backward()
        opt.step()

    # ours
    import optax

    from multimodal_alzheimer_tpu.train.optim import adam_group

    opt_j = adam_group(lr, wd)
    wj = jnp.asarray(w0)
    opt_state = opt_j.init(wj)
    for _ in range(3):
        grads = jax.grad(
            lambda w: jnp.mean((x @ w - y) ** 2))(wj)
        updates, opt_state = opt_j.update(grads, opt_state, wj)
        wj = optax.apply_updates(wj, updates)

    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def test_plateau_scheduler_torch_parity():
    import torch

    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([w], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, factor=0.5)
    ours = PlateauScheduler(factor=0.5)
    vals = [1.0] * 30 + [0.5] + [0.6] * 30
    for v in vals:
        sched.step(v)
        scale = ours.step(v)
        assert abs(opt.param_groups[0]["lr"] - scale) < 1e-9, v


def test_early_stopping():
    es = EarlyStopping(patience=3)
    seq = [1.0, 0.9, 0.95, 0.96, 0.97]  # 3 non-improving after 0.9
    stops = [es.step(v) for v in seq]
    assert stops == [False, False, False, False, True]


def test_checkpoint_roundtrip_and_topk(tmp_path):
    model = TabularMLP.from_hparams({"n_classes": 3, "hidden": (8, 16)})
    batch = {"tabular": jnp.zeros((2, 9)), "label": jnp.zeros(2, jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    hp = {"n_classes": 3, "hidden": [8, 16], "lr": 1e-3}

    path = tmp_path / "ckpt"
    save_checkpoint(path, variables, hp, {"val_f1_epoch": 0.5})
    restored, hp2, metrics = load_checkpoint(path)
    assert hp2 == hp and metrics["val_f1_epoch"] == 0.5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables["params"], restored["params"])

    mgr = TopKCheckpointManager(tmp_path / "topk", "val_loss_epoch",
                                "min", top_k=2, filename_metric="val_loss")
    for epoch, loss in enumerate([1.0, 0.8, 0.9, 0.5, 2.0]):
        mgr.consider(epoch, {"val_loss_epoch": loss}, variables, hp)
    assert len(mgr.entries) == 2
    assert mgr.best_value == 0.5
    assert "val_loss=0.500" in mgr.best_path
    import os

    assert len(os.listdir(tmp_path / "topk")) == 2


def test_graft_params():
    """Stage-1 params transplant into the fusion tree (checkpoint surgery
    replacement, anat_pet_fusion.py:16-32)."""
    from multimodal_alzheimer_tpu.models import AnatPETFusion

    pet_hp = {"n_classes": 3, "conv_out": (4,), "filter_size": (3,),
              "linear_out": 8}
    mri_hp = {"n_classes": 3, "resnet_depth": 10}
    pet = SmallPETCNN.from_hparams(pet_hp)
    pet_batch = {"pet1451": jnp.zeros((1, 16, 16, 16)),
                 "label": jnp.zeros(1, jnp.int32)}
    pet_vars = pet.init(jax.random.PRNGKey(7), pet_batch, train=False)

    fusion = AnatPETFusion.from_hparams({"n_classes": 3}, pet_hp, mri_hp)
    batch = {"pet1451": jnp.zeros((1, 16, 16, 16)),
             "mri": jnp.zeros((1, 16, 16, 16)),
             "label": jnp.zeros(1, jnp.int32)}
    fusion_vars = fusion.init(jax.random.PRNGKey(0), batch, train=False)

    grafted = graft_params(fusion_vars, {"pet_model": pet_vars})
    np.testing.assert_array_equal(
        np.asarray(grafted["params"]["pet_model"]["cls"]["kernel"]),
        np.asarray(pet_vars["params"]["cls"]["kernel"]))
    # unrelated subtree untouched
    np.testing.assert_array_equal(
        np.asarray(grafted["params"]["stage2out"]["kernel"]),
        np.asarray(fusion_vars["params"]["stage2out"]["kernel"]))
    # structure mismatch raises
    bad = {"params": {"cls": {"kernel": np.zeros((3, 3))}}}
    with pytest.raises(ValueError):
        graft_params(fusion_vars, {"pet_model": bad})


def test_train_state_resume(tmp_path):
    """Full resume: saved+restored state continues training identically."""
    from multimodal_alzheimer_tpu.train.checkpoint import (
        load_train_state,
        save_train_state,
    )

    model = SmallPETCNN.from_hparams(HP)
    criterion = make_criterion({"loss_class_weights": None})
    optimizer = single_lr_optimizer(HP["lr"])
    batch = _pet_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = TrainState.create(variables, optimizer)
    step = make_train_step(model, criterion, optimizer)

    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, _ = step(state, batch, rng)

    save_train_state(tmp_path / "resume", state, HP)
    restored, hp = load_train_state(tmp_path / "resume", optimizer)
    assert hp["lr"] == HP["lr"]
    assert int(restored.step) == 3

    # both continue identically for 2 more steps
    s_a, s_b = state, restored
    for _ in range(2):
        s_a, aux_a = step(s_a, batch, rng)
        s_b, aux_b = step(s_b, batch, rng)
    np.testing.assert_allclose(float(aux_a["loss"]), float(aux_b["loss"]),
                               rtol=1e-6)
    for la, lb in zip(jax.tree_util.tree_leaves(s_a.params),
                      jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_train_state_resume_multi_transform(tmp_path):
    """Resume with optax.multi_transform group states (path-mapped, not
    leaf-order) — group moments must land in the right groups."""
    from multimodal_alzheimer_tpu.train.checkpoint import (
        load_train_state,
        save_train_state,
    )

    model = SmallPETCNN.from_hparams(HP)
    criterion = make_criterion({"loss_class_weights": None})
    label_fn = head_pretrained_label_fn(("cls", "hidden"),
                                        pretrained_lr=1e-5)
    optimizer = build_optimizer({"head": 1e-2, "pretrained": 1e-5},
                                label_fn, None, l2_reg=1e-3)
    batch = _pet_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = TrainState.create(variables, optimizer)
    step = make_train_step(model, criterion, optimizer)
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, _ = step(state, batch, rng)

    save_train_state(tmp_path / "mt", state, HP)
    restored, _ = load_train_state(tmp_path / "mt", optimizer)

    s_a, s_b = state, restored
    for _ in range(2):
        s_a, aux_a = step(s_a, batch, rng)
        s_b, aux_b = step(s_b, batch, rng)
    np.testing.assert_allclose(float(aux_a["loss"]), float(aux_b["loss"]),
                               rtol=1e-6)
    for la, lb in zip(jax.tree_util.tree_leaves(s_a.params),
                      jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
