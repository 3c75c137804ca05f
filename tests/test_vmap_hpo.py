"""Vectorized HPO (train/vmap_hpo.py): K trials per program via vmap.

Checks, in order of importance:
* no cross-trial contamination — a trial's trajectory is identical whether
  it trains alone (vmap width 1) or stacked with strangers (width K);
* the traced criterion matches the reference loss implementations
  (losses/classification.py) for both the weighted-CE and focal selectors;
* early stopping inside the vmapped loop replays train/optim.EarlyStopping
  trial-by-trial on the recorded val history;
* the traced-rate dropout path has nn.Dropout semantics;
* the batched ask/tell TPE driver still optimizes (beats random search);
* the real TabularMLP end-to-end path learns and returns sane objectives.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_alzheimer_tpu.losses.classification import (
    focal_loss,
    weighted_cross_entropy,
)
from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import (
    TabularMLP,
)
from multimodal_alzheimer_tpu.train.hpo import RandomStudy, TPEStudy
from multimodal_alzheimer_tpu.train.optim import EarlyStopping
from multimodal_alzheimer_tpu.train import vmap_hpo


def _synthetic_tabular(n, seed=0, n_classes=3, rule_seed=42):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 9)).astype(np.float32)
    # learnable rule SHARED across splits (rule_seed): class from a noisy
    # linear projection, so a fitted model generalizes to the val split
    w = np.random.default_rng(rule_seed).normal(size=(9, n_classes))
    logits = x @ w + 0.5 * rng.normal(size=(n, n_classes))
    y = logits.argmax(axis=1).astype(np.int32)
    return {"tabular": x, "label": y}


CW3 = np.array([0.55, 0.75, 0.7], np.float32)


def _rows():
    return [
        {"lr": 3e-3, "l2_reg": 0.0, "dropout_p": 0.0, "fl_gamma": None,
         "trial_seed": 11},
        {"lr": 1e-3, "l2_reg": 1e-2, "dropout_p": 0.3, "fl_gamma": 2,
         "trial_seed": 22},
        {"lr": 1e-4, "l2_reg": 1e-3, "dropout_p": 0.1, "fl_gamma": None,
         "trial_seed": 33},
    ]


def _run(rows, **kwargs):
    model = TabularMLP(n_classes=3, hidden=(32, 64))
    hp = vmap_hpo.stack_trial_hparams(rows)
    defaults = dict(batch_size=16, max_epochs=4, patience=10,
                    class_weights=CW3, seed=7)
    defaults.update(kwargs)
    return vmap_hpo.run_parallel_trials(
        model, hp, _synthetic_tabular(64, 0), _synthetic_tabular(48, 1),
        **defaults)


def test_stacked_trials_match_solo_runs():
    """Width-K and width-1 runs of the same config must coincide —
    the vmap axis introduces no cross-trial leakage and per-trial rngs
    are position-independent (keyed on trial_seed, not stack index)."""
    rows = _rows()
    _, info_k = _run(rows)
    for i, row in enumerate(rows):
        _, info_1 = _run([row])
        np.testing.assert_allclose(info_1["val_history"][:, 0],
                                   info_k["val_history"][:, i],
                                   rtol=2e-5, atol=1e-6)


def test_criterion_matches_reference_losses():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, 32).astype(np.int32))
    mask = jnp.ones(32, jnp.float32)

    hp_ce = {"fl_gamma": jnp.float32(0.0), "use_focal": jnp.float32(0.0)}
    got = vmap_hpo.trial_criterion(logits, labels, mask, hp_ce, CW3)
    want = weighted_cross_entropy(logits, labels, jnp.asarray(CW3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    hp_fl = {"fl_gamma": jnp.float32(2.0), "use_focal": jnp.float32(1.0)}
    got = vmap_hpo.trial_criterion(logits, labels, mask, hp_fl, CW3)
    want = focal_loss(logits, labels, gamma=2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_masked_criterion_ignores_padding():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, 8).astype(np.int32))
    hp = {"fl_gamma": jnp.float32(0.0), "use_focal": jnp.float32(0.0)}
    mask = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
    got = vmap_hpo.trial_criterion(logits, labels, mask, hp, CW3)
    want = weighted_cross_entropy(logits[:5], labels[:5], jnp.asarray(CW3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_early_stopping_replays_sequential_semantics():
    rows = _rows()
    last, info = _run(rows, max_epochs=12, patience=2)
    hist = info["val_history"]  # (epochs, K)
    for i in range(len(rows)):
        es = EarlyStopping(patience=2)
        stop_epoch = None
        for epoch in range(hist.shape[0]):
            if es.step(float(hist[epoch, i])):
                stop_epoch = epoch
                break
        if stop_epoch is None:
            stop_epoch = hist.shape[0] - 1
        assert info["stopped_epoch"][i] == stop_epoch
        np.testing.assert_allclose(last[i], hist[stop_epoch, i], rtol=1e-6)
        # frozen after stop: the carry stops changing, so val stays flat
        for later in range(stop_epoch + 1, hist.shape[0]):
            np.testing.assert_allclose(hist[later, i], hist[stop_epoch, i],
                                       rtol=1e-6)


def test_track_best_snapshots_best_epoch_state():
    """track_best must hand back each trial's params/stats at its
    best-val-loss epoch: re-scoring the snapshot with the same batching
    semantics reproduces min(val_history) per trial (ADVICE r4 #1 — the
    fast-mode study scores these snapshots, not ES-stopped carries)."""
    rows = _rows()
    val_data = _synthetic_tabular(48, 1)
    _, info = _run(rows, max_epochs=8, patience=10, return_state=True,
                   track_best=True)
    hist = info["val_history"]  # (epochs, K)
    np.testing.assert_allclose(info["best_val"], hist.min(axis=0),
                               rtol=1e-6)
    model = TabularMLP(n_classes=3, hidden=(32, 64))
    params, stats = info["best_carry"]
    for i, row in enumerate(rows):
        variables = {"params": jax.tree_util.tree_map(
            lambda x: x[i], params)}
        if stats:
            variables["batch_stats"] = jax.tree_util.tree_map(
                lambda x: x[i], stats)
        hp_row = {"fl_gamma": jnp.float32(row["fl_gamma"] or 0.0),
                  "use_focal": jnp.float32(1.0 if row["fl_gamma"]
                                           else 0.0)}
        losses = []
        for s in range(0, 48, 16):  # the internal val batching (b=16)
            batch = {k: jnp.asarray(v[s:s + 16])
                     for k, v in val_data.items()}
            out = model.apply(variables, batch, train=False)
            losses.append(float(vmap_hpo.trial_criterion(
                out["logits"], batch["label"], jnp.ones(16, jnp.float32),
                hp_row, jnp.asarray(CW3))))
        np.testing.assert_allclose(np.mean(losses), hist[:, i].min(),
                                   rtol=2e-5, atol=1e-6)


def test_traced_dropout_semantics():
    model = TabularMLP(n_classes=3, hidden=(64,))
    batch = _synthetic_tabular(128, 9)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    # rate 0 under train: exact identity with the no-dropout forward
    out0 = model.apply(variables, batch, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)},
                       dropout_rate=jnp.float32(0.0))
    ref = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(out0["logits"]),
                               np.asarray(ref["logits"]), rtol=1e-6)

    # rate r: survivors of the tap are scaled by 1/(1-r), ~r zeroed
    r = 0.4
    outs = model.apply(variables, batch, train=True,
                       rngs={"dropout": jax.random.PRNGKey(2)},
                       dropout_rate=jnp.float32(r))
    h = model.apply(variables, batch, train=False)["embeddings"]["decoder"]
    hd = outs["embeddings"]["decoder"]
    h, hd = np.asarray(h), np.asarray(hd)
    dropped = (hd == 0) & (h != 0)
    kept = (hd != 0)
    frac = dropped.sum() / max((h != 0).sum(), 1)
    assert abs(frac - r) < 0.05, frac
    np.testing.assert_allclose(hd[kept], h[kept] / (1 - r), rtol=1e-5)

    # eval: traced rate ignored entirely
    oute = model.apply(variables, batch, train=False,
                       dropout_rate=jnp.float32(r))
    np.testing.assert_allclose(np.asarray(oute["logits"]),
                               np.asarray(ref["logits"]), rtol=1e-6)


def test_stack_trial_hparams_padding():
    hp = vmap_hpo.stack_trial_hparams(_rows()[:2], pad_to=5)
    assert hp["lr"].shape == (5,)
    np.testing.assert_allclose(hp["lr"][2:], hp["lr"][1])
    with pytest.raises(ValueError):
        vmap_hpo.stack_trial_hparams(_rows(), pad_to=2)


def _toy_batch_objective(signature, rows):
    # deterministic synthetic landscape over (lr, dropout) given arch
    best_lr = {16: 3e-3, 32: 1e-3}[signature]
    return [abs(math.log10(r["lr"]) - math.log10(best_lr))
            + r["dropout_p"] for r in rows]


def _toy_sample(trial):
    return {"lr": trial.suggest_float("lr", 1e-5, 1e-1, log=True),
            "dropout_p": trial.suggest_float("dropout_p", 0.0, 0.5),
            "batch_size": trial.suggest_categorical("batch_size", (16, 32))}


def test_optimize_batched_tpe_beats_random():
    def run(study_cls):
        total = 0.0
        for seed in range(4):
            study = study_cls(direction="minimize", seed=seed)
            vmap_hpo.optimize_batched(
                study, _toy_sample, _toy_batch_objective,
                n_trials=64, parallel=8,
                signature_fn=lambda hp: hp["batch_size"])
            assert len(study.trials) == 64
            total += study.best_value
        return total / 4

    tpe, rand = run(TPEStudy), run(RandomStudy)
    assert tpe < rand, (tpe, rand)
    assert tpe < 0.35, tpe


def test_tabular_parallel_end_to_end_learns():
    """Real model, mixed loss/dropout/lr trials: the sane-lr trials end
    well below the lr≈0 control, nothing is NaN, padding is discarded."""
    rows = [
        {"lr": 5e-3, "l2_reg": 0.0, "dropout_p": 0.0, "fl_gamma": None},
        {"lr": 5e-3, "l2_reg": 1e-3, "dropout_p": 0.2, "fl_gamma": 2},
        {"lr": 1e-9, "l2_reg": 0.0, "dropout_p": 0.0, "fl_gamma": None},
    ]
    model = TabularMLP(n_classes=3, hidden=(32, 64))
    hp = vmap_hpo.stack_trial_hparams(rows, pad_to=4)
    last, info = vmap_hpo.run_parallel_trials(
        model, hp, _synthetic_tabular(96, 2), _synthetic_tabular(64, 3),
        batch_size=16, max_epochs=10, patience=10, class_weights=CW3,
        seed=1)
    last = last[:len(rows)]
    assert np.isfinite(last).all(), last
    assert np.isfinite(info["val_history"]).all()
    hist = info["val_history"]
    # the trained trials learn: their best epoch clearly beats both their
    # own start and anything the lr~0 control ever reaches (the *last*
    # val loss may exceed it again — tiny-data overfit — which is exactly
    # what the early-stopping objective exists to capture)
    assert hist[:, 0].min() < 0.8 * hist[0, 0]
    assert hist[:, 0].min() < hist[:, 2].min()
    # the control never moves measurably
    np.testing.assert_allclose(hist[:, 2], hist[0, 2], rtol=1e-3)


def test_mesh_sharded_trials_match_single_device():
    """Trial parallelism: sharding the stacked-trial axis over an 8-device
    mesh must reproduce the unsharded run — each trial lives whole on one
    device, so GSPMD needs zero collectives and the math is unchanged."""
    from multimodal_alzheimer_tpu.parallel import make_mesh

    rows = [dict(r, trial_seed=100 + i)  # 8 rows for the 8-device mesh
            for i, r in enumerate(_rows() + _rows() + _rows()[:2])]
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    _, info_sharded = _run(rows, mesh=mesh)
    _, info_plain = _run(rows)
    np.testing.assert_allclose(info_sharded["val_history"],
                               info_plain["val_history"],
                               rtol=2e-5, atol=1e-6)


def test_mesh_rejects_indivisible_width():
    from multimodal_alzheimer_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    with pytest.raises(ValueError, match="divide"):
        _run(_rows(), mesh=make_mesh(8))


def _synthetic_pet(n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "pet1451": (rng.normal(size=(n, 16, 16, 16)) * 0.5 + 0.5)
        .astype(np.float32),
        "label": rng.integers(0, 3, n).astype(np.int32),
    }


def _pet_apply(model, variables, batch, hp, rng, train):
    if train:
        return model.apply(variables, batch, train=True,
                           rngs={"dropout": rng}, mutable=["batch_stats"],
                           dropout_conv_rate=hp["dropout_conv_p"],
                           dropout_dense_rate=hp["dropout_dense_p"])
    return model.apply(variables, batch, train=False), {}


def test_pet_cnn_stacked_trials_match_solo():
    """The PET CNN bucket path: BatchNorm stats and BOTH traced dropout
    rates vmap per trial without cross-trial leakage (width-K == width-1),
    covering the stage-1 search's hardest knobs."""
    from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import (
        SmallPETCNN,
    )

    model = SmallPETCNN(n_classes=3, conv_out=(4, 8), filter_size=(3, 3),
                        batchnorm=True, linear_out=8)
    rows = [
        {"lr": 3e-3, "fl_gamma": None, "dropout_conv_p": 0.0,
         "dropout_dense_p": 0.0, "trial_seed": 11},
        {"lr": 1e-3, "fl_gamma": 2, "dropout_conv_p": 0.1,
         "dropout_dense_p": 0.3, "trial_seed": 22},
        {"lr": 3e-4, "fl_gamma": None, "dropout_conv_p": 0.0,
         "dropout_dense_p": 0.4, "trial_seed": 33},
    ]
    extra = ("dropout_conv_p", "dropout_dense_p")
    common = dict(batch_size=8, max_epochs=3, patience=10,
                  class_weights=CW3, seed=7, apply_fn=_pet_apply)
    data = (_synthetic_pet(32, 0), _synthetic_pet(16, 1))

    hp_k = vmap_hpo.stack_trial_hparams(rows, extra_keys=extra)
    _, info_k = vmap_hpo.run_parallel_trials(model, hp_k, *data, **common)
    # Stack-position independence at the SAME width: identical compiled
    # program => identical rounding, so this pins zero leakage tightly.
    hp_r = vmap_hpo.stack_trial_hparams(rows[::-1], extra_keys=extra)
    _, info_r = vmap_hpo.run_parallel_trials(model, hp_r, *data, **common)
    np.testing.assert_allclose(info_r["val_history"][:, ::-1],
                               info_k["val_history"], rtol=2e-5, atol=1e-6)
    # Width-K vs width-1: same trajectories up to conv-emitter rounding
    # (different widths lower the 3D convs to different XLA programs, so
    # exact-f32 agreement is not expected — unlike the MLP case).
    for i, row in enumerate(rows):
        hp_1 = vmap_hpo.stack_trial_hparams([row], extra_keys=extra)
        _, info_1 = vmap_hpo.run_parallel_trials(model, hp_1, *data,
                                                 **common)
        np.testing.assert_allclose(info_1["val_history"][:, 0],
                                   info_k["val_history"][:, i],
                                   rtol=2e-3, atol=1e-4)


def test_pet_traced_dropout_zero_matches_static_none():
    """Rate 0.0 through the traced conv+dense dropout hooks is bit-exact
    to the static no-dropout forward (so absent dropout knobs never
    fragment an HPO bucket)."""
    from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import (
        SmallPETCNN,
    )

    model = SmallPETCNN(n_classes=3, conv_out=(4, 8), filter_size=(3, 3),
                        batchnorm=True, linear_out=8)
    batch = {k: jnp.asarray(v) for k, v in _synthetic_pet(8, 5).items()}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out0, _ = model.apply(variables, batch, train=True,
                          rngs={"dropout": jax.random.PRNGKey(1)},
                          mutable=["batch_stats"],
                          dropout_conv_rate=jnp.float32(0.0),
                          dropout_dense_rate=jnp.float32(0.0))
    ref, _ = model.apply(variables, batch, train=True,
                         mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out0["logits"]),
                                  np.asarray(ref["logits"]))

    # and a nonzero dense rate actually perturbs the forward
    outr, _ = model.apply(variables, batch, train=True,
                          rngs={"dropout": jax.random.PRNGKey(1)},
                          mutable=["batch_stats"],
                          dropout_conv_rate=jnp.float32(0.0),
                          dropout_dense_rate=jnp.float32(0.5))
    assert not np.allclose(np.asarray(outr["logits"]),
                           np.asarray(ref["logits"]))


def test_train_pet_cnn_entrypoint_parallel(tmp_path):
    """train_pet_cnn.optuna_optimization(parallel=K) end-to-end: buckets
    by the conv-arch signature, preprocesses the split once, tells every
    trial a finite-or-inf objective."""
    from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split
    from multimodal_alzheimer_tpu.models.pet_models import train_pet_cnn

    # (19,23,17) survives the deepest sampleable conv ladder (4 pools:
    # 19->9->4->2->1); smaller volumes raise max_pool3d's too-deep guard.
    write_synthetic_split(str(tmp_path / "data"), n_subjects=(12, 5, 5),
                          seed=3, volume_shape=(19, 23, 17))
    old = os.environ.get("MMALZ_DATA_DIR")
    os.environ["MMALZ_DATA_DIR"] = str(tmp_path / "data")
    try:
        study = train_pet_cnn.optuna_optimization(n_trials=3, parallel=3)
    finally:
        if old is None:
            os.environ.pop("MMALZ_DATA_DIR", None)
        else:
            os.environ["MMALZ_DATA_DIR"] = old
    assert len(study.trials) == 3
    values = [v for v, _ in study.trials]
    assert all(np.isfinite(v) or v == math.inf for v in values)
    assert np.isfinite(study.best_value)


def _synthetic_mri(n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "mri": rng.normal(900, 400, size=(n, 12, 14, 12))
        .astype(np.float32),
        "label": rng.integers(0, 3, n).astype(np.int32),
    }


def _mri_apply(model, variables, batch, hp, rng, train):
    del hp, rng
    if train:
        return model.apply(variables, batch, train=True,
                           mutable=["batch_stats"])
    return model.apply(variables, batch, train=False), {}


def test_anat_cnn_two_group_lr_trials():
    """The MRI search's lr_select hook: a frozen trial (traced backbone lr
    0.0) keeps its backbone EXACTLY at init while its head moves; the
    unfrozen trial in the same program moves both groups."""
    from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN

    model = AnatCNN(n_classes=3, resnet_depth=10, linear_out=(16,),
                    freeze_backbone=False)
    rows = [
        {"lr": 1e-3, "lr_pretrained": None, "fl_gamma": None,
         "trial_seed": 1},
        {"lr": 1e-3, "lr_pretrained": 1e-3, "fl_gamma": None,
         "trial_seed": 2},
    ]
    hp = vmap_hpo.stack_trial_hparams(rows, extra_keys=("lr_pretrained",))
    np.testing.assert_array_equal(np.asarray(hp["lr_pretrained"]),
                                  np.float32([0.0, 1e-3]))

    def lr_select(hp_row, keys):
        return (hp_row["lr"] if keys and keys[0] == "head"
                else hp_row["lr_pretrained"])

    model_vars = jax.jit(jax.vmap(
        lambda s: model.init(jax.random.fold_in(jax.random.PRNGKey(7), s),
                             {k: jnp.asarray(v[:4])
                              for k, v in _synthetic_mri(4, 0).items()},
                             train=False)))(hp["trial_seed"])
    init_params = jax.device_get(model_vars["params"])

    _, info = vmap_hpo.run_parallel_trials(
        model, hp, _synthetic_mri(16, 0), _synthetic_mri(8, 1),
        batch_size=4, max_epochs=2, patience=10, class_weights=CW3,
        seed=7, apply_fn=_mri_apply, lr_select=lr_select,
        return_state=True)
    final_params = jax.device_get(info["carry"][0])

    def leaves(tree, top):
        return [(kp, v) for kp, v in
                jax.tree_util.tree_flatten_with_path(tree[top])[0]]

    # frozen trial (index 0): backbone bit-identical to init
    for (kp, f), (_, i0) in zip(leaves(final_params, "backbone"),
                                leaves(init_params, "backbone")):
        np.testing.assert_array_equal(f[0], i0[0], err_msg=str(kp))
    # both trials' heads moved; unfrozen trial's backbone moved
    head_moved = any(
        not np.array_equal(f[0], i0[0]) for (_, f), (_, i0) in
        zip(leaves(final_params, "head"), leaves(init_params, "head")))
    assert head_moved
    bb_moved = any(
        not np.array_equal(f[1], i0[1]) for (_, f), (_, i0) in
        zip(leaves(final_params, "backbone"),
            leaves(init_params, "backbone")))
    assert bb_moved


def test_train_anat_cnn_entrypoint_parallel(tmp_path):
    """train_anat_cnn.optuna_optimization(parallel=K) end-to-end: buckets
    by (depth, head shape, batchnorm flags, batch size, norm_percentile),
    per-bucket quantile min-max normalization of the raw split, frozen
    and unfrozen proposals in one program via lr_select."""
    from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split
    from multimodal_alzheimer_tpu.models.mri_models import train_anat_cnn

    write_synthetic_split(str(tmp_path / "data"), n_subjects=(12, 5, 5),
                          seed=4, volume_shape=(12, 14, 12))
    old = os.environ.get("MMALZ_DATA_DIR")
    os.environ["MMALZ_DATA_DIR"] = str(tmp_path / "data")
    try:
        study = train_anat_cnn.optuna_optimization(n_trials=2, parallel=2)
    finally:
        if old is None:
            os.environ.pop("MMALZ_DATA_DIR", None)
        else:
            os.environ["MMALZ_DATA_DIR"] = old
    assert len(study.trials) == 2
    values = [v for v, _ in study.trials]
    assert all(np.isfinite(v) or v == math.inf for v in values)
    assert np.isfinite(study.best_value)


def test_percentile_normalizer_honors_q(tmp_path):
    """The searched norm_percentile must actually change the data: the
    build-time ``mri_qminmax`` memo sidecars would override q inside the
    device preprocess, so percentile_normalizer strips them; one q stays
    cached; the fresh selection matches the memo path at the same q."""
    from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split
    from multimodal_alzheimer_tpu.models.mri_models import train_anat_cnn
    from multimodal_alzheimer_tpu.train.driver import build_datasets
    from multimodal_alzheimer_tpu.train.fusion_hpo import full_arrays

    write_synthetic_split(str(tmp_path / "data"), n_subjects=(6, 3, 3),
                          seed=4, volume_shape=(12, 14, 12))
    old = os.environ.get("MMALZ_DATA_DIR")
    os.environ["MMALZ_DATA_DIR"] = str(tmp_path / "data")
    try:
        trainset, valset = build_datasets(
            {"n_classes": 2}, ["t1w"],
            normalize_mri={"per_scan_norm": "min_max"}, quantile=0.99)
        raw_train = full_arrays(trainset)
        raw_val = full_arrays(valset)
        assert "mri_qminmax" in raw_train  # memo sidecars ride the split
        normalized = train_anat_cnn.percentile_normalizer(
            trainset, raw_train, raw_val)
        lo_train, _ = normalized(0.95)
        again, _ = normalized(0.95)
        assert again is lo_train  # cached, not renormalized
        hi_train, _ = normalized(1.0)  # evicts 0.95 (one q resident)
        assert not np.allclose(np.asarray(lo_train["mri"]),
                               np.asarray(hi_train["mri"]))
        # Ground truth: the memoized path at build-time quantile 0.95.
        trainset95, _ = build_datasets(
            {"n_classes": 2}, ["t1w"],
            normalize_mri={"per_scan_norm": "min_max"}, quantile=0.95)
        memo_train = jax.jit(trainset95.get_device_preprocess())(
            full_arrays(trainset95))
        np.testing.assert_allclose(np.asarray(lo_train["mri"]),
                                   np.asarray(memo_train["mri"]),
                                   rtol=2e-5, atol=2e-5)
    finally:
        if old is None:
            os.environ.pop("MMALZ_DATA_DIR", None)
        else:
            os.environ["MMALZ_DATA_DIR"] = old


def test_train_pet_resnet_entrypoint_parallel(tmp_path):
    """train_pet_resnet_cnn.optuna_optimization(parallel=K): the MRI
    wiring consuming PET volumes (two-group lr_select, fixed z-score
    preprocessing applied once)."""
    from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split
    from multimodal_alzheimer_tpu.models.pet_models import (
        train_pet_resnet_cnn,
    )

    write_synthetic_split(str(tmp_path / "data"), n_subjects=(12, 8, 4),
                          seed=4, volume_shape=(12, 14, 12))
    old = os.environ.get("MMALZ_DATA_DIR")
    os.environ["MMALZ_DATA_DIR"] = str(tmp_path / "data")
    try:
        study = train_pet_resnet_cnn.optuna_optimization(n_trials=2,
                                                         parallel=2)
    finally:
        if old is None:
            os.environ.pop("MMALZ_DATA_DIR", None)
        else:
            os.environ["MMALZ_DATA_DIR"] = old
    assert len(study.trials) == 2
    values = [v for v, _ in study.trials]
    assert all(np.isfinite(v) or v == math.inf for v in values)
    assert np.isfinite(study.best_value)


def test_train_featuremap_entrypoint_parallel(tmp_path):
    """train_anat_pet_featuremapfusion.optuna_optimization(parallel=K):
    full-model two-tower trials, every fusion knob in the signature."""
    from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split
    from multimodal_alzheimer_tpu.models.fusion_models import (
        train_anat_pet_featuremapfusion,
    )

    # (19,23,17) survives the deepest sampleable ladder; seed 6 keeps the
    # 2-class (MCI-dropped) PET+MRI val pairing non-empty.
    write_synthetic_split(str(tmp_path / "data"), n_subjects=(12, 8, 4),
                          seed=6, volume_shape=(19, 23, 17))
    old = os.environ.get("MMALZ_DATA_DIR")
    os.environ["MMALZ_DATA_DIR"] = str(tmp_path / "data")
    try:
        study = train_anat_pet_featuremapfusion.optuna_optimization(
            n_trials=2, parallel=2)
    finally:
        if old is None:
            os.environ.pop("MMALZ_DATA_DIR", None)
        else:
            os.environ["MMALZ_DATA_DIR"] = old
    assert len(study.trials) == 2
    values = [v for v, _ in study.trials]
    assert all(np.isfinite(v) or v == math.inf for v in values)
    assert np.isfinite(study.best_value)


def test_train_tabular_entrypoint_parallel(tmp_path):
    """optuna_optimization(parallel=K) end-to-end on the synthetic split:
    buckets by (batch_size, hidden), runs the vmapped trainer, tells every
    trial a finite-or-inf objective."""
    from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split
    from multimodal_alzheimer_tpu.models.tabular_models import train_tabular

    write_synthetic_split(str(tmp_path / "data"), n_subjects=(12, 5, 5),
                          seed=3, volume_shape=(10, 12, 10))
    old = os.environ.get("MMALZ_DATA_DIR")
    os.environ["MMALZ_DATA_DIR"] = str(tmp_path / "data")
    try:
        study = train_tabular.optuna_optimization(n_trials=4, parallel=4)
    finally:
        if old is None:
            os.environ.pop("MMALZ_DATA_DIR", None)
        else:
            os.environ["MMALZ_DATA_DIR"] = old
    assert len(study.trials) == 4
    values = [v for v, _ in study.trials]
    assert all(np.isfinite(v) or v == math.inf for v in values)
    assert np.isfinite(study.best_value)
