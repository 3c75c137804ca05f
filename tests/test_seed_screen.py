"""K-seed screen (train/seed_screen.py) + fast-mode wiring.

VERDICT r4 #2: fast-mode quick fits are seed-bimodal; the remedy is a
vmapped K-seed screen that selects the continuation seed. Pins:
* the winner is the argmin-best-val seed and its returned variables
  reproduce that val loss (they are the track_best snapshot);
* train_anat_fast runs screen -> continuation end-to-end and the
  continuation starts from the winner snapshot (not a re-init).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models import TabularMLP
from multimodal_alzheimer_tpu.train.seed_screen import screen_seeds
from multimodal_alzheimer_tpu.train.vmap_hpo import trial_criterion


def _synthetic_tabular(n, seed=0, n_classes=3, rule_seed=42):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 9)).astype(np.float32)
    w = np.random.default_rng(rule_seed).normal(size=(9, n_classes))
    logits = x @ w + 0.5 * rng.normal(size=(n, n_classes))
    y = logits.argmax(axis=1).astype(np.int32)
    return {"tabular": x, "label": y}


def test_screen_selects_argmin_seed_and_snapshot_reproduces():
    model = TabularMLP(n_classes=3, hidden=(16, 32))
    train = _synthetic_tabular(64, 0)
    val = _synthetic_tabular(48, 1)
    cw = [1 / 3, 1 / 3, 1 / 3]
    screen = screen_seeds(model, train, val, lr=3e-3, batch_size=16,
                          epochs=4, class_weights=cw,
                          seeds=(11, 22, 33, 44))
    assert screen["winner_seed"] == screen["seeds"][screen["winner_index"]]
    assert screen["winner_index"] == int(screen["best_val"].argmin())
    assert screen["val_history"].shape == (4, 4)
    # winner snapshot re-scores to its recorded best val loss (the
    # internal val batching: b=16, 48 divides evenly)
    hp_row = {"fl_gamma": jnp.float32(0.0), "use_focal": jnp.float32(0.0)}
    losses = []
    for s in range(0, 48, 16):
        batch = {k: jnp.asarray(v[s:s + 16]) for k, v in val.items()}
        out = model.apply(screen["winner_variables"], batch, train=False)
        losses.append(float(trial_criterion(
            out["logits"], batch["label"], jnp.ones(16, jnp.float32),
            hp_row, jnp.asarray(cw, jnp.float32))))
    np.testing.assert_allclose(np.mean(losses),
                               screen["best_val"].min(),
                               rtol=2e-5, atol=1e-6)


def test_train_anat_fast_screen_continuation(tmp_path):
    """End-to-end fast-mode path: K-seed screen then a checkpointed
    continuation from the winner snapshot, on a smoke-scale split."""
    from multimodal_alzheimer_tpu.data.synthetic import (
        write_synthetic_split,
    )
    from multimodal_alzheimer_tpu.models.mri_models import train_anat_cnn

    write_synthetic_split(str(tmp_path / "data"), n_subjects=(10, 4, 4),
                          seed=4, volume_shape=(12, 14, 12))
    old = os.environ.get("MMALZ_DATA_DIR")
    os.environ["MMALZ_DATA_DIR"] = str(tmp_path / "data")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        hparams = {
            "n_classes": 2, "resnet_depth": 10, "linear_out": (),
            "batchnorm_begin": False, "lr": 1e-3, "lr_pretrained": None,
            "batch_size": 4, "max_epochs": 2,
            "early_stopping_patience": 2,
            "reduce_factor_lr_schedule": None, "norm_percentile": 0.99,
            "best_k_checkpoints": 1,
        }
        last_val, screen = train_anat_cnn.train_anat_fast(
            hparams, experiment_name="fast_smoke", screen_k=2,
            screen_epochs=2)
        assert np.isfinite(last_val)
        assert screen["val_history"].shape == (2, 2)
        assert screen["winner_seed"] in screen["seeds"]
        assert "winner_variables" not in screen  # popped into the fit
    finally:
        os.chdir(cwd)
        if old is None:
            os.environ.pop("MMALZ_DATA_DIR", None)
        else:
            os.environ["MMALZ_DATA_DIR"] = old


def test_screen_raises_when_every_seed_diverges():
    """An all-NaN screen must raise, not silently return seed 0's init
    weights as the 'winner' (code-review r5)."""
    import pytest

    model = TabularMLP(n_classes=3, hidden=(16,))
    train = _synthetic_tabular(64, 0)
    val = _synthetic_tabular(48, 1)
    # lr 1e20: the first Adam update puts params at ~1e20, so the
    # second layer's activations overflow f32 -> inf -> NaN loss for
    # every seed from epoch 1 on
    with pytest.raises(RuntimeError, match="finite val loss"):
        screen_seeds(model, train, val, lr=1e20, batch_size=16,
                     epochs=2, class_weights=[1 / 3] * 3, seeds=(1, 2))


def test_screen_lr_select_reaches_the_update_rule():
    """lr_select plumbs through: an all-zero traced lr must leave every
    winner parameter at its init value (the frozen-group semantics the
    fast-mode entry point relies on for backbone/lr_pretrained)."""
    model = TabularMLP(n_classes=3, hidden=(16,))
    train = _synthetic_tabular(64, 0)
    val = _synthetic_tabular(48, 1)
    screen = screen_seeds(
        model, train, val, lr=3e-3, batch_size=16, epochs=2,
        class_weights=[1 / 3] * 3, seeds=(7,),
        extra_hparams={"lr_pretrained": None},
        lr_select=lambda hp_row, keys: hp_row["lr_pretrained"])
    init = model.init(
        jax.random.fold_in(jax.random.PRNGKey(5), 7),
        {k: v[:16] for k, v in train.items()}, train=False)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        screen["winner_variables"]["params"], init["params"])


def test_screen_mesh_sharded_matches_single_device():
    """The K-seed screen shards its trial axis over a mesh (one seed
    per device, zero collectives) with identical selection."""
    from multimodal_alzheimer_tpu.parallel import make_mesh

    model = TabularMLP(n_classes=3, hidden=(16, 32))
    train = _synthetic_tabular(64, 0)
    val = _synthetic_tabular(48, 1)
    kwargs = dict(lr=3e-3, batch_size=16, epochs=3,
                  class_weights=[1 / 3] * 3, seeds=tuple(range(8)))
    solo = screen_seeds(model, train, val, **kwargs)
    sharded = screen_seeds(model, train, val, mesh=make_mesh(), **kwargs)
    assert sharded["winner_seed"] == solo["winner_seed"]
    np.testing.assert_allclose(sharded["val_history"],
                               solo["val_history"], rtol=2e-5, atol=1e-6)


def test_continuation_actually_starts_from_snapshot():
    """variables_transform semantics: handing the screen winner to a
    trainer must seed the fit with those exact weights."""
    from multimodal_alzheimer_tpu.losses import make_criterion
    from multimodal_alzheimer_tpu.train import Trainer, single_lr_optimizer

    model = TabularMLP(n_classes=3, hidden=(16, 32))
    train = _synthetic_tabular(64, 0)
    val = _synthetic_tabular(48, 1)
    screen = screen_seeds(model, train, val, lr=3e-3, batch_size=16,
                          epochs=2, class_weights=[1 / 3] * 3,
                          seeds=(1, 2))
    hp = {"n_classes": 3, "lr": 1e-3, "batch_size": 16, "max_epochs": 1,
          "early_stopping_patience": 5, "loss_class_weights": None,
          "reduce_factor_lr_schedule": None}
    trainer = Trainer(model, hp, single_lr_optimizer(1e-3),
                      make_criterion(hp), logger=None,
                      log_confusion_images=False)
    example = {k: v[:16] for k, v in train.items()}
    state = trainer.init_state(
        example, lambda _: screen["winner_variables"])
    got = state.variables()["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        got, screen["winner_variables"]["params"])
