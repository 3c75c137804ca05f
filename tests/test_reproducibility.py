"""Determinism controls (SURVEY §4: the reference's seed_everything)."""

import numpy as np

import jax

from multimodal_alzheimer_tpu.losses import make_criterion
from multimodal_alzheimer_tpu.models import SmallPETCNN
from multimodal_alzheimer_tpu.train import Trainer, single_lr_optimizer

from tests.test_convergence import SeparableVolumes, _loader

HP = {"n_classes": 3, "conv_out": (4,), "filter_size": (3,),
      "linear_out": 8, "lr": 1e-3, "batch_size": 8, "max_epochs": 2,
      "early_stopping_patience": 2, "reduce_factor_lr_schedule": None,
      "loss_class_weights": None, "dropout_conv_p": 0.1}


def _fit(seed):
    model = SmallPETCNN.from_hparams(HP)
    trainer = Trainer(model, HP, single_lr_optimizer(HP["lr"]),
                      make_criterion(HP), logger=None, seed=seed,
                      log_confusion_images=False)
    train_ds = SeparableVolumes(n=24, seed=0)
    val_ds = SeparableVolumes(n=8, seed=1)
    state = trainer.init_state(next(iter(_loader(train_ds))))
    state, last = trainer.fit(state, _loader(train_ds, shuffle=True),
                              _loader(val_ds))
    return state, last


def test_same_seed_reproduces_training():
    s1, l1 = _fit(5)
    s2, l2 = _fit(5)
    assert l1 == l2
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_different_seed_differs():
    _, l1 = _fit(5)
    _, l2 = _fit(15)
    assert l1 != l2
