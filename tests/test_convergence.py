"""Functional quality gate: the full Trainer loop learns a separable task."""

import numpy as np

import jax.numpy as jnp

from multimodal_alzheimer_tpu.losses import make_criterion
from multimodal_alzheimer_tpu.models import SmallPETCNN
from multimodal_alzheimer_tpu.train import Trainer, single_lr_optimizer


class SeparableVolumes:
    """Synthetic learnable dataset: class k volumes have mean k."""

    def __init__(self, n=48, shape=(12, 12, 12), n_classes=3, seed=0):
        rng = np.random.default_rng(seed)
        self.labels = rng.integers(0, n_classes, n).astype(np.int32)
        self.vols = (rng.normal(size=(n,) + shape).astype(np.float32) * 0.5
                     + self.labels[:, None, None, None].astype(np.float32))

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i):
        return {"pet1451": self.vols[i], "label": self.labels[i]}


def _loader(ds, batch_size=8, shuffle=False):
    from multimodal_alzheimer_tpu.data.pipeline import DataLoader

    return DataLoader(ds, batch_size, shuffle=shuffle, num_workers=2)


def test_trainer_fit_reaches_high_f1():
    hparams = {"n_classes": 3, "conv_out": (4, 8), "filter_size": (3, 3),
               "linear_out": 16, "lr": 1e-2, "batch_size": 8,
               "max_epochs": 40, "early_stopping_patience": 40,
               "reduce_factor_lr_schedule": None,
               "loss_class_weights": None}
    model = SmallPETCNN.from_hparams(hparams)
    trainer = Trainer(model, hparams, single_lr_optimizer(hparams["lr"]),
                      make_criterion(hparams), logger=None, seed=0,
                      log_confusion_images=False)
    train_ds = SeparableVolumes(n=96, seed=0)
    val_ds = SeparableVolumes(n=24, seed=1)
    state = trainer.init_state(next(iter(_loader(train_ds))))
    state, last_val_loss = trainer.fit(
        state, _loader(train_ds, shuffle=True), _loader(val_ds))

    metrics = trainer._run_eval_epoch(state, _loader(val_ds), prefix="val")
    assert metrics["val_f1_epoch"] > 0.9, metrics
    assert last_val_loss < 0.5
