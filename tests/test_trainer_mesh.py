"""Trainer.fit over the 8-device mesh: learns, handles ragged tails."""

import numpy as np

from multimodal_alzheimer_tpu.losses import make_criterion
from multimodal_alzheimer_tpu.models import SmallPETCNN
from multimodal_alzheimer_tpu.parallel import make_mesh
from multimodal_alzheimer_tpu.train import Trainer, single_lr_optimizer

from tests.test_convergence import SeparableVolumes, _loader


def test_trainer_fit_with_mesh():
    hparams = {"n_classes": 3, "conv_out": (4, 8), "filter_size": (3, 3),
               "linear_out": 16, "lr": 1e-2, "batch_size": 16,
               "max_epochs": 8, "early_stopping_patience": 8,
               "reduce_factor_lr_schedule": None,
               "loss_class_weights": None, "batchnorm": True}
    model = SmallPETCNN.from_hparams(hparams)
    trainer = Trainer(model, hparams, single_lr_optimizer(hparams["lr"]),
                      make_criterion(hparams), logger=None, seed=0,
                      log_confusion_images=False, mesh=make_mesh())
    # 44 samples / batch 16 -> tail batch of 12 (not divisible by 8):
    # exercises the replicate-fallback path.
    train_ds = SeparableVolumes(n=44, seed=0)
    val_ds = SeparableVolumes(n=20, seed=1)
    state = trainer.init_state(next(iter(_loader(train_ds, 16))))
    state, last_val_loss = trainer.fit(
        state, _loader(train_ds, 16, shuffle=True), _loader(val_ds, 16))
    assert np.isfinite(last_val_loss)
    assert len(trainer.val_loss_history) >= 1
    metrics = trainer._run_eval_epoch(state, _loader(val_ds, 16), "val")
    assert metrics["val_f1_epoch"] > 0.5
