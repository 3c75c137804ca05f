from multimodal_alzheimer_tpu.train.state import (
    TrainState,
    make_train_step,
    make_eval_step,
)
from multimodal_alzheimer_tpu.train.optim import (
    adam_group,
    build_optimizer,
    single_lr_optimizer,
    head_pretrained_label_fn,
    PlateauScheduler,
    EarlyStopping,
    FROZEN,
)
from multimodal_alzheimer_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    TopKCheckpointManager,
    graft_params,
)
from multimodal_alzheimer_tpu.train.loop import Trainer
from multimodal_alzheimer_tpu.train.logging import ExperimentLogger

__all__ = [
    "TrainState", "make_train_step", "make_eval_step",
    "adam_group", "build_optimizer", "single_lr_optimizer",
    "head_pretrained_label_fn", "PlateauScheduler", "EarlyStopping",
    "FROZEN", "save_checkpoint", "load_checkpoint",
    "TopKCheckpointManager", "graft_params", "Trainer", "ExperimentLogger",
]
