"""Shared training driver used by every train_<model> entry point.

Encodes the reference's per-script template once (reference:
train_pet_cnn.py:121-205): seed -> datasets/loaders -> class weights
``1 - normalized_freq`` -> model -> logger -> trainer(EarlyStopping,
2x top-k checkpoints, LR plateau) -> fit -> last val loss.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from multimodal_alzheimer_tpu.data.dataset import MultiModalDataset
from multimodal_alzheimer_tpu.data.pipeline import DataLoader
from multimodal_alzheimer_tpu.losses import make_criterion
from multimodal_alzheimer_tpu.train.logging import ExperimentLogger
from multimodal_alzheimer_tpu.train.loop import Trainer
from multimodal_alzheimer_tpu.train.optim import (
    FROZEN,
    build_optimizer,
    single_lr_optimizer,
)
from multimodal_alzheimer_tpu.utils.seeding import seed_everything


def data_csv(mode: str, data_dir: Optional[str] = None) -> str:
    """data/{mode}_path_data_labels.csv under CWD (reference layout,
    train_pet_cnn.py:143-144); override root with MMALZ_DATA_DIR."""
    root = data_dir or os.environ.get("MMALZ_DATA_DIR",
                                      os.path.join(os.getcwd(), "data"))
    return os.path.join(root, f"{mode}_path_data_labels.csv")


def binary_from_hparams(hparams: dict) -> bool:
    assert hparams["n_classes"] in (2, 3)
    return hparams["n_classes"] == 2


def build_datasets(hparams: dict, modalities, normalize_pet=None,
                   normalize_mri=None, quantile: float = 0.99,
                   data_dir: Optional[str] = None,
                   modes=("train", "val")):
    binary = binary_from_hparams(hparams)
    return tuple(
        MultiModalDataset(
            path=data_csv(mode, data_dir),
            modalities=list(modalities),
            normalize_pet=normalize_pet,
            normalize_mri=normalize_mri,
            quantile=quantile,
            binary_classification=binary,
            days_threshold=hparams.get("days_threshold", 180),
            cache_dir=hparams.get("volume_cache_dir"),
            cache_dtype=hparams.get("volume_cache_dtype"))
        for mode in modes)


def attach_class_weights(hparams: dict, trainset: MultiModalDataset) -> None:
    """hparams['loss_class_weights'] = 1 - normalized frequency
    (train_pet_cnn.py:166-168)."""
    _, weight_normalized = trainset.get_label_distribution()
    weights = 1.0 - np.nan_to_num(weight_normalized, nan=0.0)
    hparams["loss_class_weights"] = weights.tolist()
    hparams["loss_class_weights_human_readable"] = weights.tolist()


def fusion_optimizer(hparams: dict, head_names: tuple):
    """Fusion-stage optimizer groups (anat_pet_fusion.py:94-118): the new
    fusion/reduce layers train at ``lr``; loaded earlier-stage submodules
    are frozen unless ``lr_pretrained`` is set."""
    lr_pretrained = hparams.get("lr_pretrained")

    def label(path):
        if path and path[0] in head_names:
            return "head"
        return "pretrained" if lr_pretrained else FROZEN

    return build_optimizer(
        {"head": hparams["lr"],
         "pretrained": lr_pretrained if lr_pretrained else None},
        label, None, l2_reg=hparams.get("l2_reg", 0.0))


def stage1_normalizations(pet_hparams: dict = None, mri_hparams: dict = None):
    """Dataset normalization params pulled from the stage-1 checkpoints'
    hparams (train_anat_pet_fusion.py:154-171)."""
    normalize_pet = None
    normalize_mri = None
    quantile = 0.99
    if pet_hparams is not None:
        normalize_pet = {"mean": float(pet_hparams["norm_mean"]),
                         "std": float(pet_hparams["norm_std"])}
    if mri_hparams is not None:
        normalize_mri = {"per_scan_norm": "min_max"}
        quantile = float(mri_hparams.get("norm_percentile", 0.99))
    return normalize_pet, normalize_mri, quantile


def run_training(model, hparams: dict, trainset, valset,
                 experiment_name: str = "",
                 experiment_version: Optional[str] = None,
                 optimizer=None,
                 log_dir: str = "lightning_logs",
                 seed: int = 5,
                 num_workers: int = 8,
                 drop_last: bool = False,
                 variables_transform=None,
                 mesh=None):
    """Build loaders + Trainer, fit, return (trainer, state, last_val_loss)."""
    seed_everything(seed)

    train_loader = DataLoader(trainset, hparams["batch_size"], shuffle=True,
                              num_workers=num_workers, seed=seed,
                              drop_last=drop_last)
    val_loader = DataLoader(valset, hparams["batch_size"],
                            num_workers=num_workers, drop_last=drop_last)

    criterion = make_criterion(hparams)
    if optimizer is None:
        optimizer = single_lr_optimizer(hparams["lr"],
                                        hparams.get("l2_reg", 0.0))

    logger = ExperimentLogger(save_dir=log_dir, name=experiment_name,
                              version=experiment_version)
    logger.log_hparams(hparams)
    trainer = Trainer(
        model, hparams, optimizer, criterion,
        preprocess=trainset.get_device_preprocess(),
        logger=logger,
        checkpoint_dir=str(logger.log_dir / "checkpoints"),
        seed=seed, mesh=mesh)

    example = next(iter(DataLoader(trainset, hparams["batch_size"],
                                   num_workers=num_workers)))
    state = trainer.init_state(example, variables_transform)
    state, last_val_loss = trainer.fit(state, train_loader, val_loader,
                                       hparams.get("max_epochs"))
    return trainer, state, last_val_loss
