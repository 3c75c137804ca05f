"""Shared evaluation harness (reference pkg/utils/test.py parity).

``evaluate(...)`` seeds, builds the test loader from the checkpoint's
batch_size, runs the full test protocol (epoch metrics + bootstrap F1/MCC
CIs + 3 confusion-matrix PNGs) and logs under
``lightning_logs/<experiment_name>`` (reference: test.py:6-38,
base_model.py:135-217).

Reference quirk reproduced: every test set is built with ALL THREE
modalities regardless of the model (test_pet_cnn.py:17 etc.), so all
models are scored on the same fully-paired triple test samples.
"""

from __future__ import annotations

from typing import Optional

from multimodal_alzheimer_tpu.data.dataset import MultiModalDataset
from multimodal_alzheimer_tpu.data.pipeline import DataLoader
from multimodal_alzheimer_tpu.losses import make_criterion
from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint
from multimodal_alzheimer_tpu.train.logging import ExperimentLogger
from multimodal_alzheimer_tpu.train.loop import Trainer
from multimodal_alzheimer_tpu.utils.path_config import load_path_config
from multimodal_alzheimer_tpu.utils.seeding import seed_everything

ALL_MODALITIES = ["pet1451", "t1w", "tabular"]


def build_testset(hparams: dict, normalize_pet=None, normalize_mri=None,
                  quantile: float = 0.99,
                  test_csv: Optional[str] = None) -> MultiModalDataset:
    if test_csv is None:
        test_csv = str(load_path_config()["test_set_csv"])
    return MultiModalDataset(
        path=test_csv,
        modalities=list(ALL_MODALITIES),
        normalize_pet=normalize_pet,
        normalize_mri=normalize_mri,
        quantile=quantile,
        binary_classification=hparams["n_classes"] == 2)


def evaluate(model, variables: dict, hparams: dict,
             testset: MultiModalDataset, experiment_name: str,
             num_workers: int = 8) -> dict:
    seed_everything(5)
    loader = DataLoader(testset, hparams["batch_size"],
                        num_workers=num_workers)
    logger = ExperimentLogger(save_dir="lightning_logs",
                              name=experiment_name)
    trainer = Trainer(model, hparams, criterion=make_criterion(hparams),
                      preprocess=testset.get_device_preprocess(),
                      logger=logger, seed=5)
    metrics = trainer.test(variables, loader)
    logger.close()
    return metrics


def evaluate_checkpoint(model_cls_from_hparams, checkpoint_path: str,
                        experiment_name: str,
                        normalization_from=None, **kwargs) -> dict:
    """Load a checkpoint, rebuild the model from embedded hparams, run the
    test protocol. ``normalization_from`` optionally maps hparams -> (pet,
    mri, quantile) normalization configs."""
    variables, hparams, _ = load_checkpoint(checkpoint_path)
    model = model_cls_from_hparams(hparams)
    normalize_pet = normalize_mri = None
    quantile = 0.99
    if normalization_from is not None:
        normalize_pet, normalize_mri, quantile = normalization_from(hparams)
    testset = build_testset(hparams, normalize_pet, normalize_mri, quantile,
                            kwargs.get("test_csv"))
    return evaluate(model, variables, hparams, testset, experiment_name)
