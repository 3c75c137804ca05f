"""The training loop (Lightning Trainer replacement).

Reproduces the reference training template (reference:
train_pet_cnn.py:121-205): epoch loop with train + validation phases,
per-epoch macro/per-class F1 + loss epoch metrics, TensorBoard logging
with confusion-matrix images, EarlyStopping on ``val_loss_epoch``, two
top-k checkpoint managers (val_loss min / val_f1 max), ReduceLROnPlateau
monitoring ``val_loss_epoch``, and a ``val_loss`` history whose last entry
is the HPO objective (ValidationLossTracker, train_pet_cnn.py:17-29).

Test/evaluation adds bootstrap F1 and MCC with CIs and saves three
confusion-matrix PNG variants (base_model.py:135-217).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_alzheimer_tpu.metrics.bootstrap import bootstrap_metric
from multimodal_alzheimer_tpu.metrics.classification import (
    confusion_matrix,
    epoch_metrics,
    f1_macro,
    matthews_corrcoef,
    predictions_from_logits,
)
from multimodal_alzheimer_tpu.train.checkpoint import (
    TopKCheckpointManager,
    sync_tower_duplicates,
)
from multimodal_alzheimer_tpu.train.logging import ExperimentLogger
from multimodal_alzheimer_tpu.train.optim import EarlyStopping, PlateauScheduler
from multimodal_alzheimer_tpu.train.state import (
    TrainState,
    make_eval_step,
    make_train_step,
)

LABEL_NAMES = {2: {"CN": 0, "AD": 1}, 3: {"CN": 0, "MCI": 1, "AD": 2}}


class _HostAccumulator:
    """Bounded device->host offload of per-step outputs.

    Keeps at most ``window`` step outputs live on device, converting them
    to numpy in batches. Per-step conversion would force a host sync every
    step and stall async dispatch (measured: deferring syncs restored
    ~322 vol/s, commit 08ec718); buffering the whole epoch (the round-1
    design) is fine at ADNI scale (~2k samples) but grows device memory
    without bound — this is the scalable middle: one sync per ``window``
    steps, O(window) device buffers.
    """

    def __init__(self, window: int = 32):
        self.window = max(1, int(window))
        self._pending: list = []
        self._host: list[np.ndarray] = []

    def append(self, arr) -> None:
        self._pending.append(arr)
        if len(self._pending) >= self.window:
            self.flush()

    def flush(self) -> None:
        self._host.extend(np.asarray(a) for a in self._pending)
        self._pending.clear()

    def values(self) -> list:
        """Flat list of host copies (for scalars)."""
        self.flush()
        return self._host

    def concatenated(self) -> np.ndarray:
        self.flush()
        return np.concatenate(self._host)


class Trainer:
    def __init__(self,
                 model,
                 hparams: dict,
                 optimizer=None,
                 criterion: Callable = None,
                 preprocess: Optional[Callable] = None,
                 logger: Optional[ExperimentLogger] = None,
                 checkpoint_dir: Optional[str] = None,
                 seed: int = 5,
                 log_confusion_images: bool = True,
                 mesh=None):
        self.model = model
        self.hparams = dict(hparams)
        self.optimizer = optimizer
        self.criterion = criterion
        self.preprocess = preprocess
        self.logger = logger
        self.n_classes = hparams["n_classes"]
        self.label_ind_by_names = LABEL_NAMES[self.n_classes]
        self.log_confusion_images = log_confusion_images
        # Data parallelism: with a mesh, state is replicated and every
        # batch is sharded on the 'data' axis; XLA inserts the gradient
        # all-reduce over ICI (parallel/mesh.py).
        self.mesh = mesh

        self.train_step = (make_train_step(model, criterion, optimizer,
                                           preprocess)
                           if optimizer is not None else None)
        self.eval_step = make_eval_step(model, criterion, preprocess)

        self.root_rng = jax.random.PRNGKey(seed)
        self.val_loss_history: list[float] = []
        self.ckpt_managers = []
        if checkpoint_dir is not None:
            k = int(hparams.get("best_k_checkpoints", 3))
            self.ckpt_managers = [
                TopKCheckpointManager(checkpoint_dir, "val_loss_epoch",
                                      "min", k, filename_metric="val_loss"),
                TopKCheckpointManager(checkpoint_dir, "val_f1_epoch",
                                      "max", k, filename_metric="val_f1"),
            ]

    # ------------------------------------------------------------------ #

    def init_state(self, example_batch: dict,
                   variables_transform=None) -> TrainState:
        """Init params from an example batch. ``variables_transform`` hooks
        pretrained grafting (checkpoint.graft_params) between init and
        optimizer-state creation — the reference's load_from_checkpoint +
        module-surgery moment (anat_pet_fusion.py:16-32)."""
        init_rng, self.root_rng = jax.random.split(self.root_rng)
        batch = (self.preprocess(example_batch) if self.preprocess
                 else example_batch)
        variables = self.model.init(init_rng, batch, train=False)
        if variables_transform is not None:
            variables = variables_transform(variables)
        state = TrainState.create(variables, self.optimizer)
        if self.mesh is not None:
            from multimodal_alzheimer_tpu.parallel import replicate

            state = replicate(state, self.mesh)
        return state

    def _place(self, batch: dict) -> dict:
        if self.mesh is None:
            return batch
        from multimodal_alzheimer_tpu.parallel import (
            replicate,
            shard_batch,
        )

        n = int(next(iter(batch.values())).shape[0])
        if n % self.mesh.devices.size == 0:
            return shard_batch(batch, self.mesh)
        # Ragged tail batch: replicate instead of shard — every device
        # computes the full batch redundantly, results stay exact (one
        # extra jit specialization; no padding-induced metric skew).
        return replicate(batch, self.mesh)

    def fit(self, state: TrainState, train_loader, val_loader,
            max_epochs: Optional[int] = None) -> tuple[TrainState, float]:
        """Runs the epoch loop; returns (state, last val loss) — the same
        objective value the reference returns to optuna
        (train_pet_cnn.py:204-205)."""
        max_epochs = max_epochs or self.hparams.get("max_epochs", 20)
        patience = self.hparams.get("early_stopping_patience", 5)
        early_stopping = EarlyStopping(patience)
        plateau = None
        if self.hparams.get("reduce_factor_lr_schedule"):
            plateau = PlateauScheduler(
                factor=float(self.hparams["reduce_factor_lr_schedule"]))

        for epoch in range(max_epochs):
            t0 = time.time()
            state, train_metrics, n_train = self._run_train_epoch(
                state, train_loader)
            val_metrics = self._run_eval_epoch(state, val_loader,
                                               prefix="val")
            self.val_loss_history.append(val_metrics["val_loss_epoch"])

            scalars = {**train_metrics, **val_metrics,
                       "epoch_time_s": time.time() - t0,
                       "train_volumes_per_s":
                           n_train / max(time.time() - t0, 1e-9),
                       "lr_scale": float(state.lr_scale),
                       "step": float(epoch)}
            if self.logger is not None:
                self.logger.log_scalars(scalars, epoch)

            if self.ckpt_managers:
                variables = state.variables()
                if getattr(self.model, "share_towers", False):
                    # the shared forward only updates the canonical
                    # towers' BN stats; saved checkpoints mirror them to
                    # the duplicates so they stay bit-identical to the
                    # unshared (reference) regime's checkpoints
                    variables = sync_tower_duplicates(variables)
                for manager in self.ckpt_managers:
                    manager.consider(epoch, val_metrics, variables,
                                     self.hparams)

            if plateau is not None:
                scale = plateau.step(val_metrics["val_loss_epoch"])
                state = state.replace(
                    lr_scale=jnp.asarray(scale, jnp.float32))
            if early_stopping.step(val_metrics["val_loss_epoch"]):
                break

        return state, self.val_loss_history[-1]

    # ------------------------------------------------------------------ #

    def _run_train_epoch(self, state, loader):
        # Bounded host offload (window of device futures, np copies every
        # N steps — see _HostAccumulator; per-array copies also tolerate
        # the mixed shardings of sharded full batches vs replicated tails)
        window = int(self.hparams.get("host_offload_every", 32))
        losses = _HostAccumulator(window)
        all_logits = _HostAccumulator(window)
        all_labels = _HostAccumulator(window)
        n_samples = 0
        for batch in loader:
            step_rng, self.root_rng = jax.random.split(self.root_rng)
            state, aux = self.train_step(state, self._place(batch),
                                         step_rng)
            losses.append(aux["loss"])
            all_logits.append(aux["logits"])
            all_labels.append(aux["labels"])
            n_samples += int(aux["labels"].shape[0])
        losses = [float(l) for l in losses.values()]
        logits = jnp.asarray(all_logits.concatenated())
        labels = jnp.asarray(all_labels.concatenated())
        m = epoch_metrics(logits, labels, self.n_classes)
        scalars = {
            "train_loss_epoch": float(np.mean(losses)),
            "train_f1_epoch": float(m["f1"]),
        }
        for i in range(self.n_classes):
            scalars[f"train_f1_epoch_class_{i}"] = float(m[f"f1_class_{i}"])
        self._log_confusion("train_confusion_matrix", logits, labels)
        return state, scalars, n_samples

    def _run_eval_epoch(self, state, loader, prefix: str = "val"):
        variables = state.variables() if isinstance(state, TrainState) \
            else state
        window = int(self.hparams.get("host_offload_every", 32))
        losses = _HostAccumulator(window)
        all_logits = _HostAccumulator(window)
        all_labels = _HostAccumulator(window)
        for batch in loader:
            aux = self.eval_step(variables, self._place(batch))
            losses.append(aux["loss"])
            all_logits.append(aux["logits"])
            all_labels.append(aux["labels"])
        losses = [float(l) for l in losses.values()]
        logits = jnp.asarray(all_logits.concatenated())
        labels = jnp.asarray(all_labels.concatenated())
        m = epoch_metrics(logits, labels, self.n_classes)
        # Lightning averages the per-batch losses (unweighted mean over
        # batches, base_model.py:113-115)
        scalars = {
            f"{prefix}_loss_epoch": float(np.mean(losses)),
            f"{prefix}_f1_epoch": float(m["f1"]),
        }
        for i in range(self.n_classes):
            scalars[f"{prefix}_f1_epoch_class_{i}"] = \
                float(m[f"f1_class_{i}"])
        self._log_confusion(f"{prefix}_confusion_matrix", logits, labels)
        self._last_eval = {"logits": logits, "labels": labels}
        return scalars

    def test(self, state, test_loader, out_dir: Optional[str] = None,
             n_bootstrap: int = 1000) -> dict:
        """Full test protocol: epoch metrics + bootstrap F1/MCC CIs + the
        three confusion-matrix PNGs (base_model.py:135-217)."""
        scalars = self._run_eval_epoch(state, test_loader, prefix="test")
        logits = self._last_eval["logits"]
        labels = self._last_eval["labels"]

        boot_rng, self.root_rng = jax.random.split(self.root_rng)
        f1_mean, f1_ci = bootstrap_metric(f1_macro, logits, labels,
                                          self.n_classes, boot_rng,
                                          n_bootstrap)
        mcc_rng, self.root_rng = jax.random.split(self.root_rng)
        mcc_mean, mcc_ci = bootstrap_metric(matthews_corrcoef, logits,
                                            labels, self.n_classes,
                                            mcc_rng, n_bootstrap)
        scalars.update({
            "test_f1_epoch_boot": float(f1_mean),
            "test_f1_epoch_ci": float(f1_ci),
            "test_mcc_epoch_boot": float(mcc_mean),
            "test_mcc_epoch_ci": float(mcc_ci),
        })
        if out_dir is None and self.logger is not None:
            out_dir = str(self.logger.log_dir)
        if out_dir is not None:
            from multimodal_alzheimer_tpu.metrics.confusion_plot import (
                save_confusion_matrix_pngs,
            )

            preds = predictions_from_logits(logits)
            cm = np.asarray(confusion_matrix(preds, labels, self.n_classes))
            save_confusion_matrix_pngs(cm, self.label_ind_by_names, out_dir)
        if self.logger is not None:
            self.logger.log_scalars(scalars, 0)
        return scalars

    def _log_confusion(self, tag: str, logits, labels) -> None:
        if self.logger is None or not self.log_confusion_images:
            return
        from multimodal_alzheimer_tpu.metrics.confusion_plot import (
            confusion_matrix_image,
        )

        preds = predictions_from_logits(logits)
        cm = np.asarray(confusion_matrix(preds, labels, self.n_classes))
        image = confusion_matrix_image(cm, self.label_ind_by_names)
        self.logger.log_image(tag, image, 0)
