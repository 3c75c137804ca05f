"""Vectorized HPO for the frozen fusion stages: shared-tower trials.

The reference's stage-2/3 searches are its most expensive HPO workloads:
every optuna trial re-trains a fusion model whose forward runs the full
stage-1 ResNet/CNN towers, 300 sequential Lightning fits per study
(reference: train_anat_pet_fusion.py:175-183). But in the *default*
frozen regime (``freeze`` sampled True => ``lr_pretrained=None``,
anat_pet_fusion.py:34-40) the towers never update — their forward
depends only on the batch, never on a trial's head parameters. So K
trials can share ONE tower forward per step and vmap only their tiny
Dense heads: the tower cost (≈all of the FLOPs) is amortized K ways.

Built on ``vmap_hpo.run_parallel_trials(shared_fn=...)``:

* ``make_shared_towers_fn`` wraps the frozen stage-1 models + checkpoint
  variables into the trial-invariant per-step computation. Tower BN
  batch_stats live in the shared carry and update in train mode exactly
  like the sequential path (input-only, hence trial-invariant); val
  batches read the running stats without advancing them.
* The fusion model itself is the vmapped head: its ``towers=`` kwarg
  skips the tower submodules entirely, so ``init`` builds only the head
  params (reduce_dim_mri/stage2out/cls2 for AnatPETFusion) and the
  per-trial Adam state is a few thousand scalars. L2 therefore decays
  only head params — bit-matching ``driver.fusion_optimizer``'s frozen
  semantics (frozen groups are ``set_to_zero`` with no weight decay).
* Unfrozen proposals (``freeze`` False) cannot share towers; the study
  driver routes those buckets to the sequential objective unchanged.

Exactness vs K sequential frozen fits: identical up to the two
divergences already documented for ``vmap_hpo`` (shared per-epoch
shuffle order, dropped ragged tail). Tower dropout would be a third —
but every reference fusion regime runs towers dropout-free
(all_modalities_fusion.py:50); a dropout rng is still threaded through
the shared carry so such a config runs (with trial-shared tower noise)
rather than crashing.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import numpy as np

from multimodal_alzheimer_tpu.train import vmap_hpo


def full_arrays(dataset) -> dict:
    """Collate an entire MultiModalDataset split into stacked host arrays
    (the whole-split device-resident layout run_parallel_trials wants)."""
    from multimodal_alzheimer_tpu.data.pipeline import DataLoader

    loader = DataLoader(dataset, len(dataset), num_workers=1,
                        device_put=False)
    return {k: np.asarray(v) for k, v in next(iter(loader)).items()}


def make_shared_towers_fn(tower_models: dict, tower_variables: dict,
                          preprocess: Optional[Callable] = None):
    """Build the trial-invariant shared_fn running the frozen towers.

    ``tower_models``: name -> flax model (e.g. {'pet': SmallPETCNN,
    'mri': AnatCNN}); ``tower_variables``: name -> that model's stage-1
    checkpoint variables. Returns ``(shared_fn, shared_carry0)`` where the
    carry is ``(dropout_key, {name: batch_stats})``.

    The returned outputs are the towers' full output dicts keyed by name —
    exactly the ``towers=`` hook shape of AnatPETFusion/AllModalitiesFusion
    — with stop_gradient applied (freeze parity; head grads never reach
    tower arrays anyway since they are closure constants, not trial params).
    """
    names = sorted(tower_models)
    carry0 = (jax.random.PRNGKey(0),
              {n: tower_variables[n].get("batch_stats", {}) for n in names})

    def shared_fn(carry, batch, train):
        key, stats = carry
        if preprocess is not None:
            batch = preprocess(batch)
        if train:
            key, step_key = jax.random.split(key)
        outs, new_stats = {}, {}
        for i, name in enumerate(names):
            model = tower_models[name]
            variables = {"params": tower_variables[name]["params"]}
            if stats[name]:
                variables["batch_stats"] = stats[name]
            if train:
                out, mutated = model.apply(
                    variables, batch, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(step_key, i)})
                new_stats[name] = mutated.get("batch_stats", stats[name])
            else:
                out = model.apply(variables, batch, train=False)
                new_stats[name] = stats[name]
            outs[name] = jax.tree_util.tree_map(jax.lax.stop_gradient, out)
        return outs, (key, new_stats)

    return shared_fn, carry0


def towers_apply_fn(model, variables, batch, hp, rng, train, shared):
    """apply_fn for fusion heads: feed the shared tower outputs through the
    model's ``towers=`` hook (head layers only run in-graph)."""
    del hp, rng
    return model.apply(variables, batch, train=train, towers=shared), {}


def towers_init_fn(model, key, example, shared_example):
    """init_fn creating only the head params (tower submodules skipped)."""
    return model.init(key, example, train=False, towers=shared_example)


def run_frozen_fusion_trials(head_model, tower_models: dict,
                             tower_variables: dict, hp: dict,
                             train_data: dict, val_data: dict, *,
                             preprocess=None, batch_size: int,
                             max_epochs: int, patience: int, class_weights,
                             seed: int = 5, mesh=None, **kwargs):
    """K frozen-fusion trials, one shared tower forward per step."""
    shared_fn, carry0 = make_shared_towers_fn(tower_models, tower_variables,
                                              preprocess)
    return vmap_hpo.run_parallel_trials(
        head_model, hp, train_data, val_data, batch_size=batch_size,
        max_epochs=max_epochs, patience=patience,
        class_weights=class_weights, seed=seed, mesh=mesh,
        apply_fn=towers_apply_fn, init_fn=towers_init_fn,
        shared_fn=shared_fn, shared_carry0=carry0, **kwargs)


def optimize_stage2_anat_pet(study, sample_hparams: Callable,
                             sequential_objective: Callable, *,
                             n_trials: int, parallel: int,
                             path_pet: str, path_mri: str,
                             n_classes: int = 3,
                             timeout: Optional[float] = None):
    """Batched-TPE study over the stage-2 PET+MRI fusion search space.

    Frozen proposals (``lr_pretrained`` None — the regime the winning
    reference configs use) vectorize through the shared-tower trainer;
    unfrozen ones fall back to ``sequential_objective(hparams) -> loss``
    one at a time (their towers train, so nothing is trial-invariant).
    """
    from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion \
        import AnatPETFusion
    from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN
    from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import (
        SmallPETCNN,
    )
    from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint
    from multimodal_alzheimer_tpu.train.driver import (
        attach_class_weights,
        build_datasets,
        stage1_normalizations,
    )

    pet_vars, pet_hp, _ = load_checkpoint(path_pet)
    mri_vars, mri_hp, _ = load_checkpoint(path_mri)
    normalize_pet, normalize_mri, quantile = stage1_normalizations(pet_hp,
                                                                   mri_hp)
    base = {"n_classes": n_classes, "path_pet": path_pet,
            "path_mri": path_mri}
    trainset, valset = build_datasets(
        base, ["pet1451", "t1w"], normalize_pet=normalize_pet,
        normalize_mri=normalize_mri, quantile=quantile)
    attach_class_weights(base, trainset)
    train_data = full_arrays(trainset)
    val_data = full_arrays(valset)
    preprocess = trainset.get_device_preprocess()

    tower_models = {"pet": SmallPETCNN.from_hparams(pet_hp),
                    "mri": AnatCNN.from_hparams(mri_hp,
                                                freeze_backbone=False)}
    tower_variables = {"pet": pet_vars, "mri": mri_vars}

    def signature(hparams):
        return (int(hparams["batch_size"]),
                hparams.get("lr_pretrained") is None)

    def batch_objective(sig, rows):
        batch_size, frozen = sig
        if not frozen:  # towers train: no shared forward exists
            return [sequential_objective(dict(base, **row)) for row in rows]
        head = AnatPETFusion.from_hparams(dict(base, lr_pretrained=None),
                                          pet_hp, mri_hp)
        hp = vmap_hpo.stack_trial_hparams(rows, pad_to=parallel)
        values, _ = run_frozen_fusion_trials(
            head, tower_models, tower_variables, hp, train_data, val_data,
            preprocess=preprocess, batch_size=batch_size,
            max_epochs=int(rows[0]["max_epochs"]),
            patience=int(rows[0]["early_stopping_patience"]),
            class_weights=base["loss_class_weights"], seed=5)
        return [float(v) for v in values[:len(rows)]]

    def sample(trial):
        return sample_hparams(trial, n_classes=n_classes, path_pet=path_pet,
                              path_mri=path_mri)

    vmap_hpo.optimize_batched(study, sample, batch_objective,
                              n_trials=n_trials, parallel=parallel,
                              signature_fn=signature, timeout=timeout)
    return study
