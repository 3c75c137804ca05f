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
import jax.numpy as jnp
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


def make_hook_fns(kwarg: str):
    """apply_fn/init_fn pair feeding the shared output through a model
    kwarg hook (``towers=`` for stage-2 heads, ``fusion_inputs=`` for the
    stage-3 head) so only head layers run — and init builds only them."""

    def apply_fn(model, variables, batch, hp, rng, train, shared):
        del hp, rng
        return model.apply(variables, batch, train=train,
                           **{kwarg: shared}), {}

    def init_fn(model, key, example, shared_example):
        return model.init(key, example, train=False,
                          **{kwarg: shared_example})

    return apply_fn, init_fn


towers_apply_fn, towers_init_fn = make_hook_fns("towers")


def make_stage3_shared_fn(sub_models: dict, sub_variables: dict,
                          preprocess: Optional[Callable] = None):
    """Trial-invariant shared_fn for the stage-3 search: run the three
    frozen stage-2 sub-models once per step and hand their fusion
    embeddings to the vmapped stage-3 heads.

    Mirrors ``AllModalitiesFusion.share_towers`` exactly (the canonical
    frozen-regime forward): anat_pet computes the pet/mri towers, its mri
    output feeds anat_tab, whose tab output feeds pet_tab — each stage-1
    tower runs once per step even inside the shared computation. BN stats
    of the canonical tower copies (and the stage-2 heads' own stats, none
    today) live in the shared carry.

    ``sub_models``/``sub_variables``: keys 'anat_pet'/'anat_tab'/'pet_tab'
    -> the standalone stage-2 models and their checkpoint variables (with
    stage-1 weights grafted beneath, train_all_modalities_fusion.py
    loading order).
    """
    names = ("anat_pet", "anat_tab", "pet_tab")
    # Copy every stats leaf: the same stage-1 tower variables are grafted
    # under two sub-models (e.g. the MRI tower sits in both anat_pet and
    # anat_tab), so without the copy the donated epoch carry would hand
    # XLA the same buffer twice ("Attempt to donate the same buffer
    # twice in Execute()"). Each sub-model tracks its own running stats,
    # matching the share_towers=False reference graph.
    carry0 = (jax.random.PRNGKey(0),
              jax.tree_util.tree_map(
                  lambda x: jnp.array(x),
                  {n: sub_variables[n].get("batch_stats", {})
                   for n in names}))

    def shared_fn(carry, batch, train):
        key, stats = carry
        if preprocess is not None:
            batch = preprocess(batch)
        step_key = None
        if train:
            key, step_key = jax.random.split(key)
        new_stats = {}

        def run(name, towers_kw, i):
            variables = {"params": sub_variables[name]["params"]}
            if stats[name]:
                variables["batch_stats"] = stats[name]
            kwargs = dict(train=train, towers=towers_kw, return_towers=True)
            if train:
                out, mutated = sub_models[name].apply(
                    variables, batch, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(step_key, i)},
                    **kwargs)
                new_stats[name] = mutated.get("batch_stats", stats[name])
            else:
                out = sub_models[name].apply(variables, batch, **kwargs)
                new_stats[name] = stats[name]
            return out

        ap = run("anat_pet", {}, 0)
        at = run("anat_tab", {"mri": ap["towers"]["mri"]}, 1)
        pt = run("pet_tab", {"pet": ap["towers"]["pet"],
                             "tab": at["towers"]["tab"]}, 2)
        outs = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            {"anat_pet": ap["embeddings"]["fusion"],
             "anat_tab": at["embeddings"]["fusion"],
             "pet_tab": pt["embeddings"]["fusion"]})
        return outs, (key, new_stats)

    return shared_fn, carry0


def run_shared_trials(head_model, shared_fn, shared_carry0, hp: dict,
                      train_data: dict, val_data: dict, *,
                      hook_kwarg: str = "towers", batch_size: int,
                      max_epochs: int, patience: int, class_weights,
                      seed: int = 5, mesh=None, **kwargs):
    """K trials of a head over a prebuilt trial-invariant shared_fn."""
    apply_fn, init_fn = make_hook_fns(hook_kwarg)
    return vmap_hpo.run_parallel_trials(
        head_model, hp, train_data, val_data, batch_size=batch_size,
        max_epochs=max_epochs, patience=patience,
        class_weights=class_weights, seed=seed, mesh=mesh,
        apply_fn=apply_fn, init_fn=init_fn,
        shared_fn=shared_fn, shared_carry0=shared_carry0, **kwargs)


def run_frozen_fusion_trials(head_model, tower_models: dict,
                             tower_variables: dict, hp: dict,
                             train_data: dict, val_data: dict, *,
                             preprocess=None, **kwargs):
    """K frozen stage-2 trials, one shared tower forward per step."""
    shared_fn, carry0 = make_shared_towers_fn(tower_models, tower_variables,
                                              preprocess)
    return run_shared_trials(head_model, shared_fn, carry0, hp, train_data,
                             val_data, hook_kwarg="towers", **kwargs)


def _optimize_fusion_study(study, sample: Callable,
                           sequential_objective: Callable, *,
                           base: dict, modalities, norm_kwargs: dict,
                           make_shared: Callable, hook_kwarg: str,
                           head_builder: Callable,
                           signature_extra: Callable = lambda hp: (),
                           n_trials: int, parallel: int,
                           timeout: Optional[float] = None):
    """Shared study driver for the fusion stages.

    Frozen proposals (``lr_pretrained`` None — the regime the winning
    reference configs use) vectorize through the shared-tower trainer;
    unfrozen ones fall back to ``sequential_objective(hparams) -> loss``
    one at a time (their towers train, so nothing is trial-invariant).
    ``head_builder(static_hparams) -> flax model`` builds the vmapped
    head for a bucket (static knobs like ``simple_dim_red`` must be in
    ``signature_extra`` so each variant compiles its own program);
    ``make_shared(preprocess) -> (shared_fn, carry0)`` builds the
    trial-invariant computation fed through ``hook_kwarg``.
    """
    from multimodal_alzheimer_tpu.train.driver import (
        attach_class_weights,
        build_datasets,
    )

    trainset, valset = build_datasets(base, modalities, **norm_kwargs)
    attach_class_weights(base, trainset)
    train_data = full_arrays(trainset)
    val_data = full_arrays(valset)
    shared_fn, shared_carry0 = make_shared(trainset.get_device_preprocess())

    def signature(hparams):
        return (hparams.get("lr_pretrained") is None,
                int(hparams["batch_size"])) + tuple(
                    signature_extra(hparams))

    def batch_objective(sig, rows):
        frozen, batch_size = sig[0], sig[1]
        if not frozen:  # towers train: no shared forward exists
            return [sequential_objective(dict(base, **row)) for row in rows]
        head = head_builder({**base, **rows[0], "lr_pretrained": None})
        hp = vmap_hpo.stack_trial_hparams(rows, pad_to=parallel)
        values, _ = run_shared_trials(
            head, shared_fn, shared_carry0, hp, train_data, val_data,
            hook_kwarg=hook_kwarg, batch_size=batch_size,
            max_epochs=int(rows[0]["max_epochs"]),
            patience=int(rows[0]["early_stopping_patience"]),
            class_weights=base["loss_class_weights"], seed=5)
        return [float(v) for v in values[:len(rows)]]

    vmap_hpo.optimize_batched(study, sample, batch_objective,
                              n_trials=n_trials, parallel=parallel,
                              signature_fn=signature, timeout=timeout)
    return study


def optimize_stage2_anat_pet(study, sample_hparams: Callable,
                             sequential_objective: Callable, *,
                             n_trials: int, parallel: int,
                             path_pet: str, path_mri: str,
                             n_classes: int = 3,
                             timeout: Optional[float] = None):
    """Batched-TPE study over the stage-2 PET+MRI fusion search space."""
    from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion \
        import AnatPETFusion
    from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN
    from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import (
        SmallPETCNN,
    )
    from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint
    from multimodal_alzheimer_tpu.train.driver import stage1_normalizations

    pet_vars, pet_hp, _ = load_checkpoint(path_pet)
    mri_vars, mri_hp, _ = load_checkpoint(path_mri)
    normalize_pet, normalize_mri, quantile = stage1_normalizations(pet_hp,
                                                                   mri_hp)
    base = {"n_classes": n_classes, "path_pet": path_pet,
            "path_mri": path_mri}
    return _optimize_fusion_study(
        study,
        lambda trial: sample_hparams(trial, n_classes=n_classes,
                                     path_pet=path_pet, path_mri=path_mri),
        sequential_objective, base=base, modalities=["pet1451", "t1w"],
        norm_kwargs=dict(normalize_pet=normalize_pet,
                         normalize_mri=normalize_mri, quantile=quantile),
        make_shared=lambda preprocess: make_shared_towers_fn(
            {"pet": SmallPETCNN.from_hparams(pet_hp),
             "mri": AnatCNN.from_hparams(mri_hp, freeze_backbone=False)},
            {"pet": pet_vars, "mri": mri_vars}, preprocess),
        hook_kwarg="towers",
        head_builder=lambda hp: AnatPETFusion.from_hparams(hp, pet_hp,
                                                           mri_hp),
        n_trials=n_trials, parallel=parallel, timeout=timeout)


def optimize_stage2_mri_tab(study, sample_hparams: Callable,
                            sequential_objective: Callable, *,
                            n_trials: int, parallel: int,
                            path_mri: str, path_tabular: str,
                            n_classes: int = 3,
                            timeout: Optional[float] = None):
    """Batched-TPE study over the stage-2 MRI+tabular fusion space."""
    from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion \
        import TabularMRIFusion
    from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN
    from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import (
        TabularMLP,
    )
    from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint
    from multimodal_alzheimer_tpu.train.driver import stage1_normalizations

    mri_vars, mri_hp, _ = load_checkpoint(path_mri)
    tab_vars, tab_hp, _ = load_checkpoint(path_tabular)
    _, normalize_mri, quantile = stage1_normalizations(None, mri_hp)
    base = {"n_classes": n_classes, "path_mri": path_mri,
            "path_tabular": path_tabular}
    return _optimize_fusion_study(
        study,
        lambda trial: sample_hparams(trial, n_classes=n_classes,
                                     path_mri=path_mri,
                                     path_tabular=path_tabular),
        sequential_objective, base=base, modalities=["tabular", "t1w"],
        norm_kwargs=dict(normalize_mri=normalize_mri, quantile=quantile),
        make_shared=lambda preprocess: make_shared_towers_fn(
            {"mri": AnatCNN.from_hparams(mri_hp, freeze_backbone=False),
             "tab": TabularMLP.from_hparams(tab_hp)},
            {"mri": mri_vars, "tab": tab_vars}, preprocess),
        hook_kwarg="towers",
        head_builder=lambda hp: TabularMRIFusion.from_hparams(hp, mri_hp,
                                                              tab_hp),
        n_trials=n_trials, parallel=parallel, timeout=timeout)


def optimize_stage2_pet_tab(study, sample_hparams: Callable,
                            sequential_objective: Callable, *,
                            n_trials: int, parallel: int,
                            path_pet: str, path_tabular: str,
                            n_classes: int = 2,
                            timeout: Optional[float] = None):
    """Batched-TPE study over the stage-2 PET+tabular fusion space.

    ``simple_dim_red`` is a static head-arch knob, so it joins the bucket
    signature (one compiled program per variant)."""
    from multimodal_alzheimer_tpu.models.fusion_models.pet_tabular_fusion \
        import PETTabularFusion
    from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import (
        SmallPETCNN,
    )
    from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import (
        TabularMLP,
    )
    from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint
    from multimodal_alzheimer_tpu.train.driver import stage1_normalizations

    pet_vars, pet_hp, _ = load_checkpoint(path_pet)
    tab_vars, tab_hp, _ = load_checkpoint(path_tabular)
    normalize_pet, _, _ = stage1_normalizations(pet_hp, None)
    base = {"n_classes": n_classes, "path_pet": path_pet,
            "path_tabular": path_tabular}
    return _optimize_fusion_study(
        study,
        lambda trial: sample_hparams(trial, n_classes=n_classes,
                                     path_pet=path_pet,
                                     path_tabular=path_tabular),
        sequential_objective, base=base, modalities=["pet1451", "tabular"],
        norm_kwargs=dict(normalize_pet=normalize_pet),
        make_shared=lambda preprocess: make_shared_towers_fn(
            {"pet": SmallPETCNN.from_hparams(pet_hp),
             "tab": TabularMLP.from_hparams(tab_hp)},
            {"pet": pet_vars, "tab": tab_vars}, preprocess),
        hook_kwarg="towers",
        head_builder=lambda hp: PETTabularFusion.from_hparams(hp, pet_hp,
                                                              tab_hp),
        signature_extra=lambda hp: (bool(hp.get("simple_dim_red")),),
        n_trials=n_trials, parallel=parallel, timeout=timeout)


def optimize_stage3_all_modalities(study, sample_hparams: Callable,
                                   sequential_objective: Callable, *,
                                   n_trials: int, parallel: int,
                                   path_pet: str, path_mri: str,
                                   path_tabular: str, path_anat_pet: str,
                                   path_anat_tab: str, path_pet_tab: str,
                                   n_classes: int = 3,
                                   timeout: Optional[float] = None):
    """Batched-TPE study over the stage-3 all-modalities fusion space.

    Frozen proposals vectorize through ``make_stage3_shared_fn`` — ONE
    pass through all three frozen stage-2 sub-models (stage-1 towers
    shared across them, the ``share_towers`` forward) feeds K vmapped
    stage-3 heads via the ``fusion_inputs`` hook. The per-trial state is
    just stage3out/cls3 (a few thousand scalars), so the entire stage-3
    search costs barely more than one trial's tower compute.
    """
    from multimodal_alzheimer_tpu.models.fusion_models.all_modalities_fusion \
        import AllModalitiesFusion
    from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion \
        import AnatPETFusion
    from multimodal_alzheimer_tpu.models.fusion_models.pet_tabular_fusion \
        import PETTabularFusion
    from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion \
        import TabularMRIFusion
    from multimodal_alzheimer_tpu.train.checkpoint import (
        graft_params,
        load_checkpoint,
    )
    from multimodal_alzheimer_tpu.train.driver import stage1_normalizations

    pet_vars, pet_hp, _ = load_checkpoint(path_pet)
    mri_vars, mri_hp, _ = load_checkpoint(path_mri)
    tab_vars, tab_hp, _ = load_checkpoint(path_tabular)
    ap_vars, ap_hp, _ = load_checkpoint(path_anat_pet)
    at_vars, at_hp, _ = load_checkpoint(path_anat_tab)
    pt_vars, pt_hp, _ = load_checkpoint(path_pet_tab)

    normalize_pet, normalize_mri, quantile = stage1_normalizations(pet_hp,
                                                                   mri_hp)
    paths = {"path_pet": path_pet, "path_mri": path_mri,
             "path_tabular": path_tabular, "path_anat_pet": path_anat_pet,
             "path_anat_tab": path_anat_tab, "path_pet_tab": path_pet_tab}
    base = dict({"n_classes": n_classes}, **paths)

    # Standalone stage-2 sub-models + two-level grafted variables
    # (train_all_modalities_fusion.py loading order: stage-2 weights,
    # then stage-1 re-grafted beneath).
    sub_models = {
        "anat_pet": AnatPETFusion.from_hparams(ap_hp, pet_hp, mri_hp),
        "anat_tab": TabularMRIFusion.from_hparams(at_hp, mri_hp, tab_hp),
        "pet_tab": PETTabularFusion.from_hparams(pt_hp, pet_hp, tab_hp),
    }
    sub_variables = {
        "anat_pet": graft_params(ap_vars, {"pet_model": pet_vars,
                                           "mri_model": mri_vars}),
        "anat_tab": graft_params(at_vars, {"mri_model": mri_vars,
                                           "tab_model": tab_vars}),
        "pet_tab": graft_params(pt_vars, {"pet_model": pet_vars,
                                          "tab_model": tab_vars}),
    }

    def head_builder(hp):
        return AllModalitiesFusion.from_hparams(hp, ap_hp, at_hp, pt_hp,
                                                pet_hp, mri_hp, tab_hp)

    return _optimize_fusion_study(
        study,
        lambda trial: sample_hparams(trial, n_classes=n_classes, **paths),
        sequential_objective, base=base,
        modalities=["pet1451", "t1w", "tabular"],
        norm_kwargs=dict(normalize_pet=normalize_pet,
                         normalize_mri=normalize_mri, quantile=quantile),
        make_shared=lambda preprocess: make_stage3_shared_fn(
            sub_models, sub_variables, preprocess),
        hook_kwarg="fusion_inputs", head_builder=head_builder,
        n_trials=n_trials, parallel=parallel, timeout=timeout)
