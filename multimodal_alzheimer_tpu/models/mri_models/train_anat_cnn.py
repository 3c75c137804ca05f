"""Train the MRI Med3D-ResNet classifier (reference train_anat_cnn.py).

Search space parity (reference: mri_models/train_anat_cnn.py:54-140):
lr log [1e-5, 1e-2], freeze-vs-lr_pretrained log [1e-7, 1e-5], per-scan
quantile min-max with q in {0.95, 0.98, 0.99, 1}, resnet depth in
{10, 18, 50}, l2 in {0, 1e-1, 1e-2, 1e-3}, linear-block shape generator,
fl_gamma in {None, 1, 2, 5}, seed 15.

Optimizer groups mirror anat_cnn.py:111-126: head params ('head' submodule)
at lr, backbone frozen or at lr_pretrained.
"""

from __future__ import annotations

from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN
from multimodal_alzheimer_tpu.train import hpo
from multimodal_alzheimer_tpu.train.driver import (
    attach_class_weights,
    build_datasets,
    run_training,
)
from multimodal_alzheimer_tpu.train.optim import (
    FROZEN,
    build_optimizer,
)

LOG_DIRECTORY = "lightning_logs"
EXPERIMENT_NAME = "optuna_mri"
EXPERIMENT_VERSION = None
SEED = 15


def generate_linear_block_options(first_layer_options, n_layers_options):
    """Dense-block shapes (train_anat_cnn.py:67-90)."""
    dense_out_options = []
    for x in first_layer_options:
        for n in n_layers_options:
            dense_out_options.append(tuple(x for _ in range(n)))
            dense_out_options.append(tuple(int(x / 2 ** i)
                                           for i in range(n)))
    return dense_out_options


def sample_hparams(trial, n_classes: int = 2) -> dict:
    hparams = {
        "early_stopping_patience": 5,
        "max_epochs": 20,
        "n_classes": n_classes,
        "reduce_factor_lr_schedule": None,
        "best_k_checkpoints": 3,
    }
    dense_options = {str(o): o for o in
                     generate_linear_block_options([256, 128, 64], [0, 3])}

    hparams["lr"] = trial.suggest_float("lr", 1e-5, 1e-2, log=True)
    freeze = trial.suggest_categorical("freeze", (True, False))
    hparams["lr_pretrained"] = (None if freeze else trial.suggest_float(
        "lr_pretrained", 1e-7, 1e-5, log=True))
    hparams["conv_out"] = []
    hparams["filter_size"] = []
    hparams["batchnorm_begin"] = trial.suggest_categorical(
        "batchnorm_begin", (True, False))
    hparams["batchnorm_dense"] = trial.suggest_categorical(
        "batchnorm_dense", (True, False))
    hparams["batch_size"] = trial.suggest_categorical("batch_size",
                                                      (8, 16, 32, 64))
    if hparams["batch_size"] >= 64:
        hparams["early_stopping_patience"] = 10
        hparams["max_epochs"] = 50
    hparams["l2_reg"] = trial.suggest_categorical(
        "l2_reg", (0, 1e-1, 1e-2, 1e-3))
    hparams["norm_percentile"] = trial.suggest_categorical(
        "norm_percentile", (0.95, 0.98, 0.99, 1))
    hparams["fl_gamma"] = trial.suggest_categorical("fl_gamma",
                                                    (None, 1, 2, 5))
    hparams["resnet_depth"] = trial.suggest_categorical("resnet_depth",
                                                        (10, 18, 50))
    dense_idx = trial.suggest_categorical("linear_out",
                                          list(dense_options))
    hparams["linear_out"] = dense_options[dense_idx]
    return hparams


def percentile_normalizer(dataset, raw_train: dict, raw_val: dict):
    """Per-bucket renormalization of collated raw splits at a searched q.

    Returns ``normalized(q) -> (train_data, val_data)`` for the vectorized
    HPO path. Two properties matter:

    * The memoized ``mri_qminmax`` sidecars in the collated arrays were
      computed at the dataset's *build-time* quantile and the device
      preprocess prefers them over a fresh selection (dataset.py) — they
      are stripped here so the searched ``norm_percentile`` is actually
      honored (one full quantile selection per bucket, not per step, so
      the memo would buy nothing on this path anyway).
    * One percentile is kept resident at a time (4 x ~GB splits would not
      all fit in HBM); consecutive same-q buckets and later ask-rounds
      reuse it instead of re-jitting + renormalizing the whole split.
    """
    import jax

    raw_train = dict(raw_train)
    raw_val = dict(raw_val)
    raw_train.pop("mri_qminmax", None)
    raw_val.pop("mri_qminmax", None)
    cache: dict = {}

    def normalized(q):
        if q not in cache:
            cache.clear()
            dataset.quantile = q  # read at closure-build time below
            pre = jax.jit(dataset.get_device_preprocess())
            cache[q] = (pre(raw_train), pre(raw_val))
        return cache[q]

    return normalized


def backbone_head_optimizer(hparams: dict, params):
    """Head at lr; backbone frozen or at lr_pretrained
    (anat_cnn.py:111-126)."""
    lr_pretrained = hparams.get("lr_pretrained")

    def label(path):
        if path and path[0] == "head":
            return "head"
        return "pretrained" if lr_pretrained else FROZEN

    return build_optimizer(
        {"head": hparams["lr"],
         "pretrained": lr_pretrained if lr_pretrained else None},
        label, params, l2_reg=hparams.get("l2_reg", 0.0))


def train_anat(hparams: dict, experiment_name: str = "",
               experiment_version=None):
    trainset, valset = build_datasets(
        hparams, ["t1w"],
        normalize_mri={"per_scan_norm": "min_max"},
        quantile=hparams["norm_percentile"])
    attach_class_weights(hparams, trainset)
    model = AnatCNN.from_hparams(hparams)
    optimizer = backbone_head_optimizer(hparams, None)

    _, _, last_val_loss = run_training(
        model, hparams, trainset, valset,
        experiment_name=experiment_name,
        experiment_version=experiment_version,
        optimizer=optimizer, log_dir=LOG_DIRECTORY, seed=SEED)
    return last_val_loss


def train_anat_fast(hparams: dict, experiment_name: str = "",
                    experiment_version=None, screen_k: int = 8,
                    screen_epochs: int = 3, screen_batch=None,
                    **model_kwargs):
    """Fast-mode (strided, ``dilated=False``) MRI training with a K-seed
    screen (VERDICT r4 #2).

    The strided backbone trains ~2.8x faster than Med3D-dilated parity
    but from-scratch quick fits are seed-bimodal (BASELINE.md fast-mode
    study). Remedy: fit ``screen_k`` init seeds of this exact config as
    ONE vmapped program for ``screen_epochs`` epochs (costs about one
    fit at batch K*b — train/seed_screen.py), then continue the regular
    checkpointed fit from the winning seed's best-epoch snapshot. The
    screen epochs are not wasted: the continuation starts from the
    winner's weights, not a re-init.

    ``screen_batch`` (default: the config's batch size) sizes the
    per-seed screen batch — HBM sees the K seeds like ONE batch of
    ``screen_k * screen_batch`` volumes (CLAUDE.md: K=8 x b=16 of a
    91^3 depth-18 full-model fit OOMs a v5e; 8 x 8 fits), so shrink it
    when K * batch exceeds the single-fit sweet spot. Seed ranking is
    batch-size-robust (same data, same epochs for every seed).

    Returns ``(last_val_loss, screen)`` where ``screen`` carries the
    per-seed val history + screen/fit wall clocks for the run log.
    """
    from multimodal_alzheimer_tpu.train.fusion_hpo import full_arrays
    from multimodal_alzheimer_tpu.train.seed_screen import screen_seeds

    trainset, valset = build_datasets(
        hparams, ["t1w"],
        normalize_mri={"per_scan_norm": "min_max"},
        quantile=hparams["norm_percentile"])
    attach_class_weights(hparams, trainset)
    # trailing_relu defaults OFF here: the parity quirk's clamped-logit
    # dead gradients collapse quick fits to argmax-class-0 with a
    # deceptively fine val loss (CLAUDE.md) — which would corrupt the
    # argmin-val seed selection this entry point exists for. Fast mode
    # is already a beyond-parity performance mode; pass
    # ``trailing_relu=True`` explicitly to keep the quirk.
    model_kwargs.setdefault("trailing_relu", False)
    # bf16 compute by default: this entry point IS the performance mode
    # (f32 at 91^3 roughly doubles activation memory — the K-seed screen
    # then OOMs at K*batch sizes the bf16 flagship handles fine).
    import jax.numpy as jnp

    model_kwargs.setdefault("dtype", jnp.bfloat16)
    # Screen model: freeze_backbone=False so one vmapped program serves
    # frozen and unfrozen regimes via lr_select's traced-0.0 (exactly
    # the optuna parallel path's construction). The continuation below
    # rebuilds with the default derivation — the frozen regime then
    # gets the faster stop_gradient graph; identical parameter tree.
    model = AnatCNN.from_hparams(hparams, dilated=False,
                                 freeze_backbone=False, **model_kwargs)

    # whole-split device-resident screen (the vmap-HPO data layout);
    # normalization runs once on device, shared by all K seeds
    import jax

    pre = jax.jit(trainset.get_device_preprocess())
    train_data = pre(full_arrays(trainset))
    val_data = pre(full_arrays(valset))

    def lr_select(hp_row, keys):
        # backbone_head_optimizer parity (the continuation's regime):
        # 'head' at lr, backbone at lr_pretrained (traced 0.0 == frozen)
        return (hp_row["lr"] if keys and keys[0] == "head"
                else hp_row["lr_pretrained"])

    import time

    t0 = time.perf_counter()
    screen = screen_seeds(
        model, train_data, val_data, lr=hparams["lr"],
        batch_size=int(screen_batch or hparams["batch_size"]),
        epochs=screen_epochs,
        class_weights=hparams["loss_class_weights"],
        seeds=tuple(range(screen_k)),
        l2_reg=hparams.get("l2_reg", 0.0) or 0.0,
        fl_gamma=hparams.get("fl_gamma"), base_seed=SEED,
        extra_hparams={"lr_pretrained": hparams.get("lr_pretrained")},
        lr_select=lr_select)
    screen["screen_wall_s"] = round(time.perf_counter() - t0, 1)
    winner_variables = screen.pop("winner_variables")

    fit_model = AnatCNN.from_hparams(hparams, dilated=False,
                                     **model_kwargs)
    optimizer = backbone_head_optimizer(hparams, None)
    t0 = time.perf_counter()
    _, _, last_val_loss = run_training(
        fit_model, hparams, trainset, valset,
        experiment_name=experiment_name,
        experiment_version=experiment_version,
        optimizer=optimizer, log_dir=LOG_DIRECTORY, seed=SEED,
        variables_transform=lambda _: winner_variables)
    screen["fit_wall_s"] = round(time.perf_counter() - t0, 1)
    return last_val_loss, screen


@hpo.oom_guard
def _objective(trial):
    hparams = sample_hparams(trial)
    return train_anat(hparams, EXPERIMENT_NAME, EXPERIMENT_VERSION)


def optuna_optimization(n_trials: int = 300, timeout: float = 86400,
                        parallel: int = 0):
    """HPO entry point. ``parallel=K`` switches to the vectorized searcher
    (train/vmap_hpo.py). Static signature: resnet depth, dense-block
    shape, batchnorm flags, batch size (+ its epoch-budget bump) and
    ``norm_percentile`` — the one *preprocessing* knob, handled by
    normalizing the raw split on device once per bucket (the quantile
    min-max is deterministic and trial-invariant given q). Traced knobs:
    lr, l2, focal gamma, and ``lr_pretrained`` via the two-group
    ``lr_select`` hook — frozen proposals trace backbone lr 0.0, which
    reproduces the sequential path's optimizer-side freezing exactly (the
    model builds with ``freeze_backbone=False`` so one program serves
    frozen and unfrozen trials in the same bucket).
    """
    study = hpo.create_study(direction="minimize")
    if parallel and parallel > 1:
        from multimodal_alzheimer_tpu.train import vmap_hpo
        from multimodal_alzheimer_tpu.train.fusion_hpo import full_arrays

        base = {"n_classes": 2}
        trainset, valset = build_datasets(
            base, ["t1w"], normalize_mri={"per_scan_norm": "min_max"},
            quantile=0.99)
        attach_class_weights(base, trainset)
        # Raw volumes + masks stay host-side; each bucket normalizes its
        # own device copy (4 possible percentiles x ~GB splits would not
        # all fit in HBM, and the min-max pass is one cheap kernel).
        raw_train = full_arrays(trainset)
        raw_val = full_arrays(valset)
        normalized = percentile_normalizer(trainset, raw_train, raw_val)

        def signature(hparams):
            return (int(hparams["resnet_depth"]),
                    tuple(hparams["linear_out"]),
                    bool(hparams["batchnorm_begin"]),
                    bool(hparams["batchnorm_dense"]),
                    int(hparams["batch_size"]),
                    int(hparams["max_epochs"]),
                    int(hparams["early_stopping_patience"]),
                    float(hparams["norm_percentile"]))

        def lr_select(hp_row, keys):
            # backbone_head_optimizer parity: 'head' at lr, everything
            # else at lr_pretrained (0.0 when frozen).
            return (hp_row["lr"] if keys and keys[0] == "head"
                    else hp_row["lr_pretrained"])

        def apply_fn(model, variables, batch, hp, rng, train):
            del hp, rng  # the MRI space has no traced model knobs
            if train:
                return model.apply(variables, batch, train=True,
                                   mutable=["batch_stats"])
            return model.apply(variables, batch, train=False), {}

        def batch_objective(sig, rows):
            model = AnatCNN.from_hparams(dict(base, **rows[0]),
                                         freeze_backbone=False)
            hp = vmap_hpo.stack_trial_hparams(rows, pad_to=parallel,
                                              extra_keys=("lr_pretrained",))
            train_data, val_data = normalized(
                float(rows[0]["norm_percentile"]))
            values, _ = vmap_hpo.run_parallel_trials(
                model, hp, train_data, val_data,
                batch_size=int(rows[0]["batch_size"]),
                max_epochs=int(rows[0]["max_epochs"]),
                patience=int(rows[0]["early_stopping_patience"]),
                class_weights=base["loss_class_weights"], seed=SEED,
                apply_fn=apply_fn, lr_select=lr_select)
            return [float(v) for v in values[:len(rows)]]

        vmap_hpo.optimize_batched(study, sample_hparams, batch_objective,
                                  n_trials=n_trials, parallel=parallel,
                                  signature_fn=signature, timeout=timeout)
        return study
    study.optimize(_objective, n_trials=n_trials, timeout=timeout)
    return study


if __name__ == "__main__":
    optuna_optimization()
