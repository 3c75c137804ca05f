"""Checkpoint -> serving-artifact exporter (the deployment CLI).

One command takes a trained checkpoint directory (train/checkpoint.py
layout: orbax state + embedded hparams) and writes a self-contained
StableHLO artifact (jax.export format, weights baked in) that
``inference.export.load_exported`` — or any StableHLO runtime — can
serve without this package's model code. The reference has no
deployment story at all (research .ckpt files only).

Modes:
  * ``float``  — the model's eval graph in its training dtype.
  * ``folded`` — BN-folded bf16 graph (exact algebra; the fastest float
    serve, BASELINE.md) — AnatCNN family and the 3-stage fusion.
  * ``int8``   — PTQ serve (inference/quantize.py): per-out-channel int8
    weights, int8 activation dataflow, f32 head. Calibration runs on
    the example batch (synthetic by default; pass ``--calib file.npz``
    with real preprocessed inputs for production scales).

Preprocessing (the production quantile min-max for MRI, split-stats
z-score for PET) is fused into the artifact, so it consumes RAW volume
batches: {'mri', 'mri_mask'} and/or {'pet1451'} (+ 'tabular'), shaped
``--batch x --volume-shape``. ``--no-preprocess`` exports the bare
model graph instead.

Examples:
  python tools/export_artifact.py runs/mri_ckpt --model anat_cnn \
      --mode int8 --out mri_int8.shlo
  python tools/export_artifact.py runs/stage3_ckpt --model all_mod_fusion \
      --mode folded --batch 64 --out fusion.shlo
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reference PET split stats (train_pet_cnn.py:77-78); overridable.
PET_MEAN, PET_STD = 0.5145, 0.5383


def _build_preprocess(kind: str, hparams: dict, pet_stats):
    """Fused on-device normalization matching the eval harness:
    MRI quantile min-max at the checkpoint's norm_percentile
    (reference dataloader.py:261-270), PET split-stats z-score."""
    import jax.numpy as jnp  # noqa: F401  (traced fns below)

    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
        normalize_pet,
    )

    quantile = float(hparams.get("norm_percentile", 0.99))
    mean, std = pet_stats

    def pre(batch):
        out = dict(batch)
        if kind in ("mri", "both") and "mri" in out:
            out["mri"] = batched_normalize_mri(
                out["mri"], out.pop("mri_mask"),
                {"per_scan_norm": "min_max"}, quantile,
                qminmax=out.pop("mri_qminmax", None))
        if kind in ("pet", "both") and "pet1451" in out:
            out["pet1451"] = normalize_pet(out["pet1451"], mean, std)
        return out

    return pre


def _example_batch(model_name: str, batch: int, shape, rng):
    ex = {}
    if model_name in ("anat_cnn", "all_mod_fusion"):
        ex["mri"] = rng.normal(900, 400, (batch,) + shape).astype(np.float32)
        ex["mri_mask"] = (rng.random((batch,) + shape) > 0.35).astype(
            np.float32)
    if model_name in ("pet_cnn", "all_mod_fusion"):
        ex["pet1451"] = rng.normal(0.5, 0.5, (batch,) + shape).astype(
            np.float32)
    if model_name == "all_mod_fusion":
        ex["tabular"] = rng.normal(size=(batch, 9)).astype(np.float32)
    return ex


def _load_model(model_name: str, checkpoint: str):
    from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint

    if model_name == "anat_cnn":
        from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import (
            AnatCNN,
        )
        variables, hparams, _ = load_checkpoint(checkpoint)
        return AnatCNN.from_hparams(hparams), variables, hparams, "mri"
    if model_name == "pet_cnn":
        from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import (
            SmallPETCNN,
        )
        variables, hparams, _ = load_checkpoint(checkpoint)
        return SmallPETCNN.from_hparams(hparams), variables, hparams, "pet"
    if model_name == "all_mod_fusion":
        from multimodal_alzheimer_tpu.inference.test_all_mod_fusion import (
            load_fusion,
        )
        model, variables, hparams, _, _ = load_fusion(checkpoint)
        return model, variables, hparams, "both"
    raise SystemExit(f"unknown --model {model_name!r}")


def _build_serve(mode: str, model_name: str, model, variables, preprocess,
                 calib_batches, int8_pet: bool):
    import jax

    from multimodal_alzheimer_tpu.inference import quantize as Q

    if mode == "float":
        def serve(batch):
            pre = preprocess(batch) if preprocess else batch
            out = model.apply(variables, pre, train=False)
            return {"logits": out["logits"].astype(np.float32),
                    "probs": jax.nn.softmax(
                        out["logits"].astype(np.float32), -1)}
        return serve
    if mode == "folded":
        if model_name == "anat_cnn":
            serve, _ = Q.fold_anat_cnn(model, variables,
                                       preprocess=preprocess)
        elif model_name == "all_mod_fusion":
            serve, _ = Q.fold_all_modalities_fusion(model, variables,
                                                    preprocess=preprocess)
        else:
            raise SystemExit(
                "--mode folded: no BatchNorm to fold in this model family "
                "(pet_cnn is BN-free by default — use float/int8)")
        return serve
    if mode == "int8":
        if model_name == "anat_cnn":
            serve, _ = Q.quantize_anat_cnn(model, variables, calib_batches,
                                           preprocess=preprocess)
        elif model_name == "pet_cnn":
            serve, _ = Q.quantize_pet_cnn(model, variables, calib_batches,
                                          preprocess=preprocess)
        else:
            serve, _ = Q.quantize_all_modalities_fusion(
                model, variables, calib_batches, preprocess=preprocess,
                quantize_pet=int8_pet)
        return serve
    raise SystemExit(f"unknown --mode {mode!r}")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export a trained checkpoint to a StableHLO "
                    "serving artifact")
    parser.add_argument("checkpoint", help="checkpoint directory "
                        "(train/checkpoint.py layout)")
    parser.add_argument("--model", required=True,
                        choices=["anat_cnn", "pet_cnn", "all_mod_fusion"])
    parser.add_argument("--out", required=True, help="artifact output path")
    parser.add_argument("--mode", default="folded",
                        choices=["float", "folded", "int8"])
    parser.add_argument("--batch", type=int, default=128,
                        help="compiled serving batch size")
    parser.add_argument("--volume-shape", type=int, nargs=3,
                        default=(91, 109, 91), metavar=("D", "H", "W"))
    parser.add_argument("--calib", default=None,
                        help="npz of raw input batches for int8 "
                             "calibration (keys as the serving batch); "
                             "default: the synthetic example batch")
    parser.add_argument("--pet-stats", type=float, nargs=2,
                        default=(PET_MEAN, PET_STD), metavar=("MEAN", "STD"))
    parser.add_argument("--int8-pet", action="store_true",
                        help="int8 3-stage: also quantize the PET tower "
                             "(a measured anti-win on v5e — see "
                             "inference/quantize.py)")
    parser.add_argument("--no-preprocess", action="store_true",
                        help="export the bare model graph (inputs already "
                             "normalized)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.inference.export import (
        export_serve_fn,
        load_exported,
    )

    model, variables, hparams, norm_kind = _load_model(args.model,
                                                       args.checkpoint)
    preprocess = (None if args.no_preprocess else
                  _build_preprocess(norm_kind, hparams, args.pet_stats))

    rng = np.random.default_rng(args.seed)
    example = _example_batch(args.model, args.batch,
                             tuple(args.volume_shape), rng)
    if args.calib:
        with np.load(args.calib) as z:
            calib = [{k: z[k] for k in z.files}]
        example = {k: v[:args.batch] for k, v in calib[0].items()}
    else:
        calib = [example]
    example = {k: jnp.asarray(v) for k, v in example.items()}
    calib = [{k: jnp.asarray(v) for k, v in c.items()} for c in calib]

    serve = _build_serve(args.mode, args.model, model, variables,
                         preprocess, calib, args.int8_pet)
    blob = export_serve_fn(serve, example)
    with open(args.out, "wb") as f:
        f.write(blob)

    # Reload smoke check: the artifact must reproduce the live graph.
    art = load_exported(blob)(example)
    live = serve(example)
    drift = float(np.abs(np.asarray(art["logits"])
                         - np.asarray(live["logits"])).max())
    print(f"wrote {args.out}: {len(blob) / 1e6:.1f} MB, mode={args.mode}, "
          f"batch={args.batch}, reload max|dlogit|={drift:.2e}",
          file=sys.stderr)
    if not np.isfinite(drift) or drift > 1e-3:
        raise SystemExit("artifact reload drift above tolerance")
    return args.out


if __name__ == "__main__":
    main()
