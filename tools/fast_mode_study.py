"""Fast-mode quality verdict: dilated (Med3D parity) vs strided backbone.

VERDICT r3 #3: the ``dilated=False`` fast mode is the biggest number in
the README (913 train / 5052 int8-serve vol/s) but had zero quality
evidence. This study runs a MATCHED convergence comparison — identical
data, budget, lr and K seeds per arch, vectorized over seeds with
train/vmap_hpo.run_parallel_trials — on the labeled separable synthetic
task (data/synthetic.make_labeled_volumes, spatial class signal that
survives per-scan min-max), then scores every seed's final model on one
held-out eval set (inference/quality.evaluate_serve).

The two arches differ exactly as models/resnet3d.py documents
(anat_cnn.py mirrors the reference's Med3D dilation spec,
reference pkg/models/mri_models/anat_cnn.py:25-46): layers 3-4 keep
stride 1 + dilation 2/4 in parity mode vs stride 2 in fast mode —
fast shrinks the layer-3/4 feature maps 64x, whence the speed.

Scoring (ADVICE r4 #1): each seed is scored at its BEST-val-loss epoch
state (run_parallel_trials ``track_best`` snapshot) — what a deployment
would checkpoint — not the ES-stopped final carry, which sits
``patience`` non-improving epochs past the best state and can collapse
there at quick-fit lrs (the round-4 study scored final states and
misread collapsed carries as convergence failures: fast seeds with
best_val ~0.22 scored F1 0.47-0.53). Final-state F1 is still reported
as ``eval_f1_final`` to quantify that gap.

Outputs per arch: per-seed best val loss, eval F1/MCC, stopped epochs,
wall time for the K-seed vmapped fit. Pretrained-weight note: Med3D
checkpoint kernels LOAD into the strided backbone (identical shapes)
but receptive fields shift, so converted weights are feature
extractors at best there — tools/quality_eval.py's ``fast`` core
measures exactly that serving-time damage; THIS study answers the
from-scratch-training question instead.

Run on the TPU:   python tools/fast_mode_study.py
CPU smoke:        --volume-shape 12 14 12 --depth 10 --seeds 2
                  --train-n 32 --eval-n 16 --epochs 2 --batch 8
Human lines to stderr; ONE JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--volume-shape", type=int, nargs=3,
                        default=(91, 109, 91), metavar=("D", "H", "W"))
    parser.add_argument("--depth", type=int, default=18)
    parser.add_argument("--seeds", type=int, default=4)
    parser.add_argument("--train-n", type=int, default=192)
    parser.add_argument("--eval-n", type=int, default=96)
    parser.add_argument("--batch", type=int, default=8,
                        help="per-trial batch (K trials run vmapped: "
                             "size K*batch like one big batch)")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--patience", type=int, default=3,
                        help="early-stopping patience (< epochs so ES "
                             "can stop a collapsed run early; scoring "
                             "uses the best-epoch snapshot either way)")
    # 3e-4: lr 1e-3 is late-training-unstable for depth-18 quick fits at
    # 91^3 (collapsed final states with good best-epoch losses).
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--contrast", type=float, default=0.5)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.data.synthetic import make_labeled_volumes
    from multimodal_alzheimer_tpu.inference.quality import evaluate_serve
    from multimodal_alzheimer_tpu.models import AnatCNN
    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
    )
    from multimodal_alzheimer_tpu.train import vmap_hpo

    shape = tuple(args.volume_shape)

    def normed(n, seed):
        data = make_labeled_volumes(n, shape, seed=seed,
                                    contrast=args.contrast,
                                    contrast_jitter=args.contrast)
        mri = batched_normalize_mri(
            jnp.asarray(data["mri"]), jnp.asarray(data["mri_mask"]),
            {"per_scan_norm": "min_max"}, 0.99)
        return {"mri": mri, "label": jnp.asarray(data["label"])}

    # normalization is trial- and arch-invariant: pay it once up front
    train_data = normed(args.train_n, args.seed)
    val_data = normed(args.eval_n, args.seed + 1)

    hp_model = {"n_classes": 3, "resnet_depth": args.depth,
                "linear_out": (), "batchnorm_begin": False, "lr": args.lr}
    rows = [{"lr": args.lr, "l2_reg": 0.0, "dropout_p": 0.0,
             "fl_gamma": None, "trial_seed": 100 + i}
            for i in range(args.seeds)]
    hp = vmap_hpo.stack_trial_hparams(rows, pad_to=args.seeds)

    def apply_fn(model, variables, batch, hp_row, rng, train):
        del hp_row, rng  # no traced model knobs in this study
        if train:
            return model.apply(variables, batch, train=True,
                               mutable=["batch_stats"])
        return model.apply(variables, batch, train=False), {}

    results = {}
    for arch, dilated in (("dilated", True), ("fast", False)):
        # trailing_relu OFF: the parity quirk's clamped-logit dead
        # gradients wreck short synthetic fits (see tools/quality_eval.py)
        model = AnatCNN.from_hparams(hp_model, dtype=jnp.bfloat16,
                                     dilated=dilated, trailing_relu=False)
        t0 = time.perf_counter()
        last, info = vmap_hpo.run_parallel_trials(
            model, hp, train_data, val_data, batch_size=args.batch,
            max_epochs=args.epochs, patience=args.patience,
            class_weights=[1 / 3, 1 / 3, 1 / 3], seed=args.seed,
            apply_fn=apply_fn, return_state=True, track_best=True)
        wall = time.perf_counter() - t0

        def score_states(params, stats):
            f1s, mccs = [], []
            for i in range(args.seeds):
                variables = {"params": jax.tree_util.tree_map(
                    lambda x: x[i], params)}
                if stats:
                    variables["batch_stats"] = jax.tree_util.tree_map(
                        lambda x: x[i], stats)

                def serve(batch, _v=variables):
                    out = model.apply(_v, batch, train=False)
                    logits = out["logits"].astype(jnp.float32)
                    return {"logits": logits,
                            "probs": jax.nn.softmax(logits, -1)}

                r = evaluate_serve(serve, val_data, 3,
                                   batch_size=min(32, args.eval_n))
                f1s.append(r["f1"])
                mccs.append(r["mcc"])
            return f1s, mccs

        # deployment scoring: the best-val-loss epoch snapshot
        f1s, mccs = score_states(*info["best_carry"])
        # final ES-stopped carry, to quantify the late-collapse gap
        fparams, fstats, _ = info["carry"]
        f1s_final, _ = score_states(fparams, fstats)

        # Seed-screen oracle check (train/seed_screen.py): would picking
        # the argmin-val seed after only E epochs have selected a good
        # final model? screen_pick_f1[E] = best-epoch eval F1 of the
        # seed an E-epoch screen would choose.
        hist = np.asarray(info["val_history"])  # (epochs, K)
        screen_pick = {
            str(e): round(f1s[int(hist[:e].min(axis=0).argmin())], 4)
            for e in (1, 2, 3) if e <= hist.shape[0]}

        best_val = np.asarray(info["val_history"]).min(axis=0)
        results[arch] = {
            "best_val_loss": [round(float(v), 4) for v in best_val],
            "best_val_mean": round(float(best_val.mean()), 4),
            "eval_f1": [round(f, 4) for f in f1s],
            "eval_f1_mean": round(float(np.mean(f1s)), 4),
            "eval_f1_std": round(float(np.std(f1s)), 4),
            "eval_mcc_mean": round(float(np.mean(mccs)), 4),
            "eval_f1_final": [round(f, 4) for f in f1s_final],
            "eval_f1_final_mean": round(float(np.mean(f1s_final)), 4),
            "stopped_epoch": info["stopped_epoch"].tolist(),
            "screen_pick_f1": screen_pick,
            "fit_wall_s": round(wall, 1),
        }
        print(f"{arch}: best val loss {best_val.mean():.4f} "
              f"(per seed {np.round(best_val, 3).tolist()}), eval F1 "
              f"{np.mean(f1s):.4f}±{np.std(f1s):.4f} best-epoch "
              f"(final-state {np.mean(f1s_final):.4f}), K={args.seeds} "
              f"fit {wall:.1f}s", file=sys.stderr)

    d, f = results["dilated"], results["fast"]
    print(f"verdict: fast - dilated eval F1 delta "
          f"{f['eval_f1_mean'] - d['eval_f1_mean']:+.4f} "
          f"(K={args.seeds} seeds, same budget/lr/data); fit wall "
          f"{f['fit_wall_s']:.1f}s vs {d['fit_wall_s']:.1f}s",
          file=sys.stderr)
    print(json.dumps({"metric": "fast_mode_convergence",
                      "volume_shape": list(shape), "depth": args.depth,
                      "seeds": args.seeds, "epochs": args.epochs,
                      "patience": args.patience, "lr": args.lr,
                      "scoring": "best_epoch_snapshot",
                      "train_n": args.train_n, **results}))


if __name__ == "__main__":
    main()
