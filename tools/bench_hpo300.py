"""Full-budget reference-protocol HPO search: 300 optuna trials.

VERDICT r4 #6: the repo's HPO mechanics were proven at toy budgets (TPE
beats random; 14-66x vectorization) but a realistic search was never
executed end to end. The reference's protocol is 300 TPE trials with
OOM scored inf (reference: pkg/models/pet_models/train_pet_cnn.py:
208-216). This tool runs exactly that against the tabular stage-1 space
(the reference searches every stage; tabular is the one whose 300-trial
budget fits a bench window) on a reference-scale synthetic split (1946
train / 216 val subjects — data_set_split.json counts), vectorized
``parallel=K``, and records the best-val-vs-trial curve, wall time and
bucket/compile counts.

Run on the TPU:   python tools/bench_hpo300.py
CPU smoke:        --trials 6 --parallel 3 --subjects 40 10 10
Human lines to stderr; ONE JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms",
                      os.environ["JAX_PLATFORMS"].split(",")[0])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=300)
    parser.add_argument("--parallel", type=int, default=64)
    parser.add_argument("--subjects", type=int, nargs=3,
                        default=(1946, 216, 240),
                        help="train/val/test subject counts "
                             "(default: data_set_split.json scale)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from multimodal_alzheimer_tpu.data.synthetic import (
        write_synthetic_split,
    )
    from multimodal_alzheimer_tpu.models.tabular_models import (
        train_tabular,
    )

    ws = tempfile.mkdtemp(prefix="mmalz_hpo300_")
    write_synthetic_split(os.path.join(ws, "data"),
                          n_subjects=tuple(args.subjects),
                          seed=args.seed, write_volumes=False)
    os.environ["MMALZ_DATA_DIR"] = os.path.join(ws, "data")

    t0 = time.perf_counter()
    study = train_tabular.optuna_optimization(n_trials=args.trials,
                                              parallel=args.parallel)
    wall = time.perf_counter() - t0

    values = [float(v) for v, _ in study.trials]
    finite = [v for v in values if np.isfinite(v)]
    if not finite:
        # every trial scored inf (all-OOM protocol outcome): still honor
        # the one-JSON-line contract rather than crash post-search
        print(json.dumps({"metric": "hpo_300_trials",
                          "space": "tabular_stage1",
                          "n_trials": len(values),
                          "wall_s": round(wall, 1),
                          "best_value": None,
                          "all_trials_inf": True}))
        return
    curve = np.minimum.accumulate(
        np.where(np.isfinite(values), values, np.inf)).tolist()
    # one bucket == one (batch_size, hidden) signature == one XLA
    # program per epoch-budget variant (jit caches by shape)
    buckets = {(p.get("batch_size"), p.get("hidden"))
               for _, p in study.trials}
    stride = max(1, len(curve) // 30)
    out = {
        "metric": "hpo_300_trials",
        "space": "tabular_stage1",
        "n_trials": len(values),
        "parallel": args.parallel,
        "subjects": list(args.subjects),
        "wall_s": round(wall, 1),
        "trials_per_s": round(len(values) / wall, 2),
        "best_value": round(min(finite), 4),
        "best_params": dict(study.trials[
            int(np.argmin([v if np.isfinite(v) else np.inf
                           for v in values]))][1]),
        "n_buckets": len(buckets),
        "curve_stride": stride,
        "best_val_curve": [round(v, 4) for v in curve[::stride]],
    }
    print(f"{out['n_trials']} trials in {wall:.1f}s "
          f"({out['trials_per_s']}/s), best val {out['best_value']} "
          f"(params {out['best_params']}), {out['n_buckets']} "
          f"compile buckets", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
