"""Vectorized-HPO benchmark: vmapped K-trial training vs sequential trials.

The reference's HPO is 300 sequential optuna fits
(reference: train_pet_cnn.py:208-216); the tabular branch's trials are
tiny MLPs whose per-step matmuls can't feed the MXU. train/vmap_hpo.py
stacks K trials into one program — this tool measures what that buys on
the real chip.

Workload: ADNI-scale synthetic tabular data (the real train split is
~1.5k rows of 9 features), reference-width MLP (hidden 256->1024),
identical epoch budgets, early stopping disabled so both paths do exactly
the same optimizer/epoch work. Sequential = K width-1 calls of the SAME
vmapped trainer (so the comparison isolates the trial-batching win, not
Trainer-vs-scan implementation differences); each width-1 call re-traces,
exactly like each sequential optuna trial builds a fresh Trainer.

Timing: whole-call wall time including the per-epoch host sync (the val
loss is fetched every epoch — a real scalar fetch, so the axon tunnel's
under-waiting block_until_ready issue does not apply). Both paths are
measured on their second run (first warms the jit/persistent cache) and
both timed runs retrace identically, so trace cost is represented the
same way in both numbers.

Prints human lines to stderr, one JSON line to stdout.
Run: ``python tools/bench_hpo.py [--k 16] [--epochs 10] [--n 1536]``.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    with open("/proc/cpuinfo") as _f:
        _cpu_flags = next((ln for ln in _f if ln.startswith("flags")), "")
except OSError:
    _cpu_flags = ""
_platform = os.environ.get("JAX_PLATFORMS", "axon").split(",")[0] or "axon"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    f"/tmp/jax_cache-{hashlib.md5(_cpu_flags.encode()).hexdigest()[:8]}"
    f"-{_platform}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import (  # noqa: E402
    TabularMLP,
)
from multimodal_alzheimer_tpu.train import vmap_hpo  # noqa: E402


def _data(n, seed, rule_seed=42):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 9)).astype(np.float32)
    w = np.random.default_rng(rule_seed).normal(size=(9, 3))
    y = (x @ w + 0.5 * rng.normal(size=(n, 3))).argmax(1).astype(np.int32)
    return {"tabular": x, "label": y}


def _trial_rows(k, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(k):
        gamma = rng.choice([None, 1, 2, 5])
        rows.append({
            "lr": float(10 ** rng.uniform(-5, -2)),
            "l2_reg": float(rng.choice([0, 1e-1, 1e-2, 1e-3])),
            "dropout_p": float(rng.uniform(0, 0.5)),
            "fl_gamma": None if gamma is None else float(gamma),
            "trial_seed": i,
        })
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--k", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--n", type=int, default=1536)
    parser.add_argument("--batch", type=int, default=64)
    args = parser.parse_args()

    model = TabularMLP(n_classes=3, hidden=(256, 1024))
    train_data = _data(args.n, 0)
    val_data = _data(args.n // 3, 1)
    rows = _trial_rows(args.k)
    cw = np.array([0.55, 0.75, 0.7], np.float32)

    def run(row_subset):
        hp = vmap_hpo.stack_trial_hparams(row_subset)
        return vmap_hpo.run_parallel_trials(
            model, hp, train_data, val_data, batch_size=args.batch,
            max_epochs=args.epochs, patience=10 ** 9, class_weights=cw,
            seed=5)

    def timed(fn):
        fn()  # warm: jit + persistent cache
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    t_vmap = timed(lambda: run(rows))

    def sequential():
        for row in rows:
            run([row])

    t_seq = timed(sequential)

    vmap_tps = args.k / t_vmap
    seq_tps = args.k / t_seq
    speedup = t_seq / t_vmap
    print(f"vmapped width-{args.k}: {t_vmap:.2f}s = {vmap_tps:.2f} trials/s"
          f" ({args.epochs} epochs, n={args.n}, b={args.batch})",
          file=sys.stderr)
    print(f"sequential width-1 x{args.k}: {t_seq:.2f}s = "
          f"{seq_tps:.2f} trials/s", file=sys.stderr)
    print(f"speedup: {speedup:.1f}x", file=sys.stderr)
    print(json.dumps({
        "metric": "hpo_trials_per_s_vmapped",
        "value": round(vmap_tps, 3),
        "unit": "trials/s",
        "k": args.k,
        "epochs": args.epochs,
        "sequential_trials_per_s": round(seq_tps, 3),
        "speedup_vs_sequential": round(speedup, 2),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
