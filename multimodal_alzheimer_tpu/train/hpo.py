"""Hyperparameter optimization: optuna when available, built-in fallback.

The reference runs ``optuna.create_study(direction='minimize')`` with 300
trials / 1-day timeout and catches CUDA OOM as ``math.inf``
(reference: train_pet_cnn.py:110-118, 208-216). optuna is not part of this
image's environment, so a small shim provides the same ``trial`` sampling
API (``suggest_float``/``suggest_categorical``) backed by random search —
the objective functions are written once and run under either engine.
TPU OOM (RESOURCE_EXHAUSTED) maps to the same inf-scoring behavior.
"""

from __future__ import annotations

import math
import random
import time
from typing import Callable, Optional


class RandomTrial:
    """optuna.Trial-compatible sampling shim (random search)."""

    def __init__(self, rng: random.Random, number: int):
        self._rng = rng
        self.number = number
        self.params: dict = {}

    def suggest_float(self, name: str, low: float, high: float,
                      log: bool = False) -> float:
        if log:
            value = math.exp(self._rng.uniform(math.log(low),
                                               math.log(high)))
        else:
            value = self._rng.uniform(low, high)
        self.params[name] = value
        return value

    def suggest_int(self, name: str, low: int, high: int) -> int:
        value = self._rng.randint(low, high)
        self.params[name] = value
        return value

    def suggest_categorical(self, name: str, choices):
        value = self._rng.choice(list(choices))
        self.params[name] = value
        return value


class RandomStudy:
    def __init__(self, direction: str = "minimize", seed: int = 0):
        self.direction = direction
        self._rng = random.Random(seed)
        self.trials: list[tuple[float, dict]] = []

    def optimize(self, objective: Callable, n_trials: int = 300,
                 timeout: Optional[float] = None) -> None:
        start = time.time()
        for i in range(n_trials):
            if timeout is not None and time.time() - start > timeout:
                break
            trial = RandomTrial(self._rng, i)
            value = objective(trial)
            self.trials.append((value, dict(trial.params)))

    @property
    def best_trial(self):
        key = min if self.direction == "minimize" else max
        value, params = key(self.trials, key=lambda t: t[0])

        class _Best:
            pass

        best = _Best()
        best.value = value
        best.params = params
        return best

    @property
    def best_value(self) -> float:
        return self.best_trial.value


def create_study(direction: str = "minimize", seed: int = 0):
    """optuna study when installed, RandomStudy otherwise."""
    try:
        import optuna

        return optuna.create_study(direction=direction)
    except ImportError:
        return RandomStudy(direction=direction, seed=seed)


def oom_guard(train_fn: Callable) -> Callable:
    """Score OOM'd trials as inf so the study continues
    (train_pet_cnn.py:110-118 parity for TPU RESOURCE_EXHAUSTED)."""

    def wrapped(*args, **kwargs):
        try:
            return train_fn(*args, **kwargs)
        except Exception as e:  # jaxlib XlaRuntimeError has no stable import
            if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
                print("Aborting run, not enough memory!")
                return math.inf
            raise

    return wrapped
