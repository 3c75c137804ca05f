"""TPE sampler quality: must beat random search on deterministic toys.

The reference's search behavior is optuna's default TPE over 300 trials
(reference train_pet_cnn.py:208-216); the shim's TPEStudy must be a
model-based sampler, not random search with a different name. These tests
run both engines with equal trial budgets over several seeds and require
TPE to win on average — plus API/behavior checks (inf trials rank worst,
mixed spaces, log-scale, maximize direction).
"""

import math

from multimodal_alzheimer_tpu.train.hpo import RandomStudy, TPEStudy


def _quadratic(trial):
    x = trial.suggest_float("x", 0.0, 1.0)
    c = trial.suggest_categorical("c", ["a", "b", "cc"])
    return (x - 0.15) ** 2 + (0.0 if c == "b" else 0.5)


def _log_scale(trial):
    lr = trial.suggest_float("lr", 1e-5, 1e-1, log=True)
    n = trial.suggest_int("n", 1, 64)
    return abs(math.log10(lr) - math.log10(3e-4)) + abs(n - 48) / 64.0


def _mean_best(study_cls, objective, seeds, n_trials):
    total = 0.0
    for seed in seeds:
        study = study_cls(direction="minimize", seed=seed)
        study.optimize(objective, n_trials=n_trials)
        total += study.best_value
    return total / len(seeds)


def test_tpe_beats_random_on_quadratic():
    seeds = range(5)
    tpe = _mean_best(TPEStudy, _quadratic, seeds, 60)
    rand = _mean_best(RandomStudy, _quadratic, seeds, 60)
    assert tpe < rand, (tpe, rand)
    assert tpe < 0.01, tpe  # actually converges near the optimum


def test_tpe_beats_random_on_log_scale_mixed_space():
    seeds = range(5)
    tpe = _mean_best(TPEStudy, _log_scale, seeds, 80)
    rand = _mean_best(RandomStudy, _log_scale, seeds, 80)
    assert tpe < rand, (tpe, rand)


def test_tpe_handles_inf_trials_as_worst():
    """OOM-style inf scores must not poison the good/bad split."""
    def objective(trial):
        x = trial.suggest_float("x", 0.0, 1.0)
        if x > 0.9:
            return math.inf  # simulated OOM region
        return (x - 0.5) ** 2

    study = TPEStudy(direction="minimize", seed=3)
    study.optimize(objective, n_trials=50)
    assert math.isfinite(study.best_value)
    assert study.best_value < 0.01


def test_tpe_maximize_direction():
    def objective(trial):
        x = trial.suggest_float("x", -1.0, 1.0)
        return -(x - 0.3) ** 2

    study = TPEStudy(direction="maximize", seed=1)
    study.optimize(objective, n_trials=60)
    assert study.best_value > -0.01
    assert abs(study.best_trial.params["x"] - 0.3) < 0.15


def test_tpe_suggest_int_bounds_and_resume():
    def objective(trial):
        n = trial.suggest_int("n", 2, 7)
        assert 2 <= n <= 7
        return float(n)

    study = TPEStudy(direction="minimize", seed=0)
    study.optimize(objective, n_trials=30)
    first = len(study.trials)
    study.optimize(objective, n_trials=10)  # resumable, numbering continues
    assert len(study.trials) == first + 10
    assert study.best_value == 2.0
