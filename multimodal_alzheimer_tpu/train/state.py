"""Train state + jitted train/eval steps (the Lightning-loop replacement).

One donated-state jitted function per (model, optimizer): forward, loss,
grad, optimizer update, BatchNorm running-stat mutation, all fused by XLA
into a single device program (the reference's per-step work is spread
across Lightning hooks and host metric objects,
reference: pkg/models/base_model.py:60-85).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    lr_scale: jnp.ndarray  # ReduceLROnPlateau multiplier (host-updated)

    @classmethod
    def create(cls, variables, optimizer) -> "TrainState":
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32),
                   params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=optimizer.init(params),
                   lr_scale=jnp.ones((), jnp.float32))

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def make_train_step(model, criterion: Callable, optimizer,
                    preprocess: Optional[Callable] = None):
    """Build the jitted training step.

    Returns step(state, batch, dropout_rng) -> (state, aux) where aux has
    'loss' (scalar), 'logits', 'labels' — the same contract as the
    reference's general_step dict (pet_cnn.py:60-70).
    """

    def train_step(state: TrainState, batch: dict, dropout_rng):
        if preprocess is not None:
            # named_scope: profiler attribution only (tools/profile_step.py)
            with jax.named_scope("preprocess"):
                batch = preprocess(batch)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mutated = model.apply(
                variables, batch, train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"])
            loss = criterion(out["logits"], batch["label"])
            return loss, (out["logits"], mutated.get("batch_stats", {}))

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        with jax.named_scope("optimizer"):
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            # LR-plateau scale: updates are linear in lr, so scaling them
            # is exactly an lr change while preserving Adam moments.
            updates = jax.tree_util.tree_map(
                lambda u: u * state.lr_scale, updates)
            new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state)
        return new_state, {"loss": loss, "logits": logits,
                           "labels": batch["label"]}

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, criterion: Callable,
                   preprocess: Optional[Callable] = None):
    """Jitted eval step: (variables, batch) -> {'loss','logits','labels'}."""

    def eval_step(variables, batch):
        if preprocess is not None:
            batch = preprocess(batch)
        out = model.apply(variables, batch, train=False)
        loss = criterion(out["logits"], batch["label"])
        return {"loss": loss, "logits": out["logits"],
                "labels": batch["label"], "embeddings": out["embeddings"]}

    return jax.jit(eval_step)
