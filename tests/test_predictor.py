"""Predictor serving wrapper: padding, batching, embedding access, DP."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.inference.predictor import Predictor
from multimodal_alzheimer_tpu.models import TabularMLP
from multimodal_alzheimer_tpu.parallel import make_mesh


def _model_and_vars():
    model = TabularMLP.from_hparams({"n_classes": 3, "hidden": (16, 32)})
    batch = {"tabular": jnp.zeros((2, 9))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return model, variables


def test_predict_batch_pads_ragged_tail():
    model, variables = _model_and_vars()
    pred = Predictor(model, variables, batch_size=8)
    rng = np.random.default_rng(0)
    out = pred.predict_batch({"tabular": rng.normal(size=(5, 9))
                              .astype(np.float32)})
    assert out["logits"].shape == (5, 3)
    assert out["probs"].shape == (5, 3)
    np.testing.assert_allclose(out["probs"].sum(axis=1), 1.0, rtol=1e-5)
    assert out["embeddings"]["decoder"].shape == (5, 32)


def test_padding_does_not_change_results():
    model, variables = _model_and_vars()
    pred = Predictor(model, variables, batch_size=8)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 9)).astype(np.float32)
    full = pred.predict_batch({"tabular": x})
    part = pred.predict_batch({"tabular": x[:3]})
    np.testing.assert_allclose(part["logits"], full["logits"][:3],
                               rtol=1e-5, atol=1e-6)


def test_predict_with_mesh():
    model, variables = _model_and_vars()
    pred = Predictor(model, variables, batch_size=16, mesh=make_mesh())
    rng = np.random.default_rng(2)
    out = pred.predict_batch({"tabular": rng.normal(size=(10, 9))
                              .astype(np.float32)})
    assert out["logits"].shape == (10, 3)
