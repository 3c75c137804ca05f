"""Golden-value regression tests: fixed-seed model outputs frozen on disk.

Guards future refactors (rounds 2+) against silent numeric drift in the
model stack: init + forward of the PET CNN and the Med3D backbone with
fixed PRNG keys must keep producing byte-stable logits (up to fp32
tolerance across XLA versions).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models import AnatCNN, SmallPETCNN

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _golden(name, value, rtol=1e-4, atol=1e-5):
    path = os.path.join(GOLDEN_DIR, name + ".npy")
    value = np.asarray(value)
    if not os.path.exists(path):
        np.save(path, value)
        return
    expected = np.load(path)
    np.testing.assert_allclose(value, expected, rtol=rtol, atol=atol,
                               err_msg=f"golden drift in {name}")


def test_pet_cnn_golden_logits():
    model = SmallPETCNN.from_hparams({
        "n_classes": 3, "conv_out": (4, 8), "filter_size": (5, 3),
        "batchnorm": True, "linear_out": 16})
    rng = np.random.default_rng(1234)
    batch = {"pet1451": jnp.asarray(
        rng.normal(size=(2, 16, 16, 16)).astype(np.float32))}
    variables = model.init(jax.random.PRNGKey(42), batch, train=False)
    out = model.apply(variables, batch, train=False)
    _golden("pet_cnn_logits", out["logits"])
    _golden("pet_cnn_gap", out["embeddings"]["gap"])


def test_anat_cnn_golden_logits():
    model = AnatCNN.from_hparams({"n_classes": 3, "resnet_depth": 10,
                                  "linear_out": (8,)})
    rng = np.random.default_rng(99)
    batch = {"mri": jnp.asarray(
        rng.normal(size=(1, 20, 24, 20)).astype(np.float32))}
    variables = model.init(jax.random.PRNGKey(7), batch, train=False)
    out = model.apply(variables, batch, train=False)
    _golden("anat_cnn_logits", out["logits"])
    _golden("anat_cnn_backbone_gap", out["embeddings"]["backbone_gap"],
            rtol=1e-3, atol=1e-4)
