"""From-scratch TabPFN: the reference's pretrained tabular transformer.

The reference's tabular branch is ``tabpfn.TabPFNClassifier`` — a
prior-data-fitted transformer (arXiv 2207.01848) that classifies a test
row by in-context attention over the whole training set, run as an
ensemble of input permutations (reference tabular_models/dl_approach.py:
47-78). Its saved artifact is ``classifier.model[2].state_dict()``
(dl_approach.py:44) and its fusion contribution is the 1024-d pre-GELU
``decoder[0]`` activation at test positions, averaged over ensemble
members (fusion_models/tabular_mri_fusion.py:58-76,
dl_approach.py:71-78 ``get_avg_activation``).

This module re-implements that stack TPU-native:

* :class:`TabPFNTransformer` — the architecture behind the saved
  state_dict (Linear feature/label encoders, 12x post-norm transformer
  encoder layers with the PFN train/test attention mask, 512->1024->10
  decoder). Exact vs a torch replica (tests/test_tabpfn.py), so
  :func:`convert_state_dict` gives logit-level parity for any weights in
  the tabpfn checkpoint format — the pretrained prior-fitted weights
  convert the same way MedicalNet backbones do (tools/convert_medicalnet).
* :class:`TabPFNClassifier` — fit/predict_proba in-context wrapper.
  TPU-first: the whole ensemble runs as ONE jitted program (ensemble
  axis vmapped; the torch reference loops configs on CPU inside every
  fusion training step, tabular_mri_fusion.py:66-76). ``embed()``
  produces the ensemble-averaged decoder activations in-framework, i.e.
  the exact ``tabular_embedding`` batch key the fusion models accept
  (tabular_mlp.py) — previously only producible offline with the tabpfn
  package installed.

Known divergences (documented, not silent): the upstream classifier
draws its ensemble configurations from torch RNG state and mixes in a
sklearn yeo-johnson "power" preprocessing for half the members; here the
configurations are deterministic (class/feature rotations, overridable
via ``class_shifts=``/``feature_shifts=``) and preprocessing is the
'none' pipeline (train-stat z-score, soft outlier clip, used-feature
rescale, zero-pad to 100). The transformer core — the part the
checkpoint parameterizes and the fusion taps — is bit-faithful.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

MAX_FEATURES = 100
N_OUT = 10


def pfn_attention_mask(seq_len: int, n_train: int) -> jnp.ndarray:
    """Additive attention mask of the prior-fitted-network kind.

    Position r may attend to position c iff c is a train position or
    r == c (reference tabpfn transformer.generate_D_q_matrix): train
    tokens attend among themselves, each test token sees the train set
    plus itself — never another test token, so predictions are
    independent of the test batch composition.
    """
    cols = jnp.arange(seq_len)
    allowed = (cols[None, :] < n_train) | (cols[None, :] == cols[:, None])
    return jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)


class _EncoderLayer(nn.Module):
    """Post-norm torch ``nn.TransformerEncoderLayer`` (gelu, dropout 0)."""

    emsize: int
    nhead: int
    nhid: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        s, e = x.shape
        dh = self.emsize // self.nhead
        # torch MultiheadAttention: fused in-projection, per-head scaling.
        qkv = nn.Dense(3 * self.emsize, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(s, self.nhead, dh).transpose(1, 0, 2)

        q, k, v = heads(q) / np.sqrt(dh), heads(k), heads(v)
        scores = jnp.einsum("hqd,hkd->hqk", q, k) + mask[None]
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("hqk,hkd->hqd", attn, v)
        ctx = ctx.transpose(1, 0, 2).reshape(s, self.emsize)
        ctx = nn.Dense(self.emsize, dtype=self.dtype, name="out_proj")(ctx)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + ctx)
        h = nn.Dense(self.nhid, dtype=self.dtype, name="linear1")(x)
        h = jax.nn.gelu(h, approximate=False)  # torch nn.GELU is erf-exact
        h = nn.Dense(self.emsize, dtype=self.dtype, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + h)


class TabPFNTransformer(nn.Module):
    """The state-dict-bearing TabPFN core (reference dl_approach.py:44).

    Input is one (train+test) sequence: features zero-padded to
    ``max_features``; train tokens are ``encoder(x) + y_encoder(y)``,
    test tokens ``encoder(x)`` alone. Returns test-position logits and
    the pre-GELU ``decoder[0]`` activations — the fusion embedding the
    reference hooks (tabular_mri_fusion.py:66).
    """

    emsize: int = 512
    nhead: int = 4
    nhid: int = 1024
    nlayers: int = 12
    n_out: int = N_OUT
    max_features: int = MAX_FEATURES
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y_train: jnp.ndarray,
                 n_train: int) -> dict:
        seq_len = x.shape[0]
        tok = nn.Dense(self.emsize, dtype=self.dtype, name="encoder")(
            x.astype(self.dtype))
        y_tok = nn.Dense(self.emsize, dtype=self.dtype, name="y_encoder")(
            y_train.astype(self.dtype)[:, None])
        y_full = jnp.zeros_like(tok).at[:n_train].set(y_tok)
        h = tok + y_full
        mask = pfn_attention_mask(seq_len, n_train)
        for i in range(self.nlayers):
            h = _EncoderLayer(self.emsize, self.nhead, self.nhid,
                              dtype=self.dtype, name=f"layers_{i}")(h, mask)
        test = h[n_train:]
        dec = nn.Dense(self.nhid, dtype=self.dtype, name="decoder_0")(test)
        logits = nn.Dense(self.n_out, dtype=self.dtype, name="decoder_2")(
            jax.nn.gelu(dec, approximate=False))
        return {"logits": logits.astype(jnp.float32),
                "embeddings": {"decoder": dec.astype(jnp.float32)}}


def convert_state_dict(sd) -> dict:
    """tabpfn ``model[2].state_dict()`` -> :class:`TabPFNTransformer` params.

    Accepts the dict the reference saves at ``tabular_baseline.pth``
    (dl_approach.py:44; torch tensors or numpy arrays). Torch Linear
    (O, I) transposes to flax (I, O); ``transformer_encoder.layers.N``
    maps to ``layers_N`` with the fused ``in_proj`` kept fused.
    """
    a = {k: np.asarray(v) for k, v in sd.items()}

    def lin(prefix):
        return {"kernel": np.ascontiguousarray(a[prefix + ".weight"].T),
                "bias": a[prefix + ".bias"]}

    params = {"encoder": lin("encoder"), "y_encoder": lin("y_encoder"),
              "decoder_0": lin("decoder.0"), "decoder_2": lin("decoder.2")}
    n_layers = 1 + max(int(k.split(".")[2]) for k in a
                       if k.startswith("transformer_encoder.layers."))
    for i in range(n_layers):
        p = f"transformer_encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "in_proj": {
                "kernel": np.ascontiguousarray(
                    a[p + ".self_attn.in_proj_weight"].T),
                "bias": a[p + ".self_attn.in_proj_bias"]},
            "out_proj": lin(p + ".self_attn.out_proj"),
            "linear1": lin(p + ".linear1"),
            "linear2": lin(p + ".linear2"),
            "norm1": {"scale": a[p + ".norm1.weight"],
                      "bias": a[p + ".norm1.bias"]},
            "norm2": {"scale": a[p + ".norm2.weight"],
                      "bias": a[p + ".norm2.bias"]},
        }
    return jax.tree.map(jnp.asarray, {"params": params})


def model_from_variables(variables: dict, nhead: int = 4,
                         dtype: jnp.dtype = jnp.float32) -> TabPFNTransformer:
    """Infer the transformer config from converted params.

    All dims except ``nhead`` are recoverable from weight shapes; tabpfn's
    published prior-fitted checkpoints use nhead=4 (the default).
    """
    p = variables["params"]
    max_features, emsize = (np.asarray(p["encoder"]["kernel"]).shape)
    nhid = np.asarray(p["decoder_0"]["kernel"]).shape[1]
    n_out = np.asarray(p["decoder_2"]["kernel"]).shape[1]
    nlayers = sum(1 for k in p if k.startswith("layers_"))
    return TabPFNTransformer(emsize=emsize, nhead=nhead, nhid=nhid,
                             nlayers=nlayers, n_out=n_out,
                             max_features=max_features, dtype=dtype)


def _preprocess(x_all: jnp.ndarray, n_train: int, n_used: int,
                max_features: int, n_sigma: float = 4.0) -> jnp.ndarray:
    """The tabpfn 'none' input pipeline, train-stat based.

    Per feature over the train rows: z-score (unbiased std + 1e-6), a
    soft log outlier clip at ``n_sigma`` masked-stats sigmas, then a
    ``max_features / n_used`` rescale and zero-pad to ``max_features``
    (tabpfn transformer_prediction_interface preprocess path; upstream's
    optional yeo-johnson member is a documented divergence).
    """
    tr = x_all[:n_train]
    mean = tr.mean(0)
    std = tr.std(0, ddof=1) + 1e-6
    x = (x_all - mean) / std
    tr = x[:n_train]
    lo, hi = -2.0 * tr.std(0, ddof=1), 2.0 * tr.std(0, ddof=1)
    inlier = (tr >= lo) & (tr <= hi)
    cnt = jnp.maximum(inlier.sum(0), 1)
    m2 = jnp.where(inlier, tr, 0.0).sum(0) / cnt
    v2 = jnp.where(inlier, (tr - m2) ** 2, 0.0).sum(0) / jnp.maximum(cnt - 1, 1)
    cut = n_sigma * jnp.sqrt(v2)
    x = jnp.maximum(-jnp.log1p(jnp.abs(x)) + (m2 - cut), x)
    x = jnp.minimum(jnp.log1p(jnp.abs(x)) + (m2 + cut), x)
    x = x * (max_features / n_used)
    return jnp.pad(x, ((0, 0), (0, max_features - x.shape[1])))


class TabPFNClassifier:
    """In-context fit/predict with a one-program vmapped ensemble.

    API mirrors the reference's use of ``tabpfn.TabPFNClassifier``
    (dl_approach.py:55-59): ``fit`` stores the train set (no gradient
    step — the prior-fitted weights are the model), ``predict_proba``
    attends test rows over it. Each ensemble member rotates class labels
    by ``class_shifts[i]`` and feature columns by ``feature_shifts[i]``;
    softmax probabilities are un-rotated and averaged. ``embed`` returns
    the ensemble-mean pre-GELU decoder activations at test positions —
    bit-equal semantics to the reference's ``get_avg_activation``
    (dl_approach.py:71-78) and directly usable as the fusion models'
    ``tabular_embedding`` batch key.
    """

    def __init__(self, variables: dict | None = None,
                 ensemble_size: int = 4,
                 class_shifts: Sequence[int] | None = None,
                 feature_shifts: Sequence[int] | None = None,
                 softmax_temperature: float = 1.0,
                 model: TabPFNTransformer | None = None,
                 seed: int = 0, mesh=None):
        self.model = model or TabPFNTransformer()
        self.variables = variables
        # Optional 1-D jax.sharding.Mesh: ensemble parallelism. Members
        # are independent until the final mean, so the vmapped axis
        # shards with zero collectives (the vmap_hpo trial-axis pattern);
        # ensemble_size must divide the device count.
        self.mesh = mesh
        self.ensemble_size = ensemble_size
        self._class_shifts = class_shifts
        self._feature_shifts = feature_shifts
        self.temperature = softmax_temperature
        self.seed = seed
        self.x_train = None
        self.y_train = None
        self.classes_ = None

    def fit(self, x, y):
        x = np.asarray(x, np.float32)
        self.classes_, y_idx = np.unique(np.asarray(y), return_inverse=True)
        self.x_train = jnp.asarray(x)
        self.y_train = jnp.asarray(y_idx.astype(np.float32))
        if self.variables is None:  # random prior — tests / smoke only
            self.variables = self.model.init(
                jax.random.PRNGKey(self.seed),
                jnp.zeros((2, self.model.max_features)), jnp.zeros((1,)), 1)
        n_c, n_f = len(self.classes_), x.shape[1]
        cs = self._class_shifts
        fs = self._feature_shifts
        if cs is None or fs is None:
            pairs = [(c, f) for f in range(n_f) for c in range(n_c)]
            reps = -(-self.ensemble_size // len(pairs))  # cycle if short
            pairs = (pairs * reps)[:self.ensemble_size]
            cs = cs if cs is not None else [p[0] for p in pairs]
            fs = fs if fs is not None else [p[1] for p in pairs]
        self.class_shifts = jnp.asarray(list(cs)[:self.ensemble_size])
        self.feature_shifts = jnp.asarray(list(fs)[:self.ensemble_size])
        return self

    @functools.partial(jax.jit, static_argnums=(0, 4, 5))
    def _forward(self, variables, x_all, y_train, n_train, n_used):
        """All ensemble members in one program (ensemble axis vmapped)."""

        def member(c_shift, f_shift):
            cols = (jnp.arange(n_used) + f_shift) % n_used
            xs = _preprocess(x_all[:, cols], n_train, n_used,
                             self.model.max_features)
            ys = (y_train + c_shift) % len(self.classes_)
            out = self.model.apply(variables, xs, ys, n_train)
            n_c = len(self.classes_)
            probs = jax.nn.softmax(
                out["logits"][:, :n_c] / self.temperature, -1)
            # Member slot (t + c_shift) % n_c holds true class t — undo.
            probs = probs[:, (jnp.arange(n_c) + c_shift) % n_c]
            return probs, out["embeddings"]["decoder"]

        probs, dec = jax.vmap(member)(self.class_shifts, self.feature_shifts)
        return probs.mean(0), dec.mean(0)

    def _run(self, x_test):
        x_test = jnp.asarray(np.asarray(x_test, np.float32))
        x_all = jnp.concatenate([self.x_train, x_test], 0)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if self.ensemble_size % self.mesh.devices.size:
                raise ValueError(
                    f"ensemble_size={self.ensemble_size} must divide the "
                    f"{self.mesh.devices.size}-device mesh")
            member = NamedSharding(self.mesh,
                                   PartitionSpec(self.mesh.axis_names[0]))
            rep = NamedSharding(self.mesh, PartitionSpec())
            self.variables = jax.device_put(self.variables, rep)
            x_all = jax.device_put(x_all, rep)
            self.y_train = jax.device_put(self.y_train, rep)
            self.class_shifts = jax.device_put(self.class_shifts, member)
            self.feature_shifts = jax.device_put(self.feature_shifts, member)
        return self._forward(self.variables, x_all, self.y_train,
                             self.x_train.shape[0], x_all.shape[1])

    def predict_proba(self, x_test, normalize_with_test=False):
        del normalize_with_test  # train-stat normalization only (default)
        return np.asarray(self._run(x_test)[0])

    def predict(self, x_test, return_winning_probability=False):
        probs = self.predict_proba(x_test)
        pred = self.classes_.take(np.argmax(probs, -1))
        if return_winning_probability:
            return pred, probs.max(-1)
        return pred

    def embed(self, x_test) -> np.ndarray:
        """Ensemble-averaged 1024-d decoder tap == get_avg_activation."""
        return np.asarray(self._run(x_test)[1])
