"""TabPFN core parity vs a torch replica + classifier semantics.

The replica is built from torch primitives in the exact layout the
``tabpfn`` package saves (``encoder`` / ``y_encoder`` Linears,
``transformer_encoder`` of post-norm gelu layers with the PFN mask,
``decoder`` Sequential) — reference tabular_models/dl_approach.py:44
stores that module's state_dict, so converting a random replica's
state_dict and matching logits certifies the converter + architecture
for the real pretrained weights too (same strategy as
tests/test_convert_reference.py for the 9 torch model classes).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from multimodal_alzheimer_tpu.models.tabular_models.tabpfn import (
    TabPFNClassifier, TabPFNTransformer, convert_state_dict,
    pfn_attention_mask)

EMSIZE, NHEAD, NHID, NLAYERS, NFEAT = 32, 4, 64, 2, 10


class TorchTabPFN(nn.Module):
    """Replica of the tabpfn TransformerModel the reference checkpoints."""

    def __init__(self):
        super().__init__()
        self.encoder = nn.Linear(NFEAT, EMSIZE)
        self.y_encoder = nn.Linear(1, EMSIZE)
        layer = nn.TransformerEncoderLayer(EMSIZE, NHEAD, NHID, dropout=0.0,
                                           activation="gelu")
        self.transformer_encoder = nn.TransformerEncoder(layer, NLAYERS)
        self.decoder = nn.Sequential(nn.Linear(EMSIZE, NHID), nn.GELU(),
                                     nn.Linear(NHID, 10))

    def forward(self, x, y_train, n_train):
        src = self.encoder(x)
        src = torch.cat([src[:n_train] + self.y_encoder(y_train[:, None]),
                         src[n_train:]], dim=0)
        sz = x.shape[0]
        allowed = (torch.arange(sz)[None, :] < n_train) | \
            (torch.eye(sz, dtype=torch.bool))
        mask = torch.zeros(sz, sz).masked_fill(~allowed, float("-inf"))
        out = self.transformer_encoder(src.unsqueeze(1), mask=mask).squeeze(1)
        return self.decoder(out[n_train:])


def _flax_model():
    return TabPFNTransformer(emsize=EMSIZE, nhead=NHEAD, nhid=NHID,
                             nlayers=NLAYERS, max_features=NFEAT)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tm = TorchTabPFN().eval()
    variables = convert_state_dict(tm.state_dict())
    return tm, _flax_model(), variables


def test_logit_parity_vs_torch(pair):
    tm, fm, variables = pair
    rng = np.random.default_rng(1)
    x = rng.normal(size=(12, NFEAT)).astype(np.float32)
    y = rng.integers(0, 3, size=8).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(y), 8).numpy()
    got = fm.apply(variables, x, y, 8)["logits"]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)


def test_decoder_tap_matches_reference_hook(pair):
    """embeddings['decoder'] == the torch decoder[0] hook at test rows."""
    tm, fm, variables = pair
    rng = np.random.default_rng(2)
    x = rng.normal(size=(10, NFEAT)).astype(np.float32)
    y = rng.integers(0, 2, size=6).astype(np.float32)
    acts = {}
    handle = tm.decoder[0].register_forward_hook(
        lambda m, i, o: acts.__setitem__("dec", o.detach()))
    with torch.no_grad():
        tm(torch.from_numpy(x), torch.from_numpy(y), 6)
    handle.remove()
    got = fm.apply(variables, x, y, 6)["embeddings"]["decoder"]
    np.testing.assert_allclose(np.asarray(got), acts["dec"].numpy(),
                               rtol=2e-5, atol=2e-5)


def test_get_avg_activation_semantics():
    """Ensemble averaging == the reference loop (dl_approach.py:71-78)."""
    rng = np.random.default_rng(3)
    acts = torch.from_numpy(rng.normal(size=(9, 4, NHID)).astype(np.float32))
    n_train = 5
    # Reference loop, verbatim semantics:
    output = None
    for i in range(4):
        a = acts[n_train:, i:i + 1, :]
        output = a if output is None else output + a
    ref = torch.transpose(output / 4, 0, 1).squeeze(dim=0).numpy()
    # This framework: stack members on axis 0, slice test rows, mean.
    ours = acts.numpy().transpose(1, 0, 2)[:, n_train:, :].mean(0)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_mask_test_rows_independent():
    """A test row's prediction never depends on other test rows."""
    clf = TabPFNClassifier(model=_flax_model(), ensemble_size=2)
    rng = np.random.default_rng(4)
    x_tr = rng.normal(size=(16, 3)).astype(np.float32)
    y_tr = rng.integers(0, 2, size=16)
    clf.fit(x_tr, y_tr)
    a = rng.normal(size=(1, 3)).astype(np.float32)
    b = rng.normal(size=(3, 3)).astype(np.float32)
    solo = clf.predict_proba(a)
    batched = clf.predict_proba(np.concatenate([a, b], 0))
    np.testing.assert_allclose(batched[:1], solo, rtol=1e-5, atol=1e-6)


def test_class_shift_unrotation_exact():
    """Rotating labels at fit time + shifting the decoder slot cancel.

    Classifier A uses class_shift=1 on labels y; classifier B uses
    class_shift=0 on pre-rotated labels (y+1)%3. Members see identical
    sequences, so A's un-rotated probs for class t must equal B's probs
    for class (t+1)%3 — exactness of the rotation bookkeeping.
    """
    rng = np.random.default_rng(5)
    x_tr = rng.normal(size=(12, 4)).astype(np.float32)
    y = rng.integers(0, 3, size=12)
    y = np.concatenate([y, [0, 1, 2]])  # all classes present both ways
    x_tr = np.concatenate([x_tr, rng.normal(size=(3, 4)).astype(np.float32)])
    x_te = rng.normal(size=(5, 4)).astype(np.float32)
    a = TabPFNClassifier(model=_flax_model(), ensemble_size=1,
                         class_shifts=[1], feature_shifts=[0], seed=7)
    b = TabPFNClassifier(model=_flax_model(), ensemble_size=1,
                         class_shifts=[0], feature_shifts=[0], seed=7)
    pa = a.fit(x_tr, y).predict_proba(x_te)
    pb = b.fit(x_tr, (y + 1) % 3).predict_proba(x_te)
    np.testing.assert_allclose(pa, pb[:, [1, 2, 0]], rtol=1e-5, atol=1e-6)


def test_classifier_surface():
    """fit/predict/predict_proba/embed shapes and the reference API."""
    rng = np.random.default_rng(6)
    x = rng.normal(size=(20, 9)).astype(np.float32)
    y = rng.integers(0, 2, size=20) * 2  # non-contiguous labels {0, 2}
    clf = TabPFNClassifier(model=_flax_model(), ensemble_size=4)
    clf.fit(x, y)
    probs = clf.predict_proba(x[:6])
    assert probs.shape == (6, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    pred, p = clf.predict(x[:6], return_winning_probability=True)
    assert set(np.unique(pred)) <= {0, 2} and p.shape == (6,)
    emb = clf.embed(x[:6])
    assert emb.shape == (6, NHID)  # the fusion 'tabular_embedding' feed


def test_convert_cli_artifact(tmp_path, pair):
    """The reference's tabular_baseline.pth converts via the tool path."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from convert_reference import convert_lightning_checkpoint

    tm, fm, variables = pair
    path = tmp_path / "tabular_baseline.pth"
    torch.save({"model_state_dict": tm.state_dict(),
                "tabular_baseline_F1": 0.85}, path)
    got_vars, hparams = convert_lightning_checkpoint(str(path), "tabpfn")
    assert hparams["tabular_baseline_F1"] == pytest.approx(0.85)
    rng = np.random.default_rng(8)
    x = rng.normal(size=(7, NFEAT)).astype(np.float32)
    y = rng.integers(0, 2, size=4).astype(np.float32)
    a = fm.apply(variables, x, y, 4)["logits"]
    b = fm.apply(got_vars, x, y, 4)["logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_evaluate_tabpfn_protocol(tmp_path, pair):
    """Converted artifact -> in-context refit -> bootstrap test protocol."""
    from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split
    from multimodal_alzheimer_tpu.inference.test_tab import evaluate_tabpfn
    from multimodal_alzheimer_tpu.train.checkpoint import save_checkpoint

    tm, fm, variables = pair
    ckpt = str(tmp_path / "tabpfn_ckpt")
    save_checkpoint(ckpt, variables, {"tabular_baseline_F1": 0.8})
    csvs = write_synthetic_split(str(tmp_path / "data"),
                                 n_subjects=(16, 4, 6), seed=3,
                                 volume_shape=(6, 7, 6),
                                 write_volumes=False)
    scalars = evaluate_tabpfn(ckpt, "tabpfn_test", n_classes=2,
                              ensemble_size=2, n_bootstrap=50,
                              out_dir=str(tmp_path / "out"),
                              train_csv=csvs["train"], test_csv=csvs["test"])
    assert 0.0 <= scalars["test_f1_epoch"] <= 1.0
    assert np.isfinite(scalars["test_f1_epoch_ci"])
    assert scalars["tabular_baseline_F1"] == pytest.approx(0.8)
    pngs = list((tmp_path / "out").glob("*.png"))
    assert len(pngs) == 3  # the three reference CM styles


def test_tabular_embedding_dataset_pipeline(tmp_path):
    """Precomputed TabPFN embeddings ride the loader into the fusion feed."""
    from multimodal_alzheimer_tpu.data.dataset import (
        MultiModalDataset, TabularEmbeddingDataset)
    from multimodal_alzheimer_tpu.data.pipeline import DataLoader
    from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split
    from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import (
        TabularMLP)
    import jax

    csvs = write_synthetic_split(str(tmp_path / "data"),
                                 n_subjects=(10, 2, 2), seed=9,
                                 volume_shape=(6, 7, 6),
                                 write_volumes=False)
    base = MultiModalDataset(path=csvs["train"], modalities=["tabular"],
                             binary_classification=True)
    clf = TabPFNClassifier(model=_flax_model(), ensemble_size=2)
    x = np.stack([base[i]["tabular"] for i in range(len(base))])
    y = np.asarray([int(base[i]["label"]) for i in range(len(base))])
    clf.fit(x.astype(np.float32), y)
    ds = TabularEmbeddingDataset.from_tabpfn(base, clf)
    assert ds.embeddings.shape == (len(base), NHID)
    # frozen model + fixed row => sidecar equals a fresh recompute
    np.testing.assert_allclose(ds[0]["tabular_embedding"],
                               clf.embed(x[:1].astype(np.float32))[0],
                               rtol=1e-5, atol=1e-6)
    batch = next(iter(DataLoader(ds, batch_size=4, shuffle=False,
                                 num_workers=0)))
    assert batch["tabular_embedding"].shape == (4, NHID)
    m = TabularMLP(n_classes=2)
    v = m.init(jax.random.PRNGKey(0), {k: batch[k] for k in
                                       ("tabular", "tabular_embedding")})
    out = m.apply(v, batch)
    # the pass-through consumed the embedding, not the raw features
    np.testing.assert_allclose(
        np.asarray(out["embeddings"]["decoder"]),
        np.asarray(batch["tabular_embedding"]), rtol=1e-6)


def test_mesh_sharded_ensemble_matches_single_device():
    """Ensemble axis sharded over the 8-dev mesh == unsharded result."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("ens",))
    rng = np.random.default_rng(11)
    x_tr = rng.normal(size=(18, 5)).astype(np.float32)
    y_tr = rng.integers(0, 2, size=18)
    x_te = rng.normal(size=(4, 5)).astype(np.float32)
    kw = dict(ensemble_size=8, seed=13)
    ref = TabPFNClassifier(model=_flax_model(), **kw).fit(x_tr, y_tr)
    sharded = TabPFNClassifier(model=_flax_model(), mesh=mesh,
                               **kw).fit(x_tr, y_tr)
    np.testing.assert_allclose(sharded.predict_proba(x_te),
                               ref.predict_proba(x_te), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(sharded.embed(x_te), ref.embed(x_te),
                               rtol=1e-4, atol=1e-5)
    bad = TabPFNClassifier(model=_flax_model(), mesh=mesh,
                           ensemble_size=3).fit(x_tr, y_tr)
    with pytest.raises(ValueError, match="must divide"):
        bad.predict_proba(x_te)


def test_pfn_mask_values():
    m = np.asarray(pfn_attention_mask(4, 2))
    finite = np.isfinite(m)
    expected = np.array([[1, 1, 0, 0], [1, 1, 0, 0],
                         [1, 1, 1, 0], [1, 1, 0, 1]], bool)
    np.testing.assert_array_equal(finite, expected)
    assert (m[finite] == 0).all()
