"""Checkpointing: orbax serialization, top-k managers, parameter grafting.

Reference behaviors reproduced (SURVEY.md §5 checkpoint/resume):
  * two top-k managers per run — best-k by val_loss (min) and by val_f1
    (max), filename templates ``epoch={E}-val_loss={v:.3f}`` /
    ``epoch={E}-val_f1={v:.3f}`` (reference: train_pet_cnn.py:191-200),
  * hyperparameters embedded in every checkpoint so models reconstruct
    without external config (``save_hyperparameters``, base_model.py:14),
  * the fusion stages' "checkpoint surgery" becomes ``graft_params``:
    stage-1/2 parameter subtrees are loaded into the fusion model's
    matching submodule paths (instead of torch module slicing,
    anat_pet_fusion.py:16-32).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _to_serializable(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str | Path, variables: dict, hparams: dict,
                    metrics: Optional[dict] = None) -> None:
    """Write {params, batch_stats} + hparams.json (+ metrics.json)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "state", _to_serializable(variables))
    ckptr.wait_until_finished()
    with open(path / "hparams.json", "w") as f:
        json.dump(_jsonable(hparams), f, indent=2)
    if metrics is not None:
        with open(path / "metrics.json", "w") as f:
            json.dump(_jsonable(metrics), f, indent=2)


def load_checkpoint(path: str | Path):
    """Returns (variables, hparams, metrics|None)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(path / "state")
    with open(path / "hparams.json") as f:
        hparams = json.load(f)
    metrics = None
    metrics_file = path / "metrics.json"
    if metrics_file.exists():
        with open(metrics_file) as f:
            metrics = json.load(f)
    return variables, hparams, metrics


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.ndarray, jax.Array)):
        return np.asarray(obj).tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


class TopKCheckpointManager:
    """Keep the k best checkpoints by one metric (min or max).

    The reference runs two Lightning ModelCheckpoint callbacks per training
    (train_pet_cnn.py:191-200); instantiate two of these.
    """

    def __init__(self, root: str | Path, metric: str, mode: str = "min",
                 top_k: int = 3, filename_metric: Optional[str] = None):
        self.root = Path(root)
        self.metric = metric
        self.mode = mode
        self.top_k = top_k
        self.filename_metric = filename_metric or metric
        self.entries: list[tuple[float, str]] = []  # (value, dir)
        self.root.mkdir(parents=True, exist_ok=True)

    def _better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def consider(self, epoch: int, metrics: dict, variables: dict,
                 hparams: dict) -> Optional[str]:
        """Save if within top-k; returns the checkpoint dir or None."""
        value = float(metrics[self.metric])
        if len(self.entries) >= self.top_k:
            worst = self.entries[-1][0]
            if not self._better(value, worst):
                return None
        name = f"epoch={epoch}-{self.filename_metric}={value:.3f}"
        path = self.root / name
        save_checkpoint(path, variables, hparams, metrics)
        self.entries.append((value, str(path)))
        self.entries.sort(key=lambda e: e[0],
                          reverse=(self.mode == "max"))
        while len(self.entries) > self.top_k:
            _, evict = self.entries.pop()
            if evict != str(path) and os.path.isdir(evict):
                shutil.rmtree(evict, ignore_errors=True)
            elif evict == str(path):
                # the new ckpt itself fell out (can't happen due to the
                # early return, but keep the invariant safe)
                shutil.rmtree(evict, ignore_errors=True)
        return str(path)

    @property
    def best_path(self) -> Optional[str]:
        return self.entries[0][1] if self.entries else None

    @property
    def best_value(self) -> Optional[float]:
        return self.entries[0][0] if self.entries else None


def save_train_state(path: str | Path, state, hparams: dict,
                     extra: Optional[dict] = None) -> None:
    """Full mid-run checkpoint: params, batch stats, optimizer state, step
    and lr_scale — resumable training (a capability the reference lacks;
    its ModelCheckpoints only feed evaluation/fusion, SURVEY §5)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    import flax.serialization

    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        # state-dict form: name-keyed nested dicts, so restoration maps by
        # PATH into the optimizer's typed state (leaf-order restoration
        # would scramble multi_transform group states)
        "opt_state": flax.serialization.to_state_dict(state.opt_state),
        "step": state.step,
        "lr_scale": state.lr_scale,
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "train_state", _to_serializable(tree))
    ckptr.wait_until_finished()
    with open(path / "hparams.json", "w") as f:
        json.dump(_jsonable(hparams), f, indent=2)
    if extra:
        with open(path / "extra.json", "w") as f:
            json.dump(_jsonable(extra), f, indent=2)


def load_train_state(path: str | Path, optimizer):
    """Restore a TrainState saved by ``save_train_state``.

    ``optimizer`` must be the same optax transformation used originally
    (its state pytree structure defines the restored opt_state).
    """
    import orbax.checkpoint as ocp

    from multimodal_alzheimer_tpu.train.state import TrainState

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(path / "train_state")
    with open(path / "hparams.json") as f:
        hparams = json.load(f)

    import flax.serialization
    import jax.numpy as jnp

    # rebuild the typed opt_state from the optimizer's own init structure,
    # mapping by state-dict path (robust for multi_transform group dicts)
    template = optimizer.init(tree["params"])
    opt_state = flax.serialization.from_state_dict(template,
                                                   tree["opt_state"])

    state = TrainState(step=jnp.asarray(tree["step"]),
                       params=tree["params"],
                       batch_stats=tree.get("batch_stats") or {},
                       opt_state=opt_state,
                       lr_scale=jnp.asarray(tree["lr_scale"]))
    return state, hparams


def graft_params(target_variables: dict, grafts: dict[str, dict]) -> dict:
    """Load pretrained subtrees into a fusion model's parameter tree.

    Args:
      target_variables: the fusion model's init-time {'params', ...}.
      grafts: submodule name (e.g. 'pet_model') -> that submodule's
        {'params', 'batch_stats'} from a stage-1 checkpoint. Nested paths
        use '/' (e.g. 'model_anat_pet/pet_model').

    Returns a new variables dict with the subtrees replaced. Structures
    must match; a mismatch raises (catches wiring bugs the reference's
    load_state_dict would silently mis-map).
    """
    import flax

    out = flax.core.unfreeze(target_variables)
    for sub_path, sub_vars in grafts.items():
        keys = sub_path.split("/")
        for collection in ("params", "batch_stats"):
            if collection not in sub_vars or sub_vars[collection] is None:
                continue
            if collection not in out:
                if _tree_size(sub_vars[collection]) == 0:
                    continue
                raise ValueError(f"target has no collection {collection}")
            node = out[collection]
            for k in keys[:-1]:
                node = node[k]
            leaf_name = keys[-1]
            if leaf_name not in node:
                if collection == "batch_stats" and \
                        _tree_size(sub_vars[collection]) == 0:
                    continue
                raise ValueError(
                    f"{sub_path} not in target {collection} tree "
                    f"(have: {list(node.keys())})")
            _check_same_structure(node[leaf_name], sub_vars[collection],
                                  f"{collection}/{sub_path}")
            node[leaf_name] = sub_vars[collection]
    return out


# Stage-3 duplicate tower pairs (canonical, duplicate). The reference's
# All_Modalities_Fusion holds TWO private copies of each stage-1 tower
# (all_modalities_fusion.py:66-79: pet in anat_pet+pet_tab, mri in
# anat_pet+anat_tab, tab in anat_tab+pet_tab); the frozen grafting regime
# loads the same stage-1 checkpoint into both, so they are identical by
# construction. AllModalitiesFusion.share_towers reads only the canonical
# copy; these helpers keep/verify the duplicates' checkpoint-level parity.
TOWER_DUPLICATES = (
    ("model_anat_pet/pet_model", "model_pet_tab/pet_model"),
    ("model_anat_pet/mri_model", "model_anat_tab/mri_model"),
    ("model_anat_tab/tab_model", "model_pet_tab/tab_model"),
)


def _walk(tree, path: str):
    node = tree
    for k in path.split("/"):
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def sync_tower_duplicates(variables: dict,
                          pairs=TOWER_DUPLICATES) -> dict:
    """Copy each canonical tower subtree over its duplicate.

    Used when training/saving with ``share_towers=True``: the shared
    forward only visits (and only updates the BN stats of) the canonical
    copies, so saved checkpoints sync the duplicates to stay bit-identical
    to the reference's unshared regime, where both copies see the same
    batches and update identically. No-op for pairs absent from the tree.
    """
    import flax

    out = flax.core.unfreeze(variables)
    for collection in ("params", "batch_stats"):
        if collection not in out:
            continue
        for canonical, duplicate in pairs:
            src = _walk(out[collection], canonical)
            if src is None:
                continue
            keys = duplicate.split("/")
            node = out[collection]
            for k in keys[:-1]:
                if not isinstance(node, dict) or k not in node:
                    node = None
                    break
                node = node[k]
            if node is None or keys[-1] not in node:
                continue
            _check_same_structure(node[keys[-1]], src,
                                  f"{collection}/{duplicate}")
            # real copies, not aliases: the result may feed a train step
            # whose donation machinery rejects the same buffer appearing
            # twice in the argument tree
            node[keys[-1]] = jax.tree_util.tree_map(
                lambda x: jnp.array(x) if isinstance(x, jax.Array)
                else np.copy(x), src)
    return out


def assert_tower_duplicates_equal(variables: dict,
                                  pairs=TOWER_DUPLICATES) -> None:
    """Raise if any duplicate tower subtree differs from its canonical.

    Guard before enabling ``share_towers`` on a restored checkpoint: a
    checkpoint whose stage-2 sub-models trained their towers *unfrozen*
    holds genuinely different duplicates, and sharing would silently
    change its predictions.
    """
    for collection in ("params", "batch_stats"):
        if collection not in variables:
            continue
        for canonical, duplicate in pairs:
            src = _walk(variables[collection], canonical)
            dst = _walk(variables[collection], duplicate)
            if src is None or dst is None:
                continue
            _check_same_structure(dst, src, f"{collection}/{duplicate}")
            for (path, a), (_, b) in zip(
                    jax.tree_util.tree_flatten_with_path(src)[0],
                    jax.tree_util.tree_flatten_with_path(dst)[0]):
                if not np.array_equal(np.asarray(a), np.asarray(b)):
                    raise ValueError(
                        f"tower duplicate mismatch: {collection}/"
                        f"{duplicate}{jax.tree_util.keystr(path)} differs "
                        f"from its canonical {canonical} copy — this "
                        "checkpoint was not trained/grafted in the frozen "
                        "regime; share_towers would change its outputs")


def _tree_size(tree) -> int:
    return len(jax.tree_util.tree_leaves(tree))


def _check_same_structure(a, b, where: str) -> None:
    ta = jax.tree_util.tree_structure(a)
    tb = jax.tree_util.tree_structure(b)
    if ta != tb:
        raise ValueError(f"graft structure mismatch at {where}:\n"
                         f"  target: {ta}\n  source: {tb}")
    for (pa, la), (_, lb) in zip(
            jax.tree_util.tree_flatten_with_path(a)[0],
            jax.tree_util.tree_flatten_with_path(b)[0]):
        if np.shape(la) != np.shape(lb):
            raise ValueError(
                f"graft shape mismatch at {where}{jax.tree_util.keystr(pa)}: "
                f"{np.shape(la)} vs {np.shape(lb)}")
