"""Convert reference (torch/Lightning) checkpoints to this framework.

Migration path for users of the reference pipeline: a Lightning ``.ckpt``
(``{'state_dict', 'hyper_parameters'}``) converts into this framework's
orbax checkpoint with the same hparams embedded, so ``test_<model>.py``
and the fusion grafting consume it directly.

Supported (all 9 reference model classes):
  * Small_PET_CNN (reference pet_models/pet_cnn.py:14-45)
  * Anat_CNN / PET_CNN_ResNet (Med3D backbone + conv_seg head,
    mri_models/anat_cnn.py:33-79) — backbone via convert_medicalnet
  * PET_MRI_EF (early fusion; same Sequential recipe, early_fusion.py:29-59)
  * PET_MRI_FMF (twin towers + fused tower, anat_pet_featuremapfusion.py)
  * Anat_PET_CNN / Tabular_MRT_Model / PET_TABULAR_CNN /
    All_Modalities_Fusion — the checkpoint-surgery chain
    (anat_pet_fusion.py:16-32, all_modalities_fusion.py:16-31). Fusion
    conversions are *partial*: surgically-removed stage-1 classifier
    weights and the TabPFN branch stay at init (they never reach the
    fusion logits); merge with ``merge_variables`` over ``model.init``.
    TabPFN decoder activations computed offline feed the converted models
    via the 'tabular_embedding' batch key for exact fusion-path parity.

Mapping notes: torch Conv3d weights (O, I, D, H, W) -> flax (D, H, W, I,
O); torch Linear (O, I) -> flax (I, O); BatchNorm running stats map to the
'batch_stats' collection.

Usage:
    python tools/convert_reference.py ckpt.ckpt out_dir --arch pet_cnn
"""

from __future__ import annotations

import argparse
import re
from typing import Dict

import numpy as np

from convert_medicalnet import convert_state_dict as convert_backbone


def _conv_kernel(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))


def _linear(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def convert_small_pet_cnn(sd: Dict, hparams: Dict) -> dict:
    """torch Small_PET_CNN state_dict -> SmallPETCNN variables.

    The reference model is one nn.Sequential under 'model.'; module indices
    are reconstructed from hparams exactly as pet_cnn.py:14-45 builds them.
    """
    conv_out = list(hparams["conv_out"])
    batchnorm = bool(hparams.get("batchnorm", False))
    has_conv_dropout = "dropout_conv_p" in hparams
    linear_out = hparams.get("linear_out") or 0
    has_dense_dropout = "dropout_dense_p" in hparams and linear_out

    params: Dict = {"convs": {}}
    stats: Dict = {"convs": {}}
    idx = 0
    for i in range(len(conv_out)):
        block_p: Dict = {
            "conv": {"kernel": _conv_kernel(sd[f"model.{idx}.weight"]),
                     "bias": np.asarray(sd[f"model.{idx}.bias"])}}
        idx += 1
        if batchnorm:
            block_p["bn"] = {
                "scale": np.asarray(sd[f"model.{idx}.weight"]),
                "bias": np.asarray(sd[f"model.{idx}.bias"])}
            stats["convs"][f"block_{i}"] = {"bn": {
                "mean": np.asarray(sd[f"model.{idx}.running_mean"]),
                "var": np.asarray(sd[f"model.{idx}.running_var"])}}
            idx += 1
        idx += 2  # ReLU, MaxPool
        if has_conv_dropout:
            idx += 1  # Dropout
        params["convs"][f"block_{i}"] = block_p
    idx += 2  # GAP, Flatten
    if has_dense_dropout:
        idx += 1  # Dropout
    # Presence guards: stage-2 surgery truncates the Sequential
    # (model[:-3] drops hidden+cls, model[:-1] drops cls —
    # anat_pet_fusion.py:28-31) but keeps the original module indices.
    if linear_out and f"model.{idx}.weight" in sd:
        params["hidden"] = {"kernel": _linear(sd[f"model.{idx}.weight"]),
                            "bias": np.asarray(sd[f"model.{idx}.bias"])}
    if linear_out:
        idx += 2  # Linear, ReLU
    if f"model.{idx}.weight" in sd:
        params["cls"] = {"kernel": _linear(sd[f"model.{idx}.weight"]),
                         "bias": np.asarray(sd[f"model.{idx}.bias"])}
    variables = {"params": params}
    if batchnorm:
        variables["batch_stats"] = stats
    return variables


def convert_anat_cnn(sd: Dict, hparams: Dict) -> dict:
    """torch Anat_CNN (or PET_CNN_ResNet) state_dict -> AnatCNN variables.

    Splits the state_dict into the Med3D backbone ('model.*' minus
    conv_seg) and the conv_seg head, reconstructing head module indices
    from hparams (anat_cnn.py:33-79).
    """
    backbone_sd = {re.sub(r"^model\.", "", k): v for k, v in sd.items()
                   if k.startswith("model.")
                   and not k.startswith("model.conv_seg")}
    head_sd = {re.sub(r"^model\.conv_seg\.", "", k): v
               for k, v in sd.items() if k.startswith("model.conv_seg.")}

    depth = int(hparams["resnet_depth"])
    backbone = convert_backbone(backbone_sd, depth)

    head_p: Dict = {}
    head_s: Dict = {}
    idx = 0
    if hparams.get("batchnorm_begin"):
        head_p["bn_begin"] = {
            "scale": np.asarray(head_sd[f"{idx}.weight"]),
            "bias": np.asarray(head_sd[f"{idx}.bias"])}
        head_s["bn_begin"] = {
            "mean": np.asarray(head_sd[f"{idx}.running_mean"]),
            "var": np.asarray(head_sd[f"{idx}.running_var"])}
        idx += 1
    conv_out = list(hparams.get("conv_out") or ())
    for i in range(len(conv_out)):
        if f"{idx}.weight" not in head_sd:
            break  # conv_seg[:2] surgery dropped the conv stack
        head_p[f"conv_{i}"] = {
            "kernel": _conv_kernel(head_sd[f"{idx}.weight"]),
            "bias": np.asarray(head_sd[f"{idx}.bias"])}
        idx += 1
        if hparams.get("batchnorm_conv"):
            head_p[f"bn_conv_{i}"] = {
                "scale": np.asarray(head_sd[f"{idx}.weight"]),
                "bias": np.asarray(head_sd[f"{idx}.bias"])}
            head_s[f"bn_conv_{i}"] = {
                "mean": np.asarray(head_sd[f"{idx}.running_mean"]),
                "var": np.asarray(head_sd[f"{idx}.running_var"])}
            idx += 1
        idx += 2  # ReLU, MaxPool
    idx += 2  # GAP, Flatten
    linear_out = list(hparams.get("linear_out") or ())
    for i in range(len(linear_out)):
        if f"{idx}.weight" not in head_sd:
            break  # conv_seg[:2] surgery dropped the dense stack
        head_p[f"dense_{i}"] = {
            "kernel": _linear(head_sd[f"{idx}.weight"]),
            "bias": np.asarray(head_sd[f"{idx}.bias"])}
        idx += 1
        if hparams.get("batchnorm_dense"):
            head_p[f"bn_dense_{i}"] = {
                "scale": np.asarray(head_sd[f"{idx}.weight"]),
                "bias": np.asarray(head_sd[f"{idx}.bias"])}
            head_s[f"bn_dense_{i}"] = {
                "mean": np.asarray(head_sd[f"{idx}.running_mean"]),
                "var": np.asarray(head_sd[f"{idx}.running_var"])}
            idx += 1
        idx += 1  # ReLU
    if f"{idx}.weight" in head_sd:
        head_p["cls"] = {"kernel": _linear(head_sd[f"{idx}.weight"]),
                         "bias": np.asarray(head_sd[f"{idx}.bias"])}

    params = {"backbone": backbone["params"], "head": head_p}
    stats = {"backbone": backbone["batch_stats"]}
    if head_s:
        stats["head"] = head_s
    return {"params": params, "batch_stats": stats}


def _sub_sd(sd: Dict, prefix: str, new_prefix: str = "model.") -> Dict:
    """Extract a submodule's state_dict, re-prefixed for the converters.

    torch ``nn.Sequential`` slicing preserves the original module indices,
    so truncated stage-1 towers inside fusion checkpoints keep the index
    layout the stage-1 converters reconstruct from hparams.
    """
    return {new_prefix + k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def _dense(sd: Dict, key: str, alt: str = None) -> Dict:
    """One torch Linear -> flax Dense params, with an alternate key (the
    fusion heads register stage2out/cls2 both as attributes and inside the
    shared model_fuse Sequential)."""
    if f"{key}.weight" not in sd and alt is not None:
        key = alt
    return {"kernel": _linear(sd[f"{key}.weight"]),
            "bias": np.asarray(sd[f"{key}.bias"])}


def merge_variables(base: dict, partial: dict) -> dict:
    """Overlay converted (possibly partial) subtrees onto init variables.

    Fusion conversions are partial by design: the reference's checkpoint
    surgery removes stage-1 classifier weights, and the TabPFN branch has
    no on-device counterpart — those leaves keep their init values (they
    never influence the fusion logits).
    """
    def _merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = _merge(out[k], v)
            else:
                out[k] = v
        return out

    import flax

    return _merge(flax.core.unfreeze(base), partial)


def convert_anat_pet_fusion(sd: Dict, hparams: Dict, pet_hparams: Dict,
                            mri_hparams: Dict) -> dict:
    """torch Anat_PET_CNN state_dict -> AnatPETFusion (partial) variables.

    Reference: fusion_models/anat_pet_fusion.py:16-51 — truncated stage-1
    towers under 'model_pet.'/'model_mri.', reduce_dim_mri Sequential
    (Linear at index 0), fuse head stage2out/cls2.
    """
    pet = convert_small_pet_cnn(_sub_sd(sd, "model_pet."), pet_hparams)
    mri = convert_anat_cnn(_sub_sd(sd, "model_mri.model.", "model."),
                           mri_hparams)
    params = {
        "pet_model": pet["params"],
        "mri_model": mri["params"],
        "reduce_dim_mri": _dense(sd, "reduce_dim_mri.0"),
        "stage2out": _dense(sd, "stage2out", "model_fuse.0"),
    }
    if "cls2.weight" in sd or "model_fuse.2.weight" in sd:
        params["cls2"] = _dense(sd, "cls2", "model_fuse.2")
    stats = {"mri_model": mri["batch_stats"]}
    if "batch_stats" in pet:
        stats["pet_model"] = pet["batch_stats"]
    return {"params": params, "batch_stats": stats}


def convert_tabular_mri_fusion(sd: Dict, hparams: Dict,
                               mri_hparams: Dict) -> dict:
    """torch Tabular_MRT_Model -> TabularMRIFusion (partial) variables.

    Reference: fusion_models/tabular_mri_fusion.py:12-48. The TabPFN
    branch has no converted weights — feed offline TabPFN decoder
    activations via the 'tabular_embedding' batch key for logit parity.
    """
    mri = convert_anat_cnn(_sub_sd(sd, "model_mri.model.", "model."),
                           mri_hparams)
    params = {
        "mri_model": mri["params"],
        "reduce_tab": _dense(sd, "reduce_tab.0"),
        "stage2out": _dense(sd, "stage2out", "model_fuse.0"),
    }
    if "cls2.weight" in sd or "model_fuse.2.weight" in sd:
        params["cls2"] = _dense(sd, "cls2", "model_fuse.2")
    return {"params": params, "batch_stats": {"mri_model": mri["batch_stats"]}}


def convert_pet_tabular_fusion(sd: Dict, hparams: Dict,
                               pet_hparams: Dict) -> dict:
    """torch PET_TABULAR_CNN -> PETTabularFusion (partial) variables.

    Reference: fusion_models/pet_tabular_fusion.py:17-61; reduce_tab is
    Linear(1024->512)+ReLU+Linear(512->64)+ReLU when ``simple_dim_red``
    (indices 0, 2), else Linear(1024->64)+ReLU (index 0).
    """
    pet = convert_small_pet_cnn(_sub_sd(sd, "model_pet."), pet_hparams)
    params = {"pet_model": pet["params"],
              "stage2out": _dense(sd, "stage2out", "model_fuse.0")}
    if hparams.get("simple_dim_red"):
        params["reduce_tab_0"] = _dense(sd, "reduce_tab.0")
        params["reduce_tab_1"] = _dense(sd, "reduce_tab.2")
    else:
        params["reduce_tab"] = _dense(sd, "reduce_tab.0")
    if "cls2.weight" in sd or "model_fuse.2.weight" in sd:
        params["cls2"] = _dense(sd, "cls2", "model_fuse.2")
    out = {"params": params}
    if "batch_stats" in pet:
        out["batch_stats"] = {"pet_model": pet["batch_stats"]}
    return out


def convert_all_modalities_fusion(sd: Dict, hparams: Dict,
                                  anat_pet_hparams: Dict,
                                  anat_tab_hparams: Dict,
                                  pet_tab_hparams: Dict,
                                  pet_hparams: Dict,
                                  mri_hparams: Dict) -> dict:
    """torch All_Modalities_Fusion -> AllModalitiesFusion (partial).

    Reference: fusion_models/all_modalities_fusion.py:16-57 — the three
    stage-2 submodels (their model_fuse cut to the pre-ReLU 64-d tap,
    :29-31) plus the stage-3 head stage3out/cls3.
    """
    sub_ap = convert_anat_pet_fusion(
        _sub_sd(sd, "model_anat_pet.", ""), anat_pet_hparams,
        pet_hparams, mri_hparams)
    sub_at = convert_tabular_mri_fusion(
        _sub_sd(sd, "model_anat_tab.", ""), anat_tab_hparams, mri_hparams)
    sub_pt = convert_pet_tabular_fusion(
        _sub_sd(sd, "model_pet_tab.", ""), pet_tab_hparams, pet_hparams)
    params = {
        "model_anat_pet": sub_ap["params"],
        "model_anat_tab": sub_at["params"],
        "model_pet_tab": sub_pt["params"],
        "stage3out": _dense(sd, "stage3out", "model_fuse.0"),
        "cls3": _dense(sd, "cls3", "model_fuse.2"),
    }
    stats = {"model_anat_pet": sub_ap["batch_stats"],
             "model_anat_tab": sub_at["batch_stats"]}
    if "batch_stats" in sub_pt:
        stats["model_pet_tab"] = sub_pt["batch_stats"]
    return {"params": params, "batch_stats": stats}


def convert_featuremap_fusion(sd: Dict, hparams: Dict) -> dict:
    """torch PET_MRI_FMF -> PETMRIFeatureMapFusion variables.

    Reference: fusion_models/anat_pet_featuremapfusion.py:34-93 — twin
    conv towers 'backbone_pet.'/'backbone_mri.' and the fused tower
    'fuse_model.' (n_layers_fusion conv blocks + GAP + Dense(64) + cls).
    """
    batchnorm = bool(hparams.get("batchnorm", False))
    has_conv_dropout = "dropout_conv_p" in hparams
    params: Dict = {}
    stats: Dict = {}

    for tower in ("backbone_pet", "backbone_mri"):
        tp: Dict = {}
        ts: Dict = {}
        idx = 0
        for i in range(len(hparams["conv_out"])):
            tp[f"block_{i}"] = {"conv": {
                "kernel": _conv_kernel(sd[f"{tower}.{idx}.weight"]),
                "bias": np.asarray(sd[f"{tower}.{idx}.bias"])}}
            idx += 1
            if batchnorm:
                tp[f"block_{i}"]["bn"] = {
                    "scale": np.asarray(sd[f"{tower}.{idx}.weight"]),
                    "bias": np.asarray(sd[f"{tower}.{idx}.bias"])}
                ts[f"block_{i}"] = {"bn": {
                    "mean": np.asarray(sd[f"{tower}.{idx}.running_mean"]),
                    "var": np.asarray(sd[f"{tower}.{idx}.running_var"])}}
                idx += 1
            idx += 2  # ReLU, MaxPool
            if has_conv_dropout:
                idx += 1
        params[tower] = tp
        if ts:
            stats[tower] = ts

    idx = 0
    for i in range(int(hparams.get("n_layers_fusion", 1))):
        params[f"fusion_conv_{i}"] = {
            "kernel": _conv_kernel(sd[f"fuse_model.{idx}.weight"]),
            "bias": np.asarray(sd[f"fuse_model.{idx}.bias"])}
        idx += 1
        if hparams.get("batchnorm_fusion"):
            params[f"fusion_bn_{i}"] = {
                "scale": np.asarray(sd[f"fuse_model.{idx}.weight"]),
                "bias": np.asarray(sd[f"fuse_model.{idx}.bias"])}
            stats[f"fusion_bn_{i}"] = {
                "mean": np.asarray(sd[f"fuse_model.{idx}.running_mean"]),
                "var": np.asarray(sd[f"fuse_model.{idx}.running_var"])}
            idx += 1
        idx += 2  # ReLU, MaxPool
    idx += 2  # GAP, Flatten
    if "dropout_dense_p" in hparams:
        idx += 1
    params["hidden"] = _dense(sd, f"fuse_model.{idx}")
    idx += 2  # Linear, ReLU
    params["cls"] = _dense(sd, f"fuse_model.{idx}")

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_tabpfn(sd: Dict, hparams: Dict) -> dict:
    """tabular_baseline.pth (reference dl_approach.py:44) -> TabPFN params.

    The reference saves ``classifier.model[2].state_dict()`` — the
    prior-fitted transformer itself — so this is a pure layout mapping
    (models/tabular_models/tabpfn.py:convert_state_dict), parity-tested
    against a torch replica in tests/test_tabpfn.py.
    """
    del hparams
    from multimodal_alzheimer_tpu.models.tabular_models.tabpfn import (
        convert_state_dict)

    return convert_state_dict(sd)


CONVERTERS = {
    "pet_cnn": convert_small_pet_cnn,
    "tabpfn": convert_tabpfn,
    "anat_cnn": convert_anat_cnn,
    "pet_resnet_cnn": convert_anat_cnn,
    "early_fusion": convert_small_pet_cnn,  # PET_MRI_EF shares the recipe
    "featuremap_fusion": convert_featuremap_fusion,
    # Fusion stages need stage-1 hparams too -- see
    # convert_fusion_lightning_checkpoint below.
    "anat_pet_fusion": convert_anat_pet_fusion,
    "tabular_mri_fusion": convert_tabular_mri_fusion,
    "pet_tabular_fusion": convert_pet_tabular_fusion,
    "all_modalities_fusion": convert_all_modalities_fusion,
}

# Converters whose extra positional args are stage-1/2 hparam dicts.
FUSION_EXTRA_HPARAMS = {
    "anat_pet_fusion": ("pet_hparams", "mri_hparams"),
    "tabular_mri_fusion": ("mri_hparams",),
    "pet_tabular_fusion": ("pet_hparams",),
    "all_modalities_fusion": ("anat_pet_hparams", "anat_tab_hparams",
                              "pet_tab_hparams", "pet_hparams",
                              "mri_hparams"),
}


def _load_ckpt(ckpt_path: str) -> tuple:
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    # Lightning .ckpt carries 'state_dict'; the TabPFN artifact
    # (dl_approach.py:44) carries 'model_state_dict' + its train F1.
    raw = ckpt.get("state_dict", ckpt.get("model_state_dict", ckpt))
    sd = {k: v.numpy() for k, v in raw.items() if hasattr(v, "numpy")}
    hparams = dict(ckpt.get("hyper_parameters", {}))
    if "tabular_baseline_F1" in ckpt:
        hparams["tabular_baseline_F1"] = float(ckpt["tabular_baseline_F1"])
    return sd, hparams


# How each fusion arch's extra hparams resolve to checkpoint paths inside
# the fusion checkpoint's own hyper_parameters (the reference embeds them:
# anat_pet_fusion.py:20-23, all_modalities_fusion.py:17-26).
_HPARAM_PATH_KEYS = {
    "pet_hparams": "path_pet",
    "mri_hparams": "path_mri",
    "anat_pet_hparams": "path_anat_pet",
    "anat_tab_hparams": "path_anat_tab",
    "pet_tab_hparams": "path_pet_tab",
}


def convert_lightning_checkpoint(ckpt_path: str, arch: str,
                                 sub_ckpts: Dict = None) -> tuple:
    """Load a Lightning .ckpt and convert: returns (variables, hparams).

    For fusion archs the converter needs the nested stage-1/2 hparams to
    reconstruct truncated-tower module indices; they are read from the
    checkpoints named in the fusion hparams (path_pet/path_mri/...), with
    ``sub_ckpts`` (e.g. {'pet_hparams': 'pet.ckpt'}) taking precedence.
    """
    sd, hparams = _load_ckpt(ckpt_path)
    extra_names = FUSION_EXTRA_HPARAMS.get(arch, ())
    extras = []
    for name in extra_names:
        override = (sub_ckpts or {}).get(name)
        path = override or hparams.get(_HPARAM_PATH_KEYS[name])
        if path is None:
            raise ValueError(
                f"{arch} conversion needs {name}: pass --sub "
                f"{name}=<stage ckpt> or ensure the fusion checkpoint's "
                f"hparams contain {_HPARAM_PATH_KEYS[name]}")
        extras.append(_load_ckpt(str(path))[1])
    return CONVERTERS[arch](sd, hparams, *extras), hparams


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt")
    parser.add_argument("out_dir")
    parser.add_argument("--arch", required=True, choices=sorted(CONVERTERS))
    parser.add_argument("--sub", action="append", default=[],
                        metavar="NAME=CKPT",
                        help="stage-1/2 checkpoint override, e.g. "
                             "pet_hparams=best_pet.ckpt")
    args = parser.parse_args(argv)

    sub_ckpts = dict(s.split("=", 1) for s in args.sub)
    variables, hparams = convert_lightning_checkpoint(
        args.ckpt, args.arch, sub_ckpts)
    from multimodal_alzheimer_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(args.out_dir, variables, hparams)
    print(f"wrote {args.out_dir}")


if __name__ == "__main__":
    main()
