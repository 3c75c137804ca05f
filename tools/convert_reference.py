"""Convert reference (torch/Lightning) checkpoints to this framework.

Migration path for users of the reference pipeline: a Lightning ``.ckpt``
(``{'state_dict', 'hyper_parameters'}``) converts into this framework's
orbax checkpoint with the same hparams embedded, so ``test_<model>.py``
and the fusion grafting consume it directly.

Supported:
  * Small_PET_CNN (reference pet_models/pet_cnn.py:14-45)
  * Anat_CNN / PET_CNN_ResNet (Med3D backbone + conv_seg head,
    mri_models/anat_cnn.py:33-79) — backbone via convert_medicalnet.

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
    if linear_out:
        params["hidden"] = {"kernel": _linear(sd[f"model.{idx}.weight"]),
                            "bias": np.asarray(sd[f"model.{idx}.bias"])}
        idx += 2  # Linear, ReLU
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
    head_p["cls"] = {"kernel": _linear(head_sd[f"{idx}.weight"]),
                     "bias": np.asarray(head_sd[f"{idx}.bias"])}

    params = {"backbone": backbone["params"], "head": head_p}
    stats = {"backbone": backbone["batch_stats"]}
    if head_s:
        stats["head"] = head_s
    return {"params": params, "batch_stats": stats}


CONVERTERS = {
    "pet_cnn": convert_small_pet_cnn,
    "anat_cnn": convert_anat_cnn,
    "pet_resnet_cnn": convert_anat_cnn,
}


def convert_lightning_checkpoint(ckpt_path: str, arch: str) -> tuple:
    """Load a Lightning .ckpt and convert: returns (variables, hparams)."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()
          if hasattr(v, "numpy")}
    hparams = dict(ckpt.get("hyper_parameters", {}))
    return CONVERTERS[arch](sd, hparams), hparams


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt")
    parser.add_argument("out_dir")
    parser.add_argument("--arch", required=True, choices=sorted(CONVERTERS))
    args = parser.parse_args(argv)

    variables, hparams = convert_lightning_checkpoint(args.ckpt, args.arch)
    from multimodal_alzheimer_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(args.out_dir, variables, hparams)
    print(f"wrote {args.out_dir}")


if __name__ == "__main__":
    main()
