"""Convert MedicalNet pretrained torch weights to this framework's format.

The reference loads ``resnet_{10,18,50}_23dataset.pth``
(reference: mri_models/anat_cnn.py:18-31). This tool maps that torch
state_dict onto the flax MedicalNetResNet3D parameter tree (NDHWC: torch
OIDHW conv kernels transpose to DHWIO) and writes an orbax checkpoint that
``train.checkpoint.load_checkpoint``/``graft_params`` consume.

Usage:
    python tools/convert_medicalnet.py resnet_18_23dataset.pth out_dir \
        --depth 18

Without a .pth file (no ADNI lab access in CI), ``convert_state_dict`` is
unit-testable against a randomly initialized torch Med3D-like state dict.
"""

from __future__ import annotations

import argparse
import re
from typing import Dict

import numpy as np

from multimodal_alzheimer_tpu.models.resnet3d import BLOCK_CONFIGS


def _conv_kernel(tensor) -> np.ndarray:
    """torch Conv3d weight (O, I, D, H, W) -> flax (D, H, W, I, O)."""
    return np.ascontiguousarray(np.transpose(np.asarray(tensor),
                                             (2, 3, 4, 1, 0)))


def _bn(params: Dict, stats: Dict, prefix: str, sd: Dict, key: str):
    params[prefix] = {"scale": np.asarray(sd[f"{key}.weight"]),
                      "bias": np.asarray(sd[f"{key}.bias"])}
    stats[prefix] = {"mean": np.asarray(sd[f"{key}.running_mean"]),
                     "var": np.asarray(sd[f"{key}.running_var"])}


def convert_state_dict(sd: Dict, depth: int) -> dict:
    """torch Med3D state_dict -> {'params', 'batch_stats'} for
    MedicalNetResNet3D (backbone only; the head is trained fresh)."""
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}
    block_kind, layout = BLOCK_CONFIGS[depth]
    conv_names = (("conv1", "conv2") if block_kind == "basic"
                  else ("conv1", "conv2", "conv3"))

    params: Dict = {"conv1": {"kernel": _conv_kernel(sd["conv1.weight"])}}
    stats: Dict = {}
    _bn(params, stats, "bn1", sd, "bn1")

    for li in range(1, 5):
        for bi in range(layout[li - 1]):
            src = f"layer{li}.{bi}"
            dst = f"layer{li}_block{bi}"
            bp: Dict = {}
            bs: Dict = {}
            for ci, _ in enumerate(conv_names, start=1):
                bp[f"conv{ci}"] = {
                    "kernel": _conv_kernel(sd[f"{src}.conv{ci}.weight"])}
                _bn(bp, bs, f"bn{ci}", sd, f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv_kernel(sd[f"{src}.downsample.0.weight"])}
                _bn(bp, bs, "downsample_bn", sd, f"{src}.downsample.1")
            params[dst] = bp
            stats[dst] = bs
    return {"params": params, "batch_stats": stats}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("pth")
    parser.add_argument("out_dir")
    parser.add_argument("--depth", type=int, required=True,
                        choices=sorted(BLOCK_CONFIGS))
    args = parser.parse_args(argv)

    import torch

    sd = torch.load(args.pth, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    variables = convert_state_dict(sd, args.depth)

    from multimodal_alzheimer_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(args.out_dir, variables,
                    {"resnet_depth": args.depth,
                     "source": "MedicalNet 23dataset"})
    print(f"wrote {args.out_dir}")


if __name__ == "__main__":
    main()
