"""Central path registry (reference load_path_config.py parity).

``path_config.yaml`` maps dataset CSVs, the log directory and best-model
checkpoints to paths; the ``relative`` block is resolved against an explicit
root (defaulting to the CWD, as the reference does —
reference: pkg/utils/load_path_config.py:5-24).
"""

from __future__ import annotations

from pathlib import Path

import yaml


def load_path_config(config_path: str = "path_config.yaml",
                     root: str | None = None) -> dict:
    with open(config_path, "r") as f:
        paths = yaml.safe_load(f)

    base = Path(root) if root is not None else Path.cwd()
    out = {}
    if "relative" in paths:
        for key, value in paths["relative"].items():
            out[key] = base / value
    for key, value in paths.items():
        if key != "relative":
            out[key] = Path(value)
    return out
