"""Checkpoint conversion: torch .pt (ultralytics layout) -> JAX parameter trees.

The bundled reference detector ships as an ultralytics torch checkpoint
(hf://rfonod/geo-trax/geotrax_hbb_yolov8s_1920_v1.pt). This module reads such
checkpoints with torch (CPU) and maps the conv/bn weights onto our Flax
YOLOv8 parameter tree; it also reads/writes our native .npz export carrying
the params plus metadata (class names, imgsz, variant).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def read_class_names(model_path: Path) -> Optional[dict]:
    """Extract {class_id: name} from a checkpoint file, or None."""
    model_path = Path(model_path)
    if not model_path.is_file():
        return None
    if model_path.suffix == ".npz":
        with np.load(model_path, allow_pickle=True) as data:
            if "class_names" in data:
                raw = data["class_names"].item()
                return {int(k): str(v) for k, v in raw.items()}
        return None
    if model_path.suffix == ".pt":
        import torch

        ckpt = torch.load(model_path, map_location="cpu", weights_only=False)
        model = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        names = getattr(model, "names", None)
        if isinstance(names, dict):
            return {int(k): str(v) for k, v in names.items()}
        if isinstance(names, (list, tuple)):
            return {i: str(v) for i, v in enumerate(names)}
    return None


def torch_state_dict(model_path: Path) -> dict:
    """Flat {name: numpy array} state dict from an ultralytics .pt checkpoint."""
    import torch

    ckpt = torch.load(Path(model_path), map_location="cpu", weights_only=False)
    model = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(model, "float"):
        model = model.float()
    state = model.state_dict() if hasattr(model, "state_dict") else model
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def save_npz(path: Path, params: dict, class_names: Optional[dict] = None, **meta) -> None:
    """Save a flattened JAX parameter tree plus metadata as .npz."""
    import jax

    flat = {}
    for keypath, value in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        flat[f"param:{name}"] = np.asarray(value)
    if class_names is not None:
        flat["class_names"] = np.array(class_names, dtype=object)
    for key, value in meta.items():
        flat[f"meta:{key}"] = np.array(value)
    np.savez(Path(path), **flat)


def load_npz(path: Path) -> tuple[dict, dict]:
    """Load (nested params, metadata) from a .npz written by save_npz."""
    params: dict = {}
    meta: dict = {}
    with np.load(Path(path), allow_pickle=True) as data:
        for key in data.files:
            if key.startswith("param:"):
                node = params
                parts = key[len("param:"):].split("/")
                for part in parts[:-1]:
                    node = node.setdefault(part, {})
                node[parts[-1]] = data[key]
            elif key == "class_names":
                meta["class_names"] = {int(k): str(v) for k, v in data[key].item().items()}
            elif key.startswith("meta:"):
                meta[key[len("meta:"):]] = data[key].item()
    return params, meta
