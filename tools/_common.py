"""Shared helpers for the standalone tools."""

from __future__ import annotations

import os
import sys
from pathlib import Path

# tools/ runs standalone from a source checkout
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Honor JAX_PLATFORMS from the environment: the TPU image's sitecustomize
# re-pins jax to the axon plugin after env evaluation, so a caller exporting
# JAX_PLATFORMS=cpu (tests, headless label tooling) would silently land on
# the TPU tunnel. jax.config.update is the only override that sticks.
if os.environ.get("JAX_PLATFORMS"):
    import jax  # noqa: E402

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402


def load_yolo_labels(label_path: Path) -> np.ndarray:
    """(N,5) [cls, cx, cy, w, h] normalized; empty when absent."""
    from geotrax_tpu.train.data import load_label

    return load_label(label_path)


def iter_images(folder: Path):
    for ext in ("*.jpg", "*.jpeg", "*.png", "*.bmp"):
        yield from sorted(Path(folder).glob(ext))
