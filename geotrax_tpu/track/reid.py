"""Learned ReID embedding head (cfg ``tracker.<name>.model: <path>.npz``).

Reference BoT-SORT accepts a ReID model reference via the tracker config
(reference cfg/default.yaml:377-379, ``model: auto``). The TPU build's
default appearance signature is a fixed orthonormal patch projection
(device_pipeline.embed_boxes) — deterministic and weight-free. When the
tracker block names an ``.npz`` weights file, this small convolutional head
replaces the projection so ``with_reid`` association costs use LEARNED
appearance.

Head: 32x32 RGB patch -> conv3x3(16)/2 SiLU -> conv3x3(32)/2 SiLU ->
conv3x3(64)/2 SiLU -> global mean pool -> linear(emb_dim) -> L2 norm.
~25k params: small enough that the per-chunk cost is dominated by the same
patch gather the projection path already pays.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 32
CHANNELS = (16, 32, 64)


def init_head(key: jax.Array, emb_dim: int = 64) -> dict:
    """He-initialized random head (training it is out of scope here; the
    loader accepts any checkpoint with matching shapes)."""
    params = {}
    cin = 3
    for i, cout in enumerate(CHANNELS):
        key, k1 = jax.random.split(key)
        scale = float(np.sqrt(2.0 / (9 * cin)))
        params[f"conv{i}_w"] = jax.random.normal(k1, (3, 3, cin, cout)) * scale
        params[f"conv{i}_b"] = jnp.zeros((cout,))
        cin = cout
    key, k1 = jax.random.split(key)
    params["proj_w"] = jax.random.normal(k1, (cin, emb_dim)) * float(
        np.sqrt(1.0 / cin)
    )
    params["proj_b"] = jnp.zeros((emb_dim,))
    return params


def save_head(path, params) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_head(path) -> dict | None:
    """Load a head checkpoint; None when the file is missing or malformed
    (callers fall back to the projection embedding)."""
    path = Path(path)
    if not path.exists():
        return None
    try:
        with np.load(path) as data:
            params = {k: jnp.asarray(data[k]) for k in data.files}
        required = {f"conv{i}_{s}" for i in range(len(CHANNELS)) for s in "wb"}
        required |= {"proj_w", "proj_b"}
        if not required <= set(params):
            return None
        # Shape validation against the fixed head architecture AND the
        # tracker state's embedding width (base.EMB_DIM): a checkpoint with
        # e.g. emb_dim=128 would otherwise pass and crash at jit-trace time
        # deep inside the fused chunk program instead of falling back.
        from geotrax_tpu.track.base import EMB_DIM

        cin = 3
        for i, cout in enumerate(CHANNELS):
            if params[f"conv{i}_w"].shape != (3, 3, cin, cout):
                return None
            if params[f"conv{i}_b"].shape != (cout,):
                return None
            cin = cout
        if params["proj_w"].shape != (cin, EMB_DIM):
            return None
        if params["proj_b"].shape != (EMB_DIM,):
            return None
        return params
    except Exception:  # noqa: BLE001 — malformed checkpoint: fall back
        return None


def embed_patches(params: dict, patches: jnp.ndarray) -> jnp.ndarray:
    """(M, 32, 32, 3) float32 patches -> (M, emb_dim) L2-normalized
    embeddings. Traceable (used inside the fused chunk program)."""
    x = patches / 255.0
    for i in range(len(CHANNELS)):
        x = jax.lax.conv_general_dilated(
            x, params[f"conv{i}_w"], window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"conv{i}_b"]
        x = x * jax.nn.sigmoid(x)  # SiLU
    x = x.mean(axis=(1, 2))  # (M, C)
    emb = x @ params["proj_w"] + params["proj_b"]
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)


def resolve_head(tracker_params: dict, logger=None) -> dict | None:
    """The cfg hook: ``tracker.<active>.model`` naming an ``.npz`` file loads
    the conv head; ``auto``/None/missing files keep the projection path
    (mirrors the reference's model: auto default)."""
    ref = (tracker_params or {}).get("model")
    if not ref or str(ref) in ("auto", "None"):
        return None
    if not str(ref).endswith(".npz"):
        if logger:
            logger.warning(
                f"tracker model '{ref}': only .npz ReID heads are supported; "
                "using the projection embedding."
            )
        return None
    params = load_head(ref)
    if logger:
        if params is None:
            logger.warning(
                f"ReID head '{ref}' missing or malformed; using the "
                "projection embedding."
            )
        else:
            logger.info(f"Loaded learned ReID head from '{ref}'.")
    return params
