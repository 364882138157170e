"""Constant-velocity Kalman filters for multi-object tracking, vmap-ready.

Replaces the per-track Python/numpy Kalman filters inside the ultralytics
trackers (SURVEY.md §2.3 N6; tracker parameter surface cfg tracker.*). Two
state parameterizations are provided, matching the two families used by the
supported trackers:

- XYAH (ByteTrack lineage): state [cx, cy, a(=w/h), h, vx, vy, va, vh]
- XYWH (BoT-SORT lineage):  state [cx, cy, w, h, vx, vy, vw, vh]

Both use the standard motion/observation noise scaling of those trackers:
std weighted by box height (XYAH) or by w/h (XYWH), with
std_weight_position=1/20 and std_weight_velocity=1/160.

All functions are pure (state in/state out) over fixed-size arrays and are
designed to be vmapped over a track-slot axis and scanned over frames.
A KFState is a (mean(8,), cov(8,8)) pair.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

STD_POS = 1.0 / 20.0
STD_VEL = 1.0 / 160.0


class KFState(NamedTuple):
    mean: jnp.ndarray  # (..., 8)
    cov: jnp.ndarray   # (..., 8, 8)


def _motion_matrix(dt: float = 1.0) -> jnp.ndarray:
    f = jnp.eye(8)
    return f.at[:4, 4:].set(jnp.eye(4) * dt)


def _scale_vector_xyah(mean: jnp.ndarray) -> jnp.ndarray:
    """Noise scale per state dim for XYAH: height drives position/size noise,
    the aspect channel gets a small constant."""
    h = mean[..., 3]
    pos = jnp.stack([h, h, jnp.full_like(h, 0.0), h], axis=-1)
    return pos


def _scale_vector_xywh(mean: jnp.ndarray) -> jnp.ndarray:
    w, h = mean[..., 2], mean[..., 3]
    return jnp.stack([w, h, w, h], axis=-1)


def initiate(measurement: jnp.ndarray, fmt: str = "xyah") -> KFState:
    """New-track state from a first measurement (4,). Velocities start at 0
    with inflated uncertainty (2x position / 10x velocity std)."""
    mean = jnp.concatenate([measurement, jnp.zeros_like(measurement)], axis=-1)
    scale = _scale_vector_xyah(mean) if fmt == "xyah" else _scale_vector_xywh(mean)
    if fmt == "xyah":
        std_pos = jnp.stack(
            [2 * STD_POS * scale[..., 0], 2 * STD_POS * scale[..., 1],
             jnp.full_like(scale[..., 0], 1e-2), 2 * STD_POS * scale[..., 3]], axis=-1)
        std_vel = jnp.stack(
            [10 * STD_VEL * scale[..., 0], 10 * STD_VEL * scale[..., 1],
             jnp.full_like(scale[..., 0], 1e-5), 10 * STD_VEL * scale[..., 3]], axis=-1)
    else:
        std_pos = 2 * STD_POS * scale
        std_vel = 10 * STD_VEL * scale
    std = jnp.concatenate([std_pos, std_vel], axis=-1)
    cov = jnp.einsum("...i,ij->...ij", std**2, jnp.eye(8))
    return KFState(mean, cov)


def _process_noise(mean: jnp.ndarray, fmt: str) -> jnp.ndarray:
    scale = _scale_vector_xyah(mean) if fmt == "xyah" else _scale_vector_xywh(mean)
    if fmt == "xyah":
        std_pos = jnp.stack(
            [STD_POS * scale[..., 0], STD_POS * scale[..., 1],
             jnp.full_like(scale[..., 0], 1e-2), STD_POS * scale[..., 3]], axis=-1)
        std_vel = jnp.stack(
            [STD_VEL * scale[..., 0], STD_VEL * scale[..., 1],
             jnp.full_like(scale[..., 0], 1e-5), STD_VEL * scale[..., 3]], axis=-1)
    else:
        std_pos = STD_POS * scale
        std_vel = STD_VEL * scale
    std = jnp.concatenate([std_pos, std_vel], axis=-1)
    return jnp.einsum("...i,ij->...ij", std**2, jnp.eye(8))


def _measurement_noise(mean: jnp.ndarray, fmt: str) -> jnp.ndarray:
    scale = _scale_vector_xyah(mean) if fmt == "xyah" else _scale_vector_xywh(mean)
    if fmt == "xyah":
        std = jnp.stack(
            [STD_POS * scale[..., 0], STD_POS * scale[..., 1],
             jnp.full_like(scale[..., 0], 1e-1), STD_POS * scale[..., 3]], axis=-1)
    else:
        std = STD_POS * scale
    return jnp.einsum("...i,ij->...ij", std**2, jnp.eye(4))


def predict(state: KFState, fmt: str = "xyah", dt: float = 1.0) -> KFState:
    """Time update: x <- F x, P <- F P F' + Q."""
    F = _motion_matrix(dt)
    with jax.default_matmul_precision("highest"):
        mean = state.mean @ F.T
        q = _process_noise(state.mean, fmt)
        cov = F @ state.cov @ F.T + q
    return KFState(mean, cov)


def update(state: KFState, measurement: jnp.ndarray, fmt: str = "xyah") -> KFState:
    """Measurement update with observation H = [I4 0]. Uses an explicit
    4x4 solve (no data-dependent shapes; vmappable)."""
    H = jnp.concatenate([jnp.eye(4), jnp.zeros((4, 4))], axis=1)
    r = _measurement_noise(state.mean, fmt)
    projected_mean = state.mean[..., :4]
    with jax.default_matmul_precision("highest"):
        s = H @ state.cov @ H.T + r
        k = jnp.linalg.solve(s, H @ state.cov).swapaxes(-1, -2)  # (8,4) gain
        innovation = measurement - projected_mean
        mean = state.mean + (k @ innovation[..., None])[..., 0]
        cov = state.cov - k @ s @ k.swapaxes(-1, -2)
    return KFState(mean, cov)


def gating_distance(state: KFState, measurements: jnp.ndarray, fmt: str = "xyah") -> jnp.ndarray:
    """Squared Mahalanobis distance of (M,4) measurements to the predicted
    measurement distribution (chi-square gating, 4 dof)."""
    H = jnp.concatenate([jnp.eye(4), jnp.zeros((4, 4))], axis=1)
    r = _measurement_noise(state.mean, fmt)
    with jax.default_matmul_precision("highest"):
        s = H @ state.cov @ H.T + r
        d = measurements - state.mean[..., :4]
        sol = jnp.linalg.solve(s, d.swapaxes(-1, -2) if d.ndim > 1 else d)
        if d.ndim > 1:
            return jnp.einsum("md,dm->m", d, sol)
        return d @ sol


def measurement_from_xywh(boxes_xywh: jnp.ndarray, fmt: str = "xyah") -> jnp.ndarray:
    """Convert pipeline boxes (cx,cy,w,h) to the filter's measurement space."""
    if fmt == "xyah":
        cx, cy, w, h = jnp.split(boxes_xywh, 4, axis=-1)
        return jnp.concatenate([cx, cy, w / jnp.maximum(h, 1e-6), h], axis=-1)
    return boxes_xywh


def xywh_from_state(mean: jnp.ndarray, fmt: str = "xyah") -> jnp.ndarray:
    """Filter state -> pipeline boxes (cx,cy,w,h)."""
    if fmt == "xyah":
        cx, cy, a, h = mean[..., 0], mean[..., 1], mean[..., 2], mean[..., 3]
        return jnp.stack([cx, cy, a * h, h], axis=-1)
    return mean[..., :4]
