"""Constant-velocity Kalman filters for multi-object tracking, vmap-free.

Replaces the per-track Python/numpy Kalman filters inside the ultralytics
trackers (SURVEY.md §2.3 N6; tracker parameter surface cfg tracker.*). Two
state parameterizations are provided, matching the two families used by the
supported trackers:

- XYAH (ByteTrack lineage): state [cx, cy, a(=w/h), h, vx, vy, va, vh]
- XYWH (BoT-SORT lineage):  state [cx, cy, w, h, vx, vy, vw, vh]

Both use the standard motion/observation noise scaling of those trackers:
std weighted by box height (XYAH) or by w/h (XYWH), with
std_weight_position=1/20 and std_weight_velocity=1/160.

TPU-first structure: because the motion model advances each coordinate
independently (F is per-coordinate [[1,1],[0,1]]), the process/measurement
noises are diagonal, and the observation reads positions only, the 8x8
covariance stays a permutation of four independent 2x2 (pos,vel) blocks
forever. The filter therefore carries cov as (..., 4, 3) = per-coordinate
[p_xx, p_xv, p_vv] and every predict/update/gating step is closed-form
elementwise VPU math over all track slots at once — no (8,8)/(4,4) matmuls,
no jnp.linalg.solve (which lowers to the TPU scalar path when vmapped over
hundreds of slots), no vmap needed.

All functions are pure (state in/state out) over fixed-size arrays,
broadcasting over any leading slot/batch dims, and are scanned over frames.
A KFState is a (mean(..., 8), cov(..., 4, 3)) pair.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

STD_POS = 1.0 / 20.0
STD_VEL = 1.0 / 160.0

COV_DIM = 3  # [p_xx, p_xv, p_vv] per coordinate


class KFState(NamedTuple):
    mean: jnp.ndarray  # (..., 8)
    cov: jnp.ndarray   # (..., 4, 3) per-coordinate [p_xx, p_xv, p_vv]


def _noise_stds(mean: jnp.ndarray, fmt: str) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-coordinate (position std, velocity std) base scales (..., 4)."""
    if fmt == "xyah":
        h = mean[..., 3]
        pos = jnp.stack([h, h, jnp.full_like(h, 0.0), h], axis=-1)
        std_pos = STD_POS * pos
        std_pos = std_pos.at[..., 2].set(1e-2)
        std_vel = STD_VEL * pos
        std_vel = std_vel.at[..., 2].set(1e-5)
    else:
        w, h = mean[..., 2], mean[..., 3]
        scale = jnp.stack([w, h, w, h], axis=-1)
        std_pos = STD_POS * scale
        std_vel = STD_VEL * scale
    return std_pos, std_vel


def _measurement_std(mean: jnp.ndarray, fmt: str) -> jnp.ndarray:
    if fmt == "xyah":
        h = mean[..., 3]
        std = STD_POS * jnp.stack([h, h, jnp.full_like(h, 0.0), h], axis=-1)
        return std.at[..., 2].set(1e-1)
    w, h = mean[..., 2], mean[..., 3]
    return STD_POS * jnp.stack([w, h, w, h], axis=-1)


def initiate(measurement: jnp.ndarray, fmt: str = "xyah") -> KFState:
    """New-track state from a first measurement (..., 4). Velocities start at
    0 with inflated uncertainty (2x position / 10x velocity std)."""
    mean = jnp.concatenate([measurement, jnp.zeros_like(measurement)], axis=-1)
    std_pos, std_vel = _noise_stds(mean, fmt)
    p_xx = (2 * std_pos) ** 2
    p_vv = (10 * std_vel) ** 2
    if fmt == "xyah":
        # The aspect channel's init stds are the fixed constants 1e-2 / 1e-5
        # (not scaled by the 2x/10x multipliers) in the ByteTrack lineage.
        p_xx = p_xx.at[..., 2].set(1e-4)
        p_vv = p_vv.at[..., 2].set(1e-10)
    cov = jnp.stack([p_xx, jnp.zeros_like(std_pos), p_vv], axis=-1)
    return KFState(mean, cov)


def predict(state: KFState, fmt: str = "xyah", dt: float = 1.0) -> KFState:
    """Time update x <- F x, P <- F P F' + Q, in per-coordinate closed form:
    x += dt*v;  p_xx += dt*(2 p_xv + dt*p_vv) + q_x;  p_xv += dt*p_vv;
    p_vv += q_v."""
    x, v = state.mean[..., :4], state.mean[..., 4:]
    mean = jnp.concatenate([x + dt * v, v], axis=-1)
    std_pos, std_vel = _noise_stds(state.mean, fmt)
    p_xx = state.cov[..., 0]
    p_xv = state.cov[..., 1]
    p_vv = state.cov[..., 2]
    cov = jnp.stack([
        p_xx + dt * (2.0 * p_xv + dt * p_vv) + std_pos ** 2,
        p_xv + dt * p_vv,
        p_vv + std_vel ** 2,
    ], axis=-1)
    return KFState(mean, cov)


def update(state: KFState, measurement: jnp.ndarray, fmt: str = "xyah") -> KFState:
    """Measurement update with H = [I4 0] in per-coordinate closed form:
    s = p_xx + r;  K = [p_xx, p_xv]/s;  standard covariance downdate."""
    r = _measurement_std(state.mean, fmt) ** 2
    p_xx = state.cov[..., 0]
    p_xv = state.cov[..., 1]
    p_vv = state.cov[..., 2]
    s = p_xx + r
    k_x = p_xx / s
    k_v = p_xv / s
    innov = measurement - state.mean[..., :4]
    x = state.mean[..., :4] + k_x * innov
    v = state.mean[..., 4:] + k_v * innov
    cov = jnp.stack([
        (1.0 - k_x) * p_xx,
        (1.0 - k_x) * p_xv,
        p_vv - k_v * p_xv,
    ], axis=-1)
    return KFState(jnp.concatenate([x, v], axis=-1), cov)


def gating_distance(state: KFState, measurements: jnp.ndarray,
                    fmt: str = "xyah") -> jnp.ndarray:
    """Squared Mahalanobis distance of (..., M, 4) measurements to the
    predicted measurement distribution (chi-square gating, 4 dof). The
    innovation covariance is diagonal per coordinate, so this is a weighted
    sum of squares."""
    r = _measurement_std(state.mean, fmt) ** 2
    s = state.cov[..., 0] + r                      # (..., 4)
    d = measurements - state.mean[..., None, :4]   # (..., M, 4)
    return jnp.sum(d * d / s[..., None, :], axis=-1)


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
