"""Bounding-box format conversion and IoU matrices (jit-friendly).

Boxes flow through the pipeline as (cx, cy, w, h) — the reference's tracks
format — with conversion helpers to corner form for IoU/NMS.
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) center form -> corner form."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corner form -> center form."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_area(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    w = jnp.maximum(boxes_xyxy[..., 2] - boxes_xyxy[..., 0], 0.0)
    h = jnp.maximum(boxes_xyxy[..., 3] - boxes_xyxy[..., 1], 0.0)
    return w * h


def iou_matrix(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Pairwise IoU of (N,4) x (M,4) corner boxes -> (N,M).

    One fused elementwise block on the VPU; replaces the lapx/cython iou used
    inside ultralytics tracker association (SURVEY.md §2.3 N5).
    """
    lt = jnp.maximum(a_xyxy[:, None, :2], b_xyxy[None, :, :2])
    rb = jnp.minimum(a_xyxy[:, None, 2:], b_xyxy[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a_xyxy)[:, None] + box_area(b_xyxy)[None, :] - inter
    return inter / (union + eps)


def hmiou_matrix(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Height-Modulated IoU (TrackTrack cost term): IoU scaled by the overlap
    ratio of the vertical extents."""
    iou = iou_matrix(a_xyxy, b_xyxy, eps)
    y1 = jnp.maximum(a_xyxy[:, None, 1], b_xyxy[None, :, 1])
    y2 = jnp.minimum(a_xyxy[:, None, 3], b_xyxy[None, :, 3])
    inter_h = jnp.maximum(y2 - y1, 0.0)
    uy1 = jnp.minimum(a_xyxy[:, None, 1], b_xyxy[None, :, 1])
    uy2 = jnp.maximum(a_xyxy[:, None, 3], b_xyxy[None, :, 3])
    union_h = jnp.maximum(uy2 - uy1, eps)
    return iou * inter_h / union_h
