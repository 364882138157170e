"""Fixed-shape on-device NMS.

Replaces torchvision's batched NMS inside ultralytics postprocess
(SURVEY.md §2.3 N4). Static shapes throughout: the caller supplies a fixed
candidate count and ``max_det`` output slots; empty slots carry score -1 and
box zeros. ``agnostic=False`` reproduces the torchvision trick of offsetting
boxes per class so suppression only happens within a class
(the pipeline default is class-agnostic, cfg ultralytics.agnostic_nms).

Algorithm: sort by score, then a sequential greedy pass expressed as a scan
over the sorted candidates against the full IoU matrix — O(N²) elementwise
work that XLA fuses well; N is the post-threshold candidate count (<= a few
thousand at 1920²).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from geotrax_tpu.ops.boxes import iou_matrix


@partial(jax.jit, static_argnames=("max_det", "agnostic"))
def nms(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_det: int,
    class_ids: jnp.ndarray | None = None,
    agnostic: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over (N,4) boxes and (N,) scores.

    Returns (keep_indices[max_det], valid_mask[max_det]); invalid slots hold
    index 0 with valid=False. Scores <= 0 are treated as absent candidates.
    """
    n = boxes_xyxy.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes_xyxy[order]
    scores_sorted = scores[order]

    offset_boxes = boxes_sorted
    if not agnostic and class_ids is not None:
        # Per-class coordinate offset: boxes of different classes never overlap.
        span = (boxes_sorted.max() - boxes_sorted.min()) + 1.0
        offset_boxes = boxes_sorted + (class_ids[order].astype(boxes_sorted.dtype) * span)[:, None]

    iou = iou_matrix(offset_boxes, offset_boxes)
    positions = jnp.arange(n)

    # Fixed-point form of greedy NMS: keep_i = ~exists j<i kept with
    # iou(i,j) > t. Iterating from all-kept converges to the exact greedy
    # solution in as many rounds as the deepest suppression chain — <= 3 on
    # clustered detections (validated in tests), but a bumper-to-bumper
    # chain of pairwise-overlapping duplicates can be arbitrarily deep, so
    # iterate to an actual fixed point (unchanged keep vector) instead of a
    # fixed round count. Each round is one fused (N,N) mask+reduce on the
    # VPU instead of N sequential scan steps (the scan was the single
    # largest cost of the whole extraction step at N = 4000); the while_loop
    # exits after depth+1 rounds, cheaper than the old fixed 16 in the
    # typical case and exact in every case (n rounds bounds the worst).
    alive = scores_sorted > 0.0
    suppress_mask = jnp.logical_and(
        iou > iou_threshold, positions[:, None] < positions[None, :]
    )
    suppress_mask = jnp.logical_and(suppress_mask, alive[:, None])

    def cond_fn(state):
        _, changed, rounds = state
        return jnp.logical_and(changed, rounds < n)

    def body_fn(state):
        keep, _, rounds = state
        suppressed = jnp.any(jnp.logical_and(suppress_mask, keep[:, None]), axis=0)
        new_keep = jnp.logical_and(alive, ~suppressed)
        return new_keep, jnp.any(new_keep != keep), rounds + 1

    kept, _, _ = jax.lax.while_loop(
        cond_fn, body_fn, (alive, jnp.bool_(True), jnp.int32(0))
    )

    # Compact kept indices into max_det slots, preserving score order.
    kept_rank = jnp.cumsum(kept) - 1
    sort_key = jnp.where(kept, kept_rank, n + positions)
    compact = jnp.argsort(sort_key)[: min(max_det, n)]
    if n < max_det:
        # fewer candidates than output slots (small imgsz): pad with index 0,
        # masked invalid below since sum(kept) <= n
        compact = jnp.pad(compact, (0, max_det - n))
    valid = jnp.arange(max_det) < jnp.sum(kept)
    keep_indices = jnp.where(valid, order[compact], 0)
    return keep_indices, valid


@partial(jax.jit, static_argnames=("max_det", "agnostic"))
def postprocess_detections(
    boxes_xywh: jnp.ndarray,
    class_scores: jnp.ndarray,
    conf_threshold: float,
    iou_threshold: float,
    max_det: int,
    class_mask: jnp.ndarray | None = None,
    agnostic: bool = True,
) -> dict:
    """Detector-head output -> final detections (ultralytics-compatible).

    boxes_xywh: (N,4); class_scores: (N,C) post-sigmoid. Per anchor the best
    class is taken; anchors below ``conf_threshold`` or outside ``class_mask``
    are dropped; NMS keeps at most ``max_det``. Returns dict of fixed-shape
    arrays: boxes_xywh (max_det,4), scores, classes, valid.
    """
    from geotrax_tpu.ops.boxes import xywh_to_xyxy

    if class_mask is not None:
        class_scores = jnp.where(class_mask[None, :], class_scores, 0.0)
    scores = class_scores.max(axis=-1)
    classes = class_scores.argmax(axis=-1)
    scores = jnp.where(scores >= conf_threshold, scores, 0.0)

    # Candidate pre-selection: NMS cost is O(K^2) in candidates; at 1920^2
    # there are ~43k anchors and the full IoU matrix would be ~7 GB. The
    # score threshold keeps far fewer than 2*max_det in practice (ultralytics
    # caps candidates the same way), so top-K first, NMS on K — floored at
    # 1024 so a small max_det config (e.g. 300) still considers enough
    # above-threshold anchors for dense scenes (YOLO emits ~2-4 anchors per
    # object post-threshold; at the 1000 default the floor is inactive).
    from geotrax_tpu.ops.topk import exact_top_k

    k = min(max(2 * max_det, 1024), boxes_xywh.shape[0])
    top_scores, top_idx = exact_top_k(scores, k)
    cand_boxes = boxes_xywh[top_idx]
    cand_classes = classes[top_idx]

    keep, valid = nms(
        xywh_to_xyxy(cand_boxes), top_scores, iou_threshold, max_det,
        class_ids=cand_classes, agnostic=agnostic,
    )
    return {
        "boxes_xywh": jnp.where(valid[:, None], cand_boxes[keep], 0.0),
        "scores": jnp.where(valid, top_scores[keep], 0.0),
        "classes": jnp.where(valid, cand_classes[keep], -1),
        "valid": valid,
    }
