"""YOLOv8 detection loss (task-aligned assignment + CIoU + DFL + BCE) in JAX.

Training-capability counterpart of the reference's `train/train.sh` path
(which delegates to the ultralytics trainer, SURVEY.md §2.7): the same loss
family — task-aligned one-to-many assignment (align metric
cls^alpha * IoU^beta, top-k candidates restricted to anchors whose center
falls inside the GT box), CIoU box loss, distribution-focal loss on the
ltrb bins, and BCE on classes with the assigned normalized scores as soft
targets. Fixed shapes throughout: GT boxes are padded to MAX_GT with a mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from geotrax_tpu.ops.boxes import iou_matrix, xywh_to_xyxy


def ciou(boxes1_xyxy: jnp.ndarray, boxes2_xyxy: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU between aligned (..., 4) boxes."""
    x1 = jnp.maximum(boxes1_xyxy[..., 0], boxes2_xyxy[..., 0])
    y1 = jnp.maximum(boxes1_xyxy[..., 1], boxes2_xyxy[..., 1])
    x2 = jnp.minimum(boxes1_xyxy[..., 2], boxes2_xyxy[..., 2])
    y2 = jnp.minimum(boxes1_xyxy[..., 3], boxes2_xyxy[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    w1 = boxes1_xyxy[..., 2] - boxes1_xyxy[..., 0]
    h1 = boxes1_xyxy[..., 3] - boxes1_xyxy[..., 1]
    w2 = boxes2_xyxy[..., 2] - boxes2_xyxy[..., 0]
    h2 = boxes2_xyxy[..., 3] - boxes2_xyxy[..., 1]
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(boxes1_xyxy[..., 2], boxes2_xyxy[..., 2]) - jnp.minimum(
        boxes1_xyxy[..., 0], boxes2_xyxy[..., 0])
    ch = jnp.maximum(boxes1_xyxy[..., 3], boxes2_xyxy[..., 3]) - jnp.minimum(
        boxes1_xyxy[..., 1], boxes2_xyxy[..., 1])
    c2 = cw**2 + ch**2 + eps
    rho2 = ((boxes1_xyxy[..., 0] + boxes1_xyxy[..., 2] - boxes2_xyxy[..., 0] - boxes2_xyxy[..., 2]) ** 2
            + (boxes1_xyxy[..., 1] + boxes1_xyxy[..., 3] - boxes2_xyxy[..., 1] - boxes2_xyxy[..., 3]) ** 2) / 4
    v = (4 / jnp.pi**2) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = v / (v - iou + 1 + eps)
    return iou - rho2 / c2 - jax.lax.stop_gradient(alpha) * v


def task_aligned_assign(
    pred_scores, pred_boxes_xyxy, anchors_px, gt_boxes_xywh, gt_cls, gt_mask,
    topk: int = 10, alpha: float = 0.5, beta: float = 6.0,
):
    """One image: assign each anchor at most one GT.

    pred_scores (A,C) sigmoid probs; pred_boxes (A,4) xyxy px;
    anchors_px (A,2); gt_* (G, ...) with validity gt_mask (G,).
    Returns (target_gt_idx (A,), fg_mask (A,), align_metric (A,G)).
    """
    gt_xyxy = xywh_to_xyxy(gt_boxes_xywh)  # (G,4)
    # candidates: anchor centers inside the GT box
    in_box = (
        (anchors_px[:, None, 0] > gt_xyxy[None, :, 0])
        & (anchors_px[:, None, 0] < gt_xyxy[None, :, 2])
        & (anchors_px[:, None, 1] > gt_xyxy[None, :, 1])
        & (anchors_px[:, None, 1] < gt_xyxy[None, :, 3])
    ) & gt_mask[None, :]

    ious = iou_matrix(pred_boxes_xyxy, gt_xyxy)  # (A,G)
    cls_prob = jnp.take_along_axis(
        pred_scores, jnp.clip(gt_cls, 0, pred_scores.shape[1] - 1)[None, :].repeat(
            pred_scores.shape[0], 0), axis=1
    )  # (A,G)
    align = (cls_prob**alpha) * (jnp.clip(ious, 0) ** beta)
    align = jnp.where(in_box, align, 0.0)

    # top-k anchors per GT
    topk_vals, _ = jax.lax.top_k(align.T, topk)  # (G,topk)
    kth = topk_vals[:, -1][None, :]  # (1,G)
    is_topk = (align >= jnp.maximum(kth, 1e-9)) & (align > 0)

    # resolve multi-GT anchors: keep the GT with the highest IoU
    masked_iou = jnp.where(is_topk, ious, -1.0)
    best_gt = jnp.argmax(masked_iou, axis=1)
    fg = jnp.any(is_topk, axis=1)
    # final (A,G) positive mask after the multi-GT resolution — the
    # candidate set the TAL soft-target normalizers reduce over
    # (ultralytics mask_pos: normalizing with unassignable anchors' IoUs
    # would mis-scale the soft class targets)
    pos_mask = is_topk & fg[:, None] & (
        best_gt[:, None] == jnp.arange(align.shape[1])[None, :]
    )
    return best_gt, fg, align, ious, pos_mask


@partial(jax.jit, static_argnames=("spec",))
def detection_loss(params, images, gt_boxes, gt_cls, gt_mask, spec,
                   box_gain: float = 7.5, cls_gain: float = 0.5, dfl_gain: float = 1.5):
    """Batched loss. images (B,H,W,3); gt_boxes (B,G,4) xywh px; gt_cls
    (B,G) int; gt_mask (B,G) bool. Returns (scalar loss, metrics dict)."""
    from geotrax_tpu.models import yolov8

    feats = yolov8.forward_features(params, images, spec)
    raw = yolov8.detect_head(params["layers"][str(spec.head_index)], feats, spec)  # (B,A,4R+C)
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, strides = yolov8.make_anchors(feat_shapes, spec.strides)
    boxes_xywh, probs = yolov8.decode_boxes(raw, anchors, strides, spec)
    boxes_xyxy = xywh_to_xyxy(boxes_xywh)
    anchors_px = anchors * strides[:, None]

    reg = raw[..., : 4 * spec.reg_max]
    cls_logits = raw[..., 4 * spec.reg_max:]

    def per_image(pred_probs, pred_xyxy, reg_i, cls_logits_i, gt_b, gt_c, gt_m):
        best_gt, fg, align, ious, pos_mask = task_aligned_assign(
            pred_probs, pred_xyxy, anchors_px, gt_b, gt_c, gt_m
        )
        a = pred_probs.shape[0]
        safe_gt = jnp.clip(best_gt, 0, gt_b.shape[0] - 1)
        tgt_boxes = xywh_to_xyxy(gt_b)[safe_gt]  # (A,4)
        tgt_cls = gt_c[safe_gt]

        # normalized soft cls targets (TAL): align / max_align * max_iou per
        # GT, both maxima over the GT's ASSIGNED candidates (ultralytics
        # pos_overlaps) — the whole-column max could come from an anchor
        # whose center is outside the GT and mis-scale the soft targets
        pos_align = jnp.where(fg, align[jnp.arange(a), safe_gt], 0.0)
        gt_max_align = jnp.max(jnp.where(pos_mask, align, 0.0), axis=0)  # (G,)
        gt_max_iou = jnp.max(jnp.where(pos_mask, ious, 0.0), axis=0)
        norm = gt_max_iou[safe_gt] / jnp.maximum(gt_max_align[safe_gt], 1e-9)
        soft_tgt = jnp.clip(pos_align * norm, 0.0, 1.0)

        onehot = jax.nn.one_hot(tgt_cls, pred_probs.shape[1]) * soft_tgt[:, None]
        onehot = jnp.where(fg[:, None], onehot, 0.0)
        bce = jnp.mean(
            jnp.sum(
                jnp.maximum(cls_logits_i, 0) - cls_logits_i * onehot
                + jnp.log1p(jnp.exp(-jnp.abs(cls_logits_i))),
                axis=-1,
            )
        ) * a / jnp.maximum(jnp.sum(soft_tgt), 1.0)

        weight = soft_tgt
        box_l = jnp.where(fg, (1.0 - ciou(pred_xyxy, tgt_boxes)) * weight, 0.0)
        box_loss = jnp.sum(box_l) / jnp.maximum(jnp.sum(weight), 1.0)

        # DFL: target ltrb distances in stride units, two-bin soft labels
        tgt_lt = (anchors_px - tgt_boxes[:, :2]) / strides[:, None]
        tgt_rb = (tgt_boxes[:, 2:] - anchors_px) / strides[:, None]
        tgt_dist = jnp.clip(
            jnp.concatenate([tgt_lt, tgt_rb], axis=-1), 0, spec.reg_max - 1.01
        )  # (A,4)
        low = jnp.floor(tgt_dist)
        w_high = tgt_dist - low
        logp = jax.nn.log_softmax(reg_i.reshape(a, 4, spec.reg_max), axis=-1)
        idx_low = low.astype(jnp.int32)
        lp_low = jnp.take_along_axis(logp, idx_low[..., None], axis=-1)[..., 0]
        lp_high = jnp.take_along_axis(
            logp, jnp.clip(idx_low + 1, 0, spec.reg_max - 1)[..., None], axis=-1
        )[..., 0]
        dfl = -(lp_low * (1 - w_high) + lp_high * w_high).mean(axis=-1)
        dfl_loss = jnp.sum(jnp.where(fg, dfl * weight, 0.0)) / jnp.maximum(jnp.sum(weight), 1.0)
        return box_loss, bce, dfl_loss, jnp.sum(fg)

    box_l, cls_l, dfl_l, n_fg = jax.vmap(per_image)(
        probs, boxes_xyxy, reg, cls_logits, gt_boxes, gt_cls, gt_mask
    )
    loss = box_gain * box_l.mean() + cls_gain * cls_l.mean() + dfl_gain * dfl_l.mean()
    metrics = {
        "loss": loss, "box": box_l.mean(), "cls": cls_l.mean(),
        "dfl": dfl_l.mean(), "fg": n_fg.sum(),
    }
    return loss, metrics
