"""RT-DETR-class detector (transformer decoder, NMS-free) in functional JAX.

The reference supports an RTDETR model switch next to YOLO (reference
extract.py:222-225). This is that capability rebuilt TPU-first rather than a
weight-compatible port of the ultralytics graph (no RT-DETR checkpoint ships
with geo-trax): a hybrid encoder (YOLOv8 backbone features + AIFI
self-attention on the P5 map + FPN-style fusion) feeding a deformable-
attention decoder with iterative box refinement and IoU-aware query
selection. Detection is end-to-end: top-k queries by class score, no NMS.

TPU notes: all attention shapes are static (Q queries, fixed K sampling
points per level); deformable sampling is bilinear gathers on the VPU; the
set-prediction training loss does its bipartite matching with the on-device
auction solver (ops/assignment.py) instead of scipy's Hungarian.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from geotrax_tpu.models import yolov8


class RTDETRSpec(NamedTuple):
    variant: str = "s"        # backbone variant (yolov8 scaling)
    nc: int = 4
    hidden: int = 256
    num_queries: int = 300
    num_decoder_layers: int = 4
    num_heads: int = 8
    num_points: int = 4       # deformable sampling points per level/head
    reg_max: int = 16         # unused (direct box regression); kept for API parity

    @property
    def strides(self):
        return (8, 16, 32)


# ---------------------------------------------------------------------------
# Parameter init helpers
# ---------------------------------------------------------------------------

def _linear(key, din, dout):
    k1, _ = jax.random.split(key)
    lim = (6.0 / (din + dout)) ** 0.5
    return {"w": jax.random.uniform(k1, (din, dout), minval=-lim, maxval=lim),
            "b": jnp.zeros((dout,))}


def _apply_linear(p, x):
    with jax.default_matmul_precision("highest"):
        return x @ p["w"] + p["b"]


def _layer_norm(x, p, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _ln_params(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _mha_params(key, dim):
    keys = jax.random.split(key, 4)
    return {name: _linear(k, dim, dim) for name, k in zip(("q", "k", "v", "o"), keys)}


def _mha(p, q, k, v, num_heads):
    b, nq, d = q.shape
    dh = d // num_heads

    def split(x):
        return x.reshape(b, -1, num_heads, dh).transpose(0, 2, 1, 3)

    with jax.default_matmul_precision("highest"):
        qh = split(_apply_linear(p["q"], q))
        kh = split(_apply_linear(p["k"], k))
        vh = split(_apply_linear(p["v"], v))
        attn = jax.nn.softmax(qh @ kh.transpose(0, 1, 3, 2) / math.sqrt(dh), axis=-1)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(b, nq, d)
        return _apply_linear(p["o"], out)


def _ffn_params(key, dim, hidden):
    k1, k2 = jax.random.split(key)
    return {"fc1": _linear(k1, dim, hidden), "fc2": _linear(k2, hidden, dim)}


def _ffn(p, x):
    return _apply_linear(p["fc2"], jax.nn.relu(_apply_linear(p["fc1"], x)))


# ---------------------------------------------------------------------------
# Deformable attention
# ---------------------------------------------------------------------------

def _bilinear_sample(feat, xy_norm):
    """feat (H,W,D); xy_norm (...,2) in [0,1] -> (...,D)."""
    h, w, _ = feat.shape
    x = xy_norm[..., 0] * w - 0.5
    y = xy_norm[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    v00 = feat[y0i, x0i]
    v01 = feat[y0i, x1i]
    v10 = feat[y1i, x0i]
    v11 = feat[y1i, x1i]
    fx = fx[..., None]
    fy = fy[..., None]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def _deform_attn_params(key, spec: RTDETRSpec, n_levels: int = 3):
    keys = jax.random.split(key, 4)
    d = spec.hidden
    n_out = spec.num_heads * n_levels * spec.num_points
    p = {
        "offsets": _linear(keys[0], d, n_out * 2),
        "weights": _linear(keys[1], d, n_out),
        "value": _linear(keys[2], d, d),
        "out": _linear(keys[3], d, d),
    }
    # grid-like offset init (DETR-family convention: small distinct directions)
    angles = np.arange(spec.num_heads) * (2 * np.pi / spec.num_heads)
    base = np.stack([np.cos(angles), np.sin(angles)], -1)  # (H,2)
    init = np.tile(base[:, None, None, :], (1, n_levels, spec.num_points, 1))
    init = init * (np.arange(spec.num_points) + 1).reshape(1, 1, -1, 1)
    p["offsets"]["b"] = jnp.asarray(init.reshape(-1) * 0.01, jnp.float32)
    return p


def _deform_attn(p, queries, ref_points, level_feats, spec: RTDETRSpec):
    """queries (B,Q,D); ref_points (B,Q,2) normalized; level_feats list of
    (B,H,W,D). Multi-scale deformable attention."""
    b, nq, d = queries.shape
    n_levels = len(level_feats)
    heads, pts = spec.num_heads, spec.num_points
    dh = d // heads

    offsets = _apply_linear(p["offsets"], queries).reshape(b, nq, heads, n_levels, pts, 2)
    weights = jax.nn.softmax(
        _apply_linear(p["weights"], queries).reshape(b, nq, heads, n_levels * pts), -1
    ).reshape(b, nq, heads, n_levels, pts)

    out = jnp.zeros((b, nq, heads, dh))
    for li, feat in enumerate(level_feats):
        value = _apply_linear(p["value"], feat)          # (B,H,W,D)
        h, w = value.shape[1], value.shape[2]
        value_h = value.reshape(b, h, w, heads, dh)
        # sampling locations: ref + offset scaled by the feature size
        scale = jnp.asarray([1.0 / w, 1.0 / h])
        loc = ref_points[:, :, None, None, :] + offsets[:, :, :, li, :, :] * scale  # (B,Q,Hd,P,2)

        def sample_one(v_bhwhd, loc_b):
            # v (H,W,heads,dh); loc (Q,heads,P,2)
            def per_head(hi):
                return _bilinear_sample(v_bhwhd[:, :, hi, :], loc_b[:, hi, :, :])  # (Q,P,dh)

            return jnp.stack([per_head(hi) for hi in range(heads)], axis=1)  # (Q,heads,P,dh)

        sampled = jax.vmap(sample_one)(value_h, loc)  # (B,Q,heads,P,dh)
        out = out + jnp.sum(sampled * weights[:, :, :, li, :, None], axis=3)

    return _apply_linear(p["out"], out.reshape(b, nq, d))


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def init_params(key, spec: RTDETRSpec) -> dict:
    keys = jax.random.split(key, 24)
    backbone_spec = yolov8.ModelSpec(variant=spec.variant, nc=spec.nc)
    backbone = yolov8.init_params(keys[0], backbone_spec)["layers"]
    d = spec.hidden
    w = backbone_spec.width
    chans = [w(256), w(512), w(1024)]

    def conv1x1(k, cin):
        lim = (6.0 / (cin + d)) ** 0.5
        return {"w": jax.random.uniform(k, (1, 1, cin, d), minval=-lim, maxval=lim),
                "b": jnp.zeros((d,))}

    params = {
        "backbone": backbone,
        "proj": [conv1x1(keys[1 + i], c) for i, c in enumerate(chans)],
        # AIFI: one transformer encoder layer on the P5 tokens
        "aifi": {
            "attn": _mha_params(keys[4], d),
            "ffn": _ffn_params(keys[5], d, 4 * d),
            "ln1": _ln_params(d), "ln2": _ln_params(d),
        },
        "enc_score": _linear(keys[6], d, spec.nc),
        "enc_box": _ffn_params(keys[7], d, d) | {"out": _linear(keys[8], d, 4)},
        "query_pos": {
            "fc1": _linear(keys[9], 4, d),
            "fc2": _linear(jax.random.fold_in(keys[9], 1), d, d),
            "out": _linear(keys[10], d, d),
        },
        "layers": [],
        "cls_head": _linear(keys[11], d, spec.nc),
        "box_head": _ffn_params(keys[12], d, d) | {"out": _linear(keys[13], d, 4)},
    }
    for li in range(spec.num_decoder_layers):
        lk = jax.random.split(keys[14 + li], 6)
        params["layers"].append({
            "self_attn": _mha_params(lk[0], d),
            "cross": _deform_attn_params(lk[1], spec),
            "ffn": _ffn_params(lk[2], d, 4 * d),
            "ln1": _ln_params(d), "ln2": _ln_params(d), "ln3": _ln_params(d),
            "refine": _ffn_params(lk[3], d, d) | {"out": _linear(lk[4], d, 4)},
        })
    return params


def _mlp3(p, x):
    return _apply_linear(p["out"], jax.nn.relu(_ffn(p, x)))


@partial(jax.jit, static_argnames=("spec",))
def forward(params, images, spec: RTDETRSpec):
    """(B,H,W,3) -> (boxes_xywh px (B,Q,4), class_probs (B,Q,nc)). NMS-free."""
    backbone_spec = yolov8.ModelSpec(variant=spec.variant, nc=spec.nc)
    feats = yolov8.forward_features({"layers": params["backbone"]}, images, backbone_spec)
    img_h, img_w = images.shape[1], images.shape[2]

    # project to the shared hidden dim
    projected = []
    for p, f in zip(params["proj"], feats):
        y = jax.lax.conv_general_dilated(
            f, p["w"], (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + p["b"]
        projected.append(y)

    # AIFI on P5 tokens
    b, h5, w5, d = projected[2].shape
    tokens = projected[2].reshape(b, h5 * w5, d)
    a = params["aifi"]
    tokens = _layer_norm(tokens + _mha(a["attn"], tokens, tokens, tokens, spec.num_heads), a["ln1"])
    tokens = _layer_norm(tokens + _ffn(a["ffn"], tokens), a["ln2"])
    projected[2] = tokens.reshape(b, h5, w5, d)

    # memory = all levels flattened, with per-token normalized centers
    mem_tokens, mem_centers = [], []
    for f in projected:
        hh, ww = f.shape[1], f.shape[2]
        mem_tokens.append(f.reshape(b, hh * ww, d))
        ys, xs = np.mgrid[0:hh, 0:ww]
        centers = np.stack([(xs + 0.5) / ww, (ys + 0.5) / hh], -1).reshape(-1, 2)
        mem_centers.append(jnp.asarray(centers, jnp.float32))
    memory = jnp.concatenate(mem_tokens, axis=1)
    centers = jnp.concatenate(mem_centers, axis=0)

    # IoU-aware query selection: top-Q tokens by max class logit
    enc_logits = _apply_linear(params["enc_score"], memory)   # (B,T,nc)
    enc_boxes = jax.nn.sigmoid(
        _mlp3(params["enc_box"], memory)
        + jnp.concatenate([centers, jnp.zeros_like(centers)], -1)[None]
    )  # (B,T,4) normalized cxcywh
    sel_scores = enc_logits.max(-1)
    num_queries = min(spec.num_queries, sel_scores.shape[1])
    _, top_idx = jax.lax.top_k(sel_scores, num_queries)
    take = jax.vmap(lambda m, i: m[i])
    queries = take(memory, top_idx)
    ref_boxes = take(enc_boxes, top_idx)          # (B,Q,4) normalized

    # decoder with iterative refinement
    for layer in params["layers"]:
        pos = _mlp3(params["query_pos"], ref_boxes)
        q = queries + pos
        queries = _layer_norm(
            queries + _mha(layer["self_attn"], q, q, queries, spec.num_heads), layer["ln1"]
        )
        cross = _deform_attn(layer["cross"], queries + pos, ref_boxes[..., :2], projected, spec)
        queries = _layer_norm(queries + cross, layer["ln2"])
        queries = _layer_norm(queries + _ffn(layer["ffn"], queries), layer["ln3"])
        delta = _mlp3(layer["refine"], queries)
        # clamp BOTH sides of the logit inversion: sigmoid saturating to
        # exactly 0 would make log(0) = -inf and poison gradients in one
        # training step (same clamped form as rtdetr_ul._inverse_sigmoid)
        rb = jnp.clip(ref_boxes, 1e-5, 1.0 - 1e-5)
        ref_boxes = jax.nn.sigmoid(delta + jnp.log(rb / (1.0 - rb)))

    logits = _apply_linear(params["cls_head"], queries)
    probs = jax.nn.sigmoid(logits)
    scale = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
    boxes_px = ref_boxes * scale
    return boxes_px, probs


# ---------------------------------------------------------------------------
# Set-prediction loss (auction-based bipartite matching, on device)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("spec",))
def detr_loss(params, images, gt_boxes, gt_cls, gt_mask, spec: RTDETRSpec,
              cls_gain: float = 1.0, l1_gain: float = 5.0, giou_gain: float = 2.0):
    """Hungarian-matched DETR loss; the matching runs through the on-device
    auction solver (queries x GT cost, GT padded/masked)."""
    from geotrax_tpu.models.loss import ciou
    from geotrax_tpu.ops.assignment import masked_assignment
    from geotrax_tpu.ops.boxes import xywh_to_xyxy

    boxes, probs = forward(params, images, spec)
    img_h, img_w = images.shape[1], images.shape[2]
    norm = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)

    def per_image(pred_boxes, pred_probs, gt_b, gt_c, gt_m):
        nq = pred_boxes.shape[0]
        g = gt_b.shape[0]
        cls_cost = -jnp.take_along_axis(
            pred_probs, jnp.clip(gt_c, 0, spec.nc - 1)[None, :].repeat(nq, 0), axis=1
        )  # (Q,G)
        l1_cost = jnp.abs(pred_boxes[:, None] / norm - gt_b[None] / norm).sum(-1)
        iou_cost = 1.0 - ciou(
            xywh_to_xyxy(pred_boxes)[:, None].repeat(g, 1),
            xywh_to_xyxy(gt_b)[None].repeat(nq, 0),
        )
        cost = cls_gain * cls_cost + l1_gain * l1_cost + giou_gain * iou_cost
        cost = jnp.clip(cost, -20.0, 20.0)
        # assign each GT (row) its best query (column): transpose the cost
        col, matched = masked_assignment(
            cost.T, gt_m, jnp.ones((nq,), bool), threshold=30.0
        )
        safe_col = jnp.clip(col, 0, nq - 1)

        # classification: matched queries get their GT class, rest background.
        # Scatter at the UNCLIPPED index with unmatched rows forced to -1 so
        # mode="drop" discards them — clipping first would make every
        # unmatched GT row write zeros at query 0, nondeterministically
        # clobbering a real match there (duplicate-index update order is
        # undefined).
        target = jnp.zeros((nq, spec.nc))
        col_eff = jnp.where(matched, col, nq)  # nq = out-of-bounds -> dropped
        target = target.at[col_eff].set(jax.nn.one_hot(gt_c, spec.nc), mode="drop")
        bce = -(target * jnp.log(pred_probs + 1e-8)
                + (1 - target) * jnp.log(1 - pred_probs + 1e-8)).mean()

        mb = pred_boxes[safe_col]
        l1 = jnp.where(matched[:, None], jnp.abs(mb / norm - gt_b / norm), 0.0).sum()
        giou = jnp.where(
            matched, 1.0 - ciou(xywh_to_xyxy(mb), xywh_to_xyxy(gt_b)), 0.0
        ).sum()
        denom = jnp.maximum(matched.sum(), 1)
        return bce, l1 / denom, giou / denom

    bce, l1, giou = jax.vmap(per_image)(boxes, probs, gt_boxes, gt_cls, gt_mask)
    loss = cls_gain * bce.mean() + l1_gain * l1.mean() + giou_gain * giou.mean()
    return loss, {"loss": loss, "cls": bce.mean(), "l1": l1.mean(), "giou": giou.mean()}
