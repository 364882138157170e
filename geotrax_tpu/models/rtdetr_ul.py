"""Ultralytics-weight-compatible RT-DETR (rtdetr-l/x) in functional JAX.

The reference switches detectors on one config line (reference
extract.py:222-225: names containing 'rtdetr' load ultralytics RTDETR);
making those `.pt` checkpoints usable here requires reproducing the
ultralytics graph exactly — HGNetv2 backbone, hybrid encoder (AIFI
self-attention on P5 + CCFM RepC3 fusion), and the deformable-attention
decoder with IoU-aware query selection — so converted weights produce the
same detections. models/convert.py:convert_rtdetr_ultralytics maps the
torch state dict onto this module's pytree (BN folded into convs, RepConv
branches re-parameterized into single 3x3 kernels — exact transforms).

TPU notes: all shapes static (nq=300 queries, 4 sampling points x 3 levels);
deformable sampling is bilinear gathers; everything jits as one program.
Quirks of the upstream graph (AIFI's transposed sin-cos position grid,
anchor logit clamping with inf masking) are reproduced faithfully — parity
with the torch oracle is pinned by tests/test_rtdetr_convert.py.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ULSpec(NamedTuple):
    nc: int = 80
    hd: int = 256           # hidden dim
    nq: int = 300           # queries
    ndl: int = 6            # decoder layers
    nh: int = 8             # heads
    ndp: int = 4            # sampling points
    d_ffn: int = 1024
    # HGNetv2-L stage parameters: (cm, c2, k, light, shortcut, n)
    stages: tuple = (
        (48, 128, 3, False, False, 6),
        (96, 512, 3, False, False, 6),
        (192, 1024, 5, True, False, 6),
        (192, 1024, 5, True, True, 6),
        (192, 1024, 5, True, True, 6),
        (384, 2048, 5, True, False, 6),
    )
    stem_cm: int = 32
    stem_c2: int = 48


# ---------------------------------------------------------------------------
# primitives (BN already folded by the converter: conv = {"w" HWIO, "b"})
# ---------------------------------------------------------------------------

def _conv(p, x, stride=1, pad=None, groups=1, act="relu"):
    if pad is None:
        k = p["w"].shape[0]
        pad = ((k // 2, k // 2), (k // 2, k // 2))  # torch autopad semantics
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ) + p["b"]
    if act == "relu":
        return jax.nn.relu(y)
    if act == "silu":
        return jax.nn.silu(y)
    return y


def _linear(p, x):
    with jax.default_matmul_precision("highest"):
        return x @ p["w"] + p["b"]


def _ln(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mha(p, q, k, v, num_heads):
    """torch nn.MultiheadAttention with packed in_proj, batch-first layout."""
    b, nq, d = q.shape
    dh = d // num_heads
    wq, wk, wv = jnp.split(p["in_w"], 3, axis=1)   # stored (d, 3d)
    bq, bk, bv = jnp.split(p["in_b"], 3)

    def split(x):
        return x.reshape(b, -1, num_heads, dh).transpose(0, 2, 1, 3)

    with jax.default_matmul_precision("highest"):
        qh = split(q @ wq + bq)
        kh = split(k @ wk + bk)
        vh = split(v @ wv + bv)
        attn = jax.nn.softmax(qh @ kh.transpose(0, 1, 3, 2) / math.sqrt(dh), axis=-1)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(b, nq, d)
        return out @ p["out_w"] + p["out_b"]


def _mlp(p, x, n_layers):
    for i in range(n_layers):
        x = _linear(p[f"l{i}"], x)
        if i < n_layers - 1:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# backbone
# ---------------------------------------------------------------------------

def _hgstem(p, x):
    x = _conv(p["stem1"], x, stride=2)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    x2 = _conv(p["stem2a"], x, stride=1, pad="VALID")
    x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
    x2 = _conv(p["stem2b"], x2, stride=1, pad="VALID")
    # maxpool k2 s1 ceil_mode=True on the padded map == VALID on pad+1
    x1 = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 1, 1, 1), "VALID"
    )
    x = jnp.concatenate([x1, x2], axis=-1)
    x = _conv(p["stem3"], x, stride=2)
    return _conv(p["stem4"], x, stride=1)


def _lightconv(p, x, k):
    x = _conv(p["conv1"], x, act=None)
    c = x.shape[-1]
    return _conv(p["conv2"], x, groups=c, act="relu")


def _hgblock(p, x, k, light, shortcut, n):
    ys = [x]
    for i in range(n):
        if light:
            ys.append(_lightconv(p[f"m{i}"], ys[-1], k))
        else:
            ys.append(_conv(p[f"m{i}"], ys[-1]))
    y = jnp.concatenate(ys, axis=-1)
    y = _conv(p["sc"], y)
    y = _conv(p["ec"], y)
    return y + x if shortcut else y


def _dwconv(p, x, stride):
    c = x.shape[-1]
    return _conv(p, x, stride=stride, groups=c, act=None)


def backbone(params, x, spec: ULSpec):
    """-> (P3, P4, P5) feature maps (strides 8/16/32)."""
    x = _hgstem(params["stem"], x)
    st = spec.stages
    x = _hgblock(params["s1"], x, st[0][2], st[0][3], st[0][4], st[0][5])
    x = _dwconv(params["dw2"], x, 2)
    p3 = _hgblock(params["s2"], x, st[1][2], st[1][3], st[1][4], st[1][5])
    x = _dwconv(params["dw3"], p3, 2)
    x = _hgblock(params["s3a"], x, st[2][2], st[2][3], st[2][4], st[2][5])
    x = _hgblock(params["s3b"], x, st[3][2], st[3][3], st[3][4], st[3][5])
    p4 = _hgblock(params["s3c"], x, st[4][2], st[4][3], st[4][4], st[4][5])
    x = _dwconv(params["dw4"], p4, 2)
    p5 = _hgblock(params["s4"], x, st[5][2], st[5][3], st[5][4], st[5][5])
    return p3, p4, p5


# ---------------------------------------------------------------------------
# hybrid encoder
# ---------------------------------------------------------------------------

def _sincos_pos(w, h, dim, temperature=10000.0):
    """ultralytics AIFI position grid — incl. its x-major flatten quirk."""
    grid_w, grid_h = np.meshgrid(np.arange(w, dtype=np.float32),
                                 np.arange(h, dtype=np.float32), indexing="ij")
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
    out_w = grid_w.reshape(-1)[:, None] * omega[None]
    out_h = grid_h.reshape(-1)[:, None] * omega[None]
    return jnp.asarray(np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )[None])


def _aifi(p, x, num_heads):
    """(B,H,W,C) -> same; transformer encoder layer with GELU FFN, post-norm."""
    b, h, w, c = x.shape
    # torch flattens (B,C,H,W) over HW -> tokens in row-major y,x order
    tokens = x.reshape(b, h * w, c)
    pos = _sincos_pos(w, h, c)
    q = tokens + pos
    attn = _mha(p["ma"], q, q, tokens, num_heads)
    tokens = _ln(p["norm1"], tokens + attn)
    y = _linear(p["fc2"], jax.nn.gelu(_linear(p["fc1"], tokens), approximate=False))
    tokens = _ln(p["norm2"], tokens + y)
    return tokens.reshape(b, h, w, c)


def _repc3(p, x, n):
    y = _conv(p["cv1"], x, act="silu")
    for i in range(n):
        # RepConv re-parameterized by the converter into one 3x3 conv
        y = jax.nn.silu(_conv(p[f"m{i}"], y, act=None))
    z = _conv(p["cv2"], x, act="silu")
    out = y + z
    if "cv3" in p:
        out = _conv(p["cv3"], out, act="silu")
    return out


def _upsample2(x):
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def hybrid_encoder(params, p3, p4, p5, spec: ULSpec):
    """AIFI on P5 + CCFM top-down/bottom-up RepC3 fusion -> 3 hd-dim maps."""
    f5 = _conv(params["proj5"], p5, act=None)            # layer 10
    f5 = _aifi(params["aifi"], f5, spec.nh)              # layer 11
    y5 = _conv(params["lat0"], f5, act="silu")           # layer 12
    up = _upsample2(y5)
    f4 = _conv(params["proj4"], p4, act=None)            # layer 14
    x = jnp.concatenate([up, f4], axis=-1)
    x = _repc3(params["fpn0"], x, 3)                     # layer 16
    y4 = _conv(params["lat1"], x, act="silu")            # layer 17
    up = _upsample2(y4)
    f3 = _conv(params["proj3"], p3, act=None)            # layer 19
    x = jnp.concatenate([up, f3], axis=-1)
    out3 = _repc3(params["fpn1"], x, 3)                  # layer 21 (X3)
    x = _conv(params["down0"], out3, stride=2, act="silu")  # layer 22
    x = jnp.concatenate([x, y4], axis=-1)
    out4 = _repc3(params["pan0"], x, 3)                  # layer 24 (F4)
    x = _conv(params["down1"], out4, stride=2, act="silu")  # layer 25
    x = jnp.concatenate([x, y5], axis=-1)
    out5 = _repc3(params["pan1"], x, 3)                  # layer 27 (F5)
    return out3, out4, out5


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _bilinear_nhwc(feat, x, y):
    """feat (H,W,C); x,y (...,) continuous pixel coords with torch
    grid_sample(align_corners=False, zeros padding) semantics."""
    h, w, _ = feat.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = feat[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return v * inb[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    return (tap(x0i, y0i) * (1 - fx) * (1 - fy)
            + tap(x0i + 1, y0i) * fx * (1 - fy)
            + tap(x0i, y0i + 1) * (1 - fx) * fy
            + tap(x0i + 1, y0i + 1) * fx * fy)


def _msdeform_attn(p, query, refer_bbox, level_feats, spec: ULSpec):
    """query (B,Q,C); refer_bbox (B,Q,4) sigmoid-space; level_feats list of
    (B,H,W,C). MSDeformAttn with ultralytics sampling-location math."""
    b, nq, c = query.shape
    nl = len(level_feats)
    nh, ndp = spec.nh, spec.ndp
    dh = c // nh

    offsets = _linear(p["sampling_offsets"], query).reshape(b, nq, nh, nl, ndp, 2)
    weights = jax.nn.softmax(
        _linear(p["attention_weights"], query).reshape(b, nq, nh, nl * ndp), -1
    ).reshape(b, nq, nh, nl, ndp)
    # sampling_locations = center + offsets / n_points * wh * 0.5
    add = offsets / ndp * refer_bbox[:, :, None, None, None, 2:] * 0.5
    loc = refer_bbox[:, :, None, None, None, :2] + add  # (B,Q,nh,nl,ndp,2) in [0,1]

    out = jnp.zeros((b, nq, nh, dh))
    for li, feat in enumerate(level_feats):
        value = _linear(p["value_proj"], feat.reshape(b, -1, c))
        h, w = feat.shape[1], feat.shape[2]
        value_h = value.reshape(b, h, w, nh, dh)
        # grid_sample(align_corners=False): px = loc*W - 0.5
        lx = loc[:, :, :, li, :, 0] * w - 0.5   # (B,Q,nh,ndp)
        ly = loc[:, :, :, li, :, 1] * h - 0.5

        def sample_one(v_bhw, lx_b, ly_b):
            def per_head(hi):
                return _bilinear_nhwc(v_bhw[:, :, hi, :], lx_b[:, hi, :], ly_b[:, hi, :])
            return jnp.stack([per_head(hi) for hi in range(nh)], axis=1)  # (Q,nh,ndp,dh)

        sampled = jax.vmap(sample_one)(value_h, lx, ly)
        out = out + jnp.sum(sampled * weights[:, :, :, li, :, None], axis=3)

    return _linear(p["output_proj"], out.reshape(b, nq, c))


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1.0 - x, eps, None))


def _generate_anchors(shapes, grid_size=0.05, eps=1e-2):
    anchors = []
    for i, (h, w) in enumerate(shapes):
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        gxy = (np.stack([gx, gy], -1) + 0.5) / np.array([w, h], np.float32)
        wh = np.ones_like(gxy) * grid_size * (2.0 ** i)
        anchors.append(np.concatenate([gxy, wh], -1).reshape(-1, 4))
    anchors = np.concatenate(anchors, 0)[None]  # (1, A, 4)
    valid = ((anchors > eps) & (anchors < 1 - eps)).all(-1, keepdims=True)
    anchors = np.log(anchors / (1 - anchors))
    anchors = np.where(valid, anchors, np.inf).astype(np.float32)
    return jnp.asarray(anchors), jnp.asarray(valid.astype(np.float32))


def decoder(params, enc_feats, spec: ULSpec):
    """enc_feats: 3 (B,H,W,hd) maps -> (boxes sigmoid-space (B,nq,4),
    scores sigmoid (B,nq,nc))."""
    b = enc_feats[0].shape[0]
    projected = [
        _conv(params[f"input_proj{i}"], f, act=None)
        for i, f in enumerate(enc_feats)
    ]
    shapes = [(f.shape[1], f.shape[2]) for f in projected]
    feats = jnp.concatenate([f.reshape(b, -1, spec.hd) for f in projected], axis=1)

    anchors, valid_mask = _generate_anchors(shapes)
    features = _linear(params["enc_output_l"], valid_mask * feats)
    features = _ln(params["enc_output_ln"], features)
    enc_scores = _linear(params["enc_score_head"], features)   # (B,A,nc)
    sel = enc_scores.max(-1)
    _, top_idx = jax.lax.top_k(sel, spec.nq)
    take = jax.vmap(lambda m, i: m[i])
    top_feats = take(features, top_idx)
    top_anchors = take(jnp.broadcast_to(anchors, (b,) + anchors.shape[1:]), top_idx)
    refer = _mlp(params["enc_bbox_head"], top_feats, 3) + top_anchors
    embed = top_feats

    refer_bbox = jax.nn.sigmoid(refer)
    for i in range(spec.ndl):
        lp = params[f"dec_layer{i}"]
        qpos = _mlp(params["query_pos_head"], refer_bbox, 2)
        q = embed + qpos
        attn = _mha(lp["self_attn"], q, q, embed, spec.nh)
        embed = _ln(lp["norm1"], embed + attn)
        cross = _msdeform_attn(lp["cross_attn"], embed + qpos, refer_bbox,
                               projected, spec)
        embed = _ln(lp["norm2"], embed + cross)
        y = _linear(lp["linear2"], jax.nn.relu(_linear(lp["linear1"], embed)))
        embed = _ln(lp["norm3"], embed + y)
        bbox = _mlp(params[f"dec_bbox_head{i}"], embed, 3)
        refer_bbox = jax.nn.sigmoid(bbox + _inverse_sigmoid(refer_bbox))

    scores = jax.nn.sigmoid(
        _linear(params[f"dec_score_head{spec.ndl - 1}"], embed)
    )
    return refer_bbox, scores


@partial(jax.jit, static_argnames=("spec",))
def forward(params, images, spec: ULSpec):
    """(B,H,W,3) float in [0,1] -> (boxes_xywh px (B,nq,4), probs (B,nq,nc))."""
    p3, p4, p5 = backbone(params["backbone"], images, spec)
    f3, f4, f5 = hybrid_encoder(params["encoder"], p3, p4, p5, spec)
    boxes, probs = decoder(params["decoder"], [f3, f4, f5], spec)
    img_h, img_w = images.shape[1], images.shape[2]
    scale = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
    return boxes * scale, probs
