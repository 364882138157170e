"""YOLOv8 detection family in functional JAX (TPU-first).

Re-implements the capability of the reference's ultralytics YOLOv8 inference
(SURVEY.md §2.3 N3; reference extract.py:217-236 loads
hf://rfonod/geo-trax/geotrax_hbb_yolov8s_1920_v1.pt, imgsz 1920). Design:

- NHWC layout end-to-end; convs via lax.conv_general_dilated with
  ('NHWC','HWIO','NHWC') — XLA's native TPU layout, everything lands on the
  MXU in bf16 with f32 accumulation.
- Inference-mode batch norm is folded into conv weights at load time
  (models/convert.py), so each Conv block is a single fused conv+bias+SiLU —
  XLA fuses the pointwise tail into the conv epilogue.
- Static shapes: a fixed letterboxed input size per video resolution; the
  head emits all anchors (H/8*W/8 + H/16*W/16 + H/32*W/32) as one fixed-size
  (N, 4+nc) tensor consumed by the fixed-shape NMS (ops/nms.py).
- Variants n/s/m/l/x (+ P2 variants) via (depth, width, max_channels)
  multipliers, matching the ultralytics scaling table so pretrained .pt
  checkpoints convert 1:1.

Params are a plain nested dict pytree: params['layers'][str(i)] mirrors the
ultralytics layer indexing (0..8 backbone, 9 SPPF, 12/15/18/21 head C2f,
16/19 downsamples, 22 detect), which keeps the weight converter a direct
name mapping instead of a graph matcher.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# variant -> (depth_multiple, width_multiple, max_channels)
SCALES = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}


class ModelSpec(NamedTuple):
    variant: str = "s"
    nc: int = 4          # classes (geo-trax taxonomy: car/bus/truck/motorcycle)
    reg_max: int = 16    # DFL bins per box side
    p2: bool = False     # high-resolution P2 head variant (small objects)

    @property
    def strides(self):
        return (4, 8, 16, 32) if self.p2 else (8, 16, 32)

    @property
    def head_index(self) -> int:
        """Detect layer index in the ultralytics graph: yolov8.yaml puts it
        at 22; yolov8-p2.yaml's longer neck puts it at 28."""
        return 28 if self.p2 else 22

    @property
    def head_channels(self):
        w = self.width
        if self.p2:
            return (w(128), w(256), w(512), w(1024))
        return (w(256), w(512), w(1024))

    def width(self, c: int) -> int:
        d, w, maxc = SCALES[self.variant]
        return int(math.ceil(min(c, maxc) * w / 8) * 8) if c != 3 else 3

    def depth(self, n: int) -> int:
        d, _, _ = SCALES[self.variant]
        return max(1, round(n * d))


# ---------------------------------------------------------------------------
# Blocks (functional; params are {'w': HWIO, 'b': (C,)} folded conv+bn)
# ---------------------------------------------------------------------------

def conv_block(p, x, stride: int = 1):
    """Conv(k x k, stride) + folded-BN bias + SiLU."""
    k = p["w"].shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"],
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + p["b"]
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)  # SiLU


def bottleneck(p, x, shortcut: bool):
    y = conv_block(p["cv1"], x)
    y = conv_block(p["cv2"], y)
    return x + y if shortcut else y


def c2f_block(p, x, n: int, shortcut: bool):
    """Cross-stage partial with n bottlenecks; concat of all intermediates."""
    y = conv_block(p["cv1"], x)
    half = y.shape[-1] // 2
    parts = [y[..., :half], y[..., half:]]
    for i in range(n):
        parts.append(bottleneck(p["m"][i], parts[-1], shortcut))
    return conv_block(p["cv2"], jnp.concatenate(parts, axis=-1))


def sppf_block(p, x):
    """Spatial pyramid pooling (fast): 3 chained 5x5 maxpools."""
    y = conv_block(p["cv1"], x)
    pools = [y]
    for _ in range(3):
        pools.append(
            jax.lax.reduce_window(
                pools[-1], -jnp.inf, jax.lax.max,
                (1, 5, 5, 1), (1, 1, 1, 1), ((0, 0), (2, 2), (2, 2), (0, 0)),
            )
        )
    return conv_block(p["cv2"], jnp.concatenate(pools, axis=-1))


def space_to_depth2(x):
    """(N,H,W,C) -> (N,H/2,W/2,4C); channel = c*4 + sub_row*2 + sub_col."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(n, h // 2, w // 2, 4 * c)


def _stem_s2d_weights(w3: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a k3 s2 (pad 1) kernel into the equivalent k2 s1 kernel over
    space-to-depth(2) input. Mapping: original tap ky reads row 2i-1+ky =
    block (i-1+di) sub-row si with (di,si) = (0,1),(1,0),(1,1) for ky=0,1,2;
    the (0,0) position never contributes and stays zero."""
    cin, cout = w3.shape[2], w3.shape[3]
    w2 = jnp.zeros((2, 2, 4 * cin, cout), w3.dtype)
    taps = {0: (0, 1), 1: (1, 0), 2: (1, 1)}
    c_idx = jnp.arange(cin)
    for ky in range(3):
        for kx in range(3):
            di, si = taps[ky]
            dj, sj = taps[kx]
            w2 = w2.at[di, dj, c_idx * 4 + si * 2 + sj].set(w3[ky, kx])
    return w2


def stem_conv_s2d(p, x):
    """k3/s2 conv via space-to-depth: mathematically identical to
    conv_block(p, x, stride=2) but faster on TPU for small input channel
    counts — cin < 128 wastes MXU lanes (C=3 wastes 125 of 128), so
    shrinking the spatial extent 4x while multiplying channels 4x raises
    lane occupancy (validated exact to f32 rounding in tests). Used for
    layer 0 (cin 3) and layer 1 (cin 32 for yolov8s) where the 4x channel
    lift outweighs the 16/9 dense-tap overhead of the k2 rewrite."""
    w2 = _stem_s2d_weights(p["w"])
    xs = space_to_depth2(x)
    y = jax.lax.conv_general_dilated(
        xs, w2, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + p["b"]
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def upsample2x(x):
    n, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c)).reshape(n, 2 * h, 2 * w, c)


def detect_head(p, features, spec: ModelSpec):
    """Per-scale box (4*reg_max) + class (nc) branches -> concatenated
    (B, total_anchors, 4*reg_max + nc) raw output plus anchor metadata."""
    outs = []
    for k, x in enumerate(features):
        box = conv_block(p["cv2"][k][0], x)
        box = conv_block(p["cv2"][k][1], box)
        box = jax.lax.conv_general_dilated(
            box, p["cv2"][k][2]["w"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + p["cv2"][k][2]["b"]
        cls = conv_block(p["cv3"][k][0], x)
        cls = conv_block(p["cv3"][k][1], cls)
        cls = jax.lax.conv_general_dilated(
            cls, p["cv3"][k][2]["w"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + p["cv3"][k][2]["b"]
        b, h, w, _ = box.shape
        outs.append(jnp.concatenate([box, cls], axis=-1).reshape(b, h * w, -1))
    return jnp.concatenate(outs, axis=1)


def make_anchors(feat_shapes, strides, offset: float = 0.5):
    """Anchor centers (in input pixels / stride units) per scale."""
    points, stride_list = [], []
    for (h, w), s in zip(feat_shapes, strides):
        ys, xs = np.mgrid[0:h, 0:w]
        pts = np.stack([xs + offset, ys + offset], axis=-1).reshape(-1, 2)
        points.append(pts)
        stride_list.append(np.full((h * w,), s, dtype=np.float32))
    return (
        jnp.asarray(np.concatenate(points).astype(np.float32)),
        jnp.asarray(np.concatenate(stride_list)),
    )


def decode_boxes(raw, anchors, strides_per_anchor, spec: ModelSpec):
    """Raw head output -> (boxes_xywh in input px, class_probs)."""
    reg = raw[..., : 4 * spec.reg_max]
    cls = raw[..., 4 * spec.reg_max:]
    b = raw.shape[0]
    n = raw.shape[1]
    # DFL: softmax expectation over reg_max bins per side (l, t, r, b)
    reg = reg.reshape(b, n, 4, spec.reg_max)
    bins = jnp.arange(spec.reg_max, dtype=jnp.float32)
    dist = jnp.sum(jax.nn.softmax(reg, axis=-1) * bins, axis=-1)  # (B,N,4)
    lt, rb = dist[..., :2], dist[..., 2:]
    x1y1 = anchors[None] - lt
    x2y2 = anchors[None] + rb
    cxy = (x1y1 + x2y2) / 2 * strides_per_anchor[None, :, None]
    wh = (x2y2 - x1y1) * strides_per_anchor[None, :, None]
    boxes_xywh = jnp.concatenate([cxy, wh], axis=-1)
    return boxes_xywh, jax.nn.sigmoid(cls)


# ---------------------------------------------------------------------------
# Full network
# ---------------------------------------------------------------------------

def backbone_plan(spec: ModelSpec):
    """(layer_index -> (kind, args)) for backbone+neck; mirrors ultralytics
    yolov8.yaml (and yolov8-p2.yaml when spec.p2) layer numbering so
    converted weights align by index."""
    w = spec.width
    d = spec.depth
    plan = {
        0: ("conv", dict(cout=w(64), stride=2)),
        1: ("conv", dict(cout=w(128), stride=2)),
        2: ("c2f", dict(cout=w(128), n=d(3), shortcut=True)),
        3: ("conv", dict(cout=w(256), stride=2)),
        4: ("c2f", dict(cout=w(256), n=d(6), shortcut=True)),
        5: ("conv", dict(cout=w(512), stride=2)),
        6: ("c2f", dict(cout=w(512), n=d(6), shortcut=True)),
        7: ("conv", dict(cout=w(1024), stride=2)),
        8: ("c2f", dict(cout=w(1024), n=d(3), shortcut=True)),
        9: ("sppf", dict(cout=w(1024))),
        12: ("c2f", dict(cout=w(512), n=d(3), shortcut=False)),
        15: ("c2f", dict(cout=w(256), n=d(3), shortcut=False)),
    }
    if spec.p2:
        # yolov8-p2.yaml: one more top-down stage to P2 (stride 4), then a
        # three-step bottom-up path; Detect moves to layer 28
        plan.update({
            18: ("c2f", dict(cout=w(128), n=d(3), shortcut=False)),
            19: ("conv", dict(cout=w(128), stride=2)),
            21: ("c2f", dict(cout=w(256), n=d(3), shortcut=False)),
            22: ("conv", dict(cout=w(256), stride=2)),
            24: ("c2f", dict(cout=w(512), n=d(3), shortcut=False)),
            25: ("conv", dict(cout=w(512), stride=2)),
            27: ("c2f", dict(cout=w(1024), n=d(3), shortcut=False)),
        })
    else:
        plan.update({
            16: ("conv", dict(cout=w(256), stride=2)),
            18: ("c2f", dict(cout=w(512), n=d(3), shortcut=False)),
            19: ("conv", dict(cout=w(512), stride=2)),
            21: ("c2f", dict(cout=w(1024), n=d(3), shortcut=False)),
        })
    return plan


def forward_features(params, x, spec: ModelSpec):
    """Backbone + PAN neck -> multi-scale feature maps [P3, P4, P5]."""
    plan = backbone_plan(spec)
    L = params["layers"]

    def run(i, x):
        kind, args = plan[i]
        if kind == "conv":
            return conv_block(L[str(i)], x, stride=args["stride"])
        if kind == "c2f":
            return c2f_block(L[str(i)], x, n=args["n"], shortcut=args["shortcut"])
        return sppf_block(L[str(i)], x)

    # layers 0-1 run in space-to-depth form when the input halves evenly
    # (always true for letterboxed sizes); fall back for odd test shapes.
    # Layer 1's cin (16-64 depending on variant) still underfills the 128
    # MXU lanes at its large spatial extent — the s2d lift wins there too.
    if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        x = stem_conv_s2d(L["0"], x)
    else:
        x = run(0, x)
    if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        x = stem_conv_s2d(L["1"], x)
    else:
        x = run(1, x)
    p2 = run(2, x)
    x = run(3, p2)
    p3 = run(4, x)
    x = run(5, p3)
    p4 = run(6, x)
    x = run(7, p4)
    x = run(8, x)
    p5 = run(9, x)

    # top-down
    u1 = jnp.concatenate([upsample2x(p5), p4], axis=-1)
    n12 = run(12, u1)
    u2 = jnp.concatenate([upsample2x(n12), p3], axis=-1)
    n15 = run(15, u2)
    if spec.p2:
        # yolov8-p2.yaml: one more top-down stage to P2 (stride 4), then
        # bottom-up through P3/P4/P5 (cats with n15, n12, p5 = layers
        # 15/12/9, Detect on [18, 21, 24, 27])
        u3 = jnp.concatenate([upsample2x(n15), p2], axis=-1)
        n18 = run(18, u3)
        d1 = jnp.concatenate([run(19, n18), n15], axis=-1)
        n21 = run(21, d1)
        d2 = jnp.concatenate([run(22, n21), n12], axis=-1)
        n24 = run(24, d2)
        d3 = jnp.concatenate([run(25, n24), p5], axis=-1)
        n27 = run(27, d3)
        return [n18, n21, n24, n27]
    # bottom-up
    d1 = jnp.concatenate([run(16, n15), n12], axis=-1)
    n18 = run(18, d1)
    d2 = jnp.concatenate([run(19, n18), p5], axis=-1)
    n21 = run(21, d2)
    return [n15, n18, n21]


@partial(jax.jit, static_argnames=("spec",))
def forward(params, images, spec: ModelSpec):
    """(B,H,W,3) float images (already letterboxed, 0..1) ->
    (boxes_xywh (B,N,4) in input px, class_probs (B,N,nc))."""
    feats = forward_features(params, images, spec)
    raw = detect_head(params["layers"][str(spec.head_index)], feats, spec)
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_arr = make_anchors(feat_shapes, spec.strides)
    return decode_boxes(raw, anchors, stride_arr, spec)


# ---------------------------------------------------------------------------
# Random init (for tests / training-from-scratch)
# ---------------------------------------------------------------------------

def _init_conv(key, cin, cout, k):
    fan_in = cin * k * k
    w = jax.random.normal(key, (k, k, cin, cout), dtype=jnp.float32)
    return {"w": w * (2.0 / fan_in) ** 0.5, "b": jnp.zeros((cout,), jnp.float32)}


def _init_c2f(key, cin, cout, n):
    hidden = cout // 2
    keys = jax.random.split(key, 2 + 2 * n)
    p = {
        "cv1": _init_conv(keys[0], cin, 2 * hidden, 1),
        "cv2": _init_conv(keys[1], (2 + n) * hidden, cout, 1),
        "m": [],
    }
    for i in range(n):
        p["m"].append({
            "cv1": _init_conv(keys[2 + 2 * i], hidden, hidden, 3),
            "cv2": _init_conv(keys[3 + 2 * i], hidden, hidden, 3),
        })
    return p


def init_params(key, spec: ModelSpec) -> dict:
    plan = backbone_plan(spec)
    w = spec.width
    # channel bookkeeping along the ultralytics graph
    cin_map = {
        0: 3, 1: w(64), 2: w(128), 3: w(128), 4: w(256), 5: w(256), 6: w(512),
        7: w(512), 8: w(1024), 9: w(1024),
        12: w(1024) + w(512), 15: w(512) + w(256),
    }
    if spec.p2:
        cin_map.update({
            18: w(256) + w(128), 19: w(128), 21: w(128) + w(256),
            22: w(256), 24: w(256) + w(512), 25: w(512),
            27: w(512) + w(1024),
        })
    else:
        cin_map.update({
            16: w(256), 18: w(256) + w(512), 19: w(512),
            21: w(512) + w(1024),
        })
    layers = {}
    keys = jax.random.split(key, 32)
    for j, (i, (kind, args)) in enumerate(sorted(plan.items())):
        cin = cin_map[i]
        if kind == "conv":
            layers[str(i)] = _init_conv(keys[j], cin, args["cout"], 3)
        elif kind == "c2f":
            layers[str(i)] = _init_c2f(keys[j], cin, args["cout"], args["n"])
        else:  # sppf
            half = args["cout"] // 2
            layers[str(i)] = {
                "cv1": _init_conv(keys[j], cin, half, 1),
                "cv2": _init_conv(jax.random.fold_in(keys[j], 1), half * 4, args["cout"], 1),
            }

    # detect head (layer 22, or 28 for the P2 variant's 4-scale head)
    ch = list(spec.head_channels)
    c2 = max(16, ch[0] // 4, 4 * spec.reg_max)
    c3 = max(ch[0], min(spec.nc, 100))
    kd = jax.random.split(keys[-1], 6 * len(ch))
    cv2_list, cv3_list = [], []
    for k_i, c in enumerate(ch):
        cv2_list.append([
            _init_conv(kd[6 * k_i + 0], c, c2, 3),
            _init_conv(kd[6 * k_i + 1], c2, c2, 3),
            _init_conv(kd[6 * k_i + 2], c2, 4 * spec.reg_max, 1),
        ])
        cv3_list.append([
            _init_conv(kd[6 * k_i + 3], c, c3, 3),
            _init_conv(kd[6 * k_i + 4], c3, c3, 3),
            _init_conv(kd[6 * k_i + 5], c3, spec.nc, 1),
        ])
    layers[str(spec.head_index)] = {"cv2": cv2_list, "cv3": cv3_list}
    return {"layers": layers}


# ---------------------------------------------------------------------------
# Preprocessing (letterbox, ultralytics-compatible)
# ---------------------------------------------------------------------------

def letterbox_shape(src_h: int, src_w: int, imgsz: int, stride: int = 32,
                    auto: bool = True) -> tuple:
    """Target (h, w, scale, pad_top, pad_left) for ultralytics LetterBox:
    aspect-preserving resize to fit imgsz, padded to a stride multiple (auto)
    or to the full square (auto=False)."""
    r = min(imgsz / src_h, imgsz / src_w)
    new_h, new_w = round(src_h * r), round(src_w * r)
    if auto:
        pad_h = (-new_h) % stride
        pad_w = (-new_w) % stride
    else:
        pad_h, pad_w = imgsz - new_h, imgsz - new_w
    top, left = pad_h // 2, pad_w // 2
    return new_h + pad_h, new_w + pad_w, r, top, left


@partial(jax.jit, static_argnames=("out_h", "out_w", "new_h", "new_w", "top", "left"))
def letterbox(image_u8, out_h: int, out_w: int, new_h: int, new_w: int,
              top: int, left: int):
    """(H,W,3) uint8 -> (out_h,out_w,3) float32 in [0,1], gray padding 114."""
    src_h, src_w = image_u8.shape[:2]
    if (src_h, src_w) == (new_h, new_w):
        resized = image_u8.astype(jnp.float32)
    else:
        # cv2 fixed-point INTER_LINEAR (ops/resize.py) — bit-equal to the
        # ultralytics LetterBox preprocessing (reference extract.py:153) at
        # EVERY scale, not just the 4K 0.5x case: u8 in, u8 out, then /255
        # exactly like torch.from_numpy(img).float()/255 downstream.
        from geotrax_tpu.ops.resize import resize_u8_linear

        resized = resize_u8_linear(image_u8, new_h, new_w).astype(jnp.float32)
    canvas = jnp.full((out_h, out_w, 3), 114.0, jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (top, left, 0))
    return canvas / 255.0


@partial(jax.jit, static_argnames=("out_h", "out_w", "top", "left"))
def letterbox_pad(resized_u8, out_h: int, out_w: int, top: int, left: int):
    """Pad an ALREADY-RESIZED (new_h,new_w,3) uint8 image onto the gray
    letterbox canvas -> (out_h,out_w,3) float32 in [0,1]. The resize half of
    `letterbox`, hoisted to the caller (see Detector.batch_trace_resized)."""
    canvas = jnp.full((out_h, out_w, 3), 114.0, jnp.float32)
    canvas = jax.lax.dynamic_update_slice(
        canvas, resized_u8.astype(jnp.float32), (top, left, 0)
    )
    return canvas / 255.0


def unletterbox_boxes(boxes_xywh, scale: float, top: int, left: int):
    """Map letterboxed-space boxes back to original pixel coordinates."""
    cx = (boxes_xywh[..., 0] - left) / scale
    cy = (boxes_xywh[..., 1] - top) / scale
    w = boxes_xywh[..., 2] / scale
    h = boxes_xywh[..., 3] / scale
    return jnp.stack([cx, cy, w, h], axis=-1)
