"""Detector-parity gate: converted JAX model vs a torch oracle, per-box.

SURVEY §7 step 3 requires a per-box parity check of the converted detector
against the original torch checkpoint before trusting extraction outputs.
The environment this framework was built in has zero egress, so the real
``hf://rfonod/geo-trax/geotrax_hbb_yolov8s_1920_v1.pt`` weights were never
available (reference data/README.md:13-27); THIS is the committed, runnable
recipe for the day they are:

  python tools/verify_detector_parity.py /path/to/geotrax_hbb_yolov8s_1920_v1.pt \
      --image /path/to/4k_frame.png --imgsz 1920

What it does:
1. loads the torch state dict (models/convert.torch_state_dict) and converts
   it to JAX params (convert_ultralytics) — the exact path `geotrax extract`
   uses for .pt checkpoints;
2. rebuilds the SAME network in torch directly from the state dict
   (ultralytics YOLOv8 layer semantics: Conv+BN+SiLU, C2f, SPPF, PAN neck,
   decoupled DFL head) — an oracle independent of our conv/BN folding;
3. runs both on the (letterboxed) image and reports
   - max |raw head output| deviation (pre-NMS),
   - per-box center/size deviation of the final NMS detections,
   - a PASS/FAIL verdict against --tol-raw / --tol-box.

Without --image a fixed-seed synthetic frame is used — weights-only parity.
No weights at hand at all? --selftest builds a small random 'ultralytics'
state dict in-process and gates the converter itself (this is what CI runs:
tests/test_yolov8.py::test_full_convert_roundtrip_torch_model).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from _common import *  # noqa: F401,F403


def build_torch_oracle(sd: dict, spec):
    """Reconstruct the ultralytics DetectionModel forward from a flat state
    dict, with UNFOLDED BatchNorm (eval mode) — independent of our converter's
    conv+BN folding, so folding bugs cannot cancel out."""
    import torch
    import torch.nn as nn

    class Conv(nn.Module):
        def __init__(self, prefix, cin, cout, k, s):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, s, k // 2, bias=False)
            self.bn = nn.BatchNorm2d(cout)
            self.act = nn.SiLU()
            self._prefix = prefix

        def load(self, sd):
            self.conv.weight.data = sd[f"{self._prefix}.conv.weight"]
            for name in ("weight", "bias", "running_mean", "running_var"):
                getattr(self.bn, name).data = sd[f"{self._prefix}.bn.{name}"]
            return self

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    def conv_from_sd(prefix, stride=1):
        w = sd[f"{prefix}.conv.weight"]
        return Conv(prefix, w.shape[1], w.shape[0], w.shape[2], stride).load(sd)

    class Bottleneck(nn.Module):
        def __init__(self, prefix, shortcut):
            super().__init__()
            self.cv1 = conv_from_sd(f"{prefix}.cv1")
            self.cv2 = conv_from_sd(f"{prefix}.cv2")
            self.add = shortcut

        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class C2f(nn.Module):
        def __init__(self, prefix, shortcut):
            super().__init__()
            self.cv1 = conv_from_sd(f"{prefix}.cv1")
            n = 0
            while f"{prefix}.m.{n}.cv1.conv.weight" in sd:
                n += 1
            self.m = nn.ModuleList(
                Bottleneck(f"{prefix}.m.{i}", shortcut) for i in range(n)
            )
            self.cv2 = conv_from_sd(f"{prefix}.cv2")

        def forward(self, x):
            y = list(self.cv1(x).chunk(2, 1))
            for m in self.m:
                y.append(m(y[-1]))
            return self.cv2(torch.cat(y, 1))

    class SPPF(nn.Module):
        def __init__(self, prefix):
            super().__init__()
            self.cv1 = conv_from_sd(f"{prefix}.cv1")
            self.cv2 = conv_from_sd(f"{prefix}.cv2")
            self.pool = nn.MaxPool2d(5, 1, 2)

        def forward(self, x):
            y = [self.cv1(x)]
            for _ in range(3):
                y.append(self.pool(y[-1]))
            return self.cv2(torch.cat(y, 1))

    class Oracle(nn.Module):
        def __init__(self):
            super().__init__()
            L = "model."
            self.l0 = conv_from_sd(L + "0", 2)
            self.l1 = conv_from_sd(L + "1", 2)
            self.l2 = C2f(L + "2", True)
            self.l3 = conv_from_sd(L + "3", 2)
            self.l4 = C2f(L + "4", True)
            self.l5 = conv_from_sd(L + "5", 2)
            self.l6 = C2f(L + "6", True)
            self.l7 = conv_from_sd(L + "7", 2)
            self.l8 = C2f(L + "8", True)
            self.l9 = SPPF(L + "9")
            self.l12 = C2f(L + "12", False)
            self.l15 = C2f(L + "15", False)
            self.l16 = conv_from_sd(L + "16", 2)
            self.l18 = C2f(L + "18", False)
            self.l19 = conv_from_sd(L + "19", 2)
            self.l21 = C2f(L + "21", False)
            self.head_cv2 = nn.ModuleList()
            self.head_cv3 = nn.ModuleList()
            for k in range(3):
                p2 = f"model.22.cv2.{k}"
                p3 = f"model.22.cv3.{k}"
                box_final = nn.Conv2d(
                    sd[f"{p2}.2.weight"].shape[1], sd[f"{p2}.2.weight"].shape[0], 1
                )
                box_final.weight.data = sd[f"{p2}.2.weight"]
                box_final.bias.data = sd[f"{p2}.2.bias"]
                cls_final = nn.Conv2d(
                    sd[f"{p3}.2.weight"].shape[1], sd[f"{p3}.2.weight"].shape[0], 1
                )
                cls_final.weight.data = sd[f"{p3}.2.weight"]
                cls_final.bias.data = sd[f"{p3}.2.bias"]
                self.head_cv2.append(nn.Sequential(
                    conv_from_sd(f"{p2}.0"), conv_from_sd(f"{p2}.1"), box_final))
                self.head_cv3.append(nn.Sequential(
                    conv_from_sd(f"{p3}.0"), conv_from_sd(f"{p3}.1"), cls_final))
            self.up = nn.Upsample(scale_factor=2, mode="nearest")

        def forward(self, x):
            x = self.l1(self.l0(x))
            p3_in = self.l4(self.l3(self.l2(x)))
            p4_in = self.l6(self.l5(p3_in))
            p5_in = self.l9(self.l8(self.l7(p4_in)))
            t = self.l12(torch.cat([self.up(p5_in), p4_in], 1))
            p3 = self.l15(torch.cat([self.up(t), p3_in], 1))
            p4 = self.l18(torch.cat([self.l16(p3), t], 1))
            p5 = self.l21(torch.cat([self.l19(p4), p5_in], 1))
            outs = []
            for k, f in enumerate((p3, p4, p5)):
                raw = torch.cat([self.head_cv2[k](f), self.head_cv3[k](f)], 1)
                outs.append(raw.flatten(2).permute(0, 2, 1))  # (B, HW, C)
            return torch.cat(outs, 1)

    model = Oracle().eval()
    return model


def make_selftest_state_dict():
    """Small random 'ultralytics-layout' YOLOv8n state dict (nc=4)."""
    import torch

    from geotrax_tpu.models import yolov8

    spec = yolov8.ModelSpec(variant="n", nc=4)
    torch.manual_seed(0)
    sd = {}

    def add_conv(prefix, cin, cout, k):
        sd[f"{prefix}.conv.weight"] = torch.randn(cout, cin, k, k) * 0.05
        sd[f"{prefix}.bn.weight"] = torch.rand(cout) + 0.5
        sd[f"{prefix}.bn.bias"] = torch.randn(cout) * 0.1
        sd[f"{prefix}.bn.running_mean"] = torch.randn(cout) * 0.1
        sd[f"{prefix}.bn.running_var"] = torch.rand(cout) + 0.5
        sd[f"{prefix}.bn.num_batches_tracked"] = torch.tensor(0)

    def add_c2f(prefix, cin, cout, n):
        half = cout // 2
        add_conv(f"{prefix}.cv1", cin, cout, 1)
        for i in range(n):
            add_conv(f"{prefix}.m.{i}.cv1", half, half, 3)
            add_conv(f"{prefix}.m.{i}.cv2", half, half, 3)
        add_conv(f"{prefix}.cv2", half * (2 + n), cout, 1)

    w, d = spec.width, spec.depth
    add_conv("model.0", 3, w(64), 3)
    add_conv("model.1", w(64), w(128), 3)
    add_c2f("model.2", w(128), w(128), d(3))
    add_conv("model.3", w(128), w(256), 3)
    add_c2f("model.4", w(256), w(256), d(6))
    add_conv("model.5", w(256), w(512), 3)
    add_c2f("model.6", w(512), w(512), d(6))
    add_conv("model.7", w(512), w(1024), 3)
    add_c2f("model.8", w(1024), w(1024), d(3))
    add_conv("model.9.cv1", w(1024), w(1024) // 2, 1)
    add_conv("model.9.cv2", w(1024) * 2, w(1024), 1)
    add_c2f("model.12", w(1024) + w(512), w(512), d(3))
    add_c2f("model.15", w(512) + w(256), w(256), d(3))
    add_conv("model.16", w(256), w(256), 3)
    add_c2f("model.18", w(256) + w(512), w(512), d(3))
    add_conv("model.19", w(512), w(512), 3)
    add_c2f("model.21", w(512) + w(1024), w(1024), d(3))
    c_box = max(16, w(256) // 4, 16 * 4 // 4)
    c_cls = max(w(256), min(spec.nc, 100))
    for k, ch in enumerate((w(256), w(512), w(1024))):
        add_conv(f"model.22.cv2.{k}.0", ch, c_box, 3)
        add_conv(f"model.22.cv2.{k}.1", c_box, c_box, 3)
        sd[f"model.22.cv2.{k}.2.weight"] = torch.randn(64, c_box, 1, 1) * 0.05
        sd[f"model.22.cv2.{k}.2.bias"] = torch.randn(64) * 0.1
        add_conv(f"model.22.cv3.{k}.0", ch, c_cls, 3)
        add_conv(f"model.22.cv3.{k}.1", c_cls, c_cls, 3)
        sd[f"model.22.cv3.{k}.2.weight"] = torch.randn(spec.nc, c_cls, 1, 1) * 0.05
        sd[f"model.22.cv3.{k}.2.bias"] = torch.randn(spec.nc) * 0.1
    sd["model.22.dfl.conv.weight"] = torch.arange(16, dtype=torch.float32).view(1, 16, 1, 1)
    return sd


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Gate the .pt->JAX detector conversion per-box against a torch oracle."
    )
    parser.add_argument("model", type=Path, nargs="?", default=None,
                        help="Ultralytics YOLOv8 .pt checkpoint")
    parser.add_argument("--image", type=Path, default=None,
                        help="Frame to run parity on (default: synthetic)")
    parser.add_argument("--imgsz", type=int, default=640)
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--iou", type=float, default=0.7)
    parser.add_argument("--tol-raw", type=float, default=5e-3,
                        help="Max |raw head output| deviation (f32)")
    parser.add_argument("--tol-box", type=float, default=0.1,
                        help="Max per-box center/extent deviation [px]")
    parser.add_argument("--selftest", action="store_true",
                        help="Gate the converter on a random in-process checkpoint")
    parser.add_argument("--tpu", action="store_true",
                        help="Run the JAX side on the TPU (default: CPU, so "
                             "the parity gate is deterministic vs the torch "
                             "CPU oracle)")
    args = parser.parse_args()

    import torch

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from geotrax_tpu.models import yolov8
    from geotrax_tpu.models.convert import convert_ultralytics, torch_state_dict
    from geotrax_tpu.ops.nms import postprocess_detections

    if args.selftest or args.model is None:
        if args.model is None and not args.selftest:
            print("No checkpoint given — running --selftest on a random "
                  "in-process state dict.")
        sd = make_selftest_state_dict()
    else:
        sd = {k: torch.as_tensor(np.asarray(v))
              for k, v in torch_state_dict(args.model).items()}
    # converter consumes numpy; the torch oracle loads the tensors directly
    params, spec = convert_ultralytics(
        {k: v.numpy() for k, v in sd.items()}
    )
    oracle = build_torch_oracle(sd, spec)

    # input frame, letterboxed to imgsz exactly like extraction
    if args.image is not None:
        from geotrax_tpu.io.geoassets import load_image

        frame = load_image(args.image)
    else:
        rng = np.random.default_rng(42)
        frame = np.kron(
            rng.integers(0, 255, (args.imgsz // 8, args.imgsz // 8, 3)),
            np.ones((8, 8, 1)),
        ).astype(np.uint8)
    src_h, src_w = frame.shape[:2]
    out_h, out_w, r, top, left = yolov8.letterbox_shape(src_h, src_w, args.imgsz)
    new_h, new_w = round(src_h * r), round(src_w * r)
    img = np.asarray(jax.jit(
        lambda f: yolov8.letterbox(f, out_h, out_w, new_h, new_w, top, left)
    )(jnp.asarray(frame)), np.float32)

    # torch oracle raw head output (B, N, 4*reg_max + nc)
    with torch.no_grad():
        raw_t = oracle(
            torch.from_numpy(img[None]).permute(0, 3, 1, 2)
        ).numpy()

    # our raw output: forward_raw if exposed, else recompute from features
    feats = yolov8.forward_features(params, jnp.asarray(img[None]), spec)
    raw_j = np.asarray(
        yolov8.detect_head(params["layers"]["22"], feats, spec), np.float32
    )
    raw_dev = float(np.abs(raw_j - raw_t).max())

    # final boxes through the same decode+NMS both ways
    anchors, strides = yolov8.make_anchors(
        [(f.shape[1], f.shape[2]) for f in feats], spec.strides
    )

    def final_boxes(raw):
        boxes, probs = yolov8.decode_boxes(jnp.asarray(raw), anchors, strides, spec)
        det = postprocess_detections(
            boxes[0], probs[0], args.conf, args.iou, 300, agnostic=True
        )
        valid = np.asarray(det["valid"])
        return (np.asarray(det["boxes_xywh"])[valid],
                np.asarray(det["scores"])[valid],
                np.asarray(det["classes"])[valid])

    bj, sj, cj = final_boxes(raw_j)
    bt, st, ct = final_boxes(raw_t)
    # NMS order is not stable under f32 score ties, so match greedily by
    # center distance instead of comparing index-aligned
    box_dev, unmatched = 0.0, abs(len(bj) - len(bt))
    if len(bj) and len(bt):
        d = np.linalg.norm(bj[:, None, :2] - bt[None, :, :2], axis=-1)
        used = np.zeros(len(bt), bool)
        for i in np.argsort(d.min(axis=1)):
            order = np.argsort(d[i])
            hit = next((j for j in order if not used[j]), None)
            if hit is None or d[i, hit] > max(bj[i, 2], bj[i, 3]):
                unmatched += 1
                continue
            used[hit] = True
            box_dev = max(box_dev, float(np.abs(bj[i] - bt[hit]).max()))

    print(f"checkpoint       : {args.model or '<selftest random>'}")
    print(f"spec             : variant={spec.variant} nc={spec.nc} imgsz={args.imgsz}")
    print(f"anchors          : {raw_j.shape[1]}")
    print(f"raw head max dev : {raw_dev:.3e} (tol {args.tol_raw})")
    print(f"detections       : jax={len(bj)} torch={len(bt)} unmatched={unmatched}")
    print(f"box max dev [px] : {box_dev:.4f} (tol {args.tol_box})")
    ok = (raw_dev <= args.tol_raw and box_dev <= args.tol_box
          and unmatched == 0)
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
