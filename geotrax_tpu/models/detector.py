"""Host-facing detector: letterbox -> jitted YOLOv8 forward -> on-device NMS.

The extract stage's replacement for ultralytics `model.track()`'s detection
half (reference extract.py:153): one jit-compiled function per video
resolution (static letterbox shape), returning fixed max_det slots that feed
the slot-based tracker directly.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from geotrax_tpu.models import yolov8
from geotrax_tpu.ops.nms import postprocess_detections


class Detector:
    """Dispatches on the model reference like the reference's load_detector
    (extract.py:222-225): names containing 'rtdetr' build the DETR-class
    NMS-free runtime, everything else the YOLOv8 + NMS path."""

    def __init__(self, model_path: Path, detect_cfg: dict, logger=None):
        from geotrax_tpu.models.convert import load_model

        # ---- shared config, parsed ONCE before the family dispatch (the
        # rtdetr branches previously re-parsed a subset and drifted: missing
        # tiles/half/agnostic crashed detect_batch with AttributeError)
        self.imgsz = int(detect_cfg.get("imgsz", 1920) or 1920)
        self.conf = float(detect_cfg.get("conf", 0.25) or 0.25)
        self.iou = float(detect_cfg.get("iou", 0.7) or 0.7)
        self.max_det = int(detect_cfg.get("max_det", 1000) or 1000)
        self.agnostic = bool(detect_cfg.get("agnostic_nms", True))
        # cfg ultralytics.half (reference runs fp16 on GPU): bf16 params +
        # activations on TPU, f32 postprocess — the recommended deployment
        # dtype (MXU-native; detection parity within NMS score jitter)
        self.half = bool(detect_cfg.get("half", False))
        # spatial tiling (cfg ultralytics.tiles / extract --tiles): T vertical
        # tiles each letterboxed to imgsz see the scene at ~T/2 the default
        # scale — the small-object accuracy lever (parallel/tiling.py)
        self.tiles = int(detect_cfg.get("tiles", 1) or 1)
        self.tile_overlap = int(detect_cfg.get("tile_overlap", 128) or 128)
        self._geom = {}
        self._fn = {}

        self.is_rtdetr = "rtdetr" in str(model_path).lower()
        if self.is_rtdetr:
            self._init_rtdetr(Path(model_path), logger)
            if self.tiles > 1 and logger:
                logger.warning("Spatial tiling is not supported for RT-DETR; ignored.")
                self.tiles = 1
        else:
            self.params, self.spec, self.class_names = load_model(model_path)
        if self.half:
            # ONE jitted cast program for the whole tree: an eager per-leaf
            # astype is ~200 separate dispatches, which on a remote-device
            # transport (axon tunnel) costs tens of seconds of pure dispatch
            # latency at model-load time (measured round 5; local PCIe hosts
            # barely notice). jit collapses it to a single dispatch.
            cast = jax.jit(lambda tree: jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                tree,
            ))
            self.params = cast(self.params)
        classes = detect_cfg.get("classes")
        self.class_mask = None
        if classes is not None:
            ids = np.asarray(classes, int)
            in_range = ids[(ids >= 0) & (ids < self.spec.nc)]
            if logger and len(in_range) < len(ids):
                logger.warning(
                    f"Class filter {sorted(set(ids.tolist()) - set(in_range.tolist()))} "
                    f"outside model range (nc={self.spec.nc}); ignored."
                )
            if len(in_range) and len(in_range) < self.spec.nc:
                mask = np.zeros((self.spec.nc,), bool)
                mask[in_range] = True
                self.class_mask = jnp.asarray(mask)
        if logger and not self.is_rtdetr:
            logger.info(
                f"Detector: yolov8{self.spec.variant} nc={self.spec.nc} "
                f"imgsz={self.imgsz} conf={self.conf} iou={self.iou} max_det={self.max_det}"
            )

    def _init_rtdetr(self, model_path: Path, logger):
        """Load RT-DETR weights/spec (config already parsed by __init__)."""
        from geotrax_tpu.models import rtdetr
        from geotrax_tpu.models.convert import load_npz

        if model_path.suffix == ".pt":
            # ultralytics RTDETR checkpoint (reference extract.py:222-225):
            # weight-compatible rtdetr-l graph (models/rtdetr_ul.py)
            from geotrax_tpu.models.convert import (
                convert_rtdetr_ultralytics,
                read_class_names,
                torch_state_dict,
            )

            sd = torch_state_dict(model_path)
            self.params, self.spec = convert_rtdetr_ultralytics(sd)
            self.class_names = read_class_names(model_path)
            self.is_ul_rtdetr = True
            if logger:
                logger.info(
                    f"Detector: ultralytics rtdetr-l nc={self.spec.nc} (NMS-free)"
                )
            return
        self.is_ul_rtdetr = False
        raw, meta = load_npz(model_path)
        self.spec = rtdetr.RTDETRSpec(
            variant=str(meta.get("variant", "s")),
            nc=int(meta.get("nc", 4)),
            hidden=int(meta.get("hidden", 256)),
            num_queries=int(meta.get("num_queries", 300)),
            num_decoder_layers=int(meta.get("num_decoder_layers", 4)),
            num_heads=int(meta.get("num_heads", 8)),
            num_points=int(meta.get("num_points", 4)),
        )
        from geotrax_tpu.models.convert import _restore_lists

        self.params = _restore_lists(raw)
        self.class_names = meta.get("class_names")
        if logger:
            logger.info(f"Detector: rtdetr-{self.spec.variant} nc={self.spec.nc} (NMS-free)")

    def _rtdetr_pipeline(self, src_h: int, src_w: int):
        key = (src_h, src_w)
        if key in self._fn:
            return self._fn[key]
        from geotrax_tpu.models import rtdetr, rtdetr_ul
        from geotrax_tpu.ops.resize import resize_u8_linear

        forward_fn = (
            rtdetr_ul.forward if getattr(self, "is_ul_rtdetr", False)
            else rtdetr.forward
        )
        # ultralytics RTDETRPredictor preprocesses with a SQUARE STRETCH
        # (LetterBox(auto=False, scale_fill=True)) — NOT the YOLO aspect-
        # preserving letterbox; converted weights only reproduce reference
        # detections with the geometry they were evaluated through.
        imgsz = self.imgsz
        sx, sy = src_w / imgsz, src_h / imgsz
        spec, params, conf = self.spec, self.params, self.conf
        half, class_mask, max_det = self.half, self.class_mask, self.max_det
        unstretch = jnp.asarray([sx, sy, sx, sy], jnp.float32)

        @jax.jit
        def run(frame_u8):
            img = resize_u8_linear(frame_u8, imgsz, imgsz).astype(jnp.float32) / 255.0
            if half:
                img = img.astype(jnp.bfloat16)
            boxes, probs = forward_fn(params, img[None], spec)
            boxes = boxes[0].astype(jnp.float32)
            probs = probs[0].astype(jnp.float32)
            if class_mask is not None:
                probs = jnp.where(class_mask[None, :], probs, 0.0)
            scores = probs.max(-1)
            classes = probs.argmax(-1)
            k = min(max_det, scores.shape[0])
            top_scores, idx = jax.lax.top_k(scores, k)
            pad = max_det - k
            det_boxes = boxes[idx] * unstretch
            return {
                "boxes_xywh": jnp.pad(det_boxes, ((0, pad), (0, 0))),
                "scores": jnp.pad(top_scores, (0, pad)),
                "classes": jnp.pad(classes[idx], (0, pad), constant_values=-1),
                "valid": jnp.pad(top_scores >= conf, (0, pad)),
            }

        self._fn[key] = run
        return run

    def _pipeline(self, src_h: int, src_w: int):
        """Build (and cache) the jitted end-to-end function for a resolution."""
        if self.is_rtdetr:
            return self._rtdetr_pipeline(src_h, src_w), None
        key = (src_h, src_w)
        if key in self._fn:
            return self._fn[key], self._geom[key]
        if self.tiles > 1:
            batched = jax.jit(self.batch_trace(src_h, src_w))

            def run_single(frame_u8):
                det = batched(frame_u8[None])
                return {k: v[0] for k, v in det.items()}

            self._fn[key] = run_single
            self._geom[key] = None
            return run_single, None
        out_h, out_w, r, top, left = yolov8.letterbox_shape(src_h, src_w, self.imgsz)
        new_h, new_w = round(src_h * r), round(src_w * r)
        spec = self.spec
        params = self.params
        conf, iou, max_det = self.conf, self.iou, self.max_det
        class_mask, agnostic = self.class_mask, self.agnostic

        half = self.half

        @jax.jit
        def run(frame_u8):
            img = yolov8.letterbox(frame_u8, out_h, out_w, new_h, new_w, top, left)
            if half:
                img = img.astype(jnp.bfloat16)
            boxes, probs = yolov8.forward(params, img[None], spec)
            det = postprocess_detections(
                boxes[0].astype(jnp.float32), probs[0].astype(jnp.float32),
                conf, iou, max_det,
                class_mask=class_mask, agnostic=agnostic,
            )
            det["boxes_xywh"] = yolov8.unletterbox_boxes(det["boxes_xywh"], r, top, left)
            return det

        self._fn[key] = run
        self._geom[key] = (r, top, left)
        return run, self._geom[key]

    def __call__(self, frame_rgb_u8: np.ndarray, frame_index: int = 0) -> dict:
        """Detect on one (H,W,3) uint8 frame -> dict of (max_det,) arrays."""
        run, _ = self._pipeline(frame_rgb_u8.shape[0], frame_rgb_u8.shape[1])
        return run(jnp.asarray(frame_rgb_u8))

    def batch_trace(self, src_h: int, src_w: int):
        """The traceable (un-jitted) batched detection body for a source
        resolution — composable inside larger jitted programs (the fused
        extraction chunk step builds on this)."""
        if self.tiles > 1:
            from geotrax_tpu.parallel.tiling import tiled_batch_trace

            tiled = tiled_batch_trace(
                self.spec, self.tiles, src_h, src_w, imgsz=self.imgsz,
                conf=self.conf, iou=self.iou, max_det=self.max_det,
                overlap=self.tile_overlap, class_mask=self.class_mask,
                agnostic=self.agnostic, half=self.half,
            )
            own = self.params

            def run_tiled(frames_u8, fids=None, params=None):
                return tiled(frames_u8, fids, params=params if params else own)

            return run_tiled
        out_h, out_w, r, top, left = yolov8.letterbox_shape(src_h, src_w, self.imgsz)
        new_h, new_w = round(src_h * r), round(src_w * r)
        spec, own_params = self.spec, self.params
        conf, iou, max_det = self.conf, self.iou, self.max_det
        class_mask, agnostic = self.class_mask, self.agnostic

        half = self.half

        def run(frames_u8, fids=None, params=None):
            # params passed as a jit argument by FusedExtractor (keeps the
            # weights out of the HLO so the compilation cache hits); falls
            # back to the bound weights for direct use
            p = params if params else own_params
            imgs = jax.vmap(
                lambda f: yolov8.letterbox(f, out_h, out_w, new_h, new_w, top, left)
            )(frames_u8)
            if half:
                imgs = imgs.astype(jnp.bfloat16)
            boxes, probs = yolov8.forward(p, imgs, spec)
            det = jax.vmap(
                lambda b, p: postprocess_detections(
                    b.astype(jnp.float32), p.astype(jnp.float32),
                    conf, iou, max_det, class_mask=class_mask, agnostic=agnostic
                )
            )(boxes, probs)
            det["boxes_xywh"] = yolov8.unletterbox_boxes(det["boxes_xywh"], r, top, left)
            return det

        return run

    def resize_geometry(self, src_h: int, src_w: int):
        """(new_h, new_w, r, top, left, out_h, out_w) of the letterbox resize
        for a source resolution, or None when the pre-resized fast path is
        unsupported (RT-DETR, tiling)."""
        if self.is_rtdetr or self.tiles > 1:
            return None
        out_h, out_w, r, top, left = yolov8.letterbox_shape(src_h, src_w, self.imgsz)
        return round(src_h * r), round(src_w * r), r, top, left, out_h, out_w

    def batch_trace_resized(self, src_h: int, src_w: int):
        """Like batch_trace but consuming ALREADY-RESIZED (C,new_h,new_w,3)
        uint8 frames. The caller (FusedExtractor) runs the cv2-bit-exact
        letterbox resize itself so ONE pass over the 4K frame feeds both
        detection and the stabilization gray — the full-resolution HBM read
        is the dominant preprocessing cost on TPU (one read instead of two).
        Detection results are identical to batch_trace: the resize here is
        the same fixed-point op, only hoisted."""
        geom = self.resize_geometry(src_h, src_w)
        if geom is None:
            return None
        new_h, new_w, r, top, left, out_h, out_w = geom
        spec, own_params = self.spec, self.params
        conf, iou, max_det = self.conf, self.iou, self.max_det
        class_mask, agnostic = self.class_mask, self.agnostic
        half = self.half

        def run(resized_u8, fids=None, params=None):
            p = params if params else own_params
            imgs = jax.vmap(
                lambda f: yolov8.letterbox_pad(f, out_h, out_w, top, left)
            )(resized_u8)
            if half:
                imgs = imgs.astype(jnp.bfloat16)
            boxes, probs = yolov8.forward(p, imgs, spec)
            det = jax.vmap(
                lambda b, p: postprocess_detections(
                    b.astype(jnp.float32), p.astype(jnp.float32),
                    conf, iou, max_det, class_mask=class_mask, agnostic=agnostic
                )
            )(boxes, probs)
            det["boxes_xywh"] = yolov8.unletterbox_boxes(det["boxes_xywh"], r, top, left)
            return det

        return run

    def _batch_pipeline(self, src_h: int, src_w: int, batch: int):
        key = (src_h, src_w, batch)
        if key in self._fn:
            return self._fn[key]
        run = jax.jit(self.batch_trace(src_h, src_w))
        self._fn[key] = run
        return run

    def detect_batch(self, frames_rgb_u8: np.ndarray) -> dict:
        """Batched detection on (B,H,W,3) uint8 frames -> dict of (B, max_det,
        ...) arrays. One MXU-efficient device step per chunk (the single-frame
        path underutilizes the systolic array at small channel counts)."""
        b, h, w = frames_rgb_u8.shape[:3]
        run = self._batch_pipeline(h, w, b)
        return run(jnp.asarray(frames_rgb_u8))


class OracleDetector:
    """Test double: 'detects' ground-truth boxes supplied per frame index
    (used with SyntheticVideoReader so the extraction pipeline runs
    hermetically — the fake-backend pattern from SURVEY.md §4)."""

    is_rtdetr = False

    def __init__(self, boxes_by_frame, max_det: int = 8, score: float = 0.9,
                 cls: int = 0, table_frames: int = 512, frame_offset: int = 0):
        self.boxes_by_frame = boxes_by_frame
        self.max_det = max_det
        self.score = score
        self.cls = cls
        self.table_frames = table_frames
        self.frame_offset = frame_offset
        self.class_names = {0: "car", 1: "bus", 2: "truck", 3: "motorcycle"}

    def __call__(self, frame_rgb_u8, frame_index: int = 0) -> dict:
        boxes = self.boxes_by_frame(frame_index)
        b = np.zeros((self.max_det, 4), np.float32)
        s = np.zeros((self.max_det,), np.float32)
        c = np.full((self.max_det,), -1, np.int32)
        v = np.zeros((self.max_det,), bool)
        n = min(len(boxes), self.max_det)
        if n:
            arr = np.asarray(boxes, np.float32)[:n]
            b[:n] = arr[:, :4]
            s[:n] = arr[:, 4] if arr.shape[1] > 4 else self.score
            c[:n] = arr[:, 5].astype(np.int32) if arr.shape[1] > 5 else self.cls
            v[:n] = True
        return {
            "boxes_xywh": jnp.asarray(b),
            "scores": jnp.asarray(s),
            "classes": jnp.asarray(c),
            "valid": jnp.asarray(v),
        }

    def batch_trace(self, src_h: int, src_w: int):
        """Traceable batched lookup so the FUSED chunk path runs under the
        hermetic e2e tests (fused-vs-sequential parity, VERDICT r2 #4): the
        per-frame oracle boxes are precomputed into a device table indexed by
        the chunk's (1-based) internal frame ids. Frames beyond
        ``table_frames`` read the empty tail row."""
        t = self.table_frames
        tb = np.zeros((t + 1, self.max_det, 4), np.float32)
        ts = np.zeros((t + 1, self.max_det), np.float32)
        tc = np.full((t + 1, self.max_det), -1, np.int32)
        tv = np.zeros((t + 1, self.max_det), bool)
        for f in range(t):
            det = self(None, f + self.frame_offset)
            tb[f] = np.asarray(det["boxes_xywh"])
            ts[f] = np.asarray(det["scores"])
            tc[f] = np.asarray(det["classes"])
            tv[f] = np.asarray(det["valid"])
        tb, ts, tc, tv = map(jnp.asarray, (tb, ts, tc, tv))

        def run(frames_u8, fids=None, params=None):
            c = frames_u8.shape[0]
            if fids is None:
                idx = jnp.arange(c)
            else:
                idx = jnp.clip(fids.astype(jnp.int32) - 1, 0, t)
            return {
                "boxes_xywh": tb[idx],
                "scores": ts[idx],
                "classes": tc[idx],
                "valid": tv[idx],
            }

        return run


class SequentialOnly:
    """Wrapper hiding ``batch_trace`` so extraction routes a fused-capable
    detector through the sequential per-frame loop (parity tests)."""

    is_rtdetr = False

    def __init__(self, detector):
        self._d = detector
        self.max_det = detector.max_det
        self.class_names = detector.class_names

    def __call__(self, frame_rgb_u8, frame_index: int = 0):
        return self._d(frame_rgb_u8, frame_index)
