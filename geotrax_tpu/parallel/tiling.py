"""Spatial frame tiling: detection over device-sharded 4K tiles.

SURVEY §2.6's closest analog of context parallelism for this workload: a
4K frame is split into overlapping vertical tiles, each tile runs the
detector at its native resolution on its own device (the tile axis is
sharded over the mesh's 'data' axis), and the per-tile detections are
merged back into one global set — coordinate offsetting, cross-boundary
de-duplication by the same fixed-shape NMS the single-frame path uses.

Unlike the default path (whole 4K letterboxed to imgsz 1920, i.e. 0.5x),
tiling keeps MORE resolution per object: T tiles at imgsz 1920 see the
scene at ~T/2 the default scale, which is the accuracy lever for small
objects (motorcycles at 0.027 m/px GSD). The reference has no equivalent —
it marks even multi-threaded batch processing as planned.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geotrax_tpu.models import yolov8
from geotrax_tpu.ops.boxes import xywh_to_xyxy
from geotrax_tpu.ops.nms import nms, postprocess_detections


def tile_geometry(width: int, n_tiles: int, overlap: int) -> list[tuple[int, int]]:
    """[(x0, tile_width)] covering [0, width) with ``overlap`` px shared on
    each interior boundary; all tiles the same width (static shapes)."""
    core = int(np.ceil(width / n_tiles))
    tw = min(core + 2 * overlap, width)
    xs = []
    for i in range(n_tiles):
        x0 = min(max(i * core - overlap, 0), width - tw)
        xs.append((x0, tw))
    return xs


def make_tiled_detector(params, spec, n_tiles: int, src_h: int, src_w: int,
                        imgsz: int = 1920, conf: float = 0.25,
                        iou: float = 0.7, max_det: int = 1000,
                        overlap: int = 128, mesh: Optional[Mesh] = None):
    """Build a jitted (frame_u8 (H,W,3)) -> fixed-slot detections function
    that fans the tile axis out over ``mesh``'s 'data' axis when given.

    Merge semantics: per-tile NMS first (cheap, parallel), then coordinate
    offsets, then one global NMS across the concatenated tile outputs so
    objects straddling a boundary (seen by both neighbors thanks to the
    overlap) keep exactly one box.
    """
    geom = tile_geometry(src_w, n_tiles, overlap)
    tw = geom[0][1]
    x_offsets = jnp.asarray([g[0] for g in geom], jnp.float32)
    out_h, out_w, r, top, left = yolov8.letterbox_shape(src_h, tw, imgsz)
    new_h, new_w = round(src_h * r), round(tw * r)
    per_tile = max_det // 2

    def run(frame_u8):
        tiles = jnp.stack([
            jax.lax.dynamic_slice(frame_u8, (0, g[0], 0), (src_h, tw, 3))
            for g in geom
        ])  # (T, H, tw, 3)
        if mesh is not None:
            tiles = jax.lax.with_sharding_constraint(
                tiles, NamedSharding(mesh, P("data")))

        imgs = jax.vmap(
            lambda f: yolov8.letterbox(f, out_h, out_w, new_h, new_w, top, left)
        )(tiles)
        boxes, probs = yolov8.forward(params, imgs, spec)
        # bf16 checkpoints: global-coordinate math (x_offsets up to 3840)
        # quantizes to ~16 px in bf16 — cast up before postprocess/merge.
        boxes = boxes.astype(jnp.float32)
        probs = probs.astype(jnp.float32)
        det = jax.vmap(
            lambda b, p: postprocess_detections(
                b, p, conf, iou, per_tile, agnostic=True)
        )(boxes, probs)
        tile_boxes = yolov8.unletterbox_boxes(det["boxes_xywh"], r, top, left)
        tile_boxes = tile_boxes.at[..., 0].add(x_offsets[:, None])

        # global merge: concat all tiles, one fixed-shape NMS de-dupes the
        # overlap-region double detections
        all_boxes = tile_boxes.reshape(-1, 4)
        all_scores = jnp.where(det["valid"], det["scores"], 0.0).reshape(-1)
        all_classes = det["classes"].reshape(-1)
        keep, valid = nms(
            xywh_to_xyxy(all_boxes), all_scores, iou, max_det, agnostic=True
        )
        return {
            "boxes_xywh": jnp.where(valid[:, None], all_boxes[keep], 0.0),
            "scores": jnp.where(valid, all_scores[keep], 0.0),
            "classes": jnp.where(valid, all_classes[keep], -1),
            "valid": valid,
        }

    return jax.jit(run)


def tiled_batch_trace(spec, n_tiles: int, src_h: int, src_w: int,
                      imgsz: int = 1920, conf: float = 0.25, iou: float = 0.7,
                      max_det: int = 1000, overlap: int = 128,
                      class_mask=None, agnostic: bool = True,
                      half: bool = False):
    """Traceable chunk-batched tiled detection for the fused extraction path
    (`Detector.batch_trace` dispatches here when cfg ultralytics.tiles > 1).

    Returns ``run(frames_u8 (C,H,W,3), fids=None, params=None)`` -> the same
    fixed-slot detection dict the whole-frame path produces, so the fused
    chunk step (tracker, stabilization masks, ReID) consumes merged tile
    detections unchanged. All C*T tiles run through ONE detector forward —
    the tile axis rides the batch dimension, which on a single chip maximizes
    MXU occupancy and under GSPMD is the axis a mesh shards
    (dryrun_multichip / make_tiled_detector).
    """
    geom = tile_geometry(src_w, n_tiles, overlap)
    tw = geom[0][1]
    x_offsets = jnp.asarray([g[0] for g in geom], jnp.float32)
    out_h, out_w, r, top, left = yolov8.letterbox_shape(src_h, tw, imgsz)
    new_h, new_w = round(src_h * r), round(tw * r)
    per_tile = max_det // 2  # same per-tile budget as make_tiled_detector

    def run(frames_u8, fids=None, params=None):
        c = frames_u8.shape[0]
        tiles = jnp.stack([
            jax.lax.dynamic_slice(
                frames_u8, (0, 0, g[0], 0), (c, src_h, tw, 3))
            for g in geom
        ])  # (T, C, H, tw, 3)
        flat = tiles.reshape((n_tiles * c, src_h, tw, 3))
        imgs = jax.vmap(
            lambda f: yolov8.letterbox(f, out_h, out_w, new_h, new_w, top, left)
        )(flat)
        if half:
            imgs = imgs.astype(jnp.bfloat16)
        boxes, probs = yolov8.forward(params, imgs, spec)
        # global-coordinate math (x offsets up to src_w) quantizes to ~16 px
        # in bf16 — cast up before postprocess/merge (ADVICE r2)
        boxes = boxes.astype(jnp.float32)
        probs = probs.astype(jnp.float32)
        det = jax.vmap(
            lambda b, p: postprocess_detections(
                b, p, conf, iou, per_tile,
                class_mask=class_mask, agnostic=agnostic)
        )(boxes, probs)
        tile_boxes = yolov8.unletterbox_boxes(det["boxes_xywh"], r, top, left)
        tile_boxes = tile_boxes.reshape((n_tiles, c, per_tile, 4))
        tile_boxes = tile_boxes.at[..., 0].add(x_offsets[:, None, None])

        # per-frame global merge: (T, C, K) -> (C, T*K), one fixed-shape NMS
        # de-dupes the overlap-region double detections
        all_boxes = jnp.swapaxes(tile_boxes, 0, 1).reshape((c, -1, 4))
        scores = jnp.where(det["valid"], det["scores"], 0.0)
        all_scores = jnp.swapaxes(
            scores.reshape((n_tiles, c, per_tile)), 0, 1).reshape((c, -1))
        all_classes = jnp.swapaxes(
            det["classes"].reshape((n_tiles, c, per_tile)), 0, 1).reshape((c, -1))

        def merge(b, s, cl):
            keep, valid = nms(xywh_to_xyxy(b), s, iou, max_det,
                              class_ids=cl, agnostic=agnostic)
            return {
                "boxes_xywh": jnp.where(valid[:, None], b[keep], 0.0),
                "scores": jnp.where(valid, s[keep], 0.0),
                "classes": jnp.where(valid, cl[keep], -1),
                "valid": valid,
            }

        return jax.vmap(merge)(all_boxes, all_scores, all_classes)

    return run


def merge_tile_detections(tile_dets: dict, x_offsets, iou: float,
                          max_det: int) -> dict:
    """Standalone merge used by tests and custom tilers: offset + global NMS
    over a (T, K, ...) per-tile detection dict."""
    boxes = tile_dets["boxes_xywh"].at[..., 0].add(
        jnp.asarray(x_offsets, jnp.float32)[:, None])
    all_boxes = boxes.reshape(-1, 4)
    all_scores = jnp.where(tile_dets["valid"], tile_dets["scores"], 0.0).reshape(-1)
    all_classes = tile_dets["classes"].reshape(-1)
    keep, valid = nms(xywh_to_xyxy(all_boxes), all_scores, iou, max_det,
                      agnostic=True)
    return {
        "boxes_xywh": jnp.where(valid[:, None], all_boxes[keep], 0.0),
        "scores": jnp.where(valid, all_scores[keep], 0.0),
        "classes": jnp.where(valid, all_classes[keep], -1),
        "valid": valid,
    }
