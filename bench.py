"""End-of-round benchmark: 4K extraction throughput per chip.

Measures the device compute path of the extraction stage on synthetic 4K
frames: letterbox 3840x2160 -> 1088x1920, YOLOv8s forward (bf16 params +
activations, f32 accumulation), fixed-shape class-agnostic NMS (max_det
1000), and a BoT-SORT tracker step — i.e. everything the reference runs per
frame through ultralytics' model.track() (SURVEY.md §3.2), excluding host
video decode (no 4K source material ships with the repo; the native decoder
is benchmarked separately by its tests).

Stabilization (config stabilize: true) adds a separately-measured fused
device pass — FAST corners + descriptors + MXU Hamming matching + 1250
parallel RANSAC hypotheses — of ~17 ms/frame at the default 0.5 downsample
(2000/4000 feature budget; block-slice patch gathers + one-hot MXU
selection, see ops/features.py); the reference's CPU stabilo runs the same
step in hundreds of ms. The headline metric matches the reference's
model.track() scope (detect + NMS + track).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline anchors to the 4K capture rate of the reference deployment
(29.97 fps, DJI Mavic 3): value/29.97 = multiples of realtime per chip.
The reference publishes no throughput numbers (BASELINE.md); its GPU
pipeline ran at or below realtime on 4K.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 30000 / 1001  # 4K capture realtime


def main() -> None:
    from geotrax_tpu.models import yolov8
    from geotrax_tpu.ops.nms import postprocess_detections
    from geotrax_tpu.track import make_tracker

    spec = yolov8.ModelSpec(variant="s", nc=4)
    params = yolov8.init_params(jax.random.PRNGKey(0), spec)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    src_h, src_w = 2160, 3840
    imgsz = 1920
    out_h, out_w, r, top, left = yolov8.letterbox_shape(src_h, src_w, imgsz)
    new_h, new_w = round(src_h * r), round(src_w * r)
    max_det = 1000

    tracker_params = {
        "track_high_thresh": 0.25, "track_low_thresh": 0.1, "new_track_thresh": 0.25,
        "track_buffer": 30, "match_thresh": 0.8, "fuse_score": True,
        "gmc_method": "none",
    }
    _, tracker_state, tracker_step = make_tracker("botsort", tracker_params, max_tracks=512)

    chunk = 16  # frames batch-detected per device step; tracking stays sequential

    @jax.jit
    def device_chunk(base_frames, key, state, frame_id0):
        # Frames live on device (the benchmark must measure the compute
        # path, not host->device shipping of 200 MB chunks over the dev
        # tunnel); a per-call random brightness offset varies the input so
        # no caching layer can elide repeated work, at negligible cost
        # (full per-call frame synthesis costs several ms/frame of PRNG).
        jitter = jax.random.randint(key, (chunk, 1, 1, 1), 0, 8, dtype=jnp.uint8)
        frames_u8 = base_frames + jitter
        imgs = jax.vmap(
            lambda f: yolov8.letterbox(f, out_h, out_w, new_h, new_w, top, left)
        )(frames_u8).astype(jnp.bfloat16)
        boxes, probs = yolov8.forward(params, imgs, spec)
        det = jax.vmap(
            lambda b, p: postprocess_detections(
                b.astype(jnp.float32), p.astype(jnp.float32), 0.25, 0.7, max_det,
                agnostic=True,
            )
        )(boxes, probs)
        det_boxes = yolov8.unletterbox_boxes(det["boxes_xywh"], r, top, left)

        def track_one(state, inp):
            b, s, c, v, fid = inp
            state, out = tracker_step(state, b, s, c, v, fid, None)
            return state, out.valid.sum()

        fids = frame_id0 + jnp.arange(chunk)
        state, counts = jax.lax.scan(
            track_one, state,
            (det_boxes, det["scores"], det["classes"], det["valid"], fids),
        )
        return state, counts

    base = jax.jit(
        lambda k: jax.random.randint(k, (chunk, src_h, src_w, 3), 0, 247, dtype=jnp.uint8)
    )(jax.random.PRNGKey(42))
    jax.block_until_ready(base)

    state = tracker_state
    state, counts = device_chunk(base, jax.random.PRNGKey(0), state, 1)
    jax.block_until_ready(counts)

    n_chunks = 10
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, counts = device_chunk(base, jax.random.PRNGKey(i + 1), state, 1 + i * chunk)
    jax.block_until_ready(counts)
    elapsed = time.perf_counter() - t0

    fps = n_chunks * chunk / elapsed
    print(json.dumps({
        "metric": "4k_extract_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
