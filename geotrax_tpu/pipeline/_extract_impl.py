"""Extraction stage implementation: decode -> detect -> track -> stabilize.

The reference's hot loop (extract.py:145-197) re-designed TPU-first: a host
decode thread prefetches frames, the device runs one jitted detection step
(letterbox + YOLOv8 + NMS) and one jitted tracker step per frame, and the
stabilization feature pipeline reuses the per-frame detections as masks.
Camera-motion compensation for the GMC trackers is derived from consecutive
stabilization homographies (H_prev->cur = H_cur->ref^-1 . H_prev->ref)
instead of a separate optical-flow pass (reference §2.3 N7).

Outputs (schemas identical to the reference, README 'Output file formats'):
  <out>/<stem><tracks_postfix>.txt       10/11/14/15-col tracks, %g, comma
  <out>/<stem><stab_postfix>.txt         frame + 3x3 homography, %.16g
  <video>.yaml                           run metadata next to the video
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np
import yaml
from tqdm import tqdm

from geotrax_tpu import __version__
from geotrax_tpu.pipeline import postprocess
from geotrax_tpu.utils.config_utils import backfill_args_from_config, load_config_all
from geotrax_tpu.utils.file_utils import convert_to_serializable, get_output_dir


def load_detector(config: dict, logger):
    """Build the detection backend (tests monkeypatch this, mirroring the
    reference's load_detector patch point, extract.py:217)."""
    from geotrax_tpu.models.detector import Detector

    return Detector(Path(config["ultralytics"]["model"]), config["ultralytics"], logger)


def open_reader(source: Path, start: int, stop, config: dict):
    """Video reader factory (tests monkeypatch with SyntheticVideoReader).
    GEOTRAX_DECODE_WORKERS>1 selects the GOP-parallel reader on multi-core
    hosts — host decode, not the device pipeline, bounds e2e throughput on
    4K sources (SURVEY.md §7 hard part 6)."""
    from geotrax_tpu.io.video import make_reader

    return make_reader(source, start=start, stop=stop)


def _transform_boxes(h_matrix: np.ndarray, boxes_xywh: np.ndarray) -> np.ndarray:
    """Map (N,4) cxcywh boxes through a homography (corner transform +
    axis-aligned refit). Delegates to the SAME jitted f32 program as the
    fused chunk (device_pipeline._transform_boxes_h) so the sequential,
    parallel and fused paths emit bit-identical stabilized boxes."""
    if len(boxes_xywh) == 0:
        return boxes_xywh
    import jax.numpy as jnp

    from geotrax_tpu.pipeline.device_pipeline import transform_boxes

    return np.asarray(transform_boxes(
        jnp.asarray(h_matrix, jnp.float32), jnp.asarray(boxes_xywh, jnp.float32)
    ))


# One chunk per fused dispatch. Shared by the CLI host loop and bench.py so
# the benchmark compiles (and the persistent cache keeps) the exact program
# `extract` runs. Larger batches raise detector MXU occupancy (bench: 3.9 ->
# 3.2 ms/frame fwd); 64 exhausts v5e HBM at 4K.
FUSED_CHUNK = 32

# Process-level reuse of the loaded detector + traced fused extractor across
# extract calls (batch over a directory tree, bench warm passes). Re-tracing
# the fused 4K program costs tens of seconds per video even on a persistent
# compile-cache HIT, and reloading weights re-uploads ~45 MB per video; with
# the cache the 2nd..Nth same-config videos start in milliseconds
# (FusedExtractor.reset() restarts all per-video state). Keyed on the model
# file identity (path+mtime+size), the full detection/stabilo/tracker config,
# and — for the per-shape extractor map — the source resolution. Only real
# Detector instances are cached (tests monkeypatch load_detector with mocks
# that must not leak across tests).
_EXTRACT_CACHE: dict = {}
_EXTRACT_CACHE_MAX = 4


def _extract_cache_key(config: dict, stabilize_on: bool) -> str:
    import json

    det_cfg = dict(config["ultralytics"])
    model = str(det_cfg.get("model", ""))
    try:
        st = Path(model).stat()
        mstamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        mstamp = None
    main = config["main"]
    return json.dumps({
        "model": model, "mstamp": mstamp, "det": det_cfg,
        "stab": config.get("stabilo") if stabilize_on else None,
        "tracker": [main["tracker_active"], main["tracker_params"]],
        "chunk": FUSED_CHUNK,
    }, sort_keys=True, default=str)


def make_extract_tracker(config: dict, logger):
    """Tracker construction exactly as the extract stage performs it —
    (tracker_cfg, tracker_state, tracker_step, reid_params). Factored out so
    bench.py builds a bit-identical program (same max_tracks capacity, same
    parameter block, same ReID resolution). Reference analog: the tracker
    ultralytics constructs inside model.track() (SURVEY.md §3.2)."""
    from geotrax_tpu.track import make_tracker

    main = config["main"]
    max_det = int(config["ultralytics"].get("max_det", 1000) or 1000)
    tracker_cfg, tracker_state, tracker_step = make_tracker(
        main["tracker_active"], main["tracker_params"],
        max_tracks=max(256, min(max_det, 1024))
    )
    # Learned ReID head (cfg tracker.<name>.model: path.npz) — None keeps the
    # weight-free projection embedding (reference cfg/default.yaml:377-379).
    reid_params = None
    if bool(getattr(tracker_cfg, "with_reid", False)):
        from geotrax_tpu.track.reid import resolve_head

        reid_params = resolve_head(main["tracker_params"], logger)
    return tracker_cfg, tracker_state, tracker_step, reid_params


def make_fused_extractor(config: dict, detector, tracker_cfg, tracker_state,
                         tracker_step, stabilize_on: bool, src_h: int,
                         src_w: int, reid_params=None):
    """Construct the production FusedExtractor exactly as the extract host
    loop does (single source of truth for chunk size, stabilo wiring, GMC
    and ReID flags). bench.py calls this so its headline measures — and
    pre-warms the compile cache for — the very program the CLI dispatches."""
    from geotrax_tpu.pipeline.device_pipeline import FusedExtractor

    return FusedExtractor(
        detector,
        config.get("stabilo", {}) if stabilize_on else None,
        tracker_step, tracker_state, src_h, src_w,
        use_gmc=bool(getattr(tracker_cfg, "use_gmc", False)),
        chunk=FUSED_CHUNK,
        with_reid=bool(getattr(tracker_cfg, "with_reid", False)),
        reid_params=reid_params,
    )


def track_video(args, config: dict, logger) -> tuple:
    """Run the per-frame loop; returns (tracks_rows, transforms_rows, stats).

    Two execution paths: the fused device pipeline (one jit dispatch per
    chunk — detect+NMS+stabilize+GMC+track+box-transform, see
    device_pipeline.py) when the detector and stabilizer support it, and the
    sequential per-frame loop otherwise (RT-DETR, oracle test detectors,
    SIFT-class stabilizers)."""
    main = config["main"]
    extraction = main["extraction"]
    stabilize_on = bool(extraction.get("stabilize", True))

    cache_key = _extract_cache_key(config, stabilize_on)
    cached = _EXTRACT_CACHE.get(cache_key)
    if cached is not None:
        detector, tracker_cfg, tracker_state, tracker_step, reid_params, \
            fx_by_shape = cached
    else:
        detector = load_detector(config, logger)
        tracker_cfg, tracker_state, tracker_step, reid_params = (
            make_extract_tracker(config, logger)
        )
        fx_by_shape = {}
        from geotrax_tpu.models.detector import Detector

        if type(detector) is Detector:
            while len(_EXTRACT_CACHE) >= _EXTRACT_CACHE_MAX:
                _EXTRACT_CACHE.pop(next(iter(_EXTRACT_CACHE)))
            _EXTRACT_CACHE[cache_key] = (
                detector, tracker_cfg, tracker_state, tracker_step,
                reid_params, fx_by_shape,
            )

    cut_left = int(args.cut_frame_left or 0)
    cut_right = args.cut_frame_right
    reader = open_reader(args.source, cut_left, cut_right, config)

    stabilizer = None
    if stabilize_on:
        from geotrax_tpu.stabilize import Stabilizer

        stabilizer = Stabilizer(**config.get("stabilo", {}))

    fused_ok = (
        hasattr(detector, "batch_trace")
        and not getattr(detector, "is_rtdetr", False)
        and (stabilizer is None or stabilizer.n_levels == 1)
    )
    if fused_ok:
        return _track_video_fused(
            args, config, logger, reader, detector, tracker_cfg, tracker_state,
            tracker_step, stabilize_on, cut_left, reid_params=reid_params,
            fx_by_shape=fx_by_shape,
        )

    rows = []
    transforms = []
    h_prev = None
    detect_ms = stab_ms = 0.0
    n_frames = 0
    t_start = time.time()
    import jax.numpy as jnp

    # Chunked detection: frames are batch-detected in groups (better MXU
    # utilization than single frames), then tracked/stabilized sequentially.
    chunk_size = (
        16 if hasattr(detector, "detect_batch") and not getattr(detector, "is_rtdetr", False)
        else 1
    )

    def frame_chunks():
        buf = []
        for item in reader:
            buf.append(item)
            if len(buf) == chunk_size:
                yield buf
                buf = []
        if buf:
            yield buf

    class_names = main.get("class_names") or {}
    class_counts: dict = {}
    pbar = tqdm(desc="Extracting", unit="frame")
    for chunk in frame_chunks():
        t0 = time.time()
        if chunk_size > 1 and len(chunk) > 1:
            # Upload the chunk once; detector and stabilizer share the
            # device-resident frames (a 4K frame is 24 MB — shipping it
            # twice per frame would dominate the frame budget).
            stacked = jnp.asarray(np.stack([f for _, f in chunk]))
            batch_det = detector.detect_batch(stacked)
            chunk_dets = [
                {k: v[i] for k, v in batch_det.items()} for i in range(len(chunk))
            ]
            chunk = [(idx, stacked[i]) for i, (idx, _f) in enumerate(chunk)]
        else:
            chunk_dets = [detector(f, idx) for idx, f in chunk]
        detect_ms += (time.time() - t0) * 1000

        for (frame_idx, frame), det in zip(chunk, chunk_dets):
            det_boxes = np.asarray(det["boxes_xywh"])
            det_valid = np.asarray(det["valid"])

            # ---- stabilization homography for this frame (also feeds GMC)
            h_cur = np.eye(3)
            t0 = time.time()
            if stabilizer is not None:
                mask_boxes = det_boxes[det_valid]
                if frame_idx == cut_left:
                    stabilizer.set_ref_frame(frame, mask_boxes)
                else:
                    stabilizer.stabilize(frame, mask_boxes)
                    h_est = stabilizer.get_cur_trans_matrix()
                    if h_est is not None:
                        h_cur = h_est
                    else:
                        logger.warning(f"Frame {frame_idx}: stabilization failed; identity used.")
                    transforms.append(np.concatenate([[frame_idx], h_cur.reshape(-1)]))
            stab_ms += (time.time() - t0) * 1000

            gmc_h = None
            if h_prev is not None:
                # same jitted f32 adjugate program as the fused chunk — a
                # host np.linalg.inv (f64) here drifts from the fused path
                # by ULPs the KF then amplifies into text-level diffs
                from geotrax_tpu.pipeline.device_pipeline import gmc_from_h

                gmc_h = gmc_from_h(
                    jnp.asarray(h_cur, jnp.float32), jnp.asarray(h_prev, jnp.float32)
                )
            h_prev = h_cur

            # ---- appearance embeddings (same device op as the fused path)
            det_emb = None
            if bool(getattr(tracker_cfg, "with_reid", False)):
                from geotrax_tpu.pipeline.device_pipeline import embed_boxes

                det_emb = embed_boxes(
                    jnp.asarray(frame)[None], jnp.asarray(det["boxes_xywh"])[None],
                    head_params=reid_params,
                )[0]

            # ---- tracker step (frame ids are 1-based inside the tracker)
            internal_frame = frame_idx - cut_left + 1
            tracker_state, out = tracker_step(
                tracker_state, det["boxes_xywh"], det["scores"], det["classes"],
                det["valid"], internal_frame, gmc_h, det_emb,
            )
            valid = np.asarray(out.valid)
            ids = np.asarray(out.track_id)[valid]
            boxes = np.asarray(out.box_xywh)[valid]
            scores = np.asarray(out.score)[valid]
            classes = np.asarray(out.cls)[valid]

            if stabilize_on:
                if frame_idx == cut_left:
                    boxes_stab = boxes
                else:
                    # transform the FULL fixed-size track table (one compiled
                    # shape), then subset — per-frame variable-K calls would
                    # recompile on every new K
                    boxes_stab = _transform_boxes(h_cur, np.asarray(out.box_xywh))[valid]
                frame_rows = np.column_stack([
                    np.full(len(ids), frame_idx, float), ids.astype(float),
                    boxes, boxes_stab, classes.astype(float), scores,
                ])
            else:
                frame_rows = np.column_stack([
                    np.full(len(ids), frame_idx, float), ids.astype(float),
                    boxes, classes.astype(float), scores,
                ])
            rows.append(frame_rows)
            n_frames += 1
            # live per-class unique-track counts + stage timings in the
            # progress bar (reference extract.py:253-270 UI parity)
            for tid, c in zip(ids, classes):
                class_counts.setdefault(int(c), set()).add(int(tid))
            postfix = {
                str(class_names.get(c, c)): len(s) for c, s in sorted(class_counts.items())
            }
            postfix["det ms"] = f"{detect_ms / max(n_frames, 1):.0f}"
            postfix["stab ms"] = f"{stab_ms / max(n_frames, 1):.0f}"
            pbar.set_postfix(postfix, refresh=False)
            pbar.update(1)
    pbar.close()

    elapsed = max(time.time() - t_start, 1e-9)
    stats = {
        "frames": n_frames,
        "avg_detect_ms": detect_ms / max(n_frames, 1),
        "avg_stab_ms": stab_ms / max(n_frames, 1),
        "fps": n_frames / elapsed,
        "frame_size": (reader.info.width, reader.info.height),
        "video_fps": reader.info.fps,
    }
    logger.info(
        f"Extraction: {n_frames} frames, detect {stats['avg_detect_ms']:.1f} ms/f, "
        f"stab {stats['avg_stab_ms']:.1f} ms/f, pipeline {stats['fps']:.1f} fps"
    )
    n_cols = 12 if stabilize_on else 8
    tracks = np.concatenate(rows, axis=0) if rows else np.empty((0, n_cols))
    transforms_arr = (
        np.asarray(transforms) if transforms else np.empty((0, 10))
    )
    return tracks, transforms_arr, stats


def _track_video_fused(args, config, logger, reader, detector, tracker_cfg,
                       tracker_state, tracker_step, stabilize_on: bool,
                       cut_left: int, reid_params=None,
                       fx_by_shape=None) -> tuple:
    """Host loop for the fused device pipeline: buffer a chunk of frames,
    one device dispatch, one fetch, emit rows (formats identical to the
    sequential path)."""
    import jax

    main = config["main"]
    chunk = FUSED_CHUNK
    src_w, src_h = reader.info.width, reader.info.height
    fx = None if fx_by_shape is None else fx_by_shape.get((src_h, src_w))
    if fx is not None:
        fx.reset()   # same program, fresh per-video state (trace reuse)
    else:
        fx = make_fused_extractor(
            config, detector, tracker_cfg, tracker_state, tracker_step,
            stabilize_on, src_h, src_w, reid_params=reid_params,
        )
        if fx_by_shape is not None:
            fx_by_shape[(src_h, src_w)] = fx
    min_match_warning = 4

    class_names = main.get("class_names") or {}
    class_counts: dict = {}
    rows = []
    transforms = []
    n_frames = 0
    device_ms = 0.0
    t_start = time.time()
    pbar = tqdm(desc="Extracting", unit="frame")

    def dispatch(buf):
        """Enqueue a chunk on the device; dispatch is async, so the host
        keeps decoding/row-building while the device computes (the fetch
        happens one chunk later in drain())."""
        nonlocal device_ms
        n = len(buf)
        idxs = [i for i, _ in buf]
        frames = np.stack([f for _, f in buf])
        if n < chunk:  # pad the tail chunk to the compiled shape
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], chunk - n, axis=0)], axis=0
            )
            idxs = idxs + [idxs[-1]] * (chunk - n)
        fids = np.asarray(idxs, np.int64) - cut_left + 1
        t0 = time.time()
        out = fx.process_chunk(frames, fids, n)
        device_ms += (time.time() - t0) * 1000
        return out, idxs, n

    def drain(pending):
        nonlocal n_frames, device_ms
        out, idxs, n = pending
        t0 = time.time()
        out = jax.device_get(out)
        device_ms += (time.time() - t0) * 1000

        for i in range(n):
            frame_idx = idxs[i]
            valid = out.valid[i]
            ids = out.track_id[i][valid]
            boxes = out.box_xywh[i][valid]
            scores = out.score[i][valid]
            classes = out.cls[i][valid]
            if stabilize_on:
                if frame_idx > cut_left:
                    if out.matches[i] < min_match_warning:
                        logger.warning(
                            f"Frame {frame_idx}: stabilization failed; identity used."
                        )
                    transforms.append(
                        np.concatenate([[frame_idx], out.h[i].reshape(-1)])
                    )
                # ref frame: stabilized box = raw box by definition (the
                # sequential path does the same, and an f32 round-trip
                # through the identity transform is not guaranteed lossless)
                boxes_stab = boxes if frame_idx == cut_left else out.box_stab[i][valid]
                frame_rows = np.column_stack([
                    np.full(len(ids), frame_idx, float), ids.astype(float),
                    boxes, boxes_stab, classes.astype(float), scores,
                ])
            else:
                frame_rows = np.column_stack([
                    np.full(len(ids), frame_idx, float), ids.astype(float),
                    boxes, classes.astype(float), scores,
                ])
            rows.append(frame_rows)
            n_frames += 1
            for tid, c in zip(ids, classes):
                class_counts.setdefault(int(c), set()).add(int(tid))
        postfix = {
            str(class_names.get(c, c)): len(s) for c, s in sorted(class_counts.items())
        }
        postfix["dev ms"] = f"{device_ms / max(n_frames, 1):.1f}"
        pbar.set_postfix(postfix, refresh=False)
        pbar.update(n)

    buf = []
    pending = None
    for item in reader:
        buf.append(item)
        if len(buf) == chunk:
            nxt = dispatch(buf)
            if pending is not None:
                drain(pending)
            pending = nxt
            buf = []
    if buf:
        nxt = dispatch(buf)
        if pending is not None:
            drain(pending)
        pending = nxt
    if pending is not None:
        drain(pending)
    pbar.close()

    elapsed = max(time.time() - t_start, 1e-9)
    stats = {
        "frames": n_frames,
        "avg_detect_ms": device_ms / max(n_frames, 1),
        "avg_stab_ms": 0.0,  # fused into the single device dispatch
        "fps": n_frames / elapsed,
        "frame_size": (reader.info.width, reader.info.height),
        "video_fps": reader.info.fps,
    }
    logger.info(
        f"Extraction (fused): {n_frames} frames, device {stats['avg_detect_ms']:.1f} ms/f, "
        f"pipeline {stats['fps']:.1f} fps"
    )
    n_cols = 12 if stabilize_on else 8
    tracks = np.concatenate(rows, axis=0) if rows else np.empty((0, n_cols))
    transforms_arr = np.asarray(transforms) if transforms else np.empty((0, 10))
    return tracks, transforms_arr, stats


def run_extraction(args, logger) -> None:
    config = load_config_all(args, logger, needs_model=True)
    main = config["main"]
    backfill_args_from_config(args, {
        "cut_frame_left": main["processing"]["cut_frame_left"],
        "cut_frame_right": main["processing"]["cut_frame_right"],
        "interpolate": main["extraction"]["interpolate"],
        "output_folder": main["output"]["folder"],
    })
    out_cfg = {**main["output"], "folder": args.output_folder}

    profile_dir = getattr(args, "profile", None)
    if profile_dir:
        import jax

        logger.notice(f"Profiling the extraction loop into '{profile_dir}'.")
        with jax.profiler.trace(str(profile_dir)):
            tracks, transforms, stats = track_video(args, config, logger)
    else:
        tracks, transforms, stats = track_video(args, config, logger)

    # ---- post-processing (reference extract.py:296-306 order)
    tracks = postprocess.remove_short_tracks(
        tracks, int(main["extraction"]["min_track_length"]), logger
    )
    tracks = postprocess.vote_track_classes(tracks)
    frame_w, frame_h = stats["frame_size"]
    tracks = postprocess.estimate_vehicle_dimensions(
        tracks, main["extraction"]["dimension_estimation"], frame_w, frame_h
    )
    if args.interpolate:
        max_gap = int(main["tracker_params"].get("track_buffer", 30))
        tracks = postprocess.interpolate_tracks(tracks, max_gap, logger)

    save_results(tracks, transforms, args, config, out_cfg, stats, logger)


def save_results(tracks, transforms, args, config, out_cfg, stats, logger) -> None:
    source = Path(args.source)
    save_dir = get_output_dir(source, out_cfg)
    save_dir.mkdir(parents=True, exist_ok=True)
    tracks_file = save_dir / f"{source.stem}{out_cfg.get('tracks_postfix', '')}.txt"
    transf_file = save_dir / f"{source.stem}{out_cfg.get('stab_transform_postfix', '_vid_transf')}.txt"

    if tracks.size:
        np.savetxt(tracks_file, tracks, fmt="%g", delimiter=",")
        logger.info(f"Tracking results saved to: '{tracks_file.resolve()}'")

    if transforms.size and config["main"]["extraction"].get("save_stab", True):
        frame_nums = transforms[:, 0].astype(int)
        matrices = transforms[:, 1:].reshape(-1, 3, 3)
        if len(frame_nums) and not np.all(np.diff(frame_nums) == 1):
            logger.warning(f"Missing frame ids found in: '{transf_file}'.")
        if len(matrices) and not np.all(np.linalg.det(matrices) > 0):
            logger.warning(f"Invalid transforms found in: '{transf_file}'.")
        np.savetxt(transf_file, transforms, fmt="%.16g", delimiter=",")
        logger.info(f"Stabilization transforms saved to: '{transf_file.resolve()}'")

    metadata = {
        "geotrax_tpu_version": __version__,
        "video": {
            "source": str(source),
            "width": stats["frame_size"][0],
            "height": stats["frame_size"][1],
            "fps": stats["video_fps"],
            "frames_processed": stats["frames"],
        },
        "runtime": {
            "avg_detect_ms": round(stats["avg_detect_ms"], 2),
            "avg_stabilization_ms": round(stats["avg_stab_ms"], 2),
            "pipeline_fps": round(stats["fps"], 2),
            # post-hoc visibility of WHICH path produced this video's outputs
            # (a --parallel-videos batch silently falls back to sequential on
            # mixed resolutions or group errors; operators audit this field)
            "extraction_mode": stats.get("extraction_mode", "sequential"),
        },
        "config": {
            "model": config["main"].get("model_configured"),
            "tracker": config["main"].get("tracker_active"),
            "extraction": config["main"].get("extraction"),
            "stabilo": config.get("stabilo"),
            "detection": {
                k: config["ultralytics"].get(k)
                for k in ("imgsz", "conf", "iou", "max_det", "classes",
                          "agnostic_nms", "tiles")
            },
        },
        "args": convert_to_serializable(args),
    }
    meta_file = source.with_suffix(".yaml")
    try:
        with open(meta_file, "w") as fh:
            yaml.dump(convert_to_serializable(metadata), fh,
                      default_flow_style=False, sort_keys=False)
        logger.info(f"Run metadata saved to: '{meta_file.resolve()}'")
    except OSError as exc:
        logger.warning(f"Could not write metadata: {exc}")
