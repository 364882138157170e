"""Parallel multi-video extraction: V videos advance in lockstep on device.

The reference processes videos strictly one after another
(SURVEY.md §2.6, batch_process.py:249-253 — multi-threading is only a
*planned* enhancement there). Here a group of same-resolution videos shares
every device step:

  decode (per-video host prefetch threads)
    -> one batched detection call        (V*T frames per dispatch)
    -> one vmapped stabilization call    (V frames per dispatch: the fused
       feature/match/RANSAC pipeline is a pure function of per-video state)
    -> vmapped tracker steps             (V slot-state timelines)

Per-video outputs are identical in format to the sequential path and are
post-processed/saved with the same code. `geotrax batch --parallel-videos N`
routes extraction through this module; georeferencing/visualization/plots
remain per-video.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np
from tqdm import tqdm


class BatchStabilizer:
    """V independent Stabilizer pipelines fused into one vmapped dispatch.

    Shares one compiled function across the group; per-video reference
    features and RANSAC keys are carried as batch dimensions.
    """

    def __init__(self, num_videos: int, stabilo_cfg: dict):
        from geotrax_tpu.stabilize import Stabilizer

        self.num_videos = num_videos
        # one prototype supplies config + the fused builder; per-video state
        # lives in the batched arrays below
        self.proto = Stabilizer(**stabilo_cfg)
        if self.proto.n_levels != 1:
            raise ValueError("BatchStabilizer supports the single-level (orb-class) path")
        self._vfused = None
        self._ref = None     # batched (xy, desc, valid)
        self._keys = None

    def set_ref_frames(self, frames, boxes_per_video):
        """frames: (V,H,W,3); boxes_per_video: list of (Ni,4) arrays."""
        import jax
        import jax.numpy as jnp

        xs, descs, valids = [], [], []
        for v in range(self.num_videos):
            kps, desc = self.proto._prepare(
                np.asarray(frames[v]), boxes_per_video[v], self.proto.ref_features
            )
            xs.append(kps.xy)
            descs.append(desc)
            valids.append(kps.valid)
        self._ref = (jnp.stack(xs), jnp.stack(descs), jnp.stack(valids))
        self._keys = jax.random.split(jax.random.PRNGKey(0), self.num_videos)

        fused = self.proto._build_fused(frames[0].shape)
        self._vfused = jax.jit(jax.vmap(fused))

    def stabilize_batch(self, frames, det_boxes_padded, video_idx=None):
        """frames (L,H,W,3); det_boxes_padded (L, mask_slots, 4);
        video_idx: which of the V videos each batch row belongs to (defaults
        to all of them — used when the group goes ragged and only a subset
        of videos is still alive) ->
        (h_matrices (L,3,3) np, inliers (L,), matches (L,))."""
        import jax
        import jax.numpy as jnp

        if video_idx is None:
            video_idx = list(range(self.num_videos))
        idx = np.asarray(video_idx)
        ref_xy, ref_desc, ref_valid = (a[idx] for a in self._ref)
        new_keys = jax.vmap(lambda k: jax.random.split(k)[0])(self._keys[idx])
        self._keys = self._keys.at[idx].set(new_keys)
        h_ds, inliers, matches, _kps = self._vfused(
            jnp.asarray(frames), jnp.asarray(det_boxes_padded),
            ref_xy, ref_desc, ref_valid, new_keys,
        )
        s = self.proto.downsample_ratio
        scale = np.diag([s, s, 1.0])
        inv_scale = np.linalg.inv(scale)
        h_full = np.einsum("ij,vjk,kl->vil", inv_scale, np.asarray(h_ds), scale)
        matches = np.asarray(matches)
        inliers = np.asarray(inliers)
        # per-video failure fallback, mirroring Stabilizer.stabilize: too few
        # matches or a degenerate H -> identity (caller logs via inliers=0)
        denom = h_full[:, 2, 2]
        ok = (
            (matches >= 4)
            & np.isfinite(h_full).all(axis=(1, 2))
            & (np.abs(denom) > 1e-12)
        )
        h_full = np.where(
            ok[:, None, None],
            h_full / np.where(ok, denom, 1.0)[:, None, None],
            np.eye(3)[None],
        )
        return h_full, np.where(ok, inliers, 0), matches


def extract_videos_batch(sources: list, args, config: dict, logger) -> None:
    """Run extraction for a group of same-resolution videos in lockstep."""
    import jax.numpy as jnp

    from geotrax_tpu.pipeline import _extract_impl as impl
    from geotrax_tpu.pipeline import postprocess
    from geotrax_tpu.track import make_tracker

    main = config["main"]
    stabilize_on = bool(main["extraction"].get("stabilize", True))
    detector = impl.load_detector(config, logger)
    max_det = int(config["ultralytics"].get("max_det", 1000) or 1000)

    # same config backfill as the sequential run_extraction — without it the
    # parallel pre-pass ignored cfg cut frames / interpolation while the
    # leftover videos honored them, diverging within one batch run
    from geotrax_tpu.utils.config_utils import backfill_args_from_config

    backfill_args_from_config(args, {
        "cut_frame_left": main["processing"]["cut_frame_left"],
        "cut_frame_right": main["processing"]["cut_frame_right"],
        "interpolate": main["extraction"]["interpolate"],
    })
    cut_left = int(args.cut_frame_left or 0)
    cut_right = args.cut_frame_right
    readers = [impl.open_reader(s, cut_left, cut_right, config) for s in sources]
    iters = [iter(r) for r in readers]
    num_videos = len(sources)

    # ---- vmapped tracker: V slot-state timelines advance in ONE device
    # program; with --devices D the video axis is sharded over a ('data',)
    # mesh so each device owns its group of timelines (SURVEY §2.6 "data
    # parallelism over videos"). Dead (ragged) videos keep stepping but
    # their state is frozen by the alive mask — bit-equal to stopping.
    import jax

    tracker_cfg, state0, tracker_step = make_tracker(
        main["tracker_active"], main["tracker_params"],
        max_tracks=max(256, min(max_det, 1024)),
    )
    vstates = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (num_videos,) + a.shape).copy(), state0
    )
    mesh = None
    n_dev = int(getattr(args, "devices", None) or 1)
    if n_dev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        avail = jax.devices()
        n_dev = min(n_dev, len(avail), num_videos)
        if num_videos % n_dev == 0 and n_dev > 1:
            mesh = Mesh(np.asarray(avail[:n_dev]), axis_names=("data",))
            vstates = jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))), vstates
            )
            logger.info(f"Video group sharded over {n_dev} devices.")
        else:
            logger.warning(
                f"--devices {n_dev}: group of {num_videos} videos not divisible; "
                "running single-device."
            )

    use_gmc = bool(getattr(tracker_cfg, "use_gmc", False))
    with_reid = bool(getattr(tracker_cfg, "with_reid", False))
    reid_params = None
    if with_reid:
        from geotrax_tpu.track.reid import resolve_head

        reid_params = resolve_head(main["tracker_params"], logger)

    @jax.jit
    def tracker_vstep(states, boxes, scores, cls_, valid, alive_mask, frame_id,
                      gmc, emb):
        def one(s, b, sc, c, v, g, al, e):
            s2, out = tracker_step(s, b, sc, c, v, frame_id,
                                   g if use_gmc else None,
                                   det_emb=e if with_reid else None)
            s3 = jax.tree.map(
                lambda new, old: jnp.where(
                    al.reshape((1,) * new.ndim) if new.ndim else al, new, old
                ),
                s2, s,
            )
            return s3, out._replace(valid=out.valid & al)

        return jax.vmap(one)(states, boxes, scores, cls_, valid, gmc,
                             alive_mask, emb)

    stab = None
    if stabilize_on:
        stab = BatchStabilizer(num_videos, config.get("stabilo", {}))
    # box-mask capacity: match the sequential Stabilizer (a smaller cap let
    # features on truncated vehicles bias the homography, stabilizer.py)
    mask_slots = stab.proto.mask_slots if stab is not None else 1024

    rows = [[] for _ in range(num_videos)]
    transforms = [[] for _ in range(num_videos)]
    h_prev = [np.eye(3) for _ in range(num_videos)]
    alive = [True] * num_videos
    frame_idx = cut_left
    n_frames = [0] * num_videos
    t_start = time.time()
    first = True

    pbar = tqdm(desc=f"Extracting {num_videos} videos", unit="frame-group")
    while any(alive):
        frames = []
        live_idx = []
        for v in range(num_videos):
            if not alive[v]:
                continue
            try:
                idx, frame = next(iters[v])
                assert idx == frame_idx, f"video {v} desynchronized"
                frames.append(frame)
                live_idx.append(v)
            except StopIteration:
                alive[v] = False
        if not live_idx:
            break

        # the group may go ragged (videos of unequal length): keep lockstep
        # over the surviving subset — vmap retraces once per new batch size
        stacked = jnp.asarray(np.stack(frames))
        det = detector.detect_batch(stacked)
        det_np = {k: np.asarray(v) for k, v in det.items()}

        h_cur = {v: np.eye(3) for v in live_idx}
        if stab is not None:
            padded = np.zeros((len(live_idx), mask_slots, 4), np.float32)
            for p in range(len(live_idx)):
                boxes_v = det_np["boxes_xywh"][p][det_np["valid"][p]]
                n = min(len(boxes_v), mask_slots)
                padded[p, :n] = boxes_v[:n, :4]
            if first:
                if len(live_idx) < num_videos:
                    # a video with zero frames: the ref-feature batch would be
                    # misaligned — let the caller fall back to sequential
                    raise RuntimeError("video group ragged at the first frame")
                stab.set_ref_frames(
                    np.asarray(stacked),
                    [padded[p][padded[p, :, 2] > 0] for p in range(len(live_idx))],
                )
            else:
                h_arr, inliers, _ = stab.stabilize_batch(stacked, padded, live_idx)
                for p, v in enumerate(live_idx):
                    h_cur[v] = h_arr[p]
                    if inliers[p] == 0:
                        # mirror the sequential path's per-frame warning —
                        # a silent identity substitution hides a collapsed
                        # stabilization from anyone auditing the outputs
                        logger.warning(
                            f"Frame {frame_idx}, video {v}: stabilization "
                            "failed; identity used."
                        )
                    transforms[v].append(
                        np.concatenate([[frame_idx], h_arr[p].reshape(-1)])
                    )

        internal_frame = frame_idx - cut_left + 1
        # appearance embeddings for ReID trackers (the sequential paths
        # compute these; omitting them silently disabled with_reid here)
        emb_np = None
        if with_reid:
            from geotrax_tpu.pipeline.device_pipeline import embed_boxes

            emb_np = np.asarray(embed_boxes(
                stacked, jnp.asarray(det_np["boxes_xywh"]),
                head_params=reid_params,
            ))
        # scatter live detections into full-V arrays (dead rows invalid)
        md = det_np["boxes_xywh"].shape[1]
        full_b = np.zeros((num_videos, md, 4), np.float32)
        full_s = np.zeros((num_videos, md), np.float32)
        full_c = np.full((num_videos, md), -1, np.int32)
        full_v = np.zeros((num_videos, md), bool)
        from geotrax_tpu.track.base import EMB_DIM

        full_e = np.zeros((num_videos, md, EMB_DIM), np.float32) if with_reid else None
        gmc_all = np.tile(np.eye(3, dtype=np.float32)[None], (num_videos, 1, 1))
        alive_mask = np.zeros((num_videos,), bool)
        for p, v in enumerate(live_idx):
            full_b[v] = det_np["boxes_xywh"][p]
            full_s[v] = det_np["scores"][p]
            full_c[v] = det_np["classes"][p]
            full_v[v] = det_np["valid"][p]
            if full_e is not None:
                full_e[v] = emb_np[p]
            alive_mask[v] = True
            if not first:
                # same jitted f32 adjugate program as the sequential/fused
                # paths (device_pipeline.gmc_from_h) -> bit-identical GMC
                from geotrax_tpu.pipeline.device_pipeline import gmc_from_h

                gmc_all[v] = np.asarray(gmc_from_h(
                    jnp.asarray(h_cur[v], jnp.float32),
                    jnp.asarray(h_prev[v], jnp.float32),
                ))
            h_prev[v] = h_cur[v]

        if full_e is None:
            full_e = np.zeros((num_videos, md, EMB_DIM), np.float32)
        vstates, out = tracker_vstep(
            vstates, jnp.asarray(full_b), jnp.asarray(full_s), jnp.asarray(full_c),
            jnp.asarray(full_v), jnp.asarray(alive_mask), internal_frame,
            jnp.asarray(gmc_all), jnp.asarray(full_e),
        )
        out_np = jax.device_get(out)
        for v in live_idx:
            valid = out_np.valid[v]
            ids = out_np.track_id[v][valid]
            boxes = out_np.box_xywh[v][valid]
            scores = out_np.score[v][valid]
            classes = out_np.cls[v][valid]
            if stabilize_on:
                # full fixed-size table through one compiled shape, then subset
                boxes_stab = (
                    boxes if first
                    else impl._transform_boxes(h_cur[v], out_np.box_xywh[v])[valid]
                )
                rows[v].append(np.column_stack([
                    np.full(len(ids), frame_idx, float), ids.astype(float),
                    boxes, boxes_stab, classes.astype(float), scores,
                ]))
            else:
                rows[v].append(np.column_stack([
                    np.full(len(ids), frame_idx, float), ids.astype(float),
                    boxes, classes.astype(float), scores,
                ]))
            n_frames[v] += 1
        first = False
        frame_idx += 1
        pbar.update(1)
    pbar.close()

    elapsed = max(time.time() - t_start, 1e-9)
    total = sum(n_frames)
    logger.info(
        f"Parallel extraction: {total} frames over {num_videos} videos "
        f"({total / elapsed:.1f} frames/s aggregate)."
    )

    # per-video post-processing + saving through the sequential machinery
    n_cols = 12 if stabilize_on else 8
    for v, source in enumerate(sources):
        tracks = (np.concatenate(rows[v], axis=0) if rows[v] else np.empty((0, n_cols)))
        tracks = postprocess.remove_short_tracks(
            tracks, int(main["extraction"]["min_track_length"]), logger
        )
        tracks = postprocess.vote_track_classes(tracks)
        info = readers[v].info
        tracks = postprocess.estimate_vehicle_dimensions(
            tracks, main["extraction"]["dimension_estimation"], info.width, info.height
        )
        if args.interpolate:
            tracks = postprocess.interpolate_tracks(
                tracks, int(main["tracker_params"].get("track_buffer", 30)), logger
            )
        transforms_arr = np.asarray(transforms[v]) if transforms[v] else np.empty((0, 10))
        stats = {
            "frames": n_frames[v],
            "avg_detect_ms": 0.0, "avg_stab_ms": 0.0,
            "fps": total / elapsed / max(num_videos, 1),
            "frame_size": (info.width, info.height),
            "video_fps": info.fps,
            "extraction_mode": f"parallel-group-{num_videos}",
        }
        video_args = type(args)(**{**vars(args), "source": source}) if hasattr(args, "__dict__") else args
        impl.save_results(tracks, transforms_arr, video_args,
                          config, {**main["output"], "folder": args.output_folder}, stats, logger)
