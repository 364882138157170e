"""Multi-video data parallelism: one tracker timeline per device.

The reference's batch mode is a sequential for-loop over videos
(SURVEY.md §2.6); here a whole batch of videos advances in lockstep on a
device mesh: detections are computed for a (V, B, ...) block of frames
(videos x chunk), and the tracker step — a pure slot-state function — is
vmapped over the video axis and scanned over the chunk, so V tracker
timelines progress in one device program. Sharding the video axis over
'data' places one group of videos per device (GSPMD keeps the per-video
carry local; no cross-video communication exists by construction).

On-device aggregation (the Songdo-scale merge): vehicle-ID offsetting
across shards is an exclusive prefix sum over per-video ID counts —
jnp.cumsum on device replaces the reference's filesystem merge arithmetic
(reference aggregate.py:132-133).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from geotrax_tpu.track.base import TrackerConfig, TrackerState, byte_step, init_state


class VideoBatchTracker:
    """Vmapped tracker over a fixed batch of video timelines."""

    def __init__(self, cfg: TrackerConfig, num_videos: int, mesh=None):
        self.cfg = cfg
        self.num_videos = num_videos
        self.mesh = mesh
        base = init_state(cfg)
        self.state = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (num_videos,) + a.shape).copy(), base
        )
        if mesh is not None:
            self.state = jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))), self.state
            )

        cfg_static = cfg

        @jax.jit
        def chunk_step(state, det_boxes, det_scores, det_cls, det_valid, frame_id0):
            # det_*: (V, T, ...) — V videos, T frames per chunk
            def per_video(s, b, sc, c, v):
                def scan_fn(carry, inp):
                    bb, ss, cc, vv, fid = inp
                    carry, out = byte_step(carry, bb, ss, cc, vv, fid, cfg_static, None)
                    return carry, out

                fids = frame_id0 + jnp.arange(b.shape[0])
                return jax.lax.scan(scan_fn, s, (b, sc, c, v, fids))

            return jax.vmap(per_video)(state, det_boxes, det_scores, det_cls, det_valid)

        self._chunk_step = chunk_step

    def step_chunk(self, det_boxes, det_scores, det_cls, det_valid, frame_id0: int):
        """Advance every video by a chunk of frames; returns per-frame outputs
        (V, T, K, ...) FrameOutput."""
        self.state, outputs = self._chunk_step(
            self.state, det_boxes, det_scores, det_cls, det_valid, frame_id0
        )
        return outputs


@jax.jit
def offset_vehicle_ids(per_video_max_id: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix sum of per-video max IDs -> the offset each video
    adds to its vehicle IDs in the aggregated dataset."""
    return jnp.concatenate([
        jnp.zeros((1,), per_video_max_id.dtype), jnp.cumsum(per_video_max_id)[:-1]
    ])


@partial(jax.jit, static_argnames=("num_segments",))
def aggregate_track_counts(track_ids, valid, num_segments: int):
    """Per-video unique-ish track statistics on device: max id and active
    row counts via segment reductions (the device-side analog of the
    aggregation stage's per-source bookkeeping)."""
    max_ids = jnp.max(jnp.where(valid, track_ids, 0), axis=tuple(range(1, track_ids.ndim)))
    rows = jnp.sum(valid, axis=tuple(range(1, valid.ndim)))
    del num_segments
    return max_ids, rows
