"""Fused extraction chunk step: ONE device dispatch per chunk of frames.

The reference's hot loop interleaves four host<->device round trips per frame
(YOLO forward, NMS, tracker, stabilizer — reference extract.py:145-197). Here
the entire per-chunk computation is a single jitted program:

    letterbox -> YOLOv8 forward -> NMS            (batched over the chunk)
    -> stabilization features/match/RANSAC        (vmapped over the chunk,
       masked by this chunk's own detections)      against the reference frame
    -> GMC homographies                            (consecutive-frame motion)
    -> tracker scan                                (sequential carry, on device)
    -> stabilized-box corner transform             (vmapped)

so the host uploads raw uint8 frames once per chunk and fetches one block of
small per-frame outputs. Tracker state, the reference-frame features, and the
previous frame's stabilization homography are device-side carries between
chunks; RANSAC keys are fold_in(base, frame_id) so results are independent of
chunk boundaries and bit-equal to the sequential path.

Standalone GMC (SURVEY §2.3 N7): when stabilization is off but the tracker
wants camera-motion compensation (reference BoT-SORT runs sparse optical
flow regardless of stabilization, cfg tracker.botsort.gmc_method), a
small-budget feature pipeline (512 corners, affine fit) matches consecutive
frames directly and feeds the tracker's gmc input; the previous frame's
features are the cross-chunk carry.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from geotrax_tpu.ops import features
from geotrax_tpu.ops.homography import adjugate3, normalize_h
from geotrax_tpu.ops.ransac import ransac_fit

GMC_FEATURES = 512         # standalone-GMC corner budget per frame
GMC_HYPOTHESES = 256


@lru_cache(maxsize=2)
def _emb_projection(din: int, dout: int):
    """Fixed orthonormal-ish projection for the appearance embedding (a
    learned ReID head has no shipped weights in the reference either —
    cfg tracker.botsort.model: auto; this is the deterministic stand-in)."""
    rng = np.random.default_rng(11)
    m = rng.normal(0.0, 1.0, (din, dout))
    q, _ = np.linalg.qr(m)
    return q.astype(np.float32)


def embed_boxes(frames_u8: jnp.ndarray, boxes_xywh: jnp.ndarray,
                emb_dim: int = 64, pooled=None, head_params=None) -> jnp.ndarray:
    """(C,H,W,3) uint8 + (C,M,4) full-res cxcywh -> (C,M,emb_dim) L2-normed
    appearance embeddings: a 32x32 RGB patch at each box center on the
    0.5x-pooled image, 4x4-averaged per channel, projected through a fixed
    orthonormal matrix. Pure texture+color signature — enough for the
    appearance-vs-geometry disambiguation the ReID cost needs (tests pin the
    crossing-targets behavior), with no external weights. ``pooled`` lets the
    caller supply an existing (C,H/2,W/2,3) half-resolution image (the
    shared-resize fast path) so the 4K frame isn't re-read. ``head_params``
    (track/reid.py, loaded via cfg tracker.<name>.model) switches the
    projection for the learned conv head on the same patches."""
    from geotrax_tpu.ops.features import patches32

    c, h, w = frames_u8.shape[:3]
    h2, w2 = h // 2, w // 2
    if pooled is None:
        # trim to even dims first: odd H/W make the four strided slices
        # differ in shape (crash at trace time on e.g. 1081-row video)
        f = frames_u8[:, :h2 * 2, :w2 * 2].astype(jnp.float32)
        pooled = 0.25 * (f[:, 0::2, 0::2] + f[:, 0::2, 1::2]
                         + f[:, 1::2, 0::2] + f[:, 1::2, 1::2])  # (C,H2,W2,3)
    else:
        pooled = pooled.astype(jnp.float32)
    x0 = jnp.clip((boxes_xywh[..., 0] * 0.5).astype(jnp.int32) - 16, 0, w2 - 32)
    y0 = jnp.clip((boxes_xywh[..., 1] * 0.5).astype(jnp.int32) - 16, 0, h2 - 32)
    chans = [
        jax.vmap(patches32)(pooled[..., ch], x0, y0)  # (C,M,32,32)
        for ch in range(3)
    ]
    if head_params is not None:
        from geotrax_tpu.track import reid

        patches = jnp.stack(chans, axis=-1)  # (C,M,32,32,3)
        return jax.vmap(lambda p: reid.embed_patches(head_params, p))(patches)
    feats = []
    for p in chans:
        cm = p.shape[:2]
        pooled8 = p.reshape(cm + (8, 4, 8, 4)).mean(axis=(3, 5))  # (C,M,8,8)
        feats.append(pooled8.reshape(cm + (64,)))
    flat = jnp.concatenate(feats, axis=-1)  # (C,M,192)
    proj = jnp.asarray(_emb_projection(flat.shape[-1], emb_dim))
    with jax.default_matmul_precision("highest"):
        emb = flat @ proj
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)


class RefFeatures(NamedTuple):
    xy: jnp.ndarray     # (K, 2)
    desc: jnp.ndarray   # (K, T)
    valid: jnp.ndarray  # (K,)


class ChunkOutput(NamedTuple):
    """Per-frame results for one chunk, all stacked on the leading chunk axis."""
    track_id: jnp.ndarray    # (C, K)
    box_xywh: jnp.ndarray    # (C, K, 4)
    box_stab: jnp.ndarray    # (C, K, 4) boxes in reference-frame coords
    score: jnp.ndarray       # (C, K)
    cls: jnp.ndarray         # (C, K)
    valid: jnp.ndarray       # (C, K)
    h: jnp.ndarray           # (C, 3, 3) cur->ref stabilization homographies
    gmc: jnp.ndarray         # (C, 3, 3) prev->cur camera-motion homographies
    inliers: jnp.ndarray     # (C,)
    matches: jnp.ndarray     # (C,)


def _transform_boxes_h(h: jnp.ndarray, boxes_xywh: jnp.ndarray) -> jnp.ndarray:
    """(3,3) x (K,4) cxcywh -> corner transform + axis-aligned refit (same
    convention as Stabilizer.transform_cur_boxes)."""
    cx, cy, w, hh = (boxes_xywh[:, i] for i in range(4))
    corners = jnp.stack([
        jnp.stack([cx - w / 2, cy - hh / 2], -1),
        jnp.stack([cx + w / 2, cy - hh / 2], -1),
        jnp.stack([cx + w / 2, cy + hh / 2], -1),
        jnp.stack([cx - w / 2, cy + hh / 2], -1),
    ], axis=1).reshape(-1, 2)
    ones = jnp.ones((corners.shape[0], 1), corners.dtype)
    with jax.default_matmul_precision("highest"):
        mapped = jnp.concatenate([corners, ones], -1) @ h.T
    pts = (mapped[:, :2] / (mapped[:, 2:3] + 1e-12)).reshape(-1, 4, 2)
    mins, maxs = pts.min(axis=1), pts.max(axis=1)
    return jnp.concatenate([(mins + maxs) / 2, maxs - mins], axis=-1)


# Shared with the sequential/parallel host loops (pipeline/_extract_impl.py,
# parallel/extract_batch.py): all extraction paths MUST run the exact same
# f32 program for GMC and the stabilized-box refit, or their outputs drift by
# ULPs that the %g track format amplifies into text-level diffs
# (tests/test_fused_parity.py requires bit-equality).
transform_boxes = jax.jit(_transform_boxes_h)


@jax.jit
def gmc_from_h(h_cur: jnp.ndarray, h_prev: jnp.ndarray) -> jnp.ndarray:
    """prev->cur camera motion from consecutive stabilization H's:
    gmc = H_cur^-1 @ H_prev via the scale-free adjugate — identical math to
    the fused chunk's GMC stage in _chunk_impl below."""
    with jax.default_matmul_precision("highest"):
        return normalize_h(adjugate3(h_cur) @ h_prev)


class FusedExtractor:
    """Per-video fused extraction over fixed-size frame chunks.

    Host-side protocol (one upload + one fetch per chunk):

        fx = FusedExtractor(detector, stabilo_cfg, tracker_step, tracker_state,
                            src_h, src_w, use_gmc=..., chunk=16)
        for frames, fids, n_valid in chunks:        # frames (C,H,W,3) uint8
            out = fx.process_chunk(frames, fids, n_valid)
    """

    def __init__(self, detector, stabilo_cfg: Optional[dict], tracker_step,
                 tracker_state, src_h: int, src_w: int, use_gmc: bool,
                 chunk: int = 16, rng_seed: int = 0, with_reid: bool = False,
                 reid_params: Optional[dict] = None):
        from geotrax_tpu.stabilize import Stabilizer

        self.detector = detector
        self.chunk = chunk
        self.src_h, self.src_w = src_h, src_w
        self.tracker_step = tracker_step
        self.state = tracker_state
        self.use_gmc = use_gmc
        self.with_reid = with_reid
        # learned ReID head weights (track/reid.py) — tiny (~25k params),
        # closed over rather than threaded as a jit argument
        self.reid_params = reid_params
        self.stab_on = stabilo_cfg is not None
        self._detect = detector.batch_trace(src_h, src_w)
        self._detect_resized = None
        self._resize_geom = None
        # Detector params are CLOSED OVER (inline HLO constants), not jit
        # arguments. Measured on-chip A/B of the identical detect program
        # (32-frame 4K chunk, value-fetch fence): closed-over 148.5 ms/chunk
        # vs 236.6 ms with the weights packed into ONE flat bf16 argument —
        # XLA pre-packs constant conv weights into their tiled MXU layouts at
        # compile time, while runtime operands pay a re-layout on every
        # dispatch. (Weights as ~200 separate args are far worse still:
        # 532 ms/chunk of per-buffer dispatch overhead on the remote-device
        # transport.) The persistent compilation cache keys on the serialized
        # HLO, so identical weights still hit across processes; a NEW
        # checkpoint costs one compile per deployment, which a campaign
        # (20 intersections x many clips, one model) amortizes to zero.

        if self.stab_on:
            proto = Stabilizer(**stabilo_cfg)
            if proto.n_levels != 1:
                raise ValueError("FusedExtractor supports the single-level (orb-class) path")
            self.proto = proto
            # Shared-resize fast path: when the stabilizer's downsample ratio
            # equals the letterbox scale (the default 4K@imgsz-1920 config:
            # both 0.5) and no CLAHE intervenes, ONE cv2-bit-exact resize of
            # the raw frame feeds both the detector letterbox and the
            # stabilization gray. The full-resolution HBM read is the
            # dominant preprocessing cost (0.66 + 0.63 ms/frame measured for
            # the two separate 4K passes); sharing removes one of them.
            # Detection output is bit-identical (same resize, hoisted); the
            # gray becomes luma-of-resized-u8 instead of pooled-luma-of-f32 —
            # which matches the reference stabilo (cv2 gray of the u8
            # downsampled frame) more closely than the previous order.
            if not proto.clahe and hasattr(detector, "batch_trace_resized"):
                geom = detector.resize_geometry(src_h, src_w)
                if geom is not None:
                    new_h, new_w, r = geom[0], geom[1], geom[2]
                    if (
                        abs(r - proto.downsample_ratio) < 1e-12
                        and new_h == round(src_h * proto.downsample_ratio)
                        and new_w == round(src_w * proto.downsample_ratio)
                    ):
                        self._detect_resized = detector.batch_trace_resized(src_h, src_w)
                        self._resize_geom = (new_h, new_w)
        else:
            self.proto = None
            # detect+track only (stabilize:false): no gray to share, but the
            # hoisted resize is still bit-identical to the in-detect letterbox
            # (same resize_u8_linear, only hoisted) and lets XLA schedule the
            # full-resolution read once — measured 622 -> ~185 ms/chunk on the
            # real chip (the letterbox-inside path re-reads the 4K frame).
            if hasattr(detector, "batch_trace_resized"):
                geom = detector.resize_geometry(src_h, src_w)
                if geom is not None:
                    self._detect_resized = detector.batch_trace_resized(src_h, src_w)
                    self._resize_geom = (geom[0], geom[1])

        # constant BASE key: per-frame keys are fold_in(base, frame_id)
        self._key = jax.random.PRNGKey(rng_seed)
        self._h_prev = jnp.eye(3)
        self._ref: Optional[RefFeatures] = None
        self._gmc_carry = None   # standalone-GMC previous-frame features
        # pristine copies for reset(): reusing one FusedExtractor across
        # videos keeps the traced+compiled program (minutes to build on a
        # 1-vCPU host) while restarting all per-video state
        self._state0 = tracker_state
        self._seed0 = rng_seed
        # ONE fused program for every chunk: the first-chunk behavior
        # (extract reference-frame features, pin h[0] = identity) is selected
        # at runtime by a traced `first` flag through lax.cond, so a video —
        # and a fresh deployment — pays a single XLA compile instead of two.
        # The big 4K program costs minutes to build on a 1-vCPU host; halving
        # the compile count is what keeps cold-start (and the driver bench)
        # inside its budget.
        self._step = jax.jit(self._chunk_impl)

    # ------------------------------------------------------------ traceable
    def _gray(self, frame_u8):
        ratio = self.proto.downsample_ratio if self.proto else 0.5
        gray = features.rgb_to_gray(frame_u8)
        gray = features.downsample(gray, ratio)
        if self.proto and self.proto.clahe:
            from geotrax_tpu.ops.clahe import clahe as clahe_op

            gray = clahe_op(gray)
        return gray

    def _feats(self, gray, det_boxes, det_valid, n_features):
        ratio = self.proto.downsample_ratio if self.proto else 0.5
        mask = None
        if self.proto is None or self.proto.mask_use:
            margin = self.proto.mask_margin_ratio if self.proto else 0.15
            boxes = jnp.where(det_valid[:, None], det_boxes, 0.0) * ratio
            mask = features.boxes_mask(gray.shape, boxes, margin)
        kps = features.fast_detect(gray, n_features, mask=mask, oriented=False)
        desc = features.describe_grid(gray, kps)
        return kps.xy, desc, kps.valid

    def _fit(self, xy, valid_kp, desc, ref: RefFeatures, key, *,
             n_hyps, transformation, threshold, filter_ratio):
        from geotrax_tpu.ops.sift import match_l2

        matches = match_l2(desc, valid_kp, ref.desc, ref.valid, ratio=filter_ratio)
        src = xy[matches.idx_a]
        dst = ref.xy[matches.idx_b]
        res = ransac_fit(
            src, dst, matches.valid, threshold=threshold, key=key,
            num_hypotheses=n_hyps, transformation=transformation,
        )
        return res.h_matrix, res.num_inliers, matches.valid.sum()

    def _unscale(self, h_ds):
        """Undo feature-space downsampling: H_full = S^-1 H_ds S."""
        s = self.proto.downsample_ratio if self.proto else 0.5
        scale = jnp.asarray(np.diag([s, s, 1.0]), jnp.float32)
        inv_scale = jnp.asarray(np.diag([1.0 / s, 1.0 / s, 1.0]), jnp.float32)
        return inv_scale @ h_ds @ scale

    def _chunk_impl(self, frames_u8, state, ref: Optional[RefFeatures],
                    gmc_carry, h_prev, key, fids, n_valid, first):
        c = frames_u8.shape[0]
        resized = None
        if self._detect_resized is not None:
            from geotrax_tpu.ops.resize import resize_u8_linear

            nh, nw = self._resize_geom
            resized = jax.vmap(lambda f: resize_u8_linear(f, nh, nw))(frames_u8)
            det = self._detect_resized(resized, fids)
        else:
            det = self._detect(frames_u8, fids)
        det_boxes, det_valid = det["boxes_xywh"], det["valid"]
        det_emb = None
        if self.with_reid:
            half_geom = (frames_u8.shape[1] // 2, frames_u8.shape[2] // 2)
            det_emb = embed_boxes(
                frames_u8, det_boxes,
                pooled=resized if self._resize_geom == half_geom else None,
                head_params=self.reid_params,
            )
        eye = jnp.eye(3)

        # per-frame RANSAC keys derived from the FRAME ID, not a carried
        # chain: fold_in(base, fid) makes the draw independent of chunking
        # and bit-identical to the sequential Stabilizer's per-frame keys
        # (stabilize/stabilizer.py), so fused == sequential exactly.
        keys_pf = jax.vmap(lambda f: jax.random.fold_in(key, f))(fids)

        h = jnp.tile(eye[None], (c, 1, 1))
        inliers = jnp.zeros((c,), jnp.int32)
        n_matches = jnp.zeros((c,), jnp.int32)
        gmc = None

        if self.stab_on:
            if resized is not None:
                grays = jax.vmap(features.rgb_to_gray)(resized)
            else:
                grays = jax.vmap(self._gray)(frames_u8)
            xy, desc, val = jax.vmap(
                lambda g, b, v: self._feats(g, b, v, self.proto.max_features)
            )(grays, det_boxes, det_valid)
            # first chunk of a video: the reference frame is this chunk's
            # frame 0 — extract its (larger-budget) feature set. lax.cond
            # executes only the taken branch at runtime, so non-first chunks
            # pay nothing for this.
            ref = jax.lax.cond(
                first,
                lambda: RefFeatures(*self._feats(
                    grays[0], det_boxes[0], det_valid[0],
                    self.proto.ref_features)),
                lambda: ref,
            )
            transformation = (
                "projective" if self.proto.transformation_type == "projective"
                else "affine"
            )
            h_ds, inl, nm = jax.vmap(
                lambda x, v, d, k: self._fit(
                    x, v, d, ref, k,
                    n_hyps=self.proto.num_hypotheses,
                    transformation=transformation,
                    threshold=self.proto.ransac_threshold,
                    filter_ratio=self.proto.filter_ratio,
                )
            )(xy, val, desc, keys_pf)
            h_full = jax.vmap(self._unscale)(h_ds)
            denom = h_full[:, 2, 2]
            ok = (
                (nm >= 4)
                & jnp.isfinite(h_full).all(axis=(1, 2))
                & (jnp.abs(denom) > 1e-12)
            )
            h_full = jnp.where(
                ok[:, None, None],
                h_full / jnp.where(ok, denom, 1.0)[:, None, None],
                eye[None],
            )
            h = h_full
            inliers = jnp.where(ok, inl, 0).astype(jnp.int32)
            n_matches = nm.astype(jnp.int32)
            # first chunk: frame 0 IS the reference frame -> exact identity
            h = jnp.where(
                first, jnp.concatenate([eye[None], h[1:]], axis=0), h
            )
            if self.use_gmc:
                # inter-frame motion from consecutive stabilization H's:
                # gmc_t = H_t^-1 . H_{t-1}  (adjugate = scale-free inverse)
                h_prev_seq = jnp.concatenate([h_prev[None], h[:-1]], axis=0)
                with jax.default_matmul_precision("highest"):
                    gmc = normalize_h(jax.vmap(lambda a, b: adjugate3(a) @ b)(h, h_prev_seq))
        elif self.use_gmc:
            # standalone GMC: consecutive-frame affine at a small budget
            grays = jax.vmap(self._gray)(frames_u8)
            xy, desc, val = jax.vmap(
                lambda g, b, v: self._feats(g, b, v, GMC_FEATURES)
            )(grays, det_boxes, det_valid)
            prev = gmc_carry if gmc_carry is not None else RefFeatures(
                jnp.zeros_like(xy[0]), jnp.zeros_like(desc[0]),
                jnp.zeros_like(val[0]),
            )
            prev_xy = jnp.concatenate([prev.xy[None], xy[:-1]], axis=0)
            prev_desc = jnp.concatenate([prev.desc[None], desc[:-1]], axis=0)
            prev_val = jnp.concatenate([prev.valid[None], val[:-1]], axis=0)
            h_ds, _, nm = jax.vmap(
                lambda px, pv, pd, x, v, d, k: self._fit(
                    px, pv, pd, RefFeatures(x, d, v), k,
                    n_hyps=GMC_HYPOTHESES, transformation="affine",
                    threshold=2.0, filter_ratio=0.9,
                )
            )(prev_xy, prev_val, prev_desc, xy, val, desc, keys_pf)
            h_full = jax.vmap(self._unscale)(h_ds)
            ok = (nm >= 3) & jnp.isfinite(h_full).all(axis=(1, 2))
            gmc = jnp.where(ok[:, None, None], h_full, eye[None])
            gmc_carry = RefFeatures(xy[-1], desc[-1], val[-1])

        # ---------------- tracker scan over the chunk
        if gmc is None:
            gmc = jnp.tile(eye[None], (c, 1, 1))

        if det_emb is None:
            det_emb_seq = jnp.zeros((c, 1, 1))  # placeholder (unused)
        else:
            det_emb_seq = det_emb

        def body(carry, inp):
            st = carry
            b, s, cl, v, g, fid, t, de = inp

            def run(st):
                return self.tracker_step(
                    st, b, s, cl, v, fid, g if self.use_gmc else None,
                    de if self.with_reid else None,
                )

            def skip(st):
                k = st.track_id.shape[0]
                from geotrax_tpu.track.base import FrameOutput

                return st, FrameOutput(
                    track_id=st.track_id,
                    box_xywh=jnp.zeros((k, 4)),
                    score=jnp.zeros((k,)),
                    cls=st.cls,
                    valid=jnp.zeros((k,), bool),
                )

            st, out = jax.lax.cond(t < n_valid, run, skip, st)
            return st, out

        state, outs = jax.lax.scan(
            body, state,
            (det_boxes, det["scores"], det["classes"], det_valid, gmc, fids,
             jnp.arange(c), det_emb_seq),
        )

        box_stab = jax.vmap(_transform_boxes_h)(h, outs.box_xywh)
        chunk_out = ChunkOutput(
            track_id=outs.track_id, box_xywh=outs.box_xywh, box_stab=box_stab,
            score=outs.score, cls=outs.cls, valid=outs.valid,
            h=h, gmc=gmc, inliers=inliers, matches=n_matches,
        )
        return state, chunk_out, ref, gmc_carry, h[-1]

    # ------------------------------------------------------------ host API
    def reset(self, rng_seed: Optional[int] = None) -> None:
        """Restart per-video state (tracker slots, reference features, GMC
        carry, h_prev, RNG base) without dropping the compiled program. Lets
        `batch` runs and repeated extract calls reuse ONE traced extractor
        across videos — re-tracing the fused 4K program costs tens of
        seconds even on a compile-cache hit."""
        self.state = self._state0
        self._h_prev = jnp.eye(3)
        self._ref = None
        self._gmc_carry = None
        self._key = jax.random.PRNGKey(
            self._seed0 if rng_seed is None else rng_seed)

    def process_chunk(self, frames_u8, fids, n_valid: int) -> ChunkOutput:
        """frames (C,H,W,3) uint8 (np or device), fids (C,) internal frame ids
        (1-based), n_valid <= C real frames. Returns host-fetchable outputs."""
        frames = jnp.asarray(frames_u8)
        fids = jnp.asarray(np.asarray(fids, np.int32))
        first = self._ref is None and self.stab_on
        if first:
            # shape-true placeholder: the cond's first branch overwrites it
            from geotrax_tpu.ops.features import GRID_DESC_DIM

            k2 = self.proto.ref_features
            self._ref = RefFeatures(
                jnp.zeros((k2, 2)),
                jnp.zeros((k2, GRID_DESC_DIM)),
                jnp.zeros((k2,), bool),
            )
        if not self.stab_on and self._gmc_carry is None and self.use_gmc:
            # initialize the standalone-GMC carry with an invalid feature set
            from geotrax_tpu.ops.features import GRID_DESC_DIM

            self._gmc_carry = RefFeatures(
                jnp.zeros((GMC_FEATURES, 2)),
                jnp.zeros((GMC_FEATURES, GRID_DESC_DIM)),
                jnp.zeros((GMC_FEATURES,), bool),
            )
        self.state, out, self._ref, self._gmc_carry, self._h_prev = self._step(
            frames, self.state, self._ref, self._gmc_carry,
            self._h_prev, self._key, fids, jnp.asarray(n_valid, jnp.int32),
            jnp.asarray(first),
        )
        return out
