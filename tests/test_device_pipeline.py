"""Fused extraction chunk step: homography recovery, GMC modes, box
transform parity with the sequential path, and tail-chunk masking.

Uses a traceable no-op detector so the stabilization/GMC/tracker plumbing is
exercised hermetically (the fake-backend pattern from SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from geotrax_tpu.pipeline import _extract_impl as impl
from geotrax_tpu.pipeline.device_pipeline import ChunkOutput, FusedExtractor
from geotrax_tpu.track import make_tracker

CH = 4
H, W = 96, 128
MAX_DET = 8


class NullDetector:
    """Traceable detector stub: no detections (stabilization masks empty)."""

    is_rtdetr = False

    def batch_trace(self, src_h, src_w):
        def run(frames_u8, fids=None, params=None):
            c = frames_u8.shape[0]
            return {
                "boxes_xywh": jnp.zeros((c, MAX_DET, 4)),
                "scores": jnp.zeros((c, MAX_DET)),
                "classes": jnp.full((c, MAX_DET), -1, jnp.int32),
                "valid": jnp.zeros((c, MAX_DET), bool),
            }

        return run


def _textured(rng, h=H, w=W):
    """Structured random field (features need corners, not white noise);
    4-px blocks keep corner density high even after 0.5x downsampling."""
    base = rng.integers(0, 255, (h // 4, w // 4, 3)).astype(np.float32)
    img = np.kron(base, np.ones((4, 4, 1), np.float32))
    return np.clip(img, 0, 255).astype(np.uint8)


STAB_CFG = {
    "downsample_ratio": 1.0, "max_features": 256, "ref_multiplier": 2.0,
    "filter_ratio": 0.9, "transformation_type": "projective",
    "ransac_epipolar_threshold": 2.0, "ransac_max_iter": 2000,
    "mask_use": True, "mask_margin_ratio": 0.15,
}

TRACKER_PARAMS = {
    "track_high_thresh": 0.25, "track_low_thresh": 0.1,
    "new_track_thresh": 0.25, "track_buffer": 30,
    "match_thresh": 0.8, "fuse_score": True, "gmc_method": "sparseOptFlow",
}


def _make_fx(stab_cfg, use_gmc, chunk=CH):
    cfg, state, step = make_tracker("botsort", TRACKER_PARAMS, max_tracks=32)
    return FusedExtractor(NullDetector(), stab_cfg, step, state, H, W,
                          use_gmc=use_gmc, chunk=chunk)


@pytest.mark.slow
def test_fused_stabilization_recovers_translation():
    rng = np.random.default_rng(3)
    scene = _textured(rng, H + 16, W + 16)
    # frame t is the scene shifted by (t, 0): cur->ref H should be x -> x + t
    frames = np.stack([scene[4:4 + H, 4 + t:4 + t + W] for t in range(CH)])
    fx = _make_fx(STAB_CFG, use_gmc=True)
    out = fx.process_chunk(frames, np.arange(1, CH + 1), CH)
    h = np.asarray(out.h)
    np.testing.assert_allclose(h[0], np.eye(3), atol=1e-5)  # ref frame
    for t in range(1, CH):
        # point x in frame t corresponds to x + t in the reference frame
        np.testing.assert_allclose(h[t][0, 2], t, atol=0.5)
        np.testing.assert_allclose(h[t][1, 2], 0, atol=0.5)
        # GMC: consecutive motion is a 1-px shift in -x (ref coords advance)
        np.testing.assert_allclose(np.asarray(out.gmc)[t][0, 2], -1, atol=0.5)


@pytest.mark.slow
def test_fused_standalone_gmc_estimates_pan():
    """stabilize: false + a GMC tracker -> consecutive-frame camera motion is
    still estimated (reference BoT-SORT runs sparse optical flow regardless
    of stabilization, cfg tracker.botsort.gmc_method). The standalone GMC
    path works on a 0.5x-downsampled, blurred luma, so the scene uses 8-px
    blocks (4 px downsampled) to survive the smoothing."""
    rng = np.random.default_rng(4)
    gh, gw = 192, 256
    base = rng.integers(0, 255, (gh // 8 + 4, gw // 8 + 4, 3)).astype(np.float32)
    scene = np.kron(base, np.ones((8, 8, 1), np.float32)).astype(np.uint8)
    frames = np.stack([scene[8:8 + gh, 8 + 4 * t:8 + 4 * t + gw] for t in range(CH)])
    cfg, state, step = make_tracker("botsort", TRACKER_PARAMS, max_tracks=32)
    fx = FusedExtractor(NullDetector(), None, step, state, gh, gw,
                        use_gmc=True, chunk=CH)
    out = fx.process_chunk(frames, np.arange(1, CH + 1), CH)
    gmc = np.asarray(out.gmc)
    np.testing.assert_allclose(gmc[0], np.eye(3), atol=1e-5)  # no prev frame
    for t in range(1, CH):
        # scene pans +4 px/frame: a point at x in frame t-1 is at x-4 in t
        np.testing.assert_allclose(gmc[t][0, 2], -4, atol=1.0)
        np.testing.assert_allclose(gmc[t][1, 2], 0, atol=1.0)


@pytest.mark.slow
def test_fused_gmc_keeps_ids_under_pan_where_identity_loses_them():
    """Tracker-level 'done' criterion for standalone GMC: a fast pan moves
    all boxes 25 px/frame; with gmc the IDs persist, with identity GMC the
    IoU gate breaks every association."""
    cfg, state, step = make_tracker("botsort", TRACKER_PARAMS, max_tracks=32)
    boxes0 = np.array([[30.0, 40.0, 14.0, 14.0], [90.0, 40.0, 14.0, 14.0]])

    def run(with_gmc):
        st = state
        ids_seen = []
        gmc = jnp.eye(3).at[0, 2].set(25.0) if with_gmc else jnp.eye(3)
        for t in range(5):
            b = np.zeros((MAX_DET, 4), np.float32)
            b[:2] = boxes0 + np.array([25.0 * t, 0, 0, 0])
            v = np.zeros((MAX_DET,), bool)
            v[:2] = True
            st, out = step(
                st, jnp.asarray(b), jnp.full((MAX_DET,), 0.9),
                jnp.zeros((MAX_DET,), jnp.int32), jnp.asarray(v), t + 1,
                None if t == 0 else gmc,
            )
            ids_seen.append(sorted(np.asarray(out.track_id)[np.asarray(out.valid)]))
        return ids_seen

    with_gmc = run(True)
    without = run(False)
    assert with_gmc[0] == with_gmc[-1] == [1, 2]          # IDs stable
    assert without[-1] != [1, 2]                           # identity GMC loses them


def test_transform_boxes_parity_with_sequential():
    from geotrax_tpu.pipeline.device_pipeline import _transform_boxes_h

    rng = np.random.default_rng(0)
    h = np.array([[1.02, 0.01, 5.0], [-0.02, 0.99, -3.0], [1e-5, -2e-5, 1.0]])
    boxes = rng.uniform(20, 80, (6, 4)).astype(np.float32)
    got = np.asarray(_transform_boxes_h(jnp.asarray(h), jnp.asarray(boxes)))
    want = impl._transform_boxes(h, boxes.copy())
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_tail_chunk_padding_is_masked():
    """Padded tail frames must not advance tracker state or emit outputs."""
    rng = np.random.default_rng(5)
    scene = _textured(rng, H + 16, W + 16)
    frames = np.stack([scene[4:4 + H, 4:4 + W]] * CH)
    fx = _make_fx(STAB_CFG, use_gmc=False)
    out = fx.process_chunk(frames, np.arange(1, CH + 1), 2)
    valid = np.asarray(out.valid)
    assert not valid[2:].any()  # masked frames emit nothing


def test_fused_path_selected_for_oracle_detectors():
    """The oracle test double now batch-traces (device table gathered by
    frame id), so hermetic e2e tests exercise the PRODUCTION fused path;
    SequentialOnly re-routes to the sequential loop for parity tests
    (tests/test_fused_parity.py)."""
    from geotrax_tpu.models.detector import OracleDetector, SequentialOnly

    oracle = OracleDetector(lambda i: [], max_det=4)
    assert hasattr(oracle, "batch_trace")
    assert not hasattr(SequentialOnly(oracle), "batch_trace")


class TwoBoxDetector:
    """Traceable stub emitting two fixed boxes per frame (ReID wiring test)."""

    is_rtdetr = False

    def batch_trace(self, src_h, src_w):
        def run(frames_u8, fids=None, params=None):
            c = frames_u8.shape[0]
            b = jnp.zeros((c, MAX_DET, 4))
            b = b.at[:, 0].set(jnp.asarray([40.0, 48.0, 24, 24]))
            b = b.at[:, 1].set(jnp.asarray([90.0, 48.0, 24, 24]))
            v = jnp.zeros((c, MAX_DET), bool).at[:, :2].set(True)
            return {
                "boxes_xywh": b,
                "scores": jnp.where(v, 0.9, 0.0),
                "classes": jnp.zeros((c, MAX_DET), jnp.int32),
                "valid": v,
            }

        return run


def test_fused_pipeline_with_reid_runs_and_embeds():
    """with_reid=true end-to-end through the fused chunk step: embeddings are
    computed on device and the tracker keeps both IDs across chunks."""
    cfg, state, step = make_tracker(
        "botsort", {**TRACKER_PARAMS, "with_reid": True, "gmc_method": "none"},
        max_tracks=16,
    )
    fx = FusedExtractor(TwoBoxDetector(), None, step, state, H, W,
                        use_gmc=False, chunk=CH, with_reid=True)
    rng = np.random.default_rng(9)
    frames = np.stack([_textured(rng)] * CH)
    out1 = fx.process_chunk(frames, np.arange(1, CH + 1), CH)
    out2 = fx.process_chunk(frames, np.arange(CH + 1, 2 * CH + 1), CH)
    ids_last = sorted(np.asarray(out2.track_id)[-1][np.asarray(out2.valid)[-1]])
    assert ids_last == [1, 2]
    emb = np.asarray(fx.state.emb[:2])
    assert np.abs(np.linalg.norm(emb, axis=1) - 1.0).max() < 1e-4  # live EMA embeddings


def test_batch_trace_resized_bit_equal(tmp_path):
    """The shared-resize fast path (one full-res read feeding detection AND
    stabilization gray) must produce BIT-IDENTICAL detections to the normal
    batch_trace: the resize is the same cv2-bit-exact fixed-point op, only
    hoisted out of the detector."""
    import jax

    from geotrax_tpu.models import yolov8
    from geotrax_tpu.models.convert import save_npz
    from geotrax_tpu.models.detector import Detector
    from geotrax_tpu.ops.resize import resize_u8_linear

    spec = yolov8.ModelSpec(variant="n", nc=4)
    save_npz(tmp_path / "tiny.npz",
             jax.device_get(yolov8.init_params(jax.random.PRNGKey(0), spec)),
             class_names={0: "car"}, variant="n", nc=4)
    det = Detector(tmp_path / "tiny.npz",
                   {"imgsz": 128, "conf": 0.0, "max_det": 16, "agnostic_nms": True})
    src_h, src_w = 128, 256  # letterbox ratio 0.5 (the shared-path regime)
    geom = det.resize_geometry(src_h, src_w)
    assert geom is not None and geom[2] == 0.5

    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.integers(0, 255, (2, src_h, src_w, 3), np.uint8))
    normal = jax.jit(det.batch_trace(src_h, src_w))(frames)
    nh, nw = geom[0], geom[1]
    resized = jax.vmap(lambda f: resize_u8_linear(f, nh, nw))(frames)
    shared = jax.jit(det.batch_trace_resized(src_h, src_w))(resized)
    for k in ("boxes_xywh", "scores", "classes", "valid"):
        np.testing.assert_array_equal(np.asarray(normal[k]), np.asarray(shared[k]))
