"""RootSIFT-class gradient features: rotation/scale invariance and the
cross-domain registration criterion (reference utils/registration.py:59-77 —
RootSIFT at 250k features is the accuracy-critical master->ortho match;
binary FAST/BRIEF cannot survive scale+rotation+illumination shifts)."""

import logging

import jax.numpy as jnp
import numpy as np
import pytest

from geotrax_tpu.ops import sift

cv2 = pytest.importorskip("cv2")

logger = logging.getLogger("test_sift")


def aerial_like(h=512, w=640, seed=7):
    """Smooth random field + road-like lines + blobs: enough structure for
    gradient features, no repeating lattice (which would alias matches)."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h // 16, w // 16)).astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    for _ in range(40):
        p1 = rng.integers(0, (w, h), 2)
        p2 = rng.integers(0, (w, h), 2)
        cv2.line(img, tuple(p1), tuple(p2), float(rng.uniform(0, 255)),
                 int(rng.integers(2, 6)))
    for _ in range(80):
        c = rng.integers(0, (w, h), 2)
        cv2.circle(img, tuple(c), int(rng.integers(3, 12)),
                   float(rng.uniform(0, 255)), -1)
    return np.clip(img, 0, 255).astype(np.float32)


def reproj_error(h_est, h_true, w, h):
    pts = np.array([[50, 50], [w - 50, 50], [w - 50, h - 50], [50, h - 50],
                    [w // 2, h // 2]], np.float32)
    def apply(H, p):
        q = np.concatenate([p, np.ones((len(p), 1))], 1) @ H.T
        return q[:, :2] / q[:, 2:3]
    return float(np.abs(apply(h_est, pts) - apply(h_true, pts)).max())


def test_descriptors_are_rootsift_normalized():
    feats = sift.detect_and_describe(jnp.asarray(aerial_like(256, 320)), 512)
    desc = np.asarray(feats.desc)[np.asarray(feats.valid)]
    assert len(desc) > 100
    # RootSIFT: sqrt of an L1-normalized vector -> unit L2 norm
    np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0, atol=1e-4)
    assert (desc >= 0).all()


def test_match_l2_blockwise_identity():
    feats = sift.detect_and_describe(jnp.asarray(aerial_like(256, 320)), 256)
    m = sift.match_l2(feats.desc, feats.valid, feats.desc, feats.valid, ratio=0.99)
    valid = np.asarray(m.valid)
    assert valid.sum() > 100
    np.testing.assert_array_equal(
        np.asarray(m.idx_b)[valid], np.arange(len(valid))[valid]
    )


def _register(img_src, img_dst, detector):
    from geotrax_tpu.utils.registration import estimate_homography

    h, inliers, matches, _ = estimate_homography(
        img_src, img_dst, logger, detector_name=detector, max_features=20000,
        filter_ratio=0.8 if detector != "rsift" else 0.75,
    )
    return h


@pytest.mark.slow
def test_cross_domain_registration_rsift_vs_binary():
    """Known H = scale 1.8 ∘ rotation 25° ∘ translation, with a gamma shift
    and noise on the source side: the rsift path must recover H within 3 px;
    the binary path demonstrably fails (>10 px) under the same conditions."""
    h, w = 512, 640
    dst = aerial_like(h, w, seed=3)
    s, ang = 1.0 / 1.8, np.deg2rad(25)
    H_src_to_dst = np.array([
        [s * np.cos(ang), -s * np.sin(ang), 40.0],
        [s * np.sin(ang), s * np.cos(ang), 25.0],
        [0, 0, 1.0],
    ])
    # src = dst warped by the inverse (so src -> dst is H_src_to_dst)
    src = cv2.warpPerspective(dst, np.linalg.inv(H_src_to_dst), (w, h),
                              flags=cv2.INTER_LINEAR)
    # cross-domain shift: gamma + brightness + noise
    rng = np.random.default_rng(0)
    src = 255.0 * (np.clip(src, 0, 255) / 255.0) ** 1.6
    src = np.clip(src * 0.8 + 20 + rng.normal(0, 6, src.shape), 0, 255)

    src3 = np.repeat(src[..., None], 3, -1).astype(np.uint8)
    dst3 = np.repeat(dst[..., None], 3, -1).astype(np.uint8)

    h_rsift = _register(src3, dst3, "rsift")
    assert h_rsift is not None
    err_rsift = reproj_error(h_rsift, H_src_to_dst, w, h)
    assert err_rsift < 3.0, f"rsift reprojection error {err_rsift:.2f} px"

    h_orb = _register(src3, dst3, "orb")
    err_orb = reproj_error(h_orb, H_src_to_dst, w, h) if h_orb is not None else 1e9
    assert err_orb > 10.0, (
        f"binary path unexpectedly solved the cross-domain case ({err_orb:.2f} px)"
    )


@pytest.mark.slow
def test_rotation_only_recovery():
    h, w = 384, 512
    dst = aerial_like(h, w, seed=11)
    ang = np.deg2rad(140)  # far beyond what unoriented descriptors tolerate
    c, s_ = np.cos(ang), np.sin(ang)
    cx, cy = w / 2, h / 2
    H = np.array([
        [c, -s_, cx - c * cx + s_ * cy],
        [s_, c, cy - s_ * cx - c * cy],
        [0, 0, 1.0],
    ])
    src = cv2.warpPerspective(dst, np.linalg.inv(H), (w, h))
    h_est = _register(np.repeat(src[..., None], 3, -1).astype(np.uint8),
                      np.repeat(dst[..., None], 3, -1).astype(np.uint8), "rsift")
    assert h_est is not None
    assert reproj_error(h_est, H, w, h) < 3.0


def test_banded_level_features_matches_whole(monkeypatch):
    """Band-streamed detection (the 15000^2-ortho memory path) finds the
    same keypoints as the monolithic path on an image where banding is
    forced: per-band quotas cover every band's core, coordinates are
    band-offset back to level space, and descriptors agree."""
    img = jnp.asarray(aerial_like(320, 512, seed=3))
    budget = 96

    xy_w, sc_w, an_w, va_w, de_w = sift._level_features(img, budget)
    monkeypatch.setattr(sift, "BAND_PIXEL_LIMIT", 320 * 512 // 3)  # ~3 bands
    xy_b, sc_b, an_b, va_b, de_b = sift._level_features_banded(img, budget)

    assert int(va_b.sum()) > 0
    kw = {tuple(np.round(p, 1)) for p in np.asarray(xy_w)[np.asarray(va_w)]}
    kb = {tuple(np.round(p, 1)) for p in np.asarray(xy_b)[np.asarray(va_b)]}
    # per-band quotas select a (spatially more uniform) subset of the same
    # corner population: the overlap must be substantial and every banded
    # keypoint must be a real maximum found by the whole-image pass when the
    # budget is unconstrained
    xy_all, _, _, va_all, de_all = sift._level_features(img, 512)
    ka = {tuple(np.round(p, 1)) for p in np.asarray(xy_all)[np.asarray(va_all)]}
    assert len(kb & ka) / max(len(kb), 1) > 0.95

    # descriptor parity for keypoints found by both paths
    pos_w = {tuple(np.round(p, 1)): i for i, p in enumerate(np.asarray(xy_w))}
    n_checked = 0
    for i, p in enumerate(np.asarray(xy_b)):
        key = tuple(np.round(p, 1))
        if bool(va_b[i]) and key in pos_w:
            j = pos_w[key]
            dot = float(jnp.sum(de_b[i] * de_w[j]))
            assert dot > 0.99, f"descriptor drift at {key}: dot={dot}"
            n_checked += 1
    assert n_checked >= 10


def test_detect_and_describe_uses_banding_for_large_levels(monkeypatch):
    """detect_and_describe dispatches levels above BAND_PIXEL_LIMIT to the
    banded path (memory ceiling for the reference's 15000^2 cutout)."""
    calls = {"banded": 0}
    orig = sift._level_features_banded

    def spy(level, budget, **kw):
        calls["banded"] += 1
        return orig(level, budget, **kw)

    monkeypatch.setattr(sift, "BAND_PIXEL_LIMIT", 200 * 200)
    monkeypatch.setattr(sift, "_level_features_banded", spy)
    img = jnp.asarray(aerial_like(384, 512, seed=5))
    feats = sift.detect_and_describe(img, 256)
    assert calls["banded"] >= 1  # at least the full-res level banded
    assert int(feats.valid.sum()) > 0
