"""Feature pipeline + stabilizer: registration accuracy on known warps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geotrax_tpu.ops import features
from geotrax_tpu.ops.warp import warp_perspective
from geotrax_tpu.stabilize import Stabilizer


def textured_image(h=240, w=320, seed=0):
    """Synthetic aerial-like texture: smoothed noise + high-contrast blobs +
    road-like lines (gives FAST plenty of corners)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(40, 90, (h, w)).astype(np.float32)
    # blocky structures
    for _ in range(60):
        y, x = rng.integers(10, h - 20), rng.integers(10, w - 20)
        bh, bw = rng.integers(4, 16, 2)
        img[y:y + bh, x:x + bw] = rng.integers(120, 255)
    # lines
    for _ in range(8):
        y = rng.integers(0, h)
        img[y:y + 2, :] = 200
    rgb = np.stack([img, img, img], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def small_homography(seed=1):
    rng = np.random.default_rng(seed)
    h = np.eye(3)
    ang = rng.uniform(-0.05, 0.05)
    c, s = np.cos(ang), np.sin(ang)
    h[:2, :2] = np.array([[c, -s], [s, c]]) * rng.uniform(0.97, 1.03)
    h[:2, 2] = rng.uniform(-8, 8, 2)
    return h


def corner_error(h_est, h_true, w, hgt):
    from geotrax_tpu.ops.homography import apply_homography

    corners = jnp.asarray(
        [[20.0, 20.0], [w - 20.0, 20.0], [w - 20.0, hgt - 20.0], [20.0, hgt - 20.0]]
    )
    a = np.asarray(apply_homography(jnp.asarray(h_est), corners[None])[0])
    b = np.asarray(apply_homography(jnp.asarray(h_true), corners[None])[0])
    return np.linalg.norm(a - b, axis=1).max()


def test_fast_detect_finds_corners():
    img = textured_image()
    gray = features.rgb_to_gray(jnp.asarray(img))
    kps = features.fast_detect(gray, 512)
    assert int(kps.valid.sum()) > 100
    # keypoints stay inside the border margin
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    assert xy[:, 0].min() >= 16 and xy[:, 1].min() >= 16


def test_mask_excludes_regions():
    img = textured_image()
    gray = features.rgb_to_gray(jnp.asarray(img))
    boxes = jnp.asarray([[160.0, 120.0, 120.0, 80.0]])
    mask = features.boxes_mask(gray.shape, boxes, margin_ratio=0.0)
    kps = features.fast_detect(gray, 512, mask=mask)
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    inside = (np.abs(xy[:, 0] - 160) < 60) & (np.abs(xy[:, 1] - 120) < 40)
    assert not inside.any()


def test_match_self_is_identity():
    img = textured_image()
    gray = features.rgb_to_gray(jnp.asarray(img))
    kps = features.fast_detect(gray, 256)
    desc = features.describe(gray, kps)
    matches = features.match_descriptors(desc, kps.valid, desc, kps.valid, ratio=0.95)
    valid = np.asarray(matches.valid)
    # self-matching: every valid match maps a keypoint to itself
    assert valid.sum() > 50
    np.testing.assert_array_equal(
        np.asarray(matches.idx_a)[valid], np.asarray(matches.idx_b)[valid]
    )


@pytest.mark.slow
@pytest.mark.parametrize("seed", [1, 2])
def test_registration_recovers_known_warp(seed):
    """Warp an image by a known small homography; the feature+RANSAC stack
    must recover it within ~1 px over the frame."""
    img = textured_image(seed=seed)
    h_true = small_homography(seed)
    warped = np.asarray(
        warp_perspective(jnp.asarray(img), jnp.asarray(h_true), img.shape[0], img.shape[1])
    )

    stab = Stabilizer(downsample_ratio=1.0, max_features=800,
                      ransac_epipolar_threshold=2.0)
    stab.set_ref_frame(warped)           # reference = warped target
    stab.stabilize(img)                  # map original -> warped
    h_est = stab.get_cur_trans_matrix()
    assert h_est is not None
    assert stab.get_cur_inliers_count() > 30
    err = corner_error(h_est, h_true, img.shape[1], img.shape[0])
    assert err < 1.5, f"corner error {err:.2f}px"


@pytest.mark.slow
def test_stabilizer_downsampled_path():
    img = textured_image(h=480, w=640, seed=3)
    h_true = small_homography(3)
    warped = np.asarray(
        warp_perspective(jnp.asarray(img), jnp.asarray(h_true), 480, 640)
    )
    stab = Stabilizer(downsample_ratio=0.5, max_features=1500)
    stab.set_ref_frame(warped)
    stab.stabilize(img)
    h_est = stab.get_cur_trans_matrix()
    assert h_est is not None
    err = corner_error(h_est, h_true, 640, 480)
    assert err < 3.0, f"corner error {err:.2f}px (downsampled path)"


def test_stabilizer_box_transform():
    img = textured_image(h=480, w=640, seed=4)
    shift = np.eye(3)
    shift[:2, 2] = [10.0, -6.0]
    warped = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(shift), 480, 640))
    stab = Stabilizer(downsample_ratio=1.0, max_features=800, mask_use=True)
    stab.set_ref_frame(warped)
    boxes = np.array([[200.0, 200.0, 30.0, 20.0]], np.float32)
    stab.stabilize(img, boxes)
    out = stab.transform_cur_boxes()
    assert out is not None
    np.testing.assert_allclose(out[0, :2], [210.0, 194.0], atol=2.0)
    np.testing.assert_allclose(out[0, 2:], [30.0, 20.0], atol=2.0)


def test_identity_when_same_frame():
    img = textured_image(seed=5)
    stab = Stabilizer(downsample_ratio=1.0, max_features=600)
    stab.set_ref_frame(img)
    stab.stabilize(img)
    h = stab.get_cur_trans_matrix()
    assert h is not None
    err = corner_error(h, np.eye(3), img.shape[1], img.shape[0])
    assert err < 0.5


# ---------------------------------------------------------------- CLAHE
def test_clahe_against_cv2():
    cv2 = pytest.importorskip("cv2")
    from geotrax_tpu.ops.clahe import clahe

    img = textured_image(h=256, w=256, seed=9)[..., 0]
    ours = np.asarray(clahe(jnp.asarray(img), tiles=8, clip_limit=2.0))
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
    # implementations differ in interpolation details; require strong
    # agreement in the interior (correlation + bounded mean error)
    inner_o = ours[16:-16, 16:-16].ravel()
    inner_r = ref[16:-16, 16:-16].astype(np.float32).ravel()
    corr = np.corrcoef(inner_o, inner_r)[0, 1]
    assert corr > 0.98, f"corr {corr:.3f}"
    assert np.abs(inner_o - inner_r).mean() < 12.0


def test_clahe_increases_local_contrast():
    from geotrax_tpu.ops.clahe import clahe

    rng = np.random.default_rng(3)
    low_contrast = (rng.normal(128, 6, (128, 128))).clip(0, 255).astype(np.uint8)
    out = np.asarray(clahe(jnp.asarray(low_contrast)))
    assert out.std() > low_contrast.std() * 2
    assert 0 <= out.min() and out.max() <= 255


def test_stabilizer_clahe_path_runs():
    img = textured_image(seed=11)
    stab = Stabilizer(downsample_ratio=1.0, max_features=600, clahe=True)
    stab.set_ref_frame(img)
    stab.stabilize(img)
    h = stab.get_cur_trans_matrix()
    assert h is not None
    err = corner_error(h, np.eye(3), img.shape[1], img.shape[0])
    assert err < 1.0


# ---------------------------------------------------------------- multi-scale
@pytest.mark.slow
def test_pyramid_recovers_large_scale_change():
    """A 1.8x zoom defeats single-level matching but the rsift-class
    pyramid path recovers it (the master->ortho registration scenario)."""
    img = textured_image(h=480, w=640, seed=21)
    h_true = np.diag([1.8, 1.8, 1.0])
    h_true[:2, 2] = [-250.0, -180.0]
    warped = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(h_true), 480, 640))

    stab = Stabilizer(downsample_ratio=1.0, max_features=2000,
                      detector_name="rsift", ransac_epipolar_threshold=3.0)
    stab.set_ref_frame(warped)
    stab.stabilize(img)
    h_est = stab.get_cur_trans_matrix()
    assert h_est is not None
    # evaluate only over the region that survives the zoom crop
    corners = jnp.asarray([[60.0, 60.0], [280.0, 60.0], [280.0, 200.0], [60.0, 200.0]])
    from geotrax_tpu.ops.homography import apply_homography
    a = np.asarray(apply_homography(jnp.asarray(h_est), corners[None])[0])
    b = np.asarray(apply_homography(jnp.asarray(h_true), corners[None])[0])
    err = np.linalg.norm(a - b, axis=1).max()
    assert err < 4.0, f"scale-change registration error {err:.2f}px"


def test_pyramid_keypoint_budget():
    from geotrax_tpu.ops.features import detect_and_describe_pyramid

    img = textured_image(seed=22)
    gray = features.rgb_to_gray(jnp.asarray(img))
    kps, desc = detect_and_describe_pyramid(gray, 512, n_levels=3)
    assert kps.xy.shape[0] <= 512
    assert desc.shape[0] == kps.xy.shape[0]
    assert int(kps.valid.sum()) > 100


# ---------------------------------------------------------------- pallas FAST
def test_pallas_fast_kernel_parity():
    """The Pallas FAST-score kernel must match the roll-based JAX reference
    exactly (interpreter mode on CPU; the TPU path runs the same kernel)."""
    from geotrax_tpu.ops.pallas_fast import fast_score_map, fast_score_map_reference

    img = textured_image(h=300, w=420, seed=13)[..., 0].astype(np.float32)
    ref = np.asarray(fast_score_map_reference(jnp.asarray(img), 20.0))
    got = np.asarray(fast_score_map(jnp.asarray(img), 20.0, interpret=True))
    np.testing.assert_array_equal(got, ref)
    assert (ref > 0).sum() > 100  # the image actually has corners


def test_pallas_patches_kernel_parity():
    """The VMEM patch-extraction kernel must reproduce direct slicing
    (interpreter mode on CPU; the TPU unoriented-describe path uses it)."""
    from geotrax_tpu.ops.pallas_patches import extract_patches

    rng = np.random.default_rng(21)
    img = rng.uniform(0, 255, (160, 384)).astype(np.float32)
    x0 = rng.integers(0, 384 - 32, (70,)).astype(np.int32)
    y0 = rng.integers(0, 160 - 32, (70,)).astype(np.int32)
    got = np.asarray(extract_patches(jnp.asarray(img), jnp.asarray(x0),
                                     jnp.asarray(y0), interpret=True))
    for k in range(70):
        np.testing.assert_array_equal(
            got[k], img[y0[k]:y0[k] + 32, x0[k]:x0[k] + 32]
        )


def test_fast_score_map_xla_parity():
    """The bit-packed pure-XLA FAST score map must equal the roll-based
    reference (it replaces the Pallas dispatch in the vmapped fused path)."""
    from geotrax_tpu.ops.features import fast_score_map_xla
    from geotrax_tpu.ops.pallas_fast import fast_score_map_reference

    img = textured_image(h=260, w=400, seed=31)[..., 0].astype(np.float32)
    ref = np.asarray(fast_score_map_reference(jnp.asarray(img), 20.0))
    got = np.asarray(fast_score_map_xla(jnp.asarray(img), 20.0))
    np.testing.assert_array_equal(got, ref)
    assert (ref > 0).sum() > 100


def test_packed_plane_descriptors_match_patch_path():
    """The packed-plane descriptor bits must equal the direct patch+selection
    evaluation of the same tests."""
    from geotrax_tpu.ops.features import (
        _gaussian_blur,
        _unoriented_selection,
        describe,
        fast_detect,
        patches32,
    )

    img = textured_image(h=240, w=320, seed=32)[..., 0].astype(np.float32)
    gray = jnp.asarray(img)
    kps = features.fast_detect(gray, 128, oriented=False)
    got = np.asarray(features.describe(gray, kps, oriented=False, method="planes"))

    smoothed = _gaussian_blur(gray, sigma=2.0)
    p = 32
    half = p // 2 - 1
    x0 = jnp.clip(kps.xy[:, 0].astype(jnp.int32) - half, 0, 320 - p)
    y0 = jnp.clip(kps.xy[:, 1].astype(jnp.int32) - half, 0, 240 - p)
    patches = patches32(smoothed, x0, y0)
    sel = jnp.asarray(_unoriented_selection(256, p))
    vals = (patches.reshape(-1, p * p) @ sel).reshape(-1, 256, 2)
    want = np.asarray((vals[..., 0] < vals[..., 1]).astype(jnp.float32))
    valid = np.asarray(kps.valid)
    np.testing.assert_array_equal(got[valid], want[valid])
