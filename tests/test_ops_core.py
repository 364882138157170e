"""Numeric parity tests for the ops layer: boxes/IoU, NMS, assignment,
Kalman, filters (vs scipy), polygon (vs matplotlib.path), warp (vs cv2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geotrax_tpu.ops.assignment import auction_assignment, masked_assignment
from geotrax_tpu.ops.boxes import iou_matrix, xywh_to_xyxy, xyxy_to_xywh
from geotrax_tpu.ops.filters import gaussian_filter1d, gradient, savgol_filter
from geotrax_tpu.ops.nms import nms


# ---------------------------------------------------------------- boxes / IoU
def test_box_roundtrip():
    boxes = jnp.array([[10.0, 20.0, 4.0, 6.0], [0.0, 0.0, 2.0, 2.0]])
    np.testing.assert_allclose(xyxy_to_xywh(xywh_to_xyxy(boxes)), boxes, atol=1e-6)


def test_iou_known_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(iou_matrix(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25.0 / 175.0, 0.0], atol=1e-6)


def _numpy_nms(boxes, scores, thr):
    """Reference greedy NMS (torchvision semantics)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i] or scores[i] <= 0:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + areas - inter + 1e-9)
        suppressed |= iou > thr
        suppressed[i] = True  # self
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_matches_reference_greedy(seed):
    rng = np.random.default_rng(seed)
    n = 64
    centers = rng.uniform(20, 200, (n, 2))
    sizes = rng.uniform(5, 40, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    expected = _numpy_nms(boxes, scores, 0.5)

    keep, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_det=32)
    got = list(np.asarray(keep)[np.asarray(valid)])
    assert got == expected[:32]


def test_nms_respects_max_det():
    boxes = jnp.asarray(
        np.stack([np.arange(10) * 100.0, np.zeros(10), np.arange(10) * 100.0 + 10, np.full(10, 10.0)], axis=1)
    )
    scores = jnp.asarray(np.linspace(0.9, 0.1, 10, dtype=np.float32))
    keep, valid = nms(boxes, scores, 0.5, max_det=4)
    assert int(valid.sum()) == 4


# ---------------------------------------------------------------- assignment
@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("shape", [(8, 8), (10, 16), (30, 40)])
def test_auction_matches_scipy_optimal_cost(seed, shape):
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 1, shape).astype(np.float32)
    rows, cols = linear_sum_assignment(cost)
    optimal = cost[rows, cols].sum()

    assigned = np.asarray(auction_assignment(jnp.asarray(cost)))
    assert len(set(assigned.tolist())) == shape[0], "assignment must be a matching"
    ours = cost[np.arange(shape[0]), assigned].sum()
    assert ours == pytest.approx(optimal, abs=1e-3)


def test_masked_assignment_gating():
    # track 0 <-> det 1 (cost .1), track 1 has only gated options
    cost = jnp.array([[0.9, 0.1, 0.8], [0.95, 0.9, 0.99]])
    row_valid = jnp.array([True, True])
    col_valid = jnp.array([True, True, True])
    col, matched = masked_assignment(cost, row_valid, col_valid, threshold=0.8)
    assert int(col[0]) == 1 and bool(matched[0])
    assert int(col[1]) == -1 and not bool(matched[1])


def test_masked_assignment_invalid_rows_cols():
    cost = jnp.zeros((3, 3))
    col, matched = masked_assignment(
        cost, jnp.array([True, False, True]), jnp.array([True, True, False]), threshold=0.5
    )
    assert not bool(matched[1])
    got_cols = {int(col[0]), int(col[2])}
    assert got_cols <= {0, 1}


# ---------------------------------------------------------------- Kalman
def test_kalman_tracks_constant_velocity():
    from geotrax_tpu.ops.kalman import initiate, measurement_from_xywh, predict, update, xywh_from_state

    boxes = [jnp.array([10.0 + 2 * t, 20.0 + 1 * t, 8.0, 4.0]) for t in range(10)]
    state = initiate(measurement_from_xywh(boxes[0]), fmt="xyah")
    for b in boxes[1:]:
        state = predict(state, fmt="xyah")
        state = update(state, measurement_from_xywh(b), fmt="xyah")
    state = predict(state, fmt="xyah")
    pred = np.asarray(xywh_from_state(state.mean, fmt="xyah"))
    np.testing.assert_allclose(pred[:2], [10.0 + 2 * 10, 20.0 + 1 * 10], atol=0.5)
    np.testing.assert_allclose(pred[2:], [8.0, 4.0], atol=0.3)


def test_kalman_vmappable():
    from geotrax_tpu.ops.kalman import KFState, initiate, predict

    boxes = jnp.asarray(np.random.default_rng(0).uniform(10, 100, (16, 4)).astype(np.float32))
    states = jax.vmap(lambda b: initiate(b, fmt="xywh"))(boxes)
    assert states.mean.shape == (16, 8)
    out = jax.vmap(lambda m, c: predict(KFState(m, c), fmt="xywh"))(states.mean, states.cov)
    assert out.mean.shape == (16, 8)


# ---------------------------------------------------------------- filters
@pytest.mark.parametrize("n", [5, 14, 40, 200])
@pytest.mark.parametrize("sigma", [1.0, 5.0, 14.0])
def test_gaussian_matches_scipy(n, sigma):
    import scipy.ndimage

    rng = np.random.default_rng(0)
    x = rng.normal(size=n)
    expected = scipy.ndimage.gaussian_filter1d(x, sigma, mode="reflect", truncate=3.0)
    got = np.asarray(gaussian_filter1d(x, sigma))
    np.testing.assert_allclose(got, expected, atol=1e-5)


@pytest.mark.parametrize("n", [17, 30, 100])
@pytest.mark.parametrize("kernel", [5, 14, 15])
def test_savgol_matches_scipy(n, kernel):
    import scipy.signal

    rng = np.random.default_rng(1)
    x = rng.normal(size=n)
    window = kernel if kernel % 2 == 1 else kernel + 1
    expected = scipy.signal.savgol_filter(x, window_length=window, polyorder=2, mode="nearest")
    got = np.asarray(savgol_filter(x, kernel, 2))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_gradient_matches_numpy():
    x = np.array([0.0, 1.0, 4.0, 9.0, 16.0])
    np.testing.assert_allclose(np.asarray(gradient(jnp.asarray(x))), np.gradient(x), atol=1e-6)


# ---------------------------------------------------------------- polygon
def test_points_in_polygons_vs_matplotlib():
    from matplotlib.path import Path as MplPath

    from geotrax_tpu.ops.polygon import assign_first_polygon, points_in_polygons

    rng = np.random.default_rng(2)
    polys = []
    for _ in range(6):
        cx, cy = rng.uniform(10, 90, 2)
        w, h = rng.uniform(5, 20, 2)
        ang = rng.uniform(0, np.pi)
        c, s = np.cos(ang), np.sin(ang)
        corners = np.array([[-w, -h], [w, -h], [w, h], [-w, h]]) @ np.array([[c, -s], [s, c]])
        polys.append(corners + [cx, cy])
    polys = np.stack(polys)
    points = rng.uniform(0, 100, (500, 2))

    got = np.asarray(points_in_polygons(jnp.asarray(points), jnp.asarray(polys)))
    for m in range(len(polys)):
        expected = MplPath(polys[m]).contains_points(points)
        # boundary-grazing points may differ; interior/exterior must agree
        disagreement = got[:, m] != expected
        assert disagreement.mean() < 0.01

    first = np.asarray(assign_first_polygon(jnp.asarray(points), jnp.asarray(polys)))
    outside_all = ~got.any(axis=1)
    assert (first[outside_all] == -1).all()


# ---------------------------------------------------------------- warp
def test_warp_perspective_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    from geotrax_tpu.ops.warp import warp_perspective

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    h = np.array([[1.02, 0.01, 3.0], [-0.015, 0.99, -2.0], [1e-5, -2e-5, 1.0]])
    expected = cv2.warpPerspective(img, h, (80, 60))
    got = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(h), 60, 80))
    # interiors must match within rounding; borders may differ by a pixel ring
    inner_expected = expected[3:-3, 3:-3].astype(int)
    inner_got = got[3:-3, 3:-3].astype(int)
    frac_close = (np.abs(inner_expected - inner_got) <= 2).mean()
    assert frac_close > 0.99
