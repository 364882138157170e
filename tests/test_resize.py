"""cv2 fixed-point INTER_LINEAR parity (ops/resize.py) and letterbox wiring.

The reference preprocesses frames with cv2.resize INTER_LINEAR inside
ultralytics LetterBox (reference extract.py:153); OpenCV's 8-bit path is
fixed-point, so these tests pin bit-equality against the local cv2 at the
pipeline-relevant scales."""

import numpy as np
import pytest

from geotrax_tpu.ops.resize import resize_u8_linear

cv2 = pytest.importorskip("cv2")


@pytest.mark.parametrize("src,dst", [
    ((2160, 3840), (1080, 1920)),   # 4K -> imgsz 1920 (0.5x fast path)
    ((1512, 2688), (1080, 1920)),   # 2.7K -> imgsz 1920
    ((700, 1000), (364, 520)),      # odd downscale
    ((100, 160), (64, 128)),
])
def test_bit_exact_downscale(src, dst):
    rng = np.random.default_rng(hash(src) % 2**32)
    img = rng.integers(0, 256, src + (3,), dtype=np.uint8)
    want = cv2.resize(img, (dst[1], dst[0]), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_u8_linear(img, *dst))
    assert np.array_equal(got, want)


def test_upscale_within_one_lsb():
    """cv2's 8U upscale kernel differs from the documented fixed-point
    rounding on a small fraction of pixels; pin <= 1 LSB everywhere."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (360, 640, 3), dtype=np.uint8)
    want = cv2.resize(img, (960, 540), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_u8_linear(img, 540, 960))
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.005


def test_grayscale_2d_input():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (120, 200), dtype=np.uint8)
    want = cv2.resize(img, (100, 60), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_u8_linear(img, 60, 100))
    assert got.shape == (60, 100)
    assert np.array_equal(got, want)


def test_letterbox_uses_cv2_exact_resize():
    """letterbox at a non-0.5x scale must route through the fixed-point
    resize (quantized to u8 before /255, like ultralytics)."""
    from geotrax_tpu.models import yolov8

    rng = np.random.default_rng(3)
    src_h, src_w = 1512, 2688  # 2.7K
    img = rng.integers(0, 256, (src_h, src_w, 3), dtype=np.uint8)
    out_h, out_w, r, top, left = yolov8.letterbox_shape(src_h, src_w, 1920)
    new_h, new_w = round(src_h * r), round(src_w * r)
    got = np.asarray(yolov8.letterbox(img, out_h, out_w, new_h, new_w, top, left))
    want_core = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(
        (got[top:top + new_h, left:left + new_w] * 255).round().astype(np.uint8),
        want_core,
    )
    # padding is ultralytics gray 114
    assert np.allclose(got[0, 0], 114.0 / 255.0)
