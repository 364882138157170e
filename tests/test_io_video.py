"""Video IO runtime: native decoder parity with cv2, reader windowing,
synthetic test double."""

import numpy as np
import pytest

from geotrax_tpu.io.video import SyntheticVideoReader, VideoReader, probe_video


@pytest.fixture(scope="module")
def sample_video(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = tmp_path_factory.mktemp("video") / "clip.mp4"
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(12):
        frame = np.full((48, 64, 3), (i * 17) % 255, np.uint8)
        frame[8:16, 8:24] = (0, 0, 255)
        writer.write(frame)
    writer.release()
    return path


def test_probe(sample_video):
    info = probe_video(sample_video)
    assert (info.width, info.height) == (64, 48)
    assert info.fps == pytest.approx(30.0)
    assert info.frame_count == 12


def test_reader_full_and_windowed(sample_video):
    frames = list(VideoReader(sample_video))
    assert len(frames) == 12
    assert frames[0][0] == 0 and frames[-1][0] == 11
    assert frames[0][1].shape == (48, 64, 3)

    window = list(VideoReader(sample_video, start=3, stop=7))
    assert [idx for idx, _ in window] == [3, 4, 5, 6]
    # windowed decode yields the same pixels as the full pass
    np.testing.assert_array_equal(window[0][1], frames[3][1])


def test_reader_slow_consumer_gets_sentinel(sample_video):
    """A consumer slower than the producer must still terminate: the
    producer finishes with the prefetch queue full, and its end-of-stream
    sentinel has to wait for a slot rather than being dropped on a timeout
    (a dropped sentinel left the consumer blocked forever)."""
    import threading
    import time

    seen = []

    def consume():
        for idx, _ in VideoReader(sample_video, prefetch=1):
            seen.append(idx)
            time.sleep(0.25)  # slower than decode; producer ends far ahead

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=30)
    assert not t.is_alive(), "consumer never saw the end-of-stream sentinel"
    assert seen == list(range(12))


def test_reader_reiterate_after_consume(sample_video):
    """Iterating a fully-consumed reader again returns immediately instead
    of blocking on the empty queue."""
    r = VideoReader(sample_video)
    assert len(list(r)) == 12
    assert list(r) == []


def test_native_backend_matches_cv2(sample_video):
    from geotrax_tpu.io.native import load_library

    try:
        load_library()
    except (OSError, FileNotFoundError):
        pytest.skip("native decoder not built")
    native = list(VideoReader(sample_video, backend="native"))
    cv2f = list(VideoReader(sample_video, backend="cv2"))
    assert len(native) == len(cv2f)
    for (i, a), (j, b) in zip(native, cv2f):
        assert i == j
        np.testing.assert_array_equal(a, b)


def test_read_single_frame(sample_video):
    reader = VideoReader(sample_video)
    frame5 = reader.read_frame(5)
    full = list(VideoReader(sample_video))
    np.testing.assert_array_equal(frame5, full[5][1])


def test_synthetic_reader_deterministic():
    r1 = list(SyntheticVideoReader(n_frames=5, seed=1))
    r2 = list(SyntheticVideoReader(n_frames=5, seed=1))
    assert len(r1) == 5
    for (i, a), (j, b) in zip(r1, r2):
        assert i == j
        np.testing.assert_array_equal(a, b)


def test_synthetic_reader_boxes_move():
    reader = SyntheticVideoReader(n_frames=3)
    b0 = reader.boxes_at(0)
    b2 = reader.boxes_at(2)
    assert b0[0][0] != b2[0][0]


def test_native_encoder_roundtrip(tmp_path):
    """First-party MPEG-4 encoder (io/native/encode.cpp): frames written
    through the native path must decode back with the right count, size and
    approximate content (lossy codec -> loose tolerance)."""
    from geotrax_tpu.io.native import load_encoder_library
    from geotrax_tpu.io.video import VideoReader, VideoWriter, probe_video

    if load_encoder_library() is None:
        pytest.skip("native encoder unavailable")
    rng = np.random.default_rng(0)
    base = np.kron(rng.integers(0, 255, (24, 32, 3)), np.ones((8, 8, 1))).astype(np.uint8)
    path = tmp_path / "enc.mp4"
    w = VideoWriter(path, 30.0, 256, 192, fourcc="mp4v")
    assert w._native is not None, "native encoder should engage for mp4v"
    for t in range(10):
        f = base.copy()
        f[:, 8 * t:8 * t + 16] = 255
        w.write(f)
    w.close()

    info = probe_video(path)
    assert (info.width, info.height) == (256, 192)
    frames = [f for _, f in VideoReader(path)]
    assert len(frames) == 10
    # content survives the lossy encode (mean abs error small on flat blocks)
    err = np.abs(frames[0].astype(float) - base.astype(float)
                 - (frames[0].astype(float) - base.astype(float)).mean())
    assert frames[0].shape == base.shape
    assert np.abs(frames[0].astype(float).mean(axis=(0, 1))
                  - base.astype(float).mean(axis=(0, 1))).max() < 30
