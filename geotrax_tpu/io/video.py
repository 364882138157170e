"""Video decode/encode with prefetch.

Replaces the reference's cv2.VideoCapture/VideoWriter usage
(reference extract.py:248, visualize.py:609-625, file_utils.py:183-189) with a
backend-pluggable reader:

- 'native': C++ libavformat/libavcodec decoder (geotrax_tpu/io/native),
  loaded via ctypes; deterministic frame indexing, BGR24 output.
- 'cv2': OpenCV fallback (always available in dev environments).
- SyntheticVideoReader: procedural frame generator used by tests so the whole
  extract pipeline runs hermetically without codec work (closing the
  reference's missing-fake-decoder test gap, SURVEY.md §4).

Frames are numpy uint8 HxWx3 in **RGB** order (JAX/device friendly); the cv2
boundary converts. A background prefetch thread keeps a small ring of decoded
frames ahead of the consumer.
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional

import numpy as np


@dataclass
class VideoInfo:
    width: int
    height: int
    fps: float
    frame_count: int


# ---------------------------------------------------------------------------
# Backends
# ---------------------------------------------------------------------------

def _native_lib():
    """Load the native decoder shared library if built, else None."""
    from geotrax_tpu.io.native import load_library

    try:
        return load_library()
    except (OSError, FileNotFoundError):
        return None


def get_backend(requested: Optional[str] = None) -> str:
    requested = requested or os.environ.get("GEOTRAX_VIDEO_BACKEND")
    if requested in ("native", "cv2"):
        return requested
    return "native" if _native_lib() is not None else "cv2"


def probe_video(path: Path | str, backend: Optional[str] = None) -> VideoInfo:
    path = str(path)
    if get_backend(backend) == "native":
        from geotrax_tpu.io.native import native_probe

        info = native_probe(path)
        if info is not None:
            return info
    import cv2

    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise FileNotFoundError(f"Cannot open video: {path}")
        return VideoInfo(
            width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            fps=float(cap.get(cv2.CAP_PROP_FPS)),
            frame_count=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        )
    finally:
        cap.release()


def keyframe_indices(path: Path | str, max_count: int = 1 << 20) -> list[int]:
    """Frame indices of the video's I-frames (packet-level scan, no decode)
    via the native libav runtime; empty when only the cv2 backend is
    available (cv2 exposes no packet flags). The data-prep cut tools use
    these to snap cut starts onto keyframes."""
    from geotrax_tpu.io.native import load_library

    try:
        lib = load_library()
    except (FileNotFoundError, OSError):
        return []
    import ctypes

    # 2h of all-intra 30fps fits in 2^18 entries (2 MiB) — the previous 2^20
    # default allocated 8 MiB per call in per-file tool loops
    max_count = min(max_count, 1 << 18)
    buf = (ctypes.c_long * max_count)()
    n = lib.gtx_keyframe_indices(str(path).encode(), buf, max_count)
    if n < 0:
        return []
    return [int(buf[i]) for i in range(n)]


class VideoReader:
    """Sequential frame reader with deterministic indexing and prefetch.

    Iterates (frame_index, frame_rgb) from ``start`` (inclusive) to ``stop``
    (exclusive; None = end of stream). Skipped head frames are decoded and
    discarded rather than seeked, so frame indices are exact regardless of
    keyframe placement (the reference warns FFmpeg seeking varies,
    georeference.py:72-74).
    """

    def __init__(
        self,
        path: Path | str,
        start: int = 0,
        stop: Optional[int] = None,
        prefetch: int = 4,
        backend: Optional[str] = None,
    ):
        self.path = str(path)
        self.start = int(start)
        self.stop = stop
        self.backend = get_backend(backend)
        self.info = probe_video(self.path, self.backend)
        self._prefetch = max(1, int(prefetch))
        self._queue: queue.Queue = queue.Queue(maxsize=self._prefetch)
        self._stop_event = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._started = False
        self._finished = False
        self._error: Optional[BaseException] = None

    # -- producer -----------------------------------------------------------
    def _put(self, item) -> bool:
        """Blocking put that honors the stop event — a plain put() can block
        forever when close() stops consuming with the queue full."""
        while not self._stop_event.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _produce(self):
        try:
            if self.backend == "native":
                from geotrax_tpu.io.native import native_frames

                frame_iter = native_frames(self.path)
            else:
                frame_iter = self._cv2_frames()
            for idx, frame in frame_iter:
                if self._stop_event.is_set():
                    break
                if idx < self.start:
                    continue
                if self.stop is not None and idx >= self.stop:
                    break
                if not self._put((idx, frame)):
                    break
        except BaseException as exc:  # noqa: BLE001 — re-raised in the consumer
            # swallowing would make a decode failure look like a clean,
            # shorter (or empty) video
            self._error = exc
        finally:
            # the sentinel must BLOCK until delivered (or the reader is
            # closing): the producer runs ahead of a slow consumer, so a
            # timed put could expire against a still-full queue, drop the
            # sentinel, and leave the consumer waiting forever
            if not self._put(None):
                try:
                    self._queue.put_nowait(None)
                except queue.Full:
                    pass

    def _cv2_frames(self):
        import cv2

        cap = cv2.VideoCapture(self.path)
        try:
            idx = 0
            while True:
                ok, bgr = cap.read()
                if not ok:
                    break
                yield idx, np.ascontiguousarray(bgr[..., ::-1])
                idx += 1
        finally:
            cap.release()

    # -- consumer -----------------------------------------------------------
    def __iter__(self) -> Iterator[tuple[int, np.ndarray]]:
        if self._finished:
            # a consumed reader yields nothing more (re-iterating used to
            # block forever on the empty queue)
            if self._error is not None:
                raise self._error
            return
        if not self._started:
            self._thread = threading.Thread(target=self._produce, daemon=True)
            self._thread.start()
            self._started = True
        while True:
            item = self._queue.get()
            if item is None:
                break
            yield item
        self._finished = True
        if self._error is not None:
            raise self._error

    def read_frame(self, index: int) -> np.ndarray:
        """Decode a single frame by exact index (sequential walk; used for
        reference/master frames, not the hot loop)."""
        for idx, frame in VideoReader(self.path, start=index, stop=index + 1, backend=self.backend):
            return frame
        raise IndexError(f"Frame {index} not found in {self.path}")

    def close(self):
        self._stop_event.set()
        if self._thread is not None:
            # Drain so the producer can reach the sentinel and exit (its put
            # loop re-checks the stop event, so it cannot re-block).
            try:
                while True:
                    self._queue.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=2.0)
        self._finished = True


class ParallelVideoReader:
    """GOP-parallel frame reader: N worker threads decode disjoint index
    ranges of one video concurrently, merged in display order.

    Host decode is the end-to-end bottleneck on multi-core hosts (a single
    4K MPEG-4 decode saturates one core at ~3.5 fps while the TPU pipeline
    runs at hundreds of fps — SURVEY.md §7 hard part 6). libavcodec frame
    threading helps inter-frame codecs but not the reference's MPEG-4 Part 2
    sources; GOP parallelism does: the video's display-order pts map is
    scanned packet-level (no decode), the index range is split into
    ``workers`` equal segments, and every worker opens its OWN decoder,
    seeks backward to the keyframe preceding its segment (one extra GOP of
    margin for open-GOP streams), discards warm-up frames, and serves
    exactly its pts slice. ctypes releases the GIL during libav calls, so
    worker threads scale across cores without processes or frame copies.

    The merged stream is bit-identical to ``VideoReader`` output
    (tests/test_io_video.py), because segment membership is decided by the
    scanned display pts, never by post-seek frame counting. Falls back by
    raising ValueError when the stream has no usable pts map — callers
    (``make_reader``) then construct the sequential reader.

    Replaces the reference's single cv2.VideoCapture loop
    (reference geotrax/extract.py:248) as the scalable host-IO path.
    """

    def __init__(
        self,
        path: Path | str,
        start: int = 0,
        stop: Optional[int] = None,
        workers: int = 2,
        prefetch: int = 8,
    ):
        from geotrax_tpu.io.native import scan_frame_pts

        self.path = str(path)
        self.backend = "native"
        scan = scan_frame_pts(self.path)
        if scan is None:
            raise ValueError(
                f"no display-pts map for {path} (native lib missing or "
                "stream lacks pts) — use the sequential VideoReader"
            )
        self._pts, keys = scan
        n = len(self._pts)
        info = probe_video(self.path, "native")
        # the packet scan counts actual frames; trust it over the container
        # estimate so segment math can't run past EOF
        self.info = VideoInfo(info.width, info.height, info.fps, n)
        self._kf = np.flatnonzero(keys)
        if n == 0 or len(self._kf) == 0 or self._kf[0] != 0:
            raise ValueError(f"{path}: no keyframes (corrupt index?)")
        self.start = max(0, int(start))
        self.stop = n if stop is None else max(self.start, min(int(stop), n))
        total = self.stop - self.start
        self._workers = max(1, min(int(workers), max(1, total)))
        # segments shorter than ~2 GOPs pay more seek warm-up than they win
        approx_gop = max(1, int(np.median(np.diff(self._kf))) if len(self._kf) > 1 else n)
        while self._workers > 1 and total / self._workers < 2 * approx_gop:
            self._workers -= 1
        bounds = [
            self.start + (total * j) // self._workers
            for j in range(self._workers + 1)
        ]
        self._segments = [
            (bounds[j], bounds[j + 1])
            for j in range(self._workers)
            if bounds[j] < bounds[j + 1]
        ]
        self._queues = [
            queue.Queue(maxsize=max(1, int(prefetch))) for _ in self._segments
        ]
        self._stop_event = threading.Event()
        self._threads: list[threading.Thread] = []
        self._errors: list[Optional[BaseException]] = [None] * len(self._segments)
        self._started = False
        self._finished = False

    def _seek_pts(self, seg_start: int) -> int:
        """Seek target: keyframe at-or-before the segment start, then ONE
        more keyframe back — open-GOP streams let display frames just after
        an I-frame reference the previous GOP, so decoding from the prior
        keyframe guarantees those references exist. Warm-up frames are
        discarded by pts membership, so the margin costs decode time only."""
        k = int(self._kf[self._kf <= seg_start][-1])
        before = self._kf[self._kf < k]
        if len(before):
            k = int(before[-1])
        return int(self._pts[k])

    def _produce(self, slot: int, seg: tuple[int, int]) -> None:
        from geotrax_tpu.io.native import native_frames_segment

        q = self._queues[slot]
        try:
            seg_pts = self._pts[seg[0]:seg[1]]
            # single-threaded codec per worker: GOP parallelism replaces
            # frame threading; workers*cores codec threads would thrash
            for item in native_frames_segment(
                self.path, seg_pts, seg[0],
                seek_pts=self._seek_pts(seg[0]), threads=1,
            ):
                if self._stop_event.is_set():
                    return
                while not self._stop_event.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                else:
                    return
        except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
            self._errors[slot] = exc
        finally:
            while not self._stop_event.is_set():
                try:
                    q.put(None, timeout=0.1)
                    return
                except queue.Full:
                    continue
            try:
                q.put_nowait(None)
            except queue.Full:
                pass

    def __iter__(self) -> Iterator[tuple[int, np.ndarray]]:
        if self._finished:
            return
        if not self._started:
            for slot, seg in enumerate(self._segments):
                t = threading.Thread(
                    target=self._produce, args=(slot, seg), daemon=True
                )
                t.start()
                self._threads.append(t)
            self._started = True
        for slot in range(len(self._segments)):
            while True:
                item = self._queues[slot].get()
                if item is None:
                    break
                yield item
            if self._errors[slot] is not None:
                self._finished = True
                raise self._errors[slot]
        self._finished = True

    def read_frame(self, index: int) -> np.ndarray:
        for _, frame in VideoReader(self.path, start=index, stop=index + 1):
            return frame
        raise IndexError(f"Frame {index} not found in {self.path}")

    def close(self):
        self._stop_event.set()
        for q in self._queues:
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
        for t in self._threads:
            t.join(timeout=2.0)
        self._finished = True


def make_reader(
    path: Path | str,
    start: int = 0,
    stop: Optional[int] = None,
    prefetch: int = 4,
    backend: Optional[str] = None,
    workers: Optional[int] = None,
):
    """Reader factory: GOP-parallel when ``workers`` > 1 (explicit argument
    or GEOTRAX_DECODE_WORKERS) and the stream supports it; sequential
    VideoReader otherwise. The default stays sequential — on a single-core
    host the parallel reader's per-segment seek warm-up costs more than it
    wins."""
    if workers is None:
        workers = int(os.environ.get("GEOTRAX_DECODE_WORKERS", "1") or 1)
    if workers > 1 and get_backend(backend) == "native":
        try:
            return ParallelVideoReader(
                path, start=start, stop=stop, workers=workers,
                prefetch=max(prefetch, 2 * workers),
            )
        except (ValueError, OSError):
            pass
    return VideoReader(path, start=start, stop=stop, prefetch=prefetch,
                       backend=backend)


class SyntheticVideoReader:
    """Procedural test double: deterministic moving-rectangle frames.

    Yields (index, frame) like VideoReader; ``boxes_per_frame`` describes the
    ground-truth rectangles drawn so tests can verify detection/tracking
    without a real model or codec.
    """

    def __init__(self, width=256, height=192, n_frames=30, fps=30.0, boxes=None, seed=0):
        self.info = VideoInfo(width, height, fps, n_frames)
        self.n_frames = n_frames
        rng = np.random.default_rng(seed)
        if boxes is None:
            # two elongated vehicle-like boxes moving on straight lines
            boxes = [
                {"xy0": (30.0, 40.0), "v": (2.0, 0.5), "wh": (30, 12), "color": (255, 40, 40)},
                {"xy0": (180.0, 120.0), "v": (-1.5, -0.8), "wh": (24, 10), "color": (40, 255, 40)},
            ]
        self.boxes = boxes
        # Structured background (blocks + lines): per-pixel noise would give
        # feature descriptors nothing stable to match against.
        h, w = self.info.height, self.info.width
        bg = rng.integers(40, 90, size=(h, w)).astype(np.uint8)
        for _ in range(max(40, h * w // 1000)):
            y, x = int(rng.integers(0, h - 12)), int(rng.integers(0, w - 12))
            bh, bw = rng.integers(4, 12, size=2)
            bg[y:y + bh, x:x + bw] = rng.integers(120, 255)
        for _ in range(6):
            y = int(rng.integers(0, h - 2))
            bg[y:y + 2, :] = 200
        self._bg = np.stack([bg, bg, bg], axis=-1)

    def boxes_at(self, idx: int):
        out = []
        for b in self.boxes:
            cx = b["xy0"][0] + b["v"][0] * idx
            cy = b["xy0"][1] + b["v"][1] * idx
            out.append((cx, cy, b["wh"][0], b["wh"][1]))
        return out

    def __iter__(self):
        for idx in range(self.n_frames):
            frame = self._bg.copy()
            for b, (cx, cy, w, h) in zip(self.boxes, self.boxes_at(idx)):
                x0, y0 = int(cx - w / 2), int(cy - h / 2)
                x1, y1 = int(cx + w / 2), int(cy + h / 2)
                x0c, y0c = max(x0, 0), max(y0, 0)
                x1c, y1c = min(x1, self.info.width), min(y1, self.info.height)
                if x1c > x0c and y1c > y0c:
                    frame[y0c:y1c, x0c:x1c] = b["color"]
            yield idx, frame

    def close(self):
        pass


class VideoWriter:
    """Annotated-video writer: first-party MPEG-4 encoder (io/native/
    encode.cpp — the mp4v codec the reference picks on linux, reference
    file_utils.py:176-180) with a cv2 fallback when the native library or a
    non-mp4 container is requested."""

    def __init__(self, path: Path | str, fps: float, width: int, height: int,
                 fourcc: Optional[str] = None, backend: Optional[str] = None,
                 bitrate: int = 0):
        from geotrax_tpu.utils.file_utils import determine_suffix_and_fourcc

        if fourcc is None:
            _, fourcc = determine_suffix_and_fourcc()
        self.path = str(path)
        self._native = None
        self._writer = None
        self.width, self.height = int(width), int(height)
        backend = backend or os.environ.get("GEOTRAX_VIDEO_BACKEND")
        # The native encoder emits MPEG-4 Part 2 only; a caller explicitly
        # asking for H.264 ('avc1') falls through to cv2 so the requested
        # codec is honored. ``bitrate`` (bits/s; 0 = auto = 4*w*h) maps to
        # the encoder's rate control (reference recut --bitrate surface).
        if backend != "cv2" and fourcc.lower() == "mp4v":
            from geotrax_tpu.io.native import load_encoder_library

            lib = load_encoder_library()
            if lib is not None:
                handle = lib.gtx_enc_open(
                    self.path.encode(), self.width, self.height, float(fps),
                    int(bitrate),
                )
                if handle:
                    self._native = (lib, handle)
        if self._native is None:
            import cv2

            self._writer = cv2.VideoWriter(
                self.path, cv2.VideoWriter_fourcc(*fourcc), fps,
                (self.width, self.height),
            )
            if not self._writer.isOpened():
                raise OSError(f"Cannot open video writer: {self.path}")

    def write(self, frame_rgb: np.ndarray):
        if self._native is not None:
            import ctypes

            lib, handle = self._native
            frame = np.ascontiguousarray(frame_rgb, dtype=np.uint8)
            if frame.shape != (self.height, self.width, 3):
                # the C side reads exactly 3*w*h bytes — a smaller frame
                # would be an out-of-bounds read (cv2 fails safely; match it)
                raise ValueError(
                    f"frame shape {frame.shape} != writer "
                    f"({self.height}, {self.width}, 3)"
                )
            rc = lib.gtx_enc_write(handle, frame.ctypes.data_as(ctypes.c_void_p))
            if rc < 0:
                raise OSError(f"Native encoder write failed ({rc}): {self.path}")
            return
        self._writer.write(np.ascontiguousarray(frame_rgb[..., ::-1]))

    def close(self):
        if self._native is not None:
            lib, handle = self._native
            lib.gtx_enc_close(handle)
            self._native = None
            return
        if self._writer is not None:
            self._writer.release()
