"""Native (C++/FFmpeg) video decoder bindings.

Built by `make -C geotrax_tpu/io/native` into libgeotrax_decode.so and loaded
via ctypes. Falls back cleanly (callers check for None) when the library has
not been built or FFmpeg dev libraries are unavailable.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

_LIB_PATH = Path(__file__).parent / "libgeotrax_decode.so"
_ENC_PATH = Path(__file__).parent / "libgeotrax_encode.so"
_LAP_PATH = Path(__file__).parent / "libgeotrax_lap.so"
_REMUX_PATH = Path(__file__).parent / "libgeotrax_remux.so"
_lib = None
_enc_lib = None
_lap_lib = None
_remux_lib = None


def _try_build() -> None:
    """Best-effort one-shot build of the shared library from source."""
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", str(_LIB_PATH.parent)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:  # noqa: BLE001 — missing toolchain/headers → fall back to cv2
        pass


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _try_build()
    if not _LIB_PATH.exists():
        raise FileNotFoundError(str(_LIB_PATH))
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.gtx_open.restype = ctypes.c_void_p
    lib.gtx_open.argtypes = [ctypes.c_char_p]
    lib.gtx_width.restype = ctypes.c_int
    lib.gtx_width.argtypes = [ctypes.c_void_p]
    lib.gtx_height.restype = ctypes.c_int
    lib.gtx_height.argtypes = [ctypes.c_void_p]
    lib.gtx_fps.restype = ctypes.c_double
    lib.gtx_fps.argtypes = [ctypes.c_void_p]
    lib.gtx_frame_count.restype = ctypes.c_long
    lib.gtx_frame_count.argtypes = [ctypes.c_void_p]
    lib.gtx_read_frame.restype = ctypes.c_int
    lib.gtx_read_frame.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.gtx_close.restype = None
    lib.gtx_close.argtypes = [ctypes.c_void_p]
    lib.gtx_keyframe_indices.restype = ctypes.c_long
    lib.gtx_keyframe_indices.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
    ]
    # GOP-parallel extension — bound defensively so a stale pre-extension
    # .so still serves the sequential path instead of failing to load
    if hasattr(lib, "gtx_scan_pts"):
        lib.gtx_scan_pts.restype = ctypes.c_long
        lib.gtx_scan_pts.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.c_long,
        ]
        lib.gtx_open_at.restype = ctypes.c_void_p
        lib.gtx_open_at.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int]
        lib.gtx_read_frame_pts.restype = ctypes.c_int
        lib.gtx_read_frame_pts.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ]
    _lib = lib
    return lib


def lapjv_native(cost) -> "np.ndarray | None":
    """Exact LAPJV via the native solver; None when the library is missing."""
    global _lap_lib
    if _lap_lib is None:
        if not _LAP_PATH.exists():
            _try_build()
        if not _LAP_PATH.exists():
            return None
        lib = ctypes.CDLL(str(_LAP_PATH))
        lib.gtx_lapjv.restype = ctypes.c_int
        lib.gtx_lapjv.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p
        ]
        _lap_lib = lib
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = cost.shape
    out = np.empty(n, dtype=np.int64)
    rc = _lap_lib.gtx_lapjv(
        cost.ctypes.data_as(ctypes.c_void_p), n, m, out.ctypes.data_as(ctypes.c_void_p)
    )
    if rc != 0:
        return None
    return out


def native_probe(path: str):
    from geotrax_tpu.io.video import VideoInfo

    try:
        lib = load_library()
    except (OSError, FileNotFoundError):
        return None
    handle = lib.gtx_open(path.encode())
    if not handle:
        return None
    try:
        return VideoInfo(
            width=lib.gtx_width(handle),
            height=lib.gtx_height(handle),
            fps=lib.gtx_fps(handle),
            frame_count=int(lib.gtx_frame_count(handle)),
        )
    finally:
        lib.gtx_close(handle)


def native_frames(path: str) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (index, RGB frame) sequentially from the native decoder."""
    lib = load_library()
    handle = lib.gtx_open(path.encode())
    if not handle:
        raise OSError(f"native decoder failed to open {path}")
    try:
        h, w = lib.gtx_height(handle), lib.gtx_width(handle)
        idx = 0
        while True:
            frame = np.empty((h, w, 3), dtype=np.uint8)
            rc = lib.gtx_read_frame(handle, frame.ctypes.data_as(ctypes.c_void_p))
            if rc < 0:
                # decode error (C ABI: 1 = clean EOF, <0 = error) — treating
                # it as EOF would silently truncate a corrupt video
                raise OSError(f"native decoder error {rc} at frame {idx} of {path}")
            if rc != 0:
                break
            yield idx, frame
            idx += 1
    finally:
        lib.gtx_close(handle)


def scan_frame_pts(path: str, max_count: int = 1 << 18):
    """Display-order (pts, is_keyframe) map of every frame — the index
    ParallelVideoReader partitions on. None when the native library is
    missing, lacks the GOP extension, or the stream has no usable pts
    (callers fall back to sequential decode)."""
    try:
        lib = load_library()
    except (OSError, FileNotFoundError):
        return None
    if not hasattr(lib, "gtx_scan_pts"):
        return None
    pts = np.empty(max_count, dtype=np.int64)
    keys = np.empty(max_count, dtype=np.int32)
    n = lib.gtx_scan_pts(
        str(path).encode(),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        max_count,
    )
    if n < 0 or n > max_count:
        return None
    return pts[:n].copy(), keys[:n].copy()


def native_frames_segment(
    path: str, seg_pts: "np.ndarray", first_index: int,
    seek_pts: "int | None" = None, threads: int = 1,
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (display_index, RGB frame) for exactly the frames whose pts are
    in ``seg_pts`` (a contiguous display-order slice from scan_frame_pts).
    Opens its own decoder, seeks backward to ``seek_pts`` (callers pass a
    keyframe at-or-before the segment, with open-GOP margin), and discards
    the decode warm-up frames whose pts precede seg_pts[0] — so N concurrent
    segments reproduce the sequential stream bit-exactly."""
    lib = load_library()
    if seek_pts is None:
        seek_pts = int(seg_pts[0])
    handle = lib.gtx_open_at(str(path).encode(), int(seek_pts), threads)
    if not handle:
        raise OSError(f"native decoder failed to open/seek {path}")
    try:
        h, w = lib.gtx_height(handle), lib.gtx_width(handle)
        pts_out = ctypes.c_int64()
        want = {int(p): first_index + i for i, p in enumerate(seg_pts)}
        served = 0
        while served < len(seg_pts):
            frame = np.empty((h, w, 3), dtype=np.uint8)
            rc = lib.gtx_read_frame_pts(
                handle, frame.ctypes.data_as(ctypes.c_void_p),
                ctypes.byref(pts_out),
            )
            if rc < 0:
                raise OSError(f"native decoder error {rc} in segment of {path}")
            if rc != 0:
                raise OSError(
                    f"EOF after {served}/{len(seg_pts)} segment frames of {path}"
                )
            idx = want.get(int(pts_out.value))
            if idx is None:
                continue  # seek warm-up frame before the segment start
            yield idx, frame
            served += 1
    finally:
        lib.gtx_close(handle)


def _load_remux_library():
    global _remux_lib
    if _remux_lib is not None:
        return _remux_lib
    if not _REMUX_PATH.exists():
        _try_build()
    if not _REMUX_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_REMUX_PATH))
    except OSError:
        return None
    lib.gtx_remux_concat.restype = ctypes.c_int
    lib.gtx_remux_concat.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_char_p,
    ]
    lib.gtx_validate.restype = ctypes.c_int
    lib.gtx_validate.argtypes = [ctypes.c_char_p]
    if hasattr(lib, "gtx_remux_cut"):
        lib.gtx_remux_cut.restype = ctypes.c_int
        lib.gtx_remux_cut.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ]
    _remux_lib = lib
    return lib


def remux_concat(inputs, output) -> bool:
    """Concatenate videos by stream copy (no re-encode) into ``output``.
    Returns False when the native library is unavailable or remux failed —
    callers fall back to decode/re-encode."""
    lib = _load_remux_library()
    if lib is None:
        return False
    arr = (ctypes.c_char_p * len(inputs))(
        *[str(p).encode() for p in inputs]
    )
    return lib.gtx_remux_concat(arr, len(inputs), str(output).encode()) == 0


def remux_cut_frames(path, output, start_frame: int, end_frame: int) -> bool:
    """Stream-copy frames [start_frame, end_frame] (display indices,
    inclusive) into ``output`` without re-encoding. ``start_frame`` MUST be
    a keyframe (use video.keyframe_indices to snap) or the clip head is
    undecodable — the same contract as the reference's `ffmpeg -ss -c copy`
    cut (reference tools/cut_merged_videos_and_logs.py:358). Returns False
    when the native library or the stream's pts map is unavailable (callers
    fall back to decode/re-encode)."""
    lib = _load_remux_library()
    if lib is None or not hasattr(lib, "gtx_remux_cut"):
        return False
    scan = scan_frame_pts(str(path))
    if scan is None:
        return False
    pts, _keys = scan
    n = len(pts)
    if not (0 <= start_frame <= end_frame < n):
        return False
    rc = lib.gtx_remux_cut(
        str(path).encode(), str(output).encode(),
        int(pts[start_frame]), int(pts[end_frame]),
    )
    return rc == 0


def validate_video(path) -> Optional[bool]:
    """ffprobe-error-check equivalent: True when the container opens, has a
    video stream, and every packet reads cleanly. None when the native
    library is unavailable (callers treat that as 'cannot check')."""
    lib = _load_remux_library()
    if lib is None:
        return None
    return lib.gtx_validate(str(path).encode()) == 0


def load_encoder_library():
    """ctypes handle to the native MPEG-4 encoder (None when unavailable)."""
    global _enc_lib
    if _enc_lib is not None:
        return _enc_lib
    if not _ENC_PATH.exists():
        _try_build()
    if not _ENC_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_ENC_PATH))
    except OSError:
        return None
    lib.gtx_enc_open.restype = ctypes.c_void_p
    lib.gtx_enc_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_long,
    ]
    lib.gtx_enc_write.restype = ctypes.c_int
    lib.gtx_enc_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.gtx_enc_close.restype = ctypes.c_int
    lib.gtx_enc_close.argtypes = [ctypes.c_void_p]
    _enc_lib = lib
    return lib
