"""End-of-round benchmark: 4K extraction throughput per chip, DEFAULT config,
plus the FULL decode -> detect -> track -> stabilize -> georeference chain on
a real encoded 4K clip (the BASELINE.json metric scope).

UN-KILLABLE BY DESIGN (round-3 postmortem: BENCH_r03.json rc=124, no number
captured because the fused-program compile outran the driver budget before
the first print). The driver-facing process is a thin SUPERVISOR: it spawns
the measurement as a child process, relays every contract-JSON line the child
prints the moment it lands, and enforces a hard deadline
(GTX_BENCH_DEADLINE_S, default 780 s) with SIGKILL — a deadline that works
even while the child is blocked inside a minutes-long XLA compile, which an
in-process SIGALRM cannot preempt. The child prints the headline JSON
immediately after the FIRST timed measurement and reprints refined lines as
extras land, so the LAST printed line is always the best-known complete
contract {"metric", "value", "unit", "vs_baseline", ...}. Whatever happens —
compile-cache miss, e2e failure, deadline — the supervisor exits 0 with at
least one parseable line on stdout.

Headline (compute path): the fused extraction chunk step
(pipeline/device_pipeline.py) on device-resident synthetic 4K frames —
letterbox, YOLOv8s forward (bf16 params + activations, f32 accumulation),
fixed-shape class-agnostic NMS (max_det 1000), the FULL default-on
stabilization pass (FAST corners + grid descriptors + blockwise L2 matching
+ 625-hypothesis RANSAC at the default 0.5x downsample / 2000-feature
budget, masked by the frame's own detections), GMC, a BoT-SORT tracker step
per frame, and the stabilized-box transform — everything the reference runs
per frame through model.track() + stabilo (SURVEY.md §3.2, reference
extract.py:145-197).

End-to-end (BASELINE metric): encodes a 48-frame 4K MPEG-4 clip with the
first-party encoder, then drives the REAL CLI stages — `extract` (native
host decode + the fused device pipeline) and `georeference` (RootSIFT
registration of the reference frame against a synthetic ortho cutout, the
full coordinate/kinematics/lane chain, 17-col CSV). Per-stage wall times,
the end-to-end fps, and the registration px-RMSE against the known crop
offset ride along as extra JSON keys. On this 1-vCPU container the e2e
number is HOST-DECODE-BOUND (~3.5 fps mpeg4 4K single-core): the device
pipeline idles waiting for frames; see e2e_stage_s for the split.

The one JSON line keeps the driver contract {"metric", "value", "unit",
"vs_baseline"}; vs_baseline anchors to the 4K capture rate of the reference
deployment (29.97 fps): value/29.97 = multiples of realtime per chip. The
reference publishes no throughput numbers (BASELINE.md); its GPU pipeline
ran at or below realtime on 4K.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_FPS = 30000 / 1001  # 4K capture realtime
CHUNK = 32
SRC_H, SRC_W = 2160, 3840
DEADLINE_S = float(os.environ.get("GTX_BENCH_DEADLINE_S", "780"))
T0 = time.monotonic()

CACHE_DIR = "/tmp/geotrax_jax_cache"

if "--worker" in sys.argv:
    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compilation cache: the fused 4K program costs minutes to
    # build; repeated driver runs (and the e2e stage below) reuse it across
    # processes
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _seed_compile_cache() -> None:
    """Copy the committed AOT cache entries (aot_cache/, produced by a prior
    real-chip run of this exact bench) into the persistent compilation cache
    BEFORE the first dispatch. The fused 4K program's remote XLA compile has
    been observed anywhere from 126 s to 1783 s cold on this stack — the
    latter blows any sane bench deadline — while the cache key (serialized
    HLO + jaxlib version + target) is deterministic across machines, so a
    fresh driver host deserializes the committed entry in seconds instead.
    A key mismatch (new jaxlib, changed program) just misses and recompiles:
    correctness never depends on the seed."""
    import shutil
    from pathlib import Path

    src = Path(__file__).parent / "aot_cache"
    if not src.is_dir():
        return
    dst = Path(CACHE_DIR)
    dst.mkdir(parents=True, exist_ok=True)
    n = 0
    for f in src.glob("*-cache"):
        target = dst / f.name
        if not target.exists():
            shutil.copyfile(f, target)
            n += 1
    if n:
        print(f"seeded {n} compile-cache entries from aot_cache/", file=sys.stderr)


def _bench_model_npz():
    """Fixed-seed random YOLOv8s checkpoint (variant s, nc=4). Shared by the
    headline build and the e2e CLI stage so both trace the same shapes."""
    import tempfile
    from pathlib import Path

    from geotrax_tpu.models import yolov8
    from geotrax_tpu.models.convert import save_npz

    path = Path(tempfile.gettempdir()) / "gtx_bench_yolov8s.npz"
    fresh = True
    if path.exists():
        # existence alone can't be trusted: a stale npz from an older schema
        # (or another user's file) would silently bench different weights
        try:
            with np.load(path, allow_pickle=False) as z:
                fresh = not (str(z["meta:variant"]) == "s"
                             and int(z["meta:nc"]) == 4)
        except Exception:
            fresh = True
    if fresh:
        spec = yolov8.ModelSpec(variant="s", nc=4)
        params = jax.jit(lambda: yolov8.init_params(jax.random.PRNGKey(0), spec))()
        save_npz(path, jax.device_get(params),
                 class_names={0: "car", 1: "bus", 2: "truck", 3: "motorcycle"},
                 variant="s", nc=4)
    return path


def _bench_cfg_path():
    """The ONE config both the headline and the e2e CLI stages run:
    cfg/default.yaml with the TPU deployment dtype (ultralytics.half -> bf16)
    and the georef feature budget scaled to the e2e 1024^2 ortho cutout (the
    default 250k budget is sized for the 15000^2 reference ortho). A single
    shared config means a single fused-extract HLO: the headline warmup
    pre-compiles exactly the program the e2e `extract` stage dispatches
    (VERDICT r4 #2 — e2e must not pay a second multi-minute compile)."""
    import tempfile
    from pathlib import Path

    import yaml

    from geotrax_tpu.utils.config_utils import CFG_DIR

    cfg = yaml.safe_load((CFG_DIR / "default.yaml").read_text())
    cfg["ultralytics"]["half"] = True
    cfg["georef"]["matching"]["max_features"] = 20000
    path = Path(tempfile.gettempdir()) / "gtx_bench_cfg.yaml"
    path.write_text(yaml.dump(cfg))
    return path


def build(stabilize: bool):
    """The PRODUCTION fused extractor, constructed through the same config
    loader, Detector, tracker factory and FusedExtractor wiring the CLI
    `extract` stage uses (pipeline/_extract_impl.py) — the headline measures
    the exact program a real run dispatches (closing VERDICT r4 weak #2: the
    production path had only ever been benched through a bench-special
    build), and its warmup seeds the persistent compile cache for the e2e
    stage below."""
    import argparse
    import logging

    from geotrax_tpu.pipeline._extract_impl import (
        load_detector,
        make_extract_tracker,
        make_fused_extractor,
    )
    from geotrax_tpu.utils.config_utils import load_config_all

    logger = logging.getLogger("bench-build")
    logger.setLevel(logging.ERROR)
    args = argparse.Namespace(
        cfg=str(_bench_cfg_path()), model=[str(_bench_model_npz())],
        class_names=None, conf=None, classes=None, show=None, tiles=None,
    )
    config = load_config_all(args, logger, needs_model=True)
    config["main"]["extraction"]["stabilize"] = stabilize
    detector = load_detector(config, logger)
    tracker_cfg, tracker_state, tracker_step, reid_params = (
        make_extract_tracker(config, logger)
    )
    fx = make_fused_extractor(
        config, detector, tracker_cfg, tracker_state, tracker_step,
        stabilize, SRC_H, SRC_W, reid_params=reid_params,
    )
    # register in the extract stage's process-level cache: the e2e CLI pass
    # below then reuses THIS traced extractor (reset() per video) instead of
    # re-tracing the fused 4K program — the warm e2e number measures decode +
    # compute, not jax re-trace time
    from geotrax_tpu.pipeline import _extract_impl as _ei

    _ei._EXTRACT_CACHE[_ei._extract_cache_key(config, stabilize)] = (
        detector, tracker_cfg, tracker_state, tracker_step, reid_params,
        {(SRC_H, SRC_W): fx},
    )
    return fx


def _fetch(o) -> float:
    # trustworthy completion barrier on the axon tunnel: block_until_ready
    # can return on a fire-ahead ack before the computation lands, so the
    # only reliable fence is a host VALUE fetch consumed by Python. The
    # reduction runs ON DEVICE so only a scalar crosses the tunnel —
    # fetching a whole array would bill ~100 ms of dev-tunnel transfer
    # (not a cost real PCIe hosts pay) to the compute measurement.
    return float(jnp.sum(o.h) + jnp.sum(o.box_xywh))


def device_scene(seed: int = 42) -> jnp.ndarray:
    """Build the structured 4K scene (8-px blocks + ~200 vehicle-scale
    rectangles, same distribution as the host-side _bench_scene) ON DEVICE
    with one jitted program. The host-generated scene is a 796 MB chunk
    upload; at the ~1 MB/s the axon stdio relay has been observed to sink
    to, shipping it costs ~13 minutes of the bench deadline before a single
    measurement — generating it device-side uploads nothing but a PRNG key."""

    def mk(key):
        kb, ky, kx, kc = jax.random.split(key, 4)
        block = jax.random.randint(
            kb, (SRC_H // 8, SRC_W // 8, 3), 30, 220, jnp.int32)
        scene = jnp.repeat(jnp.repeat(block, 8, axis=0), 8, axis=1)
        ys = jax.random.randint(ky, (200,), 0, SRC_H - 60)
        xs = jax.random.randint(kx, (200,), 0, SRC_W - 120)
        cols = jax.random.randint(kc, (200, 3), 0, 255, jnp.int32)

        def body(i, s):
            patch = jnp.broadcast_to(cols[i][None, None, :], (50, 100, 3))
            return jax.lax.dynamic_update_slice(s, patch, (ys[i], xs[i], 0))

        scene = jax.lax.fori_loop(0, 200, body, scene)
        return scene.astype(jnp.uint8)

    out = jax.jit(mk)(jax.random.PRNGKey(seed))
    jax.block_until_ready(out)
    return out


def make_frame_buffers(scene_u8, n_buffers: int = 4):
    """Pre-stage ``n_buffers`` distinct device-resident chunk buffers (the
    base scene broadcast over the chunk + per-frame brightness jitter),
    built by ONE jitted program each, BEFORE any timing starts.

    Round-4 postmortem (the 2x throughput 'regression'): the old harness
    computed ``base + jitter_fn(key)`` inside the timed loop. That ``+`` is
    an EAGER op — on the axon remote-device transport each eager dispatch
    costs ~100 ms, so the harness itself billed ~131 ms/chunk to the
    measurement (measured: fused program 173.5 ms/chunk via direct ._step
    calls vs 305 ms/chunk through the old loop — docs/KERNEL_NOTES.md).
    The driver's 316 ms/chunk capture was 174 ms of program + 131 ms of
    harness eager-add + fence slack. Pre-staging removes the harness from
    the measurement entirely; cycling 4 distinct buffers keeps the frames
    non-identical across chunks (real feature/matching occupancy) at 4 x
    796 MB = 3.2 GB HBM, well inside a v5e's 16 GB."""
    # scene_u8 MUST be a jit argument, not a closure: closed-over arrays
    # inline into the HLO as constants, and on the axon remote-compile
    # transport a multi-hundred-MB constant overflows the compile request
    # (HTTP 413).
    mk = jax.jit(
        lambda s, k: jnp.clip(
            s[None].astype(jnp.int16)
            + jax.random.randint(k, (CHUNK, 1, 1, 1), 0, 8, jnp.int16),
            0, 255,
        ).astype(jnp.uint8)
    )
    bufs = [mk(scene_u8, jax.random.PRNGKey(i)) for i in range(n_buffers)]
    for b in bufs:
        jax.block_until_ready(b)
    return bufs


def warmup(fx, bufs) -> float:
    """Four chunks: compile (one fused program) + dispatch handshake + two
    steady-state shakeout chunks. Two warmup chunks were not enough on this
    stack (r04: the 3-chunk stage-1 read 38% below steady state, VERDICT r4
    weak #4). Returns the warmup wall (dominated by XLA compile on a miss)."""
    fids = np.arange(1, CHUNK + 1)
    t0 = time.perf_counter()
    for i in range(4):
        out = fx.process_chunk(bufs[i % len(bufs)], fids + i * CHUNK, CHUNK)
        _fetch(out)
    return time.perf_counter() - t0


def run_fps(fx, bufs, n_chunks: int, chunk0: int = 4) -> float:
    """Timed chunks are chained device-side through the tracker-state carry
    (each dispatch consumes the previous state), so per-iteration fences are
    unnecessary — one value fetch at the end closes the chain honestly.
    Frames come from the pre-staged device buffers (no host work or eager
    ops inside the timed loop). ``chunk0`` offsets the frame ids so
    successive calls continue the video."""
    fids = np.arange(1, CHUNK + 1)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        out = fx.process_chunk(bufs[i % len(bufs)], fids + (chunk0 + i) * CHUNK, CHUNK)
    _fetch(out)
    return n_chunks * CHUNK / (time.perf_counter() - t0)


def _bench_scene(rng):
    scene = np.kron(
        rng.integers(30, 220, (SRC_H // 8, SRC_W // 8, 3)),
        np.ones((8, 8, 1)),
    ).astype(np.uint8)
    for _ in range(200):  # vehicle-scale bright/dark boxes
        y = int(rng.integers(0, SRC_H - 60))
        x = int(rng.integers(0, SRC_W - 120))
        scene[y:y + 50, x:x + 100] = rng.integers(0, 255, (3,))
    return scene


def bench_e2e(n_frames: int = 48, do_georef: bool = True,
              single_pass: bool = False) -> dict:
    """Encode a 4K clip, then run the real `extract` and `georeference` CLI
    stages on it (decode -> detect -> track -> stabilize -> georef).
    Returns stage wall times, e2e fps, and the registration px-RMSE.

    Compile-affordability contract (VERDICT r4 #2, missed four rounds): the
    extract stage runs the SAME config/model the headline warmed up — same
    HLO, served from the in-process/persistent compile cache — so the only
    cold compiles left are the georeference programs, and ``do_georef=False``
    drops even those to report an extract-only partial rather than nothing."""
    import argparse
    import logging
    import shutil
    import tempfile
    from pathlib import Path

    from geotrax_tpu.io.video import VideoReader, VideoWriter
    from geotrax_tpu.pipeline import _extract_impl, _georeference_impl

    logger = logging.getLogger("bench-e2e")
    logger.setLevel(logging.ERROR)
    work = Path(tempfile.mkdtemp(prefix="gtx_bench_"))
    rng = np.random.default_rng(42)
    scene = _bench_scene(rng)

    # ---- encode (first-party MPEG-4 encoder)
    t0 = time.perf_counter()
    source = work / "U_bench.mp4"
    writer = VideoWriter(source, BASELINE_FPS, SRC_W, SRC_H, fourcc="mp4v")
    for i in range(n_frames):
        f = scene.copy()
        x = (200 + 14 * i) % (SRC_W - 140)
        f[1000:1056, x:x + 120] = (235, 70, 40)     # moving "vehicle"
        f[1400:1448, (3000 - 9 * i) % (SRC_W - 110):][:, :96] = (60, 200, 240)
        writer.write(f)
    writer.close()
    t_encode = time.perf_counter() - t0

    # same fixed-seed checkpoint the headline ran (stable HLO -> cache hit)
    model_path = _bench_model_npz()

    import pandas as pd

    pd.DataFrame({
        "frame": range(n_frames),
        "timestamp": [
            f"2022-10-07 17:52:{13 + i // 30:02d}.{(i % 30) * 33:03d}"
            for i in range(n_frames)
        ],
    }).to_csv(source.with_suffix(".csv"), index=False)

    # ortho = 1024^2 center crop of frame 0: registration ground truth is a
    # pure translation by the crop offset
    from PIL import Image

    ox, oy = (SRC_W - 1024) // 2, (SRC_H - 1024) // 2
    ortho_dir = work / "ortho"
    ortho_dir.mkdir()
    Image.fromarray(scene[oy:oy + 1024, ox:ox + 1024]).save(ortho_dir / "U.png")
    (ortho_dir / "U.txt").write_text("126.66 37.39 1e-6 -1e-6\n")
    seg_dir = work / "seg"
    seg_dir.mkdir()
    (seg_dir / "U.csv").write_text(
        "section,lane,tlx,tly,blx,bly,brx,bry,trx,try\n"
        "1_2,1,0,0,0,1024,1024,1024,1024,0\n"
    )

    # the ONE shared bench config (see _bench_cfg_path): its fused-extract
    # program is already compiled and cached from the headline warmup
    cfg_path = _bench_cfg_path()

    # ---- extract (host decode + fused device pipeline)
    # First pass pays re-trace + compile-cache load only (the headline warmed
    # the identical HLO); any residual cold cost is reported separately. The
    # e2e fps is the WARM pass — the number a campaign's 2nd..Nth video sees
    # (reference scope: 20 intersections x many clips,
    # /root/reference/README.md:378-384).
    args = argparse.Namespace(
        source=source, cfg=str(cfg_path), output_folder=None, log_path=None,
        verbose=False, model=[str(model_path)], class_names=None, conf=None,
        classes=None, cut_frame_left=None, cut_frame_right=None,
        interpolate=False, show=None,
    )
    geo_args = argparse.Namespace(
        source=source, cfg=str(cfg_path), output_folder=None, log_path=None,
        verbose=False, ortho_folder=ortho_dir, geo_source=None, ref_frame=None,
        no_master=True, master_folder=None, recompute=None,
        segmentation_folder=seg_dir,
    )

    # host->device transfer rate probe: the extract stage ships every raw 4K
    # frame to the device (n_frames x 24.9 MB); on the axon stdio relay this
    # can be the e2e bottleneck (measured ~15 MB/s vs >10 GB/s on a real
    # PCIe host), so report the rate alongside so the stage split is
    # interpretable
    probe = np.zeros((2, SRC_H, SRC_W, 3), np.uint8)
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(probe))
    upload_mbps = probe.nbytes / 2**20 / max(time.perf_counter() - t0, 1e-9)

    t0 = time.perf_counter()
    _extract_impl.run_extraction(args, logger)
    t_extract_cold = time.perf_counter() - t0
    t_georef_cold = 0.0
    if do_georef:
        t0 = time.perf_counter()
        _georeference_impl.run_georeferencing(geo_args, logger)
        t_georef_cold = time.perf_counter() - t0

    if single_pass:
        # budget-constrained: report the first pass (includes residual
        # trace/cache-load cost) rather than running the stages twice
        t_extract, t_georef = t_extract_cold, t_georef_cold
    else:
        # warm pass: same stages, compiles served from the in-process/
        # persistent cache; overwrite the stage outputs so the accuracy
        # checks below read the timed run's artifacts
        shutil.rmtree(work / "results", ignore_errors=True)
        (work / "U_bench.yaml").unlink(missing_ok=True)
        t0 = time.perf_counter()
        _extract_impl.run_extraction(args, logger)
        t_extract = time.perf_counter() - t0
        t_georef = 0.0
        if do_georef:
            t0 = time.perf_counter()
            _georeference_impl.run_georeferencing(geo_args, logger)
            t_georef = time.perf_counter() - t0
    rmse = None
    if do_georef:

        # ---- registration accuracy: recovered H vs the known crop translation
        h_est = np.loadtxt(work / "results" / "U_bench_geo_transf.txt",
                           delimiter=",").reshape(3, 3)
        gx, gy = np.meshgrid(np.linspace(ox + 64, ox + 960, 8),
                             np.linspace(oy + 64, oy + 960, 8))
        pts = np.stack([gx.ravel(), gy.ravel(), np.ones(64)], axis=-1)
        mapped = pts @ h_est.T
        mapped = mapped[:, :2] / mapped[:, 2:3]
        truth = pts[:, :2] - np.asarray([ox, oy])
        rmse = float(np.sqrt(np.mean(np.sum((mapped - truth) ** 2, axis=-1))))

    csv_rows = 0
    csv_path = work / "results" / "U_bench.csv"
    if csv_path.exists():
        csv_rows = max(0, len(csv_path.read_text().splitlines()) - 1)

    # decode-only baseline for the stage split
    t0 = time.perf_counter()
    reader = VideoReader(source)
    for _ in reader:
        pass
    reader.close()
    t_decode = time.perf_counter() - t0

    shutil.rmtree(work, ignore_errors=True)
    e2e_fps = n_frames / (t_extract + t_georef)
    result = {
        "e2e_frames": n_frames,
        "e2e_fps": round(e2e_fps, 2),
        "e2e_upload_mbps": round(upload_mbps, 1),
        "e2e_stage_s": {
            "encode": round(t_encode, 2),
            "decode_only": round(t_decode, 2),
            "extract_decode_detect_track_stab": round(t_extract, 2),
            "georeference": round(t_georef, 2),
            "cold_extract_incl_compile": round(t_extract_cold, 2),
            "cold_georeference_incl_compile": round(t_georef_cold, 2),
        },
        "georef_csv_rows": csv_rows,
    }
    if rmse is not None:
        result["registration_rmse_px"] = round(rmse, 3)
    else:
        result["e2e_partial"] = "extract-only (georeference skipped on budget)"
    return result


def _emit(payload: dict) -> None:
    """Print one contract-JSON line, flushed so the supervisor relays it
    immediately even if this process is later killed mid-compile."""
    print(json.dumps(payload), flush=True)


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - T0)


def worker() -> None:
    """Staged measurement: headline first (printed the moment it exists),
    refinements and extras after, each stage gated on remaining budget."""
    _seed_compile_cache()
    # structured scene (8-px blocks + vehicle-like bright rectangles) so the
    # feature/matching/tracker stages run at realistic occupancy instead of
    # the trivial zero-match regime white noise produces — generated ON
    # DEVICE (uploading the host scene is 796 MB through the stdio relay)
    bufs = make_frame_buffers(device_scene())

    fx_stab = build(stabilize=True)
    t_compile = warmup(fx_stab, bufs)
    print(f"warmup (compile + handshake): {t_compile:.1f} s", file=sys.stderr)

    # ---- headline, stage 1: short measurement -> print IMMEDIATELY
    fps_quick = run_fps(fx_stab, bufs, n_chunks=3, chunk0=4)
    out = {
        "metric": "4k_extract_default_config_frames_per_sec_per_chip",
        "value": round(fps_quick, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_quick / BASELINE_FPS, 3),
        "headline_chunks": 3,
        "compile_warmup_s": round(t_compile, 1),
    }
    _emit(out)

    # ---- headline, stage 2: longer measurement for a steadier number
    if _remaining() > 60:
        fps_long = run_fps(fx_stab, bufs, n_chunks=10, chunk0=7)
        out.update({
            "value": round(fps_long, 2),
            "vs_baseline": round(fps_long / BASELINE_FPS, 3),
            "headline_chunks": 10,
            "stage1_fps": round(fps_quick, 2),
        })
        _emit(out)

    # ---- e2e chain on a real encoded clip, BEFORE the detect+track extra
    # (VERDICT r4 #1-missing: the e2e number has slipped four rounds running;
    # it now outranks every other extra). The extract stage reuses the
    # headline's compiled program (same config -> same HLO, see
    # _bench_cfg_path); only georeference may still compile cold, so gate
    # georef on a generous budget and fall back to an extract-only partial
    # rather than printing nothing.
    if _remaining() > 100:
        # gate sizes from measured cache-served costs (2026-08-20 real-chip
        # run): extract pass ~80-90 s (tunnel transfer-bound at ~15 MB/s),
        # georeference ~55 s first pass in-process / ~2 s warm, encode+decode
        # ~4 s. Two full passes with georef ~230 s; single-pass with georef
        # ~150 s; single-pass extract-only ~95 s.
        rem = _remaining()
        do_georef = rem > 170
        single_pass = rem < 300
        try:
            e2e = bench_e2e(do_georef=do_georef, single_pass=single_pass)
            print(f"e2e decode->georef: {e2e}", file=sys.stderr)
        except Exception as exc:  # the headline metric must always survive
            e2e = {"e2e_error": f"{type(exc).__name__}: {exc}"}
            print(f"e2e chain failed: {exc}", file=sys.stderr)
        out["4k_e2e_decode_to_georef_fps"] = e2e.get("e2e_fps")
        out.update(e2e)
        _emit(out)
    else:
        out["e2e_skipped"] = "insufficient budget remaining"
        _emit(out)

    # ---- extra: detect+track only (second fused program compile)
    if _remaining() > 150:
        fx_fast = build(stabilize=False)
        warmup(fx_fast, bufs)
        fps_detect = run_fps(fx_fast, bufs, n_chunks=6)
        out["detect_track_only_fps"] = round(fps_detect, 2)
        print(f"stabilize:false (detect+track only): {fps_detect:.2f} frames/s",
              file=sys.stderr)
        _emit(out)


def supervise() -> int:
    """Driver-facing entry: run the worker as a child under a hard deadline,
    relay its contract lines, and guarantee a final parseable line + exit 0."""
    import subprocess

    last_json = None
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True, bufsize=1,
        cwd=os.path.dirname(os.path.abspath(__file__)) or None,
    )

    import selectors

    sel = selectors.DefaultSelector()
    sel.register(child.stdout, selectors.EVENT_READ)
    buf = ""
    killed = False
    while True:
        left = DEADLINE_S - (time.monotonic() - T0)
        if left <= 0:
            child.kill()
            killed = True
            break
        if not sel.select(timeout=min(left, 5.0)):
            if child.poll() is not None:
                break
            continue
        data = child.stdout.readline()
        if data == "":
            if child.poll() is not None:
                break
            continue
        buf = data.rstrip("\n")
        if buf.startswith("{"):
            try:
                last_json = json.loads(buf)
                print(buf, flush=True)
            except json.JSONDecodeError:
                print(buf, file=sys.stderr)
        elif buf:
            print(buf, file=sys.stderr)
    try:
        child.wait(timeout=10)
    except subprocess.TimeoutExpired:
        child.kill()

    if killed:
        if last_json is not None:
            last_json["deadline_hit"] = True
            print(json.dumps(last_json), flush=True)
        else:
            # no measurement landed before the deadline: still emit a valid,
            # honest contract line so the round records the failure mode
            # instead of a null
            print(json.dumps({
                "metric": "4k_extract_default_config_frames_per_sec_per_chip",
                "value": 0.0,
                "unit": "frames/s",
                "vs_baseline": 0.0,
                "error": f"deadline {DEADLINE_S:.0f}s hit before the first "
                         "measurement (XLA compile-cache miss?)",
            }), flush=True)
    elif last_json is None:
        print(json.dumps({
            "metric": "4k_extract_default_config_frames_per_sec_per_chip",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"worker exited rc={child.returncode} without a measurement",
        }), flush=True)
    return 0


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        raise SystemExit(supervise())
