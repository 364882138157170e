"""Convert/export detector checkpoints between formats.

Capability counterpart of the reference's train/export.sh (.pt ->
ONNX/TensorRT for GPU serving): here the serving target is the JAX/TPU
runtime, so export means torch .pt (ultralytics layout) -> native .npz with
folded BN, optional bf16 weight casting, and an optional AOT compile check
at the serving resolution.

The reverse direction also works: --format pt writes an ultralytics-layout
torch state-dict .pt (identity BN, exact round-trip through our converter)
so weights trained with train/ can be loaded into the reference stack via
DetectionModel.load_state_dict.

Usage:
  python tools/export_model.py weights.pt -o weights.npz [--bf16] [--check 1920]
  python tools/export_model.py trained.npz -o weights.pt --format pt
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from _common import *  # noqa: F401,F403


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("checkpoint", type=Path, help=".pt (torch) or .npz input")
    parser.add_argument("--out", "-o", type=Path, required=True)
    parser.add_argument("--bf16", action="store_true", help="Store weights as bfloat16")
    parser.add_argument("--check", type=int, default=None,
                        help="Compile-check the forward at this imgsz")
    parser.add_argument("--format", choices=("npz", "pt"), default=None,
                        help="Output format (default: from --out suffix)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from geotrax_tpu.models.convert import (
        export_ultralytics_state_dict,
        load_model,
        read_class_names,
        save_npz,
    )

    params, spec, names = load_model(args.checkpoint)
    fmt = args.format or ("pt" if args.out.suffix == ".pt" else "npz")
    if fmt == "pt":
        import torch

        sd = export_ultralytics_state_dict(
            jax.tree.map(lambda a: np.asarray(a, np.float32), params), spec
        )
        torch.save(
            {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
             "class_names": names,
             "variant": spec.variant, "nc": spec.nc},
            args.out,
        )
        print(f"yolov8{spec.variant} nc={spec.nc} -> ultralytics-layout "
              f"state-dict {args.out} ({len(sd)} tensors)")
        return 0
    if args.bf16:
        import ml_dtypes  # noqa: F401 — numpy bfloat16 support ships with jax

        params = jax.tree.map(lambda a: np.asarray(a, dtype="bfloat16"), params)
    save_npz(args.out, params, class_names=names,
             variant=spec.variant, nc=spec.nc, reg_max=spec.reg_max)
    n_params = sum(int(np.prod(np.shape(a))) for a in jax.tree.leaves(params))
    print(f"yolov8{spec.variant} nc={spec.nc} ({n_params / 1e6:.2f}M params) -> {args.out}")

    if args.check:
        from geotrax_tpu.models import yolov8

        size = -(-args.check // 32) * 32
        x = jnp.zeros((1, size, size, 3), jnp.float32)
        p = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float32)), params)
        boxes, probs = yolov8.forward(p, x, spec)
        jax.block_until_ready(boxes)
        print(f"compile check @ {size}: boxes {boxes.shape}, probs {probs.shape} OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
