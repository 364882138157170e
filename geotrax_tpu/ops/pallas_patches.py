"""Per-keypoint patch extraction as a Pallas TPU kernel.

The unoriented descriptor path needs a (PATCH x PATCH) neighborhood around
each of ~2000 keypoints per frame. The XLA block gather issues one DMA
descriptor chain per keypoint slice from HBM (~4.6 ms/frame at 1080p,
K=2000, dominated by DMA issue rate, not bytes). This kernel instead holds
the whole downsampled luma in VMEM (1080x1920 f32 = 8.3 MB of the ~16 MB
budget) and pulls each patch with VMEM-local vector loads — no per-patch
HBM traffic at all.

Mosaic constraints shape the inner loop: vector loads need (8,128)-aligned
starts and dynamic lane rotates need 128-multiple widths, so each patch is
read as the aligned (40,256) window containing it and the sub-window offset
is resolved with two in-register rotates. Keypoint coordinates stream
through SMEM in per-grid-step blocks (a whole-array scalar-prefetch of
thousands of coordinates overflows SMEM, and a corrupted offset turns into
an out-of-bounds DMA that wedges the chip — coordinates are also clamped
in-kernel for the same reason).

vmap-safe via the same custom_vmap/lax.map rule as pallas_fast (batched
ANY-memory-space BlockSpecs cannot lower; per-frame dispatch is fine since
each frame's extraction saturates the VPU on its own).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 32
BLK = 128  # keypoints per grid step (rank-1 SMEM blocks must be 128-multiples)
_WIN_H = PATCH + 8   # 8-aligned row window
_WIN_W = 256         # 128-aligned lane window (covers rx in [0,128) + 32)


def _make_kernel(max_ya: int, max_xa: int):
    def kernel(y0_ref, x0_ref, img_ref, out_ref):
        i = pl.program_id(0)

        def body(j, _):
            y0 = y0_ref[i, j]
            x0 = x0_ref[i, j]
            ya = jnp.clip((y0 // 8) * 8, 0, max_ya)
            xa = jnp.clip((x0 // 128) * 128, 0, max_xa)
            ry = y0 - ya
            rx = x0 - xa
            window = img_ref[pl.ds(pl.multiple_of(ya, 8), _WIN_H),
                             pl.ds(pl.multiple_of(xa, 128), _WIN_W)]
            # dynamic rotates want non-negative shifts: roll the complement
            window = pltpu.roll(window, (_WIN_H - ry) % _WIN_H, 0)
            window = pltpu.roll(window, (_WIN_W - rx) % _WIN_W, 1)
            out_ref[j] = window[:PATCH, :PATCH]
            return 0

        jax.lax.fori_loop(0, BLK, body, 0)

    return kernel


def extract_patches(img: jnp.ndarray, x0: jnp.ndarray, y0: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """(H,W) f32 image + (K,) int32 top-left corners -> (K,32,32) patches.

    Callers must pre-clip x0 to [0, W-32] and y0 to [0, H-32]."""
    if interpret:
        return _extract_patches_impl(img, x0, y0, interpret=True)
    return _extract_patches_vmappable(img, x0, y0)


@jax.custom_batching.custom_vmap
def _extract_patches_vmappable(img, x0, y0):
    return _extract_patches_impl(img, x0, y0, interpret=False)


@_extract_patches_vmappable.def_vmap
def _extract_patches_vmap_rule(axis_size, in_batched, img, x0, y0):
    img_b, x_b, y_b = in_batched
    if not img_b:
        img = jnp.broadcast_to(img, (axis_size,) + img.shape)
    if not x_b:
        x0 = jnp.broadcast_to(x0, (axis_size,) + x0.shape)
    if not y_b:
        y0 = jnp.broadcast_to(y0, (axis_size,) + y0.shape)
    out = jax.lax.map(
        lambda args: _extract_patches_impl(*args, interpret=False), (img, x0, y0)
    )
    return out, True


@partial(jax.jit, static_argnames=("interpret",))
def _extract_patches_impl(img, x0, y0, interpret: bool = False):
    h, w = img.shape
    k = x0.shape[0]
    k_pad = (-k) % BLK
    n_blocks = (k + k_pad) // BLK
    x0p = jnp.pad(x0, (0, k_pad)).astype(jnp.int32).reshape(n_blocks, BLK)
    y0p = jnp.pad(y0, (0, k_pad)).astype(jnp.int32).reshape(n_blocks, BLK)
    pad_h = (-h) % 8 + 8        # aligned 40-row window may extend past H
    pad_w = (-w) % 128 + 256    # aligned 256-lane window may extend past W
    img_p = jnp.pad(img.astype(jnp.float32), ((0, pad_h), (0, pad_w)))
    hp, wp = img_p.shape

    out = pl.pallas_call(
        _make_kernel(hp - _WIN_H, wp - _WIN_W),
        grid=(n_blocks,),
        in_specs=[
            # whole (n, BLK) coordinate tables in SMEM (per-block slices of
            # int32 arrays hit Mosaic's block-divisibility rules; a few KB
            # of coordinates fit SMEM outright), indexed by program_id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLK, PATCH, PATCH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k + k_pad, PATCH, PATCH), jnp.float32),
        interpret=interpret,
    )(y0p, x0p, img_p)
    return out[:k]
