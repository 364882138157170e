#!/usr/bin/env python3
"""Per-stage on-chip cost split of the fused extraction chunk step.

Times each stage of pipeline/device_pipeline.py's _chunk_impl in isolation
with a scan-chained protocol that is immune to this transport's two timing
traps (fire-ahead acks and eager-dispatch latency, docs/KERNEL_NOTES.md):
each measured program is ONE jitted dispatch that lax.scan's the stage over
NS distinct mini-batches (the scanned operand varies per step, so XLA
cannot hoist the stage out of the loop), accumulates a scalar from every
output, and is closed by a single host value fetch. Per-frame cost =
(wall - overhead) / frames, where overhead is the same scan+fetch skeleton
running a trivial stage.

Usage: python tools/profile_fused_stages.py [--frames-per-step 8]
       [--steps 8] [--features 2000] [--ref-features 4000] [--hyps 625]

Reference scope: the stage inventory mirrors what the reference runs per
frame through model.track() + stabilo (reference extract.py:145-197);
this tool is the measurement companion the reference lacks.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/geotrax_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

SRC_H, SRC_W = 2160, 3840
DS_H, DS_W = 1080, 1920


def fetch(x) -> float:
    return float(jnp.sum(x))


def timed_scan(op, stacked, warm: int = 1, reps: int = 3) -> float:
    """ONE jitted program: scan ``op`` over stacked[0..NS-1], accumulate a
    scalar; returns best wall seconds over ``reps`` timed runs."""

    @jax.jit
    def prog(xs):
        def body(s, x):
            out = op(x)
            return s + jnp.sum(out.astype(jnp.float32)) * 1e-20, None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return s

    for _ in range(warm):
        fetch(prog(stacked))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(prog(stacked))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-per-step", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--features", type=int, default=2000)
    ap.add_argument("--ref-features", type=int, default=4000)
    ap.add_argument("--hyps", type=int, default=625)
    ap.add_argument("--max-det", type=int, default=1000)
    args = ap.parse_args()

    from geotrax_tpu.ops import features as F
    from geotrax_tpu.ops.ransac import ransac_fit
    from geotrax_tpu.ops.resize import resize_u8_linear
    from geotrax_tpu.ops.sift import match_l2

    fps_, ns = args.frames_per_step, args.steps
    n_frames = fps_ * ns
    k, k2, hyps = args.features, args.ref_features, args.hyps

    # ---- stage inputs, all generated on device (nothing big crosses the
    # tunnel); per-step slices differ so scan steps cannot be collapsed
    @jax.jit
    def mk_frames(key):
        kb, kj = jax.random.split(key)
        block = jax.random.randint(kb, (SRC_H // 8, SRC_W // 8, 3), 30, 220, jnp.int32)
        scene = jnp.repeat(jnp.repeat(block, 8, 0), 8, 1).astype(jnp.uint8)
        jit_ = jax.random.randint(kj, (ns, fps_, 1, 1, 1), 0, 8, jnp.int32)
        return jnp.clip(scene[None, None].astype(jnp.int32) + jit_, 0, 255).astype(jnp.uint8)

    frames = mk_frames(jax.random.PRNGKey(0))  # (ns, fps, H, W, 3)
    jax.block_until_ready(frames)

    resized = jax.jit(
        lambda fr: jax.vmap(jax.vmap(lambda f: resize_u8_linear(f, DS_H, DS_W)))(fr)
    )(frames)
    grays = jax.jit(
        lambda r: jax.vmap(jax.vmap(F.rgb_to_gray))(r)
    )(resized)
    jax.block_until_ready(grays)

    @jax.jit
    def mk_boxes(key):
        kx, ky, kw, kh, kv = jax.random.split(key, 5)
        cx = jax.random.uniform(kx, (ns, fps_, args.max_det), minval=0, maxval=SRC_W)
        cy = jax.random.uniform(ky, (ns, fps_, args.max_det), minval=0, maxval=SRC_H)
        w = jax.random.uniform(kw, (ns, fps_, args.max_det), minval=30, maxval=140)
        h = jax.random.uniform(kh, (ns, fps_, args.max_det), minval=20, maxval=90)
        valid = jax.random.uniform(kv, (ns, fps_, args.max_det)) < 0.2  # ~200 real
        return jnp.stack([cx, cy, w, h], -1), valid

    det_boxes, det_valid = mk_boxes(jax.random.PRNGKey(1))

    # realistic keypoints/descriptors for the match/ransac stages: run the
    # real detect+describe once on step-0 frames
    @jax.jit
    def feats_of(gray, boxes, valid):
        mask = F.boxes_mask(gray.shape, jnp.where(valid[:, None], boxes, 0.0) * 0.5, 0.15)
        kp = F.fast_detect(gray, k, mask=mask, oriented=False)
        return kp.xy, F.describe_grid(gray, kp), kp.valid

    xy0, desc0, val0 = jax.vmap(feats_of)(grays[0], det_boxes[0], det_valid[0])
    kp_ref = jax.jit(lambda g: F.fast_detect(g, k2, oriented=False))(grays[0, 0])
    ref_desc = jax.jit(F.describe_grid)(grays[0, 0], kp_ref)
    ref_xy, ref_val = kp_ref.xy, kp_ref.valid
    jax.block_until_ready((xy0, desc0, val0, ref_desc))

    # descriptor sets per scan step (vary by step: re-derive from each step's
    # gray so matching inputs differ)
    desc_steps = jax.jit(
        lambda gs, bs, vs: jax.vmap(
            lambda g, b, v: jax.vmap(feats_of)(g, b, v)
        )(gs, bs, vs)
    )(grays, det_boxes, det_valid)
    xy_s, desc_s, val_s = desc_steps
    jax.block_until_ready(desc_s)

    rows: list[tuple[str, float]] = []

    def report(name, wall, frames_in_run=n_frames):
        per_frame = (wall - base_wall) / frames_in_run * 1e3
        rows.append((name, per_frame))
        print(f"{name:34s} {per_frame:8.3f} ms/frame  (wall {wall * 1e3:7.1f} ms)",
              flush=True)

    # ---- overhead baseline: same skeleton, trivial op
    base_wall = timed_scan(lambda x: x[..., :1, :1, 0].astype(jnp.float32), frames)
    print(f"{'scan+fetch overhead':34s} {'':8s}    (wall {base_wall * 1e3:7.1f} ms)",
          flush=True)

    # ---- stages
    report("resize 4K->1080p (u8 linear)", timed_scan(
        lambda fr: jax.vmap(lambda f: resize_u8_linear(f, DS_H, DS_W))(fr), frames))

    report("rgb->gray (1080p)", timed_scan(
        lambda r: jax.vmap(F.rgb_to_gray)(r), resized))

    report("boxes_mask (1000 slots)", timed_scan(
        lambda bv: jax.vmap(
            lambda b, v: F.boxes_mask((DS_H, DS_W), jnp.where(v[:, None], b, 0.0) * 0.5, 0.15)
        )(bv[0], bv[1] > 0),
        (det_boxes, det_valid.astype(jnp.int32))))

    def detect_stage(inp):
        g, b, v = inp
        return jax.vmap(
            lambda gg, bb, vv: F.fast_detect(
                gg, k,
                mask=F.boxes_mask((DS_H, DS_W), jnp.where(vv[:, None], bb, 0.0) * 0.5, 0.15),
                oriented=False,
            ).xy
        )(g, b, v)

    report("fast_detect 2000 (incl mask)", timed_scan(
        detect_stage, (grays, det_boxes, det_valid)))

    report("describe_grid (K=2000)", timed_scan(
        lambda inp: jax.vmap(
            lambda g, x, v: F.describe_grid(
                g, F.Keypoints(x, jnp.ones(k), jnp.zeros(k), v))
        )(inp[0], inp[1], inp[2]),
        (grays, xy_s, val_s)))

    report(f"match_l2 {k}x{k2}", timed_scan(
        lambda inp: jax.vmap(
            lambda d, v: match_l2(d, v, ref_desc, ref_val).idx_b
        )(inp[0], inp[1]),
        (desc_s, val_s)))

    # matches for ransac: real match of step descs vs ref
    m_idx, m_val = jax.jit(
        lambda ds, vs: jax.vmap(jax.vmap(
            lambda d, v: (lambda m: (m.idx_b, m.valid))(match_l2(d, v, ref_desc, ref_val))
        ))(ds, vs)
    )(desc_s, val_s)
    src_pts = jax.jit(lambda xs, mi: xs)(xy_s, m_idx)
    dst_pts = jax.jit(
        lambda mi: jax.vmap(jax.vmap(lambda i: ref_xy[i]))(m_idx)
    )(m_idx)
    jax.block_until_ready((src_pts, dst_pts, m_val))

    keys = jnp.reshape(
        jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(0), i))(
            jnp.arange(ns * fps_)), (ns, fps_, 2))

    report(f"ransac {hyps} hyps projective", timed_scan(
        lambda inp: jax.vmap(
            lambda s, d, v, kk: ransac_fit(
                s, d, v, threshold=2.0, key=kk, num_hypotheses=hyps,
                transformation="projective").h_matrix
        )(inp[0], inp[1], inp[2], inp[3]),
        (src_pts, dst_pts, m_val, keys)))

    total = sum(v for _, v in rows)
    print(f"\n{'stabilization-path total':34s} {total:8.3f} ms/frame "
          f"({total * 32:.1f} ms per 32-frame chunk)")
    print("(detect program measured separately: see docs/KERNEL_NOTES.md)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
