"""Inference-path benchmark: full-image render + K-object composition FPS.

Usage: python tools/render_bench.py [--res 256] [--objects 2] [--slab 64]
Prints JSON lines per configuration (train bench stays in bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench_baked(args):
    """Baked shear-warp path: bake K objects once, merge, render frames.

    The 30 FPS @ 800^2 4-object target (BASELINE.md) is measured here —
    per-frame cost is O(1) in K because objects merge at bake time."""
    from focnerf_tpu.core.camera import rand_poses
    from focnerf_tpu.models.nerf import NeRFConfig, init_nerf_params
    from focnerf_tpu.render.baked import (
        bake_field,
        merge_volumes,
        render_baked,
        shift_volume,
    )

    cfg = NeRFConfig(use_objfeat=False)
    H = W = args.res
    fx = 1.2 * W
    intr = (fx, fx, W / 2, H / 2)

    t0 = time.time()
    vols = []
    for i in range(args.objects):
        params = init_nerf_params(jax.random.key(i), cfg)
        v = bake_field(params, cfg, resolution=args.bake_res, sh_degree=args.bake_sh)
        vols.append(shift_volume(v, (0.5 * i - 0.25 * args.objects, 0.0, 0.0)))
    merged = merge_volumes(vols)
    if args.resident:
        from focnerf_tpu.render.baked import quantize_volume

        merged = quantize_volume(merged)
        jax.block_until_ready(merged.q)
    else:
        jax.block_until_ready(merged.rgba)
    bake_s = time.time() - t0
    print(json.dumps({
        "metric": f"bake_seconds_{args.bake_res}vox_{args.objects}obj",
        "value": round(bake_s, 2), "unit": "s",
    }))

    # distinct poses per frame (the tunneled-TPU relay dedups identical
    # dispatches -> fake sub-ms timings, PERF.md pitfalls), every frame
    # synced on device. Image fetch is excluded: d2h through the relay runs
    # at ~130 KB/s (measured 58 s for one 800^2 frame) — an environment
    # artifact, not a render cost; on a real host PCIe d2h of 7.7 MB is
    # sub-ms.
    poses = rand_poses(np.random.default_rng(0), 40, radius=2.5)
    # warm EVERY pose once: the timed poses must all hit a compiled
    # (axis, flip) variant — one cold ~30 s TPU compile inside the timed
    # loop reads as ~1.3 s/frame and buries the real 0.4-2 ms cost
    for p_ in poses:
        img, _, _ = render_baked(merged, p_, intr, H, W)
        jax.block_until_ready(img)
    t0 = time.time()
    n = 0
    for p_ in poses[12:36]:
        img, _, _ = render_baked(merged, p_, intr, H, W)
        jax.block_until_ready(img)
        n += 1
    dt = (time.time() - t0) / n
    print(json.dumps({
        "metric": f"baked_fps_{args.res}px_{args.objects}obj"
                  + (f"_sh{args.bake_sh}" if args.bake_sh else "")
                  + ("_uint8res" if args.resident else ""),
        "value": round(1.0 / dt, 2), "unit": "fps",
        "ms_per_frame": round(dt * 1000, 3),
        "bake_res": args.bake_res,
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--objects", type=int, default=2)
    p.add_argument("--slab", type=int, default=64)
    p.add_argument("--num_steps", type=int, default=128)
    p.add_argument("--baked", action="store_true")
    p.add_argument("--bake_res", type=int, default=256)
    p.add_argument("--bake_sh", type=int, default=0)
    p.add_argument("--resident", action="store_true",
                   help="render from a uint8-RESIDENT merged volume "
                        "(dequantized inside the fold; the 512^3 "
                        "read-bandwidth lever — VERDICT r2 item 5)")
    args = p.parse_args()

    if args.baked:
        bench_baked(args)
        return

    from focnerf_tpu.models.nerf import NeRFConfig, init_nerf_params
    from focnerf_tpu.ops.occupancy import occupancy_bitfield, init_occupancy
    from focnerf_tpu.render.compose import compose_image, stack_object_params
    from focnerf_tpu.render.renderer import render_rays_occupancy
    from focnerf_tpu.core.rays import get_rays

    cfg = NeRFConfig(use_objfeat=False)
    H = W = args.res
    fx = 1.2 * W
    pose = jnp.eye(4).at[2, 3].set(-2.5)
    rays = get_rays(pose, (fx, fx, W / 2, H / 2), H, W)

    # single-object occupancy render
    params = init_nerf_params(jax.random.key(0), cfg)
    gs = 128
    r = (jnp.arange(gs) + 0.5) / gs * 2 - 1
    X, Y, Z = jnp.meshgrid(r, r, r, indexing="ij")
    bits = ((X**2 + Y**2 + Z**2) < 0.45**2).reshape(1, -1)

    from focnerf_tpu.render.renderer import render_image
    from focnerf_tpu.ops.occupancy import occupancy_skip_field

    skip = occupancy_skip_field(bits)

    def render_occ(params, pose_):
        return render_image(
            params, cfg, pose_, (fx, fx, W / 2, H / 2), H, W,
            occ_bits=bits, occ_skip=skip, dt_gamma=1 / 128,
            max_steps=1024, slab=args.slab, max_ray_batch=65536, bg_color=1.0,
        )[0]

    img = render_occ(params, pose)
    jax.block_until_ready(img)
    t0 = time.time()
    img = render_occ(params, pose.at[2, 3].add(0.01))  # fresh pose: no dedup
    jax.block_until_ready(img)
    dt = time.time() - t0
    print(json.dumps({
        "metric": f"render_fps_{args.res}px_1obj_occ",
        "value": round(1.0 / dt, 3), "unit": "fps",
        "ms_per_frame": round(dt * 1000, 1),
    }))

    # K-object composition
    stacked = stack_object_params(
        [init_nerf_params(jax.random.key(i), cfg) for i in range(args.objects)]
    )
    feats = jnp.zeros((args.objects, cfg.yolo_feats_dim)) if cfg.use_objfeat else None

    # the uniform compose path needs ~2 KB HBM per (ray, step) for the hash
    # lookups of one chunk; keep chunks small enough to fit
    comp_chunk = min(65536, max(1024, (2 << 30) // (args.num_steps * 2048)))

    def render_comp(stacked, pose_):
        rgba, depth = compose_image(
            stacked, cfg, pose_, (fx, fx, W / 2, H / 2), H, W,
            feats, None, num_steps=args.num_steps, max_ray_batch=comp_chunk,
        )
        return rgba

    out = render_comp(stacked, pose)
    jax.block_until_ready(out)
    t0 = time.time()
    out = render_comp(stacked, pose.at[2, 3].add(0.01))
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(json.dumps({
        "metric": f"compose_fps_{args.res}px_{args.objects}obj",
        "value": round(1.0 / dt, 3), "unit": "fps",
        "ms_per_frame": round(dt * 1000, 1),
    }))


if __name__ == "__main__":
    main()
