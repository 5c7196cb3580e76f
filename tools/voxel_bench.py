"""Benchmark dense voxel training (train/voxel.py) on the current backend.

Self-contained: synthesizes a striped-sphere ground truth as a BakedVolume,
renders posed GT views with the shear-warp renderer (device-resident — the
relay's d2h is ~130 KB/s, never round-trip images through the host), then
fits a fresh field and reports effective supervised rays/s and held-out
PSNR as one JSON line.

Usage:
  python tools/voxel_bench.py [--res 128] [--image 800] [--iters 60]
      [--sync-every 1]   # per-step scalar fetch (honest relay timing)
      [--all-variants]   # don't restrict poses to one (axis, flip) compile
      [--dynamic]        # time-varying GT -> fit the low-rank dynamic family
      [--kplanes]        # time-varying GT -> fit the K-planes family
      [--vm]             # fit the VM-factorized family (rank --rank)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument(
        "--gt_res", type=int, default=0,
        help="GT volume resolution (default: --res; smaller keeps 512^3 "
        "field runs from spending HBM on the synthetic GT)",
    )
    ap.add_argument("--image", type=int, default=800)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--sync-every", type=int, default=1)
    ap.add_argument("--all-variants", action="store_true")
    ap.add_argument("--dynamic", action="store_true")
    ap.add_argument("--kplanes", action="store_true")
    ap.add_argument("--vm", action="store_true")
    ap.add_argument("--rank", type=int, default=4)
    args = ap.parse_args()
    if args.kplanes:
        args.dynamic = True  # time-varying GT + per-view times

    from focnerf_tpu.core.camera import rand_poses
    from focnerf_tpu.render.baked import BakedVolume, render_baked
    from focnerf_tpu.train.voxel import _pose_variant, fit_voxels

    R = args.res
    Rg = args.gt_res or R
    c = (jnp.arange(Rg) + 0.5) / Rg * 2 - 1
    X, Y, Z = jnp.meshgrid(c, c, c, indexing="ij")

    def gt_volume(t: float) -> BakedVolume:
        """Striped sphere; with --dynamic its center slides along x with t."""
        cx = (0.6 * t - 0.3) if args.dynamic else 0.0
        d = jnp.sqrt((X - cx) ** 2 + Y**2 + Z**2)
        sigma = jnp.where(d < 0.45, 30.0, 0.0)
        stripes = 0.5 + 0.5 * jnp.sin(8 * jnp.arctan2(Y, X - cx))
        rgb = jnp.stack([stripes, jnp.clip(Z + 0.5, 0, 1), 1 - stripes], -1)
        return BakedVolume(
            rgba=jnp.concatenate([rgb, sigma[..., None]], -1), bound=1.0
        )

    gt_vol = gt_volume(0.0)

    H = W = args.image
    f = 1.25 * H
    intr = (f, f, H / 2.0, W / 2.0)
    all_poses = np.asarray(rand_poses(np.random.default_rng(0), 60, radius=2.5))
    if args.all_variants:
        poses = all_poses[:14]
    else:
        key0 = _pose_variant(all_poses[0], 1.0)
        poses = np.stack(
            [p for p in all_poses if _pose_variant(p, 1.0) == key0]
        )[:14]

    times = np.linspace(0.0, 1.0, len(poses)).astype(np.float32)
    # hold-out (index 13) must sit inside the trained time range, not at the
    # t=1 extrapolation edge — swap it with a mid-range slot
    times[[7, 13]] = times[[13, 7]]
    gts = []
    for p, t in zip(poses, times):
        img, _, _ = render_baked(
            gt_volume(float(t)) if args.dynamic else gt_vol, p, intr, H, W
        )
        gts.append(img)
    gts = jnp.stack(gts)
    jax.block_until_ready(gts)

    t0 = time.time()
    if args.kplanes:
        from focnerf_tpu.train.voxel_kplanes import (
            fit_kplanes,
            kplanes_field_to_volume,
        )

        field, info = fit_kplanes(
            poses[:12], gts[:12], times[:12], intr, resolution=R,
            rank=args.rank, iters=args.iters, lr=0.03, tv_weight=1e-5,
            log_every=args.sync_every,
        )
        vol = kplanes_field_to_volume(field, float(times[13]), 1.0)
    elif args.dynamic:
        from focnerf_tpu.train.voxel_dynamic import (
            dyn_field_to_volume,
            fit_dyn_voxels,
        )

        field, info = fit_dyn_voxels(
            poses[:12], gts[:12], times[:12], intr, resolution=R,
            rank=args.rank, iters=args.iters, lr=0.08, tv_weight=1e-5,
            log_every=args.sync_every,
        )
        vol = dyn_field_to_volume(field, float(times[13]), 1.0)
    elif args.vm:
        from focnerf_tpu.train.voxel_vm import fit_vm_voxels

        vol, info = fit_vm_voxels(
            poses[:12], gts[:12], intr, resolution=R, rank=args.rank,
            iters=args.iters, lr=0.05, tv_weight=1e-5,
            log_every=args.sync_every,
        )
    else:
        vol, info = fit_voxels(
            poses[:12], gts[:12], intr, resolution=R, iters=args.iters,
            lr=0.08, tv_weight=1e-5, log_every=args.sync_every,
        )
    wall = time.time() - t0

    img, _, _ = render_baked(vol, poses[13], intr, H, W)
    mse = float(jnp.mean((img - gts[13]) ** 2))
    print(json.dumps({
        "metric": (
            "kplanes_" if args.kplanes
            else "dyn_" if args.dynamic
            else "vm_" if args.vm else ""
        ) + "voxel_train_rays_per_sec",
        "value": round(info["rays_per_sec"], 1),
        "unit": "rays/s",
        "train_psnr": round(info["psnr"], 2),
        "heldout_psnr": round(-10 * np.log10(max(mse, 1e-10)), 2),
        "iters": args.iters,
        "res": R,
        "image": args.image,
        "wall_incl_compile_s": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
