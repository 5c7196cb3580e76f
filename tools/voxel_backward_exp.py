"""A/B the voxel-training backward schedule on the current backend.

PERF.md's round-2 close-out measured the dense-voxel train step at 3.4 s
(128^3 field, 800^2 supervision) and named the suspects: the reverse-mode
schedule of the R/32 compositing fold. This tool measures the candidate
fixes one at a time, each as ONE folded lax.fori_loop dispatch (per-step
python sync is artifact-dominated through the relay — PERF.md pitfalls):

  base       ri=2R, residual-saving scan backward (the measured 3.4 s)
  ri1        ri=R   (4x fewer intermediate pixels end-to-end)
  remat      ri=2R, jax.checkpoint over the block fold (recompute > HBM)
  ri1_remat  both
  fwd        forward-only step (no grad) — the timing floor
  gradint    grad of a loss on the INTERMEDIATE image (_composite_core
             only; excludes the final warp whose backward is an H*W
             overlapping bilinear scatter-add); constant target, timing-only
  int_real   the PRODUCT intermediate-supervision step (warped-GT targets +
             mask from warp_gt_to_intermediate — fit_voxels' default path)
  int_real_bN  same, but N poses vmapped per step (amortizes adam + TV
             over N renders; _bN must be the trailing suffix)
  dyn_real   the DYNAMIC family's product step (train/voxel_dynamic.py:
             rank-4 collapse einsum + the int_real schedule); append
             "remat" for jax.checkpoint over the fold
  vm_real    the VM-FACTORIZED family's product step (train/voxel_vm.py:
             rank --rank planes x vectors collapse + the int_real
             schedule); append "remat" likewise

For intermediate variants rays/s counts ri^2 supervised intermediate rays
per step (NOT H*W — the screen image never enters the loss).

Usage:
  python tools/voxel_backward_exp.py --res 128 --image 800 \
      [--variants base,ri1,remat,ri1_remat] [--fold 8]

Prints one JSON line per variant as soon as it's measured (compile can take
minutes through the relay; partial output survives a timeout).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    # the axon sitecustomize force-selects the TPU through jax.config,
    # which beats the env var (tests/conftest.py gotcha)
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--image", type=int, default=800)
    ap.add_argument("--fold", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--variants", type=str, default="base,ri1,remat,ri1_remat"
    )
    ap.add_argument("--rank", type=int, default=16, help="vm_real rank K")
    args = ap.parse_args()

    import optax

    from focnerf_tpu.core.camera import rand_poses
    from focnerf_tpu.render.baked import (
        BakedVolume,
        _composite_core,
        _render_core,
        render_baked,
        warp_gt_to_intermediate,
    )
    from focnerf_tpu.train.voxel import (
        _pose_variant,
        field_to_volume,
        init_voxel_field,
        tv_loss,
    )

    R = args.res
    c = (jnp.arange(R) + 0.5) / R * 2 - 1
    X, Y, Z = jnp.meshgrid(c, c, c, indexing="ij")
    d = jnp.sqrt(X**2 + Y**2 + Z**2)
    sigma = jnp.where(d < 0.45, 30.0, 0.0)
    stripes = 0.5 + 0.5 * jnp.sin(8 * jnp.arctan2(Y, X))
    rgb = jnp.stack([stripes, jnp.clip(Z + 0.5, 0, 1), 1 - stripes], -1)
    gt_vol = BakedVolume(rgba=jnp.concatenate([rgb, sigma[..., None]], -1), bound=1.0)

    H = W = args.image
    f = 1.25 * H
    intr = (f, f, H / 2.0, W / 2.0)
    all_poses = np.asarray(rand_poses(np.random.default_rng(0), 40, radius=2.5))
    key0 = _pose_variant(all_poses[0], 1.0)
    poses = np.stack([p for p in all_poses if _pose_variant(p, 1.0) == key0])[:8]
    axis, flip = key0
    P = poses.shape[0]

    gts = []
    for p in poses:
        img, _, _ = render_baked(gt_vol, p, intr, H, W)
        gts.append(img)
    gts = jnp.stack(gts)
    poses_dev = jnp.asarray(poses)
    intr_dev = jnp.asarray(intr, jnp.float32)
    jax.block_until_ready(gts)

    optimizer = optax.adam(5e-2)

    def make_fold(ri_mult: int, remat: bool, mode: str = "grad", nbatch: int = 1):
        ri = R * ri_mult

        if mode == "int_real":
            warped = [
                warp_gt_to_intermediate(
                    gts[v], poses_dev[v], intr_dev, 1.0,
                    axis=axis, flip=flip, ri=ri,
                )
                for v in range(P)
            ]
            wgts = jnp.stack([w for w, _ in warped])
            masks = jnp.stack([m for _, m in warped])

        def loss_fn(raw, pose, gt, mask):
            vol = field_to_volume(raw, 1.0, 0)
            if mode == "gradint":
                C, T, _, _ = _composite_core(
                    vol.rgba, 1.0, pose, axis=axis, flip=flip, ri=ri,
                    density_scale=1.0, remat=remat,
                )
                img_i = C + T[..., None]  # white bg, intermediate space
                mse = jnp.mean((img_i - 0.5) ** 2)  # timing-only target
                return mse + 1e-5 * tv_loss(raw), mse
            if mode == "int_real":
                C, T, _, _ = _composite_core(
                    vol.rgba, 1.0, pose, axis=axis, flip=flip, ri=ri,
                    density_scale=1.0, remat=remat,
                )
                img_i = C + T[..., None]
                m = mask[..., None]
                mse = jnp.sum(m * (img_i - gt) ** 2) / (
                    3.0 * jnp.maximum(jnp.sum(mask), 1.0)
                )
                return mse + 1e-5 * tv_loss(raw), mse
            img, _, _ = _render_core(
                vol.rgba, 1.0, pose, intr_dev, axis=axis, flip=flip,
                H=H, W=W, ri=ri, bg_color=1.0, density_scale=1.0,
                sh_deg=0, remat=remat,
            )
            mse = jnp.mean((img - gt) ** 2)
            return mse + 1e-5 * tv_loss(raw), mse

        def batched_loss(raw, poses_b, wgts_b, masks_b):
            vol = field_to_volume(raw, 1.0, 0)

            def one(pose, wgt, mask):
                C, T, _, _ = _composite_core(
                    vol.rgba, 1.0, pose, axis=axis, flip=flip, ri=ri,
                    density_scale=1.0, remat=remat,
                )
                img_i = C + T[..., None]
                m = mask[..., None]
                return jnp.sum(m * (img_i - wgt) ** 2) / (
                    3.0 * jnp.maximum(jnp.sum(mask), 1.0)
                )

            mse = jnp.mean(jax.vmap(one)(poses_b, wgts_b, masks_b))
            return mse + 1e-5 * tv_loss(raw), mse

        @jax.jit
        def fold(raw, opt_state, start):
            def body(i, carry):
                raw, opt_state, _ = carry
                v = (start + i) % P
                if nbatch > 1:
                    sel = (v * nbatch + jnp.arange(nbatch)) % P
                    (loss, mse), g = jax.value_and_grad(
                        batched_loss, has_aux=True
                    )(raw, poses_dev[sel], wgts[sel], masks[sel])
                    updates, opt_state = optimizer.update(g, opt_state)
                    return optax.apply_updates(raw, updates), opt_state, mse
                tgt = wgts[v] if mode == "int_real" else gts[v]
                msk = masks[v] if mode == "int_real" else jnp.ones((1, 1))
                if mode == "fwd":
                    _, mse = loss_fn(raw, poses_dev[v], tgt, msk)
                    # touch raw so the loop carry stays live
                    return raw + 0.0 * mse, opt_state, mse
                (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    raw, poses_dev[v], tgt, msk
                )
                updates, opt_state = optimizer.update(g, opt_state)
                return optax.apply_updates(raw, updates), opt_state, mse

            return jax.lax.fori_loop(
                0, args.fold, body, (raw, opt_state, jnp.float32(1.0))
            )

        return fold

    def make_vm_fold(ri_mult: int, remat: bool, rank: int):
        from focnerf_tpu.train.voxel_vm import vm_field_to_volume, vm_tv_loss

        ri = R * ri_mult
        warped = [
            warp_gt_to_intermediate(
                gts[v], poses_dev[v], intr_dev, 1.0, axis=axis, flip=flip, ri=ri
            )
            for v in range(P)
        ]
        wgts = jnp.stack([w for w, _ in warped])
        masks = jnp.stack([m for _, m in warped])

        def loss_fn(field, pose, wgt, mask):
            vol = vm_field_to_volume(field, 1.0, 0)
            C, T, _, _ = _composite_core(
                vol.rgba, 1.0, pose, axis=axis, flip=flip, ri=ri,
                density_scale=1.0, remat=remat,
            )
            img_i = C + T[..., None]
            m = mask[..., None]
            mse = jnp.sum(m * (img_i - wgt) ** 2) / (
                3.0 * jnp.maximum(jnp.sum(mask), 1.0)
            )
            return mse + 1e-5 * vm_tv_loss(field), mse

        @jax.jit
        def fold(field, opt_state, start):
            def body(i, carry):
                field, opt_state, _ = carry
                v = (start + i) % P
                (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    field, poses_dev[v], wgts[v], masks[v]
                )
                updates, opt_state = optimizer.update(g, opt_state)
                return optax.apply_updates(field, updates), opt_state, mse

            return jax.lax.fori_loop(
                0, args.fold, body, (field, opt_state, jnp.float32(1.0))
            )

        return fold

    def make_dyn_fold(ri_mult: int, remat: bool, rank: int = 4):
        from focnerf_tpu.train.voxel_dynamic import collapse_field

        ri = R * ri_mult
        warped = [
            warp_gt_to_intermediate(
                gts[v], poses_dev[v], intr_dev, 1.0, axis=axis, flip=flip, ri=ri
            )
            for v in range(P)
        ]
        wgts = jnp.stack([w for w, _ in warped])
        masks = jnp.stack([m for _, m in warped])
        times_dev = jnp.linspace(0.0, 1.0, P)

        def loss_fn(field, pose, t, wgt, mask):
            raw = collapse_field(field, t)
            vol = field_to_volume(raw, 1.0, 0)
            C, T, _, _ = _composite_core(
                vol.rgba, 1.0, pose, axis=axis, flip=flip, ri=ri,
                density_scale=1.0, remat=remat,
            )
            img_i = C + T[..., None]
            m = mask[..., None]
            mse = jnp.sum(m * (img_i - wgt) ** 2) / (
                3.0 * jnp.maximum(jnp.sum(mask), 1.0)
            )
            reg = 1e-5 * (
                tv_loss(field.base) + jnp.mean(jax.vmap(tv_loss)(field.deltas))
            )
            return mse + reg, mse

        @jax.jit
        def fold(field, opt_state, start):
            def body(i, carry):
                field, opt_state, _ = carry
                v = (start + i) % P
                (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    field, poses_dev[v], times_dev[v], wgts[v], masks[v]
                )
                updates, opt_state = optimizer.update(g, opt_state)
                return optax.apply_updates(field, updates), opt_state, mse

            return jax.lax.fori_loop(
                0, args.fold, body, (field, opt_state, jnp.float32(1.0))
            )

        return fold

    import re

    for variant in args.variants.split(","):
        m_ri = re.search(r"ri(\d+)", variant)
        ri_mult = int(m_ri.group(1)) if m_ri else 2
        remat = "remat" in variant
        mode = (
            "fwd" if variant.startswith("fwd")
            else "gradint" if variant.startswith("gradint")
            else "int_real" if variant.startswith("int_real")
            else "grad"
        )
        m_b = re.search(r"_b(\d+)$", variant)
        nbatch = int(m_b.group(1)) if m_b and mode == "int_real" else 1
        if variant.startswith("dyn_real"):
            from focnerf_tpu.train.voxel_dynamic import init_dyn_voxel_field

            fold = make_dyn_fold(ri_mult, remat)
            n_sup = (R * ri_mult) ** 2
            raw = init_dyn_voxel_field(R, rank=4, rng=jax.random.key(0))
        elif variant.startswith("vm_real"):
            from focnerf_tpu.train.voxel_vm import init_vm_field

            fold = make_vm_fold(ri_mult, remat, args.rank)
            n_sup = (R * ri_mult) ** 2
            raw = init_vm_field(R, rank=args.rank, rng=jax.random.key(0))
        else:
            fold = make_fold(ri_mult, remat, mode, nbatch)
            n_sup = (
                (R * ri_mult) ** 2 * nbatch
                if mode in ("gradint", "int_real")
                else H * W
            )
            raw = init_voxel_field(R, rng=jax.random.key(0))
        opt_state = optimizer.init(raw)
        t0 = time.time()
        raw, opt_state, mse = fold(raw, opt_state, jnp.int32(0))
        jax.block_until_ready(mse)
        compile_s = time.time() - t0
        times = []
        for rep in range(args.reps):
            t0 = time.time()
            raw, opt_state, mse = fold(raw, opt_state, jnp.int32(rep + 1))
            m = float(mse)  # scalar fetch forces completion
            times.append(time.time() - t0)
        per_step = min(times) / args.fold
        print(
            json.dumps(
                {
                    "variant": variant,
                    "step_ms": round(per_step * 1e3, 1),
                    "rays_per_sec": round(n_sup / per_step, 0),
                    "final_mse": round(m, 5),
                    "compile_s": round(compile_s, 1),
                    "res": R,
                    "image": args.image,
                    "fold": args.fold,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
