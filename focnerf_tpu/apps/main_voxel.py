"""Dense voxel-field training CLI (the gather-free TPU model family).

Trains a Plenoxels-style dense RGBA(+SH) field directly through the
differentiable shear-warp renderer (train/voxel.py) — no network, no hash
table, no per-sample random access — and writes the result as the
workspace's baked-volume cache, so the rest of the product consumes it
unchanged:

  python -m focnerf_tpu.apps.main_voxel data/scene --workspace ws_vox \
      --bake_res 128 --iters 500 [--bake_sh 2] [--voxel_c2f 3]
  python -m focnerf_tpu.apps.viewer_app data/scene --workspace ws_vox --baked

`--voxel_dynamic` trains the DYNAMIC dense family instead (train/voxel_dynamic.py:
low-rank time factorization over the dnerf provider's per-frame times),
writing dynvoxel_*.npz; validation renders collapse the field at each
view's own t.

`--voxel_vm K` trains the VM-FACTORIZED family (train/voxel_vm.py,
TensoRF-style rank-K planes x vectors — ~R/(3K)x fewer parameters),
writing vmfield_*.npz alongside the collapsed baked_*.npz.

No reference equivalent (the reference trains only through its per-sample
CUDA marcher); this is a new TPU-first family that shares the BakedVolume
runtime with composition/editing/viewing.
"""

from __future__ import annotations

import os
import time

import numpy as np

from focnerf_tpu.config import parse_options


def _save_volume_mesh(vol, path, density_thresh, tag):
    """Mesh the trained dense field (ref main_nerf.py:298 save_mesh).

    The iso threshold adapts downward to half the field's peak sigma when
    the configured --density_thresh would select nothing (dense-field sigma
    scales with the training step size, unlike the hash family's).
    """
    try:
        import numpy as _np

        from focnerf_tpu.utils.mesh_extract import mesh_from_volume, save_obj

        peak = float(_np.asarray(vol.rgba[..., -1]).max())
        thr = min(density_thresh, 0.5 * peak) if peak > 0 else density_thresh
        verts, faces = mesh_from_volume(vol, thr)
        save_obj(path, verts, faces)
        print(f"[{tag}] mesh: {len(verts)} verts / {len(faces)} faces -> {path}")
    except Exception as e:  # mesh export must never kill a training run
        print(f"[{tag}] WARN: mesh export failed: {e}")


def main(argv=None):
    opt = parse_options(argv)
    n_fam = (
        int(opt.voxel_dynamic) + int(opt.voxel_vm > 0)
        + int(opt.voxel_kplanes > 0)
    )
    if n_fam > 1:
        raise ValueError(
            "pick ONE family: --voxel_dynamic | --voxel_vm K | "
            "--voxel_kplanes K (or none for the dense field)"
        )
    if opt.voxel_sp:
        if opt.voxel_dynamic or opt.voxel_vm > 0:
            raise ValueError(
                "--voxel_sp shards the dense and K-planes families; drop "
                "--voxel_vm/--voxel_dynamic (their factorized params "
                "replicate — use the DP step)"
            )
        if opt.voxel_supervise != "intermediate":
            raise ValueError(
                "--voxel_sp trains with intermediate-plane supervision only "
                "(parallel/voxel_sp.py, parallel/kplanes_sp.py)"
            )
        if opt.voxel_kplanes > 0:
            import jax as _jax

            if opt.voxel_dp > 0:
                raise ValueError(
                    "--voxel_dp is the dense family's hybrid mesh; the "
                    "K-planes SP step shards the collapse over ALL local "
                    "devices — drop --voxel_dp"
                )
            _n_dev = len(_jax.devices())
            if opt.bake_res % _n_dev != 0:
                raise ValueError(
                    f"--bake_res {opt.bake_res} must divide evenly over "
                    f"the {_n_dev} local devices for collapse sharding"
                )
    os.makedirs(opt.workspace, exist_ok=True)

    import jax.numpy as jnp

    from focnerf_tpu.data.provider import DatasetOptions, NeRFDataset
    from focnerf_tpu.render.baked import render_baked, save_volume
    from focnerf_tpu.train.voxel import fit_voxels, fit_voxels_c2f

    ds_opt = DatasetOptions(
        path=opt.path, scale=opt.scale, offset=tuple(opt.offset),
        downscale=opt.downscale, num_rays=opt.num_rays,
    )
    if opt.voxel_dynamic or opt.voxel_kplanes > 0:
        from focnerf_tpu.data.dnerf_provider import DNeRFDataset as _DS
    else:
        _DS = NeRFDataset
    train_ds = _DS(ds_opt, split="train")
    try:
        val_ds = _DS(ds_opt, split="val")
    except Exception:
        val_ds = None

    imgs = np.asarray(train_ds.images, np.float32).reshape(
        train_ds.n_views, train_ds.H, train_ds.W, -1
    )
    if imgs.shape[-1] == 4:  # composite RGBA onto the background color
        a = imgs[..., 3:]
        imgs = imgs[..., :3] * a + 1.0 * (1.0 - a)

    t0 = time.time()
    if opt.voxel_dynamic or opt.voxel_kplanes > 0:
        if opt.voxel_supervise != "intermediate":
            raise ValueError(
                "--voxel_supervise is only implemented for the dense family; "
                "the dynamic families train with intermediate-plane "
                "supervision"
            )
        if opt.voxel_kplanes > 0:
            from focnerf_tpu.train.voxel_kplanes import (
                fit_kplanes,
                fit_kplanes_c2f,
                kplanes_field_to_volume,
                save_kplanes_field,
            )

            tag = "kplanes"
            kp_common = dict(
                seed=opt.seed,
                resolution=opt.bake_res, rank=opt.voxel_kplanes,
                time_res=opt.voxel_time_slots, bound=opt.bound,
                sh_degree=opt.bake_sh, iters=opt.iters, bg_color=1.0,
                time_smooth_weight=opt.voxel_time_smooth,
                log_every=max(opt.iters // 10, 1),
            )
            if not opt.voxel_sp:
                kp_common["steps_per_dispatch"] = opt.steps_per_dispatch
            if opt.voxel_sp:
                # collapse-sharded over all local devices (the dense grid a
                # device materializes is R_loc x R x R — parallel/kplanes_sp;
                # flag guards run fail-fast at the top of main)
                from focnerf_tpu.parallel.kplanes_sp import (
                    fit_kplanes_sp,
                    fit_kplanes_sp_c2f,
                )

                if opt.voxel_c2f > 1:
                    field, info = fit_kplanes_sp_c2f(
                        train_ds.poses, imgs, train_ds.times,
                        train_ds.intrinsics, stages=opt.voxel_c2f,
                        **kp_common,
                    )
                else:
                    field, info = fit_kplanes_sp(
                        train_ds.poses, imgs, train_ds.times,
                        train_ds.intrinsics, **kp_common,
                    )
                print(f"[kplanes] SP over {info['n_devices']} devices")
            elif opt.voxel_c2f > 1:
                field, info = fit_kplanes_c2f(
                    train_ds.poses, imgs, train_ds.times,
                    train_ds.intrinsics, stages=opt.voxel_c2f, **kp_common,
                )
            else:
                field, info = fit_kplanes(
                    train_ds.poses, imgs, train_ds.times,
                    train_ds.intrinsics, **kp_common,
                )
            cache = os.path.join(
                opt.workspace, f"kplanes_{opt.bake_res}_sh{opt.bake_sh}.npz"
            )
            save_kplanes_field(cache, field, opt.bound, opt.bake_sh)

            def dyn_field_to_volume(field, t, bound, sh):
                return kplanes_field_to_volume(field, t, bound, sh)

        else:
            from focnerf_tpu.train.voxel_dynamic import (
                dyn_field_to_volume,
                fit_dyn_voxels,
                save_dyn_field,
            )

            tag = "dynvoxel"
            field, info = fit_dyn_voxels(
                train_ds.poses, imgs, train_ds.times, train_ds.intrinsics,
                resolution=opt.bake_res, rank=opt.voxel_rank,
                time_slots=opt.voxel_time_slots, bound=opt.bound,
                sh_degree=opt.bake_sh, iters=opt.iters, bg_color=1.0,
                time_smooth_weight=opt.voxel_time_smooth,
                seed=opt.seed, log_every=max(opt.iters // 10, 1),
                steps_per_dispatch=opt.steps_per_dispatch,
            )
            cache = os.path.join(
                opt.workspace, f"dynvoxel_{opt.bake_res}_sh{opt.bake_sh}.npz"
            )
            save_dyn_field(cache, field, opt.bound, opt.bake_sh)
        print(
            f"[{tag}] {opt.iters} iters in {time.time()-t0:.1f}s — "
            f"train PSNR {info['psnr']:.2f} dB, {info['rays_per_sec']:.0f} rays/s"
        )
        print(f"[{tag}] saved {cache}")
        # time-conditioned mesh export (ref dnerf/utils.py:221-243): at
        # --mesh_t if given, else the t=0/1 motion brackets
        ts = [float(opt.mesh_t)] if opt.mesh_t is not None else [0.0, 1.0]
        for t in ts:
            _save_volume_mesh(
                dyn_field_to_volume(field, t, opt.bound, opt.bake_sh),
                os.path.join(opt.workspace, f"mesh_t{t:.2f}.obj"),
                opt.density_thresh, tag=tag,
            )
        if val_ds is not None and val_ds.images is not None:
            gts = np.asarray(val_ds.images, np.float32).reshape(
                val_ds.n_views, val_ds.H, val_ds.W, -1
            )
            if gts.shape[-1] == 4:
                a = gts[..., 3:]
                gts = gts[..., :3] * a + 1.0 * (1.0 - a)
            psnrs = []
            for v in range(val_ds.n_views):
                vol = dyn_field_to_volume(
                    field, float(val_ds.times[v]), opt.bound, opt.bake_sh
                )
                img, _, _ = render_baked(
                    vol, val_ds.poses[v], val_ds.intrinsics,
                    val_ds.H, val_ds.W, bg_color=1.0,
                )
                mse = float(jnp.mean((img - gts[v]) ** 2))
                psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
            print(
                f"[{tag}] val PSNR: {np.mean(psnrs):.2f} dB over "
                f"{len(psnrs)} views"
            )
            rank = opt.voxel_kplanes if tag == "kplanes" else opt.voxel_rank
            with open(os.path.join(opt.workspace, "log.txt"), "a") as f:
                f.write(
                    f"{tag} res={opt.bake_res} rank={rank} "
                    f"iters={opt.iters} val_psnr={np.mean(psnrs):.3f}\n"
                )
        return field

    if opt.voxel_vm > 0:
        if opt.voxel_supervise != "intermediate":
            raise ValueError(
                "--voxel_supervise is only implemented for the dense family; "
                "the VM family trains with intermediate-plane supervision"
            )
        from focnerf_tpu.train.voxel_vm import (
            fit_vm_c2f,
            fit_vm_voxels,
            load_vm_field,
            save_vm_field,
        )

        vm_path = os.path.join(
            opt.workspace, f"vmfield_{opt.bake_res}_r{opt.voxel_vm}.npz"
        )
        vm_common = dict(
            seed=opt.seed,
            resolution=opt.bake_res, rank=opt.voxel_vm, bound=opt.bound,
            sh_degree=opt.bake_sh, iters=opt.iters, bg_color=1.0,
            log_every=max(opt.iters // 10, 1),
            steps_per_dispatch=opt.steps_per_dispatch,
        )
        if os.path.exists(vm_path):  # warm-start (--ckpt latest semantics)
            prev, prev_bound, prev_sh = load_vm_field(vm_path)
            if prev_sh != opt.bake_sh or abs(prev_bound - opt.bound) > 1e-6:
                raise ValueError(
                    f"{vm_path} was trained with sh_degree={prev_sh} "
                    f"bound={prev_bound}; requested --bake_sh {opt.bake_sh} "
                    f"--bound {opt.bound}. The payload layout/geometry would "
                    "be misinterpreted — delete the checkpoint or match the "
                    "flags to warm-start."
                )
            print(f"[vmvoxel] resuming factors from {vm_path}")
            vol, info = fit_vm_voxels(
                train_ds.poses, imgs, train_ds.intrinsics,
                init_field=prev, **vm_common,
            )
        elif opt.voxel_c2f > 1:
            vol, info = fit_vm_c2f(
                train_ds.poses, imgs, train_ds.intrinsics,
                stages=opt.voxel_c2f, **vm_common,
            )
        else:
            vol, info = fit_vm_voxels(
                train_ds.poses, imgs, train_ds.intrinsics, **vm_common,
            )
        save_vm_field(vm_path, info["field"], opt.bound, opt.bake_sh)
    elif opt.voxel_sp:
        import jax

        from focnerf_tpu.parallel.voxel_sp import (
            fit_voxels_sp,
            fit_voxels_sp_c2f,
        )

        n_dev = len(jax.devices())
        n_slice = n_dev // opt.voxel_dp if opt.voxel_dp > 0 else n_dev
        if opt.bake_res % max(n_slice, 1) != 0:
            raise ValueError(
                f"--bake_res {opt.bake_res} must divide evenly over the "
                f"{n_slice} slice shards"
            )
        sp_common = dict(
            seed=opt.seed,
            resolution=opt.bake_res, bound=opt.bound,
            sh_degree=opt.bake_sh, iters=opt.iters,
            bg_color=1.0, log_every=max(opt.iters // 10, 1),
        )
        if opt.voxel_dp > 0:
            if opt.voxel_c2f > 1:
                raise ValueError(
                    "--voxel_dp does not stage yet; drop --voxel_c2f or "
                    "--voxel_dp"
                )
            if n_dev % opt.voxel_dp != 0:
                raise ValueError(
                    f"--voxel_dp {opt.voxel_dp} must divide the {n_dev} "
                    "local devices"
                )
            if opt.bake_res % (n_dev // opt.voxel_dp) != 0:
                raise ValueError(
                    f"--bake_res {opt.bake_res} must divide over the "
                    f"{n_dev // opt.voxel_dp} slice shards"
                )
            from focnerf_tpu.parallel.voxel_sp import fit_voxels_dp_sp

            vol, info = fit_voxels_dp_sp(
                train_ds.poses, imgs, train_ds.intrinsics,
                dp=opt.voxel_dp, **sp_common,
            )
            print(
                f"[dpspvoxel] trained on a {info['mesh']['data']}x"
                f"{info['mesh']['slice']} (data x slice) mesh"
            )
        elif opt.voxel_c2f > 1:
            vol, info = fit_voxels_sp_c2f(
                train_ds.poses, imgs, train_ds.intrinsics,
                stages=opt.voxel_c2f, **sp_common,
            )
        else:
            vol, info = fit_voxels_sp(
                train_ds.poses, imgs, train_ds.intrinsics, **sp_common,
            )
            print(f"[spvoxel] trained sharded over {info['n_devices']} devices")
    else:
        common = dict(
            seed=opt.seed,
            bound=opt.bound, sh_degree=opt.bake_sh, iters=opt.iters,
            bg_color=1.0, density_scale=1.0,
            log_every=max(opt.iters // 10, 1), supervise=opt.voxel_supervise,
            steps_per_dispatch=opt.steps_per_dispatch,
        )
        if opt.voxel_c2f > 1:
            vol, info = fit_voxels_c2f(
                train_ds.poses, imgs, train_ds.intrinsics,
                resolution=opt.bake_res, stages=opt.voxel_c2f, **common,
            )
        else:
            vol, info = fit_voxels(
                train_ds.poses, imgs, train_ds.intrinsics,
                resolution=opt.bake_res, **common,
            )
    print(
        f"[voxel] {opt.iters} iters in {time.time()-t0:.1f}s — "
        f"train PSNR {info['psnr']:.2f} dB, {info['rays_per_sec']:.0f} rays/s"
    )

    # the collapsed/dense volume is the product-facing artifact either way:
    # composition/editing/viewer consume it unchanged via --baked
    cache = os.path.join(
        opt.workspace, f"baked_{opt.bake_res}_sh{opt.bake_sh}.npz"
    )
    save_volume(cache, vol, quantize=opt.bake_quantize)
    print(f"[voxel] saved {cache}" + (" (uint8)" if opt.bake_quantize else ""))
    if opt.bake_quantize and opt.bake_gate:
        # voxel families: the trained field IS the volume, so the only bake
        # loss is quantization — measure it (render/bake_gate.py)
        from focnerf_tpu.render.baked import load_volume
        from focnerf_tpu.render.bake_gate import volume_quantization_report

        rep = volume_quantization_report(
            vol, load_volume(cache), train_ds.poses, train_ds.intrinsics,
            train_ds.H, train_ds.W,
            out_path=os.path.join(opt.workspace, "bake_quality.json"),
        )
        print(
            f"[bake-gate] quantized-vs-float "
            f"{rep['psnr_quantized_vs_float_mean']} dB mean"
        )
    _save_volume_mesh(
        vol, os.path.join(opt.workspace, "mesh.obj"), opt.density_thresh,
        tag="voxel",
    )

    if val_ds is not None and val_ds.images is not None:
        gts = np.asarray(val_ds.images, np.float32).reshape(
            val_ds.n_views, val_ds.H, val_ds.W, -1
        )
        if gts.shape[-1] == 4:
            a = gts[..., 3:]
            gts = gts[..., :3] * a + 1.0 * (1.0 - a)
        psnrs = []
        for v in range(val_ds.n_views):
            img, _, _ = render_baked(
                vol, val_ds.poses[v], val_ds.intrinsics, val_ds.H, val_ds.W,
                bg_color=1.0, density_scale=1.0,
            )
            mse = float(jnp.mean((img - gts[v]) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
        print(f"[voxel] val PSNR: {np.mean(psnrs):.2f} dB over {len(psnrs)} views")
        with open(os.path.join(opt.workspace, "log.txt"), "a") as f:
            f.write(
                f"voxel res={opt.bake_res} sh={opt.bake_sh} iters={opt.iters} "
                f"val_psnr={np.mean(psnrs):.3f}\n"
            )
    return vol


if __name__ == "__main__":
    main()
