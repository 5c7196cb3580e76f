"""Interactive viewer CLI: serve a checkpoint (or a live training run) in the
browser.

The dearpygui-GUI equivalent entry point (reference: NeRFGUI via --gui in
main_nerf.py; here a web server — works headless/remote). Reference parity:

  - without --test, the viewer trains while you watch (NeRFGUI train mode,
    nerf/gui.py:89-111) on the scene's 'background' (or --objects_of_interest)
    object;
  - --test views the checkpoint only;
  - D-NeRF checkpoints get the time slider threaded through to the dynamic
    render path (dnerf/gui.py:289-295);
  - occupancy-trained checkpoints render through the accelerated marcher.

Usage:
  python -m focnerf_tpu.apps.viewer_app <scene> --workspace ws_background [--test]
"""

from __future__ import annotations

import os
import time

import numpy as np

from focnerf_tpu.config import parse_options


def _ctl(settings, occ_kwargs=None, aabb_ok=False):
    """Live control-panel values -> (bg_color, render kwargs, aabb).

    dt_gamma/max_steps apply only on occupancy-marched paths; aabb only
    where the staged renderer accepts one (ref gui.py:156-427 sliders).
    """
    import jax.numpy as jnp

    kw = dict(occ_kwargs or {})
    bg = 1.0
    aabb = None
    if settings:
        bg = float(settings.get("bg", 1.0))
        if kw.get("occ_bits") is not None or "dt_gamma" in kw:
            if settings.get("dt_gamma") is not None:
                kw["dt_gamma"] = float(settings["dt_gamma"])
            if settings.get("max_steps"):
                kw["max_steps"] = int(settings["max_steps"])
        if aabb_ok and settings.get("aabb"):
            aabb = jnp.asarray(settings["aabb"], jnp.float32)
    return bg, kw, aabb


def _view_only(opt):
    """Load a checkpoint for viewing; returns (render_fn, None)."""
    import jax.numpy as jnp

    from focnerf_tpu.models.dnerf import DNeRFConfig
    from focnerf_tpu.render.renderer import render_image
    from focnerf_tpu.train.checkpoints import (
        load_object_occupancy,
        load_object_params,
    )

    ckpt_dir = os.path.join(opt.workspace, "checkpoints")
    dyn_cache = os.path.join(
        opt.workspace, f"dynvoxel_{opt.bake_res}_sh{opt.bake_sh}.npz"
    )
    kp_cache = os.path.join(
        opt.workspace, f"kplanes_{opt.bake_res}_sh{opt.bake_sh}.npz"
    )
    if opt.baked and not os.path.isdir(ckpt_dir) and (
        os.path.exists(dyn_cache) or os.path.exists(kp_cache)
    ):
        # dynamic voxel workspace (main_voxel --voxel_dynamic / --voxel_kplanes):
        # collapse the factorized field at the slider's t, then shear-warp
        # render — collapse is dense einsums, so time-scrubbing stays
        # interactive
        from focnerf_tpu.render.baked import render_baked

        # when both families were trained into this workspace, serve the
        # NEWEST field — the latest training run wins, not a fixed priority
        newest_is_kp = os.path.exists(kp_cache) and (
            not os.path.exists(dyn_cache)
            or os.path.getmtime(kp_cache) >= os.path.getmtime(dyn_cache)
        )
        if newest_is_kp:
            from focnerf_tpu.train.voxel_kplanes import (
                kplanes_field_to_volume as dyn_field_to_volume,
                load_kplanes_field as _load,
            )

            dyn_cache = kp_cache
        else:
            from focnerf_tpu.train.voxel_dynamic import (
                dyn_field_to_volume,
                load_dyn_field as _load,
            )

        field, bound_l, sh_l = _load(dyn_cache)
        print(f"[viewer] loaded dynamic voxel field {dyn_cache}")

        def render_fn(pose, intrinsics, H, W, t, settings=None):
            bg, _, _ = _ctl(settings)
            try:
                vol = dyn_field_to_volume(field, float(t), bound_l, sh_l)
                img, _, _ = render_baked(
                    vol, pose, intrinsics, H, W, bg_color=bg,
                    density_scale=1.0,
                )
            except ValueError:  # camera inside the volume
                return np.ones((H, W, 3), np.float32)
            return np.asarray(img)

        return render_fn, None

    baked_cache = os.path.join(
        opt.workspace, f"baked_{opt.bake_res}_sh{opt.bake_sh}.npz"
    )
    if opt.baked and not os.path.isdir(ckpt_dir) and os.path.exists(baked_cache):
        # voxel-trained workspace (apps/main_voxel.py): there is no network
        # checkpoint, the volume IS the model
        from focnerf_tpu.render.baked import load_volume, render_baked

        # --bake_quantize serves the volume uint8-RESIDENT: 1/4 the HBM
        # bytes and per-frame read bandwidth (dequantized inside the fold)
        vol = load_volume(baked_cache, resident=opt.bake_quantize)
        print(f"[viewer] loaded voxel volume {baked_cache}"
              + (" (uint8-resident)" if opt.bake_quantize else ""))

        def render_fn(pose, intrinsics, H, W, t, settings=None):
            bg, _, _ = _ctl(settings)
            try:
                img, _, _ = render_baked(
                    vol, pose, intrinsics, H, W, bg_color=bg,
                    density_scale=1.0,
                )
            except ValueError:  # camera inside the volume
                return np.ones((H, W, 3), np.float32)
            return np.asarray(img)

        return render_fn, None

    params, cfg = load_object_params(ckpt_dir, None if os.path.exists(
        os.path.join(ckpt_dir, "model_config.json")) else opt.nerf_config())
    print(f"[viewer] loaded checkpoint from {ckpt_dir}")

    occ = load_object_occupancy(ckpt_dir, cfg) if opt.cuda_ray else None

    if isinstance(cfg, DNeRFConfig):
        import jax

        from focnerf_tpu.render.dnerf_renderer import (
            TimeOccupancyState,
            render_image_dnerf,
            time_occupancy_bitfield,
        )

        occ_kwargs = {}
        bits_at = None
        if isinstance(occ, TimeOccupancyState):
            # per-t bitfield slice of the time-axis grid (dnerf/renderer.py:286)
            bits_at = jax.jit(
                lambda t: time_occupancy_bitfield(occ, t, opt.density_thresh)
            )
            occ_kwargs = dict(
                dt_gamma=opt.dt_gamma, max_steps=opt.max_steps,
                slab=max(opt.train_slab, 64),
            )
            print("[viewer] occupancy-accelerated dnerf rendering on")

        def render_fn(pose, intrinsics, H, W, t, settings=None):
            bg, kw, _ = _ctl(settings, occ_kwargs)
            if bits_at is not None:
                kw["occ_bits"] = bits_at(jnp.asarray(t, jnp.float32))
            img, _ = render_image_dnerf(
                params, cfg, jnp.asarray(pose), intrinsics, H, W, t,
                num_steps=min(opt.num_steps, 128),
                max_ray_batch=opt.max_ray_batch,
                min_near=opt.min_near, bg_color=bg, **kw,
            )
            return np.asarray(img)

        return render_fn, None

    occ_kwargs = {}
    if occ is not None:
        from focnerf_tpu.ops.occupancy import occupancy_bitfield

        occ_kwargs = dict(
            occ_bits=occupancy_bitfield(occ, opt.density_thresh),
            dt_gamma=opt.dt_gamma, max_steps=opt.max_steps,
            slab=max(opt.train_slab, 64),
        )
        print("[viewer] occupancy-accelerated rendering on")

    obj_feat = jnp.zeros((cfg.yolo_feats_dim,)) if cfg.use_objfeat else None

    if opt.baked:
        # real-time path: bake once, every frame is a shear-warp render
        # (the TPU answer to the GUI's 200 ms frame budget, nerf/gui.py:134-140)
        from focnerf_tpu.render.baked import (
            bake_field, load_volume, render_baked, save_volume,
        )

        cache = os.path.join(
            opt.workspace, f"baked_{opt.bake_res}_sh{opt.bake_sh}.npz"
        )
        latest = max(
            (os.path.getmtime(os.path.join(ckpt_dir, d))
             for d in os.listdir(ckpt_dir)
             if os.path.isdir(os.path.join(ckpt_dir, d))),
            default=0.0,
        )
        vol = None
        if os.path.exists(cache) and os.path.getmtime(cache) >= latest:
            with np.load(cache) as z:
                cache_is_q = "q_payload" in z.files
            if cache_is_q and not opt.bake_quantize:
                # a uint8 cache re-encoded as fp16 would silently keep the
                # quantization loss while the format claims full precision
                # (ADVICE r2) — fall through and re-bake from the checkpoint
                print("[viewer] quantized cache + fp16 requested: re-baking")
            elif opt.bake_quantize and cache_is_q:
                # already uint8 on disk: serve it resident as-is
                vol = load_volume(cache, resident=True)
                print(f"[viewer] loaded baked volume cache {cache} "
                      "(uint8-resident)")
            else:
                vol = load_volume(cache)
                print(f"[viewer] loaded baked volume cache {cache}")
                if opt.bake_quantize:
                    # fp16 cache + uint8 requested: convert the full-
                    # precision data in place, then serve it resident
                    from focnerf_tpu.render.baked import quantize_volume

                    save_volume(cache, vol, quantize=True)
                    vol = quantize_volume(vol)
                    print("[viewer] re-saved cache as uint8 (resident)")
        if vol is None:
            t0 = time.time()
            vol = bake_field(
                params, cfg, resolution=opt.bake_res, obj_feat=obj_feat,
                occ_bits=occ_kwargs.get("occ_bits"), sh_degree=opt.bake_sh,
            )
            print(f"[viewer] baked {opt.bake_res}^3 volume in {time.time()-t0:.1f}s")
            save_volume(cache, vol, quantize=opt.bake_quantize)
            if opt.bake_quantize:
                from focnerf_tpu.render.baked import quantize_volume

                vol = quantize_volume(vol)  # serve uint8-resident
            if opt.bake_gate:
                from focnerf_tpu.core.camera import rand_poses
                from focnerf_tpu.render.bake_gate import bake_quality_report

                probe = rand_poses(
                    np.random.default_rng(0), 3, radius=max(opt.radius, 1.5)
                )
                f = 1.1 * 200
                rep = bake_quality_report(
                    params, cfg, vol, probe, (f, f, 100.0, 100.0), 200, 200,
                    obj_feat=obj_feat,
                    occ_bits=occ_kwargs.get("occ_bits"),
                    num_steps=min(opt.num_steps, 256),
                    out_path=os.path.join(opt.workspace, "bake_quality.json"),
                )
                print(
                    f"[bake-gate] baked-vs-exact "
                    f"{rep['psnr_baked_vs_exact_mean']} dB mean"
                )

        def render_fn(pose, intrinsics, H, W, t, settings=None):
            bg, _, _ = _ctl(settings)
            try:
                img, _, _ = render_baked(
                    vol, pose, intrinsics, H, W, bg_color=bg,
                    density_scale=cfg.density_scale,
                )
            except ValueError:
                # camera zoomed inside the volume: shear-warp undefined;
                # serve a flat frame instead of NaN garbage
                return np.ones((H, W, 3), np.float32)
            return np.asarray(img)

        return render_fn, None

    def render_fn(pose, intrinsics, H, W, t, settings=None):
        bg, kw, aabb = _ctl(settings, occ_kwargs, aabb_ok=True)
        img, _ = render_image(
            params, cfg, jnp.asarray(pose), intrinsics, H, W,
            num_steps=min(opt.num_steps, 128), max_ray_batch=opt.max_ray_batch,
            min_near=opt.min_near, obj_feat=obj_feat, bg_color=bg, aabb=aabb,
            **kw,
        )
        return np.asarray(img)

    return render_fn, None


def _train_while_viewing(opt):
    """Build dataset + Trainer; returns (render_fn, train_fn)."""
    import jax.numpy as jnp

    from focnerf_tpu.data.provider import NeRFDataset
    from focnerf_tpu.data.yolo_sidecar import load_sidecar
    from focnerf_tpu.render.renderer import render_image
    from focnerf_tpu.train.trainer import Trainer

    from focnerf_tpu.apps.main_nerf import detected_objects, mask_details_for

    sidecar = load_sidecar(opt.path, "train")
    obj = detected_objects(sidecar, opt)[0]
    train_ds = NeRFDataset(
        opt.dataset_options(), split="train",
        mask_details=mask_details_for(sidecar, obj), detected_object=obj,
    )
    trainer = Trainer(
        "ngp", opt.nerf_config(), workspace=f"{opt.workspace}_{obj}",
        lr=opt.lr, iters=opt.iters, num_steps=opt.num_steps,
        max_ray_batch=opt.max_ray_batch, use_occupancy=opt.cuda_ray,
        dt_gamma=opt.dt_gamma, max_steps=opt.max_steps,
        train_slab=opt.train_slab, density_thresh=opt.density_thresh,
        min_near=opt.min_near, use_checkpoint=opt.ckpt, seed=opt.seed,
    )
    print(f"[viewer] training object {obj!r} while viewing")
    obj_feat = (
        jnp.asarray(train_ds.obj_feats.mean(0))
        if train_ds.obj_feats is not None
        else (jnp.zeros((trainer.cfg.yolo_feats_dim,)) if trainer.cfg.use_objfeat else None)
    )

    def render_fn(pose, intrinsics, H, W, t, settings=None):
        kw = trainer._render_kwargs()  # routes through occupancy when trained with it
        kw["num_steps"] = min(opt.num_steps, 128)  # interactive budget
        bg, kw, aabb = _ctl(settings, kw, aabb_ok=True)
        img, _ = render_image(
            trainer.state.ema_params, trainer.cfg, jnp.asarray(pose),
            intrinsics, H, W, obj_feat=obj_feat, bg_color=bg, aabb=aabb, **kw,
        )
        return np.asarray(img)

    # control-panel buttons (ref gui.py save_mesh / checkpoint buttons)
    def _save_ckpt():
        trainer.save_checkpoint()
        return f"checkpoint saved @ step {int(trainer.state.step)}"

    def _save_mesh():
        trainer.save_mesh(resolution=128)
        return "mesh saved"

    actions = {"save_ckpt": _save_ckpt, "save_mesh": _save_mesh}
    return render_fn, lambda: trainer.train_step_once(train_ds), actions


def main(argv=None):
    from focnerf_tpu.viewer.server import ViewerState, run_viewer

    opt = parse_options(argv)
    actions = None
    if opt.test:
        render_fn, train_fn = _view_only(opt)
    else:
        try:
            render_fn, train_fn, actions = _train_while_viewing(opt)
        except FileNotFoundError as e:
            print(f"[viewer] no trainable scene ({e}); falling back to view-only")
            render_fn, train_fn = _view_only(opt)

    state = ViewerState(
        render_fn, W=opt.W // 2, H=opt.H // 2, train_fn=train_fn,
        max_spp=opt.max_spp, actions=actions,
    )
    run_viewer(state, port=int(os.environ.get("VIEWER_PORT", 7007)))


if __name__ == "__main__":
    main()
