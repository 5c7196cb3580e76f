"""Scene composition CLI: fuse N per-object NeRFs along shared rays.

Parity target: COMBINED.py (reference). Per test view the reference reloads
every object checkpoint and materializes full [H*W, 512] fields per object
(:203-240, 592-618) — the cause of its >4-object OOM. Here all object params
load ONCE, stay in HBM, and the compositor streams a running max-density
fusion (render/compose.py), so object count is memory-free.

Outputs mirror the reference (:403-423, 636-665): composited RGBA renders on
white and black backgrounds under rgbs_w/ depth_w/ rgbs_b/ depth_b/
ground_truth_{w,b}/, per-view PSNR/SSIM (+LPIPS when available) and timing
lines appended to <workspace>/log.txt, and a summary block at the end.

Usage:
  python -m focnerf_tpu.apps.combined <scene> --ckpt_dir <dir with workspace_<obj>> \
      --objects_of_interest book cup --workspace combined_ws
"""

from __future__ import annotations

import os
import time
from typing import Dict, List

import numpy as np

from focnerf_tpu.config import Options, parse_options


def _baked_cache_name(opt: Options) -> str:
    return f"baked_{opt.bake_res}_sh{opt.bake_sh}.npz"


def _object_kind(ws_dir: str, opt: Options) -> str:
    """"ckpt" (network checkpoint), "volume" (voxel-trained, main_voxel),
    or "" (not an object workspace)."""
    ckpt = os.path.join(ws_dir, "checkpoints")
    # a real object workspace carries the self-describing model config
    # (written at train time); bare orbax-created dirs are skipped
    if os.path.isdir(ckpt) and os.path.exists(
        os.path.join(ckpt, "model_config.json")
    ):
        return "ckpt"
    if os.path.exists(os.path.join(ws_dir, _baked_cache_name(opt))):
        return "volume"
    return ""


def discover_objects(opt: Options) -> List[str]:
    """Find workspace_<obj> directories holding either network checkpoints
    (main_nerf flow, gather_checkpoints parity) or a trained voxel volume
    (main_voxel flow — composable via --baked)."""
    root = opt.ckpt_dir or "."
    objs = []
    for name in sorted(os.listdir(root)):
        if "_" not in name:
            continue
        obj = name.rsplit("_", 1)[-1]
        if _object_kind(os.path.join(root, name), opt):
            if not opt.objects_of_interest or obj in opt.objects_of_interest:
                objs.append(obj)
    return objs


def load_composition(opt: Options, feats_mode: str = "avg", test_poses=None):
    """Load all object params once (resident in HBM) + per-object features.

    feats_mode:
      - "avg": plain mean over training views per object
        (calculate_avg_feats_inference, COMBINED.py:701) → obj_feats [K, F];
      - "pose": inverse-pose-distance-weighted synthesis per test pose
        (calculate_feats2_inference, editable.py:781) → obj_feats [T, K, F]
        (requires test_poses [T, 4, 4]).
    """
    from focnerf_tpu.render.compose import stack_object_params
    from focnerf_tpu.train.checkpoints import (
        gather_obj_feats,
        load_object_occupancy,
        load_object_params,
    )

    objs = discover_objects(opt)
    if not objs:
        raise SystemExit(f"no object checkpoints found under {opt.ckpt_dir!r}")
    root = opt.ckpt_dir or "."
    prefix = _ws_prefix(opt)
    cfg = None
    params_list = []
    occ_list = []
    # voxel-trained objects (main_voxel workspaces) carry no network — they
    # join the composition as pre-baked volumes (obj -> npz path), --baked only
    vol_paths: Dict[str, str] = {}
    for obj in objs:
        ws_dir = os.path.join(root, f"{prefix}_{obj}")
        if _object_kind(ws_dir, opt) == "volume":
            vol_paths[obj] = os.path.join(ws_dir, _baked_cache_name(opt))
            print(f"[combined] {obj}: voxel volume {vol_paths[obj]}")
            continue
        ckpt_dir = os.path.join(ws_dir, "checkpoints")
        params, cfg = load_object_params(ckpt_dir, cfg or opt.nerf_config())
        params_list.append(params)
        occ_list.append(load_object_occupancy(ckpt_dir, cfg))
        print(f"[combined] loaded {obj}")
    if cfg is None:
        cfg = opt.nerf_config()
    stacked = stack_object_params(params_list) if params_list else None
    # per-object occupancy grids -> stacked bitfields (None if any object
    # trained without a grid; the compositor then uses uniform sampling)
    stacked_occ = None
    if params_list and all(o is not None for o in occ_list):
        import jax.numpy as jnp

        from focnerf_tpu.ops.occupancy import occupancy_bitfield

        stacked_occ = jnp.stack(
            [occupancy_bitfield(o, opt.density_thresh) for o in occ_list]
        )

    obj_feats = None
    if cfg.use_objfeat and params_list:
        obj_feats = composition_feats(
            objs,
            gather_obj_feats(root),
            cfg.yolo_feats_dim,
            feats_mode=feats_mode,
            test_poses=test_poses,
        )
    return objs, cfg, stacked, obj_feats, stacked_occ, vol_paths


def composition_feats(
    objs: List[str],
    feat_paths: List[str],
    feat_dim: int,
    feats_mode: str = "avg",
    test_poses=None,
):
    """Per-object conditioning features for composition.

    "avg" → [K, F] (calculate_avg_feats_inference, COMBINED.py:701);
    "pose" → [T, K, F] (calculate_feats2_inference, editable.py:781).
    """
    import jax.numpy as jnp

    from focnerf_tpu.data.feats import (
        calculate_avg_feats_inference,
        calculate_feats2_inference,
    )

    zeros = np.zeros(feat_dim, np.float32)
    if feats_mode == "pose":
        if test_poses is None:
            raise ValueError("feats_mode='pose' requires test_poses [T, 4, 4]")
        by_obj = calculate_feats2_inference(np.asarray(test_poses), feat_paths)
        T = len(test_poses)
        return jnp.asarray(  # [T, K, F]
            np.stack([by_obj.get(o, np.tile(zeros, (T, 1))) for o in objs], axis=1)
        )
    if feats_mode != "avg":
        raise ValueError(f"unknown feats_mode {feats_mode!r}")
    by_obj = calculate_avg_feats_inference(feat_paths)
    return jnp.asarray(np.stack([by_obj.get(o, zeros) for o in objs]))  # [K, F]


def _ws_prefix(opt: Options) -> str:
    # object workspaces are "<workspace>_<obj>" next to ckpt_dir (main_nerf flow)
    candidates = [
        n.rsplit("_", 1)[0]
        for n in os.listdir(opt.ckpt_dir or ".")
        if "_" in n and _object_kind(os.path.join(opt.ckpt_dir or ".", n), opt)
    ]
    return candidates[0] if candidates else "workspace"


def evaluate_composition(
    opt: Options, offsets=None, write_video: bool = False,
    feats_mode: str = "avg", rotations=None,
):
    import jax
    import jax.numpy as jnp

    from focnerf_tpu.data.provider import NeRFDataset
    from focnerf_tpu.render.compose import compose_image
    from focnerf_tpu.train.meters import LPIPSMeter, PSNRMeter, SSIMMeter

    from focnerf_tpu.render.compose import union_occupancy_bits

    dataset = NeRFDataset(opt.dataset_options(), split="val")
    objs, cfg, stacked, obj_feats, stacked_occ, vol_paths = load_composition(
        opt, feats_mode=feats_mode, test_poses=dataset.poses
    )
    if vol_paths and not opt.baked:
        raise SystemExit(
            f"voxel-trained objects {sorted(vol_paths)} have no network to "
            "march per sample — compose them with --baked"
        )

    rot_mats = None
    if rotations is not None and np.any(np.asarray(rotations)):
        from focnerf_tpu.render.compose import rotation_matrices

        rot_mats = rotation_matrices(rotations)
    baked_vol = None
    if opt.baked:
        # bake once, merge by max density, render every view in real time
        # (render/baked.py; replaces the per-sample path below). Voxel-trained
        # objects load their trained volume directly instead of baking.
        from focnerf_tpu.render.baked import (
            BakedVolume,
            bake_field,
            load_volume,
            merge_volumes,
            shift_volume,
        )

        avg_feats = obj_feats if (obj_feats is None or obj_feats.ndim == 2) else jnp.mean(obj_feats, 0)
        t0 = time.time()
        vols = []
        ki = 0  # position in the ckpt-object stack (volume objs excluded)
        for k, obj in enumerate(objs):
            if obj in vol_paths:
                vol = load_volume(vol_paths[obj])
                if vol.sh_deg != opt.bake_sh or vol.rgba.shape[0] != opt.bake_res:
                    raise SystemExit(
                        f"{vol_paths[obj]} is {vol.rgba.shape[0]}^3/sh{vol.sh_deg}"
                        f" but the composition is {opt.bake_res}^3/sh"
                        f"{opt.bake_sh} — retrain or match --bake_res/--bake_sh"
                    )
                if cfg.density_scale != 1.0:
                    # voxel fields train at density_scale 1; the composed
                    # render multiplies by cfg.density_scale — neutralize
                    vol = BakedVolume(
                        rgba=vol.rgba.at[..., -1].divide(cfg.density_scale),
                        bound=vol.bound, sh_deg=vol.sh_deg,
                    )
            else:
                pk = jax.tree.map(lambda a: a[ki], stacked)
                feats_k = None if avg_feats is None else avg_feats[k]
                occ_k = None if stacked_occ is None else stacked_occ[ki]
                vol = bake_field(
                    pk, cfg, resolution=opt.bake_res,
                    obj_feat=feats_k, occ_bits=occ_k, sh_degree=opt.bake_sh,
                )
                if opt.bake_gate:
                    # the bake's quality cost is measured per object at
                    # every bake, never assumed (render/bake_gate.py)
                    from focnerf_tpu.render.bake_gate import bake_quality_report

                    gate_path = os.path.join(
                        opt.ckpt_dir or ".", f"{_ws_prefix(opt)}_{obj}",
                        "bake_quality.json",
                    )
                    rep = bake_quality_report(
                        pk, cfg, vol, dataset.poses, dataset.intrinsics,
                        dataset.H, dataset.W, obj_feat=feats_k,
                        occ_bits=occ_k, num_steps=min(opt.num_steps, 256),
                        out_path=gate_path,
                    )
                    print(
                        f"[bake-gate] {obj}: baked-vs-exact "
                        f"{rep['psnr_baked_vs_exact_mean']} dB mean / "
                        f"{rep['psnr_baked_vs_exact_min']} dB min -> {gate_path}"
                    )
                ki += 1
            if rotations is not None and np.any(np.asarray(rotations[k])):
                # rotate about the object's own center, THEN translate
                from focnerf_tpu.render.baked import rotate_volume

                for ax_i, dg in enumerate(np.asarray(rotations[k])):
                    if float(dg):
                        vol = rotate_volume(vol, ax_i, float(dg))
            if offsets is not None:
                # compose offsets query the field at x+off -> scene pos -off
                vol = shift_volume(vol, -np.asarray(offsets[k]))
            vols.append(vol)
        baked_vol = merge_volumes(vols)
        if opt.bake_quantize:
            # serve the merged scene uint8-resident: 1/4 the per-view read
            # bandwidth; dequantization happens inside the compositing fold
            from focnerf_tpu.render.baked import quantize_volume

            baked_vol = quantize_volume(baked_vol)
            jax.block_until_ready(baked_vol.q)
        else:
            jax.block_until_ready(baked_vol.rgba)
        msg = f"[baked] {len(objs)} objects baked+merged at {opt.bake_res}^3 in {time.time()-t0:.1f}s"
        print(msg)
    # march on the union of object occupancies (occ-accelerated composition)
    occ_kwargs = {}
    if rot_mats is not None and stacked_occ is not None and baked_vol is None:
        print(
            "[combined] rotation edit active: the union occupancy bitfield "
            "ignores rotation — using uniform sampling for this run"
        )
        stacked_occ = None
    if stacked_occ is not None and baked_vol is None:
        # per-sample path only (and then objs == ckpt objs, so the offset
        # alignment with the stacked bitfields is exact)
        occ_kwargs = dict(
            occ_bits=union_occupancy_bits(stacked_occ, offsets, cfg.bound),
            dt_gamma=opt.dt_gamma,
            max_steps=opt.max_steps,
            slab=max(opt.train_slab, 64),
        )

    ws = opt.workspace
    for sub in ("rgbs_w", "depth_w", "rgbs_b", "depth_b", "ground_truth_w", "ground_truth_b"):
        os.makedirs(os.path.join(ws, sub), exist_ok=True)
    log_path = os.path.join(ws, "log.txt")

    aabb = None
    if opt.bound_inf is not None:
        aabb = jnp.asarray(opt.bound_inf, jnp.float32)

    meters = {
        "w": (PSNRMeter(), SSIMMeter(), LPIPSMeter()),
        "b": (PSNRMeter(), SSIMMeter(), LPIPSMeter()),
    }
    import imageio.v2 as imageio

    frames = []
    for v in range(dataset.n_views):
        view = dataset.eval_view(v)
        # pose mode synthesizes distinct features per test view ([T, K, F])
        feats_v = obj_feats if (obj_feats is None or obj_feats.ndim == 2) else obj_feats[v]
        t0 = time.time()
        if baked_vol is not None:
            from focnerf_tpu.render.baked import render_baked

            img_p, depth, alpha_b = render_baked(
                baked_vol, view["pose"], dataset.intrinsics,
                dataset.H, dataset.W, bg_color=0.0,
                density_scale=cfg.density_scale,
            )
            rgba = jnp.concatenate([img_p, alpha_b[..., None]], -1)
        else:
            rgba, depth = compose_image(
                stacked, cfg, jnp.asarray(view["pose"]), dataset.intrinsics,
                dataset.H, dataset.W, feats_v, offsets, rot_mats,
                num_steps=opt.num_steps, max_ray_batch=opt.max_ray_batch,
                bg_color=0.0, aabb=aabb, min_near=opt.min_near, **occ_kwargs,
            )
        rgba = np.asarray(jax.block_until_ready(rgba))
        dt = time.time() - t0

        rgb, alpha = rgba[..., :3], rgba[..., 3:]
        img_w = np.clip(rgb + (1 - alpha) * 1.0, 0, 1)
        img_b = np.clip(rgb, 0, 1)
        depth_n = np.asarray(depth)
        depth_img = depth_n / max(depth_n.max(), 1e-6)

        imageio.imwrite(os.path.join(ws, "rgbs_w", f"{v:04d}.png"), (img_w * 255).astype(np.uint8))
        imageio.imwrite(os.path.join(ws, "rgbs_b", f"{v:04d}.png"), (img_b * 255).astype(np.uint8))
        for sub in ("depth_w", "depth_b"):
            imageio.imwrite(
                os.path.join(ws, sub, f"{v:04d}.png"), (depth_img * 255).astype(np.uint8)
            )
        frames.append((img_b * 255).astype(np.uint8))

        line = f"view {v}: {dt*1000:.1f} ms"
        if "pixels" in view:
            gt = np.asarray(view["pixels"]).reshape(dataset.H, dataset.W, -1)
            if gt.shape[-1] == 4:
                gt_w = gt[..., :3] * gt[..., 3:] + (1 - gt[..., 3:])
                gt_b = gt[..., :3] * gt[..., 3:]
            else:
                gt_w = gt_b = gt
            imageio.imwrite(
                os.path.join(ws, "ground_truth_w", f"{v:04d}.png"),
                (np.clip(gt_w, 0, 1) * 255).astype(np.uint8),
            )
            imageio.imwrite(
                os.path.join(ws, "ground_truth_b", f"{v:04d}.png"),
                (np.clip(gt_b, 0, 1) * 255).astype(np.uint8),
            )
            for bg, img, gti in (("w", img_w, gt_w), ("b", img_b, gt_b)):
                for m in meters[bg]:
                    m.update(img, gti)
            line += (
                f" | PSNR_w {meters['w'][0].vals[-1]:.2f}"
                f" | PSNR_b {meters['b'][0].vals[-1]:.2f}"
            )
        print(line)
        with open(log_path, "a") as f:
            f.write(line + "\n")

    summary = ["==== composition summary ====", f"objects: {objs}"]
    for bg in ("w", "b"):
        summary.append(
            f"bg={bg}: " + " | ".join(m.report() for m in meters[bg])
        )
    with open(log_path, "a") as f:
        f.write("\n".join(summary) + "\n")
    print("\n".join(summary))

    if write_video and len(frames) > 1:
        from focnerf_tpu.utils.video import write_video as _wv

        _wv(os.path.join(ws, "composite.mp4"), frames, fps=10)
    return frames


def main(argv=None):
    opt = parse_options(argv)
    os.makedirs(opt.workspace, exist_ok=True)
    evaluate_composition(opt)


if __name__ == "__main__":
    main()
