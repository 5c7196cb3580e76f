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


def discover_objects(opt: Options) -> List[str]:
    """Find workspace_<obj> directories with checkpoints (gather_checkpoints)."""
    root = opt.ckpt_dir or "."
    objs = []
    for name in sorted(os.listdir(root)):
        if "_" not in name:
            continue
        obj = name.rsplit("_", 1)[-1]
        if os.path.isdir(os.path.join(root, name, "checkpoints")):
            if not opt.objects_of_interest or obj in opt.objects_of_interest:
                objs.append(obj)
    return objs


def load_composition(opt: Options):
    import jax.numpy as jnp

    from focnerf_tpu.data.feats import calculate_avg_feats_inference
    from focnerf_tpu.render.compose import stack_object_params
    from focnerf_tpu.train.checkpoints import gather_obj_feats, load_object_params

    objs = discover_objects(opt)
    if not objs:
        raise SystemExit(f"no object checkpoints found under {opt.ckpt_dir!r}")
    cfg = None
    params_list = []
    for obj in objs:
        ckpt_dir = os.path.join(opt.ckpt_dir or ".", f"{_ws_prefix(opt)}_{obj}", "checkpoints")
        params, cfg = load_object_params(ckpt_dir, cfg or opt.nerf_config())
        params_list.append(params)
        print(f"[combined] loaded {obj}")
    stacked = stack_object_params(params_list)

    obj_feats = None
    if cfg.use_objfeat:
        feats_by_obj = calculate_avg_feats_inference(
            gather_obj_feats(opt.ckpt_dir or ".")
        )
        obj_feats = jnp.asarray(
            np.stack([feats_by_obj.get(o, np.zeros(cfg.yolo_feats_dim, np.float32)) for o in objs])
        )
    return objs, cfg, stacked, obj_feats


def _ws_prefix(opt: Options) -> str:
    # object workspaces are "<workspace>_<obj>" next to ckpt_dir (main_nerf flow)
    candidates = [
        n.rsplit("_", 1)[0]
        for n in os.listdir(opt.ckpt_dir or ".")
        if os.path.isdir(os.path.join(opt.ckpt_dir or ".", n, "checkpoints"))
    ]
    return candidates[0] if candidates else "workspace"


def evaluate_composition(opt: Options, offsets=None, write_video: bool = False):
    import jax
    import jax.numpy as jnp

    from focnerf_tpu.data.provider import NeRFDataset
    from focnerf_tpu.render.compose import compose_image
    from focnerf_tpu.train.meters import LPIPSMeter, PSNRMeter, SSIMMeter

    objs, cfg, stacked, obj_feats = load_composition(opt)
    dataset = NeRFDataset(opt.dataset_options(), split="val")

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
        t0 = time.time()
        rgba, depth = compose_image(
            stacked, cfg, jnp.asarray(view["pose"]), dataset.intrinsics,
            dataset.H, dataset.W, obj_feats, offsets,
            num_steps=opt.num_steps, max_ray_batch=opt.max_ray_batch,
            bg_color=0.0, aabb=aabb, min_near=opt.min_near,
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
