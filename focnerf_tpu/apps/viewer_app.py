"""Interactive viewer CLI: serve a trained checkpoint in the browser.

The dearpygui-GUI equivalent entry point (reference: --gui flag in
main_nerf.py wiring NeRFGUI; here a web server — works headless/remote).

Usage:
  python -m focnerf_tpu.apps.viewer_app <scene-or-.> --workspace ws_background [--port 7007]
"""

from __future__ import annotations

import os

import numpy as np

from focnerf_tpu.config import parse_options


def main(argv=None):
    import jax.numpy as jnp

    from focnerf_tpu.render.renderer import render_image
    from focnerf_tpu.train.checkpoints import load_object_params
    from focnerf_tpu.viewer.server import ViewerState, run_viewer

    opt = parse_options(argv)
    ckpt_dir = os.path.join(opt.workspace, "checkpoints")
    params, cfg = load_object_params(ckpt_dir, None if os.path.exists(
        os.path.join(ckpt_dir, "model_config.json")) else opt.nerf_config())
    print(f"[viewer] loaded checkpoint from {ckpt_dir}")

    obj_feat = jnp.zeros((cfg.yolo_feats_dim,)) if cfg.use_objfeat else None

    def render_fn(pose, intrinsics, H, W, t):
        img, _ = render_image(
            params, cfg, jnp.asarray(pose), intrinsics, H, W,
            num_steps=min(opt.num_steps, 128), max_ray_batch=opt.max_ray_batch,
            min_near=opt.min_near, obj_feat=obj_feat, bg_color=1.0,
        )
        return np.asarray(img)

    state = ViewerState(render_fn, W=opt.W // 2, H=opt.H // 2)
    run_viewer(state, port=int(os.environ.get("VIEWER_PORT", 7007)))


if __name__ == "__main__":
    main()
