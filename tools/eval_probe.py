"""Probe the full-image eval path (render_image) at production resolution.

VERDICT r3 item 8: the per-sample eval path (0.18 fps @ 256^2) is the
usability floor AND the reason the production parity ladder costs 2.2 h
per seed (one 800^2 eval image ~170 s; 4 evals x 8 views dominate the
wall clock). This probe times ONE 800^2 image under the trainer's exact
render kwargs while sweeping the levers:

  - max_ray_batch (chunk size): 4096 (trainer default) vs 16k / 64k —
    the skip march is a lax.while_loop whose sequential iterations cost
    the same at any width, so wider chunks amortize them;
  - skip-march (while_loop) vs candidate-ladder march (one-shot [N,S]
    bitfield probe — parallel, MXU-free but gather-wide);
  - slab 32 / 64 / 128.

Usage:  python tools/eval_probe.py [--res 800] [--occupancy 0.05]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--occupancy", type=float, default=0.05,
                    help="fraction of grid cells flagged occupied")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        # the axon sitecustomize force-selects the TPU through jax.config,
        # which beats the env var — without this a "--cpu" probe contends
        # for (and can wedge) the one-client relay (parity.py:233-237)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from focnerf_tpu.config import parse_options
    from focnerf_tpu.models.nerf import init_nerf_params
    from focnerf_tpu.ops.occupancy import (
        init_occupancy, occupancy_bitfield, occupancy_skip_field,
    )
    from focnerf_tpu.render.renderer import render_image

    opt = parse_options(["scene", "-O", "--disable_yolo"])
    cfg = opt.nerf_config()
    if cfg.use_objfeat:
        # probe renders without a YOLO sidecar: plain conditioning-free field
        from dataclasses import replace
        cfg = replace(cfg, use_objfeat=False)
    params = init_nerf_params(jax.random.key(0), cfg)

    occ = init_occupancy(cfg.bound)
    # sprinkle occupied cells around the center (a plausible post-pruning
    # grid: most rays traverse mostly-empty space but hit a central object)
    rng = np.random.default_rng(0)
    g = 128
    dens = np.zeros(occ.density_grid.shape, np.float32)
    n_cells = dens[0].size
    k = int(args.occupancy * n_cells)
    idx = rng.integers(g // 4, 3 * g // 4, size=(k, 3))
    flat = (idx[:, 0] * g + idx[:, 1]) * g + idx[:, 2]
    d0 = dens[0]
    d0[flat] = 100.0
    occ = occ._replace(density_grid=jnp.asarray(dens))
    bits = occupancy_bitfield(occ, opt.density_thresh)
    skip = occupancy_skip_field(bits)

    H = W = args.res
    fl = 1.2 * W
    intr = (fl, fl, W / 2, H / 2)
    pose = jnp.asarray(
        [[1, 0, 0, 0], [0, 0, -1, 2.0], [0, 1, 0, 0], [0, 0, 0, 1]],
        jnp.float32,
    )

    def run(tag, **kw):
        common = dict(
            num_steps=opt.num_steps, upsample_steps=0,
            min_near=opt.min_near, occ_bits=bits,
            dt_gamma=opt.dt_gamma, max_steps=opt.max_steps, bg_color=1.0,
        )
        common.update(kw)
        # warm (compile) on the same shapes
        img, _ = render_image(params, cfg, pose, intr, H, W, **common)
        img.block_until_ready()
        t0 = time.time()
        img, _ = render_image(params, cfg, pose, intr, H, W, **common)
        img.block_until_ready()
        dt = time.time() - t0
        print(f"{tag:48s} {dt*1000:9.1f} ms/image  ({H*W/dt/1e6:.2f} Mray/s)",
              flush=True)
        return dt

    print(f"res={args.res} occupancy={args.occupancy} "
          f"platform={jax.devices()[0].platform}", flush=True)

    # iterative worklist renderer (render/iterative.py): the whole image is
    # one worklist; only alive rays evaluate the field
    from focnerf_tpu.render.iterative import render_image_iterative

    def run_iter(tag, **kw):
        common = dict(
            occ_skip=skip, dt_gamma=opt.dt_gamma, max_steps=opt.max_steps,
            min_near=opt.min_near, bg_color=1.0,
        )
        common.update(kw)
        img, _ = render_image_iterative(params, cfg, pose, intr, H, W, **common)
        img.block_until_ready()
        t0 = time.time()
        img, _ = render_image_iterative(params, cfg, pose, intr, H, W, **common)
        img.block_until_ready()
        dt = time.time() - t0
        print(f"{tag:48s} {dt*1000:9.1f} ms/image  ({H*W/dt/1e6:.2f} Mray/s)",
              flush=True)

    # device-resident drain (round-5): sweep + lax.while_loop in ONE
    # dispatch — removes the per-round dispatch + n_alive d2h sync that
    # dominated the 256^2 ladder (838 ms with ~10-20 host round-trips)
    run_iter("ITER-DEV sub_slab 16 drain 4k", device_loop=True)
    run_iter("ITER-DEV sub_slab 32 drain 4k", device_loop=True, sub_slab=32)
    run_iter("ITER-DEV sub_slab 16 drain 8k", device_loop=True,
             bucket_base=8192)
    run_iter("ITER sub_slab 16 base 4k")
    run_iter("ITER sub_slab 32 base 4k", sub_slab=32)
    run_iter("ITER sub_slab 16 base 16k", bucket_base=16384)

    # fastest CANDIDATES first so a bounded run still lands evidence;
    # the trainer-today baseline (slowest) goes last
    run("chunk 65536 skip  slab 64", max_ray_batch=65536, slab=64,
        occ_skip=skip)
    run("chunk 65536 ladder slab 64", max_ray_batch=65536, slab=64)
    run("chunk 65536 skip  slab 32", max_ray_batch=65536, slab=32,
        occ_skip=skip)
    run("chunk 65536 ladder slab 32", max_ray_batch=65536, slab=32)
    run("chunk 16384 skip  slab 64", max_ray_batch=16384, slab=64,
        occ_skip=skip)
    run("chunk 16384 ladder slab 64", max_ray_batch=16384, slab=64)
    run("chunk 4096  ladder slab 64", max_ray_batch=4096, slab=64)
    run("chunk 4096  skip  slab 64 (trainer today)",
        max_ray_batch=4096, slab=64, occ_skip=skip)


if __name__ == "__main__":
    main()
