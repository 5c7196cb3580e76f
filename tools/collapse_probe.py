"""Diagnose the seed-dependent transparent-collapse basin (round-4 parity:
seed 0 trained to a pure-white render, loss frozen at the background level,
while seed 1 reached 18.8 dB on the identical config).

Runs the EXACT -O hash-family training path (same Trainer wiring as
apps/main_nerf.py::train_one_object) in short chunks and, between chunks,
prints the quantities that separate "still learning" from "dead":

  - occ_mean      occupancy grid mean density (the bitfield threshold clamp)
  - occ_frac      fraction of bitfield cells occupied
  - sigma mean/max  field density at a fixed 16^3 probe lattice
  - ws_mean       mean rendered alpha (weights_sum) over one train batch

A collapse shows sigma/ws -> 0 with loss stuck at the random-background
floor; a healthy run shows ws_mean tracking the scene's alpha coverage.

Usage (on-chip, scene reused from the parity workspace):
  python tools/collapse_probe.py --scene /tmp/parity_prod/hard_800_256 \
      --seed 0 --iters 600 [--lr 1e-2] [--lr_warmup 256] [--alpha_loss 0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="/tmp/parity_prod/hard_800_256")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--iters", type=int, default=600)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--num_rays", type=int, default=4096)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--lr_warmup", type=int, default=0)
    p.add_argument("--alpha_loss", type=float, default=0.0)
    p.add_argument("--grad_clip", type=float, default=0.0)
    p.add_argument("--schedule_iters", type=int, default=0,
                   help="LR-schedule length (0 = --iters). The doomed parity "
                        "run decayed over 10000; a short probe must match "
                        "that schedule to reproduce its dynamics")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from focnerf_tpu.config import parse_options
    from focnerf_tpu.data.provider import NeRFDataset
    from focnerf_tpu.models.nerf import density_fn
    from focnerf_tpu.ops.occupancy import occupancy_bitfield
    from focnerf_tpu.train.trainer import Trainer

    argv = [
        args.scene, "-O", "--workspace", f"/tmp/collapse_probe_s{args.seed}",
        "--iters", str(args.schedule_iters or args.iters), "--disable_yolo",
        "--seed", str(args.seed),
        "--num_rays", str(args.num_rays), "--scale", "1.0", "--bound", "1.0",
        "--lr", str(args.lr),
    ]
    if args.lr_warmup:
        argv += ["--lr_warmup", str(args.lr_warmup)]
    if args.alpha_loss:
        argv += ["--alpha_loss", str(args.alpha_loss)]
    if args.grad_clip:
        argv += ["--grad_clip", str(args.grad_clip)]
    opt = parse_options(argv)
    # load the scene's YOLO sidecar exactly like main_nerf (the -O config
    # trains WITH the background obj-feat; bypassing it leaves batches
    # without obj_feat and the render asserts)
    from focnerf_tpu.apps.main_nerf import mask_details_for
    from focnerf_tpu.data.yolo_sidecar import load_sidecar, preprocess_scene

    sidecar = load_sidecar(opt.path, "train")
    if sidecar is None:
        preprocess_scene(opt.path, disable_yolo=True)
        sidecar = load_sidecar(opt.path, "train")
    train_ds = NeRFDataset(opt.dataset_options(), split="train",
                           mask_details=mask_details_for(sidecar, "background"),
                           detected_object="background")
    cfg = opt.nerf_config()
    trainer = Trainer(
        "probe", cfg, workspace=opt.workspace, lr=opt.lr, iters=opt.iters,
        num_steps=opt.num_steps, max_ray_batch=opt.max_ray_batch,
        use_occupancy=opt.cuda_ray, dt_gamma=opt.dt_gamma,
        max_steps=opt.max_steps, train_slab=opt.train_slab,
        bucket_slabs=opt.bucket_slabs, skip_march=opt.skip_march,
        density_thresh=opt.density_thresh,
        update_extra_interval=opt.update_extra_interval,
        min_near=opt.min_near, seed=opt.seed,
        lr_warmup=opt.lr_warmup, alpha_loss=opt.alpha_loss,
        grad_clip=opt.grad_clip,
        eval_save_images=False,
        use_checkpoint="scratch",
    )

    r = jnp.linspace(-1.0, 1.0, 16)
    gx, gy, gz = jnp.meshgrid(r, r, r, indexing="ij")
    probe_pts = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)

    @jax.jit
    def probe_sigma(params):
        sig, _ = density_fn(params, cfg, probe_pts)
        return jnp.mean(sig), jnp.max(sig)

    n_chunks = max(1, args.iters // args.chunk)
    for c in range(n_chunks):
        t0 = time.time()
        trainer.train(train_ds, None, max_epochs=1,
                      steps_per_epoch=args.chunk)
        sm, sx = probe_sigma(trainer.state.params)
        occ = trainer.occupancy
        bits = occupancy_bitfield(occ, trainer.density_thresh)
        # one train batch's rendered alpha through the CURRENT params
        batch = train_ds.train_batch(jax.random.key(12345))
        from focnerf_tpu.render.renderer import render_rays_occupancy

        bits = trainer._occ_bits_for_batch(batch)
        out = render_rays_occupancy(
            trainer.state.params, cfg, batch["rays_o"], batch["rays_d"],
            bits, dt_gamma=opt.dt_gamma,
            max_steps=opt.max_steps, slab=trainer.active_slab, bg_color=1.0,
            obj_feat=batch.get("obj_feat"),
            occ_skip=bits if opt.skip_march else None,
        )
        img = out["image"]
        frac_sat = jnp.mean(jnp.all(img > 0.999, axis=-1))
        print(
            f"[probe step {trainer.global_step}] "
            f"occ_mean={float(occ.mean_density):.5f} "
            f"occ_frac={float(jnp.mean(bits)):.4f} "
            f"sigma_mean={float(sm):.5f} sigma_max={float(sx):.3f} "
            f"ws_mean={float(jnp.mean(out['weights_sum'])):.4f} "
            f"sat_white={float(frac_sat):.4f} "  # the saturation-collapse tell
            f"({time.time()-t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
