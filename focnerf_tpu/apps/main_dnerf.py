"""D-NeRF training CLI (dynamic scenes).

Parity target: main_dnerf.py (reference): picks the deform/basis/hyper
network (:80-86), trains with per-frame times from the dataset, renders the
test split across time. Deformation L1 regularization is applied as in
dnerf/utils.py:117-119.

Usage:
  python -m focnerf_tpu.apps.main_dnerf <scene> --dnerf_variant deform
"""

from __future__ import annotations

import os
import time

import numpy as np

from focnerf_tpu.config import parse_options


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from focnerf_tpu.data.dnerf_provider import DNeRFDataset
    from focnerf_tpu.models.dnerf import init_dnerf_params
    from focnerf_tpu.render.dnerf_renderer import render_rays_dnerf
    from focnerf_tpu.train.checkpoints import CheckpointManager
    from focnerf_tpu.train.meters import PSNRMeter

    opt = parse_options(argv)
    os.makedirs(opt.workspace, exist_ok=True)
    cfg = opt.dnerf_config()

    train_ds = DNeRFDataset(opt.dataset_options(), split="train")
    try:
        val_ds = DNeRFDataset(opt.dataset_options(), split="val")
    except FileNotFoundError:
        val_ds = None

    params = init_dnerf_params(jax.random.key(opt.seed), cfg)
    sched = lambda step: opt.lr * 0.1 ** jnp.minimum(step / opt.iters, 1.0)
    optimizer = optax.adam(sched, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            out = render_rays_dnerf(
                p, cfg, batch["rays_o"], batch["rays_d"], batch["time"],
                num_steps=opt.num_steps, rng=rng, perturb=True, bg_color=batch.get("bg"),
                min_near=opt.min_near,
            )
            pixels = batch["pixels"]
            if pixels.shape[-1] == 4:
                gt = pixels[..., :3] * pixels[..., 3:] + batch["bg"] * (1 - pixels[..., 3:])
            else:
                gt = pixels[..., :3]
            loss = jnp.mean((out["image"] - gt) ** 2)
            if "deform_mean" in out:  # L1 deformation reg (dnerf/utils.py:117-119)
                loss = loss + 1e-3 * out["deform_mean"]
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.key(opt.seed)
    t0 = time.time()
    for it in range(opt.iters):
        rng, k = jax.random.split(rng)
        batch = train_ds.train_batch(k)
        batch["bg"] = jax.random.uniform(jax.random.fold_in(k, 3), (opt.num_rays, 3))
        params, opt_state, loss = train_step(params, opt_state, batch, k)
        if it % 500 == 0:
            print(f"iter {it} loss {float(loss):.5f} ({time.time()-t0:.0f}s)")

    # save
    mgr = CheckpointManager(os.path.join(opt.workspace, "checkpoints"))
    from focnerf_tpu.train.state import TrainState

    state = TrainState(
        step=jnp.int32(opt.iters), params=params, opt_state=opt_state,
        ema_params=params, ema_count=jnp.int32(opt.iters),
    )
    mgr.save(state)

    # eval over time
    if val_ds is not None:
        from focnerf_tpu.core.rays import get_rays

        meter = PSNRMeter()
        import imageio.v2 as imageio

        out_dir = os.path.join(opt.workspace, "results")
        os.makedirs(out_dir, exist_ok=True)
        for v in range(val_ds.n_views):
            view = val_ds.eval_view(v)
            rays = get_rays(jnp.asarray(view["pose"]), val_ds.intrinsics, val_ds.H, val_ds.W)
            out = render_rays_dnerf(
                params, cfg, rays["rays_o"], rays["rays_d"], view["time"],
                num_steps=opt.num_steps, bg_color=1.0, min_near=opt.min_near,
            )
            img = np.asarray(out["image"]).reshape(val_ds.H, val_ds.W, 3)
            if "pixels" in view:
                gt = np.asarray(view["pixels"]).reshape(val_ds.H, val_ds.W, -1)
                if gt.shape[-1] == 4:
                    gt = gt[..., :3] * gt[..., 3:] + (1 - gt[..., 3:])
                meter.update(img, gt)
            imageio.imwrite(
                os.path.join(out_dir, f"dnerf_{v:04d}.png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8),
            )
        print(f"[dnerf eval] {meter.report()}")


if __name__ == "__main__":
    main()
