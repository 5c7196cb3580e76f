"""D-NeRF training CLI (dynamic scenes).

Parity target: main_dnerf.py (reference): picks the deform/basis/hyper
network (:80-86), trains with per-frame times from the dataset through the
shared Trainer (resume, eval cadence, checkpoints — dnerf/utils.py), with the
time-axis occupancy grid when --cuda_ray (dnerf/renderer.py:74,286), renders
the test split across time to an mp4, and exports a time-conditioned mesh
(dnerf/utils.py:221-243).

Usage:
  python -m focnerf_tpu.apps.main_dnerf <scene> --dnerf_variant deform \
      [--cuda_ray] [--test] [--mesh_t 0.5]
"""

from __future__ import annotations

import os
import time

import numpy as np

from focnerf_tpu.config import parse_options


def build_trainer(opt, cfg):
    from focnerf_tpu.train.dnerf_trainer import DNeRFTrainer

    return DNeRFTrainer(
        "dnerf",
        cfg,
        workspace=opt.workspace,
        lr=opt.lr,
        lr_net=opt.lr_net or None,
        iters=opt.iters,
        num_steps=opt.num_steps,
        max_ray_batch=opt.max_ray_batch,
        use_occupancy=opt.cuda_ray,
        dt_gamma=opt.dt_gamma,
        max_steps=opt.max_steps,
        train_slab=opt.train_slab,
        skip_march=opt.skip_march,
        density_thresh=opt.density_thresh,
        update_extra_interval=opt.update_extra_interval,
        min_near=opt.min_near,
        color_space=opt.color_space,
        use_checkpoint=opt.ckpt,
        ckpt_interval=opt.ckpt_interval,
        seed=opt.seed,
        time_slots=opt.time_slots,
    )


def main(argv=None):
    from focnerf_tpu.data.dnerf_provider import DNeRFDataset

    opt = parse_options(argv, dnerf=True)
    os.makedirs(opt.workspace, exist_ok=True)
    cfg = opt.dnerf_config()
    trainer = build_trainer(opt, cfg)

    if opt.test:
        test_ds = DNeRFDataset(opt.dataset_options(), split="test")
        trainer.test(test_ds)
        return trainer

    train_ds = DNeRFDataset(opt.dataset_options(), split="train")
    try:
        val_ds = DNeRFDataset(opt.dataset_options(), split="val")
    except FileNotFoundError:
        val_ds = None

    steps_per_epoch = max(train_ds.n_views, 1)
    # remaining-iters semantics on resume (see main_nerf.py)
    remaining = max(0, opt.iters - trainer.global_step)
    max_epochs = int(np.ceil(remaining / steps_per_epoch))
    t0 = time.time()
    trainer.train(train_ds, val_ds, max_epochs=max_epochs, steps_per_epoch=steps_per_epoch)
    trainer.log(f"[dnerf] trained {opt.iters} iters in {time.time()-t0:.1f}s")

    if val_ds is not None and trainer.last_eval_step != trainer.global_step:
        # skip when the cadence eval already ran at the final step
        trainer.evaluate(val_ds)
    try:
        if opt.mesh_t is not None:
            # ref dnerf/utils.py:221-243 exports at a caller-chosen t
            trainer.save_mesh(resolution=128, threshold=opt.density_thresh, t=float(opt.mesh_t))
        else:
            # default: mesh at t=0 and t=1 brackets the motion
            trainer.save_mesh(resolution=128, threshold=opt.density_thresh, t=0.0)
            trainer.save_mesh(resolution=128, threshold=opt.density_thresh, t=1.0)
    except Exception as e:  # mesh export must never kill a training run
        trainer.log(f"[WARN] mesh export failed: {e}")
    return trainer


if __name__ == "__main__":
    main()
