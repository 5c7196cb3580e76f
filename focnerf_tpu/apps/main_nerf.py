"""FOC-NeRF training CLI: one NeRF per detected object.

Parity target: main_nerf.py (reference). Flow (:79-324):

  1. object masks for every split come from the YOLO sidecar
     (data/yolo_sidecar.py, replacing in-loop get_object_masks);
  2. per detected object: masked dataset -> obj-feat sidecar
     (workspace/obj_feats/<obj>.npz, ref :256-261) -> Trainer into
     workspace_<obj>/ (ref :268-279) -> eval + mesh export (:288-298);
  3. --test renders the test split from saved checkpoints;
  4. train/render timing appended to train_times.txt / render_times.txt
     (ref :301-314).

Usage:
  python -m focnerf_tpu.apps.main_nerf <scene> --workspace ws --iters 30000
  python -m focnerf_tpu.apps.main_nerf <scene> --test --workspace ws
"""

from __future__ import annotations

import os
import time

import numpy as np

from focnerf_tpu.config import Options, parse_options


def detected_objects(sidecar, opt: Options):
    if sidecar is None:
        return ["background"]
    names = [str(n) for n in sidecar["names"]]
    if opt.objects_of_interest:
        names = [n for n in names if n in opt.objects_of_interest or n == "background"]
    return names


def mask_details_for(sidecar, obj: str):
    if sidecar is None:
        return None
    return {
        "masks": sidecar[f"{obj}__masks"],
        "feats": sidecar[f"{obj}__feats"],
        # per-row image paths: the provider aligns sidecar rows to its kept
        # frames by path (sorting/split-proof); absent in pre-r2 sidecars
        "paths": sidecar.get("paths"),
    }


def train_one_object(opt: Options, obj: str, sidecar_train, sidecar_val):
    import jax

    from focnerf_tpu.data.feats import save_obj_feats
    from focnerf_tpu.data.provider import NeRFDataset
    from focnerf_tpu.train.trainer import Trainer

    print(f"[main_nerf] training object: {obj}")
    train_ds = NeRFDataset(
        opt.dataset_options(), split="train",
        mask_details=mask_details_for(sidecar_train, obj), detected_object=obj,
    )
    try:
        val_ds = NeRFDataset(
            opt.dataset_options(), split="val",
            mask_details=mask_details_for(sidecar_val, obj), detected_object=obj,
        )
    except FileNotFoundError:
        val_ds = None

    # obj-feat sidecar for composition/editing (main_nerf.py:256-261)
    if train_ds.obj_feats is not None:
        save_obj_feats(
            os.path.join(opt.workspace, "obj_feats", f"{obj}.npz"),
            train_ds.obj_feats,
            train_ds.poses,
        )

    cfg = opt.nerf_config()
    trainer = Trainer(
        "ngp",
        cfg,
        workspace=f"{opt.workspace}_{obj}",
        lr=opt.lr,
        lr_net=opt.lr_net or None,
        lr_warmup=opt.lr_warmup,
        alpha_loss=opt.alpha_loss,
        grad_clip=opt.grad_clip,
        grad_level_phases=opt.grad_level_phases,
        c2f=opt.c2f,
        iters=opt.iters,
        num_steps=opt.num_steps,
        upsample_steps=opt.upsample_steps,
        max_ray_batch=opt.max_ray_batch,
        use_occupancy=opt.cuda_ray,
        dt_gamma=opt.dt_gamma,
        max_steps=opt.max_steps,
        train_slab=opt.train_slab,
        bucket_slabs=opt.bucket_slabs,
        skip_march=opt.skip_march,
        density_thresh=opt.density_thresh,
        update_extra_interval=opt.update_extra_interval,
        steps_per_dispatch=opt.steps_per_dispatch,
        min_near=opt.min_near,
        color_space=opt.color_space,
        tv_weight=opt.tv_weight,
        use_checkpoint=opt.ckpt,
        seed=opt.seed,
        rand_pose=opt.rand_pose,
        clip_text=opt.clip_text,
        eval_interval=opt.eval_interval,
        ckpt_interval=opt.ckpt_interval,
        eval_save_images=opt.eval_save_images,
        eval_renderer=opt.eval_renderer,
    )
    steps_per_epoch = max(train_ds.n_views, 1)
    # train the REMAINING iters: on --ckpt latest resume, global_step is
    # already at the checkpoint step — recomputing from opt.iters alone
    # would train opt.iters extra steps past the target
    remaining = max(0, opt.iters - trainer.global_step)
    max_epochs = int(np.ceil(remaining / steps_per_epoch))
    t0 = time.time()
    trainer.train(train_ds, val_ds, max_epochs=max_epochs, steps_per_epoch=steps_per_epoch)
    train_time = time.time() - t0
    with open(os.path.join(opt.workspace, "train_times.txt"), "a") as f:
        f.write(f"{obj}: {train_time:.2f}s for {opt.iters} iters\n")
    if val_ds is not None and trainer.last_eval_step != trainer.global_step:
        # skip when the cadence eval already ran at the final step — a
        # second full-val eval costs ~20 min of chip time per ladder run
        trainer.evaluate(val_ds)
    if opt.mesh_res > 0:
        try:
            trainer.save_mesh(resolution=opt.mesh_res, threshold=opt.density_thresh)
        except Exception as e:  # mesh export must never kill a training run
            trainer.log(f"[WARN] mesh export failed: {e}")
    return trainer


def test_mode(opt: Options, sidecar_test):
    import jax

    from focnerf_tpu.data.feats import calculate_feats, load_obj_feats
    from focnerf_tpu.data.provider import NeRFDataset
    from focnerf_tpu.train.trainer import Trainer

    for obj in detected_objects(sidecar_test, opt):
        ws = f"{opt.workspace}_{obj}"
        if not os.path.isdir(os.path.join(ws, "checkpoints")):
            continue
        test_ds = NeRFDataset(
            opt.dataset_options(), split="test",
            mask_details=mask_details_for(sidecar_test, obj), detected_object=obj,
        )
        # test-view features are SYNTHESIZED from the saved training-view
        # features by inverse-pose-distance weighting (ref main_nerf.py:288,
        # calculate_feats utils.py:189-219) — never taken from YOLO on the
        # test images themselves (that would leak test-view appearance).
        feats_path = os.path.join(opt.workspace, "obj_feats", f"{obj}.npz")
        if os.path.exists(feats_path):
            saved = load_obj_feats(feats_path)
            synth = calculate_feats(test_ds.poses, saved["obj_feats"], saved["poses"])
            test_ds.obj_feats = synth
            test_ds.obj_feats_dev = jax.device_put(synth)
        cfg = opt.nerf_config()
        trainer = Trainer(
            "ngp", cfg, workspace=ws, use_checkpoint="latest",
            num_steps=opt.num_steps, upsample_steps=opt.upsample_steps,
            max_ray_batch=opt.max_ray_batch,
            min_near=opt.min_near,
            # restore + render through the occupancy path when the model
            # trained with it (ref --cuda_ray test renders via run_cuda)
            use_occupancy=opt.cuda_ray,
            dt_gamma=opt.dt_gamma, max_steps=opt.max_steps,
            train_slab=opt.train_slab, density_thresh=opt.density_thresh,
        )
        t0 = time.time()
        trainer.test(test_ds, save_gt=opt.save_gt)
        with open(os.path.join(opt.workspace, "render_times.txt"), "a") as f:
            f.write(f"{obj}: {time.time()-t0:.2f}s for {test_ds.n_views} views\n")


def main(argv=None):
    opt = parse_options(argv)
    os.makedirs(opt.workspace, exist_ok=True)

    from focnerf_tpu.data.yolo_sidecar import load_sidecar, preprocess_scene

    sidecars = {s: load_sidecar(opt.path, s) for s in ("train", "val", "test")}
    if sidecars["train"] is None:
        print("[main_nerf] no YOLO sidecar found; running preprocessing "
              f"({'disabled' if opt.disable_yolo else 'yolo'} mode)")
        preprocess_scene(opt.path, model_name=opt.yolo_model, disable_yolo=opt.disable_yolo)
        sidecars = {s: load_sidecar(opt.path, s) for s in ("train", "val", "test")}

    if opt.test:
        test_mode(opt, sidecars["test"] or sidecars["train"])
        return

    for obj in detected_objects(sidecars["train"], opt):
        train_one_object(opt, obj, sidecars["train"], sidecars["val"])


if __name__ == "__main__":
    main()
