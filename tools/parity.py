"""PSNR-parity harness against the BASELINE configs — one command.

The ±0.3 dB north star (BASELINE.md) is defined on real scenes (fox /
Lego / Table-top) that are absent from this image (zero egress). This
runner is built so real data produces parity numbers with ZERO extra
work (VERDICT r2 item 2b):

  python tools/parity.py --data /path/to/scene --family hash --seeds 0,1,2

and, until data lands, the strongest stand-in runs the SAME code path on
the hard procedural scene (thin struts + high-frequency texture,
focnerf_tpu/data/procedural.py):

  python tools/parity.py --scene hard --family all --seeds 0,1,2 \
      --iters 10000 --res 800            # production config, on-chip

Families: hash (main_nerf, the reference-parity pipeline), dense / vm
(main_voxel shear-warp families). --preset both additionally trains the
hash family WITHOUT the -O fast stack to record the exact-vs-(-O) quality
delta. Appends mean±std rows to PARITY.md.

Legacy smoke mode (round-2 rows): --config N keeps the old single-run
synthetic-sphere behavior.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _last_eval_psnr(obj_ws: str):
    log = os.path.join(obj_ws, "log_ngp.txt")
    psnr = None
    if os.path.exists(log):
        for line in open(log):
            if "PSNR" in line:
                try:
                    psnr = float(line.split("PSNR =")[-1].split("|")[0])
                except Exception:
                    pass
    return psnr


def run_hash(scene, iters, seed, workspace, *, fast=True, num_rays=4096,
             num_steps=512, extra=(), resume=False):
    import shutil

    from focnerf_tpu.apps.main_nerf import main as train_main

    ws = os.path.join(workspace, f"hash{'O' if fast else 'X'}_s{seed}")
    # fresh-run hygiene: stale logs would satisfy _last_eval_psnr and a
    # stale best/ checkpoint wins the best-PSNR race against the new run.
    # ``resume`` (wedge-guard retries, VERDICT r4 item 8) keeps the
    # workspace and continues from the latest rolling checkpoint instead —
    # a killed 10k-iter ladder run must not restart from scratch.
    if not resume:
        for stale in (ws, ws + "_background"):
            shutil.rmtree(stale, ignore_errors=True)
    args = [
        scene, "--workspace", ws, "--iters", str(iters), "--disable_yolo",
        "--seed", str(seed), "--num_rays", str(num_rays),
        "--num_steps", str(num_steps),
        "--scale", "1.0", "--bound", "1.0",
        # headless parity: metrics compute on device (scalar fetches only);
        # PNG dumps + mesh export cost ~minutes of d2h each on the tunneled
        # chip and carry no PSNR evidence (round-3 seed: 8052 s wall for
        # ~1140 s of training)
        "--no-eval_save_images", "--mesh_res", "0",
        "--eval_interval", "100",
        # rolling ckpt every 10 epochs (500 steps): the per-epoch full-state
        # d2h costs ~84 s vs 59 s of compute on the tunneled chip — saving
        # every epoch more than doubles ladder wall time for <=500 steps of
        # extra crash exposure
        "--ckpt_interval", "10",
        # parity rows must be from-scratch runs: the default ckpt=latest
        # silently RESUMES a previous ladder's checkpoint if the workspace
        # exists (round-4 forensics: a "10k-iter" row was at step 11600).
        # --resume retries flip this to latest (the workspace was created
        # by THIS ladder invocation; true-resume semantics train only the
        # remaining iters, test_provider_apps.py)
        "--ckpt", "latest" if resume else "scratch",
    ] + list(extra)
    if fast:
        args.insert(1, "-O")
    else:
        # exact preset rides the SAME occupancy renderer as -O (fp32, exact
        # 8-corner encode, exact lattice march, uniform slabs) so the
        # exact-vs-O delta isolates the TPU fast stack (stochastic corners,
        # bucketed slabs, skip march, bf16) rather than conflating it with
        # the uniform-num_steps path, which is separately attested
        # (tests/test_model_render.py uniform-vs-occupancy parity).
        args.insert(1, "--cuda_ray")
    t0 = time.time()
    train_main(args)
    return {
        "psnr": _last_eval_psnr(ws + "_background"),
        "train_s": round(time.time() - t0, 1),
    }


def run_voxel(scene, family, iters, seed, workspace, *, res=128, extra=()):
    from focnerf_tpu.apps.main_voxel import main as voxel_main

    ws = os.path.join(workspace, f"{family}_s{seed}")
    args = [
        scene, "--workspace", ws, "--iters", str(iters),
        "--bake_res", str(res), "--seed", str(seed),
        "--scale", "1.0", "--bound", "1.0",
    ] + list(extra)
    if family == "vm":
        args += ["--voxel_vm", "16"]
    elif family == "kplanes":
        args += ["--voxel_kplanes", "8"]
    elif family == "dynvoxel":
        args += ["--voxel_dynamic"]
    buf = io.StringIO()
    t0 = time.time()
    with redirect_stdout(buf):
        voxel_main(args)
    out = buf.getvalue()
    sys.stdout.write(out)
    m = re.findall(r"val PSNR: ([0-9.]+) dB", out)
    train = re.findall(r"train PSNR ([0-9.]+) dB", out)
    return {
        "psnr": float(m[-1]) if m else (float(train[-1]) if train else None),
        "train_s": round(time.time() - t0, 1),
    }


def _append_row(line: str):
    print(line)
    with open(os.path.join(os.path.dirname(__file__), "..", "PARITY.md"), "a") as f:
        f.write(line + "\n")


def _aggregate(tag, dataset, iters, rows):
    import numpy as np

    ps = [r["psnr"] for r in rows if r["psnr"] is not None]
    if not ps:
        _append_row(f"| {tag} | {dataset} | {iters} | FAILED | - |")
        return None
    mean, std = float(np.mean(ps)), float(np.std(ps))
    secs = sum(r["train_s"] for r in rows)
    _append_row(
        f"| {tag} | {dataset} | {iters} | {mean:.2f} ± {std:.2f} dB "
        f"(n={len(ps)}) | {secs:.0f}s |"
    )
    return mean


def legacy_config(args):
    """Round-2 behavior: single synthetic-sphere run of --config N."""
    from focnerf_tpu.apps.main_nerf import main as train_main

    scene = args.data
    if scene is None:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from helpers import make_synthetic_scene

        scene = os.path.join(args.workspace, "synthetic_scene")
        make_synthetic_scene(scene, n_train=12, n_val=4, H=64, W=64)
    argv = [
        scene, "--workspace", os.path.join(args.workspace, f"cfg{args.config}"),
        "--iters", str(args.iters), "--disable_yolo",
        "--num_rays", "1024", "--max_ray_batch", "1024",
    ]
    if args.data is None:
        argv += ["--scale", "1.0", "--bound", "1.0", "--num_steps", "64"]
    if args.config >= 2:
        argv += ["--cuda_ray"]
    t0 = time.time()
    train_main(argv)
    psnr = _last_eval_psnr(
        os.path.join(args.workspace, f"cfg{args.config}") + "_background"
    )
    _append_row(
        f"| {args.config} | {os.path.basename(scene)} | {args.iters} "
        f"| {psnr} | {time.time()-t0:.1f}s |"
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=None,
                   help="legacy round-2 single-run mode")
    p.add_argument("--data", type=str, default=None,
                   help="real scene dir (blender/colmap layout) — the "
                        "parity numbers the north star is defined on")
    p.add_argument("--scene", choices=["hard", "sphere"], default="hard",
                   help="procedural stand-in when --data is absent")
    p.add_argument("--family", default="hash",
                   help="hash | dense | vm | all (comma lists ok)")
    p.add_argument("--seeds", default="0")
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--res", type=int, default=128,
                   help="image side of the procedural scene (800 = "
                        "production) and the voxel families' bake_res cap")
    p.add_argument("--gt_res", type=int, default=None,
                   help="procedural GT voxelization (default res//3 rounded "
                        "to 32, max 256)")
    p.add_argument("--views", type=int, default=30)
    p.add_argument("--num_rays", type=int, default=4096,
                   help="hash-family rays/step (shrink for CPU smoke)")
    p.add_argument("--num_steps", type=int, default=512,
                   help="hash-family uniform samples/ray (the reference "
                        "default; shrink for CPU smoke)")
    p.add_argument("--preset", choices=["O", "exact", "both"], default="O",
                   help="hash family: -O fast stack, exact stack, or both "
                        "(records the exact-vs-O delta)")
    p.add_argument("--train_extra", default="",
                   help="extra main_nerf flags appended to every hash run, "
                        "e.g. '--grad_clip 1.0 --lr_warmup 500' (the round-4 "
                        "saturation-collapse stabilizers)")
    p.add_argument("--resume", action="store_true",
                   help="wedge-guard retry mode (hash family): keep the "
                        "workspace and resume from the latest rolling "
                        "checkpoint instead of wiping + scratch")
    p.add_argument("--workspace", type=str, default="/tmp/parity")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon sitecustomize "
                        "force-selects the tunneled TPU via jax.config)")
    args = p.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.workspace, exist_ok=True)

    if args.config is not None:
        legacy_config(args)
        return

    scene = args.data
    if scene is None:
        from focnerf_tpu.data.procedural import make_hard_scene

        if args.scene == "hard":
            gt = args.gt_res or min(256, max(32, (args.res // 3) // 32 * 32))
            scene = make_hard_scene(
                os.path.join(args.workspace, f"hard_{args.res}_{gt}"),
                n_train=args.views, n_val=max(4, args.views // 6),
                n_test=max(4, args.views // 6),
                H=args.res, W=args.res, gt_res=gt,
            )
        else:
            sys.path.insert(
                0, os.path.join(os.path.dirname(__file__), "..", "tests")
            )
            from helpers import make_synthetic_scene

            scene = os.path.join(args.workspace, "synthetic_scene")
            make_synthetic_scene(
                scene, n_train=args.views, n_val=4, H=args.res, W=args.res
            )
    dataset = os.path.basename(os.path.normpath(scene))

    seeds = [int(s) for s in args.seeds.split(",")]
    fams = (
        ["hash", "dense", "vm"]
        if args.family == "all"
        else args.family.split(",")
    )
    dyn_fams = [f for f in fams if f in ("kplanes", "dynvoxel")]
    dyn_scene = None
    if dyn_fams and args.data is None:
        # multi-view-per-timestamp DYNAMIC stand-in: per-t held-out PSNR is
        # unambiguous by construction (>= 2 views supervise each timestamp)
        from focnerf_tpu.data.procedural import make_hard_dynamic_scene

        gt = args.gt_res or min(128, max(32, (args.res // 3) // 32 * 32))
        dyn_scene = make_hard_dynamic_scene(
            os.path.join(args.workspace, f"harddyn_{args.res}_{gt}"),
            n_times=max(4, args.views // 4), views_per_time=4,
            H=args.res, W=args.res, gt_res=gt,
        )
    deltas = {}
    for fam in fams:
        if fam == "hash":
            presets = ["O", "exact"] if args.preset == "both" else [args.preset]
            for pr in presets:
                rows = []
                for s in seeds:
                    r = run_hash(scene, args.iters, s, args.workspace,
                                 fast=(pr == "O"), num_rays=args.num_rays,
                                 num_steps=args.num_steps,
                                 extra=args.train_extra.split(),
                                 resume=args.resume)
                    # land evidence incrementally: a wall-clock overrun (or
                    # a relay blip) mid-preset must not lose finished seeds
                    psnr_cell = (
                        f"{r['psnr']} dB" if r["psnr"] is not None else "FAILED"
                    )
                    _append_row(
                        f"| hash/{pr} seed {s} | {dataset} | {args.iters} "
                        f"| {psnr_cell} | {r['train_s']:.0f}s |"
                    )
                    rows.append(r)
                deltas[pr] = _aggregate(
                    f"hash/{pr}", dataset, args.iters, rows
                )
            if args.preset == "both" and None not in deltas.values():
                _append_row(
                    f"| hash exact-vs-O delta | {dataset} | {args.iters} "
                    f"| {deltas['exact'] - deltas['O']:+.2f} dB | - |"
                )
        else:
            res = min(args.res, 256)  # voxel families cap at 256^3 single-chip
            fam_scene = dyn_scene if fam in ("kplanes", "dynvoxel") else scene
            fam_ds = (
                os.path.basename(os.path.normpath(fam_scene))
                if fam_scene is not None else dataset
            )
            rows = []
            for s in seeds:
                r = run_voxel(fam_scene or scene, fam, args.iters, s,
                              args.workspace, res=res,
                              extra=args.train_extra.split())
                psnr_cell = (
                    f"{r['psnr']} dB" if r["psnr"] is not None else "FAILED"
                )
                _append_row(
                    f"| {fam} seed {s} | {fam_ds} | {args.iters} "
                    f"| {psnr_cell} | {r['train_s']:.0f}s |"
                )
                rows.append(r)
            _aggregate(fam, fam_ds, args.iters, rows)


if __name__ == "__main__":
    main()
