"""PSNR-parity harness against the BASELINE configs.

BASELINE.json lists five parity configs (fox, lego, table-top, composition,
editing). Real datasets are not present in this image (zero egress), so the
harness runs each pipeline shape on a generated synthetic scene and reports
convergence PSNR; point ``--data`` at a real scene directory (fox / lego
nerf-synthetic layout) to produce the actual parity numbers.

Usage:
  python tools/parity.py --config 1 [--data /path/to/scene] [--iters 2000]

Writes PARITY.md rows: config | dataset | iters | PSNR.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_config(idx: int, data: str | None, iters: int, workspace: str) -> dict:
    import jax

    from focnerf_tpu.apps.main_nerf import main as train_main

    scene = data
    if scene is None:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from helpers import make_synthetic_scene

        scene = os.path.join(workspace, "synthetic_scene")
        make_synthetic_scene(scene, n_train=12, n_val=4, H=64, W=64)

    args = [
        scene, "--workspace", os.path.join(workspace, f"cfg{idx}"),
        "--iters", str(iters), "--disable_yolo",
        "--num_rays", "1024", "--max_ray_batch", "1024",
    ]
    if data is None:
        args += ["--scale", "1.0", "--bound", "1.0", "--num_steps", "64"]
    if idx >= 2:
        args += ["--cuda_ray"]  # occupancy-accelerated config
    t0 = time.time()
    train_main(args)
    train_s = time.time() - t0

    # pull the last eval PSNR from the object workspace log
    obj_ws = os.path.join(workspace, f"cfg{idx}") + "_background"
    psnr = None
    log = os.path.join(obj_ws, "log_ngp.txt")
    if os.path.exists(log):
        for line in open(log):
            if "PSNR" in line:
                try:
                    psnr = float(line.split("PSNR =")[-1].split("|")[0])
                except Exception:
                    pass
    return {"config": idx, "dataset": os.path.basename(scene), "iters": iters,
            "psnr": psnr, "train_s": round(train_s, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=1)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--iters", type=int, default=500)
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
    row = run_config(args.config, args.data, args.iters, args.workspace)
    line = (
        f"| {row['config']} | {row['dataset']} | {row['iters']} "
        f"| {row['psnr']} | {row['train_s']}s |"
    )
    print(line)
    with open("PARITY.md", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
