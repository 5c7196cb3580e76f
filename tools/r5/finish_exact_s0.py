"""Round-5 chunk A: finish the seed-0 EXACT parity run (VERDICT r4 item 1).

The r4c run (tools/drive_chip_r4c.sh step 2) trained all 10000 steps but
was killed between the last train epoch and the final eval, so PARITY.md
has no exact-preset PSNR. Resume from the rolling checkpoint (9500),
train the remaining 500 steps and let the epoch-200 eval fire. Flags are
IDENTICAL to the original run (tools/parity.py run_hash, exact preset,
--lr_warmup 500 --steps_per_dispatch 16) so the resumed segment is the
same program the r4c run compiled.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from focnerf_tpu.apps.main_nerf import main as train_main

t0 = time.time()
train_main([
    "/tmp/parity_prod_r4c/hard_800_256", "--cuda_ray",
    "--workspace", "/tmp/parity_prod_r4c/hashX_s0",
    "--iters", "10000", "--disable_yolo", "--seed", "0",
    "--num_rays", "4096", "--num_steps", "512",
    "--scale", "1.0", "--bound", "1.0",
    "--no-eval_save_images", "--mesh_res", "0",
    "--eval_interval", "100",
    "--ckpt", "latest", "--ckpt_interval", "10",
    "--lr_warmup", "500", "--steps_per_dispatch", "16",
])
print(f"RESUME_TRAIN_S {time.time() - t0:.0f}")
