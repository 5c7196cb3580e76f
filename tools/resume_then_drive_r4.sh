#!/bin/bash
# Recovery for the 20:59 relay wedge: resume the seed-0 exact parity run
# from the latest rolling checkpoint (same args as tools/parity.py run_hash
# exact preset, --ckpt latest instead of scratch, NO workspace wipe),
# append the PARITY rows the parity runner would have written, then hand
# the chip to the round-4 chunked schedule.
#
# Wedge-hardened: a fresh PJRT client sometimes blocks forever on its
# first RPC right after a killed client (futex wait, zero CPU). Each
# attempt gets a progress watchdog — no "resumed (latest)" line within
# WATCH_S => kill the python PID itself, cool down, re-probe, retry.
set -u
cd /root/repo
ATTEMPTS=6
WATCH_S=900
RC=1
for i in $(seq 1 $ATTEMPTS); do
    ALOG=/tmp/resume_attempt_$i.log
    echo "=== resume attempt $i ($(date -u +%H:%M:%S))"
    python -u - >"$ALOG" 2>&1 <<'EOF' &
from focnerf_tpu.apps.main_nerf import main as train_main
import time
t0 = time.time()
train_main([
    "/tmp/parity_prod_r4/hard_800_256", "--cuda_ray",
    "--workspace", "/tmp/parity_prod_r4/hashX_s0",
    "--iters", "10000", "--disable_yolo", "--seed", "0",
    "--num_rays", "4096", "--num_steps", "512",
    "--scale", "1.0", "--bound", "1.0",
    "--no-eval_save_images", "--mesh_res", "0",
    "--eval_interval", "100",
    "--ckpt", "latest",
    "--ckpt_interval", "10",
    "--lr_warmup", "500",
])
print(f"RESUME_TRAIN_S {time.time()-t0:.0f}")
EOF
    PY=$!
    # watchdog: require the resume marker within WATCH_S
    ok=""
    for _ in $(seq 1 $((WATCH_S / 15))); do
        sleep 15
        if ! kill -0 $PY 2>/dev/null; then break; fi
        if grep -q "resumed (latest)" "$ALOG"; then ok=1; break; fi
    done
    if [ -z "$ok" ] && kill -0 $PY 2>/dev/null; then
        echo "=== attempt $i wedged (no resume in ${WATCH_S}s); killing $PY"
        kill -9 $PY 2>/dev/null
        sleep 120
        timeout 90 python -c "import jax; jax.devices()" 2>/dev/null \
            && echo "=== relay probe ok" || sleep 180
        continue
    fi
    wait $PY
    RC=$?
    tail -40 "$ALOG"
    if [ $RC -eq 0 ]; then break; fi
    echo "=== attempt $i exited rc=$RC; retrying"
    sleep 60
done
RESUME_RC=$RC python -u - <<'EOF'
import re, os
log = "/tmp/parity_prod_r4/hashX_s0_background/log_ngp.txt"
psnr = None
# only trust the log's last PSNR if training COMPLETED — otherwise the
# last line is a mid-training eval (e.g. the epoch-100 18.59), not the
# 10k-iter number
if os.environ.get("RESUME_RC") == "0" and os.path.exists(log):
    m = re.findall(r"PSNR = ([0-9.]+)", open(log).read())
    if m:
        psnr = float(m[-1])
rows = []
if psnr is not None:
    rows.append(f"| hash/exact seed 0 | hard_800_256 | 10000 | {psnr:.5f} dB | resumed after relay wedge |")
    rows.append(f"| hash/exact | hard_800_256 | 10000 | {psnr:.2f} ± 0.00 dB (n=1) | resumed@ckpt after relay wedge |")
    rows.append(f"| hash exact-vs-O delta (seed 0) | hard_800_256 | 10000 | {psnr - 19.02279:+.2f} dB | exact minus -O |")
else:
    rows.append("| hash/exact seed 0 | hard_800_256 | 10000 | FAILED (resume) | - |")
with open("/root/repo/PARITY.md", "a") as f:
    for r in rows:
        print(r)
        f.write(r + "\n")
EOF
echo "RESUME_DONE rc=$RC"
exec /tmp/drive_chip_r4b.sh
