#!/bin/bash
# Round-5 chip schedule, part E — restart after J's teardown hang (its
# rows were hand-appended). Remaining: H dynamic campaign, F seed-2,
# G vm/dense, C render A/B, B3 cap84 gate, I bench refresh, D2 fused
# retry (last; wedge-prone compile). Same guard/wait_relay as part D.
set -u
cd /root/repo
SCENE=/tmp/parity_prod_r4c/hard_800_256
RESULTS=ONCHIP_QUEUE_RESULTS.md
echo -e "\n## queue run $(date -u +%Y-%m-%dT%H:%M:%SZ) (round-5 driver, part E)" >> $RESULTS
mark () { echo -e "\n### [$1] $2 — $3\n\`\`\`\n$4\n\`\`\`" >> $RESULTS; }
wait_relay () {
  local t
  for t in $(seq 1 48); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); assert float((x @ x).sum()) > 0" >/dev/null 2>&1; then
      return 0
    fi
    echo "[relay] compute probe failed (try $t) — backing off 300s"
    sleep 300
  done
  return 1
}
guard () {
  local name=$1 stall=$2 tries=$3; shift 3
  local i rc log age pid
  for i in $(seq 1 "$tries"); do
    wait_relay || { mark "$name" "attempt $i" "RELAY DOWN 4h (compute probe)" ""; return 1; }
    log=/tmp/r5e_${name}_a${i}.log
    : > "$log"
    if [ "$i" -ge 2 ] && [ -n "${RETRY_EXTRA:-}" ]; then
      "$@" $RETRY_EXTRA >>"$log" 2>&1 & pid=$!
    else
      "$@" >>"$log" 2>&1 & pid=$!
    fi
    while kill -0 $pid 2>/dev/null; do
      sleep 30
      age=$(( $(date +%s) - $(stat -c %Y "$log") ))
      if [ $age -gt "$stall" ]; then
        echo "[$name] attempt $i STALLED (${stall}s silent) — TERM $pid"
        kill -TERM $pid 2>/dev/null
        sleep 30
        kill -9 $pid 2>/dev/null
        mark "$name" "attempt $i" "STALLED ${stall}s no-output (wedge guard)" "$(tail -8 "$log")"
        break
      fi
    done
    if wait $pid; then rc=0; else rc=$?; fi
    tail -4 "$log"
    if [ $rc -eq 0 ]; then
      mark "$name" "attempt $i" "rc=0" "$(tail -12 "$log")"
      return 0
    fi
    sleep 90
  done
  echo "[$name] FAILED after $tries attempts"
  mark "$name" "final" "FAILED after $tries attempts" "$(tail -12 "$log")"
  return 1
}

echo "=== H: dynamic campaign (multi-view-per-t, 3 seeds)"
guard h_dyn 2400 2 python -u tools/parity.py --family kplanes,dynvoxel \
    --seeds 0,1,2 --iters 3000 --res 400 --views 32 \
    --workspace /tmp/parity_dyn_r5 --train_extra "--steps_per_dispatch 16"
echo "=== H2: dynvoxel no-time-smooth arm (seed 0)"
guard h2_dyn_nosmooth 2400 1 python -u tools/parity.py --family dynvoxel \
    --seeds 0 --iters 3000 --res 400 --views 32 \
    --workspace /tmp/parity_dyn_r5_ns \
    --train_extra "--steps_per_dispatch 16 --voxel_time_smooth 0"

echo "=== F: parity seed-2 -O (per-step dispatch)"
RETRY_EXTRA=--resume guard f_parity_s2 2400 3 python -u tools/parity.py --family hash \
    --iters 10000 --res 800 --views 50 --preset O --seeds 2 \
    --data $SCENE --workspace /tmp/parity_prod_r4c \
    --train_extra "--lr_warmup 500"
python -u tools/r5/ladder_summary.py

echo "=== G: vm/dense production parity rows (1000 iters, 3 seeds)"
guard g_vox 2400 2 python -u tools/parity.py --family dense,vm --seeds 0,1,2 \
    --iters 1000 --res 800 --views 50 --workspace /tmp/parity_vox_r5 \
    --train_extra "--steps_per_dispatch 16"

echo "=== C: 512^3 uint8-resident render A/B + 4-object frame time"
guard c_render 2400 2 python -u tools/render_bench.py --baked --res 800 \
    --objects 4 --bake_res 512
guard c_render_res 2400 2 python -u tools/render_bench.py --baked --res 800 \
    --objects 4 --bake_res 512 --resident

guard b3_cap 1500 1 python -u tools/quality_exp.py \
    --variants cap84 --seeds 0,1,2 --iters 800

echo "=== I: headline bench refresh (picks up the MFU/roofline line)"
guard i_bench 1800 2 python -u bench.py

echo "=== D2: fused-16 hash A/B retry — LAST, 1 attempt (wedge-prone compile)"
guard d2_ab_fused 2400 1 python -u tools/parity.py --family hash \
    --iters 600 --res 800 --views 50 --preset O --seeds 0 \
    --data $SCENE --workspace /tmp/fusedab_f16 \
    --train_extra "--lr_warmup 500 --steps_per_dispatch 16"
python -u tools/r5/fused_ab_rows.py
python -u tools/r5/ladder_summary.py
echo "DRIVE_CHIP_R5E_DONE"
