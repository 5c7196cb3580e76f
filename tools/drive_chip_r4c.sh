#!/bin/bash
# Round-4 chip schedule, session-3 continuation. Serializes behind the
# running queue chunk B (hash perf ladder, pid in /tmp/queue_b.pid), then:
#   1. fused-dispatch speed probe: 600-iter production-config hash run
#      with --steps_per_dispatch 16 vs the measured ~120 ms/step per-step
#      baseline (PERF.md round-4 dispatch anatomy) — cheap, and every
#      later parity minute rides the answer
#   2. parity seed-0 EXACT preset (the missing half of the seed-0
#      exact-vs-O delta, VERDICT r3 item 1) with the fused dispatch
#   3. render A/B chunk C (512^3 uint8-resident, VERDICT item 4)
#   4. parity seed-1 both presets (fused)
#   5. dynamic campaign chunk E (VERDICT item 3)
#   6. vox parity + bench refresh chunk G
#   7. parity seed-2 both presets (sacrificial if the clock runs out)
cd /root/repo
if [ -f /tmp/queue_b.pid ]; then
  while kill -0 "$(cat /tmp/queue_b.pid)" 2>/dev/null; do sleep 30; done
fi
Q="python -u tools/run_onchip_queue.py --skip-probe"
P="python -u tools/parity.py --family hash --res 800 --views 50 --workspace /tmp/parity_prod_r4c"
X="--lr_warmup 500 --steps_per_dispatch 16"

echo "=== 1: fused-dispatch speed probe (600 iters, production config)"
$P --iters 600 --preset O --seeds 0 --train_extra "--lr_warmup 500"
$P --iters 600 --preset O --seeds 0 --train_extra "$X"
echo "=== 2: parity seed-0 exact, fused"
$P --iters 10000 --preset exact --seeds 0 --train_extra "$X"
echo "=== 3: render A/B (512^3 uint8-resident)"
$Q --only render
echo "=== 4: parity seed-1 both presets, fused"
$P --iters 10000 --preset both --seeds 1 --train_extra "$X"
echo "=== 5: dynamic campaign"
$Q --only parity_dyn
echo "=== 6: vox parity + bench refresh"
$Q --only parity_vox,bench
echo "=== 7: parity seed-2 both presets, fused"
$P --iters 10000 --preset both --seeds 2 --train_extra "$X"
echo "DRIVE_CHIP_R4C_DONE"
