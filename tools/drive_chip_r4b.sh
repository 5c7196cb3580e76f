#!/bin/bash
# Round-4 chip schedule, REORDERED continuation (supersedes drive_chip_r4.sh).
# Rationale: at measured rates the original A..G order costs ~20h; the
# session has ~12h. Unique evidence classes with ZERO rows so far (hash
# perf ladder, render A/B, dynamic campaign, vox parity) are promoted
# ahead of the expensive seed-1/2 exact parity runs (~3.3h each); seed-2
# exact runs last and is the sacrificial chunk if the clock runs out.
cd /root/repo
# serialize behind the seed-0 exact run currently holding the chip
while kill -0 2400 2>/dev/null; do sleep 60; done
Q="python -u tools/run_onchip_queue.py --skip-probe"
echo "=== chunk B: hash perf ladder + profile bisect + 256^2 eval probe"
$Q --only hash,profile,evalprobe
echo "=== chunk C: 512^3 uint8-resident render A/B (4-object 800^2)"
$Q --only render
echo "=== chunk E: dynamic-family campaign"
$Q --only parity_dyn
echo "=== chunk G: vm/dense parity + headline refresh"
$Q --only parity_vox,bench
echo "=== chunk D: parity both presets, seed 1"
python -u tools/parity.py --family hash --iters 10000 --res 800 \
    --views 50 --train_extra "--lr_warmup 500" \
    --workspace /tmp/parity_prod_r4 --preset both --seeds 1
echo "=== chunk F1: parity -O only, seed 2 (cheap half first)"
python -u tools/parity.py --family hash --iters 10000 --res 800 \
    --views 50 --train_extra "--lr_warmup 500" \
    --workspace /tmp/parity_prod_r4 --preset O --seeds 2
echo "=== chunk F2: parity exact, seed 2 (sacrificial if clock runs out)"
python -u tools/parity.py --family hash --iters 10000 --res 800 \
    --views 50 --train_extra "--lr_warmup 500" \
    --workspace /tmp/parity_prod_r4 --preset exact --seeds 2
echo "DRIVE_CHIP_DONE"
