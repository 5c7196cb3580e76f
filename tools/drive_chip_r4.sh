#!/bin/bash
# Round-4 chip schedule: prioritized chunks, each landing incremental rows.
cd /root/repo
par() {
  python -u tools/parity.py --family hash --iters 10000 --res 800 \
    --views 50 --train_extra "--lr_warmup 500" \
    --workspace /tmp/parity_prod_r4 --preset both --seeds "$1"
}
Q="python -u tools/run_onchip_queue.py --skip-probe"
echo "=== chunk A: production exact-vs-O delta, seed 0 (the collapse seed)"
par 0
echo "=== chunk B: hash perf ladder + profile bisect + 256^2 eval probe"
$Q --only hash,profile,evalprobe
echo "=== chunk C: 512^3 uint8-resident render A/B (4-object 800^2)"
$Q --only render
echo "=== chunk D: parity seed 1 pair"
par 1
echo "=== chunk E: dynamic-family campaign"
$Q --only parity_dyn
echo "=== chunk F: parity seed 2 pair"
par 2
echo "=== chunk G: vm/dense parity + headline refresh"
$Q --only parity_vox,bench
echo "DRIVE_CHIP_DONE"
