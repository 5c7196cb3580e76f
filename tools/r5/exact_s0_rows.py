"""Round-5 chunk A reporter: append the seed-0 exact rows to PARITY.md.

Only trusts a PSNR that appears AFTER the final ``steps=10000`` train
line — the r4c log already contains an epoch-100 eval (18.51 dB) and a
``steps=10000`` line from the killed run, so a naive last-PSNR grep
would promote a mid-train number as the final row.
"""
import os

LOG = "/tmp/parity_prod_r4c/hashX_s0_background/log_ngp.txt"
O_SEED0 = 19.02279  # PARITY.md hash/O seed 0 @ 10k (r4c)

psnr = None
if os.path.exists(LOG):
    txt = open(LOG).read()
    tail = txt.rsplit("steps=10000 ", 1)
    if len(tail) == 2:
        import re
        m = re.findall(r"PSNR = ([0-9.]+)", tail[1])
        if m:
            psnr = float(m[-1])

rows = []
if psnr is not None:
    rows.append(
        f"| hash/exact seed 0 | hard_800_256 | 10000 | {psnr:.5f} dB "
        f"| r4c-trained (fused-16, lr_warmup 500), resumed@9500 for final eval |"
    )
    rows.append(
        f"| hash/exact | hard_800_256 | 10000 | {psnr:.2f} ± 0.00 dB (n=1) | fused-16 dispatch |"
    )
    rows.append(
        f"| hash exact-vs-O delta (seed 0) | hard_800_256 | 10000 | "
        f"{psnr - O_SEED0:+.2f} dB | exact minus -O ({O_SEED0:.2f}) |"
    )
else:
    rows.append(
        "| hash/exact seed 0 | hard_800_256 | 10000 | FAILED "
        "(no post-completion eval in log) | - |"
    )
with open("/root/repo/PARITY.md", "a") as f:
    for r in rows:
        print(r)
        f.write(r + "\n")
