"""Round-5 chunk D reporter: labeled fused-dispatch A/B (VERDICT r4 item 3).

Extracts steady-state s/epoch from the two arms' logs (epoch 1-2 carry
compile; steady-state = median of epochs >= 3), appends a labeled table
to PERF.md, and writes the E/F ladder decision to /tmp/r5_use_fused:
the 10k-iter seeds-1/2 runs use --steps_per_dispatch 16 only when the
PROJECTED 10k wall (200 steady epochs + the arm's one-time compile
premium) beats per-step. This replaces the anonymous 1114s/1352s pair
(PARITY.md round-4) the verdict flagged.
"""
import re
import statistics


def arm(ws):
    try:
        txt = open(f"{ws}/hashO_s0_background/log_ngp.txt").read()
    except OSError:
        return None
    ts = [float(t) for t in re.findall(r"\[epoch \d+\].*time=([0-9.]+)s", txt)]
    if len(ts) < 4:
        return None
    return {
        "steady": statistics.median(ts[2:]),
        "first": ts[0],
        "second": ts[1],
        "n": len(ts),
    }


ps = arm("/tmp/fusedab_ps")
f16 = arm("/tmp/fusedab_f16")
lines = [
    "",
    "## Round-5 fused-dispatch A/B (labeled, steady-state separated)",
    "",
    "hash -O production config (hard_800_256, 4096 rays/step, 600 iters,",
    "seed 0, --lr_warmup 500; 1 epoch = 50 steps; epochs 1-2 carry the",
    "compile, steady-state = median of epochs 3+):",
    "",
]
use_fused = False
if ps and f16:
    # projected 10k-iter wall: 200 epochs steady + the first-two-epoch
    # compile premium (both arms pay data prep equally)
    proj_ps = 200 * ps["steady"] + (ps["first"] + ps["second"] - 2 * ps["steady"])
    proj_f16 = 200 * f16["steady"] + (f16["first"] + f16["second"] - 2 * f16["steady"])
    use_fused = proj_f16 < proj_ps
    lines += [
        "| arm | steady s/epoch | ms/step | epoch1 (compile) | epoch2 | projected 10k-iter train wall |",
        "|---|---|---|---|---|---|",
        f"| per-step dispatch | {ps['steady']:.2f}s | {ps['steady'] * 20:.1f} | "
        f"{ps['first']:.1f}s | {ps['second']:.1f}s | {proj_ps:.0f}s |",
        f"| fused --steps_per_dispatch 16 | {f16['steady']:.2f}s | {f16['steady'] * 20:.1f} | "
        f"{f16['first']:.1f}s | {f16['second']:.1f}s | {proj_f16:.0f}s |",
        "",
        f"steady-state speedup fused/per-step: {ps['steady'] / f16['steady']:.2f}x; "
        f"10k-projected winner: {'fused-16' if use_fused else 'per-step'} "
        f"(seeds-1/2 ladder rides it).",
    ]
else:
    lines.append(f"A/B incomplete: per-step={ps} fused={f16} (see /tmp/fusedab_*)")
with open("/root/repo/PERF.md", "a") as f:
    f.write("\n".join(lines) + "\n")
with open("/tmp/r5_use_fused", "w") as f:
    f.write("--steps_per_dispatch 16" if use_fused else "")
print("\n".join(lines))
