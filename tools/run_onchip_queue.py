"""Run the round-4 on-chip measurement queue serially and record results.

ONE TPU client at a time (a second wedges both — memory/verify-skill), so
this runner executes each command to completion before the next, appends
every JSON line + a stdout tail to ONCHIP_QUEUE_RESULTS.md, and keeps
going past failures (a relay blip mid-queue must not lose the rest).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/run_onchip_queue.py
  [--only hash|profile|parity_dyn|render|parity_vox|bench]  # subset by tag
  [--timeout 3600]                            # per-command seconds
  [--wait-pid P]                              # block until pid P exits
                                              # (serialize behind a ladder
                                              # already holding the chip)

Round-4 ordering (VERDICT r3): the production hash parity ladder runs
OUTSIDE this queue (tools/parity.py, launched first — it owns the chip;
--wait-pid serializes behind it); then the hash perf ladder with the new
gradphase/capacity axes (item 2), profile bisect (item 2), dynamic-family
quality campaign (item 3), 512^3 uint8-resident render A/B (item 4),
vm/dense parity rows, and a final default-bench refresh.
"""

from __future__ import annotations

import argparse
import datetime
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (tag, argv, per-command timeout override or None)
QUEUE = [
    # 1. hash perf ladder — the 400k push (VERDICT r3 item 2). New round-4
    # axes: alternating level-subset backward (gradphase) and capacity
    # shapes (fewer/wider levels halve the gather rows at constant feature
    # count). Baseline row first so same-session comparisons are in-family.
    ("hash", [sys.executable, "bench.py", "--hash"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--gradphase", "2"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--gradphase", "4"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--levels", "8",
              "--featdim", "4"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--levels", "8"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--gradphase", "2",
              "--levels", "8", "--featdim", "4"], 1200),
    # most aggressive composition: if gradphase-2 x capacity stacks
    # multiplicatively this is the 400k candidate (encode-bwd ~12 ms)
    ("hash", [sys.executable, "bench.py", "--hash", "--gradphase", "4",
              "--levels", "8", "--featdim", "4"], 1200),
    # coarse-to-fine stage step speeds (full 16-level table, truncated
    # encode — exactly what a trainer c2f stage compiles)
    ("hash", [sys.executable, "bench.py", "--hash", "--c2f", "8"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--c2f", "12"], 1200),
    # 2. per-leg bisect of the promoted config (queue item 7 from round 3)
    ("profile", [sys.executable, "tools/profile_step.py", "16", "--rays",
                 "32768", "--minsize", "1", "--skip"], 1800),
    # 2b. per-sample inference fps at 256^2 (VERDICT r3 item 8: >=1 fps;
    # the 800^2 probe measured iterative 3.7x over oneshot — this is the
    # usability row at the quality-eval resolution)
    ("evalprobe", [sys.executable, "tools/eval_probe.py", "--res", "256"],
     1800),
    # 3. dynamic-family quality campaign (VERDICT r3 item 3): multi-view-
    # per-timestamp hard scene, production budget, time-smoothness on for
    # dynvoxel (flag is a no-op for kplanes' shared-plane structure).
    ("parity_dyn", [sys.executable, "tools/parity.py", "--family",
                    "kplanes,dynvoxel", "--seeds", "0,1,2", "--iters",
                    "3000", "--res", "400", "--views", "32", "--workspace",
                    "/tmp/parity_dyn", "--train_extra",
                    "--steps_per_dispatch 16"], 10800),
    # 4. uint8-resident render A/B at 512^3 + 4-object 800^2 frame time
    # (VERDICT r3 item 4 — replaces both "designed expectation" entries)
    ("render", [sys.executable, "tools/render_bench.py", "--baked", "--res",
                "800", "--objects", "4", "--bake_res", "512"], 3600),
    ("render", [sys.executable, "tools/render_bench.py", "--baked", "--res",
                "800", "--objects", "4", "--bake_res", "512", "--resident"],
     3600),
    # 5. vm/dense production parity rows (hash rows run outside this queue).
    # 1000 iters: the VM family converges by ~300 (PARITY.md 256^3 row);
    # 10k-iter voxel rows would cost ~3 h/run on the relay python-loop.
    ("parity_vox", [sys.executable, "tools/parity.py", "--family",
                    "dense,vm", "--seeds", "0,1,2", "--iters", "1000",
                    "--res", "800", "--views", "50", "--workspace",
                    "/tmp/parity_vox", "--train_extra",
                    "--steps_per_dispatch 16"], 14400),
    # 6. refresh the default headline artifact (dual-headline JSON)
    ("bench", [sys.executable, "bench.py"], 1800),
]

OUT = os.path.join(REPO, "ONCHIP_QUEUE_RESULTS.md")


def probe(timeout_s: int = 150) -> bool:
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def _run_with_stall_guard(argv, timeout_s, stall_s=900):
    """Run one queue command, killing it EARLY if it produces no output for
    ``stall_s`` — a wedged PJRT client (futex-blocked first RPC, zero CPU;
    PERF.md round-4 relay-wedge note) would otherwise burn the full
    per-command timeout. Healthy bench/parity commands print at least every
    few minutes (epoch lines, bench JSON, compile banners)."""
    import threading
    import time

    p = subprocess.Popen(
        argv, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    chunks = []
    last = [time.monotonic()]

    def _pump():
        for line in p.stdout:
            chunks.append(line)
            last[0] = time.monotonic()

    t = threading.Thread(target=_pump, daemon=True)
    t.start()
    t0 = time.monotonic()
    while True:
        if p.poll() is not None:
            t.join(timeout=10)
            return "".join(chunks), f"rc={p.returncode}"
        now = time.monotonic()
        if now - t0 > timeout_s:
            p.kill()
            return "".join(chunks), f"TIMEOUT {timeout_s}s"
        if now - last[0] > stall_s:
            p.kill()
            return "".join(chunks), f"STALLED {stall_s}s no-output (wedge guard)"
        time.sleep(5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--timeout", type=int, default=7200)
    ap.add_argument("--skip-probe", action="store_true")
    ap.add_argument("--wait-pid", type=int, default=0,
                    help="block until this pid exits (serialize behind a "
                         "ladder already holding the single-client chip)")
    args = ap.parse_args()

    if args.wait_pid:
        import time
        print(f"waiting for pid {args.wait_pid} to release the chip...",
              flush=True)
        while os.path.exists(f"/proc/{args.wait_pid}"):
            time.sleep(30)
        print("chip free — starting queue", flush=True)

    if not args.skip_probe and not probe():
        print("relay DOWN — nothing run", flush=True)
        sys.exit(3)

    tags = set(args.only.split(",")) if args.only else None
    with open(OUT, "a") as log:
        log.write(
            f"\n## queue run {datetime.datetime.utcnow().isoformat()}Z\n"
        )
    for tag, argv, tmo in QUEUE:
        if tags and tag not in tags:
            continue
        cmd = " ".join(argv[1:])
        print(f"=== [{tag}] {cmd}", flush=True)
        body, status = _run_with_stall_guard(argv, tmo or args.timeout)
        tail = "\n".join(body.strip().splitlines()[-12:])
        print(tail, flush=True)
        with open(OUT, "a") as log:
            log.write(f"\n### [{tag}] `{cmd}` — {status}\n```\n{tail}\n```\n")
    print(f"\nresults appended to {OUT}", flush=True)


if __name__ == "__main__":
    main()
