"""Run the round-3 on-chip measurement queue serially and record results.

ONE TPU client at a time (a second wedges both — memory/verify-skill), so
this runner executes each command to completion before the next, appends
every JSON line + a stdout tail to ONCHIP_QUEUE_RESULTS.md, and keeps
going past failures (a relay blip mid-queue must not lose the rest).

Usage (the moment the relay probe succeeds):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/run_onchip_queue.py
  [--only bench|hash|quality|parity|render]   # subset by tag
  [--timeout 3600]                            # per-command seconds

The queue itself is defined here (kept in sync with ONCHIP_PENDING.log).
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
    # 1. driver-scorecard rows
    ("bench", [sys.executable, "bench.py"], 1800),
    ("bench", [sys.executable, "bench.py", "--dense"], 900),
    ("bench", [sys.executable, "bench.py", "--kplanes"], 900),
    ("bench", [sys.executable, "tools/voxel_bench.py", "--kplanes", "--res",
               "128", "--iters", "300", "--rank", "8", "--sync-every", "50"],
     1800),
    # 2. hash backward A/B ladder (VERDICT item 3)
    ("hash", [sys.executable, "bench.py", "--hash"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--minsize", "1"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--minsize", "1",
              "--bwd", "sort"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--minsize", "1",
              "--bwd", "hybrid"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--minsize", "1",
              "--build", "scatter"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--build", "scatter"],
     1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--bwd", "hybrid"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--int8"], 1200),
    ("hash", [sys.executable, "bench.py", "--hash", "--minsize", "1",
              "--bwd", "sort", "--fold"], 1200),
    # FIRST of the long tail (most important evidence, VERDICT item 2a):
    # production parity ladders on the hard scene — explicit multi-hour
    # timeout (tmo=None would fall back to the 2 h default and SIGKILL the
    # most important measurement mid-ladder). Runs before render/quality so
    # a wall-clock overrun elsewhere cannot starve it.
    ("parity_prod", [sys.executable, "tools/parity.py", "--family", "all",
                     "--preset", "both", "--seeds", "0,1,2", "--iters",
                     "10000", "--res", "800", "--views", "50", "--workspace",
                     "/tmp/parity_prod"], 21600),
    # 6. uint8-resident render A/B at 512^3
    ("render", [sys.executable, "tools/render_bench.py", "--baked", "--res",
                "800", "--objects", "4", "--bake_res", "512"], 3600),
    ("render", [sys.executable, "tools/render_bench.py", "--baked", "--res",
                "800", "--objects", "4", "--bake_res", "512", "--resident"],
     3600),
    # dynamic-family parity on the multi-view-per-t scene (unambiguous
    # per-t held-out PSNR; ~30-60 min)
    ("parity", [sys.executable, "tools/parity.py", "--family",
                "kplanes,dynvoxel", "--seeds", "0,1,2", "--iters", "3000",
                "--res", "400", "--views", "32", "--workspace",
                "/tmp/parity_dyn"], 7200),
    # 3. quality gates for promoted variants (on-chip confirmation of the
    # CPU 3-seed gate; chip-independent math, lowest priority)
    ("quality", [sys.executable, "tools/quality_exp.py", "--variants",
                 "fast,allstoch", "--seeds", "0,1,2"], 5400),
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--timeout", type=int, default=7200)
    ap.add_argument("--skip-probe", action="store_true")
    args = ap.parse_args()

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
        try:
            r = subprocess.run(
                argv, cwd=REPO, timeout=tmo or args.timeout,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            body = r.stdout
            status = f"rc={r.returncode}"
        except subprocess.TimeoutExpired as e:
            body = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            status = f"TIMEOUT {tmo or args.timeout}s"
        tail = "\n".join(body.strip().splitlines()[-12:])
        print(tail, flush=True)
        with open(OUT, "a") as log:
            log.write(f"\n### [{tag}] `{cmd}` — {status}\n```\n{tail}\n```\n")
    print(f"\nresults appended to {OUT}", flush=True)


if __name__ == "__main__":
    main()
