"""Re-probe the Pallas fused one-hot backward on the current relay stack.

Round-2 verdict (PERF.md "Negative result: Pallas fused one-hot backward"):
int8 dot_general fell back to a ~500x VPU loop and bf16 timings were
unmeasurable (the relay signaled pallas custom-call completion before
execution finished). The relay has been restarted since; this probe
re-measures both kernel variants against the XLA one-hot path at the
production shape (one hashed 2^19 level, m = 512k entries, C = 2), with
the REQUIRED per-call scalar d2h fetch so enqueue time can't masquerade
as execution time.

  python tools/pallas_probe.py [--m 524288] [--iters 5]

If bf16 lands under ~3 ms/level, wiring BACKWARD_MODE="pallas" is the
hash-family 400k-rays/s lever (8 hashed levels x the saved HBM legs).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, iters):
    # warmup + compile
    out = fn()
    float(jnp.sum(out[:8]))  # forced scalar fetch — see PERF.md trap note
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out[:8]))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=524288)
    ap.add_argument("--size", type=int, default=1 << 19)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--skip-int8", action="store_true")
    args = ap.parse_args()

    # validate up front (ADVICE r3): the XLA leg's spec is derived from
    # --size, so a non-power-of-two would otherwise fail AFTER the Pallas
    # legs already burned their timing runs
    log2_size = int(args.size).bit_length() - 1
    if args.size != 1 << log2_size:
        sys.exit(f"--size must be a power of two (got {args.size})")

    from focnerf_tpu.ops.hashgrid_pallas import hashgrid_bwd_level

    rng = np.random.default_rng(0)
    # both legs cover the SAME entry count: (m // 8) * 8 (ADVICE r3 —
    # the XLA leg consumes 8 corner columns per point)
    n_pts = args.m // 8
    m = n_pts * 8
    r = jnp.asarray(rng.integers(0, args.size, m).astype(np.int32))
    c = jnp.asarray(rng.normal(size=(m, 2)).astype(np.float32))
    # per-entry weights: the XLA leg builds contributions (w x g) inside
    # _encode_bwd_mxu, so the Pallas timing path must include an
    # equivalent build step to stay apples-to-apples (ADVICE r3)
    w_flat = jnp.asarray(rng.uniform(size=(m, 1)).astype(np.float32))

    rows = {}
    # correctness spot-check against numpy scatter on a small prefix
    small_r, small_c = r[:4096], c[:4096]
    ref = np.zeros((args.size, 2), np.float32)
    np.add.at(ref, np.asarray(small_r), np.asarray(small_c))

    for name, use_int8 in (("bf16", False), ("int8", True)):
        if use_int8 and args.skip_int8:
            continue
        out = np.asarray(
            hashgrid_bwd_level(small_r, small_c, size=args.size,
                               use_int8=use_int8)
        )
        rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)

        def pallas_leg(u=use_int8):
            # contribution build (w x g broadcast) timed INSIDE the leg,
            # mirroring _encode_bwd_mxu's internal _contribs step
            contribs = w_flat * c
            return hashgrid_bwd_level(r, contribs, size=args.size,
                                      use_int8=u)

        ms = timed(pallas_leg, args.iters)
        rows[name] = ms
        print(f"pallas/{name}: {ms:.2f} ms/level  (rel err {rel:.4f})",
              flush=True)

    # XLA one-hot reference leg at the same TOTAL entry count: one hashed
    # 2^19 level of the scan-chunked _encode_bwd_mxu body, m entries
    # arranged as the level's 8 corner columns
    from focnerf_tpu.ops import hashgrid as hg

    spec = hg.HashGridSpec.create(
        num_levels=1, level_dim=2, log2_hashmap_size=log2_size,
        base_resolution=512, per_level_scale=2.0,
    )
    if spec.level_size(0) != args.size:
        sys.exit(
            f"--size {args.size} is not a pure hashed level at "
            f"base_resolution=512 (level_size {spec.level_size(0)}); "
            "pick a size >= 512^3's hash cap"
        )
    rows8 = r.reshape(n_pts, 8)
    w = w_flat.reshape(n_pts, 8)
    g = c[:n_pts, :2]

    def xla_leg():
        return hg._encode_bwd_mxu(spec, rows8, w, g, spec.table_rows)

    ms = timed(xla_leg, args.iters)
    print(f"xla/one-hot: {ms:.2f} ms/level", flush=True)
    print({"pallas_ms": rows, "xla_ms": ms}, flush=True)


if __name__ == "__main__":
    main()
