"""Benchmark: training throughput (rays/sec) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 1e7 rays/sec/chip (BASELINE.md north star).

Design notes for the tunneled-TPU environment: identical repeated dispatches
can be deduplicated by the relay, so every step derives fresh rng/batches
from the step index, and losses are value-fetched to force real sync. Batch
sampling happens INSIDE the jitted step (no host round-trips in the hot
path). A python loop over jitted steps is used deliberately: wrapping the
step in lax.fori_loop measured 10x SLOWER on v5e (the nested scan of the MXU
hash-grid backward compiles pathologically inside an outer loop), while
per-step dispatch overhead is only ~1.6 ms against a ~330 ms step.

The default headline measures the flagship VM-FACTORIZED VOXEL family
(train/voxel_vm.py, TensoRF-style rank-16 planes x vectors): the field is
collapsed by three dense einsums and descended through the differentiable
shear-warp compositor with intermediate-plane supervision of 800^2 views —
the TPU-first training path with no per-sample random access (PERF.md
"voxel backward bisect"). VM is the quality-gated shipping config (VERDICT
r2: it dominates dense at equal step cost, +11.7 dB held-out at 256^3).
rays/s counts ri^2 supervised intermediate rays per step (each is one
primary ray through the eye), measured as folded lax.fori_loop dispatches
with a scalar fetch per dispatch (the voxel step has no nested-scan
pathology, and at ~5 ms/step folding is the only relay-proof harness).

The default run ALSO measures the hash-grid reference-parity family and
emits it as a nested "hash_row" in the same JSON line, so every BENCH
artifact carries both the flagship and the reference-parity number
(VERDICT r2 next-round item 1). `--hash` / `--dense` / `--vm` / `--dyn` /
`--kplanes` measure a single family.
"""

import json
import os
import sys
import time

if "--dp" in sys.argv:
    # DP-scaling mode runs on a virtual host-device mesh (the one physical
    # chip cannot host a multi-device mesh); set platform before jax import
    _n = int(sys.argv[sys.argv.index("--dp") + 1])
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={_n}"
        ).strip()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from focnerf_tpu.core.camera import rand_poses
from focnerf_tpu.core.rays import get_rays
from focnerf_tpu.models.nerf import NeRFConfig
from focnerf_tpu.train.state import create_train_state, make_optimizer
from focnerf_tpu.train.steps import make_train_step

N_RAYS = 32768  # TPU wants big batches; rays/s plateaus above this (PERF.md)
SLAB = 16  # per-ray sample budget: the steady-state bucket of the bucketed
# slab schedule once the occupancy grid has matured (ref mean_count ~16-32)
MAX_STEPS = 512
WARMUP_STEPS = 2
BENCH_STEPS = 10
BASELINE_RAYS_PER_SEC = 1.0e7


def build_scene():
    """Synthetic sphere scene fully resident on device."""
    H = W = 64
    fx = 80.0
    poses = rand_poses(np.random.default_rng(0), 8, radius=2.5)
    all_o, all_d, all_rgb = [], [], []
    for p in poses:
        rays = get_rays(jnp.asarray(p), (fx, fx, W / 2, H / 2), H, W)
        o, d = np.asarray(rays["rays_o"]), np.asarray(rays["rays_d"])
        b = np.sum(o * d, -1)
        c = np.sum(o * o, -1) - 0.25
        disc = b * b - c
        t = -b - np.sqrt(np.maximum(disc, 0))
        hit = (disc > 0) & (t > 0)
        pt = o + t[:, None] * d
        rgb = np.ones((o.shape[0], 3), np.float32)
        rgb[hit] = np.where(pt[hit, 1:2] > 0, [[0.9, 0.2, 0.1]], [[0.1, 0.3, 0.9]])
        all_o.append(o)
        all_d.append(d)
        all_rgb.append(rgb)
    return (
        jnp.asarray(np.concatenate(all_o)),
        jnp.asarray(np.concatenate(all_d)),
        jnp.asarray(np.concatenate(all_rgb)),
    )


def bench_dp(n_devices: int):
    """DP scaling record on an n-device virtual CPU mesh (VERDICT #7): the
    sharded occupancy step vs the same step on a 1-device mesh. CPU numbers
    are for the *scaling curve*, not absolute throughput (that's the main
    bench on the chip)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from focnerf_tpu.models.nerf import NeRFConfig
    from focnerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from focnerf_tpu.parallel.sharding import make_sharded_train_step_occupancy
    from focnerf_tpu.train.state import create_train_state, make_optimizer

    cfg = NeRFConfig(use_objfeat=False, compute_dtype=jnp.float32, stochastic_corners=1)
    all_o, all_d, all_rgb = build_scene()
    gs = 128
    r = (jnp.arange(gs) + 0.5) / gs * 2 - 1
    X, Y, Z = jnp.meshgrid(r, r, r, indexing="ij")
    occ_bits = ((X**2 + Y**2 + Z**2) < 0.55**2).reshape(1, -1)

    def run(n, n_rays):
        """rays/s of the sharded occupancy step on an n-device mesh."""
        mesh = make_mesh(n)
        optimizer = make_optimizer(lr=1e-2, iters=30000)
        state = create_train_state(jax.random.key(0), cfg, optimizer)
        state = replicate(state, mesh)
        step = make_sharded_train_step_occupancy(
            cfg, optimizer, mesh, dt_gamma=0.0, max_steps=MAX_STEPS, slab=SLAB
        )
        steps = 4
        for i in range(2):
            idx = np.random.default_rng(i).integers(0, all_o.shape[0], n_rays)
            batch = shard_batch(
                {"rays_o": all_o[idx], "rays_d": all_d[idx], "pixels": all_rgb[idx]},
                mesh,
            )
            state, m = step(state, batch, occ_bits, jax.random.key(i))
        jax.block_until_ready(m["loss"])
        t0 = time.time()
        for i in range(steps):
            idx = np.random.default_rng(100 + i).integers(0, all_o.shape[0], n_rays)
            batch = shard_batch(
                {"rays_o": all_o[idx], "rays_d": all_d[idx], "pixels": all_rgb[idx]},
                mesh,
            )
            state, m = step(state, batch, occ_bits, jax.random.key(100 + i))
            _ = float(m["loss"])
        return n_rays * steps / (time.time() - t0)

    r1 = run(1, N_RAYS)
    r_weak = run(n_devices, N_RAYS * n_devices)  # per-device batch constant
    r_strong = run(n_devices, N_RAYS)  # global batch constant
    print(
        json.dumps(
            {
                "metric": "train_dp_scaling_cpu_mesh",
                "n_devices": n_devices,
                "rays_per_sec_1dev": round(r1, 1),
                "rays_per_sec_weak": round(r_weak, 1),
                "weak_scaling_efficiency": round(r_weak / (r1 * n_devices), 3),
                "rays_per_sec_strong": round(r_strong, 1),
                "strong_scaling_efficiency": round(r_strong / (r1 * n_devices), 3),
                "unit": "rays/s",
            }
        )
    )


def bench_voxel(
    dynamic: bool = False,
    vm: bool = False,
    kplanes: bool = False,
    emit: bool = True,
    R: int = 128,
    H: int = 800,
    FOLD: int = 16,
    ri_mult: int = 2,
):
    """Headline: dense voxel family train step, folded-dispatch timing.

    ``dynamic=True`` (bench.py --dyn) measures the time-factorized family
    (train/voxel_dynamic.py, rank 4): the GT sphere slides along x with t
    and each pose supervises at its own time. ``vm=True`` (bench.py --vm)
    measures the VM-factorized family (train/voxel_vm.py, rank 16).
    ``kplanes=True`` (bench.py --kplanes) measures the six-plane space-time
    family (train/voxel_kplanes.py, rank 8) on the same moving-sphere GT.
    """
    import optax

    from focnerf_tpu.core.camera import rand_poses
    from focnerf_tpu.render.baked import (
        BakedVolume,
        _composite_core,
        render_baked,
        warp_gt_to_intermediate,
    )
    from focnerf_tpu.train.voxel import (
        _pose_variant,
        field_to_volume,
        init_voxel_field,
        tv_loss,
    )

    W = H
    # ri_mult=2: bandwidth-matched supervision (Nyquist of a 128^3 field);
    # ri_mult=6: 768^2 ~ sensor-matched to the 800^2 image (VERDICT r3
    # item 7 — the default artifact quotes BOTH so the headline's ray
    # accounting is unambiguous)
    RI = ri_mult * R

    # striped-sphere GT volume, views rendered on device (no d2h)
    c = (jnp.arange(R) + 0.5) / R * 2 - 1
    X, Y, Z = jnp.meshgrid(c, c, c, indexing="ij")

    dynamic = dynamic or kplanes  # kplanes trains on the moving GT too

    def gt_volume(t: float) -> BakedVolume:
        cx = (0.6 * t - 0.3) if dynamic else 0.0
        d = jnp.sqrt((X - cx) ** 2 + Y**2 + Z**2)
        sigma = jnp.where(d < 0.45, 30.0, 0.0)
        stripes = 0.5 + 0.5 * jnp.sin(8 * jnp.arctan2(Y, X - cx))
        rgb = jnp.stack([stripes, jnp.clip(Z + 0.5, 0, 1), 1 - stripes], -1)
        return BakedVolume(
            rgba=jnp.concatenate([rgb, sigma[..., None]], -1), bound=1.0
        )

    f = 1.25 * H
    intr = (f, f, H / 2.0, W / 2.0)
    intr_dev = jnp.asarray(intr, jnp.float32)
    all_poses = np.asarray(rand_poses(np.random.default_rng(0), 40, radius=2.5))
    key0 = _pose_variant(all_poses[0], 1.0)
    axis, flip = key0
    poses = np.stack([p for p in all_poses if _pose_variant(p, 1.0) == key0])[:8]
    P = poses.shape[0]
    poses_dev = jnp.asarray(poses)
    times_np = np.linspace(0.0, 1.0, P).astype(np.float32)
    times_dev = jnp.asarray(times_np)

    warped = []
    for p, t in zip(poses, times_np):
        img, _, _ = render_baked(gt_volume(float(t)), p, intr, H, W)
        warped.append(
            warp_gt_to_intermediate(
                img, p, intr_dev, 1.0, axis=axis, flip=flip, ri=RI
            )
        )
    wgts = jnp.stack([w for w, _ in warped])
    masks = jnp.stack([m for _, m in warped])
    jax.block_until_ready(wgts)

    optimizer = optax.adam(5e-2)

    if kplanes:
        from focnerf_tpu.train.voxel_kplanes import (
            collapse_kplanes,
            init_kplanes_field,
            kplanes_tv_loss,
        )
    elif dynamic:
        from focnerf_tpu.train.voxel_dynamic import (
            collapse_field,
            init_dyn_voxel_field,
        )
    if vm:
        from focnerf_tpu.train.voxel_vm import (
            collapse_vm,
            init_vm_field,
            vm_tv_loss,
        )

    def loss_fn(params, pose, t, wgt, mask):
        if kplanes:
            raw = collapse_kplanes(params, t)
            reg = 1e-5 * kplanes_tv_loss(params)
        elif dynamic:
            raw = collapse_field(params, t)
            reg = 1e-5 * (
                tv_loss(params.base)
                + jnp.mean(jax.vmap(tv_loss)(params.deltas))
            )
        elif vm:
            raw, reg = collapse_vm(params), 1e-5 * vm_tv_loss(params)
        else:
            raw, reg = params, 1e-5 * tv_loss(params)
        vol = field_to_volume(raw, 1.0, 0)
        C, T, _, _ = _composite_core(
            vol.rgba, 1.0, pose, axis=axis, flip=flip, ri=RI, density_scale=1.0,
            remat=True,
        )
        img_i = C + T[..., None]  # white bg
        m = mask[..., None]
        mse = jnp.sum(m * (img_i - wgt) ** 2) / (
            3.0 * jnp.maximum(jnp.sum(mask), 1.0)
        )
        return mse + reg, mse

    @jax.jit
    def fold(params, opt_state, start):
        def body(i, carry):
            params, opt_state, _ = carry
            v = (start + i) % P
            (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, poses_dev[v], times_dev[v], wgts[v], masks[v]
            )
            updates, opt_state = optimizer.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, mse

        return jax.lax.fori_loop(0, FOLD, body, (params, opt_state, jnp.float32(1.0)))

    if kplanes:
        params = init_kplanes_field(R, rank=8, rng=jax.random.key(0))
    elif dynamic:
        params = init_dyn_voxel_field(R, rank=4, rng=jax.random.key(0))
    elif vm:
        params = init_vm_field(R, rank=16, rng=jax.random.key(0))
    else:
        params = init_voxel_field(R, rng=jax.random.key(0))
    opt_state = optimizer.init(params)
    params, opt_state, mse = fold(params, opt_state, jnp.int32(0))
    mse0 = float(mse)  # warmup/compile + sanity fetch
    times = []
    for rep in range(3):
        t0 = time.time()
        params, opt_state, mse = fold(params, opt_state, jnp.int32(rep + 1))
        mse_last = float(mse)  # scalar fetch forces real sync
        times.append(time.time() - t0)
    per_step = min(times) / FOLD
    rays_per_sec = RI * RI / per_step
    assert np.isfinite(mse_last) and mse_last < mse0, (mse0, mse_last)
    try:  # roofline anchor (VERDICT r4 item 6); never erases the headline
        from focnerf_tpu.utils.flops import roofline

        roof = roofline(
            fold, params, opt_state, jnp.int32(0),
            step_seconds=per_step, steps_per_program=FOLD,
        )
        roof_row = {
            "mfu": round(roof["mfu"], 4),
            "achieved_tflops": round(roof["achieved_tflops"], 2),
            "gather_gbps": round(roof["gather_gbps"], 2),
            "hbm_gather_util": round(roof["hbm_gather_util"], 4),
            "peak": "v5e 197 bf16 TFLOP/s, 819 GB/s HBM",
        }
        if roof["lower_bound"]:
            roof_row["note"] = "dynamic while in program: counts are lower bounds"
    except Exception as e:
        roof_row = {"error": f"{type(e).__name__}: {e}"[:200]}
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
        "family": (
            "kplanes_shearwarp_rank8" if kplanes
            else "dyn_voxel_shearwarp_rank4" if dynamic
            else "vm_voxel_shearwarp_rank16" if vm
            else "dense_voxel_shearwarp"
        ),
        "config": {"field": R, "image": H, "ri": RI, "fold": FOLD},
        "step_ms": round(per_step * 1e3, 2),
        "roofline": roof_row,
    }
    if emit:
        print(json.dumps(result))
    return result


def bench_hash(emit: bool = True):
    """Reference-parity family throughput.

    A/B variant flags (round-3 backward campaign, PERF.md):
      --minsize N   stochastic_min_size (default 1 = the promoted -O config:
                    ALL levels sample K=1 corners -> pure-gather forward,
                    uniform-K lean backward; N>1 restores the round-2 mixed
                    encode for A/B)
      --bwd MODE    hashgrid.BACKWARD_MODE: mxu | sort | hybrid
      --build MODE  hashgrid.BACKWARD_ONEHOT_BUILD: where | scatter
      --int8        opt-in int8 one-hot backward
    """
    import optax

    from focnerf_tpu.ops import hashgrid
    from focnerf_tpu.render.renderer import render_rays_occupancy

    min_size = 1  # promoted -O value (round-3 on-chip ladder, PERF.md)
    if "--minsize" in sys.argv:
        min_size = int(sys.argv[sys.argv.index("--minsize") + 1])
    # round-4 capacity-shape A/B axes: L levels x F feats/level trades
    # gather ROWS (the measured 8.6 ns/row floor binds both encode legs)
    # against per-row width at constant total feature count — L8F4 halves
    # rows vs the reference L16F2 (gridencoder.cu layout). --slab trades
    # samples/ray against the marcher's budget (mean-count adaptation).
    levels = 16
    featdim = 2
    slab = SLAB
    if "--levels" in sys.argv:
        levels = int(sys.argv[sys.argv.index("--levels") + 1])
    if "--featdim" in sys.argv:
        featdim = int(sys.argv[sys.argv.index("--featdim") + 1])
    if "--slab" in sys.argv:
        slab = int(sys.argv[sys.argv.index("--slab") + 1])
    # >1: alternating level-subset backward (one compiled step per phase,
    # forward exact; ops/hashgrid.py grad_levels). Cuts the 99 ms encode
    # backward ~Nx at the cost of N-step gradient staleness per level.
    gradphase = 0
    if "--gradphase" in sys.argv:
        gradphase = int(sys.argv[sys.argv.index("--gradphase") + 1])
    # steady-state step speed of a coarse-to-fine stage with N active
    # levels (trainer c2f schedule; ops/hashgrid.py hashgrid_encode_c2f).
    # Unlike --levels N this keeps the FULL 16-level spec + table and
    # truncates the encode, exactly what a c2f stage compiles.
    c2f_active = 0
    if "--c2f" in sys.argv:
        c2f_active = int(sys.argv[sys.argv.index("--c2f") + 1])
    if "--bwd" in sys.argv:
        mode = sys.argv[sys.argv.index("--bwd") + 1]
        if mode not in ("mxu", "sort", "hybrid"):  # fail FAST: a typo must
            raise SystemExit(f"--bwd {mode!r}: pick mxu | sort | hybrid")
            # not silently benchmark the sort fallback in a queued run
        hashgrid.BACKWARD_MODE = mode
    if "--build" in sys.argv:
        hashgrid.BACKWARD_ONEHOT_BUILD = sys.argv[sys.argv.index("--build") + 1]
    if "--int8" in sys.argv:
        hashgrid.BACKWARD_INT8 = True
    # first output BEFORE any device RPC: lets queue stall guards tell a
    # wedged PJRT client (silence from the start) from a slow cold compile
    print("[bench] hash family: building model + first dispatch...",
          file=sys.stderr, flush=True)

    # the -O production config (config.py): stochastic-corner hash encode
    # (1 sampled corner per hashed + big dense level during training; eval
    # stays exact) + sphere-trace skip marching
    cfg = NeRFConfig(
        use_objfeat=False, stochastic_corners=1, stochastic_min_size=min_size,
        num_levels=levels, level_dim=featdim, active_levels=c2f_active,
    )
    optimizer = make_optimizer(lr=1e-2, iters=30000)
    state = create_train_state(jax.random.key(0), cfg, optimizer)

    all_o, all_d, all_rgb = build_scene()

    # sphere occupancy (~7% occupied, lego-like): the production train path
    gs = 128
    r = (jnp.arange(gs) + 0.5) / gs * 2 - 1
    X, Y, Z = jnp.meshgrid(r, r, r, indexing="ij")
    occ_bits = ((X**2 + Y**2 + Z**2) < 0.55**2).reshape(1, -1)
    from focnerf_tpu.ops.occupancy import occupancy_skip_field

    occ_skip = occupancy_skip_field(occ_bits, gs)

    def make_step(step_cfg):
        def loss_fn(params, batch, rng):
            out = render_rays_occupancy(
                params, step_cfg, batch["rays_o"], batch["rays_d"], occ_bits,
                dt_gamma=0.0, max_steps=MAX_STEPS, slab=slab, bg_color=1.0,
                rng=rng, perturb=True, occ_skip=occ_skip,
            )
            return jnp.mean((out["image"] - batch["pixels"]) ** 2)

        @jax.jit
        def train_step(state, rng):
            idx = jax.random.randint(jax.random.fold_in(rng, 1), (N_RAYS,), 0, all_o.shape[0])
            batch = {"rays_o": all_o[idx], "rays_d": all_d[idx], "pixels": all_rgb[idx]}
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state._replace(params=params, opt_state=opt_state, step=state.step + 1), loss

        return train_step

    if gradphase > 1:
        import dataclasses as _dc

        phase_steps = [
            make_step(_dc.replace(
                cfg,
                grad_levels=tuple(
                    l for l in range(levels) if l % gradphase == p
                ),
            ))
            for p in range(gradphase)
        ]
        _calls = [0]

        def train_step(st, rng):
            fn = phase_steps[_calls[0] % gradphase]
            _calls[0] += 1
            return fn(st, rng)
    else:
        train_step = make_step(cfg)

    fold = "--fold" in sys.argv
    if fold:
        # folded fori_loop dispatch (one compiled program of BENCH_STEPS
        # steps, scalar fetch per dispatch). Round-2 measured this 10x
        # SLOWER for the MXU backward (its chunk scan compiles
        # pathologically inside an outer loop) — viable for scan-free
        # configs only (--minsize 1 --bwd sort): pure-gather forward +
        # argsort backward, no nested scan. A/B flag, not the default.
        @jax.jit
        def fold_steps(state, base):
            def body(i, carry):
                st, _ = carry
                return train_step(st, jax.random.fold_in(base, i))

            return jax.lax.fori_loop(
                0, BENCH_STEPS, body, (state, jnp.float32(0.0))
            )

        state, loss = fold_steps(state, jax.random.key(0))
        _ = float(loss)  # warmup/compile
        t0 = time.time()
        state, loss = fold_steps(state, jax.random.key(1))
        _ = float(loss)
        dt = time.time() - t0
    else:
        # warmup + compile — must cover EVERY phase variant (gradphase N
        # round-robins N distinct compiled steps; warming fewer than N puts
        # compiles inside the timed loop) and print progress per compile
        # (queue stall guards kill silent commands; a cold-cache gradphase-4
        # warmup is ~20 min of otherwise-silent compilation)
        n_warm = max(WARMUP_STEPS, gradphase)
        for i in range(n_warm):
            state, loss = train_step(state, jax.random.key(i))
            jax.block_until_ready(loss)
            print(f"[bench] warmup/compile {i + 1}/{n_warm}",
                  file=sys.stderr, flush=True)
        # keep the timed loop phase-aligned with the warmup start
        if gradphase > 1:
            _calls[0] = 0

        t0 = time.time()
        for i in range(BENCH_STEPS):
            state, loss = train_step(state, jax.random.key(100 + i))
            loss = float(loss)  # full fetch: honest sync, defeats relay dedup
        dt = time.time() - t0

    rays_per_sec = N_RAYS * BENCH_STEPS / dt
    try:  # roofline anchor (VERDICT r4 item 6)
        from focnerf_tpu.utils.flops import roofline

        # count the program actually dispatched per step: phase 0's step
        # for gradphase (representative; later phases differ only in which
        # level-subset gets gradients), the folded program / BENCH_STEPS
        # for --fold
        if fold:
            roof = roofline(
                fold_steps, state, jax.random.key(0),
                step_seconds=dt / BENCH_STEPS, steps_per_program=BENCH_STEPS,
            )
        else:
            fn = phase_steps[0] if gradphase > 1 else train_step
            roof = roofline(
                fn, state, jax.random.key(0), step_seconds=dt / BENCH_STEPS
            )
        roof_row = {
            "mfu": round(roof["mfu"], 4),
            "achieved_tflops": round(roof["achieved_tflops"], 2),
            "gather_gbps": round(roof["gather_gbps"], 2),
            "hbm_gather_util": round(roof["hbm_gather_util"], 4),
            "peak": "v5e 197 bf16 TFLOP/s, 819 GB/s HBM",
        }
        if roof["lower_bound"]:
            roof_row["note"] = "dynamic while in program: counts are lower bounds"
    except Exception as e:
        roof_row = {"error": f"{type(e).__name__}: {e}"[:200]}
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
        "family": "hashgrid_ngp_occupancy",
        "config": {
            "n_rays": N_RAYS, "slab": slab, "steps": BENCH_STEPS,
            "minsize": min_size, "levels": levels, "featdim": featdim,
            "gradphase": gradphase, "c2f": c2f_active,
            "bwd": hashgrid._backward_mode(),
            "build": hashgrid._onehot_build(),
            "int8": hashgrid._backward_int8(),
            "fold": fold,
        },
        "step_ms": round(dt / BENCH_STEPS * 1e3, 2),
        "roofline": roof_row,
    }
    assert np.isfinite(loss), f"bench produced non-finite loss: {loss}"
    if emit:
        print(json.dumps(result))
    return result


def _probe_backend(timeout_s: int = 150) -> None:
    """Fail FAST with one parseable JSON line when the TPU relay is down.

    The axon relay can be unavailable for hours (jax.devices() hangs for
    ~20 min before raising UNAVAILABLE); probing in a subprocess with a
    hard timeout turns that into an immediate, diagnosable bench record
    instead of a hung/empty artifact."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        print(json.dumps({
            "metric": "train_rays_per_sec_per_chip",
            "value": 0.0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
            "error": "TPU backend unavailable (relay down) — see "
                     "ONCHIP_PENDING.log; last good headline in PERF.md",
        }))
        sys.exit(3)


if __name__ == "__main__":
    if "--dp" not in sys.argv:  # --dp runs on host devices, no relay needed
        _probe_backend()
    if "--dp" in sys.argv:
        bench_dp(int(sys.argv[sys.argv.index("--dp") + 1]))
    elif "--hash" in sys.argv:
        bench_hash()
    elif "--dyn" in sys.argv:
        bench_voxel(dynamic=True)
    elif "--vm" in sys.argv:
        bench_voxel(vm=True)
    elif "--kplanes" in sys.argv:
        bench_voxel(kplanes=True)
    elif "--dense" in sys.argv:
        bench_voxel()
    else:
        # default artifact: flagship (VM rank-16, the quality-gated shipping
        # config) headline + the hash-grid reference-parity row, ONE line
        headline = bench_voxel(vm=True, emit=False)
        try:
            sm = bench_voxel(vm=True, emit=False, ri_mult=6)
            headline["sensor_matched"] = {
                "value": sm["value"], "unit": sm["unit"],
                "vs_baseline": sm["vs_baseline"], "ri": sm["config"]["ri"],
                "step_ms": sm["step_ms"],
            }
        except Exception as e:  # secondary rows must never erase the headline
            headline["sensor_matched"] = {"error": f"{type(e).__name__}: {e}"[:300]}
        try:
            headline["hash_row"] = bench_hash(emit=False)
        except Exception as e:
            headline["hash_row"] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(headline))
