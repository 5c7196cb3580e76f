"""Profile the occupancy train step piecewise on the real chip.

Times (fresh inputs per rep, value-fetch sync — see PERF.md pitfalls):
  - march only (ladder, or skip-march with --skip)
  - encode forward only
  - encode forward+backward
  - full forward render (loss value)
  - full train step (grad + adam)
Run: python tools/profile_step.py [slab] [--rays N] [--minsize N]
       [--bwd mxu|sort|hybrid] [--build where|scatter] [--skip]
Variant flags mirror bench.py --hash so the per-leg bisect matches the
exact config being laddered (round-3 backward campaign).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:  # axon sitecustomize force-selects the TPU via
    import os as _os  # jax.config, which beats the env var — set both

    _os.environ["JAX_PLATFORMS"] = "cpu"
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.models.nerf import NeRFConfig
from focnerf_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode, hashgrid_init
from focnerf_tpu.render.renderer import render_rays_occupancy
from focnerf_tpu.train.state import create_train_state, make_optimizer

SLAB = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else 32
N_RAYS = 4096
if "--rays" in sys.argv:
    N_RAYS = int(sys.argv[sys.argv.index("--rays") + 1])
MIN_SIZE = 0
if "--minsize" in sys.argv:
    MIN_SIZE = int(sys.argv[sys.argv.index("--minsize") + 1])
USE_SKIP = "--skip" in sys.argv
MAX_STEPS = 512
REPS = 5


def timeit(name, fn, *args_list):
    """args_list: one tuple of args per rep (fresh inputs defeat dedup)."""
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.time()
    for a in args_list[1:]:
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / (len(args_list) - 1)
    print(f"{name:42s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    import optax

    from bench import build_scene

    from focnerf_tpu.ops import hashgrid as _hg

    if "--bwd" in sys.argv:
        _hg.BACKWARD_MODE = sys.argv[sys.argv.index("--bwd") + 1]
    if "--build" in sys.argv:
        _hg.BACKWARD_ONEHOT_BUILD = sys.argv[sys.argv.index("--build") + 1]
    stoch = 1 if MIN_SIZE else 0
    cfg = NeRFConfig(
        use_objfeat=False, stochastic_corners=stoch,
        stochastic_min_size=MIN_SIZE,
    )
    print(
        f"[profile] rays={N_RAYS} slab={SLAB} minsize={MIN_SIZE} "
        f"bwd={_hg._backward_mode()} build={_hg._onehot_build()} "
        f"skip={USE_SKIP}"
    )
    optimizer = make_optimizer(lr=1e-2, iters=30000)
    state = create_train_state(jax.random.key(0), cfg, optimizer)
    all_o, all_d, all_rgb = build_scene()

    gs = 128
    r = (jnp.arange(gs) + 0.5) / gs * 2 - 1
    X, Y, Z = jnp.meshgrid(r, r, r, indexing="ij")
    occ_bits = ((X**2 + Y**2 + Z**2) < 0.55**2).reshape(1, -1)

    keys = [jax.random.key(i) for i in range(REPS + 1)]
    batches = []
    for k in keys:
        idx = jax.random.randint(k, (N_RAYS,), 0, all_o.shape[0])
        batches.append(
            {"rays_o": all_o[idx], "rays_d": all_d[idx], "pixels": all_rgb[idx]}
        )
    jax.block_until_ready(batches)

    # --- march only
    from focnerf_tpu.core.geometry import near_far_from_aabb
    from focnerf_tpu.ops.marching import march_rays
    from focnerf_tpu.render.renderer import default_aabb

    aabb = default_aabb(cfg)

    occ_skip = None
    if USE_SKIP:
        from focnerf_tpu.ops.occupancy import occupancy_skip_field

        occ_skip = occupancy_skip_field(occ_bits, gs)

    if USE_SKIP:
        from focnerf_tpu.ops.marching import march_rays_skip

        @jax.jit
        def march_only(b, rng):
            nears, fars = near_far_from_aabb(b["rays_o"], b["rays_d"], aabb, 0.2)
            return march_rays_skip(
                b["rays_o"], b["rays_d"], nears, fars, occ_skip,
                bound=cfg.bound, dt_gamma=0.0, max_steps=MAX_STEPS,
                slab=SLAB, rng=rng, perturb=True,
            )
    else:

        @jax.jit
        def march_only(b, rng):
            nears, fars = near_far_from_aabb(b["rays_o"], b["rays_d"], aabb, 0.2)
            return march_rays(
                b["rays_o"], b["rays_d"], nears, fars, occ_bits, bound=cfg.bound,
                dt_gamma=0.0, max_steps=MAX_STEPS, slab=SLAB, rng=rng, perturb=True,
            )

    timeit("march only", march_only, *[(b, k) for b, k in zip(batches, keys)])

    # --- encode fwd only (same #points as slab render)
    spec = cfg.grid_spec  # carries the stochastic settings
    table = hashgrid_init(jax.random.key(1), spec)
    n_pts = N_RAYS * SLAB
    xs = [jax.random.uniform(k, (n_pts, 3)) for k in keys]
    jax.block_until_ready(xs)

    @jax.jit
    def enc_fwd(x, rng):
        return hashgrid_encode(table, x, spec, rng=rng)

    timeit(
        f"encode fwd only ({n_pts} pts)", enc_fwd,
        *[(x, k) for x, k in zip(xs, keys)],
    )

    @jax.jit
    def enc_fwd_bwd(x, rng):
        def f(t):
            return jnp.sum(hashgrid_encode(t, x, spec, rng=rng) ** 2)
        return jax.grad(f)(table)

    timeit(
        "encode fwd+bwd", enc_fwd_bwd, *[(x, k) for x, k in zip(xs, keys)]
    )

    # --- full render fwd
    @jax.jit
    def render_fwd(b, rng):
        out = render_rays_occupancy(
            state.params, cfg, b["rays_o"], b["rays_d"], occ_bits,
            dt_gamma=0.0, max_steps=MAX_STEPS, slab=SLAB, bg_color=1.0,
            rng=rng, perturb=True, occ_skip=occ_skip,
        )
        return jnp.mean((out["image"] - b["pixels"]) ** 2)

    timeit("full forward render+loss", render_fwd, *[(b, k) for b, k in zip(batches, keys)])

    # --- full train step
    def loss_fn(params, batch, rng):
        out = render_rays_occupancy(
            params, cfg, batch["rays_o"], batch["rays_d"], occ_bits,
            dt_gamma=0.0, max_steps=MAX_STEPS, slab=SLAB, bg_color=1.0,
            rng=rng, perturb=True, occ_skip=occ_skip,
        )
        return jnp.mean((out["image"] - batch["pixels"]) ** 2)

    @jax.jit
    def train_step(state, b, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, b, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(params=params, opt_state=opt_state), loss

    def step_fetch(s, b, k):
        s2, l = train_step(s, b, k)
        return float(l)

    timeit("full train step", step_fetch, *[(state, b, k) for b, k in zip(batches, keys)])


if __name__ == "__main__":
    main()
