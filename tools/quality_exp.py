"""Quality/throughput experiment: hash-grid backward & corner-sampling modes.

Trains the occupancy path on a synthetic HIGH-FREQUENCY textured sphere
(checker stripes — stresses the fine hashed levels, which is exactly what the
stochastic-corner mode perturbs) and reports held-out PSNR + step time per
variant:

  exact    : bf16 one-hot MXU backward (round-1 default)
  int8     : int8 one-hot MXU backward
  stoch1   : 1 stochastic corner per hashed level (training only)
  stoch2   : 2 stochastic corners
  stoch1i8 : stoch1 + int8 backward

Eval renders are always exact (no rng to the encoder).
Usage: python tools/quality_exp.py [--iters 800] [--variants exact,int8,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.core.camera import rand_poses
from focnerf_tpu.core.rays import get_rays
from focnerf_tpu.models.nerf import NeRFConfig
from focnerf_tpu.train.state import create_train_state, make_optimizer

N_RAYS = 4096
SLAB = 32
MAX_STEPS = 512


def sphere_rgb(pt):
    """High-frequency procedural texture on the unit-0.5 sphere surface."""
    s = np.sin(24.0 * pt[..., 0]) * np.sin(24.0 * pt[..., 1]) * np.sin(24.0 * pt[..., 2])
    stripes = 0.5 + 0.5 * np.sign(s)
    base = np.stack(
        [0.2 + 0.7 * stripes, 0.3 + 0.4 * (pt[..., 1] > 0), 0.9 - 0.7 * stripes], -1
    )
    return base.astype(np.float32)


def make_views(n_views, H, W, seed):
    fx = 1.25 * W
    poses = rand_poses(np.random.default_rng(seed), n_views, radius=2.5)
    os_, ds_, rgbs_ = [], [], []
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
        rgb[hit] = sphere_rgb(pt[hit])
        os_.append(o); ds_.append(d); rgbs_.append(rgb)
    return (
        jnp.asarray(np.concatenate(os_)),
        jnp.asarray(np.concatenate(ds_)),
        jnp.asarray(np.concatenate(rgbs_)),
    )


def run_variant(name, cfg, iters, data_train, data_test, occ_bits,
                occ_skip=None, seed=0, cfg_for_step=None):
    """``cfg_for_step(i, iters, cfg) -> cfg`` (optional) varies the STEP
    config over training — the gradphase round-robin and the c2f stage
    schedule compile one step per distinct cfg (cached below); eval always
    uses the base cfg (exact, all levels)."""
    import optax

    from focnerf_tpu.render.renderer import render_rays_occupancy

    optimizer = make_optimizer(lr=1e-2, iters=max(iters, 1000))
    state = create_train_state(jax.random.key(seed), cfg, optimizer)
    tr_o, tr_d, tr_rgb = data_train

    def make_step(step_cfg):
        def loss_fn(params, batch, rng):
            out = render_rays_occupancy(
                params, step_cfg, batch["rays_o"], batch["rays_d"], occ_bits,
                dt_gamma=0.0, max_steps=MAX_STEPS, slab=SLAB, bg_color=1.0,
                rng=rng, perturb=True, occ_skip=occ_skip,
            )
            return jnp.mean((out["image"] - batch["pixels"]) ** 2)

        @jax.jit
        def train_step(state, rng):
            idx = jax.random.randint(jax.random.fold_in(rng, 1), (N_RAYS,), 0, tr_o.shape[0])
            batch = {"rays_o": tr_o[idx], "rays_d": tr_d[idx], "pixels": tr_rgb[idx]}
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state._replace(params=params, opt_state=opt_state, step=state.step + 1), loss

        return train_step

    steps = {}

    def step_at(i):
        c = cfg if cfg_for_step is None else cfg_for_step(i, iters, cfg)
        if c not in steps:
            steps[c] = make_step(c)
        return steps[c]

    state, loss = step_at(0)(state, jax.random.key(seed * 100000))
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(1, iters):
        state, loss = step_at(i)(state, jax.random.key(seed * 100000 + i))
    loss = float(loss)
    dt = (time.time() - t0) / (iters - 1)

    # exact eval on held-out rays, chunked
    te_o, te_d, te_rgb = data_test

    @jax.jit
    def render_chunk(params, o, d):
        return render_rays_occupancy(
            params, cfg, o, d, occ_bits, dt_gamma=0.0,
            max_steps=MAX_STEPS, slab=64, bg_color=1.0,
        )["image"]

    preds = []
    C = 8192
    n = te_o.shape[0]
    pad = (-n) % C
    o = jnp.pad(te_o, ((0, pad), (0, 0)))
    d = jnp.pad(te_d, ((0, pad), (0, 0)))
    for i in range(0, n + pad, C):
        preds.append(render_chunk(state.params, o[i : i + C], d[i : i + C]))
    pred = jnp.concatenate(preds)[:n]
    mse = float(jnp.mean((pred - te_rgb) ** 2))
    psnr = -10.0 * np.log10(mse)
    rays_s = N_RAYS / dt
    print(
        f"{name:10s} heldout PSNR {psnr:6.2f} dB | step {dt*1e3:7.1f} ms | "
        f"{rays_s/1e3:7.1f}k rays/s | final train loss {loss:.5f}",
        flush=True,
    )
    return {"psnr": psnr, "step_ms": dt * 1e3, "rays_s": rays_s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--variants", default="exact,int8,stoch1,stoch2,stoch1i8")
    ap.add_argument("--seeds", default="0")
    args = ap.parse_args()

    from focnerf_tpu.ops import hashgrid

    data_train = make_views(24, 96, 96, seed=0)
    data_test = make_views(4, 96, 96, seed=99)

    gs = 128
    r = (jnp.arange(gs) + 0.5) / gs * 2 - 1
    X, Y, Z = jnp.meshgrid(r, r, r, indexing="ij")
    occ_bits = ((X**2 + Y**2 + Z**2) < 0.55**2).reshape(1, -1)

    from focnerf_tpu.ops.occupancy import occupancy_skip_field

    occ_skip_field = occupancy_skip_field(occ_bits, gs)

    # (int8_backward, stochastic_k, stochastic_min_size, skip_march)
    variants = {
        "exact": (False, 0, 0, False),
        "int8": (True, 0, 0, False),
        "stoch1": (False, 1, 0, False),
        "stoch2": (False, 2, 0, False),
        "stoch1i8": (True, 1, 0, False),
        "stoch1ms": (False, 1, 1 << 13, False),
        "fast": (False, 1, 1 << 13, True),  # the -O production stack
        # round-3 candidate: ALL levels stochastic (uniform-K layout ->
        # pure-gather forward + lean backward); gate vs "fast"
        "allstoch": (False, 1, 1, True),
        # round-4 throughput levers on top of allstoch (gate vs it):
        # alternating 2-phase table backward / coarse-to-fine stages /
        # both together. Scheduled variants recompile at stage boundaries,
        # so their step_ms column here is polluted by compiles — quality
        # is the gate; speed comes from bench --hash --gradphase/--c2f.
        "gp2": (False, 1, 1, True),
        "c2f": (False, 1, 1, True),
        "c2fgp2": (False, 1, 1, True),
        # round-4 capacity-shape candidates (bench --levels 8 --featdim 4
        # speed axis): 8 levels x 4 feats at the SAME desired_resolution
        # and feature count — halves gather rows; gate quality vs allstoch
        "cap84": (False, 1, 1, True),
        "gp4": (False, 1, 1, True),
        "cap84gp4": (False, 1, 1, True),
    }
    # model-shape overrides (applied to NeRFConfig, not the step schedule)
    shape_overrides = {
        "cap84": dict(num_levels=8, level_dim=4),
        "cap84gp4": dict(num_levels=8, level_dim=4),
    }

    import dataclasses as _dc

    def _c2f_active(i, iters):
        if i < 0.3 * iters:
            return 8
        if i < 0.6 * iters:
            return 12
        return 0

    def _sched(name):
        if name == "gp2":
            return lambda i, it, c: _dc.replace(
                c, grad_levels=tuple(l for l in range(c.num_levels) if l % 2 == i % 2)
            )
        if name in ("gp4", "cap84gp4"):
            return lambda i, it, c: _dc.replace(
                c, grad_levels=tuple(l for l in range(c.num_levels) if l % 4 == i % 4)
            )
        if name == "c2f":
            return lambda i, it, c: _dc.replace(c, active_levels=_c2f_active(i, it))
        if name == "c2fgp2":
            def f(i, it, c):
                a = _c2f_active(i, it)
                n = a or c.num_levels
                return _dc.replace(
                    c, active_levels=a,
                    grad_levels=tuple(l for l in range(n) if l % 2 == i % 2),
                )
            return f
        return None

    for name in args.variants.split(","):
        use_int8, k, ms, skipm = variants[name]
        hashgrid.BACKWARD_INT8 = use_int8
        cfg = NeRFConfig(
            use_objfeat=False, stochastic_corners=k, stochastic_min_size=ms,
            **shape_overrides.get(name, {}),
        )
        for seed in (int(x) for x in args.seeds.split(",")):
            run_variant(f"{name}/s{seed}", cfg, args.iters, data_train,
                        data_test, occ_bits,
                        occ_skip=occ_skip_field if skipm else None, seed=seed,
                        cfg_for_step=_sched(name))
    hashgrid.BACKWARD_INT8 = None


if __name__ == "__main__":
    main()
