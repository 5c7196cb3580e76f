"""Occupancy-aware ray marching with fixed shapes (no atomics, no worklists).

TPU-native replacement for the CUDA ``kernel_march_rays_train`` /
``kernel_march_rays`` (raymarching/src/raymarching.cu:312-490, 701-817).

Key observation enabling exact sampling parity with fixed shapes: the CUDA
marcher advances t with ``t += clamp(t * dt_gamma, dt_min, dt_max)`` both when
taking a sample and when skipping an empty voxel, so the t-values it visits
are always a prefix-subset of the *no-skip* recurrence from t0. That
recurrence has a closed form (linear phase below dt_min/gamma, geometric
phase in between, linear phase above dt_max/gamma), so the full candidate
ladder [N, S] is pure elementwise math — no sequential scan, no atomics:

  1. candidates: t_i(t0) for i < S = max_steps (closed form);
  2. occupancy:  mip-level bitfield lookup per candidate (one fused gather);
  3. compaction: first-K occupied candidates per ray via cumsum-rank +
     unique-index scatter (replaces the CUDA two-pass atomicAdd compaction).

The result is a dense [N, K] sample slab + validity mask, which the renderer
evaluates with one batched MLP call (MXU-friendly) and composites with the
vectorized prefix-product (ops/composite.py).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

SQRT3 = math.sqrt(3.0)


class MarchResult(NamedTuple):
    ts: jax.Array  # [N, K] sample positions along the ray
    dts: jax.Array  # [N, K] step sizes
    valid: jax.Array  # [N, K] bool
    count: jax.Array  # [N] number of valid samples (<= K)


def candidate_ts(t0: jax.Array, num: int, dt_min: float, dt_max: float, dt_gamma: float):
    """Closed-form t-ladder of the clamped-geometric recurrence.

    t_{i+1} = t_i + clamp(t_i * dt_gamma, dt_min, dt_max), starting at t0 [N].
    Returns (ts [N, S], dts [N, S]) with ts[:, 0] == t0.
    """
    i = jnp.arange(num, dtype=jnp.float32)[None, :]  # [1, S]
    t0 = t0[:, None].astype(jnp.float32)  # [N, 1]

    if dt_gamma <= 0.0:
        ts = t0 + i * dt_min
        dts = jnp.full_like(ts, dt_min)
        return ts, dts

    A = dt_min / dt_gamma  # below: linear dt_min steps
    B = dt_max / dt_gamma  # above: linear dt_max steps
    g = 1.0 + dt_gamma

    # phase 1: linear dt_min until t >= A
    n1 = jnp.ceil(jnp.maximum(A - t0, 0.0) / dt_min)
    t_n1 = t0 + n1 * dt_min  # first t >= A (== t0 if already past)
    # phase 2: geometric until t >= B
    ratio = jnp.maximum(B / jnp.maximum(t_n1, 1e-30), 1.0)
    n2 = jnp.ceil(jnp.log(ratio) / math.log(g))
    t_n2 = t_n1 * g**n2  # first t >= B

    ts = jnp.where(
        i <= n1,
        t0 + i * dt_min,
        jnp.where(i <= n1 + n2, t_n1 * g ** (i - n1), t_n2 + (i - n1 - n2) * dt_max),
    )
    dts = jnp.clip(ts * dt_gamma, dt_min, dt_max)
    return ts, dts


def _mip_level(x_absmax: jax.Array, dt: jax.Array, grid_size: int, cascades: int):
    """max(mip_from_pos, mip_from_dt), raymarching.cu:42-54.

    frexp exponent semantics: [0.5, 1) -> 0, [1, 2) -> 1, [2, 4) -> 2...
    """
    _, e_pos = jnp.frexp(x_absmax)
    _, e_dt = jnp.frexp(dt * grid_size * 0.5)
    level = jnp.maximum(e_pos, e_dt)
    return jnp.clip(level, 0, cascades - 1)


def march_rays(
    rays_o: jax.Array,
    rays_d: jax.Array,
    nears: jax.Array,
    fars: jax.Array,
    occ_bits: jax.Array,  # [CAS, H^3] bool, linear (x-major) cell order
    *,
    bound: float,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    slab: int = 128,
    grid_size: int = 128,
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
) -> MarchResult:
    """Sample up to ``slab`` occupied positions per ray.

    Candidate resolution matches the CUDA kernel: dt_min = 2*sqrt(3)/max_steps,
    dt_max = 2*sqrt(3)*2^(CAS-1)/H; t0 = near (+ dt(near)*noise when perturb).
    """
    n = rays_o.shape[0]
    cascades = occ_bits.shape[0]
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2.0 ** (cascades - 1)) / grid_size

    t0 = nears
    if perturb:
        assert rng is not None
        noise = jax.random.uniform(rng, (n,))
        t0 = t0 + jnp.clip(t0 * dt_gamma, dt_min, dt_max) * noise

    ts, dts = candidate_ts(t0, max_steps, dt_min, dt_max, dt_gamma)  # [N, S]

    xyz = rays_o[:, None, :] + rays_d[:, None, :] * ts[..., None]
    xyz = jnp.clip(xyz, -bound, bound)

    level = _mip_level(jnp.max(jnp.abs(xyz), axis=-1), dts, grid_size, cascades)  # [N, S]
    mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)
    cell = jnp.clip(
        (0.5 * (xyz / mip_bound[..., None] + 1.0) * grid_size).astype(jnp.int32),
        0,
        grid_size - 1,
    )  # [N, S, 3]
    flat = (
        level * (grid_size**3)
        + cell[..., 0] * grid_size * grid_size
        + cell[..., 1] * grid_size
        + cell[..., 2]
    )
    occ = occ_bits.reshape(-1)[flat]  # [N, S] fused gather

    valid = occ & (ts < fars[:, None])

    # first-K compaction per ray: stable argsort moves valid candidates to the
    # front in order; a [N, slab] take_along_axis reads them back. This is a
    # vectorized per-row bitonic sort — far cheaper on TPU than the scatter
    # formulation (XLA scatter serializes; sort stays on the VPU). Replaces
    # the CUDA two-pass atomicAdd compaction (raymarching.cu:405-406).
    order = jnp.argsort(~valid, axis=-1, stable=True)[:, :slab]  # [N, K]
    out_t = jnp.take_along_axis(ts, order, axis=-1)
    out_dt = jnp.take_along_axis(dts, order, axis=-1)
    count = jnp.minimum(jnp.sum(valid, axis=-1), slab)
    k = jnp.arange(slab)[None, :]
    keep = k < count[:, None]
    return MarchResult(
        ts=jnp.where(keep, out_t, 0.0),
        dts=jnp.where(keep, out_dt, 0.0),
        valid=keep,
        count=count,
    )


def march_rays_skip(
    rays_o: jax.Array,
    rays_d: jax.Array,
    nears: jax.Array,
    fars: jax.Array,
    occ_skip: jax.Array,  # [CAS, H^3] uint8 skip codes (occupancy_skip_field)
    *,
    bound: float,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    slab: int = 128,
    grid_size: int = 128,
    max_iters: int = 0,
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
) -> MarchResult:
    """Sphere-tracing marcher over the precomputed skip field.

    Same contract as march_rays, but instead of probing a dense candidate
    ladder ([N, max_steps] bitfield gathers — the measured per-row gather
    floor makes that the dominant march cost), it walks each ray with a
    lax.while_loop whose step either samples (skip code 0: occupied cell,
    advance by the dt recurrence — raymarching.cu:349-383) or leaps over
    empty space (code v >= 1: advance past the cell boundary plus (v-2)
    safe cells; the skip field guarantees every cell the segment can touch
    is empty). The loop exits when every ray is done, so gathers drop from
    N*max_steps rows to N*(slab + O(log H)) on typical scenes, with
    max_iters as a hard termination cap.

    dt positions are memoryless (dt = clamp(t*gamma, lo, hi) depends only on
    t), so leap landings resume the exact CUDA step recurrence.
    """
    n = rays_o.shape[0]
    cascades = occ_skip.shape[0]
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2.0 ** (cascades - 1)) / grid_size
    if max_iters <= 0:
        # hard CAP on walk length, not the expected cost: the while_loop
        # below exits as soon as every ray is done, so clean scenes stop
        # after ~slab + O(log H) iterations regardless of this value. The
        # cap only bites in pathological clutter (skip codes pinned at 1-2,
        # ~1 cell/iteration), where a tight slab+48 bound silently dropped
        # all samples in the back of the volume.
        max_iters = slab + 8 * grid_size

    t0 = nears
    if perturb:
        assert rng is not None
        noise = jax.random.uniform(rng, (n,))
        t0 = t0 + jnp.clip(t0 * dt_gamma, dt_min, dt_max) * noise

    skip_flat = occ_skip.reshape(-1)
    k_iota = jnp.arange(slab)[None, :]  # [1, K]

    def body(carry):
        t, count, out_t, out_dt, it = carry
        alive = t < fars
        dt = jnp.clip(t * dt_gamma, dt_min, dt_max)
        xyz = rays_o + rays_d * t[:, None]
        xyz = jnp.clip(xyz, -bound, bound)
        level = _mip_level(jnp.max(jnp.abs(xyz), axis=-1), dt, grid_size, cascades)
        mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)
        cs = 2.0 * mip_bound / grid_size  # cell size at this level [N]
        cell_f = 0.5 * (xyz / mip_bound[:, None] + 1.0) * grid_size
        cell = jnp.clip(cell_f.astype(jnp.int32), 0, grid_size - 1)
        flat = (
            level * (grid_size**3)
            + cell[:, 0] * grid_size * grid_size
            + cell[:, 1] * grid_size
            + cell[:, 2]
        )
        v = skip_flat[flat]  # [N] uint8 gather — the only memory access
        occupied = (v == 0) & alive

        # record the sample where occupied and count < slab
        put = occupied & (count < slab)
        mask_k = (k_iota == count[:, None]) & put[:, None]  # [N, K]
        out_t = jnp.where(mask_k, t[:, None], out_t)
        out_dt = jnp.where(mask_k, dt[:, None], out_dt)
        count = count + put.astype(count.dtype)

        # advance: one dt step through occupied cells; past the cell exit
        # (+ safe extra cells) through empty space. Empty-space leaps move by
        # a WHOLE NUMBER of dt-recurrence steps, not to the boundary itself:
        # snapping to boundary+eps would erase the per-ray t0 jitter and
        # freeze every later sample onto deterministic cell-aligned
        # positions — measured a ~6 dB held-out quality collapse. Staying on
        # the jittered recurrence lattice is also exactly what the CUDA
        # marcher does (`do t += dt while (t < tt)`, raymarching.cu:371-377).
        next_corner = (cell + (rays_d > 0)).astype(jnp.float32)  # [N, 3]
        world_next = (next_corner / grid_size * 2.0 - 1.0) * mip_bound[:, None]
        t_axes = (world_next - xyz) / jnp.where(
            jnp.abs(rays_d) < 1e-12, jnp.sign(rays_d) + 1e-12, rays_d
        )
        t_exit = jnp.min(jnp.where(t_axes > 0, t_axes, jnp.inf), axis=-1)
        t_exit = jnp.minimum(t_exit, SQRT3 * cs)  # guard degenerate geometry
        extra = jnp.maximum(v.astype(jnp.float32) - 2.0, 0.0) * cs
        s_want = t_exit + 1e-3 * cs + extra  # required safe advance
        if dt_gamma <= 0.0:
            m = jnp.floor(s_want / dt_min) + 1.0
            adv_empty = m * dt_min
        else:
            # smallest number of recurrence steps covering s_want, computed
            # per phase of dt = clamp(t*gamma, dt_min, dt_max) and CLAMPED
            # at the first lattice point past the current phase's boundary:
            # a single closed-form leap that crosses a phase change
            # (dt_min-pinned -> geometric -> dt_max-pinned) would land off
            # the true recurrence (ADVICE r2). A clamped leap covers less
            # than s_want — safe, since the skip guarantee holds for any
            # prefix — and the next while-loop iteration continues in the
            # new phase, so landings stay exactly on the jittered CUDA
            # lattice at the cost of <= 2 extra iterations per ray.
            g = 1.0 + dt_gamma
            t_lo = dt_min / dt_gamma  # below: dt pinned at dt_min
            t_hi = dt_max / dt_gamma  # above: dt pinned at dt_max
            m_lin = jnp.floor(s_want / dt) + 1.0  # dt == pinned value here
            # min-pinned phase: stop at the first lattice point >= t_lo
            m_lo_b = jnp.maximum(jnp.floor((t_lo - t) / dt_min) + 1.0, 1.0)
            # geometric phase: t_m = t * g^m; stop at first point >= t_hi
            t_pos = jnp.maximum(t, 1e-6)
            m_geo = jnp.ceil(jnp.log1p(s_want / t_pos) / math.log(g))
            m_geo_b = jnp.ceil(
                jnp.log(jnp.maximum(t_hi / t_pos, 1.0)) / math.log(g)
            )
            m_g = jnp.clip(m_geo, 1.0, jnp.maximum(m_geo_b, 1.0))
            below = t * dt_gamma <= dt_min
            above = t * dt_gamma >= dt_max
            adv_empty = jnp.where(
                below,
                jnp.minimum(m_lin, m_lo_b) * dt,
                jnp.where(above, m_lin * dt, t * g**m_g - t),
            )
        t = t + jnp.where(occupied, dt, adv_empty)
        done = (count >= slab) | ~alive
        t = jnp.where(done & ~occupied, jnp.maximum(t, fars), t)
        return (t, count, out_t, out_dt, it + 1)

    def cond(carry):
        t, count, _, _, it = carry
        return (it < max_iters) & jnp.any((t < fars) & (count < slab))

    carry0 = (
        t0,
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n, slab), jnp.float32),
        jnp.zeros((n, slab), jnp.float32),
        jnp.zeros((), jnp.int32),
    )
    # while_loop, not a fixed-length scan: exits the moment every ray has
    # either found its slab samples or left the volume (no tangents flow
    # through the march — ts depend only on rays/occupancy, so reverse-mode
    # AD of the train step never differentiates this loop).
    t, count, out_t, out_dt, _ = jax.lax.while_loop(cond, body, carry0)
    keep = k_iota < count[:, None]
    return MarchResult(ts=out_t, dts=out_dt, valid=keep, count=count)
