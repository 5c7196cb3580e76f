"""Volume rendering for dynamic (time-conditioned) NeRF fields.

Parity target: dnerf/renderer.py — the static renderer with time threaded
through density/color, a time-axis occupancy grid ([T_slots, CAS, H^3],
dnerf/renderer.py:74,92-100; bitfield indexed by floor(t * T_slots) :286),
and the deformation L1 regularizer surfaced to the trainer
(dnerf/utils.py:117-119).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from focnerf_tpu.core.geometry import near_far_from_aabb
from focnerf_tpu.models.dnerf import DNeRFConfig, dnerf_color, dnerf_density
from focnerf_tpu.ops.composite import composite_rays
from focnerf_tpu.ops.marching import march_rays, march_rays_skip
from focnerf_tpu.render.renderer import _LRUJitCache

_dnerf_chunk_cache = _LRUJitCache()


def render_rays_dnerf(
    params,
    cfg: DNeRFConfig,
    rays_o: jax.Array,
    rays_d: jax.Array,
    t: jax.Array,  # scalar time in [0, 1]
    *,
    num_steps: int = 512,
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
    bg_color=None,
    aabb: Optional[jax.Array] = None,
    min_near: float = 0.2,
) -> Dict[str, Any]:
    n = rays_o.shape[0]
    if aabb is None:
        b = cfg.bound
        aabb = jnp.array([-b, -b, -b, b, b, b], jnp.float32)

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    nears = nears[:, None]
    fars = fars[:, None]
    z = jnp.linspace(0.0, 1.0, num_steps, dtype=jnp.float32)[None, :]
    z_vals = nears + (fars - nears) * z
    sample_dist = (fars - nears) / num_steps
    if perturb:
        assert rng is not None
        z_vals = z_vals + (jax.random.uniform(rng, z_vals.shape) - 0.5) * sample_dist

    xyzs = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    xyzs = jnp.clip(xyzs, aabb[:3], aabb[3:])

    sigmas, geo, aux = dnerf_density(params, cfg, xyzs, t)

    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate([deltas, jnp.broadcast_to(sample_dist, deltas[..., :1].shape)], -1)

    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    rgbs = dnerf_color(params, cfg, dirs, geo, t, aux.get("basis_coeff"))

    bg = 1.0 if bg_color is None else bg_color
    ori_z = jnp.clip((z_vals - nears) / jnp.maximum(fars - nears, 1e-10), 0.0, 1.0)
    out = composite_rays(
        sigmas, rgbs, deltas, ts=ori_z, bg_color=bg, density_scale=cfg.density_scale
    )
    result = {
        "image": out["image"],
        "depth": out["depth"],
        "weights_sum": out["weights_sum"],
        "sigmas": sigmas,
    }
    if "deform" in aux:
        # L1 deformation regularizer (dnerf/utils.py:117-119)
        result["deform_mean"] = jnp.mean(jnp.abs(aux["deform"]))
    return result


def render_rays_dnerf_occupancy(
    params,
    cfg: DNeRFConfig,
    rays_o: jax.Array,
    rays_d: jax.Array,
    t: jax.Array,  # scalar time in [0, 1]
    occ_bits: jax.Array,  # [CAS, H^3] — the slot for t (time_occupancy_bitfield)
    *,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    slab: int = 64,
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
    bg_color=None,
    aabb: Optional[jax.Array] = None,
    min_near: float = 0.2,
    T_thresh: float = 1e-4,
    grid_size: int = 128,
    occ_skip: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Occupancy-accelerated dynamic render (dnerf run_cuda,
    dnerf/renderer.py:243-340): march through the time-slot bitfield, then
    evaluate the time-conditioned field on the surviving slab. ``occ_skip``
    (occupancy_skip_field of the slot) switches to the sphere-trace skip
    marcher, as in the static renderer."""
    if aabb is None:
        b = cfg.bound
        aabb = jnp.array([-b, -b, -b, b, b, b], jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)

    common = dict(
        bound=cfg.bound,
        dt_gamma=dt_gamma,
        max_steps=max_steps,
        slab=slab,
        grid_size=grid_size,
        rng=rng,
        perturb=perturb,
    )
    if occ_skip is not None:
        m = march_rays_skip(rays_o, rays_d, nears, fars, occ_skip, **common)
    else:
        m = march_rays(rays_o, rays_d, nears, fars, occ_bits, **common)
    xyzs = rays_o[:, None, :] + rays_d[:, None, :] * m.ts[..., None]
    xyzs = jnp.clip(xyzs, aabb[:3], aabb[3:])
    sigmas, geo, aux = dnerf_density(params, cfg, xyzs, t)
    sigmas = jnp.where(m.valid, sigmas, 0.0)

    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    rgbs = dnerf_color(params, cfg, dirs, geo, t, aux.get("basis_coeff"))

    bg = 1.0 if bg_color is None else bg_color
    out = composite_rays(
        sigmas,
        rgbs,
        m.dts,
        ts=m.ts,
        bg_color=bg,
        density_scale=cfg.density_scale,
        T_thresh=T_thresh,
    )
    depth = jnp.clip(out["depth"] - nears, 0.0, None) / jnp.maximum(fars - nears, 1e-10)
    result = {
        "image": out["image"],
        "depth": depth,
        "weights_sum": out["weights_sum"],
        "sigmas": sigmas,
        "n_samples": m.count,
    }
    if "deform" in aux:
        result["deform_mean"] = jnp.mean(jnp.abs(aux["deform"]))
    return result


def render_image_dnerf(
    params,
    cfg: DNeRFConfig,
    pose,
    intrinsics,
    H: int,
    W: int,
    t,
    *,
    num_steps: int = 512,
    max_ray_batch: int = 4096,
    bg_color=None,
    aabb=None,
    min_near: float = 0.2,
    occ_bits: Optional[jax.Array] = None,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    slab: int = 64,
):
    """Full-image staged dynamic render at time t (the dnerf analogue of
    render.renderer.render_image, incl. the occupancy route).

    A python loop over one cached jitted chunk program, NOT lax.map — the
    march/encode scans nested inside a map compile and execute
    pathologically (the 16 s/frame eval documented in PERF.md round 2),
    exactly as in the static render_image.
    """
    from focnerf_tpu.core.rays import get_rays

    rays = get_rays(pose, intrinsics, H, W)
    n = H * W
    pad = (-n) % max_ray_batch
    ro = jnp.pad(rays["rays_o"], ((0, pad), (0, 0)))
    rd = jnp.pad(rays["rays_d"], ((0, pad), (0, 0))).at[n:, 2].set(1.0)
    ro = ro.reshape(-1, max_ray_batch, 3)
    rd = rd.reshape(-1, max_ray_batch, 3)
    t = jnp.asarray(t, jnp.float32)

    key = (
        cfg, num_steps, min_near, dt_gamma, max_steps, slab,
        occ_bits is not None,
    )
    if key not in _dnerf_chunk_cache:
        use_occ = occ_bits is not None

        def chunk_run(params, o, d, t, occ_bits, aabb, bg_color):
            if use_occ:
                res = render_rays_dnerf_occupancy(
                    params, cfg, o, d, t, occ_bits,
                    dt_gamma=dt_gamma, max_steps=max_steps, slab=slab,
                    bg_color=bg_color, aabb=aabb, min_near=min_near,
                )
            else:
                res = render_rays_dnerf(
                    params, cfg, o, d, t,
                    num_steps=num_steps, bg_color=bg_color, aabb=aabb,
                    min_near=min_near,
                )
            return res["image"], res["depth"]

        _dnerf_chunk_cache[key] = jax.jit(chunk_run)
    chunk_jit = _dnerf_chunk_cache[key]
    outs = [
        chunk_jit(params, ro[i], rd[i], t, occ_bits, aabb, bg_color)
        for i in range(ro.shape[0])
    ]
    image = jnp.concatenate([o[0] for o in outs]).reshape(-1, 3)[:n]
    depth = jnp.concatenate([o[1] for o in outs]).reshape(-1)[:n]
    return image.reshape(H, W, 3), depth.reshape(H, W)


class TimeOccupancyState(NamedTuple):
    """Occupancy grid with a time axis (dnerf/renderer.py:74)."""

    density_grid: jax.Array  # [T_slots, CAS, H^3]
    mean_density: jax.Array
    iter_density: jax.Array


def init_time_occupancy(bound: float, time_slots: int = 64, grid_size: int = 128):
    from focnerf_tpu.ops.occupancy import cascade_count

    cas = cascade_count(bound)
    return TimeOccupancyState(
        density_grid=jnp.zeros((time_slots, cas, grid_size**3), jnp.float32),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def update_time_occupancy(
    occ: TimeOccupancyState,
    density_eval_t,  # (xyz, t) -> sigma
    rng: jax.Array,
    *,
    bound: float,
    time_slot: jax.Array,  # int slot to refresh this call (ref loops all; we rotate)
    density_scale: float = 1.0,
    decay: float = 0.95,
    grid_size: int = 128,
    chunk: int = 2**15,
):
    """Refresh ONE time slot per call (round-robin keeps cost bounded under jit).

    The reference refreshes every (t, cascade) pair each update
    (dnerf/renderer.py update_extra_state loops times); rotating slots hits
    each time index every ``time_slots`` updates at 1/T the cost.
    """
    from focnerf_tpu.ops.occupancy import _cascade_world_coords, cell_centers

    t_slots, cas_total, n_cells = occ.density_grid.shape
    coords = cell_centers(grid_size)
    coords01 = 2.0 * coords.astype(jnp.float32) / (grid_size - 1) - 1.0
    t_val = (time_slot.astype(jnp.float32) + 0.5) / t_slots

    new_slot = []
    for cas in range(cas_total):
        k = jax.random.fold_in(rng, cas)
        cxyz, half = _cascade_world_coords(coords01, cas, bound, grid_size)
        jitter = (jax.random.uniform(k, cxyz.shape) * 2.0 - 1.0) * half
        pts = (cxyz + jitter).reshape(-1, chunk, 3)
        sig = jax.lax.map(lambda p: density_eval_t(p, t_val), pts).reshape(-1)
        new_slot.append(sig * density_scale)
    tmp = jnp.stack(new_slot)  # [CAS, H^3]

    old = occ.density_grid[time_slot]
    valid = (old >= 0) & (tmp >= 0)
    updated = jnp.where(valid, jnp.maximum(old * decay, tmp), old)
    grid = occ.density_grid.at[time_slot].set(updated)
    return TimeOccupancyState(
        density_grid=grid,
        mean_density=jnp.mean(jnp.clip(grid, 0.0, None)),
        iter_density=occ.iter_density + 1,
    )


def time_occupancy_bitfield(occ: TimeOccupancyState, t: jax.Array, density_thresh: float):
    """Bool [CAS, H^3] for the slot containing time t (dnerf/renderer.py:286)."""
    t_slots = occ.density_grid.shape[0]
    slot = jnp.clip((t * t_slots).astype(jnp.int32), 0, t_slots - 1)
    thresh = jnp.minimum(occ.mean_density, density_thresh)
    return occ.density_grid[slot] > thresh
