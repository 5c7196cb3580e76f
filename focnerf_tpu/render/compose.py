"""Multi-object scene composition and rigid editing.

Parity targets:
  - COMBINED.py:203-251, 592-618 — per view, every per-object NeRF is
    evaluated along shared rays; fields are fused per sample by max-density
    selection (``best_densities_and_colors_v3``: sigma = max_k sigma_k,
    rgb = rgb of the argmax object) and composited to RGBA;
  - COMBINED.py:141-200 ``image_depth_generation`` — alpha channel is the
    composited weights_sum;
  - editable.py:443-471 ``modify_rays_for_object`` — the edited object's
    rays are translated by (offset_x, offset_y, offset_z) before rendering,
    i.e. a rigid translation of that object inside the composed scene.

TPU-first redesign (removes the reference's >4-object OOM, README.md:111-113):
  - all K object param sets are STACKED into one pytree (they share a
    structure) and kept resident in HBM (~12.6M params each — no per-view
    checkpoint reloading, COMBINED.py:597);
  - objects are folded with ``lax.scan`` carrying a running
    (max_sigma, argmax_rgb) per sample — memory is O(chunk x steps),
    INDEPENDENT of K;
  - the reference's [H*W, 512] x K full-field buffers never exist.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from focnerf_tpu.core.geometry import near_far_from_aabb
from focnerf_tpu.models.nerf import NeRFConfig, color_fn, density_fn, encode_objfeat
from focnerf_tpu.ops.composite import composite_rays
from focnerf_tpu.ops.marching import march_rays


def stack_object_params(params_list):
    """List of identical-structure param pytrees -> stacked pytree [K, ...]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def _roll_zero3(g: jax.Array, shift: jax.Array) -> jax.Array:
    """Roll a [H, H, H] bool grid by per-axis cell counts, zero-filling the
    wrapped-in region (a translation, not a torus roll)."""
    H = g.shape[0]
    g = jnp.roll(g, shift, axis=(0, 1, 2))
    idx = jnp.arange(H)
    for ax in range(3):
        valid = (idx - shift[ax] >= 0) & (idx - shift[ax] < H)
        shape = [1, 1, 1]
        shape[ax] = H
        g = g & valid.reshape(shape)
    return g


def union_occupancy_bits(
    stacked_bits: jax.Array,  # [K, CAS, H^3] bool, per-object bitfields
    offsets: Optional[jax.Array],  # [K, 3] rigid edit translations (or None)
    bound: float,
    grid_size: int = 128,
) -> jax.Array:
    """Scene-space union of per-object occupancy bitfields.

    Object k's field is queried at (x_scene + offset_k), so in scene space its
    occupied region is the object grid translated by -offset_k; translations
    are rounded to whole cells per cascade (the marcher only needs a
    conservative skip mask — compositing stays exact).
    Returns [CAS, H^3] bool.
    """
    K, cas_total, _ = stacked_bits.shape
    if offsets is None:
        return jnp.any(stacked_bits, axis=0)
    out = []
    for cas in range(cas_total):
        cas_bound = min(2.0**cas, float(bound))
        cell = 2.0 * cas_bound / grid_size

        def shift_one(bits_flat, off):
            g = bits_flat.reshape(grid_size, grid_size, grid_size)
            s = jnp.round(-off / cell).astype(jnp.int32)
            return _roll_zero3(g, s).reshape(-1)

        shifted = jax.vmap(shift_one)(stacked_bits[:, cas], offsets)  # [K, H^3]
        out.append(jnp.any(shifted, axis=0))
    return jnp.stack(out)



def rotation_matrices(rotations_deg) -> jax.Array:
    """Per-object forward rotation matrices [K, 3, 3] from per-axis degrees
    [K, 3] (right-handed, applied x then y then z — matching the baked
    path's sequential rotate_volume calls). Row-vector convention: a world
    point queries object k's field at ``(x + offset_k) @ R_k`` — for an
    orthonormal R, ``x_row @ R == (R^-1 x)_col``, so this IS the inverse
    transform that places the object rotated by +deg in the scene."""
    import numpy as _np

    rotations_deg = _np.asarray(rotations_deg, _np.float32)
    out = []
    for rx, ry, rz in rotations_deg:
        R = _np.eye(3, dtype=_np.float32)
        for ax, dg in ((0, rx), (1, ry), (2, rz)):
            th = _np.deg2rad(float(dg))
            c, s = _np.cos(th), _np.sin(th)
            # right-handed in-plane pair about +ax is the CYCLIC pair —
            # about +y it is (z, x); ascending (x, z) negates the rotation
            i, j = ((1, 2), (2, 0), (0, 1))[ax]
            A = _np.eye(3, dtype=_np.float32)
            A[i, i] = c
            A[j, j] = c
            A[i, j] = -s
            A[j, i] = s
            R = A @ R
        out.append(R)
    return jnp.asarray(_np.stack(out))


def compose_rays(
    stacked_params,
    cfg: NeRFConfig,
    rays_o: jax.Array,
    rays_d: jax.Array,
    obj_feats: Optional[jax.Array] = None,  # [K, F] per-object conditioning
    offsets: Optional[jax.Array] = None,  # [K, 3] rigid edit translations
    rots: Optional[jax.Array] = None,  # [K, 3, 3] rigid edit rotations
    *,
    num_steps: int = 512,
    bg_color=1.0,
    aabb: Optional[jax.Array] = None,
    min_near: float = 0.2,
) -> Dict[str, Any]:
    """Streaming max-density composition over K objects for one ray chunk.

    Returns dict(image [N, 3], depth [N], alpha [N]) — RGBA as in the
    reference compositor.
    """
    n = rays_o.shape[0]
    if aabb is None:
        b = cfg.bound
        aabb = jnp.array([-b, -b, -b, b, b, b], jnp.float32)

    # shared sample grid from the UN-offset rays (editable.py caches the
    # first object's rays for all non-edited objects, :443-471)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    z = jnp.linspace(0.0, 1.0, num_steps, dtype=jnp.float32)[None, :]
    z_vals = nears[:, None] + (fars - nears)[:, None] * z  # [N, T]
    sample_dist = (fars - nears)[:, None] / num_steps
    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate([deltas, sample_dist], axis=-1)

    dirs = jnp.broadcast_to(rays_d[:, None, :], (n, num_steps, 3))

    K = jax.tree.leaves(stacked_params)[0].shape[0]
    if offsets is None:
        offsets = jnp.zeros((K, 3), jnp.float32)
    if rots is None:
        rots = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3))
    if obj_feats is None and cfg.use_objfeat:
        raise ValueError("cfg.use_objfeat=True requires per-object obj_feats [K, F]")

    def fold_object(carry, xs):
        best_sigma, best_rgb = carry
        params_k, offset_k, rot_k, feat_k = xs
        # rigid edit: translate by shifting ray origins, rotate by mapping
        # sample points (and view dirs) into the object frame — the
        # per-sample equivalent of rotate_volume + shift_volume
        o_k = rays_o + offset_k[None, :]
        xyzs = o_k[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        xyzs = xyzs @ rot_k
        xyzs = jnp.clip(xyzs, aabb[:3], aabb[3:])
        dirs_k = dirs @ rot_k
        sigma_k, geo_k = density_fn(params_k, cfg, xyzs)
        objfeat_enc = (
            encode_objfeat(params_k, cfg, feat_k) if cfg.use_objfeat else None
        )
        rgb_k = color_fn(params_k, cfg, dirs_k, geo_k, objfeat_enc)
        take = sigma_k > best_sigma  # max-density argmax selection (:247-251)
        best_sigma = jnp.where(take, sigma_k, best_sigma)
        best_rgb = jnp.where(take[..., None], rgb_k, best_rgb)
        return (best_sigma, best_rgb), None

    init = (
        jnp.zeros((n, num_steps), jnp.float32),
        jnp.zeros((n, num_steps, 3), jnp.float32),
    )
    feats = obj_feats if obj_feats is not None else jnp.zeros((K, 1), jnp.float32)
    (fused_sigma, fused_rgb), _ = jax.lax.scan(
        fold_object, init, (stacked_params, offsets, rots, feats)
    )

    ori_z = jnp.clip((z_vals - nears[:, None]) / jnp.maximum(fars - nears, 1e-10)[:, None], 0, 1)
    out = composite_rays(
        fused_sigma,
        fused_rgb,
        deltas,
        ts=ori_z,
        bg_color=bg_color,
        density_scale=cfg.density_scale,
    )
    return {
        "image": out["image"],
        "depth": out["depth"],
        "alpha": out["weights_sum"],  # RGBA alpha (COMBINED.py:141-200)
    }


def compose_rays_occupancy(
    stacked_params,
    cfg: NeRFConfig,
    rays_o: jax.Array,
    rays_d: jax.Array,
    occ_bits: jax.Array,  # [CAS, H^3] scene-space UNION bitfield
    obj_feats: Optional[jax.Array] = None,
    offsets: Optional[jax.Array] = None,
    rots: Optional[jax.Array] = None,  # [K, 3, 3] rigid edit rotations
    *,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    slab: int = 64,
    bg_color=1.0,
    aabb: Optional[jax.Array] = None,
    min_near: float = 0.2,
    T_thresh: float = 1e-4,
    grid_size: int = 128,
) -> Dict[str, Any]:
    """Occupancy-accelerated streaming composition.

    Marches ONCE on the union of the objects' bitfields
    (``union_occupancy_bits``), then folds the K fields over the marched
    sample slab exactly as ``compose_rays`` does over the uniform grid —
    the run_cuda-for-composition path the reference never had (it re-ran
    the full per-object fields per view, COMBINED.py:592-618).
    """
    n = rays_o.shape[0]
    if aabb is None:
        b = cfg.bound
        aabb = jnp.array([-b, -b, -b, b, b, b], jnp.float32)

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    m = march_rays(
        rays_o,
        rays_d,
        nears,
        fars,
        occ_bits,
        bound=cfg.bound,
        dt_gamma=dt_gamma,
        max_steps=max_steps,
        slab=slab,
        grid_size=grid_size,
    )
    n_samples = m.ts.shape[1]
    dirs = jnp.broadcast_to(rays_d[:, None, :], (n, n_samples, 3))

    K = jax.tree.leaves(stacked_params)[0].shape[0]
    if offsets is None:
        offsets = jnp.zeros((K, 3), jnp.float32)
    if rots is None:
        rots = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3))
    if obj_feats is None and cfg.use_objfeat:
        raise ValueError("cfg.use_objfeat=True requires per-object obj_feats [K, F]")

    def fold_object(carry, xs):
        best_sigma, best_rgb = carry
        params_k, offset_k, rot_k, feat_k = xs
        o_k = rays_o + offset_k[None, :]
        xyzs = o_k[:, None, :] + rays_d[:, None, :] * m.ts[..., None]
        xyzs = xyzs @ rot_k
        xyzs = jnp.clip(xyzs, aabb[:3], aabb[3:])
        dirs_k = dirs @ rot_k
        sigma_k, geo_k = density_fn(params_k, cfg, xyzs)
        sigma_k = jnp.where(m.valid, sigma_k, 0.0)
        objfeat_enc = (
            encode_objfeat(params_k, cfg, feat_k) if cfg.use_objfeat else None
        )
        rgb_k = color_fn(params_k, cfg, dirs_k, geo_k, objfeat_enc)
        take = sigma_k > best_sigma
        best_sigma = jnp.where(take, sigma_k, best_sigma)
        best_rgb = jnp.where(take[..., None], rgb_k, best_rgb)
        return (best_sigma, best_rgb), None

    init = (
        jnp.zeros((n, n_samples), jnp.float32),
        jnp.zeros((n, n_samples, 3), jnp.float32),
    )
    feats = obj_feats if obj_feats is not None else jnp.zeros((K, 1), jnp.float32)
    (fused_sigma, fused_rgb), _ = jax.lax.scan(
        fold_object, init, (stacked_params, offsets, rots, feats)
    )

    out = composite_rays(
        fused_sigma,
        fused_rgb,
        m.dts,
        ts=m.ts,
        bg_color=bg_color,
        density_scale=cfg.density_scale,
        T_thresh=T_thresh,
    )
    depth = jnp.clip(out["depth"] - nears, 0.0, None) / jnp.maximum(fars - nears, 1e-10)
    return {
        "image": out["image"],
        "depth": depth,
        "alpha": out["weights_sum"],
    }


from focnerf_tpu.render.renderer import _LRUJitCache  # noqa: E402  (bounded jit cache)

_compose_chunk_cache = _LRUJitCache()


def compose_image(
    stacked_params,
    cfg: NeRFConfig,
    pose,
    intrinsics,
    H: int,
    W: int,
    obj_feats=None,
    offsets=None,
    rots=None,  # [K, 3, 3] rigid edit rotations (rotation_matrices)
    *,
    num_steps: int = 512,
    max_ray_batch: int = 4096,
    bg_color=1.0,
    aabb=None,
    min_near: float = 0.2,
    occ_bits=None,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    slab: int = 64,
):
    """Full-image composition, python-looped over cached compiled chunks
    (NOT lax.map — nested encode/march scans inside a map execute
    pathologically, PERF.md round 2). Returns (rgba [H,W,4], depth).

    With ``occ_bits`` (a scene-space union bitfield, see
    ``union_occupancy_bits``) rays march through occupied space only.
    """
    from focnerf_tpu.core.rays import get_rays

    rays = get_rays(pose, intrinsics, H, W)
    n = H * W
    pad = (-n) % max_ray_batch
    ro = jnp.pad(rays["rays_o"], ((0, pad), (0, 0)))
    rd = jnp.pad(rays["rays_d"], ((0, pad), (0, 0))).at[n:, 2].set(1.0)
    ro = ro.reshape(-1, max_ray_batch, 3)
    rd = rd.reshape(-1, max_ray_batch, 3)

    key = (
        cfg, num_steps, min_near, dt_gamma, max_steps, slab,
        occ_bits is not None,
    )
    if key not in _compose_chunk_cache:
        use_occ = occ_bits is not None

        def chunk_run(stacked_params, o, d, occ_bits, obj_feats, offsets,
                      rots, aabb, bg_color):
            if use_occ:
                res = compose_rays_occupancy(
                    stacked_params, cfg, o, d, occ_bits, obj_feats, offsets,
                    rots, dt_gamma=dt_gamma, max_steps=max_steps, slab=slab,
                    bg_color=bg_color, aabb=aabb, min_near=min_near,
                )
            else:
                res = compose_rays(
                    stacked_params, cfg, o, d, obj_feats, offsets, rots,
                    num_steps=num_steps, bg_color=bg_color, aabb=aabb,
                    min_near=min_near,
                )
            return res["image"], res["depth"], res["alpha"]

        _compose_chunk_cache[key] = jax.jit(chunk_run)
    chunk_jit = _compose_chunk_cache[key]
    outs = [
        chunk_jit(stacked_params, ro[i], rd[i], occ_bits, obj_feats, offsets,
                  rots, aabb, bg_color)
        for i in range(ro.shape[0])
    ]
    rgba = jnp.concatenate(
        [
            jnp.concatenate([o[0] for o in outs]).reshape(-1, 3)[:n],
            jnp.concatenate([o[2] for o in outs]).reshape(-1, 1)[:n],
        ],
        axis=-1,
    ).reshape(H, W, 4)
    depth = jnp.concatenate([o[1] for o in outs]).reshape(-1)[:n].reshape(H, W)
    return rgba, depth
