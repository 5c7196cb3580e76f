"""Volume rendering paths.

``render_rays`` is the uniform-sampling path (parity target: the PyTorch
``NeRFRenderer.run``, nerf/renderer.py:126-238): fixed ``num_steps`` linspace
samples in [near, far], dense density/color evaluation, log-space prefix-sum
compositing (ops/composite.py).
Everything is fixed-shape and jit-friendly; chunked ("staged") rendering is a
``lax.map`` over ray chunks instead of a python loop (nerf/renderer.py:524-554).

``render_rays_occupancy`` is the accelerated path (parity target:
``NeRFRenderer.run_cuda``, nerf/renderer.py:243-354): occupancy-bitfield ray
marching (ops/marching.py) into a fixed [N, slab] sample slab, one batched
field evaluation, early-terminated compositing. The reference's shrinking
``rays_alive`` worklist becomes transmittance masking — fixed shapes, no
host syncs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from focnerf_tpu.core.geometry import near_far_from_aabb, sph_from_ray
from focnerf_tpu.models.nerf import (
    NeRFConfig,
    background_fn,
    color_fn,
    density_fn,
    encode_objfeat,
)
from focnerf_tpu.ops.composite import composite_rays
from focnerf_tpu.ops.marching import march_rays, march_rays_skip


def default_aabb(cfg: NeRFConfig) -> jnp.ndarray:
    b = cfg.bound
    return jnp.array([-b, -b, -b, b, b, b], jnp.float32)


def sample_pdf(rng, bins, weights, n_samples: int, det: bool = False):
    """Inverse-CDF importance sampling (nerf/renderer.py:13-44).

    bins [..., T+1] edges, weights [..., T] -> samples [..., n_samples].
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [..., T+1]

    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(rng, cdf.shape[:-1] + (n_samples,))

    # batched right-searchsorted: #{i : cdf_i <= u} per ray (compare-all form)
    flat_cdf = cdf.reshape(-1, cdf.shape[-1])
    flat_u = u.reshape(-1, u.shape[-1])
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(flat_cdf, flat_u)
    inds = inds.reshape(u.shape)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def render_rays(
    params,
    cfg: NeRFConfig,
    rays_o: jax.Array,
    rays_d: jax.Array,
    *,
    num_steps: int = 512,
    upsample_steps: int = 0,
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
    bg_color=None,
    aabb: Optional[jax.Array] = None,
    min_near: float = 0.2,
    obj_feat: Optional[jax.Array] = None,
    return_fields: bool = False,
) -> Dict[str, Any]:
    """Render a flat batch of rays with uniform sampling.

    Args:
      rays_o, rays_d: [N, 3] (rays_d unit norm).
      num_steps: static sample count per ray (reference default 512).
      upsample_steps: extra importance samples drawn from the coarse weight
        PDF (the torch-ngp two-pass path, legacy/nerf/renderer.py; the FOC
        run() accepts but defaults it to 0).
      rng: PRNG key, required when perturb=True.
      bg_color: None -> white (1.0) unless cfg.bg_radius > 0 (learned bg);
        or scalar / [3] / [N, 3] explicit background.
      obj_feat: raw per-image YOLO feature [yolo_feats_dim] (FOC conditioning).
      return_fields: also return per-sample sigmas/rgbs (composition needs them
        only in the reference design; our compositor streams instead, but the
        fields are exposed for parity and debugging).

    Returns dict(image [N,3], depth [N], weights_sum [N], sigmas, rgbs?).
    """
    n = rays_o.shape[0]
    if aabb is None:
        aabb = default_aabb(cfg)

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    nears = nears[:, None]
    fars = fars[:, None]

    z = jnp.linspace(0.0, 1.0, num_steps, dtype=jnp.float32)[None, :]  # [1, T]
    z_vals = nears + (fars - nears) * z  # [N, T]
    sample_dist = (fars - nears) / num_steps

    if perturb:
        assert rng is not None, "perturb=True requires rng"
        rng, k_pert = jax.random.split(rng)
        z_vals = z_vals + (jax.random.uniform(k_pert, z_vals.shape) - 0.5) * sample_dist

    if upsample_steps > 0:
        # coarse density pass -> importance samples -> merged sorted z grid
        if perturb:
            assert rng is not None, "upsample_steps with perturb requires rng"
            rng, k_up = jax.random.split(rng)
        else:
            k_up = jax.random.key(0)  # unused: det (midpoint) sampling
        xyz_c = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        xyz_c = jnp.clip(xyz_c, aabb[:3], aabb[3:])
        sig_c, _ = density_fn(params, cfg, xyz_c)
        from focnerf_tpu.ops.composite import composite_weights

        deltas_c = jnp.diff(z_vals, axis=-1)
        deltas_c = jnp.concatenate(
            [deltas_c, jnp.broadcast_to(sample_dist, deltas_c[..., :1].shape)], -1
        )
        w_c = composite_weights(sig_c, deltas_c, cfg.density_scale)
        # midpoint as a + (b-a)/2, NOT (a+b)/2: rays that miss the aabb carry
        # the 3e38 near/far sentinel, and a+b overflows fp32 to inf there —
        # inf bins make sample_pdf emit NaN z, which poisons the whole
        # batch's gradients through the table scatter
        mids = z_vals[..., :-1] + 0.5 * (z_vals[..., 1:] - z_vals[..., :-1])
        new_z = sample_pdf(k_up, mids, w_c[..., 1:-1], upsample_steps, det=not perturb)
        new_z = jax.lax.stop_gradient(new_z)
        z_vals = jnp.sort(jnp.concatenate([z_vals, new_z], axis=-1), axis=-1)

    xyzs = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]  # [N, T, 3]
    xyzs = jnp.clip(xyzs, aabb[:3], aabb[3:])

    k_enc = jax.random.fold_in(rng, 7) if rng is not None and perturb else None
    sigmas, geo_feat = density_fn(params, cfg, xyzs, rng=k_enc)  # [N, T], [N, T, G]

    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate([deltas, jnp.broadcast_to(sample_dist, deltas[..., :1].shape)], -1)

    objfeat_enc = None
    if cfg.use_objfeat:
        assert obj_feat is not None, "cfg.use_objfeat=True requires obj_feat"
        objfeat_enc = encode_objfeat(params, cfg, obj_feat)

    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    rgbs = color_fn(params, cfg, dirs, geo_feat, objfeat_enc)  # [N, T, 3]

    if cfg.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, cfg.bg_radius)
        bg = background_fn(params, cfg, sph, rays_d)
    elif bg_color is None:
        bg = 1.0
    else:
        bg = bg_color

    # normalized depth coordinate, as the reference (renderer.py:205-206)
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
    if return_fields:
        result["rgbs"] = rgbs
        result["z_vals"] = z_vals
        result["deltas"] = deltas
    return result


def render_rays_occupancy(
    params,
    cfg: NeRFConfig,
    rays_o: jax.Array,
    rays_d: jax.Array,
    occ_bits: jax.Array,
    *,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    slab: int = 128,
    rng: Optional[jax.Array] = None,
    perturb: bool = False,
    bg_color=None,
    aabb: Optional[jax.Array] = None,
    min_near: float = 0.2,
    T_thresh: float = 1e-4,
    obj_feat: Optional[jax.Array] = None,
    grid_size: int = 128,
    occ_skip: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Occupancy-accelerated render of a flat ray batch.

    Mirrors run_cuda: adaptive dt marching restricted to occupied cells,
    density_scale applied to sigma, depth normalized to [0, 1] by
    clamp(depth - near) / (far - near) (nerf/renderer.py:288,299,347).

    When ``occ_skip`` (occupancy_skip_field of the bitfield) is given, rays
    are marched with the sphere-tracing skip walk instead of the dense
    candidate ladder — ~8x fewer bitfield gathers (PERF.md round 2).
    """
    if aabb is None:
        aabb = default_aabb(cfg)
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
    k_enc = jax.random.fold_in(rng, 7) if rng is not None and perturb else None
    sigmas, geo_feat = density_fn(params, cfg, xyzs, rng=k_enc)  # [N, K]
    sigmas = jnp.where(m.valid, sigmas, 0.0)

    objfeat_enc = None
    if cfg.use_objfeat:
        assert obj_feat is not None, "cfg.use_objfeat=True requires obj_feat"
        objfeat_enc = encode_objfeat(params, cfg, obj_feat)
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    rgbs = color_fn(params, cfg, dirs, geo_feat, objfeat_enc)

    if cfg.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, cfg.bg_radius)
        bg = background_fn(params, cfg, sph, rays_d)
    elif bg_color is None:
        bg = 1.0
    else:
        bg = bg_color

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
    return {
        "image": out["image"],
        "depth": depth,
        "weights_sum": out["weights_sum"],
        "sigmas": sigmas,
        "n_samples": m.count,
    }


class _LRUJitCache(dict):
    """Bounded cache of jitted chunk closures.

    Keys embed cfg/slab/dt settings, so a long-lived process sweeping
    configs (quality_exp, a viewer toggling slab) would otherwise pin one
    compiled TPU executable (tens of MB) per distinct key forever.
    """

    def __init__(self, maxsize: int = 16):
        super().__init__()
        self.maxsize = maxsize

    def __getitem__(self, key):
        # refresh on access (true LRU): without this, a hot key inserted
        # first is evicted before cold keys once the cache fills (ADVICE r2)
        value = super().__getitem__(key)
        super().__delitem__(key)
        super().__setitem__(key, value)
        return value

    def __setitem__(self, key, value):
        if key not in self and len(self) >= self.maxsize:
            del self[next(iter(self))]  # evict least-recently-used
        super().__setitem__(key, value)


_chunk_render_cache = _LRUJitCache()


def render_image(
    params,
    cfg: NeRFConfig,
    pose,
    intrinsics,
    H: int,
    W: int,
    *,
    num_steps: int = 512,
    upsample_steps: int = 0,
    max_ray_batch: int = 4096,
    bg_color=None,
    aabb=None,
    min_near: float = 0.2,
    obj_feat=None,
    occ_bits: Optional[jax.Array] = None,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    slab: int = 64,
    occ_skip: Optional[jax.Array] = None,
):
    """Full-image staged render: a python loop over fixed-size ray chunks.

    NOT lax.map: the encode/march scans nested inside a map both compile and
    execute pathologically (the 16 s/frame eval of PERF.md round 2); the
    loop dispatches one cached compiled chunk program (~1.6 ms/dispatch
    against multi-ms chunks), exactly like the reference's python-loop
    staged mode (nerf/renderer.py:524-554) but with a single compilation.

    When ``occ_bits`` is given, rays go through the occupancy-accelerated
    marcher (``render_rays_occupancy``) instead of ``num_steps`` uniform
    samples — the equivalent of the reference routing eval/test/GUI through
    ``run_cuda`` whenever --cuda_ray is on (nerf/renderer.py:318-354).
    ``occ_skip`` additionally switches it to the sphere-trace skip marcher.
    Returns (image [H, W, 3], depth [H, W]).
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
        cfg, num_steps, upsample_steps, min_near, dt_gamma, max_steps, slab,
        occ_bits is not None, occ_skip is not None,
    )
    if key not in _chunk_render_cache:
        use_occ = occ_bits is not None

        def chunk_run(params, o, d, obj_feat, occ_bits, occ_skip, aabb, bg_color):
            if use_occ:
                res = render_rays_occupancy(
                    params, cfg, o, d, occ_bits,
                    dt_gamma=dt_gamma, max_steps=max_steps, slab=slab,
                    bg_color=bg_color, aabb=aabb, min_near=min_near,
                    obj_feat=obj_feat, occ_skip=occ_skip,
                )
            else:
                res = render_rays(
                    params, cfg, o, d, num_steps=num_steps,
                    upsample_steps=upsample_steps,  # det (midpoint) samples
                    bg_color=bg_color, aabb=aabb, min_near=min_near,
                    obj_feat=obj_feat,
                )
            return res["image"], res["depth"]

        _chunk_render_cache[key] = jax.jit(chunk_run)
    chunk_jit = _chunk_render_cache[key]
    outs = [
        chunk_jit(params, ro[i], rd[i], obj_feat, occ_bits, occ_skip, aabb, bg_color)
        for i in range(ro.shape[0])
    ]
    image = jnp.concatenate([o[0] for o in outs]).reshape(-1, 3)[:n]
    depth = jnp.concatenate([o[1] for o in outs]).reshape(-1)[:n]
    return image.reshape(H, W, 3), depth.reshape(H, W)
