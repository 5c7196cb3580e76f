"""Iterative full-image renderer with alive-ray compaction.

TPU-native equivalent of the reference's inference worklist
(raymarching.cu:701-914 ``kernel_march_rays``/``kernel_composite_rays``
driven by the shrinking ``rays_alive`` loop, nerf/renderer.py:318-344):
rays march a small sub-slab of samples per round, composite incrementally,
and dead rays (opaque or out of the volume) leave the worklist, so the
field network only ever evaluates samples that can still contribute.

Why it matters here: the one-shot slab renderer pays the exact-encode
gather floor (~128 table rows/sample) for every [ray, slab] cell, alive
or not — ~41 M samples for one 800^2 image at slab 64. On object-centric
scenes most rays saturate within a few samples (T < T_thresh) or exit the
volume immediately; round-compacted marching cuts evaluated samples by
~5-20x. The CUDA loop re-compacts with a device->host sync per iteration
(``rays_alive = rays_alive[rays_alive >= 0]``, renderer.py:343); here the
worklist is re-built on device with ``jnp.nonzero(size=bucket)`` into
power-of-ladder buckets so every round reuses one of a few cached
compiled programs, and the only host traffic is one n_alive scalar per
round.

Resume semantics: dt = clamp(t * dt_gamma, dt_min, dt_max) is memoryless
in t, so a ray whose sub-slab filled at sample t_k resumes the EXACT CUDA
recurrence at t_k + dt_k next round. A ray whose sub-slab did not fill
was exhausted by the marcher (t >= far) and dies. Requires the sphere-
trace skip field (``occupancy_skip_field``) — the dense candidate ladder
would re-probe [bucket, max_steps] cells every round.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from focnerf_tpu.core.geometry import near_far_from_aabb
from focnerf_tpu.models.nerf import NeRFConfig, color_fn, density_fn, encode_objfeat
from focnerf_tpu.ops.marching import march_rays_skip

_round_cache: dict = {}


def _bucket_ladder(n: int, base: int = 4096, factor: int = 4,
                   cap: int = 65536):
    """Bucket sizes {base, base*factor, ...} capped at min(n, cap).

    The cap bounds peak memory: a bucket of B rays evaluates B*sub_slab
    samples through the EXACT encode, whose per-sample intermediates
    (8 corners x L levels) OOM the 16 G chip well before the full 800^2
    worklist (measured 28 G at 640 k rays). Rays beyond the cap simply
    wait — the worklist drains in waves.
    """
    hi = min(n, cap)
    sizes = []
    b = min(base, hi)
    while b < hi:
        sizes.append(b)
        b *= factor
    sizes.append(hi)
    return sizes


def _make_round_body(cfg: NeRFConfig, bucket: int, n: int, sub_slab: int,
                     dt_gamma: float, max_steps: int, grid_size: int,
                     density_scale: float, T_thresh: float, has_objfeat: bool):
    """One compaction round at a fixed bucket size — shared by the
    host-driven ladder (``_make_round_step``) and the device-resident
    drain loop (``_make_fused_render``)."""
    def round_body(params, ro, rd, fars, t_cur, acc_od, acc_rgb, acc_dep,
                   acc_ws, alive, occ_skip, objfeat_enc, aabb):
        idx = jnp.nonzero(alive, size=bucket, fill_value=n)[0]  # [B]
        in_work = idx < n
        safe = jnp.minimum(idx, n - 1)
        o, d = ro[safe], rd[safe]
        t0, far_i = t_cur[safe], jnp.where(in_work, fars[safe], 0.0)

        m = march_rays_skip(
            o, d, t0, far_i, occ_skip,
            bound=cfg.bound, dt_gamma=dt_gamma, max_steps=max_steps,
            slab=sub_slab, grid_size=grid_size,
        )
        xyz = o[:, None, :] + d[:, None, :] * m.ts[..., None]
        xyz = jnp.clip(xyz, aabb[:3], aabb[3:])
        sigmas, geo_feat = density_fn(params, cfg, xyz)  # [B, K]
        sigmas = jnp.where(m.valid, sigmas, 0.0)
        dirs = jnp.broadcast_to(d[:, None, :], xyz.shape)
        rgbs = color_fn(params, cfg, dirs, geo_feat,
                        objfeat_enc if has_objfeat else None)

        # incremental compositing: this round's samples enter at the ray's
        # accumulated optical depth (log-space exclusive prefix — identical
        # math to ops/composite.py::composite_weights, with acc_od as the
        # carried prefix)
        s = (m.dts * density_scale * sigmas.astype(jnp.float32))
        excl = jnp.concatenate(
            [jnp.zeros_like(s[..., :1]), jnp.cumsum(s[..., :-1], axis=-1)], -1
        )
        T_in = jnp.exp(-(acc_od[safe][:, None] + excl))
        w = (1.0 - jnp.exp(-s)) * T_in
        if T_thresh > 0.0:
            w = jnp.where(T_in >= T_thresh, w, 0.0)
        rgb_r = jnp.sum(w[..., None] * rgbs.astype(jnp.float32), axis=-2)
        dep_r = jnp.sum(w * m.ts, axis=-1)
        ws_r = jnp.sum(w, axis=-1)
        od_r = jnp.sum(s, axis=-1)

        od_end = acc_od[safe] + od_r
        # resume position: the recurrence's next lattice point after the
        # last recorded sample (raymarching.cu:371-377 `do t += dt`)
        last = jnp.maximum(m.count - 1, 0)
        take = lambda a: jnp.take_along_axis(a, last[:, None], axis=1)[:, 0]
        t_next = jnp.where(m.count > 0, take(m.ts) + take(m.dts), far_i)
        # a full sub-slab means the marcher stopped at capacity, not at the
        # far plane — the ray stays in the worklist unless it saturated
        still = in_work & (m.count >= sub_slab) & (jnp.exp(-od_end) >= T_thresh)

        upd = lambda acc, v: acc.at[idx].add(jnp.where(in_work, v, 0.0),
                                             mode="drop")
        acc_rgb = acc_rgb.at[idx].add(
            jnp.where(in_work[:, None], rgb_r, 0.0), mode="drop")
        acc_dep = upd(acc_dep, dep_r)
        acc_ws = upd(acc_ws, ws_r)
        acc_od = upd(acc_od, od_r)
        t_cur = t_cur.at[idx].set(jnp.where(in_work, t_next, 0.0), mode="drop")
        alive = alive.at[idx].set(still, mode="drop")
        return t_cur, acc_od, acc_rgb, acc_dep, acc_ws, alive

    return round_body


def _make_round_step(cfg: NeRFConfig, bucket: int, n: int, sub_slab: int,
                     dt_gamma: float, max_steps: int, grid_size: int,
                     density_scale: float, T_thresh: float, has_objfeat: bool):
    return jax.jit(_make_round_body(
        cfg, bucket, n, sub_slab, dt_gamma, max_steps, grid_size,
        density_scale, T_thresh, has_objfeat))


def _make_fused_render(cfg: NeRFConfig, n: int, sub_slab: int,
                       dt_gamma: float, max_steps: int, grid_size: int,
                       density_scale: float, T_thresh: float,
                       has_objfeat: bool, sweep_bucket: int,
                       drain_bucket: int, max_rounds: int):
    """Device-resident worklist drain: ONE dispatch per image.

    The host-driven ladder pays a dispatch + an ``n_alive`` d2h sync per
    round — on the tunneled chip that overhead (~25-50 ms/round over
    10-20 rounds) rivals the compute itself (round-4 eval probe: 838 ms
    at 256^2). Here the whole drain is one compiled program: an initial
    full-width sweep round (every ray marches its first sub-slab — the
    round that kills background rays), then a ``lax.while_loop`` of
    fixed ``drain_bucket`` rounds whose continue-condition
    (``any(alive)``) evaluates ON DEVICE. No host round-trips at all.
    """
    sweep = _make_round_body(cfg, sweep_bucket, n, sub_slab, dt_gamma,
                             max_steps, grid_size, density_scale, T_thresh,
                             has_objfeat)
    drain = _make_round_body(cfg, drain_bucket, n, sub_slab, dt_gamma,
                             max_steps, grid_size, density_scale, T_thresh,
                             has_objfeat)

    @jax.jit
    def run(params, ro, rd, fars, t_cur, acc_od, acc_rgb, acc_dep,
            acc_ws, alive, occ_skip, objfeat_enc, aabb):
        carry = (t_cur, acc_od, acc_rgb, acc_dep, acc_ws, alive)
        # sweep waves: ceil(n / sweep_bucket) fixed rounds touch every ray
        for _ in range(-(-n // sweep_bucket)):
            carry = sweep(params, ro, rd, fars, *carry, occ_skip,
                          objfeat_enc, aabb)

        def cond(c):
            return jnp.logical_and(c[0] < max_rounds, jnp.any(c[1][5]))

        def body(c):
            r, cc = c
            return r + 1, drain(params, ro, rd, fars, *cc, occ_skip,
                                objfeat_enc, aabb)

        _, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), carry))
        return carry

    return run


def render_rays_iterative(
    params,
    cfg: NeRFConfig,
    rays_o: jax.Array,
    rays_d: jax.Array,
    occ_skip: jax.Array,
    *,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    sub_slab: int = 16,
    bg_color=1.0,
    aabb: Optional[jax.Array] = None,
    min_near: float = 0.2,
    T_thresh: float = 1e-4,
    obj_feat=None,
    grid_size: int = 128,
    max_rounds: int = 256,
    bucket_base: int = 4096,
    bucket_cap: int = 65536,
    device_loop: bool = False,
):
    """Render a flat ray batch through the compacted worklist loop.

    Returns dict(image [N, 3], depth [N] normalized, weights_sum [N]).
    """
    if aabb is None:
        b = cfg.bound
        aabb = jnp.asarray([-b, -b, -b, b, b, b], jnp.float32)
    n = rays_o.shape[0]
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)

    objfeat_enc = None
    if cfg.use_objfeat:
        assert obj_feat is not None, "cfg.use_objfeat=True requires obj_feat"
        objfeat_enc = encode_objfeat(params, cfg, obj_feat)

    t_cur = nears
    acc_od = jnp.zeros((n,), jnp.float32)
    acc_rgb = jnp.zeros((n, 3), jnp.float32)
    acc_dep = jnp.zeros((n,), jnp.float32)
    acc_ws = jnp.zeros((n,), jnp.float32)
    alive = nears < fars

    key_base = (cfg, n, sub_slab, dt_gamma, max_steps, grid_size,
                cfg.density_scale, T_thresh, objfeat_enc is not None)
    if device_loop:
        key = key_base + ("fused", bucket_base, bucket_cap, max_rounds)
        if key not in _round_cache:
            _round_cache[key] = _make_fused_render(
                cfg, n, sub_slab, dt_gamma, max_steps, grid_size,
                cfg.density_scale, T_thresh, objfeat_enc is not None,
                sweep_bucket=min(n, bucket_cap),
                drain_bucket=min(n, bucket_base), max_rounds=max_rounds)
        t_cur, acc_od, acc_rgb, acc_dep, acc_ws, alive = _round_cache[key](
            params, rays_o, rays_d, fars, t_cur, acc_od, acc_rgb, acc_dep,
            acc_ws, alive, occ_skip, objfeat_enc, aabb)
        image = acc_rgb
        if bg_color is not None:
            image = image + (1.0 - acc_ws)[:, None] * bg_color
        depth = jnp.clip(acc_dep - nears, 0.0, None) / jnp.maximum(
            fars - nears, 1e-10)
        return {"image": image, "depth": depth, "weights_sum": acc_ws}

    buckets = _bucket_ladder(n, base=min(bucket_base, n), cap=bucket_cap)
    for _ in range(max_rounds):
        n_alive = int(jnp.sum(alive))  # one scalar d2h per round (the CUDA
        if n_alive == 0:               # loop syncs shapes the same way)
            break
        bucket = next(b for b in buckets if b >= min(n_alive, buckets[-1]))
        key = key_base + (bucket,)
        if key not in _round_cache:
            _round_cache[key] = _make_round_step(
                cfg, bucket, n, sub_slab, dt_gamma, max_steps, grid_size,
                cfg.density_scale, T_thresh, objfeat_enc is not None)
        t_cur, acc_od, acc_rgb, acc_dep, acc_ws, alive = _round_cache[key](
            params, rays_o, rays_d, fars, t_cur, acc_od, acc_rgb, acc_dep,
            acc_ws, alive, occ_skip, objfeat_enc, aabb)

    image = acc_rgb
    if bg_color is not None:
        image = image + (1.0 - acc_ws)[:, None] * bg_color
    depth = jnp.clip(acc_dep - nears, 0.0, None) / jnp.maximum(
        fars - nears, 1e-10)
    return {"image": image, "depth": depth, "weights_sum": acc_ws}


def render_image_iterative(
    params,
    cfg: NeRFConfig,
    pose,
    intrinsics,
    H: int,
    W: int,
    *,
    occ_skip: jax.Array,
    bg_color=1.0,
    obj_feat=None,
    **kw,
):
    """Full-image iterative render -> (image [H, W, 3], depth [H, W]).

    Unlike the chunked one-shot renderer there is no ray chunking: the
    bucket ladder IS the chunking, and one worklist over the whole image
    lets background rays vacate their slots for foreground rounds.
    """
    from focnerf_tpu.core.rays import get_rays

    rays = get_rays(pose, intrinsics, H, W)
    out = render_rays_iterative(
        params, cfg, rays["rays_o"], rays["rays_d"], occ_skip,
        bg_color=bg_color, obj_feat=obj_feat, **kw)
    return (out["image"].reshape(H, W, 3), out["depth"].reshape(H, W))
