"""Vectorized geometry primitives (jnp) replacing the raymarching CUDA utils.

Parity targets in the reference (raymarching/src/raymarching.cu):
  - ``near_far_from_aabb``: kernel_near_far_from_aabb (:92-156)
  - ``sph_from_ray``:       kernel_sph_from_ray (:163-209)
  - ``morton3d`` / ``morton3d_invert``: __morton3D / __morton3D_invert (:56-81)

On TPU these are plain vector ops (VPU) — there is no reason for a custom
kernel; XLA fuses them into neighbouring computations.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Sentinel for rays that miss the AABB (reference uses FLT_MAX).
# Python float, NOT jnp.float32(...): a module-level device constant would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize on multi-host launches.
MISS_T = float(np.float32(3.0e38))


def near_far_from_aabb(rays_o, rays_d, aabb, min_near: float = 0.2):
    """Slab test of rays against an axis-aligned box.

    Args:
      rays_o, rays_d: [..., 3] float. Directions need not be normalized.
      aabb: [6] float (xmin, ymin, zmin, xmax, ymax, zmax).
      min_near: lower clamp on the near distance.

    Returns:
      (nears, fars): [...] float32. Missed rays get ``MISS_T`` for both.
    """
    rays_o = rays_o.astype(jnp.float32)
    rays_d = rays_d.astype(jnp.float32)
    aabb = jnp.asarray(aabb, jnp.float32)

    rdir = 1.0 / rays_d  # inf where d == 0 is fine: IEEE semantics match CUDA
    t1 = (aabb[:3] - rays_o) * rdir
    t2 = (aabb[3:] - rays_o) * rdir
    tmin = jnp.minimum(t1, t2).max(axis=-1)
    tmax = jnp.maximum(t1, t2).min(axis=-1)

    miss = tmax < tmin
    near = jnp.maximum(tmin, min_near)
    # If the box lies entirely behind the ray (tmin < tmax < 0), the CUDA
    # reference leaves far < near, which would give negative deltas downstream;
    # clamp to a zero-length segment instead (renders as pure background).
    far = jnp.maximum(tmax, near)
    near = jnp.where(miss, MISS_T, near)
    far = jnp.where(miss, MISS_T, far)
    return near, far


def sph_from_ray(rays_o, rays_d, radius: float):
    """Intersect rays with a background sphere; return (theta, phi) in [-1, 1].

    Used to parameterize the background model (nerf/renderer.py:211-214).
    """
    rays_o = rays_o.astype(jnp.float32)
    rays_d = rays_d.astype(jnp.float32)

    # solve |o + t d|^2 = r^2 for the far root (d normalized)
    dot_od = jnp.sum(rays_o * rays_d, axis=-1)
    dot_oo = jnp.sum(rays_o * rays_o, axis=-1)
    disc = jnp.maximum(dot_od * dot_od - (dot_oo - radius * radius), 0.0)
    t = -dot_od + jnp.sqrt(disc)
    p = rays_o + t[..., None] * rays_d

    theta = jnp.arctan2(jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2), p[..., 2]) / jnp.pi  # [0,1]
    phi = jnp.arctan2(p[..., 1], p[..., 0]) / jnp.pi  # [-1,1]
    return jnp.stack([2.0 * theta - 1.0, phi], axis=-1)


def _expand_bits(v):
    """Spread the low 10 bits of each uint32 lane to every 3rd bit."""
    v = jnp.asarray(v, jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords):
    """Interleave 3D integer coords ([..., 3], each < 1024) into morton codes."""
    coords = jnp.asarray(coords, jnp.uint32)
    xx = _expand_bits(coords[..., 0])
    yy = _expand_bits(coords[..., 1])
    zz = _expand_bits(coords[..., 2])
    return (xx | (yy << 1) | (zz << 2)).astype(jnp.int32)


def _compact_bits(x):
    x = jnp.asarray(x, jnp.uint32) & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(codes):
    """Inverse of :func:`morton3d`. codes [...] -> coords [..., 3]."""
    codes = jnp.asarray(codes, jnp.uint32)
    x = _compact_bits(codes)
    y = _compact_bits(codes >> 1)
    z = _compact_bits(codes >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
