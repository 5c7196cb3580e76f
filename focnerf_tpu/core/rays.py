"""Ray generation from camera poses + intrinsics (jnp, jit-friendly).

Parity target: ``get_rays`` in nerf/utils.py:56-157. The reference mixes
pixel sampling, error-map importance sampling, patch sampling and mask
resizing into one function that runs inside the data loader; here ray math is
a pure jittable function and index sampling is split out so the whole batch
assembly can live on-device.

Convention (matches the reference exactly):
  pixel centers at (col + 0.5, row + 0.5); camera-space direction
  ((i - cx)/fx, (j - cy)/fy, 1) normalized, rotated by the c2w rotation;
  flat pixel index = row * W + col.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def get_rays(pose, intrinsics, H: int, W: int, inds: Optional[jnp.ndarray] = None):
    """Generate world-space rays for a single camera.

    Args:
      pose: [4, 4] (or [3, 4]+) c2w matrix.
      intrinsics: (fx, fy, cx, cy).
      H, W: image size (static).
      inds: optional [N] int32 flat pixel indices; None -> all H*W pixels.

    Returns:
      dict with rays_o [N, 3], rays_d [N, 3] (unit norm), inds [N].
    """
    pose = jnp.asarray(pose, jnp.float32)
    fx, fy, cx, cy = [jnp.float32(v) for v in intrinsics]

    if inds is None:
        inds = jnp.arange(H * W, dtype=jnp.int32)

    rows = (inds // W).astype(jnp.float32)
    cols = (inds % W).astype(jnp.float32)
    i = cols + 0.5  # x / width axis
    j = rows + 0.5  # y / height axis

    xs = (i - cx) / fx
    ys = (j - cy) / fy
    zs = jnp.ones_like(xs)
    dirs = jnp.stack([xs, ys, zs], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    rays_d = jnp.matmul(dirs, pose[:3, :3].T, precision=jax.lax.Precision.HIGHEST)  # [N, 3]
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)

    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds}


def sample_ray_indices(
    rng: jax.Array,
    H: int,
    W: int,
    n_rays: int,
    error_map: Optional[jnp.ndarray] = None,
    patch_size: int = 1,
):
    """Sample flat pixel indices for a training batch.

    Mirrors the three sampling modes of nerf/utils.py:71-117:
      - uniform random pixels (default);
      - patch sampling (contiguous patch_size^2 blocks, for patch losses);
      - error-map importance sampling over a 128x128 coarse grid, refined
        with uniform jitter inside each coarse cell.

    Returns (inds [N], inds_coarse [N] or None).
    """
    n_rays = min(n_rays, H * W)

    if patch_size > 1:
        num_patch = n_rays // (patch_size**2)
        k1, k2 = jax.random.split(rng)
        ix = jax.random.randint(k1, (num_patch,), 0, H - patch_size)
        iy = jax.random.randint(k2, (num_patch,), 0, W - patch_size)
        pi, pj = jnp.meshgrid(jnp.arange(patch_size), jnp.arange(patch_size), indexing="ij")
        offs = jnp.stack([pi.reshape(-1), pj.reshape(-1)], axis=-1)  # [p^2, 2]
        coords = jnp.stack([ix, iy], axis=-1)[:, None, :] + offs[None, :, :]
        coords = coords.reshape(-1, 2)
        inds = (coords[:, 0] * W + coords[:, 1]).astype(jnp.int32)
        return inds, None

    if error_map is None:
        inds = jax.random.randint(rng, (n_rays,), 0, H * W, dtype=jnp.int32)
        return inds, None

    # error-map importance sampling (128x128 coarse grid, ref :100-117)
    k1, k2, k3 = jax.random.split(rng, 3)
    logits = jnp.log(jnp.maximum(error_map.reshape(-1), 1e-12))
    # Gumbel top-k == multinomial sampling without replacement
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(k1, logits.shape) + 1e-12) + 1e-12)
    _, inds_coarse = jax.lax.top_k(logits + gumbel, n_rays)
    inds_coarse = inds_coarse.astype(jnp.int32)

    inds_x = (inds_coarse // 128).astype(jnp.float32)
    inds_y = (inds_coarse % 128).astype(jnp.float32)
    sx, sy = H / 128.0, W / 128.0
    jx = jax.random.uniform(k2, (n_rays,)) * sx
    jy = jax.random.uniform(k3, (n_rays,)) * sy
    px = jnp.clip((inds_x * sx + jx).astype(jnp.int32), 0, H - 1)
    py = jnp.clip((inds_y * sy + jy).astype(jnp.int32), 0, W - 1)
    inds = px * W + py
    return inds, inds_coarse
