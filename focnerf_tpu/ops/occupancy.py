"""Occupancy-grid state: density cache, bitfield and maintenance updates.

TPU-native replacement for the renderer's "extra state" and its CUDA helpers:

  - density grid [CAS, H^3] with EMA decay 0.95 (nerf/renderer.py:419-507,
    ``update_extra_state``): full sweep for the first 16 updates, then
    random + occupied-cell resampling;
  - ``packbits`` (raymarching.cu:268-300) — here the working set is a plain
    bool grid (TPU gathers don't benefit from bit packing; pack/unpack
    helpers are provided for checkpoint compatibility);
  - ``mark_untrained_grid`` (nerf/renderer.py:356-417) — frustum coverage
    test marking never-seen cells as -1.

Design deviations from the reference (deliberate, documented):
  - cells are indexed in plain linear (x-major) order, not morton order;
    morton only mattered for CUDA cache locality. ``core.geometry.morton3d``
    exists for tooling parity.
  - the partial update samples occupied cells by categorical sampling over
    the >0 mask instead of materializing a dynamic nonzero() index list
    (fixed shapes under jit).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class OccupancyState(NamedTuple):
    density_grid: jax.Array  # [CAS, H^3] f32; -1 marks untrained cells
    mean_density: jax.Array  # scalar f32
    iter_density: jax.Array  # scalar i32


def cascade_count(bound: float) -> int:
    return 1 + math.ceil(math.log2(max(bound, 1.0)))


def init_occupancy(bound: float, grid_size: int = 128) -> OccupancyState:
    cas = cascade_count(bound)
    return OccupancyState(
        density_grid=jnp.zeros((cas, grid_size**3), jnp.float32),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def occupancy_bitfield(occ: OccupancyState, density_thresh: float) -> jax.Array:
    """Bool grid [CAS, H^3]: cell occupied iff density > min(mean, thresh).

    Mirrors packbits at nerf/renderer.py:500-501.
    """
    thresh = jnp.minimum(occ.mean_density, density_thresh)
    return occ.density_grid > thresh


def pack_bits(bits: jax.Array) -> jax.Array:
    """Bool [..., 8k] -> uint8 [..., k] (LSB-first, as raymarching.cu:268-300)."""
    b = bits.reshape(*bits.shape[:-1], -1, 8).astype(jnp.uint8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(b << shifts, axis=-1).astype(jnp.uint8)


def unpack_bits(packed: jax.Array) -> jax.Array:
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1
    return bits.reshape(*packed.shape[:-1], -1).astype(bool)


def cell_centers(grid_size: int) -> jax.Array:
    """All H^3 cell coords in linear order -> [H^3, 3] int32."""
    r = jnp.arange(grid_size, dtype=jnp.int32)
    x, y, z = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)


def linear_index(coords: jax.Array, grid_size: int) -> jax.Array:
    """[..., 3] int coords -> flat x-major index."""
    return (
        coords[..., 0] * grid_size * grid_size + coords[..., 1] * grid_size + coords[..., 2]
    )


def _cascade_world_coords(coords01, cas: int, bound: float, grid_size: int):
    """Map [-1,1] cell coords to cascade-``cas`` world coords (renderer.py:448-452)."""
    cas_bound = min(2.0**cas, bound)
    half = cas_bound / grid_size
    return coords01 * (cas_bound - half), half


def update_occupancy(
    occ: OccupancyState,
    density_eval: Callable[[jax.Array], jax.Array],
    rng: jax.Array,
    *,
    bound: float,
    density_scale: float = 1.0,
    decay: float = 0.95,
    grid_size: int = 128,
    chunk: int = 2**17,
    full: bool | None = None,
) -> OccupancyState:
    """One maintenance step of the density grid (nerf/renderer.py:419-507).

    Args:
      density_eval: xyz [M, 3] -> sigma [M] (density_fn with params closed in).
      full: force full (True) / partial (False) sweep; None follows the
        reference rule "full for the first 16 updates" — note that rule uses
        a *traced* counter, so pass an explicit python bool when calling
        under jit with donated state if you need static behaviour.

    Returns the updated state (functional; no buffers mutated).
    """
    cas_total = occ.density_grid.shape[0]
    n_cells = grid_size**3

    def query_density(xyzs):
        # chunked evaluation to bound peak memory (ref S=128^3 splits)
        flat = xyzs.reshape(-1, chunk, 3)
        sig = jax.lax.map(density_eval, flat)
        return sig.reshape(-1) * density_scale

    coords = cell_centers(grid_size)  # [H^3, 3]
    coords01_all = 2.0 * coords.astype(jnp.float32) / (grid_size - 1) - 1.0

    def full_sweep(rng):
        tmp = []
        for cas in range(cas_total):
            k = jax.random.fold_in(rng, cas)
            cxyz, half = _cascade_world_coords(coords01_all, cas, bound, grid_size)
            jitter = (jax.random.uniform(k, cxyz.shape) * 2.0 - 1.0) * half
            tmp.append(query_density(cxyz + jitter))
        return jnp.stack(tmp)  # [CAS, H^3]

    def partial_sweep(rng):
        n = n_cells // 4
        tmp = jnp.full((cas_total, n_cells), -1.0, jnp.float32)
        for cas in range(cas_total):
            k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, cas), 3)
            rand_idx = jax.random.randint(k1, (n,), 0, n_cells)
            # resample currently-occupied cells via inverse-CDF over the >0
            # mask (jax.random.categorical would materialize an [n, cells]
            # gumbel array — quadratic memory)
            occ_mask = occ.density_grid[cas] > 0
            cdf = jnp.cumsum(occ_mask.astype(jnp.float32))
            total = cdf[-1]
            u = jax.random.uniform(k2, (n,)) * jnp.maximum(total, 1.0)
            occ_idx = jnp.clip(
                jnp.searchsorted(cdf, u, side="left"), 0, n_cells - 1
            ).astype(jnp.int32)
            # nothing occupied yet -> fall back to the uniform half
            occ_idx = jnp.where(total > 0, occ_idx, rand_idx)
            idx = jnp.concatenate([rand_idx, occ_idx])
            c01 = coords01_all[idx]
            cxyz, half = _cascade_world_coords(c01, cas, bound, grid_size)
            jitter = (jax.random.uniform(k3, cxyz.shape) * 2.0 - 1.0) * half
            sig = query_density(cxyz + jitter)
            tmp = tmp.at[cas, idx].set(sig)
        return tmp

    if full is None:
        # match reference semantics with a lax.cond on the traced counter
        tmp_grid = jax.lax.cond(
            occ.iter_density < 16, full_sweep, partial_sweep, rng
        )
    elif full:
        tmp_grid = full_sweep(rng)
    else:
        tmp_grid = partial_sweep(rng)

    valid = (occ.density_grid >= 0) & (tmp_grid >= 0)
    new_grid = jnp.where(
        valid, jnp.maximum(occ.density_grid * decay, tmp_grid), occ.density_grid
    )
    mean_density = jnp.mean(jnp.clip(new_grid, 0.0, None))
    return OccupancyState(
        density_grid=new_grid,
        mean_density=mean_density,
        iter_density=occ.iter_density + 1,
    )


def mark_untrained_grid(
    occ: OccupancyState,
    poses: jax.Array,  # [B, 4, 4] c2w
    intrinsics,
    *,
    bound: float,
    grid_size: int = 128,
    chunk: int = 2**16,
) -> OccupancyState:
    """Mark cells never seen by any training camera as -1 (renderer.py:356-417)."""
    fx, fy, cx, cy = [float(v) for v in intrinsics]
    cas_total = occ.density_grid.shape[0]
    coords = cell_centers(grid_size)
    coords01 = 2.0 * coords.astype(jnp.float32) / (grid_size - 1) - 1.0

    R = poses[:, :3, :3].astype(jnp.float32)  # [B, 3, 3]
    T = poses[:, :3, 3].astype(jnp.float32)  # [B, 3]

    grids = []
    for cas in range(cas_total):
        world, half = _cascade_world_coords(coords01, cas, bound, grid_size)

        def covered(pts):
            # world -> cam: (p - t) @ R (c2w rotation transposed twice, see ref :400-402)
            rel = pts[:, None, :] - T[None, :, :]  # [n, B, 3]
            cam = jnp.einsum("nbi,bij->nbj", rel, R)
            mz = cam[..., 2] > 0
            mx = jnp.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half * 2
            my = jnp.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half * 2
            return jnp.any(mz & mx & my, axis=1)  # [n]

        seen = jax.lax.map(covered, world.reshape(-1, chunk, 3)).reshape(-1)
        grids.append(jnp.where(seen, occ.density_grid[cas], -1.0))
    return occ._replace(density_grid=jnp.stack(grids))


def occupancy_skip_field(occ_bits: jax.Array, grid_size: int = 128) -> jax.Array:
    """Per-cell safe empty-space skip radii from the occupancy bitfield.

    For each cell: 0 if occupied, else the largest k in {1, 2, 4, ..., H/2}
    such that NO occupied cell lies within L-inf distance k (so a ray may
    advance k cell-sizes and every cell it can touch stays empty). The
    TPU-native replacement for the CUDA marcher's one-cell-at-a-time DDA
    skipping (raymarching.cu:365-377): precomputed dense morphology instead
    of per-thread voxel walks.

    Built by dilation doubling: the L-inf ball satisfies B_{2k} = B_k + B_k,
    so dilation by radius 2k is the radius-k dilation applied to the
    radius-k result — log2(H) rounds of separable 1D max-filters. A cell's
    skip is the number of consecutive dilations that leave it uncovered
    (uncovered by dil_k  <=>  nearest occupied cell is at distance > k).

    occ_bits: [CAS, H^3] bool. Returns [CAS, H^3] uint8 codes:
      0     occupied cell (sample here);
      1     unoccupied (advance past the cell boundary only);
      k + 1 unoccupied, no occupied cell within L-inf distance k — the
            marcher may advance past the boundary plus (k - 1) extra cells
            (segment stays within L-inf k of the start cell, all empty).
    """
    cas = occ_bits.shape[0]
    occ = occ_bits.reshape(cas, grid_size, grid_size, grid_size).astype(jnp.uint8)

    def dilate(v, k):
        # separable L-inf dilation by radius k: 1D max-filter per axis
        for axis in (1, 2, 3):
            v = jax.lax.reduce_window(
                v, jnp.uint8(0), jax.lax.max,
                window_dimensions=[1 if a != axis else 2 * k + 1 for a in range(4)],
                window_strides=(1, 1, 1, 1),
                padding=[(0, 0) if a != axis else (k, k) for a in range(4)],
            )
        return v

    skip = jnp.where(occ > 0, 0, 1).astype(jnp.uint8)  # occupied -> 0
    dil = occ
    k = 1
    while k <= min(grid_size // 2, 127):
        dil = dilate(dil, k // 2 if k > 1 else 1)  # doubling: radius k total
        # uncovered by the radius-k dilation -> nearest occupied > k away
        skip = jnp.where((dil == 0) & (skip > 0), jnp.uint8(k + 1), skip)
        k *= 2
    return skip.reshape(cas, -1)
