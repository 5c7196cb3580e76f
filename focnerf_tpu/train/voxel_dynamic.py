"""Dynamic dense-voxel family: time-conditioned fields, gather-free.

The reference's dynamic path (dnerf/network*.py + dnerf/renderer.py) bends
per-sample marching through a deformation/basis/hyper MLP — every sample
remains a random table gather. This module extends the dense voxel family
(train/voxel.py) to dynamic scenes the TPU way: a LOW-RANK TIME
FACTORIZATION of the raw field,

    raw(x, t) = base(x) + sum_k w_k(t) * delta_k(x),      k = 1..K

where w(t) linearly interpolates learned per-slot weights W [S, K] over
t in [0, 1]. Collapsing the field at a given t is ONE dense einsum
([K, R^3, C] x [K]); rendering and training then ride the exact static
machinery — shear-warp compositor, intermediate-plane supervision — so the
training step stays bandwidth-bound dense work with no per-sample random
access (PERF.md voxel entries). This mirrors the basis variant of the
reference (dnerf/network_basis.py: a K-term learned basis over time)
rather than the deformation variant: deformation needs a per-sample warp
(a gather), which is exactly what this family exists to avoid.

Regularization: 3D TV on base and each delta (train/voxel.py::tv_loss) and
an L2 smoothness penalty on consecutive time slots of W.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.render.baked import BakedVolume
from focnerf_tpu.train.voxel import (
    field_to_volume,
    init_voxel_field,
    tv_loss,
)


class DynVoxelField(NamedTuple):
    """Low-rank dynamic raw field. ``base`` [R,R,R,C], ``deltas``
    [K,R,R,R,C] (C = payload+1, sigma last, pre-activation), ``wslots``
    [S,K] per-slot mixing weights, linearly interpolated over t."""

    base: jax.Array
    deltas: jax.Array
    wslots: jax.Array


def init_dyn_voxel_field(
    resolution: int,
    *,
    rank: int = 4,
    time_slots: int = 16,
    sh_degree: int = 0,
    rng: Optional[jax.Array] = None,
) -> DynVoxelField:
    base = init_voxel_field(resolution, sh_degree, rng=rng)
    C = base.shape[-1]
    deltas = jnp.zeros((rank,) + (resolution,) * 3 + (C,), jnp.float32)
    # start with tiny weights so t=anything reproduces the static init
    wslots = 0.01 * jnp.ones((time_slots, rank), jnp.float32)
    return DynVoxelField(base=base, deltas=deltas, wslots=wslots)


def time_weights(wslots: jax.Array, t) -> jax.Array:
    """w(t) by linear interpolation of the S slots over t in [0, 1]."""
    S = wslots.shape[0]
    x = jnp.clip(jnp.asarray(t, jnp.float32), 0.0, 1.0) * (S - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, S - 2)
    f = x - i0
    return (1.0 - f) * wslots[i0] + f * wslots[i0 + 1]


def collapse_field(field: DynVoxelField, t) -> jax.Array:
    """raw(x, t): one dense einsum over the rank axis."""
    w = time_weights(field.wslots, t)  # [K]
    return field.base + jnp.einsum("k,kxyzc->xyzc", w, field.deltas)


def dyn_reg(
    field: DynVoxelField, tv_weight: float, time_smooth_weight: float
) -> jax.Array:
    """The family regularizer (single source for fit + DP step): 3D TV on
    base and each delta + L2 smoothness on consecutive time slots."""
    r = tv_weight * (
        tv_loss(field.base) + jnp.mean(jax.vmap(tv_loss)(field.deltas))
    )
    dw = jnp.diff(field.wslots, axis=0)
    return r + time_smooth_weight * jnp.mean(dw * dw)


def dyn_field_to_volume(
    field: DynVoxelField, t, bound: float, sh_degree: int = 0
) -> BakedVolume:
    """Renderable BakedVolume at time t (feeds render_baked unchanged)."""
    return field_to_volume(collapse_field(field, t), bound, sh_degree)


def save_dyn_field(path: str, field: DynVoxelField, bound: float, sh_degree: int) -> None:
    np.savez_compressed(
        path,
        base=np.asarray(field.base, np.float16),
        deltas=np.asarray(field.deltas, np.float16),
        wslots=np.asarray(field.wslots, np.float32),
        bound=np.float32(bound),
        sh_deg=np.int32(sh_degree),
    )


def load_dyn_field(path: str) -> Tuple[DynVoxelField, float, int]:
    with np.load(path) as z:
        return (
            DynVoxelField(
                base=jnp.asarray(z["base"].astype(np.float32)),
                deltas=jnp.asarray(z["deltas"].astype(np.float32)),
                wslots=jnp.asarray(z["wslots"]),
            ),
            float(z["bound"]),
            int(z["sh_deg"]),
        )


def make_dyn_dp_step(
    mesh,
    intrinsics: Sequence[float],
    *,
    H: int,
    W: int,
    resolution: int,
    warp_axis: int,
    flip: bool,
    tv_weight: float = 1e-4,
    time_smooth_weight: float = 1e-3,
    **kw,
):
    """Pose-parallel DP step for the low-rank dynamic family (each device
    collapses at its own view's t; the time_conditioned variant of
    train/voxel.py::make_voxel_dp_step).

    step(field, opt_state, poses [D,4,4], times [D], wgts, masks)."""
    from focnerf_tpu.train.voxel import make_voxel_dp_step

    def reg(field):
        return dyn_reg(field, tv_weight, time_smooth_weight)

    return make_voxel_dp_step(
        mesh, intrinsics, H=H, W=W, resolution=resolution,
        warp_axis=warp_axis, flip=flip, collapse_fn=collapse_field,
        reg_fn=reg, time_conditioned=True, **kw,
    )


def fit_dyn_voxels(
    poses: np.ndarray,  # [V, 4, 4] c2w
    images: np.ndarray,  # [V, H, W, 3] in [0, 1]
    times: np.ndarray,  # [V] in [0, 1]
    intrinsics: Sequence[float],
    *,
    resolution: int = 128,
    rank: int = 4,
    time_slots: int = 16,
    bound: float = 1.0,
    sh_degree: int = 0,
    iters: int = 500,
    lr: float = 5e-2,
    tv_weight: float = 1e-4,
    time_smooth_weight: float = 1e-3,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    seed: int = 0,
    log_every: int = 0,
    remat: bool = True,
    steps_per_dispatch: int = 1,
) -> Tuple[DynVoxelField, Dict]:
    """Fit the dynamic field to (pose, image, t) triples by whole-image
    descent with intermediate-plane supervision (train/voxel.py semantics).

    Returns (field, info) with info = {"psnr", "rays_per_sec", "seconds"}.
    """
    from focnerf_tpu.train.voxel import _fit_field_loop

    field = init_dyn_voxel_field(
        resolution, rank=rank, time_slots=time_slots, sh_degree=sh_degree,
        rng=jax.random.key(seed),
    )

    def reg(field):
        return dyn_reg(field, tv_weight, time_smooth_weight)

    return _fit_field_loop(
        poses, images, intrinsics,
        params=field,
        raw_fn=collapse_field,  # collapse at the view's own t
        reg_fn=reg,
        resolution=resolution, bound=bound, sh_degree=sh_degree,
        iters=iters, lr=lr, bg_color=bg_color, density_scale=density_scale,
        seed=seed, log_every=log_every, remat=remat,
        times=times, tag="dynvoxel",
        steps_per_dispatch=steps_per_dispatch,
    )
