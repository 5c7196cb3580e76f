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
    _pose_variant,
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
) -> Tuple[DynVoxelField, Dict]:
    """Fit the dynamic field to (pose, image, t) triples by whole-image
    descent with intermediate-plane supervision (train/voxel.py semantics).

    Returns (field, info) with info = {"psnr", "rays_per_sec", "seconds"}.
    """
    import optax
    import time

    from focnerf_tpu.render.baked import _composite_core, warp_gt_to_intermediate

    V, H, W = images.shape[:3]
    poses = np.asarray(poses, np.float32)
    times = np.asarray(times, np.float32)
    gts = jnp.asarray(images, jnp.float32)
    intr_dev = jnp.asarray(intrinsics, jnp.float32)
    ri = resolution * 2

    field = init_dyn_voxel_field(
        resolution, rank=rank, time_slots=time_slots, sh_degree=sh_degree,
        rng=jax.random.key(seed),
    )
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(field)

    step_cache: Dict[Tuple[int, bool], object] = {}
    warped: Dict[int, Tuple[jax.Array, jax.Array]] = {}

    def make_step(axis: int, flip: bool):
        def loss_fn(field, pose_dev, t, wgt, mask):
            raw = collapse_field(field, t)
            vol = field_to_volume(raw, bound, sh_degree)
            C, T, _, _ = _composite_core(
                vol.rgba, bound, pose_dev, axis=axis, flip=flip, ri=ri,
                density_scale=density_scale, sh_deg=sh_degree, remat=remat,
            )
            img_i = C + T[..., None] * bg_color
            m = mask[..., None]
            mse = jnp.sum(m * (img_i - wgt) ** 2) / (
                3.0 * jnp.maximum(jnp.sum(mask), 1.0)
            )
            reg = tv_weight * (
                tv_loss(field.base)
                + jnp.mean(jax.vmap(tv_loss)(field.deltas))
            )
            dw = jnp.diff(field.wslots, axis=0)
            reg = reg + time_smooth_weight * jnp.mean(dw * dw)
            return mse + reg, mse

        @jax.jit
        def step(field, opt_state, pose_dev, t, wgt, mask):
            (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
                field, pose_dev, t, wgt, mask
            )
            updates, opt_state = optimizer.update(g, opt_state)
            return optax.apply_updates(field, updates), opt_state, mse

        return step

    def targets_for(v: int, key: Tuple[int, bool]):
        if v not in warped:
            warped[v] = warp_gt_to_intermediate(
                gts[v], poses[v], intr_dev, bound,
                axis=key[0], flip=key[1], ri=ri,
            )
        return warped[v]

    order = np.random.default_rng(seed).integers(0, V, iters)
    t0 = time.time()
    mse = jnp.float32(1.0)
    for it in range(iters):
        v = int(order[it])
        key = _pose_variant(poses[v], bound)
        if key not in step_cache:
            step_cache[key] = make_step(*key)
        wgt, mask = targets_for(v, key)
        field, opt_state, mse = step_cache[key](
            field, opt_state, jnp.asarray(poses[v]), jnp.float32(times[v]),
            wgt, mask,
        )
        if log_every and (it + 1) % log_every == 0:
            print(f"[dynvoxel] iter {it+1}/{iters} mse {float(mse):.5f}", flush=True)
    jax.block_until_ready(mse)
    dt = time.time() - t0
    psnr = -10.0 * float(jnp.log10(jnp.maximum(mse, 1e-10)))
    info = {
        "psnr": psnr,
        "rays_per_sec": ri * ri * iters / dt,
        "seconds": dt,
    }
    return field, info
