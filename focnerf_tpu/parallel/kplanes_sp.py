"""Slice-axis model parallelism for the K-planes dynamic family.

What actually hits the HBM ceiling at production dynamic resolutions
(512^3+) is NOT the factor planes — six rank-K planes at 512 are ~100 MB —
but the COLLAPSED dense grid the shear-warp compositor consumes: the
[R, R, R, C] intermediate (plus its autodiff residuals) is 2 GB at 512^3
and 16 GB at 1024^3. So this module shards the collapse itself: each
device materializes only its own warp-axis slab of the collapsed grid
directly from the factor planes (the k-rank scan of
train/voxel_kplanes.py::collapse_kplanes restricted to local rows), folds
it, and the per-device partials combine with the same optical-depth
associative rule as the dense SP step
(parallel/voxel_sp.py::_sp_slab_strip_mse — shared code).

Measured design decision — planes stay REPLICATED rather than sharded:
sharding the two warp-axis-bearing planes would keep 2/3 of the plane
gradients local at the cost of a TV halo, per-axis re-sharding of params
AND adam state at every pose-variant switch, and a split-param optimizer
tree; since plane params are two orders of magnitude below the collapsed
grid, replication removes none of the memory win and the only cost is one
plane-gradient psum per step (the cotangent of a replicated shard_map
input psums across devices — verified by tests/test_kplanes_sp.py's exact
parity against the unsharded step). The family regularizer (plane TV +
time smoothness) is computed once at the jit level on the replicated
planes — no halo needed at all.

No reference equivalent (the reference's dynamic stack is per-sample
deformation MLPs on one GPU — dnerf/network*.py, SURVEY §2.3); this is
the model-parallel path for the production dynamic family.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from focnerf_tpu.parallel.voxel_sp import _sp_slab_strip_mse
from focnerf_tpu.train.voxel_kplanes import (
    KPlanesField,
    _time_vectors,
    kplanes_reg,
)


def _collapse_local_slab(
    field: KPlanesField, t, warp_axis: int, d_idx, R_loc: int
) -> jax.Array:
    """Collapse ONLY this device's warp-axis slab of the dense raw grid.

    Same rank-k scan as collapse_kplanes, with the factors that carry the
    warp axis sliced to local rows first (dynamic_slice transposes to a
    zero-padded full-shape cotangent, so plane grads psum exactly).
    Output: canonical [X, Y, Z, C] with the warp dim of size R_loc.
    """
    v = _time_vectors(field.time, t)  # [3, R, K, C]: vx, vy, vz
    A = field.space[0] * v[0][:, None] * v[1][None, :]  # xy * vx * vy
    B = field.space[1] * v[2][None, :]  # xz * vz
    Cp = field.space[2]  # yz
    g0 = d_idx * R_loc

    def rows(p, dim):
        start = [0] * p.ndim
        start[dim] = g0
        size = list(p.shape)
        size[dim] = R_loc
        return jax.lax.dynamic_slice(p, start, size)

    if warp_axis == 0:  # x rows live in xy (dim 0) and xz (dim 0)
        A, B = rows(A, 0), rows(B, 0)
    elif warp_axis == 1:  # y rows live in xy (dim 1) and yz (dim 0)
        A, Cp = rows(A, 1), rows(Cp, 0)
    else:  # z rows live in xz (dim 1) and yz (dim 1)
        B, Cp = rows(B, 1), rows(Cp, 1)

    Cc = A.shape[-1]
    out_shape = (A.shape[0], A.shape[1], B.shape[1], Cc)

    def body(acc, ops):
        A_k, B_k, C_k = ops  # [X, Y, C], [X, Z, C], [Y, Z, C]
        return acc + A_k[:, :, None] * B_k[:, None, :] * C_k[None], None

    ops = tuple(jnp.moveaxis(p, 2, 0) for p in (A, B, Cp))
    g, _ = jax.lax.scan(body, jnp.zeros(out_shape, jnp.float32), ops)
    return field.w * g + field.b


def make_kplanes_sp_step(
    mesh,
    *,
    resolution: int,
    warp_axis: int,
    flip: bool,
    bound: float = 1.0,
    sh_degree: int = 0,
    lr: float = 2e-2,
    tv_weight: float = 1e-4,
    time_smooth_weight: float = 1e-3,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    intermediate_scale: int = 2,
    remat: bool = True,
    block: int = 32,
):
    """Collapse-sharded K-planes train step (intermediate supervision).

    Returns (optimizer, step) with
      step(field, opt_state, pose [4,4], t [], wgt [ri,ri,3], mask [ri,ri])
        -> (field, opt_state, mse)
    Field + adam state replicate (tiny); the collapsed grid, its fold, and
    every autodiff residual stay sharded along the warp axis. Unlike the
    dense SP step there is no shard_fn: nothing persistent needs resharding
    on a pose-variant switch, so variant-grouped training pays only a
    recompile per (axis, flip), never a state move.
    """
    import optax

    axis_name = mesh.axis_names[0]
    D = mesh.shape[axis_name]
    R = resolution
    assert R % D == 0, (R, D)
    R_loc = R // D
    ri = R * intermediate_scale
    assert ri % D == 0, (ri, D)
    rows_loc = ri // D

    def device_mse(field, pose, t, wgt, mask):
        d_idx = jax.lax.axis_index(axis_name)
        raw_loc = _collapse_local_slab(field, t, warp_axis, d_idx, R_loc)
        return _sp_slab_strip_mse(
            raw_loc, pose, wgt, mask, d_idx,
            axis_name=axis_name, warp_axis=warp_axis, flip=flip,
            R=R, R_loc=R_loc, ri=ri, rows_loc=rows_loc, bound=bound,
            sh_degree=sh_degree, density_scale=density_scale,
            bg_color=bg_color, remat=remat, block=block,
        )

    try:
        from jax import shard_map

        smapped = shard_map(
            device_mse,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    except (ImportError, TypeError):  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

        smapped = shard_map(
            device_mse,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=P(),
            check_rep=False,
        )

    optimizer = optax.adam(lr)
    repl = NamedSharding(mesh, P())

    def loss_fn(field, pose, t, wgt, mask):
        mse = smapped(field, pose, t, wgt, mask)
        # the family regularizer reads only the (replicated) planes — one
        # jit-level evaluation, no halo, identical to the unsharded step
        return mse + kplanes_reg(field, tv_weight, time_smooth_weight), mse

    @jax.jit
    def step(field, opt_state, pose, t, wgt, mask):
        field = jax.lax.with_sharding_constraint(
            field, jax.tree.map(lambda _: repl, field)
        )
        (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
            field, pose, t, wgt, mask
        )
        updates, opt_state = optimizer.update(g, opt_state)
        return optax.apply_updates(field, updates), opt_state, mse

    return optimizer, step


def fit_kplanes_sp(
    poses: np.ndarray,  # [V, 4, 4] c2w
    images: np.ndarray,  # [V, H, W, 3] in [0, 1]
    times: np.ndarray,  # [V] in [0, 1]
    intrinsics: Sequence[float],
    *,
    resolution: int = 128,
    rank: int = 8,
    time_res: int = 16,
    mesh=None,
    bound: float = 1.0,
    sh_degree: int = 0,
    iters: int = 500,
    lr: float = 2e-2,
    tv_weight: float = 1e-4,
    time_smooth_weight: float = 1e-3,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    seed: int = 0,
    log_every: int = 0,
    intermediate_scale: int = 2,
    remat: bool = True,
    block: int = 32,
    group_chunk: int = 25,
    init_field: KPlanesField = None,
) -> Tuple[KPlanesField, Dict]:
    """Collapse-sharded K-planes fit: the product entry for dynamic SP
    training (main_voxel --voxel_kplanes --voxel_sp). Views are grouped by
    (warp_axis, flip) pose variant with largest-remainder iteration
    apportionment exactly like parallel/voxel_sp.py::fit_voxels_sp; a
    variant switch costs one recompile, never a state reshard.

    Returns (field, info) with info = {"psnr", "rays_per_sec", "seconds"}.
    """
    import time as _time

    from jax.sharding import Mesh

    from focnerf_tpu.render.baked import warp_gt_to_intermediate
    from focnerf_tpu.train.voxel_kplanes import init_kplanes_field

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), ("slice",))

    V = images.shape[0]
    poses = np.asarray(poses, np.float32)
    times = np.asarray(times, np.float32)
    gts = jnp.asarray(images, jnp.float32)
    intr_dev = jnp.asarray(intrinsics, jnp.float32)
    ri = resolution * intermediate_scale

    from focnerf_tpu.parallel.voxel_sp import _apportion_views

    groups, keys, remaining = _apportion_views(poses, bound, iters)

    steps = {}
    warped: Dict[int, Tuple[jax.Array, jax.Array]] = {}

    def get_step(key):
        if key not in steps:
            opt, step = make_kplanes_sp_step(
                mesh, resolution=resolution, warp_axis=key[0], flip=key[1],
                bound=bound, sh_degree=sh_degree, lr=lr, tv_weight=tv_weight,
                time_smooth_weight=time_smooth_weight, bg_color=bg_color,
                density_scale=density_scale,
                intermediate_scale=intermediate_scale, remat=remat,
                block=block,
            )
            steps[key] = (opt, step)
        return steps[key]

    def targets_for(v: int, key):
        if v not in warped:
            warped[v] = warp_gt_to_intermediate(
                gts[v], poses[v], intr_dev, bound,
                axis=key[0], flip=key[1], ri=ri,
            )
        return warped[v]

    field = (
        init_field
        if init_field is not None
        else init_kplanes_field(
            resolution, rank=rank, time_res=time_res, sh_degree=sh_degree,
            rng=jax.random.key(seed),
        )
    )
    opt0, _ = get_step(keys[0])
    opt_state = opt0.init(field)

    rng = np.random.default_rng(seed)
    t0 = _time.time()
    mse = jnp.float32(1.0)
    done = 0
    while any(n > 0 for n in remaining.values()):
        for key in keys:
            take = min(group_chunk, remaining[key])
            if take == 0:
                continue
            remaining[key] -= take
            _, step = get_step(key)
            views = rng.choice(groups[key], size=take)
            for v in views:
                wgt, mask = targets_for(int(v), key)
                field, opt_state, mse = step(
                    field, opt_state, jnp.asarray(poses[int(v)]),
                    jnp.float32(times[int(v)]), wgt, mask,
                )
                done += 1
                if log_every and done % log_every == 0:
                    print(
                        f"[spkplanes] iter {done}/{iters} mse {float(mse):.5f}",
                        flush=True,
                    )
    jax.block_until_ready(mse)
    dt = _time.time() - t0
    psnr = -10.0 * float(jnp.log10(jnp.maximum(mse, 1e-10)))
    info = {
        "psnr": psnr,
        "rays_per_sec": ri * ri * done / dt,
        "seconds": dt,
        "n_devices": int(np.prod(list(mesh.shape.values()))),
    }
    return field, info


def fit_kplanes_sp_c2f(
    poses: np.ndarray,
    images: np.ndarray,
    times: np.ndarray,
    intrinsics: Sequence[float],
    *,
    resolution: int = 128,
    stages: int = 3,
    iters: int = 500,
    mesh=None,
    seed: int = 0,
    log_every: int = 0,
    rank: int = 8,
    time_res: int = 16,
    **kw,
):
    """Coarse-to-fine collapse-sharded K-planes fit on the shared ladder
    (train/voxel.py::_c2f_stage_plan). The factor planes are replicated, so
    staging needs no gather/re-shard at all — just upsample_kplanes between
    stages. Every ladder resolution must divide the device count."""
    from jax.sharding import Mesh

    from focnerf_tpu.train.voxel import _c2f_stage_plan
    from focnerf_tpu.train.voxel_kplanes import upsample_kplanes

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), ("slice",))
    D = int(np.prod(list(mesh.shape.values())))
    plan = _c2f_stage_plan(resolution, stages, iters)
    for R, _ in plan:
        if R % D != 0:
            raise ValueError(
                f"c2f ladder resolution {R} must divide the {D}-device mesh"
            )
    field = None
    stage_psnrs = []
    info = {}
    for si, (R, n_it) in enumerate(plan):
        if field is not None:
            field = upsample_kplanes(field, R)
        field, info = fit_kplanes_sp(
            poses, images, times, intrinsics, resolution=R, mesh=mesh,
            iters=n_it, init_field=field, seed=seed + si,
            log_every=log_every, rank=rank, time_res=time_res, **kw,
        )
        stage_psnrs.append(info["psnr"])
    info["stage_psnrs"] = stage_psnrs
    return field, info
