"""Collapse-sharded SP for the VM-factorized voxel family.

The VM family (train/voxel_vm.py) trains TensoRF-style planes x vectors and
collapses them to the dense [R, R, R, C] raw grid with three einsums before
every fold. At 512^3 that collapsed grid — not the factors — is both the
HBM ceiling (512^3 x C f32 = 2 GB fwd + AD residuals) and the step-time
hot spot (PERF.md round-3: the ri=2R "hat" einsums bind at ~10 s/step
single-chip). This module shards the COLLAPSE itself: each device
materializes only its own warp-axis slab of the dense grid directly from
the (tiny, replicated) factors, folds it, and combines partials in optical
depth space (parallel/voxel_sp.py::_sp_slab_strip_mse). The per-device
einsum reads the factor operands sliced to local rows, so the hat-einsum
output axis is genuinely sharded — compute AND memory scale 1/D.

Same design as the K-planes SP step (parallel/kplanes_sp.py — the dynamic
sibling): factors + adam state replicate (3*R^2*K*C is two orders of
magnitude below R^3*C), every dense intermediate stays sharded, and the
family regularizer (vm_reg) is evaluated once at jit level OUTSIDE the
shard_map — inside it every device would compute the identical term and
the replicated-input transpose would psum D copies of its gradient.

No reference equivalent (single-GPU reference, SURVEY §2.3); the VM
factorization follows Chen et al., TensoRF (ECCV 2022).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from focnerf_tpu.parallel.voxel_sp import _apportion_views, _sp_slab_strip_mse
from focnerf_tpu.train.voxel_vm import VMField, vm_reg


def _collapse_vm_local_slab(
    field: VMField, warp_axis: int, d_idx, R_loc: int
) -> jax.Array:
    """Collapse ONLY this device's warp-axis slab of the dense raw grid.

    raw[x,y,z,c] = sum_k P0[y,z,k,c] V0[x,k,c] + P1[x,z,k,c] V1[y,k,c]
                 + P2[x,y,k,c] V2[z,k,c] + bias  (train/voxel_vm.py)

    The factor operands that carry the warp axis are dynamic-sliced to
    local rows BEFORE the einsums (dynamic_slice transposes to a
    zero-padded full-shape cotangent, so factor grads psum exactly across
    devices). Output: canonical [X, Y, Z, C] with the warp dim R_loc.
    """
    P0, P1, P2 = field.planes[0], field.planes[1], field.planes[2]
    V0, V1, V2 = field.vectors[0], field.vectors[1], field.vectors[2]
    g0 = d_idx * R_loc

    def rows(p, dim):
        start = [0] * p.ndim
        start[dim] = g0
        size = list(p.shape)
        size[dim] = R_loc
        return jax.lax.dynamic_slice(p, start, size)

    if warp_axis == 0:  # x rows: V0 (dim 0), P1/P2 carry x at dim 0
        V0, P1, P2 = rows(V0, 0), rows(P1, 0), rows(P2, 0)
    elif warp_axis == 1:  # y rows: P0 at dim 0, V1 dim 0, P2 at dim 1
        P0, V1, P2 = rows(P0, 0), rows(V1, 0), rows(P2, 1)
    else:  # z rows: P0 at dim 1, P1 at dim 1, V2 dim 0
        P0, P1, V2 = rows(P0, 1), rows(P1, 1), rows(V2, 0)

    g = jnp.einsum("yzkc,xkc->xyzc", P0, V0)
    g = g + jnp.einsum("xzkc,ykc->xyzc", P1, V1)
    g = g + jnp.einsum("xykc,zkc->xyzc", P2, V2)
    return g + field.bias


def make_vm_sp_step(
    mesh,
    *,
    resolution: int,
    warp_axis: int,
    flip: bool,
    bound: float = 1.0,
    sh_degree: int = 0,
    lr: float = 2e-2,
    tv_weight: float = 1e-4,
    l1_weight: float = 0.0,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    intermediate_scale: int = 2,
    remat: bool = True,
    block: int = 32,
):
    """Collapse-sharded VM train step (intermediate-plane supervision).

    Returns (optimizer, step) with
      step(field, opt_state, pose [4,4], wgt [ri,ri,3], mask [ri,ri])
        -> (field, opt_state, mse)
    Field + adam state replicate; the collapsed grid, its fold, and every
    autodiff residual stay sharded along the warp axis. Like the K-planes
    SP step there is no shard_fn: a pose-variant switch costs only a
    recompile, never a state move.
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

    def device_mse(field, pose, wgt, mask):
        d_idx = jax.lax.axis_index(axis_name)
        raw_loc = _collapse_vm_local_slab(field, warp_axis, d_idx, R_loc)
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
            in_specs=(P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    except (ImportError, TypeError):  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

        smapped = shard_map(
            device_mse,
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=P(),
            check_rep=False,
        )

    optimizer = optax.adam(lr)
    repl = NamedSharding(mesh, P())

    def loss_fn(field, pose, wgt, mask):
        mse = smapped(field, pose, wgt, mask)
        # replicated factors -> one jit-level regularizer evaluation
        return mse + vm_reg(field, tv_weight, l1_weight), mse

    @jax.jit
    def step(field, opt_state, pose, wgt, mask):
        field = jax.lax.with_sharding_constraint(
            field, jax.tree.map(lambda _: repl, field)
        )
        (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
            field, pose, wgt, mask
        )
        updates, opt_state = optimizer.update(g, opt_state)
        return optax.apply_updates(field, updates), opt_state, mse

    return optimizer, step


def fit_vm_sp(
    poses: np.ndarray,  # [V, 4, 4] c2w
    images: np.ndarray,  # [V, H, W, 3] in [0, 1]
    intrinsics: Sequence[float],
    *,
    resolution: int = 128,
    rank: int = 16,
    mesh=None,  # default: all local devices on one "slice" axis
    bound: float = 1.0,
    sh_degree: int = 0,
    iters: int = 500,
    lr: float = 2e-2,
    tv_weight: float = 1e-4,
    l1_weight: float = 0.0,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    seed: int = 0,
    log_every: int = 0,
    intermediate_scale: int = 2,
    remat: bool = True,
    block: int = 32,
    group_chunk: int = 25,
    init_field: VMField = None,
):
    """Collapse-sharded VM fit: views grouped by (warp_axis, flip) variant
    with iterations apportioned by view count (voxel_sp._apportion_views),
    one compiled step per variant, no state re-shard on switches.

    Returns (volume, info); info["field"] carries the factors.
    """
    import time

    from jax.sharding import Mesh

    from focnerf_tpu.render.baked import warp_gt_to_intermediate
    from focnerf_tpu.train.voxel_vm import init_vm_field, vm_field_to_volume

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), ("slice",))

    poses = np.asarray(poses, np.float32)
    gts = jnp.asarray(images, jnp.float32)
    intr_dev = jnp.asarray(intrinsics, jnp.float32)
    ri = resolution * intermediate_scale

    groups, keys, remaining = _apportion_views(poses, bound, iters)

    steps = {}
    warped: Dict[int, Tuple[jax.Array, jax.Array]] = {}

    def get_step(key):
        if key not in steps:
            steps[key] = make_vm_sp_step(
                mesh, resolution=resolution, warp_axis=key[0], flip=key[1],
                bound=bound, sh_degree=sh_degree, lr=lr, tv_weight=tv_weight,
                l1_weight=l1_weight, bg_color=bg_color,
                density_scale=density_scale,
                intermediate_scale=intermediate_scale, remat=remat,
                block=block,
            )
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
        else init_vm_field(
            resolution, rank=rank, sh_degree=sh_degree,
            rng=jax.random.key(seed),
        )
    )
    opt0, _ = get_step(keys[0])
    opt_state = opt0.init(field)

    rng = np.random.default_rng(seed)
    t0 = time.time()
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
                    field, opt_state, jnp.asarray(poses[int(v)]), wgt, mask
                )
                done += 1
                if log_every and done % log_every == 0:
                    print(
                        f"[vmsp] iter {done}/{iters} mse {float(mse):.5f}",
                        flush=True,
                    )
    jax.block_until_ready(mse)
    dt = time.time() - t0
    psnr = -10.0 * float(jnp.log10(max(float(mse), 1e-10)))
    info = {
        "psnr": psnr,
        "rays_per_sec": ri * ri * done / dt,
        "seconds": dt,
        "field": jax.device_get(field),
        "n_devices": int(np.prod(list(mesh.shape.values()))),
    }
    return vm_field_to_volume(field, bound, sh_degree), info
