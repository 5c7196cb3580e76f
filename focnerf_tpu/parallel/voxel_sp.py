"""Slice-axis model parallelism for the dense voxel family (shard_map SP).

The dense field is the largest object in a voxel training step — at 512^3,
field + grad + adam state alone exceed 8 GB and the single-chip HBM
becomes the resolution ceiling. This module removes that ceiling the TPU
way: the RAW field is sharded across the mesh along the shear-warp slice
axis, and because alpha compositing is associative, each device folds ONLY
its own slab of slices (render/baked.py::_fold_blocks from the identity
carry) and the per-device partial images combine with one small
``all_gather`` + an exclusive-transmittance fold over the device axis:

    T = prod_d T_d,   C = sum_d (prod_{d' in front of d} T_d') * C_d

Everything heavy stays sharded end-to-end: the field, its gradient, and
the adam moments (grads w.r.t. a device's slab depend only on its own
partial, so shard_map's transpose keeps them local); the only
communication per step is the [D, ri, ri, C+1] partial gather (a few MB),
one boundary-slice ``ppermute`` halo for the sharded-axis TV term, and the
scalar loss ``psum``. The photometric loss is computed as per-device row
strips of the composed image psum'd together, so AD through the gather is
exact (each device's cotangent flows only through its strip — no
replicated-gradient double counting).

Like the pose-parallel step (train/voxel.py::make_voxel_dp_step), one
compiled step serves one (warp_axis, flip) pose variant: the shard axis
must be the warp axis, which is a compile-time choice. Training across
variants would re-shard with an all-to-all; the product path trains
single-variant batches per step exactly like fit_voxels' step cache.

No reference equivalent (the reference is single-GPU; SURVEY §2.3) — this
is the sequence-parallel analogue for the sample axis: samples-along-a-ray
are the "sequence", sharded over devices, with the transmittance carry as
the cross-device state.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def _apportion_views(poses, bound, iters):
    """Group views by (warp_axis, flip) pose variant and apportion ``iters``
    across groups proportionally to view count with largest-remainder
    rounding — counts sum to EXACTLY ``iters`` and no group with a >=1
    quota is starved by earlier rounding overshoot. Shared by every
    variant-grouped fit driver (dense SP, hybrid DP x SP, K-planes SP).
    Returns (groups {key: [view-idx]}, keys sorted, remaining {key: n})."""
    from focnerf_tpu.train.voxel import _pose_variant

    groups = {}
    for v in range(len(poses)):
        groups.setdefault(_pose_variant(poses[v], bound), []).append(v)
    keys = sorted(groups)
    sizes = np.array([len(groups[k]) for k in keys], np.float64)
    quota = sizes / sizes.sum() * iters
    base = np.floor(quota).astype(int)
    for i in np.argsort(-(quota - base))[: iters - int(base.sum())]:
        base[i] += 1
    return groups, keys, dict(zip(keys, base.tolist()))


def _sp_slab_strip_mse(
    raw_loc,
    pose,
    wgt,
    mask,
    d_idx,
    *,
    axis_name: str,
    warp_axis: int,
    flip: bool,
    R: int,
    R_loc: int,
    ri: int,
    rows_loc: int,
    bound: float,
    sh_degree: int,
    density_scale: float,
    bg_color: float,
    remat: bool,
    block: int,
):
    """Shared SP core (runs under shard_map): activate this device's raw
    slab, fold it front-to-back, combine the per-device partials in optical
    depth space, and return the psum'd strip mse. Used by the dense family's
    SP step and by the K-planes SP step (which collapses its slab from
    factor planes first); family regularizers stay with their callers."""
    from focnerf_tpu.render.baked import _fold_blocks, _grid_geometry

    b = float(bound)
    others = [a for a in range(3) if a != warp_axis]

    # ---- activation (elementwise, local): field_to_volume semantics
    if sh_degree > 0:
        payload = raw_loc[..., :-1]  # SH coefficients ride linearly
    else:
        payload = jax.nn.sigmoid(raw_loc[..., :-1])
    sigma = jax.nn.softplus(raw_loc[..., -1:])
    V = jnp.concatenate([payload, sigma], -1)
    CH = V.shape[-1]

    # ---- permute the slab so the (sharded) warp axis leads
    V = jnp.transpose(V, (warp_axis, others[0], others[1], 3))
    if jax.default_backend() != "cpu":
        V = V.astype(jnp.bfloat16)  # the resample einsums ride bf16 MXU

    e = pose[:3, 3]
    e_z, e_y, e_x = e[warp_axis], e[others[0]], e[others[1]]

    # global storage coordinates of this device's slices
    g0 = d_idx * R_loc
    c_loc = ((g0 + jnp.arange(R_loc, dtype=jnp.float32)) + 0.5) / R * (2 * b) - b

    # mirror trick (matches _composite_core): flip negates the coord
    # system instead of physically flipping the global array
    if flip:
        e_z = -e_z
        z_loc = -c_loc  # ascending storage order IS front-to-back
        V_f2b_loc = V
        z_f2b_loc = z_loc
    else:
        V_f2b_loc = jnp.flip(V, 0)
        z_f2b_loc = jnp.flip(c_loc, 0)

    gy, gx, _, _, _, _ = _grid_geometry(e_z, e_y, e_x, b, ri)
    ddy = gy[:, None] - e_y
    ddx = gx[None, :] - e_x
    dlen = jnp.sqrt(ddy**2 + ddx**2 + e_z**2)
    dz = 2.0 * b / R
    dt = dz * dlen / jnp.maximum(jnp.abs(e_z), 1e-6)

    K = min(block, R_loc)
    assert R_loc % K == 0
    Vb = V_f2b_loc.reshape(R_loc // K, K, R, R, CH)
    zb = z_f2b_loc.reshape(R_loc // K, K)
    od_d, C_d, _ = _fold_blocks(
        Vb, zb, e_z, e_y, e_x, gy, gx, dt, b, R, ri,
        density_scale=density_scale, remat=remat, with_depth=False,
        return_od=True,
    )

    # ---- combine partials across devices (front-to-back device order:
    # ascending device index when flip, else descending); depth is never
    # folded here — the loss doesn't read it, and carrying it through the
    # remat'd scan + gather would cost real fwd/bwd work (it can't be
    # DCE'd out of a scan carry). Slab transmittances combine in OPTICAL
    # DEPTH space (prefix sums + exp), so opaque slabs (T underflows to
    # exactly 0) never hit the cumprod VJP's division by zero.
    part = jnp.concatenate([C_d, od_d[..., None]], -1)
    parts = jax.lax.all_gather(part, axis_name)  # [D, ri, ri, CH]
    if not flip:
        parts = jnp.flip(parts, 0)
    Cs, ods = parts[..., :-1], parts[..., -1]
    # exclusive prefix by shifting (never cum - own: exp(inf - inf) is
    # NaN if a slab's od hit inf — see ops/composite.py)
    od_excl = jnp.concatenate(
        [jnp.zeros_like(ods[:1]), jnp.cumsum(ods[:-1], axis=0)], 0
    )
    T_excl = jnp.exp(-od_excl)
    C = jnp.einsum("dij,dijc->ijc", T_excl, Cs)
    T = jnp.exp(-(od_excl[-1] + ods[-1]))

    if sh_degree > 0:
        # contract the composited SH payload with one basis per pixel
        # AFTER the cross-device combine (shared with _composite_core)
        from focnerf_tpu.render.baked import sh_contract_plane

        C = sh_contract_plane(
            C, e_z, e_y, e_x, gy, gx, axis=warp_axis, flip=flip,
            ri=ri, sh_deg=sh_degree,
        )

    img_i = C + T[..., None] * bg_color

    # ---- photometric loss as psum'd per-device row strips: the
    # cotangent of the gathered partials flows only through each
    # device's own strip, so the all_gather transpose is exact
    r0 = d_idx * rows_loc
    img_s = jax.lax.dynamic_slice(img_i, (r0, 0, 0), (rows_loc, ri, 3))
    wgt_s = jax.lax.dynamic_slice(wgt, (r0, 0, 0), (rows_loc, ri, 3))
    m_s = jax.lax.dynamic_slice(mask, (r0, 0), (rows_loc, ri))[..., None]
    sse = jax.lax.psum(jnp.sum(m_s * (img_s - wgt_s) ** 2), axis_name)
    msum = jax.lax.psum(jnp.sum(m_s), axis_name)
    return sse / (3.0 * jnp.maximum(msum, 1.0))


def _sp_tv_halo(raw_loc, d_idx, *, axis_name, warp_axis, R, R_loc, D):
    """Total variation of a slice-sharded field with a one-slice ppermute
    halo on the sharded axis (train/voxel.py::tv_loss semantics: per-axis
    MEAN of squared diffs, summed over the three axes). Runs under
    shard_map; psums over ``axis_name`` only."""
    tv = 0.0
    n_vox = R * R * R * raw_loc.shape[-1]
    for ax in range(3):
        dloc = jnp.diff(raw_loc, axis=ax)
        sse_ax = jnp.sum(dloc * dloc)
        if ax == warp_axis:
            # halo: neighbor d+1's first slice diffs against our last
            first = jax.lax.index_in_dim(
                raw_loc, 0, axis=warp_axis, keepdims=True
            )
            last = jax.lax.index_in_dim(
                raw_loc, R_loc - 1, axis=warp_axis, keepdims=True
            )
            halo = jax.lax.ppermute(
                first, axis_name, [(d + 1, d) for d in range(D - 1)]
            )  # device d receives device (d+1)'s first slice
            bd = halo - last
            is_interior = (d_idx < D - 1).astype(bd.dtype)
            sse_ax = sse_ax + is_interior * jnp.sum(bd * bd)
        count = n_vox // R * (R - 1)  # diffs per axis: (R-1)*R*R*C
        tv = tv + jax.lax.psum(sse_ax, axis_name) / count
    return tv


def make_voxel_sp_step(
    mesh,
    intrinsics: Sequence[float],  # unused for intermediate supervision; kept
    *,                            # for signature parity with the DP step
    resolution: int,
    warp_axis: int,
    flip: bool,
    bound: float = 1.0,
    sh_degree: int = 0,
    lr: float = 5e-2,
    tv_weight: float = 1e-4,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    intermediate_scale: int = 2,
    remat: bool = True,
    block: int = 32,
):
    """Slice-sharded voxel train step (intermediate-plane supervision).

    Returns (optimizer, step, shard_fn) where
      step(raw, opt_state, pose [4,4], wgt [ri,ri,3], mask [ri,ri])
        -> (raw, opt_state, mse)
    and shard_fn(tree) device_puts a raw-field-shaped tree with the warp
    axis sharded over the mesh (use it on the init field and opt state).
    sh_degree > 0 composites the SH payload sharded and contracts it with
    the per-pixel basis AFTER the cross-device combine (one basis per
    intermediate pixel, same as _composite_core).
    """
    import optax

    del intrinsics  # intermediate supervision never projects to the screen

    axis_name = mesh.axis_names[0]
    D = mesh.shape[axis_name]
    R = resolution
    assert R % D == 0, (R, D)
    R_loc = R // D
    ri = R * intermediate_scale
    assert ri % D == 0, (ri, D)
    rows_loc = ri // D
    b = float(bound)
    others = [a for a in range(3) if a != warp_axis]

    spec_list = [None, None, None, None]
    spec_list[warp_axis] = axis_name
    raw_spec = P(*spec_list)
    raw_sharding = NamedSharding(mesh, raw_spec)
    repl = NamedSharding(mesh, P())

    def shard_fn(tree):
        return jax.tree.map(
            lambda x: jax.device_put(
                x, raw_sharding if getattr(x, "ndim", 0) == 4 else repl
            ),
            tree,
        )

    optimizer = optax.adam(lr)

    def device_loss(raw_loc, pose, wgt, mask):
        """Per-device partial: fold own slab, combine partials, strip loss.

        Runs under shard_map: raw_loc is this device's [.., R_loc, ..] slab
        (sharded dim = warp_axis); pose/wgt/mask are replicated."""
        d_idx = jax.lax.axis_index(axis_name)

        mse = _sp_slab_strip_mse(
            raw_loc, pose, wgt, mask, d_idx,
            axis_name=axis_name, warp_axis=warp_axis, flip=flip,
            R=R, R_loc=R_loc, ri=ri, rows_loc=rows_loc, bound=b,
            sh_degree=sh_degree, density_scale=density_scale,
            bg_color=bg_color, remat=remat, block=block,
        )

        tv = _sp_tv_halo(raw_loc, d_idx, axis_name=axis_name,
                         warp_axis=warp_axis, R=R, R_loc=R_loc, D=D)

        return mse + tv_weight * tv, mse

    try:
        from jax import shard_map

        # jax >= 0.8: replication checking is `check_vma`
        smapped = shard_map(
            device_loss,
            mesh=mesh,
            in_specs=(raw_spec, P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,  # psum'd scalars are replicated; the static
        )  # checker can't see through dynamic_slice strips
    except (ImportError, TypeError):  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

        smapped = shard_map(
            device_loss,
            mesh=mesh,
            in_specs=(raw_spec, P(), P(), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )

    def loss_fn(raw, pose, wgt, mask):
        loss, mse = smapped(raw, pose, wgt, mask)
        return loss, mse

    @jax.jit
    def step(raw, opt_state, pose, wgt, mask):
        raw = jax.lax.with_sharding_constraint(raw, raw_sharding)
        (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
            raw, pose, wgt, mask
        )
        g = jax.lax.with_sharding_constraint(g, raw_sharding)
        updates, opt_state = optimizer.update(g, opt_state)
        return optax.apply_updates(raw, updates), opt_state, mse

    return optimizer, step, shard_fn


def fit_voxels_sp(
    poses: np.ndarray,  # [V, 4, 4] c2w
    images: np.ndarray,  # [V, H, W, 3] in [0, 1]
    intrinsics: Sequence[float],
    *,
    resolution: int = 128,
    mesh=None,  # default: all local devices on one "slice" axis
    bound: float = 1.0,
    sh_degree: int = 0,
    iters: int = 500,
    lr: float = 5e-2,
    tv_weight: float = 1e-4,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    seed: int = 0,
    log_every: int = 0,
    intermediate_scale: int = 2,
    remat: bool = True,
    block: int = 32,
    group_chunk: int = 25,
    init_raw=None,  # unsharded [R,R,R,4] seed (coarse-to-fine staging)
):
    """Slice-sharded dense-voxel fit: the product entry for SP training
    (main_voxel --voxel_sp). Field, gradient, and adam state stay sharded
    over the mesh for the whole run, so the trainable resolution scales
    with the number of devices instead of one chip's HBM.

    The shard axis must equal the shear-warp axis (a compile-time choice,
    see make_voxel_sp_step), so views are grouped by their (axis, flip)
    pose variant and trained in round-robin chunks of ``group_chunk``
    iterations per group — within a chunk everything stays on one compiled
    step; switching to a different warp AXIS re-shards field + adam state
    (one all-to-all-shaped device_put per switch, bounded by
    iters/group_chunk, not per step). Iterations are apportioned to groups
    by view count, matching fit_voxels' uniform view sampling in
    expectation.

    Returns (volume, info) like train/voxel.py::fit_voxels (info["raw"]
    carries the final pre-activation field, host-gathered).
    """
    import time

    from jax.sharding import Mesh

    from focnerf_tpu.render.baked import warp_gt_to_intermediate
    from focnerf_tpu.train.voxel import field_to_volume, init_voxel_field

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), ("slice",))

    V = images.shape[0]
    poses = np.asarray(poses, np.float32)
    gts = jnp.asarray(images, jnp.float32)
    intr_dev = jnp.asarray(intrinsics, jnp.float32)
    ri = resolution * intermediate_scale

    # group views by pose variant; apportion iterations by group size with
    # largest-remainder rounding so the counts sum to EXACTLY ``iters`` and
    # no group with a >=1 quota is starved by earlier rounding overshoot
    groups, keys, remaining = _apportion_views(poses, bound, iters)

    steps = {}  # (axis, flip) -> (step, shard_fn)
    warped: Dict[int, Tuple[jax.Array, jax.Array]] = {}

    def get_step(key):
        if key not in steps:
            _, step, shard_fn = make_voxel_sp_step(
                mesh, intrinsics, resolution=resolution, warp_axis=key[0],
                flip=key[1], bound=bound, sh_degree=sh_degree, lr=lr,
                tv_weight=tv_weight, bg_color=bg_color,
                density_scale=density_scale,
                intermediate_scale=intermediate_scale, remat=remat,
                block=block,
            )
            steps[key] = (step, shard_fn)
        return steps[key]

    def targets_for(v: int, key):
        if v not in warped:
            warped[v] = warp_gt_to_intermediate(
                gts[v], poses[v], intr_dev, bound,
                axis=key[0], flip=key[1], ri=ri,
            )
        return warped[v]

    raw = (
        init_raw
        if init_raw is not None
        else init_voxel_field(resolution, sh_degree, rng=jax.random.key(seed))
    )
    # init the adam state with the SAME optimizer the compiled steps use
    # (every make_voxel_sp_step builds an identical one; taking it from the
    # first step keeps the coupling explicit if its config ever changes)
    opt0, step0, shard0 = make_voxel_sp_step(
        mesh, intrinsics, resolution=resolution, warp_axis=keys[0][0],
        flip=keys[0][1], bound=bound, sh_degree=sh_degree, lr=lr,
        tv_weight=tv_weight, bg_color=bg_color, density_scale=density_scale,
        intermediate_scale=intermediate_scale, remat=remat, block=block,
    )
    steps[keys[0]] = (step0, shard0)
    opt_state = opt0.init(raw)

    rng = np.random.default_rng(seed)
    t0 = time.time()
    mse = jnp.float32(1.0)
    done = 0
    cur_axis = None
    while any(n > 0 for n in remaining.values()):
        for key in keys:
            take = min(group_chunk, remaining[key])
            if take == 0:
                continue
            remaining[key] -= take
            step, shard_fn = get_step(key)
            if key[0] != cur_axis:  # flip shares the axis -> no re-shard
                raw = shard_fn(raw)
                opt_state = shard_fn(opt_state)
                cur_axis = key[0]
            views = rng.choice(groups[key], size=take)
            for v in views:
                wgt, mask = targets_for(int(v), key)
                raw, opt_state, mse = step(
                    raw, opt_state, jnp.asarray(poses[int(v)]), wgt, mask
                )
                done += 1
                if log_every and done % log_every == 0:
                    print(
                        f"[spvoxel] iter {done}/{iters} mse {float(mse):.5f}",
                        flush=True,
                    )
    jax.block_until_ready(mse)
    dt = time.time() - t0
    psnr = -10.0 * float(jnp.log10(jnp.maximum(mse, 1e-10)))
    raw = jax.device_get(raw)  # host-gather the sharded field
    raw = jnp.asarray(raw)
    info = {
        "psnr": psnr,
        "rays_per_sec": ri * ri * done / dt,
        "seconds": dt,
        "raw": raw,
        "n_devices": int(np.prod(list(mesh.shape.values()))),
    }
    return field_to_volume(raw, bound, sh_degree), info


def fit_voxels_sp_c2f(
    poses: np.ndarray,
    images: np.ndarray,
    intrinsics: Sequence[float],
    *,
    resolution: int = 128,
    stages: int = 3,
    iters: int = 500,
    mesh=None,
    seed: int = 0,
    log_every: int = 0,
    **kw,
):
    """Coarse-to-fine slice-sharded fit on the shared ladder
    (train/voxel.py::_c2f_stage_plan). Between stages the sharded field is
    host-gathered, trilinearly upsampled, and re-sharded at the finer
    resolution — one gather per stage, negligible next to the stage's
    training time. Every ladder resolution must divide the device count
    (the ladder floors at 16, so any power-of-two mesh up to 16 works)."""
    from jax.sharding import Mesh

    from focnerf_tpu.train.voxel import _c2f_stage_plan, upsample_field

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), ("slice",))
    D = int(np.prod(list(mesh.shape.values())))
    plan = _c2f_stage_plan(resolution, stages, iters)
    for R, _ in plan:
        if R % D != 0:
            raise ValueError(
                f"c2f ladder resolution {R} must divide the {D}-device mesh"
            )
    raw = None
    stage_psnrs = []
    info = {}
    for si, (R, n_it) in enumerate(plan):
        if raw is not None:
            raw = upsample_field(jnp.asarray(jax.device_get(raw)), R)
        vol, info = fit_voxels_sp(
            poses, images, intrinsics, resolution=R, mesh=mesh, iters=n_it,
            init_raw=raw, seed=seed + si, log_every=log_every, **kw,
        )
        stage_psnrs.append(info["psnr"])
        raw = info["raw"]
    info["stage_psnrs"] = stage_psnrs
    return vol, info


def make_voxel_dp_sp_step(
    mesh,  # 2-D mesh with axis_names ("data", "slice")
    *,
    resolution: int,
    warp_axis: int,
    flip: bool,
    bound: float = 1.0,
    sh_degree: int = 0,
    lr: float = 5e-2,
    tv_weight: float = 1e-4,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    intermediate_scale: int = 2,
    remat: bool = True,
    block: int = 32,
):
    """HYBRID pose-parallel x slice-sharded voxel train step (DP x SP).

    The 2-D mesh factorizes the pod: along ``slice`` the raw field, its
    gradient, and the adam moments shard over the shear-warp axis exactly
    like make_voxel_sp_step (removing the HBM resolution ceiling); along
    ``data`` each device row trains a DIFFERENT pose of the batch against
    its own pre-warped GT, with the field replicated and the gradient mean
    riding the AD-inserted psum over the data axis (verified exact — the
    cotangent of a data-replicated shard_map input psums across that
    axis). This is the production pod-slice sharding: SP buys resolution,
    DP buys throughput, and the only cross-axis traffic is the gradient
    reduction.

    Returns (optimizer, step, shard_fn) with
      step(raw, opt_state, poses [Dd,4,4], wgts [Dd,ri,ri,3],
           masks [Dd,ri,ri]) -> (raw, opt_state, mean mse)
    where Dd = mesh.shape["data"]; all poses in a batch must share the
    (warp_axis, flip) variant, exactly like the 1-D steps.
    """
    import optax

    assert tuple(mesh.axis_names) == ("data", "slice"), mesh.axis_names
    Dd = mesh.shape["data"]
    Ds = mesh.shape["slice"]
    R = resolution
    assert R % Ds == 0, (R, Ds)
    R_loc = R // Ds
    ri = R * intermediate_scale
    assert ri % Ds == 0, (ri, Ds)
    rows_loc = ri // Ds

    spec_list = [None, None, None, None]
    spec_list[warp_axis] = "slice"  # replicated over "data"
    raw_spec = P(*spec_list)
    raw_sharding = NamedSharding(mesh, raw_spec)
    repl = NamedSharding(mesh, P())

    def shard_fn(tree):
        return jax.tree.map(
            lambda x: jax.device_put(
                x, raw_sharding if getattr(x, "ndim", 0) == 4 else repl
            ),
            tree,
        )

    optimizer = optax.adam(lr)

    def device_loss(raw_loc, pose, wgt, mask):
        # raw_loc: this device's slice slab (replicated over "data");
        # pose/wgt/mask: this data-row's single view (leading dim 1)
        d_idx = jax.lax.axis_index("slice")
        pose, wgt, mask = pose[0], wgt[0], mask[0]
        mse = _sp_slab_strip_mse(
            raw_loc, pose, wgt, mask, d_idx,
            axis_name="slice", warp_axis=warp_axis, flip=flip,
            R=R, R_loc=R_loc, ri=ri, rows_loc=rows_loc, bound=bound,
            sh_degree=sh_degree, density_scale=density_scale,
            bg_color=bg_color, remat=remat, block=block,
        )
        tv = _sp_tv_halo(raw_loc, d_idx, axis_name="slice",
                         warp_axis=warp_axis, R=R, R_loc=R_loc, D=Ds)
        # mean over the data axis: each row contributes its own pose's mse
        mse = jax.lax.pmean(mse, "data")
        return mse + tv_weight * tv, mse

    batch_spec = P("data")
    try:
        from jax import shard_map

        smapped = shard_map(
            device_loss,
            mesh=mesh,
            in_specs=(raw_spec, batch_spec, batch_spec, batch_spec),
            out_specs=(P(), P()),
            check_vma=False,
        )
    except (ImportError, TypeError):  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

        smapped = shard_map(
            device_loss,
            mesh=mesh,
            in_specs=(raw_spec, batch_spec, batch_spec, batch_spec),
            out_specs=(P(), P()),
            check_rep=False,
        )

    def loss_fn(raw, poses, wgts, masks):
        loss, mse = smapped(raw, poses, wgts, masks)
        return loss, mse

    @jax.jit
    def step(raw, opt_state, poses, wgts, masks):
        raw = jax.lax.with_sharding_constraint(raw, raw_sharding)
        (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
            raw, poses, wgts, masks
        )
        g = jax.lax.with_sharding_constraint(g, raw_sharding)
        updates, opt_state = optimizer.update(g, opt_state)
        return optax.apply_updates(raw, updates), opt_state, mse

    return optimizer, step, shard_fn


def fit_voxels_dp_sp(
    poses: np.ndarray,  # [V, 4, 4] c2w
    images: np.ndarray,  # [V, H, W, 3] in [0, 1]
    intrinsics: Sequence[float],
    *,
    resolution: int = 128,
    mesh=None,  # 2-D (data, slice) mesh; default: (dp, all//dp)
    dp: int = 2,
    bound: float = 1.0,
    sh_degree: int = 0,
    iters: int = 500,
    lr: float = 5e-2,
    tv_weight: float = 1e-4,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    seed: int = 0,
    log_every: int = 0,
    intermediate_scale: int = 2,
    remat: bool = True,
    block: int = 32,
    group_chunk: int = 25,
    init_raw=None,
):
    """Hybrid pose-parallel x slice-sharded dense fit (the pod-slice
    product entry: main_voxel --voxel_sp --voxel_dp N). Each step trains
    ``dp`` views of one (warp_axis, flip) variant group simultaneously;
    ``iters`` counts VIEW updates, so wall-clock steps are iters/dp.
    Re-sharding on a warp-axis switch moves field + adam state exactly
    like fit_voxels_sp.

    Returns (volume, info) like fit_voxels_sp.
    """
    import time

    from jax.sharding import Mesh

    from focnerf_tpu.render.baked import warp_gt_to_intermediate
    from focnerf_tpu.train.voxel import field_to_volume, init_voxel_field

    if mesh is None:
        devs = jax.devices()
        assert len(devs) % dp == 0, (len(devs), dp)
        mesh = Mesh(
            np.array(devs).reshape(dp, len(devs) // dp), ("data", "slice")
        )
    Dd = mesh.shape["data"]

    V = images.shape[0]
    poses = np.asarray(poses, np.float32)
    gts = jnp.asarray(images, jnp.float32)
    intr_dev = jnp.asarray(intrinsics, jnp.float32)
    ri = resolution * intermediate_scale

    groups, keys, remaining = _apportion_views(poses, bound, iters)

    steps = {}
    warped: Dict[int, Tuple[jax.Array, jax.Array]] = {}

    def get_step(key):
        if key not in steps:
            opt, step, shard_fn = make_voxel_dp_sp_step(
                mesh, resolution=resolution, warp_axis=key[0], flip=key[1],
                bound=bound, sh_degree=sh_degree, lr=lr, tv_weight=tv_weight,
                bg_color=bg_color, density_scale=density_scale,
                intermediate_scale=intermediate_scale, remat=remat,
                block=block,
            )
            steps[key] = (opt, step, shard_fn)
        return steps[key]

    def targets_for(v: int, key):
        if v not in warped:
            warped[v] = warp_gt_to_intermediate(
                gts[v], poses[v], intr_dev, bound,
                axis=key[0], flip=key[1], ri=ri,
            )
        return warped[v]

    raw = (
        init_raw
        if init_raw is not None
        else init_voxel_field(resolution, sh_degree, rng=jax.random.key(seed))
    )
    opt0, _, shard0 = get_step(keys[0])
    opt_state = opt0.init(raw)

    rng = np.random.default_rng(seed)
    t0 = time.time()
    mse = jnp.float32(1.0)
    done = 0
    cur_axis = None
    while any(n > 0 for n in remaining.values()):
        for key in keys:
            take = min(group_chunk, remaining[key])
            if take == 0:
                continue
            remaining[key] -= take
            _, step, shard_fn = get_step(key)
            if key[0] != cur_axis:  # flip shares the axis -> no re-shard
                raw = shard_fn(raw)
                opt_state = shard_fn(opt_state)
                cur_axis = key[0]
            n_steps = -(-take // Dd)  # ceil: iters count VIEW updates
            for _ in range(n_steps):
                views = rng.choice(groups[key], size=Dd)
                ws, ms = zip(*[targets_for(int(v), key) for v in views])
                raw, opt_state, mse = step(
                    raw, opt_state,
                    jnp.asarray(poses[np.asarray(views, int)]),
                    jnp.stack(ws), jnp.stack(ms),
                )
                done += Dd
                if log_every and (done // Dd) % log_every == 0:
                    print(
                        f"[dpspvoxel] view-updates {done}/{iters} "
                        f"mse {float(mse):.5f}",
                        flush=True,
                    )
    jax.block_until_ready(mse)
    dt = time.time() - t0
    psnr = -10.0 * float(jnp.log10(jnp.maximum(mse, 1e-10)))
    raw = jnp.asarray(jax.device_get(raw))
    info = {
        "psnr": psnr,
        "rays_per_sec": ri * ri * done / dt,
        "seconds": dt,
        "raw": raw,
        "n_devices": int(np.prod(list(mesh.shape.values()))),
        "mesh": dict(mesh.shape),
    }
    return field_to_volume(raw, bound, sh_degree), info
