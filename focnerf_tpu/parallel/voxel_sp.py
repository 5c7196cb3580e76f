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
communication per step is the [D, ri, ri, C+2] partial gather (a few MB),
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

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def make_voxel_sp_step(
    mesh,
    intrinsics: Sequence[float],  # unused for intermediate supervision; kept
    *,                            # for signature parity with the DP step
    resolution: int,
    warp_axis: int,
    flip: bool,
    bound: float = 1.0,
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
    sh_degree > 0 payloads are not supported here yet (diffuse rgb only).
    """
    import optax

    from focnerf_tpu.render.baked import _fold_blocks, _grid_geometry

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

        # ---- activation (elementwise, local): field_to_volume semantics
        rgb = jax.nn.sigmoid(raw_loc[..., :-1])
        sigma = jax.nn.softplus(raw_loc[..., -1:])
        V = jnp.concatenate([rgb, sigma], -1)

        # ---- permute the slab so the (sharded) warp axis leads
        V = jnp.transpose(V, (warp_axis, others[0], others[1], 3))
        if jax.default_backend() != "cpu":
            V = V.astype(jnp.bfloat16)  # the resample einsums ride bf16 MXU

        e = pose[:3, 3]
        e_z, e_y, e_x = e[warp_axis], e[others[0]], e[others[1]]

        # global storage coordinates of this device's slices
        g0 = d_idx * R_loc
        c_loc = ((g0 + jnp.arange(R_loc, dtype=jnp.float32)) + 0.5) / R * (
            2 * b
        ) - b

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
        Vb = V_f2b_loc.reshape(R_loc // K, K, R, R, 4)
        zb = z_f2b_loc.reshape(R_loc // K, K)
        T_d, C_d, D_d = _fold_blocks(
            Vb, zb, e_z, e_y, e_x, gy, gx, dt, b, R, ri,
            density_scale=density_scale, remat=remat,
        )

        # ---- combine partials across devices (front-to-back device order:
        # ascending device index when flip, else descending)
        part = jnp.concatenate([C_d, T_d[..., None], D_d[..., None]], -1)
        parts = jax.lax.all_gather(part, axis_name)  # [D, ri, ri, 5]
        if not flip:
            parts = jnp.flip(parts, 0)
        Cs, Ts, Ds = parts[..., :3], parts[..., 3], parts[..., 4]
        T_cum = jnp.cumprod(Ts, axis=0)
        T_excl = jnp.concatenate([jnp.ones_like(T_cum[:1]), T_cum[:-1]], 0)
        C = jnp.einsum("dij,dijc->ijc", T_excl, Cs)
        Dep = jnp.sum(T_excl * Ds, 0)
        T = T_cum[-1]
        del Dep  # depth not needed for the loss; composed for parity/debug

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
        mse = sse / (3.0 * jnp.maximum(msum, 1.0))

        # ---- total variation with a one-slice halo on the sharded axis
        # (train/voxel.py::tv_loss semantics: per-axis MEAN of squared
        # diffs, summed over the three axes)
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
