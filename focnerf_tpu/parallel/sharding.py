"""Sharded train/render steps over a device mesh.

Data-parallel training: batch sharded on rays, params replicated, gradient
all-reduce inserted by XLA (the hash table is only ~12.6M params — psum of
its grads over ICI is cheap relative to the compute; SURVEY §2.3).

Object-parallel composition: the stacked per-object params get their leading
K axis sharded over the mesh; each device folds its local objects and the
cross-device max-density fusion is a single pmax-style collective.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from focnerf_tpu.models.nerf import NeRFConfig
from focnerf_tpu.train.state import TrainState, ema_update
from focnerf_tpu.train.steps import make_train_step


def make_sharded_train_step(
    cfg: NeRFConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    num_steps: int = 512,
    min_near: float = 0.2,
    ema_decay: float = 0.95,
    mask_penalty: float = 1e-8,
    axis: str = "data",
):
    """Data-parallel version of train.steps.make_train_step.

    Ray batches are sharded on their leading axis; every param/optimizer leaf
    is replicated. The returned step has explicit in/out shardings so XLA
    places the psum over the mesh's ICI axis.
    """
    base = make_train_step(
        cfg,
        optimizer,
        num_steps=num_steps,
        min_near=min_near,
        ema_decay=ema_decay,
        mask_penalty=mask_penalty,
        donate=False,
    )

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    def batch_sharding(batch):
        return {
            k: data if (hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] >= mesh.shape[axis])
            else repl
            for k, v in batch.items()
        }

    @jax.jit
    def sharded_step(state: TrainState, batch, rng):
        state = jax.lax.with_sharding_constraint(
            state, jax.tree.map(lambda _: repl, state)
        )
        shardings = batch_sharding(batch)
        batch = {k: jax.lax.with_sharding_constraint(v, shardings[k]) for k, v in batch.items()}
        return base.raw(state, batch, rng)

    return sharded_step


def make_sharded_train_step_occupancy(
    cfg: NeRFConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    slab: int = 32,
    min_near: float = 0.2,
    ema_decay: float = 0.95,
    axis: str = "data",
):
    """Data-parallel occupancy train step: rays sharded, params + occupancy
    bitfield replicated, gradient psum inserted by XLA (SURVEY §2.3).

    Signature: (state, batch, occ_bits, rng) -> (state, metrics).
    """
    from focnerf_tpu.train.steps import make_train_step_occupancy

    base = make_train_step_occupancy(
        cfg,
        optimizer,
        dt_gamma=dt_gamma,
        max_steps=max_steps,
        slab=slab,
        min_near=min_near,
        ema_decay=ema_decay,
        donate=False,
    )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    @jax.jit
    def sharded_step(state: TrainState, batch, occ_bits, rng):
        state = jax.lax.with_sharding_constraint(
            state, jax.tree.map(lambda _: repl, state)
        )
        occ_bits = jax.lax.with_sharding_constraint(occ_bits, repl)
        batch = {
            k: jax.lax.with_sharding_constraint(
                v,
                data
                if (hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] >= mesh.shape[axis])
                else repl,
            )
            for k, v in batch.items()
        }
        return base.raw(state, batch, occ_bits, rng)

    return sharded_step


def shard_objects(stacked_params, mesh: Mesh, axis: str = "data"):
    """Shard stacked per-object params [K, ...] over the mesh axis."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), stacked_params)


def compose_rays_sharded(
    stacked_params,
    cfg: NeRFConfig,
    rays_o,
    rays_d,
    mesh: Mesh,
    obj_feats=None,
    offsets=None,
    *,
    axis: str = "data",
    num_steps: int = 512,
    bg_color=1.0,
    min_near: float = 0.2,
):
    """Object-parallel composition: objects sharded across the mesh.

    Each device folds its K/n local objects with the streaming max-density
    reduction (render/compose.py), then the cross-device fusion is a single
    pmax + masked psum over ICI — the collective form of the reference's
    ``best_densities_and_colors_v3`` (COMBINED.py:247-251). Rays replicated.
    """
    from jax.experimental.shard_map import shard_map

    from focnerf_tpu.core.geometry import near_far_from_aabb
    from focnerf_tpu.models.nerf import color_fn, density_fn, encode_objfeat
    from focnerf_tpu.ops.composite import composite_rays

    n = rays_o.shape[0]
    K = jax.tree.leaves(stacked_params)[0].shape[0]
    if offsets is None:
        offsets = jnp.zeros((K, 3), jnp.float32)
    if obj_feats is None:
        obj_feats = jnp.zeros((K, max(cfg.yolo_feats_dim, 1)), jnp.float32)

    b = cfg.bound
    aabb = jnp.array([-b, -b, -b, b, b, b], jnp.float32)

    def local_fold(params_shard, offsets_shard, feats_shard, ro, rd):
        nears, fars = near_far_from_aabb(ro, rd, aabb, min_near)
        z = jnp.linspace(0.0, 1.0, num_steps, dtype=jnp.float32)[None, :]
        z_vals = nears[:, None] + (fars - nears)[:, None] * z
        sample_dist = (fars - nears)[:, None] / num_steps
        deltas = jnp.concatenate([jnp.diff(z_vals, axis=-1), sample_dist], -1)
        dirs = jnp.broadcast_to(rd[:, None, :], (n, num_steps, 3))

        def fold(carry, xs):
            bs, br = carry
            pk, ok, fk = xs
            xyzs = (ro + ok[None, :])[:, None, :] + rd[:, None, :] * z_vals[..., None]
            xyzs = jnp.clip(xyzs, aabb[:3], aabb[3:])
            sk, gk = density_fn(pk, cfg, xyzs)
            enc = encode_objfeat(pk, cfg, fk) if cfg.use_objfeat else None
            rk = color_fn(pk, cfg, dirs, gk, enc)
            take = sk > bs
            return (jnp.where(take, sk, bs), jnp.where(take[..., None], rk, br)), None

        init = (
            jnp.zeros((n, num_steps), jnp.float32),
            jnp.zeros((n, num_steps, 3), jnp.float32),
        )
        # mark the carry as device-varying (the scanned params differ per shard)
        init = jax.lax.pcast(init, (axis,), to="varying")
        (ls, lr), _ = jax.lax.scan(fold, init, (params_shard, offsets_shard, feats_shard))

        # cross-device max-density fusion over ICI
        gs = jax.lax.pmax(ls, axis)
        mask = (ls == gs) & (gs > 0)
        rgb_sum = jax.lax.psum(jnp.where(mask[..., None], lr, 0.0), axis)
        cnt = jax.lax.psum(mask.astype(jnp.float32), axis)
        fused_rgb = rgb_sum / jnp.maximum(cnt, 1.0)[..., None]

        ori_z = jnp.clip(
            (z_vals - nears[:, None]) / jnp.maximum(fars - nears, 1e-10)[:, None], 0, 1
        )
        out = composite_rays(
            gs, fused_rgb, deltas, ts=ori_z, bg_color=bg_color,
            density_scale=cfg.density_scale,
        )
        return out["image"], out["depth"], out["weights_sum"]

    fn = shard_map(
        local_fold,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
    )
    image, depth, alpha = fn(stacked_params, offsets, obj_feats, rays_o, rays_d)
    return {"image": image, "depth": depth, "alpha": alpha}
