"""Jitted train / eval steps.

Parity target: ``Trainer.train_step`` (nerf/utils.py:818-905) and
``Trainer.eval_step`` (:907-950):

  - RGBA ground truth is composited onto a *pixel-wise random* background
    during training (utils.py:853) and a white background at eval;
  - loss = per-ray mean-channel MSE, plus 1e-8 * ||sigma outside the object
    mask|| (renderer.py:163-165, utils.py:880) for FOC masked training;
  - error-map EMA update 0.1*old + 0.9*new at the sampled coarse cells
    (utils.py:884-899).

One deliberate fix vs the reference: the outside-mask penalty there indexes
rays by *batch position* against a 64x64-downsampled mask, pairing random
pixels with unrelated mask cells (utils.py:132, renderer.py:165). Here the
mask is gathered at the actually-sampled pixel indices, so the penalty means
what it says. (Weight 1e-8 keeps the loss numerically near-identical.)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from focnerf_tpu.models.nerf import NeRFConfig
from focnerf_tpu.render.renderer import render_rays
from focnerf_tpu.train.state import TrainState, ema_update


def _safe_norm(x):
    """||x||_2 with a finite gradient at the zero vector (||0||'s grad is
    0/0 = NaN; all-inside-mask batches hit exactly that — the reference's
    torch.norm shares the hazard, nerf/renderer.py:163-165)."""
    return jnp.sqrt(jnp.sum(x * x) + 1e-12)


def make_train_step(
    cfg: NeRFConfig,
    optimizer: optax.GradientTransformation,
    *,
    num_steps: int = 512,
    upsample_steps: int = 0,
    min_near: float = 0.2,
    ema_decay: float = 0.95,
    mask_penalty: float = 1e-8,
    color_space: str = "srgb",
    tv_weight: float = 0.0,
    alpha_weight: float = 0.0,
    donate: bool = True,
):
    """Build a jitted train step.

    ``alpha_weight`` > 0 adds direct alpha supervision
    mean((weights_sum - gt_alpha)^2) when GT carries alpha. Beyond the
    reference: d(ray alpha)/d(sigma) = T*dt stays nonzero at sigma = 0,
    so this term keeps a gradient path out of the transparent-collapse
    basin that killed parity seed 0 (PARITY.md round-4) — the plain RGB
    loss only reaches sigma through weights that vanish with sigma.

    The returned function has signature
      (state, batch, rng) -> (state, metrics)
    with batch = dict(rays_o [N,3], rays_d [N,3], pixels [N,3|4],
                      ray_mask [N] bool (optional), obj_feat [F] (optional),
                      error_map [128*128] + inds_coarse [N] (optional)).
    """

    def loss_fn(params, batch, rng):
        pixels = batch["pixels"]
        if color_space == "linear":  # utils.py:845-846
            from focnerf_tpu.utils.color import srgb_to_linear

            pixels = pixels.at[..., :3].set(srgb_to_linear(pixels[..., :3]))
        c = pixels.shape[-1]
        k_bg, k_perturb = jax.random.split(rng)

        if c == 4 and cfg.bg_radius <= 0:
            bg = jax.random.uniform(k_bg, pixels[..., :3].shape)  # pixel-wise random
            gt = pixels[..., :3] * pixels[..., 3:] + bg * (1.0 - pixels[..., 3:])
        else:
            bg = 1.0
            gt = pixels[..., :3]

        out = render_rays(
            params,
            cfg,
            batch["rays_o"],
            batch["rays_d"],
            num_steps=num_steps,
            upsample_steps=upsample_steps,
            rng=k_perturb,
            perturb=True,
            bg_color=bg,
            min_near=min_near,
            obj_feat=batch.get("obj_feat"),
        )
        per_ray = jnp.mean((out["image"] - gt) ** 2, axis=-1)  # [N]
        loss = jnp.mean(per_ray)
        if alpha_weight > 0.0 and c == 4:
            loss = loss + alpha_weight * jnp.mean(
                (out["weights_sum"] - pixels[..., 3]) ** 2
            )

        ray_mask = batch.get("ray_mask")
        if ray_mask is not None:
            outside = jnp.where(ray_mask[:, None], 0.0, out["sigmas"])
            loss = loss + mask_penalty * _safe_norm(outside)
        loss = loss + _tv_term(cfg, params, rng, tv_weight)
        return loss, per_ray

    def train_step_impl(state: TrainState, batch, rng):
        (loss, per_ray), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.ema_count, ema_decay)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            ema_count=state.ema_count + 1,
        )
        metrics = {"loss": loss, "per_ray_error": per_ray}
        return new_state, metrics

    train_step = jax.jit(train_step_impl, donate_argnums=(0,) if donate else ())
    train_step.raw = train_step_impl  # un-jitted impl for sharded wrappers
    return train_step


def make_clip_step(
    cfg: NeRFConfig,
    optimizer: optax.GradientTransformation,
    clip_loss,
    *,
    H: int,
    W: int,
    num_steps: int = 128,
    min_near: float = 0.2,
    ema_decay: float = 0.95,
    clip_weight: float = 1.0,
):
    """CLIP-guided GT-free step on a random-pose batch (nerf/utils.py:796-838).

    ``clip_loss`` is a differentiable function image [H, W, 3] in [0,1] ->
    scalar (train/clip_guidance.py::make_jax_clip_loss, or any stand-in);
    gradients flow through the rendered low-res image into the field, the
    TPU-native form of the reference's rand-pose branch. Signature:
    (state, rays_o [H*W,3], rays_d [H*W,3], rng) -> (state, metrics).
    """

    def loss_fn(params, rays_o, rays_d, rng):
        out = render_rays(
            params, cfg, rays_o, rays_d, num_steps=num_steps, rng=rng,
            perturb=True, bg_color=1.0, min_near=min_near,
        )
        img = out["image"].reshape(H, W, 3)
        return clip_weight * clip_loss(img)

    def step_impl(state: TrainState, rays_o, rays_d, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, rays_o, rays_d, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.ema_count, ema_decay)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            ema_count=state.ema_count + 1,
        )
        return new_state, {"loss": loss}

    return jax.jit(step_impl)


def make_train_step_occupancy(
    cfg: NeRFConfig,
    optimizer: optax.GradientTransformation,
    *,
    dt_gamma: float = 1 / 128,
    max_steps: int = 1024,
    slab: int = 128,
    min_near: float = 0.2,
    ema_decay: float = 0.95,
    mask_penalty: float = 1e-8,
    color_space: str = "srgb",
    T_thresh: float = 1e-4,
    tv_weight: float = 0.0,
    alpha_weight: float = 0.0,
    donate: bool = True,
    skip_field: bool = False,
):
    """Occupancy-accelerated train step (the reference's --cuda_ray path).

    Signature: (state, batch, occ [CAS, H^3], rng) -> (state, metrics).
    ``occ`` is the bool bitfield, or — with ``skip_field=True`` — the uint8
    skip-code field (occupancy_skip_field) driving the sphere-trace marcher.
    """
    from focnerf_tpu.render.renderer import render_rays_occupancy

    def loss_fn(params, batch, occ_bits, rng):
        pixels = batch["pixels"]
        if color_space == "linear":
            from focnerf_tpu.utils.color import srgb_to_linear

            pixels = pixels.at[..., :3].set(srgb_to_linear(pixels[..., :3]))
        c = pixels.shape[-1]
        k_bg, k_perturb = jax.random.split(rng)
        if c == 4 and cfg.bg_radius <= 0:
            bg = jax.random.uniform(k_bg, pixels[..., :3].shape)
            gt = pixels[..., :3] * pixels[..., 3:] + bg * (1.0 - pixels[..., 3:])
        else:
            bg = 1.0
            gt = pixels[..., :3]
        out = render_rays_occupancy(
            params,
            cfg,
            batch["rays_o"],
            batch["rays_d"],
            occ_bits,
            dt_gamma=dt_gamma,
            max_steps=max_steps,
            slab=slab,
            rng=k_perturb,
            perturb=True,
            bg_color=bg,
            min_near=min_near,
            T_thresh=T_thresh,
            obj_feat=batch.get("obj_feat"),
            occ_skip=occ_bits if skip_field else None,
        )
        per_ray = jnp.mean((out["image"] - gt) ** 2, axis=-1)
        loss = jnp.mean(per_ray)
        if alpha_weight > 0.0 and c == 4:
            # direct alpha supervision (see make_train_step): non-vanishing
            # escape gradient from the transparent-collapse basin
            loss = loss + alpha_weight * jnp.mean(
                (out["weights_sum"] - pixels[..., 3]) ** 2
            )
        ray_mask = batch.get("ray_mask")
        if ray_mask is not None:
            outside = jnp.where(ray_mask[:, None], 0.0, out["sigmas"])
            loss = loss + mask_penalty * _safe_norm(outside)
        loss = loss + _tv_term(cfg, params, rng, tv_weight)
        return loss, (per_ray, out["n_samples"])

    def step_impl(state: TrainState, batch, occ_bits, rng):
        (loss, (per_ray, n_samples)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, occ_bits, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.ema_count, ema_decay)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            ema_count=state.ema_count + 1,
        )
        metrics = {
            "loss": loss,
            "per_ray_error": per_ray,
            "mean_samples": jnp.mean(n_samples.astype(jnp.float32)),
        }
        return new_state, metrics

    step = jax.jit(step_impl, donate_argnums=(0,) if donate else ())
    step.raw = step_impl
    return step


def _tv_term(cfg: NeRFConfig, params, rng, tv_weight: float, n_points: int = 8192):
    """Optional hash-table total-variation term (gridencoder.cu:628-643; the
    reference samples random points when no inputs are given, grid.py:173)."""
    if tv_weight <= 0.0:
        return 0.0
    from focnerf_tpu.ops.hashgrid import hashgrid_tv_loss

    x01 = jax.random.uniform(jax.random.fold_in(rng, 11), (n_points, 3))
    return tv_weight * hashgrid_tv_loss(params["grid"], x01, cfg.grid_spec)


def update_error_map(error_map, inds_coarse, per_ray_error):
    """EMA update of the 128x128 importance map (nerf/utils.py:884-899)."""
    old = error_map[inds_coarse]
    return error_map.at[inds_coarse].set(0.1 * old + 0.9 * per_ray_error)


def make_eval_step(
    cfg: NeRFConfig,
    *,
    num_steps: int = 512,
    min_near: float = 0.2,
    bg_color: float = 1.0,
):
    """Jitted eval: render rays against a fixed background, return pred + gt."""

    @jax.jit
    def eval_step(params, batch):
        pixels = batch["pixels"]
        c = pixels.shape[-1]
        if c == 4:
            gt = pixels[..., :3] * pixels[..., 3:] + bg_color * (1.0 - pixels[..., 3:])
        else:
            gt = pixels[..., :3]
        out = render_rays(
            params,
            cfg,
            batch["rays_o"],
            batch["rays_d"],
            num_steps=num_steps,
            bg_color=bg_color,
            min_near=min_near,
            obj_feat=batch.get("obj_feat"),
        )
        return out["image"], out["depth"], gt

    return eval_step
