"""Jitted D-NeRF train steps (time-conditioned field).

Parity target: ``dnerf/utils.py`` Trainer.train_step — threads the per-frame
``time`` through the render, adds the deformation L1 regularizer
(dnerf/utils.py:117-119) — and the dynamic ``run_cuda`` path
(dnerf/renderer.py:243-340) which marches through the time-slot bitfield.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from focnerf_tpu.models.dnerf import DNeRFConfig
from focnerf_tpu.render.dnerf_renderer import render_rays_dnerf, render_rays_dnerf_occupancy
from focnerf_tpu.train.state import TrainState, ema_update

DEFORM_REG = 1e-3  # dnerf/utils.py:117-119


def _gt_and_bg(pixels, rng):
    c = pixels.shape[-1]
    if c == 4:
        bg = jax.random.uniform(rng, pixels[..., :3].shape)
        return pixels[..., :3] * pixels[..., 3:] + bg * (1.0 - pixels[..., 3:]), bg
    return pixels[..., :3], 1.0


def make_dnerf_train_step(
    cfg: DNeRFConfig,
    optimizer: optax.GradientTransformation,
    *,
    num_steps: int = 512,
    min_near: float = 0.2,
    ema_decay: float = 0.95,
    donate: bool = False,
):
    """(state, batch, rng) -> (state, metrics); batch carries scalar 'time'."""

    def loss_fn(params, batch, rng):
        k_bg, k_perturb = jax.random.split(rng)
        gt, bg = _gt_and_bg(batch["pixels"], k_bg)
        out = render_rays_dnerf(
            params, cfg, batch["rays_o"], batch["rays_d"], batch["time"],
            num_steps=num_steps, rng=k_perturb, perturb=True, bg_color=bg,
            min_near=min_near,
        )
        per_ray = jnp.mean((out["image"] - gt) ** 2, axis=-1)
        loss = jnp.mean(per_ray)
        if "deform_mean" in out:
            loss = loss + DEFORM_REG * out["deform_mean"]
        return loss, per_ray

    def step_impl(state: TrainState, batch, rng):
        (loss, per_ray), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.ema_count, ema_decay)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_params, ema_count=state.ema_count + 1,
        )
        return new_state, {"loss": loss, "per_ray_error": per_ray}

    step = jax.jit(step_impl, donate_argnums=(0,) if donate else ())
    step.raw = step_impl
    return step


def make_dnerf_train_step_occupancy(
    cfg: DNeRFConfig,
    optimizer: optax.GradientTransformation,
    *,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    slab: int = 64,
    min_near: float = 0.2,
    ema_decay: float = 0.95,
    T_thresh: float = 1e-4,
    donate: bool = False,
    skip_field: bool = False,
):
    """(state, batch, occ [CAS, H^3], rng) -> (state, metrics).

    ``occ`` is the bitfield slot for the batch's time
    (time_occupancy_bitfield; ref dnerf/renderer.py:286), or — with
    ``skip_field=True`` — its uint8 skip-code field driving the
    sphere-trace marcher.
    """

    def loss_fn(params, batch, occ_bits, rng):
        k_bg, k_perturb = jax.random.split(rng)
        gt, bg = _gt_and_bg(batch["pixels"], k_bg)
        out = render_rays_dnerf_occupancy(
            params, cfg, batch["rays_o"], batch["rays_d"], batch["time"], occ_bits,
            dt_gamma=dt_gamma, max_steps=max_steps, slab=slab,
            rng=k_perturb, perturb=True, bg_color=bg, min_near=min_near,
            T_thresh=T_thresh, occ_skip=occ_bits if skip_field else None,
        )
        per_ray = jnp.mean((out["image"] - gt) ** 2, axis=-1)
        loss = jnp.mean(per_ray)
        if "deform_mean" in out:
            loss = loss + DEFORM_REG * out["deform_mean"]
        return loss, (per_ray, out["n_samples"])

    def step_impl(state: TrainState, batch, occ_bits, rng):
        (loss, (per_ray, n_samples)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, occ_bits, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.ema_count, ema_decay)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_params, ema_count=state.ema_count + 1,
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
