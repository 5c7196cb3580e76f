"""Training state as an explicit pytree.

The reference's ``Trainer`` god-class (nerf/utils.py:660-1557) holds model,
optimizer, GradScaler, EMA, schedulers and counters as mutable attributes.
Here all of it is one immutable pytree threaded through jitted steps; bf16
training on TPU needs no loss scaler, and the LR schedule is folded into the
optax optimizer.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from focnerf_tpu.models.nerf import NeRFConfig, init_nerf_params


class TrainState(NamedTuple):
    step: jax.Array  # int32 global step
    params: Any
    opt_state: Any
    ema_params: Any  # EMA shadow of params (decay 0.95, num-updates ramp)
    ema_count: jax.Array  # int32, for the torch_ema-style decay ramp


def make_optimizer(
    lr: float = 1e-2, iters: int = 30000, lr_net: Optional[float] = None,
    warmup: int = 0, grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """Adam(0.9, 0.99, eps=1e-15) with LambdaLR 0.1**(step/iters).

    ``warmup`` > 0 linearly ramps the LR from 0 over the first ``warmup``
    steps; ``grad_clip`` > 0 clips the global gradient norm before adam.
    Beyond-reference robustness levers: the round-4 production parity run
    showed a seed-dependent saturation collapse (geo-feature magnitudes
    blow up, the color sigmoid pins at exactly 1.0, the render goes
    opaque-white and the zero sigmoid gradient makes it unrecoverable —
    diagnosed in tools/collapse_probe.py + PARITY.md round-4 notes).

    Matches main_nerf.py:211 (optimizer) and :265 (scheduler, stepped every
    iteration). The nerf-family reference trains hash-table and MLPs with
    the same LR; the DNERF reference splits them — grid at ``lr``, every
    network at ``lr_net`` (dnerf/network.py:255-264 get_params(lr, lr_net),
    default 1e-3). ``lr_net`` here scales the post-adam updates of every
    non-"grid" top-level parameter group by lr_net/lr — mathematically the
    per-group LR (adam's direction is gradient-scale invariant) while
    keeping the opt-state pytree IDENTICAL to plain adam, so checkpoint
    templates (train/checkpoints.py) restore either variant.
    """
    def schedule(step):
        s = lr * 0.1 ** jnp.minimum(step / iters, 1.0)
        if warmup > 0:
            s = s * jnp.minimum((step + 1.0) / warmup, 1.0)
        return s

    base = optax.adam(learning_rate=schedule, b1=0.9, b2=0.99, eps=1e-15)
    if grad_clip > 0.0:
        # clip INSIDE the update_fn (not optax.chain) so the opt-state
        # pytree stays exactly adam's — checkpoint templates
        # (train/checkpoints.py) restore clip and non-clip runs alike
        inner = base

        def clipped_update(updates, state, params=None):
            gnorm = optax.global_norm(updates)
            scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
            updates = jax.tree.map(lambda u: u * scale, updates)
            return inner.update(updates, state, params)

        base = optax.GradientTransformation(inner.init, clipped_update)
    if lr_net is None or lr_net == lr:
        return base
    ratio = lr_net / lr

    def update_fn(updates, state, params=None):
        updates, state = base.update(updates, state, params)
        # every grid-encoder group stays at --lr (the DNeRF reference keeps
        # ALL grid encoders, incl. encoder_bg, at lr and only scales the
        # MLPs — dnerf/network.py:255-268), hence the endswith match rather
        # than the literal "grid" key (catches "bg_grid" etc.)
        updates = {
            k: (v if k.endswith("grid") else jax.tree.map(lambda u: u * ratio, v))
            for k, v in updates.items()
        }
        return updates, state

    return optax.GradientTransformation(base.init, update_fn)


def create_train_state(
    rng: jax.Array,
    cfg: NeRFConfig,
    optimizer: optax.GradientTransformation,
    params: Optional[Any] = None,
) -> TrainState:
    if params is None:
        from focnerf_tpu.models.dnerf import DNeRFConfig, init_dnerf_params

        # dispatch by config class so checkpoint TEMPLATES built from a
        # saved model_config.json get the right tree (a DNeRFConfig with
        # the static init was missing deform/basis/hyper params, breaking
        # viewer/composition restores of dnerf checkpoints)
        if isinstance(cfg, DNeRFConfig):
            params = init_dnerf_params(rng, cfg)
        else:
            params = init_nerf_params(rng, cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema_params=params,
        ema_count=jnp.zeros((), jnp.int32),
    )


def ema_update(ema_params, params, count, decay: float = 0.95):
    """torch_ema-style EMA with warmup ramp: d = min(decay, (1+n)/(10+n))."""
    n = count.astype(jnp.float32)
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    return jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema_params, params)
