"""Multi-object field wrapper: per-point max-density fusion as a field fn.

Parity target: nerf/multiobjectnetwork.py (``MONeRFNetwork``) — an alternate
composition mechanism where density()/color() themselves loop over per-object
checkpoints keeping the per-sample argmax (:43-95). The main CLIs use the
renderer-level compositor instead (render/compose.py); this wrapper exists
for the ``--mo-density-infer`` surface (flags.py:10) and for rendering a
fused field through ANY renderer path unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from focnerf_tpu.models.nerf import NeRFConfig, color_fn, density_fn, encode_objfeat


def mo_density_fn(stacked_params, cfg: NeRFConfig, x: jax.Array):
    """Fused (sigma, geo_feat) = per-sample argmax over K objects."""

    def fold(carry, params_k):
        best_sigma, best_geo = carry
        sigma_k, geo_k = density_fn(params_k, cfg, x)
        take = sigma_k > best_sigma
        return (
            jnp.where(take, sigma_k, best_sigma),
            jnp.where(take[..., None], geo_k, best_geo),
        ), None

    init = (
        jnp.zeros(x.shape[:-1], jnp.float32),
        jnp.zeros(x.shape[:-1] + (cfg.geo_feat_dim,), jnp.float32),
    )
    (sigma, geo), _ = jax.lax.scan(fold, init, stacked_params)
    return sigma, geo


def mo_field_fn(
    stacked_params,
    cfg: NeRFConfig,
    x: jax.Array,
    d: jax.Array,
    obj_feats: Optional[jax.Array] = None,  # [K, F]
):
    """Fused (sigma, rgb): argmax object contributes both density and color."""

    def fold(carry, xs):
        best_sigma, best_rgb = carry
        params_k, feat_k = xs
        sigma_k, geo_k = density_fn(params_k, cfg, x)
        enc = encode_objfeat(params_k, cfg, feat_k) if cfg.use_objfeat else None
        rgb_k = color_fn(params_k, cfg, d, geo_k, enc)
        take = sigma_k > best_sigma
        return (
            jnp.where(take, sigma_k, best_sigma),
            jnp.where(take[..., None], rgb_k, best_rgb),
        ), None

    K = jax.tree.leaves(stacked_params)[0].shape[0]
    feats = obj_feats if obj_feats is not None else jnp.zeros((K, 1), jnp.float32)
    init = (
        jnp.zeros(x.shape[:-1], jnp.float32),
        jnp.zeros(x.shape[:-1] + (3,), jnp.float32),
    )
    (sigma, rgb), _ = jax.lax.scan(fold, init, (stacked_params, feats))
    return sigma, rgb
