"""Dynamic NeRF (D-NeRF) model family: deformation / temporal-basis / hyper.

Parity targets in the reference dnerf/ subtree:

  - ``deform`` (dnerf/network.py): a 5x128 deformation MLP warps x by
    Δx(x, t); the sigma net sees hash(x + Δx) ⊕ freq(x) ⊕ freq(t)
    (dnerf/network.py:123-165). freq degrees: x -> 10, t -> 6 (torch-ngp
    defaults via freqencoder).
  - ``basis`` (dnerf/network_basis.py): a time MLP emits coefficients over a
    learned temporal basis; sigma/color are basis-weighted sums
    (:11-60, 123-196).
  - ``hyper`` (dnerf/network_hyper.py): a hyper MLP lifts (x, t) into extra
    ambient coordinates appended to the grid input (:11-58).

All three reuse the static NeRF building blocks (hash grid, SH, trunc_exp);
time is threaded through density/color exactly as the static model threads
obj_feat. The deformation L1 regularizer (dnerf/utils.py:117-119) is returned
as an aux output for the trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from focnerf_tpu.models.mlp import mlp_apply, mlp_init
from focnerf_tpu.models.nerf import NeRFConfig, _grid_spec
from focnerf_tpu.ops.activation import trunc_exp
from focnerf_tpu.ops.freq import freq_encode, freq_output_dim
from focnerf_tpu.ops.hashgrid import hashgrid_encode, hashgrid_init
from focnerf_tpu.ops.sh import sh_encode

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DNeRFConfig(NeRFConfig):
    variant: str = "deform"  # deform | basis | hyper
    # deformation net (dnerf/network.py:26-44)
    deform_layers: int = 5
    deform_hidden: int = 128
    freq_deg_x: int = 10
    freq_deg_t: int = 6
    # temporal basis (dnerf/network_basis.py)
    n_basis: int = 4
    # hyper ambient dims (dnerf/network_hyper.py)
    hyper_dim: int = 2

    @property
    def x_enc_dim(self) -> int:
        return freq_output_dim(3, self.freq_deg_x)

    @property
    def t_enc_dim(self) -> int:
        return freq_output_dim(1, self.freq_deg_t)


def init_dnerf_params(rng: jax.Array, cfg: DNeRFConfig) -> Params:
    keys = jax.random.split(rng, 8)
    if cfg.variant == "hyper":
        spec = _grid_spec(
            cfg.num_levels, cfg.level_dim, cfg.base_resolution,
            cfg.log2_hashmap_size, 2048.0 * cfg.bound, input_dim=3 + cfg.hyper_dim,
        )
    else:
        spec = cfg.grid_spec
    params: Params = {"grid": hashgrid_init(keys[0], spec)}

    sigma_in = spec.output_dim
    if cfg.variant == "deform":
        params["deform_net"] = mlp_init(
            keys[1],
            [cfg.x_enc_dim + cfg.t_enc_dim]
            + [cfg.deform_hidden] * (cfg.deform_layers - 1)
            + [3],
        )
        sigma_in += cfg.x_enc_dim + cfg.t_enc_dim  # grid(x+Δx) ⊕ freq(x) ⊕ freq(t)
    elif cfg.variant == "basis":
        # time -> basis coefficients over n_basis channels for sigma and color
        params["basis_net"] = mlp_init(keys[2], [cfg.t_enc_dim, 128, cfg.n_basis])
        sigma_in = spec.output_dim  # sigma head emits n_basis sets
    elif cfg.variant == "hyper":
        params["hyper_net"] = mlp_init(
            keys[3],
            [cfg.x_enc_dim + cfg.t_enc_dim, cfg.deform_hidden, cfg.hyper_dim],
        )
    else:
        raise ValueError(f"unknown dnerf variant {cfg.variant}")

    sigma_out = (1 + cfg.geo_feat_dim) * (cfg.n_basis if cfg.variant == "basis" else 1)
    params["sigma_net"] = mlp_init(
        keys[4], [sigma_in] + [cfg.hidden_dim] * (cfg.num_layers - 1) + [sigma_out]
    )
    color_in = cfg.sh_dim + cfg.geo_feat_dim
    color_out = 3 * (cfg.n_basis if cfg.variant == "basis" else 1)
    params["color_net"] = mlp_init(
        keys[5], [color_in] + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1) + [color_out]
    )
    return params


def _warp(params: Params, cfg: DNeRFConfig, x: jax.Array, t: jax.Array):
    """Deformation Δx(x, t); t broadcast to x's batch shape. Returns (x', Δx, enc)."""
    tb = jnp.broadcast_to(jnp.reshape(t, (1,) * (x.ndim - 1) + (1,)), x.shape[:-1] + (1,))
    ex = freq_encode(x, cfg.freq_deg_x)
    et = freq_encode(tb, cfg.freq_deg_t)
    h = jnp.concatenate([ex, et], axis=-1)
    deform = mlp_apply(params["deform_net"], h, cfg.compute_dtype)
    return x + deform, deform, (ex, et)


def dnerf_density(params: Params, cfg: DNeRFConfig, x: jax.Array, t: jax.Array):
    """(sigma, geo_feat, aux) at time t ∈ [0, 1]."""
    aux: Dict[str, Any] = {}
    if cfg.variant == "deform":
        xw, deform, (ex, et) = _warp(params, cfg, x, t)
        aux["deform"] = deform
        x01 = (xw + cfg.bound) / (2 * cfg.bound)
        # input_grads: the deformation net learns through d(feats)/d(x+Δx)
        feats = hashgrid_encode(params["grid"], x01, cfg.grid_spec, input_grads=True)
        h_in = jnp.concatenate([feats, ex, et], axis=-1)
        h = mlp_apply(params["sigma_net"], h_in, cfg.compute_dtype)
        sigma = trunc_exp(h[..., 0])
        geo = h[..., 1:]
        return sigma, geo, aux
    if cfg.variant == "hyper":
        tb = jnp.broadcast_to(jnp.reshape(t, (1,) * (x.ndim - 1) + (1,)), x.shape[:-1] + (1,))
        ex = freq_encode(x, cfg.freq_deg_x)
        et = freq_encode(tb, cfg.freq_deg_t)
        hyper = mlp_apply(params["hyper_net"], jnp.concatenate([ex, et], -1), cfg.compute_dtype)
        hyper01 = jax.nn.sigmoid(hyper)  # ambient coords in [0, 1]
        x01 = (x + cfg.bound) / (2 * cfg.bound)
        spec = _grid_spec(
            cfg.num_levels, cfg.level_dim, cfg.base_resolution,
            cfg.log2_hashmap_size, 2048.0 * cfg.bound, input_dim=3 + cfg.hyper_dim,
        )
        feats = hashgrid_encode(
            params["grid"], jnp.concatenate([x01, hyper01], -1), spec, input_grads=True
        )
        h = mlp_apply(params["sigma_net"], feats, cfg.compute_dtype)
        return trunc_exp(h[..., 0]), h[..., 1:], aux
    # basis
    x01 = (x + cfg.bound) / (2 * cfg.bound)
    feats = hashgrid_encode(params["grid"], x01, cfg.grid_spec)
    h = mlp_apply(params["sigma_net"], feats, cfg.compute_dtype)  # [..., (1+G)*B]
    tb = jnp.reshape(t, (1,))
    coeff = mlp_apply(params["basis_net"], freq_encode(tb, cfg.freq_deg_t), cfg.compute_dtype)
    coeff = jax.nn.softmax(coeff.reshape(-1), axis=-1)  # [B]
    B = cfg.n_basis
    h = h.reshape(*h.shape[:-1], 1 + cfg.geo_feat_dim, B)
    h = jnp.einsum("...gb,b->...g", h, coeff)
    aux["basis_coeff"] = coeff
    return trunc_exp(h[..., 0]), h[..., 1:], aux


def dnerf_color(
    params: Params, cfg: DNeRFConfig, d: jax.Array, geo_feat: jax.Array,
    t: Optional[jax.Array] = None, basis_coeff: Optional[jax.Array] = None,
):
    sh = sh_encode(d, cfg.sh_degree)
    h = jnp.concatenate([sh, geo_feat.astype(jnp.float32)], axis=-1)
    out = mlp_apply(params["color_net"], h, cfg.compute_dtype)
    if cfg.variant == "basis":
        assert basis_coeff is not None
        out = out.reshape(*out.shape[:-1], 3, cfg.n_basis)
        out = jnp.einsum("...cb,b->...c", out, basis_coeff)
    return jax.nn.sigmoid(out)


def dnerf_field(params: Params, cfg: DNeRFConfig, x: jax.Array, d: jax.Array, t: jax.Array):
    sigma, geo, aux = dnerf_density(params, cfg, x, t)
    rgb = dnerf_color(params, cfg, d, geo, t, aux.get("basis_coeff"))
    return sigma, rgb, aux
