"""The FOC-NeRF field: hash grid + sigma MLP + SH + object-conditioned color MLP.

Functional rebuild of the active reference model (nerf/network_tcnn.py:453-681):

  - hash encoder: L16/C2/T2^19/base16, top resolution 2048*bound (:478-490);
  - sigma net: 32 -> 64 -> 1+15, trunc_exp on sigma (:492-502, :558-565);
  - yolo feature encoder: 144 -> 16 -> 16 (:504-517), rebuilt at runtime with
    the dataset's feature dim (get_yolo_feat_encoder :667-681);
  - dir encoder: spherical harmonics degree 4 (:523-529);
  - color net: [SH(16) + geo(15) + yolo(16)] -> 64 -> 64 -> 3, sigmoid
    (:536-546, n_hidden_layers = num_layers_color-1 = 2);
  - optional background net: 2D hash grid (4 levels) on sphere coords + SH(d)
    -> 2x64 MLP -> 3, sigmoid (nerf/network.py:70-92,145-158).

Params are a plain pytree (dict of weight lists + the hash table), so
multi-object composition can ``jax.vmap`` the field over stacked per-object
params and sharding specs attach directly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from focnerf_tpu.models.mlp import mlp_apply, mlp_init
from focnerf_tpu.ops.activation import trunc_exp
from focnerf_tpu.ops.hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    hashgrid_encode_c2f,
    hashgrid_init,
)
from focnerf_tpu.ops.sh import sh_encode

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    bound: float = 1.0
    # hash grid
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    # sigma net
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    # color net
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    sh_degree: int = 4
    # object-feature conditioning (FOC extension); 0 disables (flags --n_chunks 0)
    yolo_feats_dim: int = 144
    yolo_encoding_dim: int = 16
    yolo_hidden_dim: int = 16
    use_objfeat: bool = True
    # rendering
    density_scale: float = 1.0
    bg_radius: float = -1.0
    # numerics
    compute_dtype: Any = jnp.bfloat16
    # training-throughput mode: K > 0 resolves hashed levels through K
    # stochastically sampled corners during training (unbiased; see
    # HashGridSpec.stochastic_k). Eval/inference stays exact automatically
    # (no rng is passed outside the train step).
    stochastic_corners: int = 0
    # also sample dense levels with >= this many rows stochastically
    # (0 = hashed levels only); see HashGridSpec.stochastic_min_size
    stochastic_min_size: int = 0
    # table-backward level subset for THIS compiled step (see
    # HashGridSpec.grad_levels); the alternating-phase trainer compiles one
    # step per phase via dataclasses.replace(cfg, grad_levels=...)
    grad_levels: Any = None
    # coarse-to-fine: resolve only the first N hash levels in THIS compiled
    # step (0 = all; see ops/hashgrid.py hashgrid_encode_c2f). The trainer's
    # c2f schedule swaps cfgs at stage boundaries; eval paths always use the
    # full cfg (active_levels=0) so rendering stays exact.
    active_levels: int = 0

    @property
    def grid_spec(self) -> HashGridSpec:
        spec = _grid_spec(
            self.num_levels,
            self.level_dim,
            self.base_resolution,
            self.log2_hashmap_size,
            2048.0 * self.bound,
        )
        if self.stochastic_corners:
            spec = dataclasses.replace(
                spec,
                stochastic_k=self.stochastic_corners,
                stochastic_min_size=self.stochastic_min_size,
            )
        if self.grad_levels is not None:
            spec = dataclasses.replace(
                spec, grad_levels=tuple(self.grad_levels)
            )
        return spec

    @property
    def bg_grid_spec(self) -> HashGridSpec:
        return _grid_spec(4, self.level_dim, 16, self.log2_hashmap_size, 2048.0, input_dim=2)

    @property
    def sh_dim(self) -> int:
        return self.sh_degree**2

    @property
    def color_in_dim(self) -> int:
        d = self.sh_dim + self.geo_feat_dim
        if self.use_objfeat:
            d += self.yolo_encoding_dim
        return d


@functools.lru_cache(maxsize=None)
def _grid_spec(num_levels, level_dim, base_res, log2_size, desired_res, input_dim=3):
    return HashGridSpec.create(
        num_levels=num_levels,
        level_dim=level_dim,
        base_resolution=base_res,
        log2_hashmap_size=log2_size,
        desired_resolution=desired_res,
        input_dim=input_dim,
    )


def init_nerf_params(rng: jax.Array, cfg: NeRFConfig) -> Params:
    keys = jax.random.split(rng, 6)
    spec = cfg.grid_spec
    sigma_dims = [spec.output_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1) + [1 + cfg.geo_feat_dim]
    color_dims = (
        [cfg.color_in_dim] + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1) + [3]
    )
    params: Params = {
        "grid": hashgrid_init(keys[0], spec),
        "sigma_net": mlp_init(keys[1], sigma_dims),
        "color_net": mlp_init(keys[2], color_dims),
    }
    if cfg.use_objfeat:
        params["yolo_net"] = mlp_init(
            keys[3], [cfg.yolo_feats_dim, cfg.yolo_hidden_dim, cfg.yolo_encoding_dim]
        )
    if cfg.bg_radius > 0:
        bg_spec = cfg.bg_grid_spec
        params["bg_grid"] = hashgrid_init(keys[4], bg_spec)
        params["bg_net"] = mlp_init(keys[5], [bg_spec.output_dim + cfg.sh_dim, 64, 3])
    return params


def density_fn(params: Params, cfg: NeRFConfig, x: jax.Array, rng: Optional[jax.Array] = None):
    """x [..., 3] in [-bound, bound] -> (sigma [...], geo_feat [..., geo]).

    ``rng`` activates the stochastic-corner encode (training only; see
    NeRFConfig.stochastic_corners)."""
    x01 = (x + cfg.bound) / (2.0 * cfg.bound)
    feats = hashgrid_encode_c2f(
        params["grid"], x01, cfg.grid_spec, cfg.active_levels, rng=rng
    )
    h = mlp_apply(params["sigma_net"], feats, cfg.compute_dtype)
    sigma = trunc_exp(h[..., 0])
    geo_feat = h[..., 1:]
    return sigma, geo_feat


def encode_objfeat(params: Params, cfg: NeRFConfig, raw_obj_feat: jax.Array) -> jax.Array:
    """Raw per-image YOLO backbone feature [..., 144] -> [..., 16] embedding."""
    return mlp_apply(params["yolo_net"], raw_obj_feat, cfg.compute_dtype)


def color_fn(
    params: Params,
    cfg: NeRFConfig,
    d: jax.Array,
    geo_feat: jax.Array,
    objfeat_enc: Optional[jax.Array] = None,
) -> jax.Array:
    """Unit directions d [..., 3] + geo features -> rgb in [0, 1].

    ``objfeat_enc`` is the already-encoded per-image object embedding [..., 16]
    (or [16], broadcast over samples), matching nerf/network_tcnn.py:605-649
    which encodes the raw 144-d feature once and repeats it across samples.
    """
    sh = sh_encode(d, cfg.sh_degree)
    parts = [sh, geo_feat]
    if cfg.use_objfeat:
        assert objfeat_enc is not None, "model configured with use_objfeat=True"
        obj = jnp.broadcast_to(objfeat_enc, sh.shape[:-1] + (cfg.yolo_encoding_dim,))
        parts.append(obj)
    h = jnp.concatenate([p.astype(jnp.float32) for p in parts], axis=-1)
    h = mlp_apply(params["color_net"], h, cfg.compute_dtype)
    return jax.nn.sigmoid(h)


def field_fn(
    params: Params,
    cfg: NeRFConfig,
    x: jax.Array,
    d: jax.Array,
    objfeat_enc: Optional[jax.Array] = None,
):
    """Full field evaluation: (sigma, rgb). Mirrors NeRFNetwork.forward."""
    sigma, geo_feat = density_fn(params, cfg, x)
    rgb = color_fn(params, cfg, d, geo_feat, objfeat_enc)
    return sigma, rgb


def background_fn(params: Params, cfg: NeRFConfig, sph: jax.Array, d: jax.Array) -> jax.Array:
    """Background color from sphere coords sph [..., 2] in [-1,1] + viewdir."""
    x01 = (sph + 1.0) / 2.0
    feats = hashgrid_encode(params["bg_grid"], x01, cfg.bg_grid_spec)
    sh = sh_encode(d, cfg.sh_degree)
    h = jnp.concatenate([feats, sh], axis=-1)
    h = mlp_apply(params["bg_net"], h, cfg.compute_dtype)
    return jax.nn.sigmoid(h)
