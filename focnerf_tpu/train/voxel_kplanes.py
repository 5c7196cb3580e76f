"""K-planes dynamic field: six-plane space-time factorization, gather-free.

The low-rank dynamic family (train/voxel_dynamic.py) stores its time deltas
as K dense R^3 grids — at the production bake scale (256^3) that is K full
fields of parameters and adam state, and its per-timestamp capacity lets
the time axis absorb view-specific error (the PARITY.md dynamic-row
ambiguity). This module factorizes the 4D raw field K-planes-style
(Fridovich-Keil et al., CVPR 2023 — public method, original code): six
rank-R_k planes over every axis pair,

    raw(x, y, z, t, c) = w_c * sum_r  P_xy[x,y,r,c] * P_xz[x,z,r,c]
                                    * P_yz[y,z,r,c] * P_xt[x,t,r,c]
                                    * P_yt[y,t,r,c] * P_zt[z,t,r,c]
                       + b_c

Parameters are 3*R^2*K*C spatial + 3*R*T*K*C temporal — dynamic scenes at
256^3 cost ~the static VM family, orders of magnitude below K dense grids.
Because the spatial planes are SHARED across all times (time only modulates
through the three t-planes), per-timestamp overfitting is structurally
limited — time cannot explain away view-specific error without moving the
shared spatial solution.

Collapsing at a fixed t interpolates the three time planes into per-axis
vectors and contracts one dense einsum

    g[x,y,z,c] = sum_r (P_xy*vx*vy)[x,y,r,c] * (P_xz*vz)[x,z,r,c]
                       * P_yz[y,z,r,c]

(R^3*K*C MXU work, dense gradients, no scatter), after which training and
rendering ride the static shear-warp machinery unchanged — the same
collapse-then-ride pattern as train/voxel_dynamic.py / voxel_vm.py, both
axes factorized this time.

Multiplicative init: planes start at 1 + eps*noise so the rank-r products
neither vanish nor explode, and per-channel output scale/bias (w_c near 0,
sigma bias at softplus^-1-ish -3) gives the near-transparent start of the
other families (train/voxel.py::init_voxel_field semantics).

Relation to the reference: no equivalent — the reference's dynamic path is
the per-sample deformation/basis/hyper MLP stack (dnerf/network*.py); this
is a TPU-first family addition for production-resolution dynamic scenes.

Regularization: 2D TV on all six planes + an extra smoothness term along
the time axis of the three t-planes (the K-planes time-smoothness prior).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.render.baked import BakedVolume
from focnerf_tpu.train.voxel import field_to_volume


class KPlanesField(NamedTuple):
    """Six factor planes + per-channel affine head. ``space`` [3, R, R, K, C]
    (order: xy, xz, yz), ``time`` [3, R, T, K, C] (order: xt, yt, zt),
    ``w`` [C] output scale, ``b`` [C] output bias (sigma last,
    pre-activation — field_to_volume applies sigmoid/softplus)."""

    space: jax.Array
    time: jax.Array
    w: jax.Array
    b: jax.Array


def init_kplanes_field(
    resolution: int,
    *,
    rank: int = 8,
    time_res: int = 16,
    sh_degree: int = 0,
    raw_sigma0: float = -3.0,
    init_scale: float = 0.1,
    w0: float = 0.05,
    rng: Optional[jax.Array] = None,
) -> KPlanesField:
    """Multiplicative init around 1 (products stay O(1), gradients healthy);
    the affine head starts the field flat: raw ≈ w0*rank + b, with the
    sigma bias at raw_sigma0 for the families' near-transparent start."""
    P = 3 * max(sh_degree, 1) ** 2 if sh_degree > 0 else 3
    C = P + 1
    rng = rng if rng is not None else jax.random.key(0)
    ks, kt = jax.random.split(rng)
    R, T, K = resolution, time_res, rank
    space = 1.0 + init_scale * jax.random.normal(ks, (3, R, R, K, C), jnp.float32)
    time = 1.0 + init_scale * jax.random.normal(kt, (3, R, T, K, C), jnp.float32)
    w = jnp.full((C,), w0, jnp.float32)
    # cancel the flat product's mean so raw starts at ~(0, ..., raw_sigma0)
    b = jnp.full((C,), -w0 * K, jnp.float32).at[-1].add(raw_sigma0)
    return KPlanesField(space=space, time=time, w=w, b=b)


def _time_vectors(time_planes: jax.Array, t) -> jax.Array:
    """Interpolate the [3, R, T, K, C] time planes at t in [0, 1] ->
    per-axis vectors [3, R, K, C] (linear over the T slots)."""
    T = time_planes.shape[2]
    x = jnp.clip(jnp.asarray(t, jnp.float32), 0.0, 1.0) * (T - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, T - 2)
    f = x - i0
    return (1.0 - f) * time_planes[:, :, i0] + f * time_planes[:, :, i0 + 1]


def collapse_kplanes(field: KPlanesField, t) -> jax.Array:
    """Factors at time t -> dense raw grid [R, R, R, C]: fold the time
    vectors into two spatial planes, then accumulate the rank-k triple
    products with a scan (ONE [R,R,R,C] buffer — a single three-operand
    einsum would materialize the [R,R,R,K,C] intermediate)."""
    v = _time_vectors(field.time, t)  # [3, R, K, C]: vx, vy, vz
    A = field.space[0] * v[0][:, None] * v[1][None, :]  # xy * vx * vy
    B = field.space[1] * v[2][None, :]  # xz * vz
    C = field.space[2]  # yz
    R = A.shape[0]
    Cc = A.shape[-1]

    def body(acc, ops):
        A_k, B_k, C_k = ops  # [R, R, C] each
        return acc + A_k[:, :, None] * B_k[:, None, :] * C_k[None], None

    ops = tuple(jnp.moveaxis(p, 2, 0) for p in (A, B, C))  # k leading
    g, _ = jax.lax.scan(body, jnp.zeros((R, R, R, Cc), jnp.float32), ops)
    return field.w * g + field.b


def kplanes_field_to_volume(
    field: KPlanesField, t, bound: float, sh_degree: int = 0
) -> BakedVolume:
    """Renderable BakedVolume at time t (feeds render_baked unchanged)."""
    return field_to_volume(collapse_kplanes(field, t), bound, sh_degree)


def kplanes_tv_loss(field: KPlanesField) -> jax.Array:
    """2D TV on all six planes (both axes of each plane)."""
    tv = 0.0
    for planes in (field.space, field.time):
        for ax in (1, 2):
            d = jnp.diff(planes, axis=ax)
            tv = tv + jnp.mean(d * d)
    return tv


def kplanes_time_smoothness(field: KPlanesField) -> jax.Array:
    """Second-difference smoothness along the t axis of the time planes
    (the K-planes prior: penalize acceleration, allow linear motion)."""
    d2 = jnp.diff(field.time, n=2, axis=2)
    return jnp.mean(d2 * d2)


def kplanes_reg(
    field: KPlanesField, tv_weight: float, time_smooth_weight: float
) -> jax.Array:
    """The family regularizer (single source for fit + DP step)."""
    return (
        tv_weight * kplanes_tv_loss(field)
        + time_smooth_weight * kplanes_time_smoothness(field)
    )


def upsample_kplanes(field: KPlanesField, new_res: int) -> KPlanesField:
    """Bilinearly upsample the SPATIAL axes of all six planes (the
    coarse-to-fine step; the time resolution T stays fixed — time planes
    upsample along their spatial axis only)."""
    _, R, _, K, C = field.space.shape
    T = field.time.shape[2]
    space = jax.image.resize(
        field.space, (3, new_res, new_res, K, C), method="bilinear"
    )
    time = jax.image.resize(
        field.time, (3, new_res, T, K, C), method="bilinear"
    )
    return KPlanesField(space=space, time=time, w=field.w, b=field.b)


def fit_kplanes_c2f(
    poses: np.ndarray,
    images: np.ndarray,
    times: np.ndarray,
    intrinsics: Sequence[float],
    *,
    resolution: int = 128,
    stages: int = 3,
    iters: int = 500,
    seed: int = 0,
    log_every: int = 0,
    **kw,
) -> Tuple[KPlanesField, Dict]:
    """Coarse-to-fine K-planes fit on the shared ladder
    (train/voxel.py::_c2f_stage_plan), seeding each stage with
    upsample_kplanes of the previous factors."""
    from focnerf_tpu.train.voxel import _c2f_stage_plan

    field = None
    stage_psnrs = []
    info: Dict = {}
    for si, (R, n_it) in enumerate(_c2f_stage_plan(resolution, stages, iters)):
        if field is not None:
            field = upsample_kplanes(field, R)
        field, info = fit_kplanes(
            poses, images, times, intrinsics, resolution=R, iters=n_it,
            init_field=field, seed=seed + si, log_every=log_every, **kw,
        )
        stage_psnrs.append(info["psnr"])
    info["stage_psnrs"] = stage_psnrs
    return field, info


def save_kplanes_field(
    path: str, field: KPlanesField, bound: float, sh_degree: int
) -> None:
    np.savez_compressed(
        path,
        space=np.asarray(field.space, np.float16),
        time=np.asarray(field.time, np.float16),
        w=np.asarray(field.w, np.float32),
        b=np.asarray(field.b, np.float32),
        bound=np.float32(bound),
        sh_deg=np.int32(sh_degree),
    )


def load_kplanes_field(path: str) -> Tuple[KPlanesField, float, int]:
    with np.load(path) as z:
        return (
            KPlanesField(
                space=jnp.asarray(z["space"].astype(np.float32)),
                time=jnp.asarray(z["time"].astype(np.float32)),
                w=jnp.asarray(z["w"]),
                b=jnp.asarray(z["b"]),
            ),
            float(z["bound"]),
            int(z["sh_deg"]),
        )


def make_kplanes_dp_step(
    mesh,
    intrinsics: Sequence[float],
    *,
    H: int,
    W: int,
    resolution: int,
    warp_axis: int,
    flip: bool,
    tv_weight: float = 1e-4,
    time_smooth_weight: float = 1e-3,
    **kw,
):
    """Pose-parallel DP step for the K-planes family: each device collapses
    the six-plane field at its own view's time and renders one pose; the
    tiny factorized params replicate and gradients psum (the
    time_conditioned variant of train/voxel.py::make_voxel_dp_step).

    step(field, opt_state, poses [D,4,4], times [D], wgts, masks)."""
    from focnerf_tpu.train.voxel import make_voxel_dp_step

    def reg(field):
        return kplanes_reg(field, tv_weight, time_smooth_weight)

    return make_voxel_dp_step(
        mesh, intrinsics, H=H, W=W, resolution=resolution,
        warp_axis=warp_axis, flip=flip, collapse_fn=collapse_kplanes,
        reg_fn=reg, time_conditioned=True, **kw,
    )


def fit_kplanes(
    poses: np.ndarray,  # [V, 4, 4] c2w
    images: np.ndarray,  # [V, H, W, 3] in [0, 1]
    times: np.ndarray,  # [V] in [0, 1]
    intrinsics: Sequence[float],
    *,
    resolution: int = 128,
    rank: int = 8,
    time_res: int = 16,
    bound: float = 1.0,
    sh_degree: int = 0,
    iters: int = 500,
    lr: float = 2e-2,
    tv_weight: float = 1e-4,
    time_smooth_weight: float = 1e-3,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    init_field: Optional[KPlanesField] = None,
    seed: int = 0,
    log_every: int = 0,
    remat: bool = True,
    steps_per_dispatch: int = 1,
) -> Tuple[KPlanesField, Dict]:
    """Fit the K-planes field to (pose, image, t) triples through the shared
    whole-image descent engine (train/voxel.py::_fit_field_loop).

    Returns (field, info) with info = {"psnr", "rays_per_sec", "seconds"}.
    """
    from focnerf_tpu.train.voxel import _fit_field_loop

    field = (
        init_field
        if init_field is not None
        else init_kplanes_field(
            resolution, rank=rank, time_res=time_res, sh_degree=sh_degree,
            rng=jax.random.key(seed),
        )
    )

    def reg(field):
        return kplanes_reg(field, tv_weight, time_smooth_weight)

    return _fit_field_loop(
        poses, images, intrinsics,
        params=field,
        raw_fn=collapse_kplanes,  # collapse at the view's own t
        reg_fn=reg,
        resolution=resolution, bound=bound, sh_degree=sh_degree,
        iters=iters, lr=lr, bg_color=bg_color, density_scale=density_scale,
        seed=seed, log_every=log_every, remat=remat,
        times=times, tag="kplanes",
        steps_per_dispatch=steps_per_dispatch,
    )
