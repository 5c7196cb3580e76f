"""VM-factorized dense field: TensoRF-style planes x vectors, gather-free.

The dense voxel family (train/voxel.py) reaches the throughput headline but
its parameter count is the full R^3 grid — at the production bake scale
(256^3) the adam/param HBM traffic becomes a visible share of the step
(PERF.md 256^3 scale check), checkpoints are hundreds of MB, and 512^3 is
out of reach. This module factorizes the RAW field TensoRF-style
(vector-matrix decomposition):

    raw[x, y, z, c] = bias[c]
                    + sum_k P0[y, z, k, c] * V0[x, k, c]     (YZ plane x X vec)
                    + sum_k P1[x, z, k, c] * V1[y, k, c]     (XZ plane x Y vec)
                    + sum_k P2[x, y, k, c] * V2[z, k, c]     (XY plane x Z vec)

Parameters shrink from R^3*C to 3*R^2*K*C + 3*R*K*C — a factor of R/(3K)
(5.3x at R=256/K=16, 10.7x at R=512/K=16), which is where the dense
family's 256^3 step spends its growing adam/param share. Collapsing to the dense grid is three dense einsums —
MXU-shaped, gradients dense (contractions of the upstream R^3 gradient
against the factors; no scatter) — after which training and rendering ride
the static shear-warp machinery unchanged (field_to_volume ->
_composite_core, intermediate-plane supervision, remat over the block
fold). Same collapse-then-ride pattern as the dynamic family
(train/voxel_dynamic.py), applied to space instead of time.

Relation to the reference: no equivalent (the reference's only trainable
scene representations are hash-grid/fourier MLP fields trained per sample,
nerf/network*.py); this is a TPU-first family addition. The factorization
follows Chen et al., TensoRF (ECCV 2022) — public method, original code.

Regularization: 2D TV on planes + 1D TV on vectors (the factored analogue
of train/voxel.py::tv_loss) and optional L1 on the density component
(TensoRF's sparsity prior).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.render.baked import BakedVolume
from focnerf_tpu.train.voxel import field_to_volume


class VMField(NamedTuple):
    """Factorized raw field. ``planes`` [3, R, R, K, C], ``vectors``
    [3, R, K, C], ``bias`` [C]; C = payload channels + 1 (sigma last,
    pre-activation — field_to_volume applies sigmoid/softplus)."""

    planes: jax.Array
    vectors: jax.Array
    bias: jax.Array


def init_vm_field(
    resolution: int,
    *,
    rank: int = 16,
    sh_degree: int = 0,
    raw_sigma0: float = -3.0,
    init_scale: float = 0.1,
    rng: Optional[jax.Array] = None,
) -> VMField:
    """Near-transparent start: factors ~ N(0, init_scale) (the component
    products nearly cancel), sigma bias at raw_sigma0 (softplus(-3) ~ 0.05
    — the dense family's empty init, train/voxel.py)."""
    P = 3 * max(sh_degree, 1) ** 2 if sh_degree > 0 else 3
    C = P + 1
    rng = rng if rng is not None else jax.random.key(0)
    kp, kv = jax.random.split(rng)
    R = resolution
    planes = init_scale * jax.random.normal(kp, (3, R, R, rank, C), jnp.float32)
    vectors = init_scale * jax.random.normal(kv, (3, R, rank, C), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32).at[-1].set(raw_sigma0)
    return VMField(planes=planes, vectors=vectors, bias=bias)


def collapse_vm(field: VMField) -> jax.Array:
    """Factors -> dense raw grid [R, R, R, C]: three einsums (MXU work,
    dense gradients)."""
    P, V = field.planes, field.vectors
    g = jnp.einsum("yzkc,xkc->xyzc", P[0], V[0])
    g = g + jnp.einsum("xzkc,ykc->xyzc", P[1], V[1])
    g = g + jnp.einsum("xykc,zkc->xyzc", P[2], V[2])
    return g + field.bias


def vm_field_to_volume(
    field: VMField, bound: float, sh_degree: int = 0
) -> BakedVolume:
    """Renderable BakedVolume (feeds render_baked / the product unchanged)."""
    return field_to_volume(collapse_vm(field), bound, sh_degree)


def vm_tv_loss(field: VMField) -> jax.Array:
    """Factored total variation: 2D TV on each plane stack, 1D on vectors."""
    tv = 0.0
    for ax in (1, 2):  # the two spatial axes of [3, R, R, K, C]
        d = jnp.diff(field.planes, axis=ax)
        tv = tv + jnp.mean(d * d)
    dv = jnp.diff(field.vectors, axis=1)
    return tv + jnp.mean(dv * dv)


def vm_density_l1(field: VMField) -> jax.Array:
    """L1 sparsity on the density component's factors (TensoRF prior)."""
    return jnp.mean(jnp.abs(field.planes[..., -1])) + jnp.mean(
        jnp.abs(field.vectors[..., -1])
    )


def vm_reg(field: VMField, tv_weight: float, l1_weight: float) -> jax.Array:
    """The family regularizer (single source for fit + DP step)."""
    r = tv_weight * vm_tv_loss(field)
    if l1_weight > 0.0:
        r = r + l1_weight * vm_density_l1(field)
    return r


def upsample_vm(field: VMField, new_res: int) -> VMField:
    """Bilinearly upsample factors to a finer resolution (coarse-to-fine;
    operates on raw factors like train/voxel.py::upsample_field)."""
    _, R, _, K, C = field.planes.shape
    planes = jax.image.resize(
        field.planes, (3, new_res, new_res, K, C), method="bilinear"
    )
    vectors = jax.image.resize(
        field.vectors, (3, new_res, K, C), method="linear"
    )
    return VMField(planes=planes, vectors=vectors, bias=field.bias)


def save_vm_field(path: str, field: VMField, bound: float, sh_degree: int) -> None:
    np.savez_compressed(
        path,
        planes=np.asarray(field.planes, np.float16),
        vectors=np.asarray(field.vectors, np.float16),
        bias=np.asarray(field.bias, np.float32),
        bound=np.float32(bound),
        sh_deg=np.int32(sh_degree),
    )


def load_vm_field(path: str) -> Tuple[VMField, float, int]:
    with np.load(path) as z:
        return (
            VMField(
                planes=jnp.asarray(z["planes"].astype(np.float32)),
                vectors=jnp.asarray(z["vectors"].astype(np.float32)),
                bias=jnp.asarray(z["bias"]),
            ),
            float(z["bound"]),
            int(z["sh_deg"]),
        )


def fit_vm_voxels(
    poses: np.ndarray,  # [V, 4, 4] c2w
    images: np.ndarray,  # [V, H, W, 3] in [0, 1]
    intrinsics: Sequence[float],  # fx, fy, cx, cy
    *,
    resolution: int = 128,
    rank: int = 16,
    bound: float = 1.0,
    sh_degree: int = 0,
    iters: int = 500,
    lr: float = 2e-2,
    tv_weight: float = 1e-4,
    l1_weight: float = 0.0,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    init_field: Optional[VMField] = None,
    seed: int = 0,
    log_every: int = 0,
    intermediate_scale: int = 2,
    remat: bool = True,
    steps_per_dispatch: int = 1,
) -> Tuple[BakedVolume, Dict]:
    """Fit the VM-factorized field by whole-image descent with
    intermediate-plane supervision (train/voxel.py semantics: GTs are
    pre-warped once per view, the screen warp never enters the step).

    Returns (volume, info); info["field"] carries the factors for
    save_vm_field / coarse-to-fine staging.
    """
    from focnerf_tpu.train.voxel import _fit_field_loop

    field = (
        init_field
        if init_field is not None
        else init_vm_field(
            resolution, rank=rank, sh_degree=sh_degree, rng=jax.random.key(seed)
        )
    )

    def reg(field):
        return vm_reg(field, tv_weight, l1_weight)

    field, info = _fit_field_loop(
        poses, images, intrinsics,
        params=field,
        raw_fn=lambda f, t: collapse_vm(f),
        reg_fn=reg,
        resolution=resolution, bound=bound, sh_degree=sh_degree,
        iters=iters, lr=lr, bg_color=bg_color, density_scale=density_scale,
        seed=seed, log_every=log_every,
        intermediate_scale=intermediate_scale, remat=remat, tag="vmvoxel",
        steps_per_dispatch=steps_per_dispatch,
    )
    info["field"] = field
    return vm_field_to_volume(field, bound, sh_degree), info


def make_vm_dp_step(
    mesh,
    intrinsics: Sequence[float],
    *,
    H: int,
    W: int,
    resolution: int,
    warp_axis: int,
    flip: bool,
    tv_weight: float = 1e-4,
    l1_weight: float = 0.0,
    **kw,
):
    """Pose-parallel DP step for the VM family: train/voxel.py's
    make_voxel_dp_step with the factors replicated and the collapse einsums
    inside the per-device loss (gradient mean rides XLA's psum)."""
    from focnerf_tpu.train.voxel import make_voxel_dp_step

    def reg(field):
        return vm_reg(field, tv_weight, l1_weight)

    return make_voxel_dp_step(
        mesh, intrinsics, H=H, W=W, resolution=resolution,
        warp_axis=warp_axis, flip=flip, collapse_fn=collapse_vm, reg_fn=reg,
        **kw,
    )


def fit_vm_c2f(
    poses: np.ndarray,
    images: np.ndarray,
    intrinsics: Sequence[float],
    *,
    resolution: int = 128,
    stages: int = 3,
    iters: int = 500,
    seed: int = 0,
    log_every: int = 0,
    **kw,
) -> Tuple[BakedVolume, Dict]:
    """Coarse-to-fine VM fit: factor resolution doubles each stage up to
    ``resolution`` (the Plenoxels/TensoRF upsampling schedule; see
    train/voxel.py::fit_voxels_c2f), seeding each stage with upsample_vm of
    the previous factors. Coarse stages composite 4x/16x fewer intermediate
    pixels, so they are also a throughput win."""
    from focnerf_tpu.train.voxel import _c2f_stage_plan

    field = None
    stage_psnrs = []
    info: Dict = {}
    for si, (R, n_it) in enumerate(_c2f_stage_plan(resolution, stages, iters)):
        if field is not None:
            field = upsample_vm(field, R)
        vol, info = fit_vm_voxels(
            poses, images, intrinsics, resolution=R, iters=n_it,
            init_field=field, seed=seed + si, log_every=log_every, **kw,
        )
        stage_psnrs.append(info["psnr"])
        field = info["field"]
    info["stage_psnrs"] = stage_psnrs
    return vol, info
