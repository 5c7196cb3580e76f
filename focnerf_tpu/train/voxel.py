"""Direct dense-voxel field optimization through the shear-warp renderer.

The per-sample hash-grid training path is gather/scatter-floor-bound at
~10^5 rays/s/chip (PERF.md "1e7 target" analysis): every sample is a random
table row. This module removes random access from the training loop
entirely, Plenoxels-style: the scene is a dense RGBA(+SH) voxel grid
(render/baked.py::BakedVolume) optimized by gradient descent THROUGH the
shear-warp renderer — forward and backward are batched slice resamples,
einsums and cumprods, all dense, all MXU/VPU-shaped.

Measured reality (PERF.md voxel entries): intermediate-plane supervision
(default) keeps the screen warp out of the train graph (3.4 s -> 4.9 ms
per step at 128^3 / 800^2 on v5e), and jax.checkpoint over the block fold
(remat=True, default) drops the residual traffic of the compositing scan
for another 22% (3.8 ms, 17.3M supervised rays/s — recompute is free, the
step is bandwidth-bound).

Relation to the reference: this is a new TPU-first training family, not a
port — the reference's only training path is the per-sample CUDA marcher
(nerf/renderer.py run/run_cuda). It composes with the existing stack: the
output IS a BakedVolume, so composition/editing/viewer (--baked) and
save/load_volume work unchanged, and a hash-grid checkpoint can seed the
field via render/baked.py::bake_field for refinement.

Design notes:
  - the field is parameterized raw: sigma = softplus(raw_sigma) keeps
    density nonnegative without trunc_exp's fp32 pinning (the field itself
    is the parameter — there is no network to protect from exp overflow);
    diffuse color = sigmoid(raw_rgb); SH coefficients ride linearly.
  - poses are grouped by the renderer's host-chosen (axis, flip) so each
    group reuses one jitted value_and_grad program (<= 6 variants).
  - 3D total variation regularizes empty space exactly like the
    reference's hash-grid TV option (gridencoder.cu:628-643 analogue).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.render.baked import BakedVolume, render_baked


def init_voxel_field(
    resolution: int,
    sh_degree: int = 0,
    raw_sigma0: float = -3.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Raw field [R, R, R, P+1] (payload channels then sigma).

    raw_sigma0 = -3 starts the volume nearly transparent (softplus(-3) ~=
    0.049), the dense-field analogue of the empty-grid init.
    """
    P = 3 * max(sh_degree, 1) ** 2 if sh_degree > 0 else 3
    raw = jnp.zeros((resolution,) * 3 + (P + 1,), jnp.float32)
    raw = raw.at[..., -1].set(raw_sigma0)
    if rng is not None:  # tiny color noise breaks the sigmoid symmetry
        raw = raw.at[..., :P].add(0.01 * jax.random.normal(rng, raw[..., :P].shape))
    return raw


def field_to_volume(raw: jax.Array, bound: float, sh_degree: int = 0) -> BakedVolume:
    """Activation: raw parameters -> renderable BakedVolume."""
    if sh_degree > 0:
        payload = raw[..., :-1]  # SH coefficients are linear
    else:
        payload = jax.nn.sigmoid(raw[..., :-1])
    sigma = jax.nn.softplus(raw[..., -1:])
    return BakedVolume(
        rgba=jnp.concatenate([payload, sigma], -1), bound=bound, sh_deg=sh_degree
    )


def tv_loss(raw: jax.Array) -> jax.Array:
    """Mean 3D total variation of the raw field (all channels)."""
    tv = 0.0
    for ax in range(3):
        d = jnp.diff(raw, axis=ax)
        tv = tv + jnp.mean(d * d)
    return tv


def _pose_variant(pose: np.ndarray, bound: float) -> Tuple[int, bool]:
    """Mirror render_baked's host-side principal-axis choice (baked.py)."""
    fwd = pose[:3, :3] @ np.array([0.0, 0.0, 1.0], np.float32)
    axis = int(np.argmax(np.abs(fwd)))
    eye = pose[:3, 3]
    if abs(eye[axis]) <= bound:
        axis = int(np.argmax(np.abs(eye)))
    return axis, bool(pose[axis, 3] < 0)


def _fit_field_loop(
    poses: np.ndarray,  # [V, 4, 4] c2w
    images: np.ndarray,  # [V, H, W, 3] in [0, 1]
    intrinsics: Sequence[float],  # fx, fy, cx, cy
    *,
    params,  # initial parameter pytree of the family
    raw_fn,  # (params, t) -> raw grid [R, R, R, C] (t ignored when static)
    reg_fn,  # params -> scalar regularizer
    resolution: int,
    bound: float = 1.0,
    sh_degree: int = 0,
    iters: int = 500,
    lr: float = 5e-2,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    seed: int = 0,
    log_every: int = 0,
    intermediate_scale: int = 2,
    remat: bool = True,
    supervise: str = "intermediate",
    times: Optional[np.ndarray] = None,  # [V] per-view scalars fed to raw_fn
    tag: str = "voxel",
    steps_per_dispatch: int = 1,
) -> Tuple[object, Dict]:
    """Shared whole-image descent engine for all voxel field families.

    The dense, dynamic (train/voxel_dynamic.py) and VM-factorized
    (train/voxel_vm.py) families differ only in their parameterization —
    ``raw_fn`` collapses the family's parameters (at the view's ``times``
    entry, for time-conditioned families) to the dense raw grid that the
    shear-warp compositor consumes, and ``reg_fn`` is the family's
    regularizer. Everything else is identical and lives here once: one
    compiled step per (axis, flip) pose variant, GTs pre-warped once per
    view for intermediate-plane supervision (or the exact screen-space
    loss for ``supervise="screen"``), the shuffled view order, and the
    throughput/psnr bookkeeping.

    Returns (params, info) with info = {"psnr", "rays_per_sec", "seconds"}.
    """
    import optax
    import time

    from focnerf_tpu.render.baked import (
        _composite_core,
        _render_core,
        warp_gt_to_intermediate,
    )

    V, H, W = images.shape[:3]
    poses = np.asarray(poses, np.float32)
    gts = jnp.asarray(images, jnp.float32)
    intr_dev = jnp.asarray(intrinsics, jnp.float32)
    assert supervise in ("intermediate", "screen"), supervise
    ri = resolution * intermediate_scale
    t_arr = (
        np.zeros(V, np.float32) if times is None
        else np.asarray(times, np.float32)
    )

    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    # one compiled step per (axis, flip) variant; pose/t/gt are traced args
    step_cache: Dict[Tuple[int, bool], object] = {}
    # pre-warped GT + valid-ray mask per view (intermediate supervision)
    warped: Dict[int, Tuple[jax.Array, jax.Array]] = {}

    def make_step(axis: int, flip: bool):
        if supervise == "intermediate":

            def loss_fn(params, pose_dev, t, wgt, mask):
                vol = field_to_volume(raw_fn(params, t), bound, sh_degree)
                C, T, _, _ = _composite_core(
                    vol.rgba, bound, pose_dev, axis=axis, flip=flip, ri=ri,
                    density_scale=density_scale, sh_deg=sh_degree,
                    remat=remat,
                )
                img_i = C + T[..., None] * bg_color
                m = mask[..., None]
                mse = jnp.sum(m * (img_i - wgt) ** 2) / (
                    3.0 * jnp.maximum(jnp.sum(mask), 1.0)
                )
                return mse + reg_fn(params), mse

        else:

            def loss_fn(params, pose_dev, t, gt, mask):
                del mask
                vol = field_to_volume(raw_fn(params, t), bound, sh_degree)
                img, _, _ = _render_core(
                    vol.rgba, bound, pose_dev, intr_dev,
                    axis=axis, flip=flip, H=H, W=W, ri=ri,
                    bg_color=bg_color, density_scale=density_scale,
                    sh_deg=sh_degree, remat=remat,
                )
                mse = jnp.mean((img - gt) ** 2)
                return mse + reg_fn(params), mse

        def step(params, opt_state, pose_dev, t, target, mask):
            (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, pose_dev, t, target, mask
            )
            updates, opt_state = optimizer.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, mse

        return step  # un-jitted; callers jit (per-step) or scan (fused)

    def targets_for(v: int, key: Tuple[int, bool]):
        if supervise == "screen":
            return gts[v], jnp.ones((1, 1), jnp.float32)
        if v not in warped:
            warped[v] = warp_gt_to_intermediate(
                gts[v], poses[v], intr_dev, bound,
                axis=key[0], flip=key[1], ri=ri,
            )
        return warped[v]

    order = np.random.default_rng(seed).integers(0, V, iters)
    t0 = time.time()
    mse = jnp.float32(1.0)
    K = max(1, int(steps_per_dispatch))
    if K > 1 and iters >= K:
        # fused dispatch: lax.scan over the shuffled view schedule with a
        # lax.switch over the <=6 (axis, flip) compositing variants. The
        # update SEQUENCE is identical to the per-step loop (same `order`,
        # same per-view step math) — only the host<->device dispatch count
        # changes, which is the entire cost on a tunneled chip (~120 ms
        # RTT vs ~3.5 ms of 128^3 step compute, PERF.md round-4).
        variant_keys = sorted({_pose_variant(poses[v], bound) for v in range(V)})
        key_to_idx = {k: i for i, k in enumerate(variant_keys)}
        tm = [targets_for(v, _pose_variant(poses[v], bound)) for v in range(V)]
        targets_dev = jnp.stack([t for t, _ in tm])
        masks_dev = jnp.stack([m for _, m in tm])
        poses_dev = jnp.asarray(poses)
        t_dev = jnp.asarray(t_arr)
        vidx = jnp.asarray(
            [key_to_idx[_pose_variant(poses[v], bound)] for v in range(V)],
            jnp.int32,
        )
        step_raws = [make_step(*k) for k in variant_keys]

        def chunk(params, opt_state, view_ids):
            def body(carry, v):
                params, opt_state = carry
                branches = [
                    (
                        lambda sr: lambda p, o: sr(
                            p, o, poses_dev[v], t_dev[v],
                            targets_dev[v], masks_dev[v],
                        )
                    )(sr)
                    for sr in step_raws
                ]
                params, opt_state, mse = jax.lax.switch(
                    vidx[v], branches, params, opt_state
                )
                return (params, opt_state), mse

            (params, opt_state), mses = jax.lax.scan(
                body, (params, opt_state), view_ids
            )
            return params, opt_state, mses

        chunk_jit = jax.jit(chunk, donate_argnums=(0, 1))
        it = 0
        while it < iters:
            n = min(K, iters - it)  # tail = one extra trace at length n
            ids = jnp.asarray(order[it : it + n], jnp.int32)
            params, opt_state, mses = chunk_jit(params, opt_state, ids)
            mse = mses[-1]
            it += n
            if log_every and (it % log_every) < n:
                print(f"[{tag}] iter {it}/{iters} mse {float(mse):.5f}",
                      flush=True)
    else:
        for it in range(iters):
            v = int(order[it])
            key = _pose_variant(poses[v], bound)
            if key not in step_cache:
                step_cache[key] = jax.jit(make_step(*key))
            target_v, mask_v = targets_for(v, key)
            params, opt_state, mse = step_cache[key](
                params, opt_state, jnp.asarray(poses[v]),
                jnp.float32(t_arr[v]), target_v, mask_v,
            )
            if log_every and (it + 1) % log_every == 0:
                print(f"[{tag}] iter {it+1}/{iters} mse {float(mse):.5f}",
                      flush=True)
    jax.block_until_ready(mse)
    dt = time.time() - t0
    psnr = -10.0 * float(jnp.log10(jnp.maximum(mse, 1e-10)))
    n_sup = ri * ri if supervise == "intermediate" else H * W
    info = {
        "psnr": psnr,
        "rays_per_sec": n_sup * iters / dt,
        "seconds": dt,
    }
    return params, info


def _c2f_stage_plan(resolution: int, stages: int, iters: int):
    """Coarse-to-fine ladder shared by the dense/VM families: resolution
    doubles each stage up to ``resolution`` (floored at 16), ``iters``
    split evenly with the final stage taking the remainder — floored at 1
    so tiny iteration budgets still train every stage instead of crashing
    on a negative count or silently skipping full resolution.

    Returns [(stage_resolution, stage_iters), ...]."""
    assert stages >= 1
    ladder = [max(resolution >> (stages - 1 - s), 16) for s in range(stages)]
    ladder = sorted(set(min(r, resolution) for r in ladder))
    if ladder[-1] != resolution:
        ladder.append(resolution)
    per = max(iters // len(ladder), 1)
    counts = [per] * (len(ladder) - 1) + [
        max(iters - per * (len(ladder) - 1), 1)
    ]
    return list(zip(ladder, counts))


def fit_voxels(
    poses: np.ndarray,  # [V, 4, 4] c2w
    images: np.ndarray,  # [V, H, W, 3] in [0, 1]
    intrinsics: Sequence[float],  # fx, fy, cx, cy
    *,
    resolution: int = 128,
    bound: float = 1.0,
    sh_degree: int = 0,
    iters: int = 500,
    lr: float = 5e-2,
    tv_weight: float = 1e-4,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    init_raw: Optional[jax.Array] = None,
    seed: int = 0,
    log_every: int = 0,
    intermediate_scale: int = 2,
    remat: bool = True,
    supervise: str = "intermediate",
    steps_per_dispatch: int = 1,
) -> Tuple[BakedVolume, Dict]:
    """Fit a dense voxel field to posed images by whole-image descent.

    ``supervise`` picks where the photometric loss lives:
      "intermediate" (default) — GT images are pre-warped once per view onto
        the shear-warp intermediate plane (warp_gt_to_intermediate) and the
        loss supervises the compositor output directly. The screen-space
        warp never enters the train graph — its forward lowers to a
        scalar-loop gather and its backward to an H*W overlapping
        scatter-add, together ~99% of the step time (PERF.md voxel-backward
        bisect: 3.4 s -> 9 ms/step at 128^3/800^2 on v5e).
      "screen" — the exact end-to-end loss through the full render
        (useful as the quality oracle; ~370x slower on TPU).

    Returns (volume, info) with info = {"psnr": train PSNR of the last
    step, "rays_per_sec": effective supervised rays/s over the run}.
    """
    raw = (
        init_raw
        if init_raw is not None
        else init_voxel_field(resolution, sh_degree, rng=jax.random.key(seed))
    )
    raw, info = _fit_field_loop(
        poses, images, intrinsics,
        params=raw,
        raw_fn=lambda raw, t: raw,  # the dense field IS the raw grid
        reg_fn=lambda raw: tv_weight * tv_loss(raw),
        resolution=resolution, bound=bound, sh_degree=sh_degree,
        iters=iters, lr=lr, bg_color=bg_color, density_scale=density_scale,
        seed=seed, log_every=log_every,
        intermediate_scale=intermediate_scale, remat=remat,
        supervise=supervise, tag="voxel",
        steps_per_dispatch=steps_per_dispatch,
    )
    info["raw"] = raw  # pre-activation field (coarse-to-fine staging)
    return field_to_volume(raw, bound, sh_degree), info


def upsample_field(raw: jax.Array, new_res: int) -> jax.Array:
    """Trilinearly upsample a raw field [R,R,R,C] -> [new_res]^3 x C.

    Operates on RAW (pre-activation) values: softplus/sigmoid are monotone,
    so interpolating raw parameters preserves the coarse solution as the
    init of the finer stage (the Plenoxels coarse-to-fine step)."""
    C = raw.shape[-1]
    return jax.image.resize(
        raw, (new_res, new_res, new_res, C), method="trilinear"
    )


def fit_voxels_c2f(
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
    """Coarse-to-fine fit: resolution doubles each stage up to ``resolution``
    (e.g. stages=3 -> R/4, R/2, R), splitting ``iters`` evenly and seeding
    each stage with the trilinearly-upsampled previous field. Low frequencies
    converge at the cheap coarse stages and the fine stage starts from a
    good init — the Plenoxels schedule, here also a throughput win since
    coarse-stage steps composite 4x/16x fewer intermediate pixels.

    Accepts fit_voxels keyword args via **kw (sh_degree, lr, tv_weight,
    supervise, ...). Returns (volume, info) of the final stage with
    info["stage_psnrs"] recording each stage's closing train PSNR."""
    raw = None
    stage_psnrs = []
    info: Dict = {}
    for si, (R, n_it) in enumerate(_c2f_stage_plan(resolution, stages, iters)):
        if raw is not None:
            raw = upsample_field(raw, R)
        vol, info = fit_voxels(
            poses, images, intrinsics, resolution=R, iters=n_it,
            init_raw=raw, seed=seed + si, log_every=log_every, **kw,
        )
        stage_psnrs.append(info["psnr"])
        raw = info["raw"]
    info["stage_psnrs"] = stage_psnrs
    return vol, info


def _volume_to_raw(vol: BakedVolume, sh_degree: int = 0) -> jax.Array:
    """Invert field_to_volume (softplus/sigmoid are bijections on their
    ranges; clamped away from the saturated ends for finite raws)."""
    payload = vol.rgba[..., :-1]
    sigma = vol.rgba[..., -1:]
    if sh_degree > 0:
        raw_payload = payload  # linear
    else:
        p = jnp.clip(payload, 1e-6, 1.0 - 1e-6)
        raw_payload = jnp.log(p) - jnp.log1p(-p)  # logit
    s = jnp.maximum(sigma, 1e-6)
    # softplus^-1(y) = y + log(1 - exp(-y))
    raw_sigma = s + jnp.log(-jnp.expm1(-s))
    return jnp.concatenate([raw_payload, raw_sigma], -1)


def make_voxel_dp_step(
    mesh,
    intrinsics: Sequence[float],
    *,
    H: int,
    W: int,
    resolution: int,
    warp_axis: int,
    flip: bool,
    bound: float = 1.0,
    sh_degree: int = 0,
    lr: float = 5e-2,
    tv_weight: float = 1e-4,
    bg_color: float = 1.0,
    density_scale: float = 1.0,
    axis: str = "data",
    intermediate_scale: int = 2,
    remat: bool = True,
    supervise: str = "intermediate",
    collapse_fn=None,
    reg_fn=None,
    time_conditioned: bool = False,
):
    """Pose-parallel voxel train step over a device mesh (SURVEY §2.3 DP).

    Each device renders + differentiates ONE pose of the batch against its
    GT; the raw field and optimizer state are replicated and the gradient
    mean rides XLA's psum over the mesh axis. All poses in a batch must
    share the renderer's (warp_axis, flip) variant — the principal axis is
    a compile-time choice (group poses with _pose_variant, exactly like
    fit_voxels' step cache).

    ``supervise`` follows fit_voxels: "intermediate" (default) supervises
    the compositor output against pre-warped GTs (gts must be
    [D, ri, ri, 3] from warp_gt_to_intermediate with masks [D, ri, ri];
    the screen warp never enters the train graph), "screen" runs the full
    render against [D, H, W, 3] images (masks ignored).

    ``collapse_fn``/``reg_fn`` generalize the step to factorized families:
    params -> raw grid and params -> regularizer (defaults: identity +
    tv_weight * tv_loss — the dense field). The VM family passes
    collapse_vm / vm_tv_loss (train/voxel_vm.py::make_vm_dp_step).

    ``time_conditioned=True`` serves the dynamic families: collapse_fn then
    takes (params, t) and runs INSIDE the per-device vmap (each device
    collapses the field at its own view's time), and the step gains a
    ``times [D]`` argument after ``poses``.

    Returns (optimizer, step) with
    step(params, opt_state, poses [D,4,4][, times [D]], gts, masks) ->
    (params, opt_state, mse).
    """
    import optax

    from jax.sharding import NamedSharding, PartitionSpec as P

    from focnerf_tpu.render.baked import _composite_core, _render_core

    if time_conditioned and collapse_fn is None:
        raise ValueError(
            "time_conditioned=True requires a collapse_fn(params, t) — the "
            "dense default collapse takes no time (see make_kplanes_dp_step/"
            "make_dyn_dp_step for the dynamic-family wrappers)"
        )
    if collapse_fn is None:
        collapse_fn = lambda p: p  # noqa: E731 — dense field IS the raw grid
    if reg_fn is None:
        reg_fn = lambda p: tv_weight * tv_loss(p)  # noqa: E731

    optimizer = optax.adam(lr)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))
    intr_dev = jnp.asarray(intrinsics, jnp.float32)
    ri = resolution * intermediate_scale
    assert supervise in ("intermediate", "screen"), supervise

    if supervise == "intermediate":

        def loss_one(raw, pose, wgt, mask):
            vol = field_to_volume(raw, bound, sh_degree)
            C, T, _, _ = _composite_core(
                vol.rgba, bound, pose, axis=warp_axis, flip=flip, ri=ri,
                density_scale=density_scale, sh_deg=sh_degree, remat=remat,
            )
            img_i = C + T[..., None] * bg_color
            m = mask[..., None]
            return jnp.sum(m * (img_i - wgt) ** 2) / (
                3.0 * jnp.maximum(jnp.sum(mask), 1.0)
            )

    else:

        def loss_one(raw, pose, gt, mask):
            del mask
            vol = field_to_volume(raw, bound, sh_degree)
            img, _, _ = _render_core(
                vol.rgba, bound, pose, intr_dev, axis=warp_axis, flip=flip,
                H=H, W=W, ri=ri, bg_color=bg_color,
                density_scale=density_scale, sh_deg=sh_degree, remat=remat,
            )
            return jnp.mean((img - gt) ** 2)

    if time_conditioned:
        # each device collapses the field at its own view's t: the collapse
        # moves inside the vmap (its flops replicate per device, but the
        # factorized params are tiny — that is the point of these families)
        def loss_one_t(params, pose, t, target, mask):
            return loss_one(collapse_fn(params, t), pose, target, mask)

        def loss_fn(params, poses, times, gts, masks):
            mse = jnp.mean(
                jax.vmap(loss_one_t, in_axes=(None, 0, 0, 0, 0))(
                    params, poses, times, gts, masks
                )
            )
            return mse + reg_fn(params), mse

        @jax.jit
        def step(params, opt_state, poses, times, gts, masks):
            params = jax.lax.with_sharding_constraint(
                params, jax.tree.map(lambda _: repl, params)
            )
            poses = jax.lax.with_sharding_constraint(poses, data)
            times = jax.lax.with_sharding_constraint(times, data)
            gts = jax.lax.with_sharding_constraint(gts, data)
            masks = jax.lax.with_sharding_constraint(masks, data)
            (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, poses, times, gts, masks
            )
            updates, opt_state = optimizer.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, mse

        return optimizer, step

    def loss_fn(params, poses, gts, masks):
        raw = collapse_fn(params)
        mse = jnp.mean(
            jax.vmap(loss_one, in_axes=(None, 0, 0, 0))(raw, poses, gts, masks)
        )
        return mse + reg_fn(params), mse

    @jax.jit
    def step(params, opt_state, poses, gts, masks):
        params = jax.lax.with_sharding_constraint(
            params, jax.tree.map(lambda _: repl, params)
        )
        poses = jax.lax.with_sharding_constraint(poses, data)
        gts = jax.lax.with_sharding_constraint(gts, data)
        masks = jax.lax.with_sharding_constraint(masks, data)
        (loss, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, poses, gts, masks
        )
        updates, opt_state = optimizer.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, mse

    return optimizer, step
