"""Collapse-sharded K-planes SP (parallel/kplanes_sp.py): the 8-way step
must match the unsharded time-conditioned DP step exactly, and the local
slab collapse must tile the full collapse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.core.camera import rand_poses
from focnerf_tpu.render.baked import BakedVolume, render_baked, warp_gt_to_intermediate
from focnerf_tpu.train.voxel import _pose_variant
from focnerf_tpu.train.voxel_kplanes import (
    collapse_kplanes,
    init_kplanes_field,
    make_kplanes_dp_step,
)


def _moving_gt(R=32, t=0.0):
    c = (jnp.arange(R) + 0.5) / R * 2 - 1
    X, Y, Z = jnp.meshgrid(c, c, c, indexing="ij")
    cx = 0.5 * t - 0.25
    d = jnp.sqrt((X - cx) ** 2 + Y**2 + Z**2)
    sigma = jnp.where(d < 0.4, 30.0, 0.0)
    rgb = jnp.where(
        (Z > 0)[..., None], jnp.array([0.9, 0.15, 0.1]), jnp.array([0.1, 0.2, 0.9])
    )
    rgb = jnp.broadcast_to(rgb, (R, R, R, 3))
    return BakedVolume(rgba=jnp.concatenate([rgb, sigma[..., None]], -1), bound=1.0)


def _setup(R=16, H=32, n=6, seed=3):
    intr = (1.2 * H, 1.2 * H, H / 2.0, H / 2.0)
    all_poses = np.asarray(rand_poses(np.random.default_rng(seed), 64, radius=2.5))
    key0 = _pose_variant(all_poses[0], 1.0)
    poses = np.stack([p for p in all_poses if _pose_variant(p, 1.0) == key0])[:n]
    times = np.linspace(0.0, 1.0, len(poses)).astype(np.float32)
    imgs = [
        render_baked(_moving_gt(t=float(t)), p, intr, H, H)[0]
        for p, t in zip(poses, times)
    ]
    ri = R * 2
    warped = [
        warp_gt_to_intermediate(
            img, p, jnp.asarray(intr, jnp.float32), 1.0,
            axis=key0[0], flip=key0[1], ri=ri,
        )
        for img, p in zip(imgs, poses)
    ]
    gts = jnp.stack([w for w, _ in warped])
    masks = jnp.stack([m for _, m in warped])
    return key0, poses, times, gts, masks, intr, H


class TestCollapseLocalSlab:
    @pytest.mark.parametrize("warp_axis", [0, 1, 2])
    def test_slabs_tile_full_collapse(self, warp_axis):
        from focnerf_tpu.parallel.kplanes_sp import _collapse_local_slab

        R, D = 16, 4
        field = init_kplanes_field(R, rank=3, time_res=5, rng=jax.random.key(1))
        t = 0.37
        full = collapse_kplanes(field, t)
        slabs = [
            _collapse_local_slab(field, t, warp_axis, d, R // D) for d in range(D)
        ]
        tiled = jnp.concatenate(slabs, axis=warp_axis)
        np.testing.assert_allclose(
            np.asarray(tiled), np.asarray(full), rtol=1e-5, atol=1e-6
        )


class TestKPlanesSP:
    def test_sp_matches_unsharded(self):
        """One 8-way collapse-sharded step == the 1-device time-conditioned
        DP step (same field, same adam, same reg): the sliced-factor scan,
        the optical-depth partial combine, and the replicated-plane gradient
        psum must reproduce the monolithic step exactly."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.kplanes_sp import make_kplanes_sp_step
        from focnerf_tpu.parallel.mesh import make_mesh

        R = 16
        key0, poses, times, gts, masks, intr, H = _setup(R=R)
        (axis, flip) = key0
        field0 = init_kplanes_field(R, rank=3, time_res=5, rng=jax.random.key(0))

        mesh8 = make_mesh(8)
        opt_sp, step_sp = make_kplanes_sp_step(
            mesh8, resolution=R, warp_axis=axis, flip=flip, lr=2e-2,
            tv_weight=1e-4, time_smooth_weight=1e-3, block=2,
        )
        f_sp, st_sp, mse_sp = step_sp(
            field0, opt_sp.init(field0), jnp.asarray(poses[0]),
            jnp.float32(times[0]), gts[0], masks[0],
        )

        mesh1 = make_mesh(1)
        opt_dp, step_dp = make_kplanes_dp_step(
            mesh1, intr, H=H, W=H, resolution=R, warp_axis=axis, flip=flip,
            lr=2e-2, tv_weight=1e-4, time_smooth_weight=1e-3,
        )
        f_dp, _, mse_dp = step_dp(
            field0, opt_dp.init(field0), jnp.asarray(poses[:1]),
            jnp.asarray(times[:1]), gts[:1], masks[:1],
        )

        np.testing.assert_allclose(float(mse_sp), float(mse_dp), rtol=2e-5)
        for a, b, name in (
            (f_sp.space, f_dp.space, "space"),
            (f_sp.time, f_dp.time, "time"),
            (f_sp.w, f_dp.w, "w"),
            (f_sp.b, f_dp.b, "b"),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5, err_msg=name
            )

    def test_fit_kplanes_sp_converges(self):
        """Product fit entry: variant-grouped SP training drives mse down
        and discriminates time on the moving-sphere scene."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.kplanes_sp import fit_kplanes_sp
        from focnerf_tpu.train.voxel_kplanes import kplanes_field_to_volume

        R, H = 16, 32
        intr = (1.2 * H, 1.2 * H, H / 2.0, H / 2.0)
        poses = np.asarray(rand_poses(np.random.default_rng(5), 10, radius=2.5))
        times = np.linspace(0.0, 1.0, len(poses)).astype(np.float32)
        imgs = np.stack([
            np.asarray(render_baked(_moving_gt(t=float(t)), p, intr, H, H)[0])
            for p, t in zip(poses, times)
        ])
        field, info = fit_kplanes_sp(
            poses, imgs, times, intr, resolution=R, rank=3, time_res=5,
            iters=60, lr=5e-2, log_every=0, block=2,
        )
        assert np.isfinite(info["psnr"]) and info["psnr"] > 10.0
        # the fitted field must track time: volumes at t=0 and t=1 differ
        v0 = kplanes_field_to_volume(field, 0.0, 1.0)
        v1 = kplanes_field_to_volume(field, 1.0, 1.0)
        assert float(jnp.mean(jnp.abs(v0.rgba - v1.rgba))) > 1e-3
