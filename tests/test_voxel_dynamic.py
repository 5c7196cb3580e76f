"""Dynamic dense-voxel family (train/voxel_dynamic.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.core.camera import rand_poses
from focnerf_tpu.render.baked import BakedVolume, render_baked
from focnerf_tpu.train.voxel_dynamic import (
    DynVoxelField,
    collapse_field,
    dyn_field_to_volume,
    fit_dyn_voxels,
    init_dyn_voxel_field,
    load_dyn_field,
    save_dyn_field,
    time_weights,
)


def _moving_sphere_volume(t: float, R: int = 32) -> BakedVolume:
    """Red/blue sphere whose center slides along +x with t."""
    c = (jnp.arange(R) + 0.5) / R * 2 - 1
    X, Y, Z = jnp.meshgrid(c, c, c, indexing="ij")
    cx = -0.25 + 0.5 * t
    d = jnp.sqrt((X - cx) ** 2 + Y**2 + Z**2)
    sigma = jnp.where(d < 0.35, 30.0, 0.0)
    rgb = jnp.where(
        (Z > 0)[..., None], jnp.array([0.9, 0.15, 0.1]), jnp.array([0.1, 0.2, 0.9])
    )
    rgb = jnp.broadcast_to(rgb, (R, R, R, 3))
    return BakedVolume(rgba=jnp.concatenate([rgb, sigma[..., None]], -1), bound=1.0)


class TestDynField:
    def test_init_is_static(self):
        f = init_dyn_voxel_field(8, rank=2, time_slots=4)
        r0 = collapse_field(f, 0.0)
        r1 = collapse_field(f, 1.0)
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-6)

    def test_time_weights_interpolate(self):
        w = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
        np.testing.assert_allclose(np.asarray(time_weights(w, 0.5)), [0.5, 0.5])
        np.testing.assert_allclose(np.asarray(time_weights(w, 0.0)), [0.0, 1.0])

    def test_save_load_roundtrip(self, tmp_path):
        f = init_dyn_voxel_field(8, rank=2, time_slots=4, rng=jax.random.key(0))
        p = str(tmp_path / "dyn.npz")
        save_dyn_field(p, f, bound=1.5, sh_degree=0)
        f2, bound, sh = load_dyn_field(p)
        assert bound == 1.5 and sh == 0
        np.testing.assert_allclose(
            np.asarray(f2.wslots), np.asarray(f.wslots), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(f2.base), np.asarray(f.base), atol=1e-2
        )  # f16 storage


class TestDynDP:
    def test_time_conditioned_step_runs(self):
        """make_dyn_dp_step: one pose-parallel step over per-view times
        (the time_conditioned DP core is parity-tested in
        test_voxel_kplanes.py; this covers the low-rank wrapper)."""
        if jax.device_count() < 8:
            import pytest

            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.mesh import make_mesh
        from focnerf_tpu.render.baked import warp_gt_to_intermediate
        from focnerf_tpu.train.voxel import _pose_variant
        from focnerf_tpu.train.voxel_dynamic import make_dyn_dp_step

        H = W = 32
        intr = (38.4, 38.4, 16.0, 16.0)
        all_poses = np.asarray(rand_poses(np.random.default_rng(3), 64, radius=2.5))
        key0 = _pose_variant(all_poses[0], 1.0)
        poses = np.stack(
            [p for p in all_poses if _pose_variant(p, 1.0) == key0]
        )[:8]
        times = np.linspace(0.0, 1.0, 8).astype(np.float32)
        imgs = [
            render_baked(_moving_sphere_volume(float(t), R=16), p, intr, H, W)[0]
            for p, t in zip(poses, times)
        ]
        warped = [
            warp_gt_to_intermediate(
                img, p, jnp.asarray(intr, jnp.float32), 1.0,
                axis=key0[0], flip=key0[1], ri=32,
            )
            for img, p in zip(imgs, poses)
        ]
        gts = jnp.stack([w for w, _ in warped])
        masks = jnp.stack([m for _, m in warped])
        field0 = init_dyn_voxel_field(16, rank=2, time_slots=4)
        optimizer, step = make_dyn_dp_step(
            make_mesh(8), intr, H=H, W=W, resolution=16,
            warp_axis=key0[0], flip=key0[1],
        )
        field, _, mse = step(
            field0, optimizer.init(field0), jnp.asarray(poses),
            jnp.asarray(times), gts, masks,
        )
        assert np.isfinite(float(mse))
        assert not np.allclose(np.asarray(field.base), np.asarray(field0.base))


class TestFitDynVoxels:
    def test_learns_moving_sphere(self):
        """The low-rank field must track the sphere across time: renders at
        t=0 and t=1 should each match their OWN ground truth better than the
        other time's ground truth."""
        H = W = 40
        intr = (48.0, 48.0, 20.0, 20.0)
        rng = np.random.default_rng(0)
        poses = np.asarray(rand_poses(rng, 12, radius=2.5))
        ts = np.linspace(0.0, 1.0, 12)
        imgs = np.stack(
            [
                np.asarray(
                    render_baked(_moving_sphere_volume(t), p, intr, H, W)[0]
                )
                for p, t in zip(poses, ts)
            ]
        )
        field, info = fit_dyn_voxels(
            poses, imgs, ts, intr, resolution=32, rank=2, time_slots=8,
            iters=250, lr=0.1, tv_weight=1e-5, time_smooth_weight=1e-4,
        )
        assert info["psnr"] > 16.0, info

        # held-out pose, both end times
        test_pose = np.asarray(rand_poses(np.random.default_rng(99), 1, radius=2.5))[0]

        def render_at(t):
            vol = dyn_field_to_volume(field, t, 1.0)
            return np.asarray(render_baked(vol, test_pose, intr, H, W)[0])

        gt0 = np.asarray(render_baked(_moving_sphere_volume(0.0), test_pose, intr, H, W)[0])
        gt1 = np.asarray(render_baked(_moving_sphere_volume(1.0), test_pose, intr, H, W)[0])
        r0, r1 = render_at(0.0), render_at(1.0)
        mse = lambda a, b: float(np.mean((a - b) ** 2))
        assert mse(r0, gt0) < mse(r0, gt1), "t=0 render should match t=0 GT"
        assert mse(r1, gt1) < mse(r1, gt0), "t=1 render should match t=1 GT"
        # absolute bound is loose: 12 views cover the whole time axis, so
        # each time slot sees ~1.5 views (time discrimination above is the
        # real assertion; this guards against collapse to the mean)
        assert mse(r0, gt0) < 0.04 and mse(r1, gt1) < 0.04
