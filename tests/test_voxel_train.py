"""Dense voxel training through the differentiable shear-warp renderer."""

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.core.camera import rand_poses
from focnerf_tpu.render.baked import BakedVolume, render_baked
from focnerf_tpu.train.voxel import (
    field_to_volume,
    fit_voxels,
    init_voxel_field,
    tv_loss,
)


def _gt_volume(R=32):
    c = (jnp.arange(R) + 0.5) / R * 2 - 1
    X, Y, Z = jnp.meshgrid(c, c, c, indexing="ij")
    d = jnp.sqrt(X**2 + Y**2 + Z**2)
    sigma = jnp.where(d < 0.45, 30.0, 0.0)
    rgb = jnp.where(
        (Z > 0)[..., None], jnp.array([0.9, 0.15, 0.1]), jnp.array([0.1, 0.2, 0.9])
    )
    rgb = jnp.broadcast_to(rgb, (R, R, R, 3))
    return BakedVolume(rgba=jnp.concatenate([rgb, sigma[..., None]], -1), bound=1.0)


class TestVoxelField:
    def test_init_nearly_transparent(self):
        raw = init_voxel_field(8)
        vol = field_to_volume(raw, 1.0)
        assert float(vol.rgba[..., -1].max()) < 0.06  # softplus(-3)
        assert vol.rgba.shape == (8, 8, 8, 4)

    def test_sh_payload_dims(self):
        raw = init_voxel_field(8, sh_degree=2)
        assert raw.shape[-1] == 3 * 4 + 1
        vol = field_to_volume(raw, 1.0, sh_degree=2)
        assert vol.sh_deg == 2

    def test_tv_zero_on_constant(self):
        assert float(tv_loss(jnp.ones((4, 4, 4, 2)))) == 0.0


class TestFitVoxels:
    def test_overfits_sphere_scene(self):
        """Whole-image descent through the shear-warp must reconstruct the
        red/blue sphere well enough to generalize to a held-out view."""
        gt_vol = _gt_volume()
        H = W = 48
        intr = (57.6, 57.6, 24.0, 24.0)
        poses = np.asarray(rand_poses(np.random.default_rng(0), 14, radius=2.5))
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, W)[0]) for p in poses]
        )
        vol, info = fit_voxels(
            poses[:12], imgs[:12], intr, resolution=32, iters=120,
            lr=0.1, tv_weight=1e-5,
        )
        assert info["psnr"] > 18.0, info
        held = np.asarray(render_baked(vol, poses[13], intr, H, W)[0])
        mse = float(np.mean((held - imgs[13]) ** 2))
        psnr = -10 * np.log10(mse)
        assert psnr > 18.0, f"held-out {psnr:.2f} dB"

    def test_refines_baked_seed(self):
        """init_raw seeds continue improving (the hash-ckpt refinement flow)."""
        gt_vol = _gt_volume()
        H = W = 32
        intr = (38.4, 38.4, 16.0, 16.0)
        poses = np.asarray(rand_poses(np.random.default_rng(1), 6, radius=2.5))
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, W)[0]) for p in poses]
        )
        raw0 = init_voxel_field(16, rng=jax.random.key(0))
        _, info0 = fit_voxels(
            poses, imgs, intr, resolution=16, iters=20, lr=0.1, tv_weight=0.0,
        )
        _, info1 = fit_voxels(
            poses, imgs, intr, resolution=16, iters=60, lr=0.1, tv_weight=0.0,
            init_raw=raw0,
        )
        assert info1["psnr"] > info0["psnr"] - 1.0  # longer run at least as good


class TestBackwardSchedule:
    def test_opaque_surface_grads_finite(self):
        """Fully-opaque voxels (alpha == 1 exactly after exp underflow) must
        keep gradients finite — the cumprod transmittance VJP divides by
        (1 - alpha) and NaN'd here; the fold now runs in od/log space."""
        from focnerf_tpu.render.baked import _composite_core

        R = 8
        raw = init_voxel_field(R, rng=jax.random.key(0))
        # push a shell of voxels to sigma*dt >> 87 so exp underflows to 0
        raw = raw.at[2:6, 2:6, 2:6, -1].set(500.0)  # softplus(500) = 500

        def loss(raw):
            vol = field_to_volume(raw, 1.0)
            pose = jnp.eye(4).at[2, 3].set(2.5)
            C, T, _, _ = _composite_core(
                vol.rgba, 1.0, pose, axis=2, flip=False, ri=16,
                density_scale=1.0,
            )
            return jnp.mean((C + T[..., None] - 0.5) ** 2)

        g = jax.grad(loss)(raw)
        assert bool(jnp.isfinite(g).all()), "opaque-surface grads must be finite"

    def test_remat_grads_match(self):
        """jax.checkpoint over the block fold recomputes the same math —
        gradients must match the residual-saving schedule to float tolerance."""
        from focnerf_tpu.render.baked import _render_core

        gt_vol = _gt_volume(16)
        H = W = 24
        intr = (28.8, 28.8, 12.0, 12.0)
        pose = np.asarray(rand_poses(np.random.default_rng(5), 1, radius=2.5))[0]
        raw = init_voxel_field(16, rng=jax.random.key(2))
        gt = render_baked(gt_vol, pose, intr, H, W)[0]

        def loss(raw, remat):
            vol = field_to_volume(raw, 1.0)
            img, _, _ = _render_core(
                vol.rgba, 1.0, jnp.asarray(pose), jnp.asarray(intr, jnp.float32),
                axis=2, flip=bool(pose[2, 3] < 0), H=H, W=W, ri=16,
                bg_color=1.0, density_scale=1.0, remat=remat,
            )
            return jnp.mean((img - gt) ** 2)

        g0 = jax.grad(lambda r: loss(r, False))(raw)
        g1 = jax.grad(lambda r: loss(r, True))(raw)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)

    def test_fit_converges_at_ri1(self):
        """intermediate_scale=1 (the fast training schedule) still fits."""
        gt_vol = _gt_volume()
        H = W = 32
        intr = (38.4, 38.4, 16.0, 16.0)
        poses = np.asarray(rand_poses(np.random.default_rng(6), 8, radius=2.5))
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, W)[0]) for p in poses]
        )
        _, info = fit_voxels(
            poses, imgs, intr, resolution=32, iters=80, lr=0.1,
            tv_weight=1e-5, intermediate_scale=1, remat=True,
        )
        assert info["psnr"] > 16.0, info


class TestSHTraining:
    def test_fit_sh2_intermediate(self):
        """SH-degree-2 fields train through intermediate supervision (the
        compositor contracts SH before the loss, so view-dependent payloads
        ride the same fast path)."""
        gt_vol = _gt_volume()
        H = W = 32
        intr = (38.4, 38.4, 16.0, 16.0)
        poses = np.asarray(rand_poses(np.random.default_rng(9), 8, radius=2.5))
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, W)[0]) for p in poses]
        )
        vol, info = fit_voxels(
            poses, imgs, intr, resolution=16, sh_degree=2, iters=60,
            lr=0.1, tv_weight=1e-5,
        )
        assert vol.sh_deg == 2 and vol.rgba.shape[-1] == 13
        assert info["psnr"] > 14.0, info


class TestCoarseToFine:
    def test_upsample_preserves_activated_field(self):
        from focnerf_tpu.train.voxel import upsample_field

        raw = init_voxel_field(8, rng=jax.random.key(1))
        up = upsample_field(raw, 16)
        assert up.shape == (16, 16, 16, 4)
        # voxel-center agreement: 2x trilinear keeps the coarse lattice
        # values representable (spot-check overall stats, not exactness)
        np.testing.assert_allclose(
            float(jnp.mean(up)), float(jnp.mean(raw)), atol=1e-3
        )

    def test_volume_to_raw_roundtrip(self):
        from focnerf_tpu.train.voxel import _volume_to_raw

        raw = init_voxel_field(8, rng=jax.random.key(3))
        vol = field_to_volume(raw, 1.0)
        raw2 = _volume_to_raw(vol)
        vol2 = field_to_volume(raw2, 1.0)
        np.testing.assert_allclose(
            np.asarray(vol2.rgba), np.asarray(vol.rgba), atol=1e-4
        )

    def test_stage_plan_tiny_iters(self):
        """Budgets smaller than the stage count still train every stage
        (regression: the final stage used to get a NEGATIVE count)."""
        from focnerf_tpu.train.voxel import _c2f_stage_plan

        plan = _c2f_stage_plan(64, 3, 1)
        assert [r for r, _ in plan] == [16, 32, 64]
        assert all(n >= 1 for _, n in plan)
        # normal budgets split exactly with the remainder on the last stage
        plan = _c2f_stage_plan(64, 3, 301)
        assert sum(n for _, n in plan) == 301
        assert plan[-1][0] == 64

    def test_c2f_fit(self):
        from focnerf_tpu.train.voxel import fit_voxels_c2f

        gt_vol = _gt_volume()
        H = W = 32
        intr = (38.4, 38.4, 16.0, 16.0)
        poses = np.asarray(rand_poses(np.random.default_rng(7), 8, radius=2.5))
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, W)[0]) for p in poses]
        )
        vol, info = fit_voxels_c2f(
            poses, imgs, intr, resolution=32, stages=2, iters=80,
            lr=0.1, tv_weight=1e-5,
        )
        assert vol.rgba.shape[0] == 32
        assert len(info["stage_psnrs"]) == 2
        # fine stage must not regress below its coarse init's quality
        assert info["stage_psnrs"][-1] > info["stage_psnrs"][0] - 1.0


class TestVoxelDP:
    def test_dp_matches_single_device(self):
        """8-way pose-parallel step == the same batch on one device."""
        import pytest

        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.mesh import make_mesh
        from focnerf_tpu.train.voxel import make_voxel_dp_step, _pose_variant

        gt_vol = _gt_volume()
        H = W = 32
        intr = (38.4, 38.4, 16.0, 16.0)
        all_poses = np.asarray(rand_poses(np.random.default_rng(3), 64, radius=2.5))
        key0 = _pose_variant(all_poses[0], 1.0)
        poses = np.stack(
            [p for p in all_poses if _pose_variant(p, 1.0) == key0]
        )[:8]
        assert len(poses) == 8
        from focnerf_tpu.render.baked import warp_gt_to_intermediate

        imgs = [render_baked(gt_vol, p, intr, H, W)[0] for p in poses]
        ri = 16 * 2
        warped = [
            warp_gt_to_intermediate(
                img, p, jnp.asarray(intr, jnp.float32), 1.0,
                axis=key0[0], flip=key0[1], ri=ri,
            )
            for img, p in zip(imgs, poses)
        ]
        gts = jnp.stack([w for w, _ in warped])
        masks = jnp.stack([m for _, m in warped])
        raw0 = init_voxel_field(16, rng=jax.random.key(0))

        mesh8 = make_mesh(8)
        optimizer, step8 = make_voxel_dp_step(
            mesh8, intr, H=H, W=W, resolution=16,
            warp_axis=key0[0], flip=key0[1], tv_weight=1e-4,
        )
        opt_state = optimizer.init(raw0)
        raw8, _, mse8 = step8(raw0, opt_state, jnp.asarray(poses), gts, masks)

        mesh1 = make_mesh(1)
        optimizer1, step1 = make_voxel_dp_step(
            mesh1, intr, H=H, W=W, resolution=16,
            warp_axis=key0[0], flip=key0[1], tv_weight=1e-4,
        )
        raw1, _, mse1 = step1(
            raw0, optimizer1.init(raw0), jnp.asarray(poses), gts, masks
        )

        np.testing.assert_allclose(float(mse8), float(mse1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(raw8), np.asarray(raw1), atol=1e-5
        )
