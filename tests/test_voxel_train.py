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
        gts = jnp.stack(
            [render_baked(gt_vol, p, intr, H, W)[0] for p in poses]
        )
        raw0 = init_voxel_field(16, rng=jax.random.key(0))

        mesh8 = make_mesh(8)
        optimizer, step8 = make_voxel_dp_step(
            mesh8, intr, H=H, W=W, resolution=16,
            warp_axis=key0[0], flip=key0[1], tv_weight=1e-4,
        )
        opt_state = optimizer.init(raw0)
        raw8, _, mse8 = step8(raw0, opt_state, jnp.asarray(poses), gts)

        mesh1 = make_mesh(1)
        optimizer1, step1 = make_voxel_dp_step(
            mesh1, intr, H=H, W=W, resolution=16,
            warp_axis=key0[0], flip=key0[1], tv_weight=1e-4,
        )
        raw1, _, mse1 = step1(raw0, optimizer1.init(raw0), jnp.asarray(poses), gts)

        np.testing.assert_allclose(float(mse8), float(mse1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(raw8), np.asarray(raw1), atol=1e-5
        )
