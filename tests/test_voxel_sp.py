"""Slice-axis model parallelism for the voxel family (parallel/voxel_sp.py):
the 8-way slice-sharded step must match the unsharded step exactly, and the
sharding must actually distribute the field/grad/adam state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.core.camera import rand_poses
from focnerf_tpu.render.baked import (
    BakedVolume,
    render_baked,
    warp_gt_to_intermediate,
)
from focnerf_tpu.train.voxel import (
    _pose_variant,
    init_voxel_field,
    make_voxel_dp_step,
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


def _setup(R=16, H=32, n=6, seed=3):
    gt_vol = _gt_volume()
    intr = (1.2 * H, 1.2 * H, H / 2.0, H / 2.0)
    all_poses = np.asarray(rand_poses(np.random.default_rng(seed), 64, radius=2.5))
    key0 = _pose_variant(all_poses[0], 1.0)
    poses = np.stack([p for p in all_poses if _pose_variant(p, 1.0) == key0])[:n]
    imgs = [render_baked(gt_vol, p, intr, H, H)[0] for p in poses]
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
    return key0, poses, gts, masks, intr, H


class TestVoxelSP:
    def test_sp_matches_unsharded(self):
        """One 8-way slice-sharded step == the single-device step (same pose,
        same init, same adam) — the associative partial combine and the
        halo'd TV must reproduce the monolithic fold exactly."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.mesh import make_mesh
        from focnerf_tpu.parallel.voxel_sp import make_voxel_sp_step

        R = 16
        key0, poses, gts, masks, intr, H = _setup(R=R)
        (axis, flip) = key0
        raw0 = init_voxel_field(R, rng=jax.random.key(0))

        mesh8 = make_mesh(8)
        opt_sp, step_sp, shard_fn = make_voxel_sp_step(
            mesh8, intr, resolution=R, warp_axis=axis, flip=flip,
            tv_weight=1e-4, block=2,
        )
        raw_sp = shard_fn(raw0)
        st_sp = shard_fn(opt_sp.init(raw_sp))
        raw_sp, st_sp, mse_sp = step_sp(
            raw_sp, st_sp, jnp.asarray(poses[0]), gts[0], masks[0]
        )

        mesh1 = make_mesh(1)
        opt_dp, step_dp = make_voxel_dp_step(
            mesh1, intr, H=H, W=H, resolution=R, warp_axis=axis, flip=flip,
            tv_weight=1e-4,
        )
        raw_dp, _, mse_dp = step_dp(
            raw0, opt_dp.init(raw0), jnp.asarray(poses[:1]), gts[:1], masks[:1]
        )

        np.testing.assert_allclose(float(mse_sp), float(mse_dp), rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(raw_sp), np.asarray(raw_dp), atol=2e-5
        )

    def test_sp_state_is_sharded(self):
        """Field and adam moments must actually live sharded on the mesh."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.mesh import make_mesh
        from focnerf_tpu.parallel.voxel_sp import make_voxel_sp_step

        R = 16
        key0, poses, gts, masks, intr, H = _setup(R=R)
        mesh8 = make_mesh(8)
        opt, step, shard_fn = make_voxel_sp_step(
            mesh8, intr, resolution=R, warp_axis=key0[0], flip=key0[1], block=2,
        )
        raw = shard_fn(init_voxel_field(R, rng=jax.random.key(0)))
        st = shard_fn(opt.init(raw))
        raw, st, _ = step(raw, st, jnp.asarray(poses[0]), gts[0], masks[0])

        def n_shards(x):
            return len({s.device for s in x.addressable_shards})

        assert n_shards(raw) == 8
        mu = jax.tree.leaves(st)
        assert any(getattr(m, "ndim", 0) == 4 and n_shards(m) == 8 for m in mu)

    def test_sp_converges(self):
        """A short slice-sharded fit must reduce the photometric error."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.mesh import make_mesh
        from focnerf_tpu.parallel.voxel_sp import make_voxel_sp_step

        R = 16
        key0, poses, gts, masks, intr, H = _setup(R=R)
        mesh8 = make_mesh(8)
        opt, step, shard_fn = make_voxel_sp_step(
            mesh8, intr, resolution=R, warp_axis=key0[0], flip=key0[1],
            lr=0.1, tv_weight=1e-5, block=2,
        )
        raw = shard_fn(init_voxel_field(R, rng=jax.random.key(0)))
        st = shard_fn(opt.init(raw))
        first = last = None
        for it in range(25):
            v = it % len(poses)
            raw, st, mse = step(raw, st, jnp.asarray(poses[v]), gts[v], masks[v])
            if first is None:
                first = float(mse)
            last = float(mse)
        assert last < 0.5 * first, (first, last)


class TestVoxelSPSH:
    def test_sp_sh_matches_unsharded(self):
        """SH payload: sharded composite + post-combine basis contraction
        must match the unsharded step (which contracts inside
        _composite_core) exactly."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.mesh import make_mesh
        from focnerf_tpu.parallel.voxel_sp import make_voxel_sp_step

        R, sh = 16, 2
        key0, poses, gts, masks, intr, H = _setup(R=R)
        (axis, flip) = key0
        raw0 = init_voxel_field(R, sh_degree=sh, rng=jax.random.key(0))
        # non-trivial SH coefficients so the contraction actually matters
        raw0 = raw0 + 0.05 * jax.random.normal(jax.random.key(1), raw0.shape)

        mesh8 = make_mesh(8)
        opt_sp, step_sp, shard_fn = make_voxel_sp_step(
            mesh8, intr, resolution=R, warp_axis=axis, flip=flip,
            sh_degree=sh, tv_weight=1e-4, block=2,
        )
        raw_sp = shard_fn(raw0)
        st_sp = shard_fn(opt_sp.init(raw_sp))
        raw_sp, st_sp, mse_sp = step_sp(
            raw_sp, st_sp, jnp.asarray(poses[0]), gts[0], masks[0]
        )

        mesh1 = make_mesh(1)
        opt_dp, step_dp = make_voxel_dp_step(
            mesh1, intr, H=H, W=H, resolution=R, warp_axis=axis, flip=flip,
            sh_degree=sh, tv_weight=1e-4,
        )
        raw_dp, _, mse_dp = step_dp(
            raw0, opt_dp.init(raw0), jnp.asarray(poses[:1]), gts[:1],
            masks[:1],
        )
        np.testing.assert_allclose(float(mse_sp), float(mse_dp), rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(raw_sp), np.asarray(raw_dp), atol=2e-5
        )


class TestFitVoxelsSP:
    def test_fit_handles_mixed_variants(self):
        """The product entry (fit_voxels_sp) must train across pose-variant
        groups — re-sharding the field/adam state when the warp axis
        changes — and reconstruct the scene on a held-out view."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.voxel_sp import fit_voxels_sp

        gt_vol = _gt_volume()
        H = 32
        intr = (1.2 * H, 1.2 * H, H / 2.0, H / 2.0)
        # unrestricted poses -> multiple (axis, flip) variants
        poses = np.asarray(rand_poses(np.random.default_rng(0), 14, radius=2.5))
        variants = {_pose_variant(p, 1.0) for p in poses[:12]}
        assert len(variants) > 1, "scene must exercise >1 variant group"
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, H)[0]) for p in poses]
        )
        vol, info = fit_voxels_sp(
            poses[:12], imgs[:12], intr, resolution=16, iters=120,
            lr=0.1, tv_weight=1e-5, block=2, group_chunk=20,
        )
        assert info["n_devices"] == 8
        assert info["psnr"] > 16.0, info
        held = np.asarray(render_baked(vol, poses[13], intr, H, H)[0])
        mse = float(np.mean((held - imgs[13]) ** 2))
        psnr = -10 * np.log10(mse)
        assert psnr > 16.0, f"held-out {psnr:.2f} dB"

    def test_c2f_fit_sharded(self):
        """Coarse-to-fine SP: stages re-shard the upsampled field and the
        final stage trains at full resolution on the mesh."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.voxel_sp import fit_voxels_sp_c2f

        gt_vol = _gt_volume()
        H = 32
        intr = (1.2 * H, 1.2 * H, H / 2.0, H / 2.0)
        poses = np.asarray(rand_poses(np.random.default_rng(0), 12, radius=2.5))
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, H)[0]) for p in poses]
        )
        vol, info = fit_voxels_sp_c2f(
            poses[:10], imgs[:10], intr, resolution=32, stages=2, iters=100,
            lr=0.1, tv_weight=1e-5, block=2, group_chunk=20,
        )
        assert vol.rgba.shape[0] == 32
        assert len(info["stage_psnrs"]) == 2
        assert info["n_devices"] == 8
        held = np.asarray(render_baked(vol, poses[11], intr, H, H)[0])
        mse = float(np.mean((held - imgs[11]) ** 2))
        assert -10 * np.log10(mse) > 15, mse

    def test_cli_rejects_incompatible_flags(self, tmp_path):
        from focnerf_tpu.apps import main_voxel

        # vm/dynamic replicate their factorized params -> DP, not SP
        # (K-planes + SP is allowed since the collapse-sharded step landed)
        with pytest.raises(ValueError, match="DP step"):
            main_voxel.main(
                ["scene", "--workspace", str(tmp_path / "w"),
                 "--voxel_sp", "--voxel_vm", "4"]
            )
        with pytest.raises(ValueError, match="DP step"):
            main_voxel.main(
                ["scene", "--workspace", str(tmp_path / "w"),
                 "--voxel_sp", "--voxel_dynamic"]
            )
        with pytest.raises(ValueError, match="intermediate"):
            main_voxel.main(
                ["scene", "--workspace", str(tmp_path / "w"),
                 "--voxel_sp", "--voxel_supervise", "screen"]
            )


class TestHybridDPSP:
    def test_dp_sp_matches_pose_parallel(self):
        """One step on the 2x4 (data x slice) mesh == the pose-parallel DP
        step on the same 2-pose batch: the slice sharding and the
        data-axis gradient mean must compose without interaction."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from jax.sharding import Mesh

        from focnerf_tpu.parallel.mesh import make_mesh
        from focnerf_tpu.parallel.voxel_sp import make_voxel_dp_sp_step

        R = 16
        key0, poses, gts, masks, intr, H = _setup(R=R)
        (axis, flip) = key0
        raw0 = init_voxel_field(R, rng=jax.random.key(0))

        mesh2d = Mesh(
            np.array(jax.devices()[:8]).reshape(2, 4), ("data", "slice")
        )
        opt_h, step_h, shard_fn = make_voxel_dp_sp_step(
            mesh2d, resolution=R, warp_axis=axis, flip=flip,
            tv_weight=1e-4, block=2,
        )
        raw_h = shard_fn(raw0)
        st_h = shard_fn(opt_h.init(raw_h))
        raw_h, st_h, mse_h = step_h(
            raw_h, st_h, jnp.asarray(poses[:2]), gts[:2], masks[:2]
        )
        # the field must actually be sharded 4 ways along the slice axis
        # (each shard replicated twice over the data axis)
        assert len({s.device for s in raw_h.addressable_shards}) == 8

        mesh1 = make_mesh(2)
        opt_dp, step_dp = make_voxel_dp_step(
            mesh1, intr, H=H, W=H, resolution=R, warp_axis=axis, flip=flip,
            tv_weight=1e-4,
        )
        raw_dp, _, mse_dp = step_dp(
            raw0, opt_dp.init(raw0), jnp.asarray(poses[:2]), gts[:2], masks[:2]
        )

        np.testing.assert_allclose(float(mse_h), float(mse_dp), rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(raw_h), np.asarray(raw_dp), atol=3e-5
        )

    def test_fit_voxels_dp_sp_and_cli(self, tmp_path):
        """Product entry for the hybrid: library fit converges and the CLI
        flag (--voxel_sp --voxel_dp 2) trains end-to-end on the 2x4 mesh."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        import os
        import sys

        from focnerf_tpu.parallel.voxel_sp import fit_voxels_dp_sp

        gt_vol = _gt_volume()
        H = 32
        intr = (1.2 * H, 1.2 * H, H / 2.0, H / 2.0)
        poses = np.asarray(rand_poses(np.random.default_rng(7), 10, radius=2.5))
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, H)[0]) for p in poses]
        )
        vol, info = fit_voxels_dp_sp(
            poses, imgs, intr, resolution=16, dp=2, iters=48, lr=0.1,
            tv_weight=1e-5, block=2,
        )
        assert info["mesh"] == {"data": 2, "slice": 4}
        assert np.isfinite(info["psnr"]) and info["psnr"] > 10.0

        sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
        from helpers import make_synthetic_scene

        from focnerf_tpu.apps.main_voxel import main as voxel_main

        scene = make_synthetic_scene(str(tmp_path / "scene"))
        ws = str(tmp_path / "dpspws")
        voxel_main([
            scene, "--workspace", ws, "--iters", "24", "--bake_res", "16",
            "--voxel_sp", "--voxel_dp", "2", "--scale", "1.0", "--bound", "1.0",
        ])
        assert os.path.exists(os.path.join(ws, "baked_16_sh0.npz"))
