"""VM-factorized field family (train/voxel_vm.py): collapse correctness,
convergence through the shear-warp renderer, c2f upsample, CLI e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.core.camera import rand_poses
from focnerf_tpu.render.baked import BakedVolume, render_baked
from focnerf_tpu.train.voxel_vm import (
    VMField,
    collapse_vm,
    fit_vm_voxels,
    init_vm_field,
    load_vm_field,
    save_vm_field,
    upsample_vm,
    vm_field_to_volume,
    vm_tv_loss,
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


class TestVMField:
    def test_collapse_matches_naive(self):
        """The three-einsum collapse must equal the per-voxel sum-of-products
        definition (the docstring formula), checked on a tiny field."""
        f = init_vm_field(4, rank=3, rng=jax.random.key(1))
        raw = np.asarray(collapse_vm(f))
        P = np.asarray(f.planes)
        V = np.asarray(f.vectors)
        b = np.asarray(f.bias)
        R, K, C = 4, 3, 4
        want = np.zeros((R, R, R, C), np.float32)
        for x in range(R):
            for y in range(R):
                for z in range(R):
                    for c in range(C):
                        s = b[c]
                        for k in range(K):
                            s += P[0, y, z, k, c] * V[0, x, k, c]
                            s += P[1, x, z, k, c] * V[1, y, k, c]
                            s += P[2, x, y, k, c] * V[2, z, k, c]
                        want[x, y, z, c] = s
        np.testing.assert_allclose(raw, want, rtol=1e-5, atol=1e-6)

    def test_init_nearly_transparent(self):
        vol = vm_field_to_volume(init_vm_field(16, rank=8), 1.0)
        # factor products are small, sigma bias -3: softplus(~-3) ~ 0.05
        assert float(jnp.mean(vol.rgba[..., -1])) < 0.1
        assert vol.rgba.shape == (16, 16, 16, 4)

    def test_sh_payload_dims(self):
        f = init_vm_field(8, rank=4, sh_degree=2)
        assert f.planes.shape[-1] == 3 * 4 + 1
        vol = vm_field_to_volume(f, 1.0, sh_degree=2)
        assert vol.sh_deg == 2

    def test_tv_zero_on_constant(self):
        f = VMField(
            planes=jnp.ones((3, 4, 4, 2, 4)),
            vectors=jnp.ones((3, 4, 2, 4)),
            bias=jnp.zeros((4,)),
        )
        assert float(vm_tv_loss(f)) == 0.0

    def test_upsample_preserves_field(self):
        """Raw collapse of the upsampled factors must approximate the
        trilinear upsample of the collapsed raw field (factorwise bilinear
        interp commutes with the sum-of-products up to interp error)."""
        f = init_vm_field(8, rank=4, rng=jax.random.key(2))
        coarse = collapse_vm(f)
        fine = collapse_vm(upsample_vm(f, 16))
        # compare at co-located coarse centers: fine grid points 2i..2i+1
        # average back to the coarse cell
        pooled = fine.reshape(8, 2, 8, 2, 8, 2, 4).mean(axis=(1, 3, 5))
        err = float(jnp.max(jnp.abs(pooled - coarse)))
        scale = float(jnp.max(jnp.abs(coarse)))
        assert err < 0.35 * scale, (err, scale)

    def test_save_load_roundtrip(self, tmp_path):
        f = init_vm_field(8, rank=4, rng=jax.random.key(3))
        p = str(tmp_path / "vm.npz")
        save_vm_field(p, f, 1.5, 0)
        g, bound, sh = load_vm_field(p)
        assert bound == 1.5 and sh == 0
        np.testing.assert_allclose(
            np.asarray(g.planes), np.asarray(f.planes, np.float16), atol=1e-3
        )


class TestFitVM:
    def test_overfits_sphere_scene(self):
        """Rank-16 factors must reconstruct the red/blue sphere well enough
        to generalize to a held-out view (same gate as the dense family,
        tests/test_voxel_train.py)."""
        gt_vol = _gt_volume()
        H = W = 48
        intr = (57.6, 57.6, 24.0, 24.0)
        poses = np.asarray(rand_poses(np.random.default_rng(0), 14, radius=2.5))
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, W)[0]) for p in poses]
        )
        vol, info = fit_vm_voxels(
            poses[:12], imgs[:12], intr, resolution=32, rank=16, iters=150,
            lr=5e-2, tv_weight=1e-5,
        )
        assert info["psnr"] > 18.0, info
        held = np.asarray(render_baked(vol, poses[13], intr, H, W)[0])
        mse = float(np.mean((held - imgs[13]) ** 2))
        psnr = -10 * np.log10(mse)
        assert psnr > 18.0, f"held-out {psnr:.2f} dB"

    def test_param_count_shrinks(self):
        """The factorization must match its R/(3K) accounting: ~0.38x the
        dense grid at R=64/K=8, ~0.19x at R=256/K=16 (planes dominate at
        3*R^2*K*C)."""
        f = init_vm_field(64, rank=8)
        n_vm = f.planes.size + f.vectors.size + f.bias.size
        assert n_vm < 0.4 * (64**3 * 4), n_vm
        n_prod = 3 * 256**2 * 16 * 4 + 3 * 256 * 16 * 4 + 4
        assert n_prod < 0.2 * (256**3 * 4), n_prod


class TestVMC2F:
    @pytest.mark.slow
    def test_c2f_stages_improve(self):
        """The coarse-to-fine ladder must end at the full resolution and
        produce a usable reconstruction."""
        from focnerf_tpu.train.voxel_vm import fit_vm_c2f

        gt_vol = _gt_volume()
        H = W = 32
        intr = (38.4, 38.4, 16.0, 16.0)
        poses = np.asarray(rand_poses(np.random.default_rng(1), 8, radius=2.5))
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, W)[0]) for p in poses]
        )
        vol, info = fit_vm_c2f(
            poses, imgs, intr, resolution=32, stages=2, rank=8, iters=80,
            lr=5e-2, tv_weight=1e-5,
        )
        assert vol.rgba.shape[0] == 32
        assert len(info["stage_psnrs"]) == 2
        assert info["psnr"] > 14.0, info


class TestVMDP:
    def test_dp_matches_single_device(self):
        """8-way pose-parallel VM step == the same batch on one device
        (mirrors tests/test_voxel_train.py::TestVoxelDP for the factors)."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.mesh import make_mesh
        from focnerf_tpu.render.baked import warp_gt_to_intermediate, render_baked
        from focnerf_tpu.train.voxel import _pose_variant
        from focnerf_tpu.train.voxel_vm import make_vm_dp_step

        gt_vol = _gt_volume()
        H = W = 32
        intr = (38.4, 38.4, 16.0, 16.0)
        all_poses = np.asarray(rand_poses(np.random.default_rng(3), 64, radius=2.5))
        key0 = _pose_variant(all_poses[0], 1.0)
        poses = np.stack(
            [p for p in all_poses if _pose_variant(p, 1.0) == key0]
        )[:8]
        assert len(poses) == 8
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
        field0 = init_vm_field(16, rank=4, rng=jax.random.key(0))

        def run(n):
            optimizer, step = make_vm_dp_step(
                make_mesh(n), intr, H=H, W=W, resolution=16,
                warp_axis=key0[0], flip=key0[1], tv_weight=1e-4,
            )
            return step(
                field0, optimizer.init(field0), jnp.asarray(poses), gts, masks
            )

        f8, _, mse8 = run(8)
        f1, _, mse1 = run(1)
        np.testing.assert_allclose(float(mse8), float(mse1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(f8.planes), np.asarray(f1.planes), atol=1e-5
        )


class TestVMCli:
    @pytest.mark.slow
    def test_main_voxel_vm_e2e(self, tmp_path):
        from helpers import make_synthetic_scene

        from focnerf_tpu.apps import main_voxel

        synthetic_scene = make_synthetic_scene(
            str(tmp_path / "scene"), n_train=4, n_val=1, H=24, W=24
        )
        ws = str(tmp_path / "ws_vm")
        main_voxel.main(
            [
                synthetic_scene,
                "--workspace", ws,
                "--iters", "12",
                "--bake_res", "16",
                "--voxel_vm", "4",
                "--scale", "1.0",
                "--bound", "1.0",
            ]
        )
        import os

        assert os.path.exists(os.path.join(ws, "baked_16_sh0.npz"))
        assert os.path.exists(os.path.join(ws, "vmfield_16_r4.npz"))

        # second invocation warm-starts from the saved factors (resume flow)
        main_voxel.main(
            [
                synthetic_scene,
                "--workspace", ws,
                "--iters", "4",
                "--bake_res", "16",
                "--voxel_vm", "4",
                "--scale", "1.0",
                "--bound", "1.0",
            ]
        )

        # warm-starting with a different payload layout must be refused, not
        # silently misinterpreted (saved sh0 checkpoint vs --bake_sh 1)
        with pytest.raises(ValueError, match="sh_degree"):
            main_voxel.main(
                [
                    synthetic_scene,
                    "--workspace", ws,
                    "--iters", "4",
                    "--bake_res", "16",
                    "--voxel_vm", "4",
                    "--bake_sh", "1",
                    "--scale", "1.0",
                    "--bound", "1.0",
                ]
            )

        # --voxel_supervise screen is dense-family-only: refuse, don't ignore
        with pytest.raises(ValueError, match="voxel_supervise"):
            main_voxel.main(
                [
                    synthetic_scene,
                    "--workspace", str(tmp_path / "ws_vm2"),
                    "--iters", "4",
                    "--bake_res", "16",
                    "--voxel_vm", "4",
                    "--voxel_supervise", "screen",
                    "--scale", "1.0",
                    "--bound", "1.0",
                ]
            )
