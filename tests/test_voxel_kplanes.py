"""K-planes dynamic family (train/voxel_kplanes.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.core.camera import rand_poses
from focnerf_tpu.render.baked import BakedVolume, render_baked
from focnerf_tpu.train.voxel_kplanes import (
    KPlanesField,
    collapse_kplanes,
    fit_kplanes,
    init_kplanes_field,
    kplanes_field_to_volume,
    kplanes_time_smoothness,
    kplanes_tv_loss,
    load_kplanes_field,
    save_kplanes_field,
)


def _moving_sphere_volume(t: float, R: int = 32) -> BakedVolume:
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


class TestKPlanesField:
    def test_collapse_matches_naive(self):
        """The scan-accumulated collapse must equal the direct six-plane
        product summed over rank."""
        f = init_kplanes_field(8, rank=3, time_res=4, rng=jax.random.key(0))
        t = 0.37
        g = collapse_kplanes(f, t)

        # naive reference: interpolate time planes by hand, full product
        T = f.time.shape[2]
        x = t * (T - 1)
        i0 = int(np.floor(x))
        fr = x - i0
        v = (1 - fr) * f.time[:, :, i0] + fr * f.time[:, :, i0 + 1]
        ref = jnp.zeros_like(g)
        for k in range(3):
            A = f.space[0, :, :, k] * v[0][:, None, k] * v[1][None, :, k]
            B = f.space[1, :, :, k] * v[2][None, :, k]
            C = f.space[2, :, :, k]
            ref = ref + A[:, :, None] * B[:, None, :] * C[None]
        ref = f.w * ref + f.b
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref), atol=1e-5)

    def test_init_is_static_and_transparent(self):
        f = init_kplanes_field(8, rank=4, time_res=4, rng=jax.random.key(1))
        r0 = collapse_kplanes(f, 0.0)
        r1 = collapse_kplanes(f, 1.0)
        # statistically static start (both times see the same planes stats)
        assert abs(float(jnp.mean(r0[..., -1])) - float(jnp.mean(r1[..., -1]))) < 0.5
        vol = kplanes_field_to_volume(f, 0.0, 1.0)
        # near-transparent start like the other families
        assert float(jnp.mean(vol.rgba[..., -1])) < 0.2

    def test_regularizers_zero_on_constant(self):
        f = KPlanesField(
            space=jnp.ones((3, 4, 4, 2, 4)),
            time=jnp.ones((3, 4, 4, 2, 4)),
            w=jnp.ones((4,)),
            b=jnp.zeros((4,)),
        )
        assert float(kplanes_tv_loss(f)) == 0.0
        assert float(kplanes_time_smoothness(f)) == 0.0

    def test_save_load_roundtrip(self, tmp_path):
        f = init_kplanes_field(8, rank=2, time_res=4, rng=jax.random.key(0))
        p = str(tmp_path / "kp.npz")
        save_kplanes_field(p, f, bound=1.5, sh_degree=0)
        f2, bound, sh = load_kplanes_field(p)
        assert bound == 1.5 and sh == 0
        np.testing.assert_allclose(np.asarray(f2.w), np.asarray(f.w), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(f2.space), np.asarray(f.space), atol=1e-2
        )  # f16 storage

    def test_param_count_is_planar(self):
        """Parameters must scale as R^2 (planes), not R^3 (dense deltas)."""
        C = 4
        for R, K, T in ((64, 8, 16), (256, 8, 16)):
            f = init_kplanes_field(R, rank=K, time_res=T)
            n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(f))
            expect = 3 * R * R * K * C + 3 * R * T * K * C + 2 * C
            assert n == expect
        # at production resolution the planes are ~10x below ONE dense grid
        # (the low-rank dynamic family would need 1 + rank dense grids)
        assert n < 256**3 * C / 10


class TestFitKPlanes:
    def test_learns_moving_sphere(self):
        """Shared spatial planes + time modulation must track the sphere:
        renders at t=0/1 match their OWN ground truth better than the
        other's (same protocol as the low-rank dynamic family)."""
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
        field, info = fit_kplanes(
            poses, imgs, ts, intr, resolution=32, rank=4, time_res=8,
            iters=300, lr=0.03, tv_weight=1e-5, time_smooth_weight=1e-4,
        )
        assert info["psnr"] > 16.0, info

        test_pose = np.asarray(
            rand_poses(np.random.default_rng(99), 1, radius=2.5)
        )[0]

        def render_at(t):
            vol = kplanes_field_to_volume(field, t, 1.0)
            return np.asarray(render_baked(vol, test_pose, intr, H, W)[0])

        gt0 = np.asarray(
            render_baked(_moving_sphere_volume(0.0), test_pose, intr, H, W)[0]
        )
        gt1 = np.asarray(
            render_baked(_moving_sphere_volume(1.0), test_pose, intr, H, W)[0]
        )
        r0, r1 = render_at(0.0), render_at(1.0)
        mse = lambda a, b: float(np.mean((a - b) ** 2))
        assert mse(r0, gt0) < mse(r0, gt1), "t=0 render should match t=0 GT"
        assert mse(r1, gt1) < mse(r1, gt0), "t=1 render should match t=1 GT"
        assert mse(r0, gt0) < 0.04 and mse(r1, gt1) < 0.04


class TestKPlanesStaging:
    def test_upsample_preserves_field(self):
        """2x spatial upsampling keeps the collapsed field's statistics
        (bilinear on planes ~ trilinear on the collapsed grid)."""
        from focnerf_tpu.train.voxel_kplanes import upsample_kplanes

        f = init_kplanes_field(8, rank=2, time_res=4, rng=jax.random.key(2))
        up = upsample_kplanes(f, 16)
        assert up.space.shape == (3, 16, 16, 2, 4)
        assert up.time.shape == (3, 16, 4, 2, 4)
        g8 = collapse_kplanes(f, 0.3)
        g16 = collapse_kplanes(up, 0.3)
        np.testing.assert_allclose(
            float(jnp.mean(g16)), float(jnp.mean(g8)), rtol=0.05
        )

    def test_c2f_fit(self):
        from focnerf_tpu.train.voxel_kplanes import fit_kplanes_c2f

        H = W = 32
        intr = (38.4, 38.4, 16.0, 16.0)
        poses = np.asarray(rand_poses(np.random.default_rng(7), 8, radius=2.5))
        ts = np.linspace(0.0, 1.0, 8)
        imgs = np.stack(
            [
                np.asarray(
                    render_baked(_moving_sphere_volume(float(t)), p, intr, H, W)[0]
                )
                for p, t in zip(poses, ts)
            ]
        )
        field, info = fit_kplanes_c2f(
            poses, imgs, ts, intr, resolution=32, stages=2, iters=120,
            rank=2, time_res=4, lr=0.03, tv_weight=1e-5,
        )
        assert field.space.shape[1] == 32
        assert len(info["stage_psnrs"]) == 2
        assert info["stage_psnrs"][-1] > info["stage_psnrs"][0] - 1.0

    def test_sh_payload_trains(self):
        """sh_degree > 0: the SH-payload K-planes field fits one step
        without shape errors and collapses to the right channel count."""
        from focnerf_tpu.train.voxel_kplanes import fit_kplanes

        H = W = 24
        intr = (28.8, 28.8, 12.0, 12.0)
        poses = np.asarray(rand_poses(np.random.default_rng(1), 4, radius=2.5))
        ts = np.linspace(0.0, 1.0, 4)
        imgs = np.stack(
            [
                np.asarray(
                    render_baked(_moving_sphere_volume(float(t), R=16), p, intr, H, W)[0]
                )
                for p, t in zip(poses, ts)
            ]
        )
        field, info = fit_kplanes(
            poses, imgs, ts, intr, resolution=16, rank=2, time_res=4,
            sh_degree=1, iters=10, lr=0.03,
        )
        assert field.space.shape[-1] == 3 * 1 + 1  # 3*deg^2 payload + sigma
        vol = kplanes_field_to_volume(field, 0.5, 1.0, sh_degree=1)
        assert vol.sh_deg == 1 and np.isfinite(float(info["psnr"]))


class TestKPlanesDP:
    def test_dp_matches_single_device(self):
        """8-way time-conditioned pose-parallel step == the same batch on
        one device (each device collapses at its own view's t)."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.mesh import make_mesh
        from focnerf_tpu.render.baked import (
            render_baked as _rb,
            warp_gt_to_intermediate,
        )
        from focnerf_tpu.train.voxel import _pose_variant
        from focnerf_tpu.train.voxel_kplanes import make_kplanes_dp_step

        H = W = 32
        intr = (38.4, 38.4, 16.0, 16.0)
        all_poses = np.asarray(rand_poses(np.random.default_rng(3), 64, radius=2.5))
        key0 = _pose_variant(all_poses[0], 1.0)
        poses = np.stack(
            [p for p in all_poses if _pose_variant(p, 1.0) == key0]
        )[:8]
        assert len(poses) == 8
        times = np.linspace(0.0, 1.0, 8).astype(np.float32)
        imgs = [
            _rb(_moving_sphere_volume(float(t), R=16), p, intr, H, W)[0]
            for p, t in zip(poses, times)
        ]
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
        field0 = init_kplanes_field(16, rank=2, time_res=4, rng=jax.random.key(0))

        def run(n):
            optimizer, step = make_kplanes_dp_step(
                make_mesh(n), intr, H=H, W=W, resolution=16,
                warp_axis=key0[0], flip=key0[1], tv_weight=1e-4,
            )
            return step(
                field0, optimizer.init(field0), jnp.asarray(poses),
                jnp.asarray(times), gts, masks,
            )

        f8, _, mse8 = run(8)
        f1, _, mse1 = run(1)
        np.testing.assert_allclose(float(mse8), float(mse1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(f8.space), np.asarray(f1.space), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(f8.time), np.asarray(f1.time), atol=1e-5
        )


class TestKPlanesCli:
    def test_family_flags_are_exclusive(self, tmp_path):
        from focnerf_tpu.apps import main_voxel

        with pytest.raises(ValueError, match="ONE family"):
            main_voxel.main(
                ["scene", "--workspace", str(tmp_path / "w"),
                 "--voxel_kplanes", "4", "--voxel_vm", "4"]
            )
