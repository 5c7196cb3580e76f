"""Golden-value tests for camera / ray / geometry math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.core.camera import nerf_matrix_to_ngp, rand_poses
from focnerf_tpu.core.geometry import (
    MISS_T,
    morton3d,
    morton3d_invert,
    near_far_from_aabb,
    sph_from_ray,
)
from focnerf_tpu.core.rays import get_rays, sample_ray_indices


class TestNerfMatrixToNgp:
    def test_hand_value(self):
        pose = np.arange(16, dtype=np.float32).reshape(4, 4)
        out = nerf_matrix_to_ngp(pose, scale=0.5, offset=[1, 2, 3])
        expected = np.array(
            [
                [4, -5, -6, 7 * 0.5 + 1],
                [8, -9, -10, 11 * 0.5 + 2],
                [0, -1, -2, 3 * 0.5 + 3],
                [0, 0, 0, 1],
            ],
            dtype=np.float32,
        )
        np.testing.assert_allclose(out, expected)

    def test_rotation_stays_orthonormal(self):
        rng = np.random.default_rng(0)
        poses = rand_poses(rng, 4, radius=2.0)
        for p in poses:
            ngp = nerf_matrix_to_ngp(p)
            R = ngp[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


class TestRandPoses:
    def test_look_at_origin(self):
        rng = np.random.default_rng(1)
        poses = rand_poses(rng, 8, radius=3.0)
        centers = poses[:, :3, 3]
        np.testing.assert_allclose(np.linalg.norm(centers, axis=-1), 3.0, rtol=1e-5)
        # forward axis (3rd col) points from the camera TOWARD the origin
        # (+z-forward ray convention of core/rays.py)
        fwd = poses[:, :3, 2]
        cos = np.sum(fwd * centers / 3.0, axis=-1)
        np.testing.assert_allclose(cos, -1.0, atol=1e-5)
        for p in poses:
            R = p[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)


class TestGetRays:
    def test_center_pixel_identity_pose(self):
        H = W = 4
        fx = fy = 10.0
        pose = jnp.eye(4)
        rays = get_rays(pose, (fx, fy, W / 2, H / 2), H, W)
        assert rays["rays_o"].shape == (16, 3)
        np.testing.assert_allclose(np.asarray(rays["rays_o"]), 0.0)
        # pixel (row=1, col=1): i=1.5, j=1.5 -> dir ((1.5-2)/10, (1.5-2)/10, 1) normalized
        d = np.array([-0.05, -0.05, 1.0])
        d /= np.linalg.norm(d)
        np.testing.assert_allclose(np.asarray(rays["rays_d"][1 * W + 1]), d, rtol=1e-6)

    def test_pose_rotation_applied(self):
        H = W = 2
        # 90 deg rotation around y: +z -> +x
        pose = jnp.array(
            [[0, 0, 1, 5], [0, 1, 0, 6], [-1, 0, 0, 7], [0, 0, 0, 1]], dtype=jnp.float32
        )
        rays = get_rays(pose, (100.0, 100.0, 1.0, 1.0), H, W)
        np.testing.assert_allclose(np.asarray(rays["rays_o"][0]), [5, 6, 7])
        # central dirs are ~(0,0,1) in cam space -> ~(1,0,0) world
        d = np.asarray(rays["rays_d"]).mean(0)
        assert d[0] > 0.99

    def test_unit_norm(self):
        rays = get_rays(jnp.eye(4), (50.0, 60.0, 20.0, 15.0), 30, 40)
        n = np.linalg.norm(np.asarray(rays["rays_d"]), axis=-1)
        np.testing.assert_allclose(n, 1.0, rtol=1e-6)

    def test_sampled_indices_subset(self):
        inds = jnp.array([0, 5, 11], dtype=jnp.int32)
        full = get_rays(jnp.eye(4), (10.0, 10.0, 2.0, 2.0), 3, 4)
        sub = get_rays(jnp.eye(4), (10.0, 10.0, 2.0, 2.0), 3, 4, inds=inds)
        np.testing.assert_allclose(
            np.asarray(sub["rays_d"]), np.asarray(full["rays_d"])[np.asarray(inds)]
        )


class TestSampleRayIndices:
    def test_uniform_in_range(self):
        inds, coarse = sample_ray_indices(jax.random.key(0), 64, 48, 512)
        assert coarse is None
        a = np.asarray(inds)
        assert a.shape == (512,) and a.min() >= 0 and a.max() < 64 * 48

    def test_patch_mode_contiguous(self):
        p = 4
        inds, _ = sample_ray_indices(jax.random.key(1), 32, 32, 64, patch_size=p)
        a = np.asarray(inds).reshape(-1, p * p)
        # each patch: rows of p consecutive pixels, stride W between rows
        first = a[0]
        base = first[0]
        expect = (base + (np.arange(p)[:, None] * 32 + np.arange(p)[None, :])).reshape(-1)
        np.testing.assert_array_equal(first, expect)

    def test_error_map_prefers_high_error(self):
        em = jnp.ones((128 * 128,)) * 1e-6
        em = em.at[:128].set(1.0)  # first coarse row has all the error
        inds, coarse = sample_ray_indices(jax.random.key(2), 256, 256, 100, error_map=em)
        assert np.asarray(coarse).max() < 128  # all samples from the hot row
        assert np.asarray(inds).max() < 2 * 256  # maps to the top fine rows


class TestNearFar:
    def test_axis_ray(self):
        o = jnp.array([[0.0, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
        near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
        np.testing.assert_allclose(np.asarray(near), [2.0], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(far), [4.0], rtol=1e-6)

    def test_min_near_clamp_inside(self):
        o = jnp.zeros((1, 3))
        d = jnp.array([[1.0, 0.0, 0.0]])
        near, far = near_far_from_aabb(o, d, jnp.array([-1.0, -1, -1, 1, 1, 1]), min_near=0.2)
        np.testing.assert_allclose(np.asarray(near), [0.2])
        np.testing.assert_allclose(np.asarray(far), [1.0])

    def test_miss(self):
        o = jnp.array([[0.0, 5.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        near, far = near_far_from_aabb(o, d, jnp.array([-1.0, -1, -1, 1, 1, 1]))
        assert float(near[0]) == pytest.approx(float(MISS_T))
        assert float(far[0]) == pytest.approx(float(MISS_T))

    def test_diagonal_matches_numpy_slab(self):
        rng = np.random.default_rng(3)
        o = rng.normal(size=(64, 3)) * 3
        d = rng.normal(size=(64, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        aabb = np.array([-1.5, -1, -0.5, 0.5, 1, 1.5])
        near, far = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), jnp.asarray(aabb))
        t1 = (aabb[:3] - o) / d
        t2 = (aabb[3:] - o) / d
        lo = np.minimum(t1, t2).max(-1)
        hi = np.maximum(t1, t2).min(-1)
        hit = hi >= lo
        want_near = np.maximum(lo, 0.2)
        want_far = np.maximum(hi, want_near)  # box-behind clamp
        np.testing.assert_allclose(np.asarray(far)[hit], want_far[hit], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(near)[hit], want_near[hit], rtol=1e-5)


class TestMorton:
    def test_known_values(self):
        c = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1], [3, 0, 0]])
        np.testing.assert_array_equal(np.asarray(morton3d(c)), [1, 2, 4, 7, 0b1001])

    def test_roundtrip(self):
        rng = np.random.default_rng(4)
        c = rng.integers(0, 128, size=(256, 3))
        codes = morton3d(jnp.asarray(c))
        back = morton3d_invert(codes)
        np.testing.assert_array_equal(np.asarray(back), c)

    def test_codes_in_grid_range(self):
        c = jnp.array([[127, 127, 127]])
        assert int(morton3d(c)[0]) == 128**3 - 1


class TestSphFromRay:
    def test_on_axis(self):
        o = jnp.zeros((1, 3))
        d = jnp.array([[0.0, 0.0, 1.0]])
        sph = np.asarray(sph_from_ray(o, d, 4.0))
        # hit point (0,0,4): theta=0 -> mapped to -1
        np.testing.assert_allclose(sph[0, 0], -1.0, atol=1e-6)

    def test_range(self):
        rng = np.random.default_rng(5)
        d = rng.normal(size=(128, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = rng.normal(size=(128, 3)) * 0.3
        sph = np.asarray(sph_from_ray(jnp.asarray(o), jnp.asarray(d), 10.0))
        assert sph.min() >= -1.0 - 1e-5 and sph.max() <= 1.0 + 1e-5
