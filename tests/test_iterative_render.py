"""Iterative worklist renderer (render/iterative.py) vs the one-shot path.

The iterative renderer is the TPU port of the reference's inference loop
(raymarching.cu:701-914, nerf/renderer.py:318-344): compacted alive-ray
rounds instead of one [N, slab] evaluation. Its output must agree with
``render_rays_occupancy`` over the SAME skip field — the two paths walk
the identical dt recurrence, so with a big-enough one-shot slab the
samples are the same set and images match to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.models.nerf import NeRFConfig, init_nerf_params
from focnerf_tpu.ops.occupancy import occupancy_skip_field
from focnerf_tpu.render.iterative import (
    render_image_iterative,
    render_rays_iterative,
)
from focnerf_tpu.render.renderer import render_rays_occupancy

CFG = NeRFConfig(
    num_levels=4, base_resolution=4, log2_hashmap_size=12,
    use_objfeat=False, compute_dtype=jnp.float32,
)


def _sphere_setup(gs=32, n=64, seed=0):
    params = init_nerf_params(jax.random.key(0), CFG)
    c = (np.arange(gs) + 0.5) / gs * 2 - 1
    X, Y, Z = np.meshgrid(c, c, c, indexing="ij")
    occ = (X**2 + Y**2 + Z**2 < 0.6**2).reshape(1, -1)
    skip = occupancy_skip_field(jnp.asarray(occ), gs)

    rng = np.random.default_rng(seed)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -2.5
    d = rng.normal(0, 0.12, (n, 3)).astype(np.float32)
    d[:, 2] += 1
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return params, skip, jnp.asarray(o), jnp.asarray(d)


class TestIterativeRender:
    def test_matches_oneshot_skip_path(self):
        gs = 32
        params, skip, o, d = _sphere_setup(gs)
        kw = dict(dt_gamma=0.0, max_steps=256, bg_color=1.0, grid_size=gs)
        oneshot = render_rays_occupancy(
            params, CFG, o, d, jnp.zeros((1, gs**3), bool),
            occ_skip=skip, slab=256, **kw,
        )
        it = render_rays_iterative(
            params, CFG, o, d, skip, sub_slab=8, bucket_base=16, **kw,
        )
        np.testing.assert_allclose(
            np.asarray(it["image"]), np.asarray(oneshot["image"]),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(it["weights_sum"]), np.asarray(oneshot["weights_sum"]),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(it["depth"]), np.asarray(oneshot["depth"]), atol=5e-3
        )

    def test_background_rays_die_first_round(self):
        """Rays missing the AABB never enter the worklist; rays through
        empty space die after one round — the compaction win."""
        gs = 32
        params, skip, o, d = _sphere_setup(gs)
        # aim all rays well away from the sphere (graze the +x corner)
        d = jnp.asarray(
            np.tile(np.array([[0.55, 0.55, 0.65]], np.float32), (16, 1))
        )
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        out = render_rays_iterative(
            params, CFG, o[:16], d, skip, sub_slab=8, bucket_base=16,
            dt_gamma=0.0, max_steps=256, bg_color=1.0, grid_size=gs,
        )
        np.testing.assert_allclose(
            np.asarray(out["image"]), 1.0, atol=1e-5
        )

    def test_device_loop_matches_host_ladder(self):
        """The one-dispatch drain (sweep + lax.while_loop) must produce the
        host-driven ladder's image bit-for-bit on the same bucket math —
        both run the identical round body, only the loop driver differs."""
        gs = 32
        params, skip, o, d = _sphere_setup(gs)
        kw = dict(dt_gamma=0.0, max_steps=256, bg_color=1.0, grid_size=gs,
                  sub_slab=8, bucket_base=16)
        host = render_rays_iterative(params, CFG, o, d, skip, **kw)
        dev = render_rays_iterative(params, CFG, o, d, skip,
                                    device_loop=True, **kw)
        np.testing.assert_allclose(
            np.asarray(dev["image"]), np.asarray(host["image"]), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(dev["weights_sum"]),
            np.asarray(host["weights_sum"]), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(dev["depth"]), np.asarray(host["depth"]), atol=2e-5)

    def test_image_entrypoint(self):
        gs = 32
        params, skip, _, _ = _sphere_setup(gs)
        from focnerf_tpu.core.camera import rand_poses

        pose = jnp.asarray(rand_poses(np.random.default_rng(0), 1, radius=2.5)[0])
        intr = (16.0, 16.0, 8.0, 8.0)
        img, depth = render_image_iterative(
            params, CFG, pose, intr, 16, 16, occ_skip=skip,
            dt_gamma=0.0, max_steps=256, grid_size=gs, bucket_base=64,
        )
        assert img.shape == (16, 16, 3)
        assert depth.shape == (16, 16)
        assert np.isfinite(np.asarray(img)).all()
