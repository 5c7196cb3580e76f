"""Model + renderer + train-step integration tests, including a tiny overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.models.nerf import (
    NeRFConfig,
    color_fn,
    density_fn,
    encode_objfeat,
    field_fn,
    init_nerf_params,
)
from focnerf_tpu.render.renderer import render_image, render_rays
from focnerf_tpu.train.state import create_train_state, make_optimizer
from focnerf_tpu.train.steps import make_eval_step, make_train_step

# small config so CPU tests stay fast
TINY = NeRFConfig(
    bound=1.0,
    num_levels=4,
    base_resolution=4,
    log2_hashmap_size=12,
    compute_dtype=jnp.float32,
)


class TestModel:
    def test_param_shapes_production(self):
        cfg = NeRFConfig()
        params = init_nerf_params(jax.random.key(0), cfg)
        assert params["grid"].shape[1] == 2
        # sigma net 32 -> 64 -> 16, color 47 -> 64 -> 64 -> 3, yolo 144 -> 16 -> 16
        assert [w.shape for w in params["sigma_net"]] == [(32, 64), (64, 16)]
        assert [w.shape for w in params["color_net"]] == [(47, 64), (64, 64), (64, 3)]
        assert [w.shape for w in params["yolo_net"]] == [(144, 16), (16, 16)]

    def test_density_positive_finite(self):
        params = init_nerf_params(jax.random.key(1), TINY)
        x = jax.random.uniform(jax.random.key(2), (64, 3), minval=-1, maxval=1)
        sigma, geo = density_fn(params, TINY, x)
        assert sigma.shape == (64,) and geo.shape == (64, 15)
        assert np.all(np.asarray(sigma) > 0)  # trunc_exp output
        assert np.all(np.isfinite(np.asarray(sigma)))

    def test_color_in_unit_range(self):
        params = init_nerf_params(jax.random.key(3), TINY)
        d = jnp.ones((32, 3)) / np.sqrt(3.0)
        geo = jnp.zeros((32, 15))
        obj = encode_objfeat(params, TINY, jnp.ones((144,)))
        rgb = np.asarray(color_fn(params, TINY, d, geo, obj))
        assert rgb.shape == (32, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1

    def test_field_fn_batched(self):
        params = init_nerf_params(jax.random.key(4), TINY)
        x = jnp.zeros((4, 8, 3))
        d = jnp.ones((4, 8, 3)) / np.sqrt(3.0)
        obj = encode_objfeat(params, TINY, jnp.ones((144,)))
        sigma, rgb = field_fn(params, TINY, x, d, obj)
        assert sigma.shape == (4, 8) and rgb.shape == (4, 8, 3)

    def test_objfeat_changes_color(self):
        params = init_nerf_params(jax.random.key(5), TINY)
        d = jnp.ones((4, 3)) / np.sqrt(3.0)
        geo = jnp.ones((4, 15))
        c1 = color_fn(params, TINY, d, geo, encode_objfeat(params, TINY, jnp.zeros(144)))
        c2 = color_fn(params, TINY, d, geo, encode_objfeat(params, TINY, jnp.ones(144) * 3))
        assert not np.allclose(np.asarray(c1), np.asarray(c2))

    def test_no_objfeat_config(self):
        cfg = NeRFConfig(
            num_levels=2, base_resolution=4, log2_hashmap_size=8, use_objfeat=False
        )
        params = init_nerf_params(jax.random.key(6), cfg)
        assert "yolo_net" not in params
        sigma, rgb = field_fn(params, cfg, jnp.zeros((4, 3)), jnp.ones((4, 3)) / np.sqrt(3.0))
        assert rgb.shape == (4, 3)


class TestRenderer:
    def _rays(self, n=8):
        rng = np.random.default_rng(0)
        o = np.zeros((n, 3), np.float32)
        o[:, 2] = -2.5
        d = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
        d[:, 2] += 1
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(o), jnp.asarray(d)

    def test_render_shapes_and_ranges(self):
        params = init_nerf_params(jax.random.key(0), TINY)
        o, d = self._rays()
        out = render_rays(params, TINY, o, d, num_steps=16, obj_feat=jnp.ones(144))
        assert out["image"].shape == (8, 3) and out["depth"].shape == (8,)
        img = np.asarray(out["image"])
        assert np.all(np.isfinite(img)) and img.min() >= 0 and img.max() <= 1.0 + 1e-5

    def test_miss_rays_get_background(self):
        params = init_nerf_params(jax.random.key(1), TINY)
        o = jnp.array([[0.0, 50.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        out = render_rays(params, TINY, o, d, num_steps=8, bg_color=0.25, obj_feat=jnp.ones(144))
        np.testing.assert_allclose(np.asarray(out["image"]), 0.25, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["weights_sum"]), 0.0, atol=1e-5)

    def test_perturb_reproducible(self):
        params = init_nerf_params(jax.random.key(2), TINY)
        o, d = self._rays()
        k = jax.random.key(7)
        a = render_rays(params, TINY, o, d, num_steps=16, rng=k, perturb=True, obj_feat=jnp.ones(144))
        b = render_rays(params, TINY, o, d, num_steps=16, rng=k, perturb=True, obj_feat=jnp.ones(144))
        np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))

    def test_render_image_staged(self):
        cfg = NeRFConfig(
            num_levels=2, base_resolution=4, log2_hashmap_size=8,
            use_objfeat=False, compute_dtype=jnp.float32,
        )
        params = init_nerf_params(jax.random.key(3), cfg)
        pose = jnp.eye(4).at[2, 3].set(-2.5)
        H = W = 12
        img, depth = render_image(
            params, cfg, pose, (15.0, 15.0, W / 2, H / 2), H, W,
            num_steps=8, max_ray_batch=64,
        )
        assert img.shape == (H, W, 3) and depth.shape == (H, W)
        assert np.all(np.isfinite(np.asarray(img)))


def _make_sphere_batch(rng_np, cfg, n_rays=256, n_views=4, radius=2.5):
    """Synthetic scene: unit-ish sphere of radius 0.5, red top / blue bottom."""
    from focnerf_tpu.core.camera import rand_poses
    from focnerf_tpu.core.rays import get_rays

    poses = rand_poses(rng_np, n_views, radius=radius)
    all_o, all_d, all_rgb = [], [], []
    for p in poses:
        rays = get_rays(jnp.asarray(p), (24.0, 24.0, 8.0, 8.0), 16, 16)
        o, d = np.asarray(rays["rays_o"]), np.asarray(rays["rays_d"])
        # analytic ray-sphere intersection for GT
        b = np.sum(o * d, -1)
        c = np.sum(o * o, -1) - 0.5**2
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        pt = o + t[:, None] * d
        rgb = np.ones((o.shape[0], 3), np.float32)  # white bg
        rgb[hit] = np.where(pt[hit, 1:2] > 0, [[1.0, 0.1, 0.1]], [[0.1, 0.1, 1.0]])
        all_o.append(o)
        all_d.append(d)
        all_rgb.append(rgb)
    return (
        jnp.asarray(np.concatenate(all_o)),
        jnp.asarray(np.concatenate(all_d)),
        jnp.asarray(np.concatenate(all_rgb)),
    )


@pytest.mark.slow
class TestTrainStep:
    def test_loss_decreases_overfit(self):
        cfg = NeRFConfig(
            num_levels=8, base_resolution=4, log2_hashmap_size=14,
            use_objfeat=False, compute_dtype=jnp.float32,
        )
        opt = make_optimizer(lr=1e-2, iters=300)
        state = create_train_state(jax.random.key(0), cfg, opt)
        step = make_train_step(cfg, opt, num_steps=48, donate=False)

        o, d, rgb = _make_sphere_batch(np.random.default_rng(0), cfg)
        batch = {"rays_o": o, "rays_d": d, "pixels": rgb}

        losses = []
        for i in range(120):
            state, m = step(state, batch, jax.random.key(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.25, f"no learning: {losses[0]} -> {losses[-1]}"
        assert np.isfinite(losses).all()

    def test_psnr_after_overfit(self):
        cfg = NeRFConfig(
            num_levels=8, base_resolution=4, log2_hashmap_size=14,
            use_objfeat=False, compute_dtype=jnp.float32,
        )
        opt = make_optimizer(lr=2e-2, iters=400)
        state = create_train_state(jax.random.key(1), cfg, opt)
        step = make_train_step(cfg, opt, num_steps=48, donate=False)
        o, d, rgb = _make_sphere_batch(np.random.default_rng(1), cfg)
        batch = {"rays_o": o, "rays_d": d, "pixels": rgb}
        for i in range(400):
            state, m = step(state, batch, jax.random.key(i))
        eval_step = make_eval_step(cfg, num_steps=48)
        pred, _, gt = eval_step(state.params, batch)
        mse = float(jnp.mean((pred - gt) ** 2))
        psnr = -10 * np.log10(mse)
        assert psnr > 25.0, f"overfit PSNR too low: {psnr:.2f} dB"

    def test_mask_penalty_and_rgba(self):
        cfg = NeRFConfig(
            num_levels=2, base_resolution=4, log2_hashmap_size=8,
            compute_dtype=jnp.float32,
        )
        opt = make_optimizer()
        state = create_train_state(jax.random.key(2), cfg, opt)
        step = make_train_step(cfg, opt, num_steps=8, donate=False)
        n = 32
        batch = {
            "rays_o": jnp.zeros((n, 3)).at[:, 2].set(-2.0),
            "rays_d": jnp.zeros((n, 3)).at[:, 2].set(1.0),
            "pixels": jnp.ones((n, 4)) * 0.5,
            "ray_mask": jnp.arange(n) % 2 == 0,
            "obj_feat": jnp.ones(144),
        }
        state, m = step(state, batch, jax.random.key(0))
        assert np.isfinite(float(m["loss"]))
        assert int(state.step) == 1

    def test_ema_tracks_params(self):
        cfg = NeRFConfig(
            num_levels=2, base_resolution=4, log2_hashmap_size=8,
            use_objfeat=False, compute_dtype=jnp.float32,
        )
        opt = make_optimizer(lr=1e-2)
        state = create_train_state(jax.random.key(3), cfg, opt)
        step = make_train_step(cfg, opt, num_steps=8, donate=False)
        batch = {
            "rays_o": jnp.zeros((16, 3)).at[:, 2].set(-2.0),
            "rays_d": jnp.zeros((16, 3)).at[:, 2].set(1.0),
            "pixels": jnp.ones((16, 3)) * 0.3,
        }
        s1, _ = step(state, batch, jax.random.key(0))
        # early EMA decay is (1+1)/(10+1) ~ 0.18 -> ema moves fast toward params
        w_p = np.asarray(s1.params["sigma_net"][0])
        w_e = np.asarray(s1.ema_params["sigma_net"][0])
        w_0 = np.asarray(state.params["sigma_net"][0])
        assert not np.allclose(w_e, w_0)
        # ema between old and new
        assert np.all((w_e - w_p) * (w_e - w_0) <= 1e-12)
