"""Pallas fused-composite kernel vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import focnerf_tpu.ops.composite_pallas as cp
from focnerf_tpu.ops.composite import composite_rays


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(cp.pl, "pallas_call", patched)


def _data(n=70, t=128, seed=0):
    rng = np.random.default_rng(seed)
    sig = jnp.asarray(rng.uniform(0, 20, (n, t)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, (n, t, 3)), jnp.float32)
    dts = jnp.asarray(rng.uniform(0.005, 0.02, (n, t)), jnp.float32)
    ts = jnp.sort(jnp.asarray(rng.uniform(0, 4, (n, t)), jnp.float32), axis=-1)
    return sig, rgb, dts, ts


class TestFusedComposite:
    @pytest.mark.parametrize("thresh", [0.0, 1e-4])
    def test_matches_reference(self, thresh):
        sig, rgb, dts, ts = _data()
        img, ws, depth = cp.composite_rays_fused(sig, rgb, dts, ts, 1.0, thresh)
        ref = composite_rays(sig, rgb, dts, ts=ts, T_thresh=thresh)
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref["image"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ws), np.asarray(ref["weights_sum"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(ref["depth"]), atol=2e-5)

    def test_gradients_match(self):
        sig, rgb, dts, ts = _data(n=16, t=128)
        g1 = jax.grad(lambda s: cp.composite_rays_fused(s, rgb, dts, ts, 1.0, 0.0)[0].sum())(sig)
        g2 = jax.grad(lambda s: composite_rays(s, rgb, dts, ts=ts)["image"].sum())(sig)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-7)

    def test_ragged_ray_count_padding(self):
        # n not a multiple of the ray block: padding must be exact
        sig, rgb, dts, ts = _data(n=37, t=128, seed=3)
        img, ws, _ = cp.composite_rays_fused(sig, rgb, dts, ts, 1.0, 0.0)
        ref = composite_rays(sig, rgb, dts, ts=ts)
        assert img.shape == (37, 3)
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref["image"]), atol=2e-5)
