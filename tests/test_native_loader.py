"""Native threaded batch loader (native/dataloader.cpp) + host pipeline.

The host-RAM input path for stacks too large to preload to HBM — the role
torch's DataLoader plays in the reference (nerf/provider.py:398-459).
"""

import numpy as np
import pytest

from focnerf_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native toolchain unavailable"
)


def test_loader_pixels_match_source():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(3, 64, 4), dtype=np.uint8)
    with native_loader.NativeBatchLoader(images, batch_rays=16, seed=7) as ld:
        for _ in range(8):
            view, inds, pix = ld.next()
            assert 0 <= view < 3
            assert inds.shape == (16,) and ((inds >= 0) & (inds < 64)).all()
            np.testing.assert_allclose(
                pix, images[view][inds].astype(np.float32) / 255.0, atol=1e-6
            )


def test_loader_covers_views_and_pixels():
    images = np.zeros((4, 32, 1), np.uint8)
    seen_views = set()
    with native_loader.NativeBatchLoader(images, batch_rays=8, n_threads=3) as ld:
        for _ in range(32):
            v, _, _ = ld.next()
            seen_views.add(v)
    assert len(seen_views) == 4  # all views get sampled


def test_provider_host_pipeline(tmp_path):
    import jax.numpy as jnp

    from focnerf_tpu.data.provider import DatasetOptions, NeRFDataset
    from helpers import make_synthetic_scene

    scene = make_synthetic_scene(str(tmp_path / "scene"))
    opt = DatasetOptions(path=scene, scale=1.0, num_rays=32, host_pipeline=True)
    ds = NeRFDataset(opt, split="train")
    assert ds.images is None and ds.images_host is not None
    assert ds.images_host.dtype == np.uint8
    assert ds.has_gt

    b = ds.train_batch(None)
    assert b["rays_o"].shape == (32, 3) and b["rays_d"].shape == (32, 3)
    assert b["pixels"].shape[0] == 32
    # pixels must come from the sampled view's host image
    v = int(b["view"])
    got = np.asarray(b["pixels"])
    stack = ds.images_host[v].astype(np.float32) / 255.0
    # every sampled pixel exists in that view's image (value-level check)
    d = np.abs(got[:, None, :] - stack[None, :, :]).sum(-1).min(1)
    assert float(d.max()) < 1e-5

    # rays are unit-norm directions like the device path
    n = jnp.linalg.norm(b["rays_d"], axis=-1)
    np.testing.assert_allclose(np.asarray(n), 1.0, atol=1e-5)

    # eval still serves GT from the host stack
    ev = ds.eval_view(0)
    assert "pixels" in ev and ev["pixels"].shape[0] == ds.H * ds.W
    ds._native_loader.close()
