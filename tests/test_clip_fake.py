"""make_jax_clip_loss against a fake transformers FlaxCLIP (the same
fixture pattern as tests/test_yolo_fake.py): the real CLIP weights cannot
be fetched here, but the preprocessing (CHW transpose, 224 resize,
mean/std normalization), the cosine-distance math, and gradient flow
through the in-graph loss can all execute and be checked without them.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np


class _FakeImageProcessor:
    image_mean = [0.48145466, 0.4578275, 0.40821073]
    image_std = [0.26862954, 0.26130258, 0.27577711]


class _FakeProcessor:
    image_processor = _FakeImageProcessor()

    def __call__(self, text=None, return_tensors="np", padding=True):
        assert text is not None
        return {"input_ids": np.array([[len(t) for t in text]])}

    @classmethod
    def from_pretrained(cls, name, local_files_only=False):
        return cls()


class _FakeFlaxCLIP:
    """Tiny deterministic 'CLIP': embeddings are fixed random projections of
    pooled inputs — differentiable pure-jnp, so grads flow like the real
    FlaxCLIPModel."""

    _proj = None

    def __init__(self):
        key = jax.random.key(42)
        self._img_proj = jax.random.normal(key, (3 * 4 * 4, 8), jnp.float32)

    def get_text_features(self, input_ids=None, **kw):
        v = jnp.arange(8, dtype=jnp.float32)[None] + jnp.asarray(
            input_ids, jnp.float32
        ).sum()
        return v

    def get_image_features(self, pixel_values=None):
        # [1, 3, 224, 224] -> 4x4 pooled -> fixed projection
        x = jax.image.resize(pixel_values, (1, 3, 4, 4), "bilinear")
        return x.reshape(1, -1) @ self._img_proj

    @classmethod
    def from_pretrained(cls, name, local_files_only=False):
        return cls()


def _install(monkeypatch):
    mod = types.ModuleType("transformers")
    mod.FlaxCLIPModel = _FakeFlaxCLIP
    mod.CLIPProcessor = _FakeProcessor
    mod.CLIPModel = None  # host-side class unused by the jax path
    monkeypatch.setitem(sys.modules, "transformers", mod)


class TestFakeCLIP:
    def test_loss_builds_and_grads_flow(self, monkeypatch):
        _install(monkeypatch)
        from focnerf_tpu.train.clip_guidance import make_jax_clip_loss

        loss = make_jax_clip_loss("a red sphere")
        assert loss is not None, "fake transformers should be picked up"
        img = jnp.full((32, 32, 3), 0.5)
        val = float(loss(img))
        assert np.isfinite(val)
        g = jax.grad(lambda im: loss(im))(img)
        assert float(jnp.abs(g).sum()) > 0, "no gradient through CLIP loss"

    def test_clip_step_trains_through_guidance(self, monkeypatch):
        """The rand-pose branch end-to-end: make_clip_step drives the field
        with gradients THROUGH the (fake) CLIP image encoder."""
        _install(monkeypatch)
        from focnerf_tpu.core.camera import rand_poses
        from focnerf_tpu.core.rays import get_rays
        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.train.clip_guidance import make_jax_clip_loss
        from focnerf_tpu.train.state import create_train_state, make_optimizer
        from focnerf_tpu.train.steps import make_clip_step

        cfg = NeRFConfig(
            num_levels=2, base_resolution=4, log2_hashmap_size=8,
            use_objfeat=False, compute_dtype=jnp.float32,
        )
        opt = make_optimizer(lr=1e-2)
        state = create_train_state(jax.random.key(0), cfg, opt)
        clip_loss = make_jax_clip_loss("a sphere")
        H = W = 16
        step = make_clip_step(cfg, opt, clip_loss, H=H, W=W, num_steps=16)
        pose = rand_poses(np.random.default_rng(0), 1, radius=2.5)[0]
        rays = get_rays(jnp.asarray(pose), (19.2, 19.2, 8.0, 8.0), H, W)
        p0 = state.params["sigma_net"][0]
        state, metrics = step(
            state, rays["rays_o"], rays["rays_d"], jax.random.key(1)
        )
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1
        # the guidance gradient actually moved the field
        assert float(jnp.abs(state.params["sigma_net"][0] - p0).sum()) > 0
