"""CLIP-guided GT-free training (port of nerf/clip_utils.py).

The reference uses OpenAI's ``clip`` package (ViT-B/16) for a text-image
cosine loss when training from random poses (--rand_pose >= 0,
nerf/utils.py:796-838). Here the model comes from HuggingFace transformers
(available in this environment); weights must already be in the local cache —
there is no network egress — so the loss degrades to unavailable (clearly
flagged) rather than crashing.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class CLIPLoss:
    """Text-image alignment loss: 1 - cos(text_emb, image_emb)."""

    def __init__(self, text: str, model_name: str = "openai/clip-vit-base-patch16"):
        self.text = text
        self.available = False
        try:  # pragma: no cover - needs cached weights
            import torch
            from transformers import CLIPModel, CLIPProcessor

            self._torch = torch
            self.model = CLIPModel.from_pretrained(model_name, local_files_only=True)
            self.proc = CLIPProcessor.from_pretrained(model_name, local_files_only=True)
            self.model.eval()
            with torch.no_grad():
                tok = self.proc(text=[text], return_tensors="pt", padding=True)
                self.text_emb = self.model.get_text_features(**tok)
                self.text_emb = self.text_emb / self.text_emb.norm(dim=-1, keepdim=True)
            self.available = True
        except Exception as e:
            self._reason = str(e)

    def __call__(self, image: np.ndarray) -> float:
        """image: [H, W, 3] float in [0, 1]. Returns the scalar loss.

        NOTE: runs under torch on host — usable as a metric / guidance signal
        computed between jitted steps, not inside the jitted graph.
        """
        if not self.available:
            raise RuntimeError(
                f"CLIP weights unavailable offline ({getattr(self, '_reason', '')})"
            )
        t = self._torch
        with t.no_grad():
            inp = self.proc(images=[(image * 255).astype(np.uint8)], return_tensors="pt")
            emb = self.model.get_image_features(**inp)
            emb = emb / emb.norm(dim=-1, keepdim=True)
            return float(1.0 - (emb * self.text_emb).sum())


def make_jax_clip_loss(text: str, model_name: str = "openai/clip-vit-base-patch16"):
    """Differentiable in-graph CLIP loss via FlaxCLIPModel.

    Unlike :class:`CLIPLoss` (host-side metric), this returns a pure function
    image [H, W, 3] in [0,1] -> scalar loss usable INSIDE a jitted train step,
    enabling the reference's GT-free rand-pose training (nerf/utils.py:826-838)
    with gradients flowing through CLIP. Returns None when weights are not in
    the local HF cache (no network egress here).
    """
    try:  # pragma: no cover - needs cached weights
        import jax.numpy as jnp
        from transformers import CLIPProcessor, FlaxCLIPModel

        model = FlaxCLIPModel.from_pretrained(model_name, local_files_only=True)
        proc = CLIPProcessor.from_pretrained(model_name, local_files_only=True)
        tok = proc(text=[text], return_tensors="np", padding=True)
        text_emb = model.get_text_features(**tok)
        text_emb = text_emb / jnp.linalg.norm(text_emb, axis=-1, keepdims=True)
        mean = jnp.asarray(proc.image_processor.image_mean).reshape(3, 1, 1)
        std = jnp.asarray(proc.image_processor.image_std).reshape(3, 1, 1)

        def loss(image):
            import jax

            x = jnp.transpose(image, (2, 0, 1))[None]  # [1, 3, H, W]
            x = jax.image.resize(x, (1, 3, 224, 224), "bilinear")
            x = (x - mean) / std
            emb = model.get_image_features(pixel_values=x)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return 1.0 - jnp.sum(emb * text_emb)

        return loss
    except Exception:
        return None
