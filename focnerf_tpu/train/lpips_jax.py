"""Pure-JAX LPIPS (AlexNet backbone) activating on a dropped weights file.

The reference measures LPIPS-alex per eval view (nerf/utils.py:624-658,
COMBINED.py:255-264) through the ``lpips`` pip package. This image ships
neither the package nor any pretrained weights (zero egress), so
``LPIPSMeter`` substitutes a labeled MS-SSIM distance. The moment real
weights land on disk, THIS module takes over — no torch, no lpips package
needed at eval time: the AlexNet feature stack and the LPIPS linear heads
run as plain jnp convs.

Weights contract (documented so a one-line dump on any machine with
torchvision+lpips produces it):

    np.savez(path,
        conv0_w=alexnet.features[0].weight,  conv0_b=...[0].bias,
        conv1_w=alexnet.features[3].weight,  conv1_b=...[3].bias,
        conv2_w=alexnet.features[6].weight,  conv2_b=...[6].bias,
        conv3_w=alexnet.features[8].weight,  conv3_b=...[8].bias,
        conv4_w=alexnet.features[10].weight, conv4_b=...[10].bias,
        lin0=lpips_model.lins[0].model[-1].weight, ... lin4=...)

(all arrays in torch's OIHW / [out,in,1,1] layouts, saved via .numpy()).
Search order: $FOCNERF_LPIPS_NPZ, then ~/.cache/focnerf/lpips_alex.npz.

Scaling constants match lpips.LPIPS's ScalingLayer (shift/scale below);
the metric is: per layer, unit-normalize channels, squared difference,
1x1 conv with the (non-negative) lin weights, spatial mean, sum layers.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# lpips.ScalingLayer constants (pretrained_networks normalization folded
# into one affine): x in [-1, 1] -> (x - shift) / scale
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_CONV_KEYS = [f"conv{i}_{p}" for i in range(5) for p in ("w", "b")]
_LIN_KEYS = [f"lin{i}" for i in range(5)]
# AlexNet feature-stack geometry: (stride, padding, pre-pool) per conv
_STRIDES = (4, 1, 1, 1, 1)
_PADS = (2, 2, 1, 1, 1)
_POOL_AFTER = (True, True, False, False, False)


def default_weight_paths():
    env = os.environ.get("FOCNERF_LPIPS_NPZ", "")
    paths = [env] if env else []
    paths.append(os.path.expanduser("~/.cache/focnerf/lpips_alex.npz"))
    return paths


def load_weights(path: Optional[str] = None):
    """Load the npz -> dict of jnp arrays, or None if absent/invalid."""
    candidates = [path] if path else default_weight_paths()
    for p in candidates:
        if not (p and os.path.exists(p)):
            continue
        try:
            z = np.load(p)
            w = {k: jnp.asarray(z[k], jnp.float32) for k in _CONV_KEYS + _LIN_KEYS}
        except Exception:
            return None
        if w["conv0_w"].shape != (64, 3, 11, 11):
            return None
        return w
    return None


def _alexnet_feats(w, x):
    """x: [B, 3, H, W] normalized. Returns the 5 relu feature maps."""
    feats = []
    for i in range(5):
        x = jax.lax.conv_general_dilated(
            x,
            w[f"conv{i}_w"],
            window_strides=(_STRIDES[i],) * 2,
            padding=[(_PADS[i],) * 2] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + w[f"conv{i}_b"][None, :, None, None]
        x = jax.nn.relu(x)
        feats.append(x)
        if _POOL_AFTER[i]:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 1, 3, 3),
                window_strides=(1, 1, 2, 2),
                padding="VALID",
            )
    return feats


def lpips_distance(w, pred, gt) -> jax.Array:
    """LPIPS-alex distance between two [H, W, 3] images in [0, 1]."""
    def prep(img):
        x = img.astype(jnp.float32) * 2.0 - 1.0  # lpips expects [-1, 1]
        x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        return jnp.transpose(x, (2, 0, 1))[None]  # [1, 3, H, W]

    fp = _alexnet_feats(w, prep(pred))
    fg = _alexnet_feats(w, prep(gt))
    total = jnp.float32(0.0)
    for i, (a, b) in enumerate(zip(fp, fg)):
        # unit-normalize channel vectors (lpips.normalize_tensor)
        na = a / jnp.sqrt(jnp.sum(a**2, axis=1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2  # [1, C, h, w]
        lin = w[f"lin{i}"].reshape(1, -1, 1, 1)  # [1, C, 1, 1] 1x1 conv
        total = total + jnp.mean(jnp.sum(d * lin, axis=1))
    return total


class JaxLPIPS:
    """Callable (pred, gt) -> float, jitted once per image shape."""

    def __init__(self, weights):
        self._w = weights
        self._fn = jax.jit(lambda p, g: lpips_distance(self._w, p, g))

    def __call__(self, pred, gt) -> float:
        return float(self._fn(jnp.asarray(pred), jnp.asarray(gt)))


def try_create(path: Optional[str] = None) -> Optional[JaxLPIPS]:
    w = load_weights(path)
    return JaxLPIPS(w) if w is not None else None
