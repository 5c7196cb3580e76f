"""Loss functions (port of loss.py in the reference).

  - ``mape_loss``  (loss.py:7):  |pred-gt| / (|gt| + eps), per-ray channel mean
  - ``huber_loss`` (loss.py:18): smooth-L1 with threshold
  - ``eff_distloss`` (loss.py:30-76): O(N) mip-NeRF-360 distortion loss —
    the reference hand-writes the autograd; here plain jnp autodiff handles it
  - the active training loss lives in train/steps.py (MSE + mask penalty,
    matching main_nerf.py:166 + renderer.py:163-165)
"""

from __future__ import annotations

import jax.numpy as jnp


def mape_loss(pred, target, eps: float = 1e-2, reduction: str = "mean"):
    """Mean absolute percentage error (loss.py:7-15)."""
    diff = jnp.abs(pred - target) / (jnp.abs(target) + eps)
    if reduction == "mean":
        return jnp.mean(diff)
    return diff


def huber_loss(pred, target, delta: float = 0.1, reduction: str = "mean"):
    """Smooth-L1 (loss.py:18-27)."""
    err = jnp.abs(pred - target)
    loss = jnp.where(err < delta, 0.5 * err**2 / delta, err - 0.5 * delta)
    if reduction == "mean":
        return jnp.mean(loss)
    return loss


def eff_distloss(weights, midpoints, intervals):
    """Efficient O(N) distortion loss (loss.py:30-76; Sun et al. 2022).

    L = sum_ij w_i w_j |m_i - m_j| + (1/3) sum_i w_i^2 d_i
    computed with prefix sums instead of the O(N^2) pairwise form.

    Args:
      weights:   [..., T] compositing weights.
      midpoints: [..., T] interval midpoints (monotonically increasing).
      intervals: [..., T] interval lengths.
    """
    wm = weights * midpoints
    w_cum = jnp.cumsum(weights, axis=-1)
    wm_cum = jnp.cumsum(wm, axis=-1)
    w_prev = jnp.concatenate([jnp.zeros_like(w_cum[..., :1]), w_cum[..., :-1]], -1)
    wm_prev = jnp.concatenate([jnp.zeros_like(wm_cum[..., :1]), wm_cum[..., :-1]], -1)
    # pairwise term via prefix sums: 2 * sum_i w_i (m_i * W_{<i} - WM_{<i})
    pair = 2.0 * jnp.sum(wm * w_prev - weights * wm_prev, axis=-1)
    self_term = jnp.sum(weights**2 * intervals, axis=-1) / 3.0
    return jnp.mean(pair + self_term)
