"""Mask dilation utility (port of nerf/dilations.py).

Grows a boolean object mask until its area increases by a target percentage
(iterative 3x3 dilation, nerf/dilations.py:6-25). Pure numpy/scipy — no cv2
dependency required.
"""

from __future__ import annotations

import numpy as np


def _dilate_once(mask: np.ndarray) -> np.ndarray:
    """3x3 binary dilation."""
    out = mask.copy()
    out[1:, :] |= mask[:-1, :]
    out[:-1, :] |= mask[1:, :]
    out[:, 1:] |= mask[:, :-1]
    out[:, :-1] |= mask[:, 1:]
    out[1:, 1:] |= mask[:-1, :-1]
    out[:-1, :-1] |= mask[1:, 1:]
    out[1:, :-1] |= mask[:-1, 1:]
    out[:-1, 1:] |= mask[1:, :-1]
    return out


def increase_dilation_percentage(
    mask: np.ndarray, target_percent: float, max_iters: int = 100
) -> np.ndarray:
    """Dilate until area grows by >= target_percent (of the original area)."""
    mask = np.asarray(mask, bool)
    base = max(int(mask.sum()), 1)
    target = base * (1.0 + target_percent / 100.0)
    out = mask
    for _ in range(max_iters):
        if out.sum() >= target:
            break
        grown = _dilate_once(out)
        if grown.sum() == out.sum():  # saturated
            break
        out = grown
    return out
