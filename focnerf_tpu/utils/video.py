"""Video export: frames -> mp4 (replaces moviepy/imageio usage).

The reference writes test renders with imageio mp4 (nerf/utils.py:1072-1076)
and editable.py composes frames via moviepy (editable.py:405-418). Neither
moviepy nor imageio-ffmpeg is guaranteed here; cv2.VideoWriter is.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def write_video(path: str, frames: Sequence[np.ndarray], fps: int = 25) -> bool:
    """frames: list of [H, W, 3] uint8 RGB. Returns True on success."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        return False
    h, w = frames[0].shape[:2]
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, frames, fps=fps, quality=8, macro_block_size=1)
        return True
    except Exception:
        pass
    try:
        import cv2

        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        return True
    except Exception:
        # last resort: dump frames as PNGs next to the target path
        import imageio.v2 as imageio
        import os

        base = os.path.splitext(path)[0]
        for i, f in enumerate(frames):
            imageio.imwrite(f"{base}_{i:04d}.png", f)
        return False
