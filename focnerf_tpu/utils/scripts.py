"""One-off data utilities (ports of nerf/create_video.py, generate_video.py,
load_jason.py, rearrange_transformjson.py).

  - ``folder_to_video``: image directory -> mp4 (create_video/generate_video)
  - ``sort_transforms``: order transforms.json frames by file_path
    (rearrange_transformjson.py / load_jason.py)
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional


def _numeric_key(name: str):
    nums = re.findall(r"\d+", name)
    return (int(nums[-1]) if nums else 0, name)


def folder_to_video(folder: str, out_path: Optional[str] = None, fps: int = 25) -> str:
    """All PNG/JPG frames in ``folder`` (numeric order) -> one mp4."""
    import imageio.v2 as imageio

    from focnerf_tpu.utils.video import write_video

    names = sorted(
        (n for n in os.listdir(folder) if n.lower().endswith((".png", ".jpg", ".jpeg"))),
        key=_numeric_key,
    )
    frames = [imageio.imread(os.path.join(folder, n)) for n in names]
    frames = [f[..., :3] for f in frames]
    out_path = out_path or os.path.join(folder, "video.mp4")
    write_video(out_path, frames, fps=fps)
    return out_path


def sort_transforms(path: str, out_path: Optional[str] = None) -> str:
    """Sort a transforms.json's frames by file_path (numeric-aware)."""
    with open(path) as f:
        data = json.load(f)
    data["frames"] = sorted(data["frames"], key=lambda fr: _numeric_key(fr["file_path"]))
    out_path = out_path or path
    with open(out_path, "w") as f:
        json.dump(data, f, indent=2)
    return out_path
