"""Dynamic-scene dataset: NeRFDataset + per-frame normalized time.

Parity target: dnerf/provider.py — frames carry a ``time`` key in
transforms_*.json (or time is inferred from the frame index), normalized to
[0, 1] (:171-193); batches return the frame's time alongside the rays
(:304-352).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.data.provider import DatasetOptions, NeRFDataset


class DNeRFDataset(NeRFDataset):
    def __init__(self, opt: DatasetOptions, split: str = "train", **kw):
        super().__init__(opt, split=split, **kw)
        # re-read the transforms to pick up per-frame times in kept-frame order
        root = opt.path
        tj = os.path.join(root, f"transforms_{split}.json")
        if not os.path.exists(tj):
            tj = os.path.join(root, "transforms.json")
        with open(tj) as f:
            frames = json.load(f)["frames"]
        if self.mode == "colmap":
            frames = sorted(frames, key=lambda d: d["file_path"])

        kept_names = {os.path.basename(p) for p in self.paths}
        times = []
        for i, fr in enumerate(frames):
            name = os.path.basename(fr["file_path"])
            if not os.path.splitext(name)[1]:
                name += ".png"
            if self.paths and name not in kept_names:
                continue
            if "time" in fr:
                times.append(float(fr["time"]))
            else:
                times.append(i / max(len(frames) - 1, 1))  # index-derived time
        if not times:
            times = [0.0] * self.n_views
        t = np.asarray(times[: self.n_views], np.float32)
        tmax = t.max() if t.max() > 0 else 1.0
        self.times = t / tmax if tmax > 1.0 else t  # normalize to [0, 1]
        self.times_dev = jax.device_put(jnp.asarray(self.times))

    def train_batch(self, rng: jax.Array, view: Optional[int] = None):
        if view is None:
            view = int(jax.random.randint(jax.random.fold_in(rng, 17), (), 0, self.n_views))
        batch = super().train_batch(rng, view=view)
        batch["time"] = self.times_dev[view]
        return batch

    def eval_view(self, view: int):
        out = super().eval_view(view)
        out["time"] = self.times_dev[view]
        return out
