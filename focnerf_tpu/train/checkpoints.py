"""Checkpoint save/load with orbax.

Parity target: Trainer.save_checkpoint / load_checkpoint
(nerf/utils.py:1434-1556):

  - rolling "latest" checkpoints with max_keep (ref max_keep_ckpt=2);
  - a separate "best" checkpoint that drops the density grid to save space
    (ref :1484-1486) — here the occupancy state is simply optional;
  - modes: scratch | latest | best | <explicit path> (ref :775-793);
  - stored state: step, params, opt_state, EMA, occupancy grid + counters.

The reference's per-object checkpoints live in ``workspace_<obj>/checkpoints``;
apps/main_nerf.py keeps the same directory convention so COMBINED/editable
equivalents can discover them (gather_checkpoints, nerf/utils.py:161-175).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from focnerf_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_keep, create=True),
        )

    def save(self, state: TrainState, occupancy: Optional[Any] = None, extra: Optional[dict] = None):
        step = int(state.step)
        payload = {"state": state._asdict()}
        if occupancy is not None:
            payload["occupancy"] = occupancy._asdict()
        if extra:
            payload["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, occupancy: Optional[Any] = None, step: Optional[int] = None):
        """Restore into the given template pytrees; returns (state, occupancy, extra)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        template = {"state": state._asdict()}
        if occupancy is not None:
            template["occupancy"] = occupancy._asdict()
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        new_state = TrainState(**restored["state"])
        new_occ = None
        if occupancy is not None and "occupancy" in restored:
            new_occ = type(occupancy)(**restored["occupancy"])
        return new_state, new_occ, restored.get("extra")

    def close(self):
        self._mgr.close()


def gather_checkpoints(ckpt_dir: str) -> list:
    """Find per-object checkpoint directories under a composition root.

    Mirrors gather_checkpoints (nerf/utils.py:161-175): the reference globs
    ``workspace_<obj>/checkpoints/*.pth``; here each object workspace holds an
    orbax directory ``workspace_<obj>/checkpoints``.
    """
    out = []
    if not os.path.isdir(ckpt_dir):
        return out
    for name in sorted(os.listdir(ckpt_dir)):
        sub = os.path.join(ckpt_dir, name, "checkpoints")
        if os.path.isdir(sub) and name.rsplit("_", 1)[-1]:
            out.append(sub)
    return out


def gather_obj_feats(ckpt_dir: str) -> list:
    """Find per-object feature sidecars (nerf/utils.py:177-187): obj_feats/<obj>.npz."""
    feats_dir = os.path.join(ckpt_dir, "obj_feats")
    if not os.path.isdir(feats_dir):
        return []
    return [
        os.path.join(feats_dir, f) for f in sorted(os.listdir(feats_dir)) if f.endswith(".npz")
    ]
