"""Object-feature synthesis for novel (test) views.

Ports of the reference's feature-interpolation helpers (nerf/utils.py):

  - ``calculate_feats``       (:189-219): inverse-pose-distance weighted blend
    of saved per-view features onto each test pose;
  - ``calculate_feats2`` / ``calculate_feats2_inference`` (:224-260, 320-359):
    per-object dict variant (used by editable.py);
  - ``calculate_avg_feats`` / ``calculate_avg_feats_inference`` (:264-317):
    plain mean over training views (used by COMBINED.py).

Feature sidecars are .npz files written by apps/main_nerf.py:
  {"obj_feats": [V, F], "poses": [V, 4, 4]} per object
(replacing the reference's torch.save dicts, main_nerf.py:256-261).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np


def save_obj_feats(path: str, obj_feats: np.ndarray, poses: np.ndarray):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, obj_feats=np.asarray(obj_feats), poses=np.asarray(poses))


def load_obj_feats(path: str) -> Dict[str, np.ndarray]:
    data = np.load(path)
    return {"obj_feats": data["obj_feats"], "poses": data["poses"]}


def _pose_distance(test_pose: np.ndarray, train_poses: np.ndarray) -> np.ndarray:
    """Euclidean distance between camera centers (utils.py:196-201)."""
    return np.linalg.norm(train_poses[:, :3, 3] - test_pose[:3, 3], axis=-1)


def calculate_feats(
    test_poses: np.ndarray, train_feats: np.ndarray, train_poses: np.ndarray, eps: float = 1e-8
) -> np.ndarray:
    """Inverse-distance-weighted feature blend per test pose (utils.py:189-219).

    Returns [T, F] synthesized features.
    """
    out = []
    for tp in test_poses:
        d = _pose_distance(tp, train_poses)
        w = 1.0 / (d + eps)
        w = w / w.sum()
        out.append((w[:, None] * train_feats).sum(0))
    return np.stack(out).astype(np.float32)


def calculate_avg_feats(train_feats: np.ndarray) -> np.ndarray:
    """Plain mean over training views (utils.py:264-317). Returns [F]."""
    return np.asarray(train_feats, np.float32).mean(0)


def calculate_feats2(
    test_poses: np.ndarray, feats_by_object: Dict[str, Dict[str, np.ndarray]]
) -> Dict[str, np.ndarray]:
    """Per-object pose-weighted synthesis (utils.py:224-260).

    feats_by_object: {name: {"obj_feats": [V, F], "poses": [V, 4, 4]}}
    Returns {name: [T, F]}.
    """
    return {
        name: calculate_feats(test_poses, d["obj_feats"], d["poses"])
        for name, d in feats_by_object.items()
    }


def calculate_avg_feats_inference(feat_paths: List[str]) -> Dict[str, np.ndarray]:
    """Mean features per object from saved sidecars (utils.py:285-317)."""
    out = {}
    for p in feat_paths:
        name = os.path.splitext(os.path.basename(p))[0]
        d = load_obj_feats(p)
        out[name] = calculate_avg_feats(d["obj_feats"])
    return out


def calculate_feats2_inference(
    test_poses: np.ndarray, feat_paths: List[str]
) -> Dict[str, np.ndarray]:
    """Pose-weighted features per object from saved sidecars (utils.py:320-359)."""
    out = {}
    for p in feat_paths:
        name = os.path.splitext(os.path.basename(p))[0]
        d = load_obj_feats(p)
        out[name] = calculate_feats(test_poses, d["obj_feats"], d["poses"])
    return out
