"""YOLOv8-seg preprocessing sidecar (offline, torch-based).

The reference runs YOLO inference *inside* the data path — per frame during
dataset construction (nerf/provider.py:234-337) and over every split in
``get_object_masks`` (nerf/utils.py:364-477). TPU-first redesign: YOLO is an
offline preprocessing CLI that writes one npz per split:

  <scene>/yolo/<split>.npz:
    names:   [str] detected object class names (+ "background")
    For each object <obj>:
      <obj>__masks:   [V, H, W] bool   merged per-class instance masks
      <obj>__feats:   [V, F]   float32 mean-pooled backbone features
                      (penultimate activations [1, 144, 20, 20] masked by the
                       20x20-resized object mask, mean over spatial positions —
                       provider.py:282-334)
      <obj>__bboxes:  [V, 4]   float32 (x1, y1, x2, y2), -1 where undetected

The JAX pipeline consumes only these arrays, so ultralytics/torch never sits
in the training path. When ultralytics is unavailable this module degrades to
``background_only_masks`` (the reference's disable_yolo mode, utils.py:430+),
keeping every downstream component runnable.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


def yolo_available() -> bool:
    try:  # pragma: no cover - depends on optional package
        import ultralytics  # noqa: F401

        return True
    except Exception:
        return False


def background_only_masks(image_paths: List[str], H: int, W: int) -> Dict:
    """disable_yolo fallback: one 'background' object with the full-image mask."""
    V = len(image_paths)
    return {
        "names": ["background"],
        "background__masks": np.ones((V, H, W), bool),
        "background__feats": np.zeros((V, 144), np.float32),
        "background__bboxes": np.full((V, 4), -1.0, np.float32),
    }


def run_yolo_on_frames(
    image_paths: List[str],
    model_name: str = "yolov8s-seg.pt",
    conf: float = 0.25,
    feat_dim: int = 144,
) -> Dict:
    """Run YOLOv8-seg over frames; merge per-class instance masks; pool feats.

    Mirrors get_object_masks (utils.py:364-477): per frame, all instances of a
    class are OR-merged into one mask; a 'background' pseudo-object gets the
    complement of the union of all object masks.
    """
    import cv2
    import torch
    from ultralytics import YOLO

    model = YOLO(model_name)
    torch_model = model.model  # backbone access for features

    per_obj_masks: Dict[str, list] = {}
    per_obj_feats: Dict[str, list] = {}
    per_obj_boxes: Dict[str, list] = {}
    H = W = None
    V = len(image_paths)

    feats_cache = []
    all_results = []
    for path in image_paths:
        img = cv2.imread(path)
        if H is None:
            H, W = img.shape[:2]
        res = model.predict(img, conf=conf, verbose=False)[0]
        all_results.append(res)

        # backbone features: penultimate layer activations, mean-pooled later
        with torch.no_grad():
            x = cv2.resize(img, (640, 640)).astype(np.float32) / 255.0
            x = torch.from_numpy(x).permute(2, 0, 1)[None]
            feats = torch_model(x)[1][0][2]  # [1, 144, 20, 20] (provider.py:282+)
        feats_cache.append(feats[0].numpy())

    names = set()
    for res in all_results:
        for c in (res.boxes.cls.tolist() if res.boxes is not None else []):
            names.add(res.names[int(c)])
    names = sorted(names)

    for obj in names:
        per_obj_masks[obj] = []
        per_obj_feats[obj] = []
        per_obj_boxes[obj] = []

    union_masks = []
    for v, res in enumerate(all_results):
        union = np.zeros((H, W), bool)
        frame_masks = {obj: np.zeros((H, W), bool) for obj in names}
        frame_boxes = {obj: np.full(4, -1.0, np.float32) for obj in names}
        if res.masks is not None:
            for mask, cls, box in zip(res.masks.data, res.boxes.cls, res.boxes.xyxy):
                obj = res.names[int(cls)]
                m = mask.cpu().numpy() > 0.5
                if m.shape != (H, W):
                    m = (
                        cv2.resize(
                            m.astype(np.uint8), (W, H),
                            interpolation=cv2.INTER_NEAREST,
                        )
                        > 0
                    )
                frame_masks[obj] |= m
                frame_boxes[obj] = np.asarray(box.cpu(), np.float32)
                union |= m
        union_masks.append(union)
        for obj in names:
            per_obj_masks[obj].append(frame_masks[obj])
            per_obj_boxes[obj].append(frame_boxes[obj])
            # 20x20 masked mean-pool of backbone features (provider.py:282-334)
            m20 = cv2.resize(frame_masks[obj].astype(np.uint8), (20, 20)) > 0
            f = feats_cache[v]  # [144, 20, 20]
            if m20.any():
                per_obj_feats[obj].append(f[:, m20].mean(-1))
            else:
                per_obj_feats[obj].append(np.zeros(f.shape[0], np.float32))

    out: Dict = {"names": names + ["background"]}
    for obj in names:
        out[f"{obj}__masks"] = np.stack(per_obj_masks[obj])
        out[f"{obj}__feats"] = np.stack(per_obj_feats[obj]).astype(np.float32)
        out[f"{obj}__bboxes"] = np.stack(per_obj_boxes[obj])
    out["background__masks"] = ~np.stack(union_masks)
    out["background__feats"] = np.stack(
        [f.mean((-2, -1)) for f in feats_cache]
    ).astype(np.float32)
    out["background__bboxes"] = np.full((V, 4), -1.0, np.float32)
    return out


def preprocess_scene(
    scene_dir: str,
    splits=("train", "val", "test"),
    model_name: str = "yolov8s-seg.pt",
    disable_yolo: bool = False,
):
    """CLI entry: write <scene>/yolo/<split>.npz for every split."""
    out_dir = os.path.join(scene_dir, "yolo")
    os.makedirs(out_dir, exist_ok=True)
    for split in splits:
        tj = os.path.join(scene_dir, f"transforms_{split}.json")
        if not os.path.exists(tj):
            tj = os.path.join(scene_dir, "transforms.json")
            if not os.path.exists(tj):
                continue
        with open(tj) as f:
            frames = json.load(f)["frames"]
        paths = []
        for fr in frames:
            p = os.path.join(scene_dir, fr["file_path"])
            if not os.path.splitext(p)[1]:
                p += ".png"
            if os.path.exists(p):
                paths.append(p)
        if not paths:
            continue
        if disable_yolo or not yolo_available():
            import imageio.v2 as imageio

            h, w = imageio.imread(paths[0]).shape[:2]
            data = background_only_masks(paths, h, w)
        else:
            data = run_yolo_on_frames(paths, model_name)
        names = data.pop("names")
        # per-row image paths (relative to the scene root): NeRFDataset aligns
        # masks/feats to its kept frames by this key, so sidecar row order is
        # decoupled from the provider's frame sorting and train/val splitting.
        rel_paths = np.array([os.path.relpath(p, scene_dir) for p in paths])
        np.savez_compressed(
            os.path.join(out_dir, f"{split}.npz"), names=names, paths=rel_paths, **data
        )
        print(f"[yolo] wrote {split}.npz with objects: {names}")


def load_sidecar(scene_dir: str, split: str) -> Optional[Dict]:
    path = os.path.join(scene_dir, "yolo", f"{split}.npz")
    if not os.path.exists(path):
        return None
    data = np.load(path, allow_pickle=False)
    if "paths" not in data.files:
        # A sidecar without per-row paths predates path-keyed alignment; the
        # provider would fall back to positional pairing, which its frame
        # sorting + split selection silently misalign. Refuse rather than
        # corrupt FOC masked training with wrong mask/image pairs.
        raise ValueError(
            f"{path} has no 'paths' key (written by an old preprocessing "
            "run); re-run `python -m focnerf_tpu.data.yolo_sidecar` for "
            "this scene to regenerate path-keyed sidecars"
        )
    return {k: data[k] for k in data.files}
