"""Dataset provider: transforms.json scenes -> device-resident ray batches.

Parity target: ``NeRFDataset`` (nerf/provider.py:91-459):

  - colmap / blender layout autodetect (:123-128): blender has
    ``transforms_{split}.json``, colmap a single ``transforms.json`` whose
    frames are split train/val by every-8th-frame holdout;
  - ``nerf_matrix_to_ngp`` pose conversion with scale/offset (:24-32, :221);
  - intrinsics from fl_x/fl_y or camera_angle_x/y (:381-396);
  - optional downscale, RGBA via object masks, preload to device;
  - colmap test split: slerp between two random poses (:174-195);
  - per-step batch: one random image, N sampled pixel rays + GT colors
    (``collate`` :398-447) — assembled here fully on device.

TPU-first changes: images are preloaded to HBM as one [V, H*W, C] array
(fp16/fp32), batch assembly (pixel sampling, ray gen, GT gather) is a single
jitted function instead of CUDA work inside a DataLoader collate; YOLO runs
offline (data/yolo_sidecar.py) and its masks/features are loaded from npz.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.core.camera import nerf_matrix_to_ngp, rand_poses
from focnerf_tpu.core.rays import get_rays, sample_ray_indices


def make_batch_assemble(H: int, W: int, num_rays: int, intrinsics, patch_size: int = 1):
    """Pure batch assembler: (rng, view, poses, images, masks, obj_feats,
    error_map) -> train-step batch dict. The on-device equivalent of the
    reference's DataLoader collate + get_rays (nerf/provider.py:398-447,
    nerf/utils.py:56-157); module-level so the fused K-step scan
    (train/fused.py) can trace the identical function."""

    def _assemble(rng, view_idx, poses, images, masks, obj_feats, error_map):
        k1, k2 = jax.random.split(rng)
        em = None if error_map is None else error_map[view_idx]
        inds, inds_coarse = sample_ray_indices(
            k1, H, W, num_rays, error_map=em, patch_size=patch_size
        )
        rays = get_rays(poses[view_idx], intrinsics, H, W, inds=inds)
        batch = {
            "rays_o": rays["rays_o"],
            "rays_d": rays["rays_d"],
            "pixels": images[view_idx][inds].astype(jnp.float32),
        }
        if masks is not None:
            batch["ray_mask"] = masks[view_idx][inds]
        if obj_feats is not None:
            batch["obj_feat"] = obj_feats[view_idx]
        if inds_coarse is not None:
            batch["inds_coarse"] = inds_coarse
        batch["view"] = view_idx
        return batch

    return _assemble


@dataclasses.dataclass
class DatasetOptions:
    path: str
    scale: float = 0.33
    offset: tuple = (0.0, 0.0, 0.0)
    downscale: int = 1
    num_rays: int = 4096
    preload_dtype: str = "float32"  # or "float16" (ref --fp16 preload)
    rand_pose: int = -1  # <0: never, 0: always, >0: every Nth batch
    radius: float = 5.0  # rand-pose orbit radius
    error_map: bool = False
    patch_size: int = 1
    color_space: str = "srgb"
    # camera pose x-shift for editing previews (--edit_x, provider.py:221-222)
    edit_x: float = 0.0
    # host input pipeline: keep the image stack on the host as uint8 and
    # sample batches with the native threaded loader (data/native_loader.py)
    # instead of preloading to HBM — for stacks larger than device memory.
    # Incompatible with error_map/patch sampling (uniform sampling only).
    host_pipeline: bool = False


def _load_image(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    img = imageio.imread(path)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    return img


def _slerp(p0: np.ndarray, p1: np.ndarray, ratio: float) -> np.ndarray:
    """Pose interpolation for the colmap synthetic test split (provider.py:174-195)."""
    from scipy.spatial.transform import Rotation, Slerp

    rots = Rotation.from_matrix(np.stack([p0[:3, :3], p1[:3, :3]]))
    slerp = Slerp([0, 1], rots)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = slerp(ratio).as_matrix()
    pose[:3, 3] = (1 - ratio) * p0[:3, 3] + ratio * p1[:3, 3]
    return pose


class NeRFDataset:
    """Loads a scene and serves jitted on-device training/eval batches."""

    def __init__(
        self,
        opt: DatasetOptions,
        split: str = "train",
        mask_details: Optional[Dict] = None,
        detected_object: str = "background",
        n_test: int = 10,
    ):
        self.opt = opt
        self.split = split
        self.training = split in ("train", "all", "trainval")
        self.detected_object = detected_object
        root = opt.path

        # ---- layout autodetect (provider.py:123-128)
        if os.path.exists(os.path.join(root, "transforms.json")):
            self.mode = "colmap"
            with open(os.path.join(root, "transforms.json")) as f:
                transform = json.load(f)
        elif os.path.exists(os.path.join(root, f"transforms_{split}.json")):
            self.mode = "blender"
            with open(os.path.join(root, f"transforms_{split}.json")) as f:
                transform = json.load(f)
        elif split == "val" and os.path.exists(os.path.join(root, "transforms_test.json")):
            # some blender scenes lack a val split; fall back to test
            self.mode = "blender"
            with open(os.path.join(root, "transforms_test.json")) as f:
                transform = json.load(f)
        else:
            raise FileNotFoundError(f"no transforms json found under {root}")

        self.H = self.W = None
        if "h" in transform and "w" in transform:
            self.H = int(transform["h"]) // opt.downscale
            self.W = int(transform["w"]) // opt.downscale

        frames = transform["frames"]
        # the reference sorts frames by file_path in ALL modes (provider.py:168)
        frames = sorted(frames, key=lambda d: d["file_path"])

        poses: List[np.ndarray] = []
        images: List[np.ndarray] = []
        self.paths: List[str] = []

        if self.mode == "colmap" and split == "test":
            # synthetic smooth path between two random poses (provider.py:174-195)
            rng = np.random.default_rng(0)
            i0, i1 = rng.choice(len(frames), 2, replace=False)
            f0 = nerf_matrix_to_ngp(
                np.array(frames[i0]["transform_matrix"], np.float32), opt.scale, opt.offset
            )
            f1 = nerf_matrix_to_ngp(
                np.array(frames[i1]["transform_matrix"], np.float32), opt.scale, opt.offset
            )
            for i in range(n_test + 1):
                # sine-eased interpolation ratio (provider.py:190)
                ratio = np.sin(((i / n_test) - 0.5) * np.pi) * 0.5 + 0.5
                poses.append(_slerp(f0, f1, ratio))
            if self.H is None:  # no h/w in json: peek at one frame for dims
                for fr in frames:
                    p = os.path.join(root, fr["file_path"])
                    if not os.path.splitext(p)[1]:
                        p += ".png"
                    if os.path.exists(p):
                        img = _load_image(p)
                        self.H = img.shape[0] // opt.downscale
                        self.W = img.shape[1] // opt.downscale
                        break
        else:
            if self.mode == "colmap" and split in ("train", "val"):
                # reference split: first sorted frame is val, rest are train
                # (provider.py:196-200)
                frames = frames[1:] if split == "train" else frames[:1]
            for f in frames:
                pose = nerf_matrix_to_ngp(
                    np.array(f["transform_matrix"], np.float32), opt.scale, opt.offset
                )
                if opt.edit_x:
                    pose[0, 3] += opt.edit_x
                img_path = os.path.join(root, f["file_path"])
                if not os.path.splitext(img_path)[1]:  # blender omits extensions
                    img_path += ".png"
                if not os.path.exists(img_path):
                    continue
                img = _load_image(img_path)
                if self.H is None:
                    self.H = img.shape[0] // opt.downscale
                    self.W = img.shape[1] // opt.downscale
                if img.shape[0] != self.H or img.shape[1] != self.W:
                    import cv2

                    img = cv2.resize(img, (self.W, self.H), interpolation=cv2.INTER_AREA)
                if img.ndim == 2:
                    img = np.repeat(img[..., None], 3, axis=-1)
                poses.append(pose)
                images.append(img.astype(np.float32))
                self.paths.append(img_path)

        self.poses = np.stack(poses).astype(np.float32)  # [V, 4, 4]
        self.n_views = len(self.poses)

        # ---- per-object masking (FOC): apply object mask as the alpha channel
        # mask_details: {"masks": [V, H, W] bool, "feats": [V, F], "paths": [V]}.
        # When "paths" is present (the yolo sidecar records the image path of
        # every row), rows are aligned to the kept frames BY PATH — immune to
        # frame sorting and to the colmap train/val split applied above. The
        # positional fallback is only for hand-built mask dicts (tests).
        self.obj_feats = None
        self.masks = None
        if mask_details is not None and images:
            masks_arr = np.asarray(mask_details["masks"])
            feats_arr = np.asarray(mask_details.get("feats"), np.float32) if (
                mask_details.get("feats") is not None
            ) else np.zeros((len(images), 144), np.float32)
            row_of: Optional[Dict[str, int]] = None
            if mask_details.get("paths") is not None:
                # sidecar rows are keyed by path relative to the scene root
                row_of = {
                    os.path.normpath(str(p)): i
                    for i, p in enumerate(mask_details["paths"])
                }
            masked, feats, msks = [], [], []
            for i, img in enumerate(images):
                if row_of is not None:
                    key = os.path.normpath(os.path.relpath(self.paths[i], root))
                    if key not in row_of:
                        raise KeyError(
                            f"yolo sidecar has no row for image {key}; "
                            "re-run the yolo preprocessing for this scene"
                        )
                    i = row_of[key]
                mask = masks_arr[i] if i < len(masks_arr) else np.ones((self.H, self.W), bool)
                if mask.shape != (self.H, self.W):
                    import cv2

                    mask = (
                        cv2.resize(
                            mask.astype(np.uint8), (self.W, self.H),
                            interpolation=cv2.INTER_NEAREST,
                        )
                        > 0
                    )
                feat = feats_arr[i] if i < len(feats_arr) else np.zeros(144, np.float32)
                rgb = img[..., :3]
                rgba = np.concatenate([rgb, mask[..., None].astype(np.float32)], axis=-1)
                masked.append(rgba)
                feats.append(feat)
                msks.append(mask)
            images = masked
            self.obj_feats = np.stack(feats)  # [V, F]
            self.masks = np.stack(msks)  # [V, H, W] bool

        # ---- preload to device (provider.py:368-378), or keep on host
        self.images = None
        self.images_host: Optional[np.ndarray] = None
        self._native_loader = None
        if images:
            arr = np.stack(images)  # [V, H, W, C] float in [0, 1]
            from focnerf_tpu.data import native_loader as _nl

            if self.opt.host_pipeline and self.training and not _nl.available():
                print("[WARN] native loader unavailable; preloading to device")
            if self.opt.host_pipeline and self.training and _nl.available():
                assert not self.opt.error_map and self.opt.patch_size <= 1, (
                    "host_pipeline samples uniformly (no error-map/patch modes)"
                )
                self.images_host = np.ascontiguousarray(
                    np.clip(arr.reshape(self.n_views, -1, arr.shape[-1]) * 255.0 + 0.5,
                            0, 255).astype(np.uint8)
                )
            else:
                dtype = jnp.float16 if self.opt.preload_dtype == "float16" else jnp.float32
                self.images = jax.device_put(
                    jnp.asarray(arr.reshape(self.n_views, -1, arr.shape[-1]), dtype)
                )
        self.poses_dev = jax.device_put(jnp.asarray(self.poses))
        if self.masks is not None:
            self.masks_dev = jax.device_put(jnp.asarray(self.masks.reshape(self.n_views, -1)))
        else:
            self.masks_dev = None
        if self.obj_feats is not None:
            self.obj_feats_dev = jax.device_put(jnp.asarray(self.obj_feats))
        else:
            self.obj_feats_dev = None

        # ---- intrinsics (provider.py:380-396)
        t = transform
        if "fl_x" in t or "fl_y" in t:
            fl_x = (t.get("fl_x") or t.get("fl_y")) / opt.downscale
            fl_y = (t.get("fl_y") or t.get("fl_x")) / opt.downscale
        elif "camera_angle_x" in t or "camera_angle_y" in t:
            fl_x = (
                self.W / (2 * np.tan(t["camera_angle_x"] / 2)) if "camera_angle_x" in t else None
            )
            fl_y = (
                self.H / (2 * np.tan(t["camera_angle_y"] / 2)) if "camera_angle_y" in t else None
            )
            fl_x = fl_x if fl_x is not None else fl_y
            fl_y = fl_y if fl_y is not None else fl_x
        else:
            raise RuntimeError("no focal length in transforms json")
        cx = t.get("cx", self.W / 2) / opt.downscale if "cx" in t else self.W / 2
        cy = t.get("cy", self.H / 2) / opt.downscale if "cy" in t else self.H / 2
        self.intrinsics = np.array([fl_x, fl_y, cx, cy], np.float32)

        # error map state (provider.py:361-364)
        self.error_map = (
            jnp.full((self.n_views, 128 * 128), 0.1) if (opt.error_map and self.training) else None
        )

        self._train_batch_jit = None

    @property
    def has_gt(self) -> bool:
        return self.images is not None or self.images_host is not None

    # ------------------------------------------------------------------ batches
    def assemble_fn(self):
        """Pure jittable batch assembler for this dataset's static shape —
        shared by the per-step path and the fused K-step scan
        (train/fused.py), so both produce bit-identical batches."""
        return make_batch_assemble(
            self.H, self.W, self.opt.num_rays, self.intrinsics,
            patch_size=self.opt.patch_size,
        )

    def fused_batch_inputs(self):
        """Device arrays consumed by the fused chunk, in assemble order."""
        return (self.poses_dev, self.images, self.masks_dev, self.obj_feats_dev)

    def train_batch(self, rng: jax.Array, view: Optional[int] = None):
        """One training batch: random view, ``num_rays`` sampled pixels.

        Fully on-device equivalent of collate + get_rays (provider.py:398-447).
        Returns the dict consumed by train.steps.make_train_step.
        """
        if self.images_host is not None:
            return self._host_train_batch(view)
        if self._train_batch_jit is None:
            self._train_batch_jit = jax.jit(self.assemble_fn())

        if view is None:
            # keep the draw ON DEVICE: int(...) here would force a
            # device->host fetch per step — on the tunneled chip that sync
            # flushes the dispatch pipeline and costs a full RTT (~100 ms/
            # step measured at the production parity config, vs ~23 ms of
            # compute). Same PRNG draw either way, so batches are
            # bit-identical to the synced version.
            view = jax.random.randint(
                jax.random.fold_in(rng, 17), (), 0, self.n_views
            )
        return self._train_batch_jit(
            rng,
            jnp.asarray(view, jnp.int32),
            self.poses_dev,
            self.images,
            self.masks_dev,
            self.obj_feats_dev,
            self.error_map,
        )

    def _host_train_batch(self, view: Optional[int] = None):
        """Batch via the native threaded loader (host_pipeline=True): the C++
        workers pre-sample (view, indices, pixels) so the host never blocks;
        rays are derived on-device from the sampled indices."""
        from focnerf_tpu.data.native_loader import NativeBatchLoader

        if self._native_loader is None:
            self._native_loader = NativeBatchLoader(
                self.images_host, self.opt.num_rays, n_threads=2, seed=1234
            )

            H, W = self.H, self.W

            def _assemble(view_idx, inds, pixels, poses, masks, obj_feats):
                rays = get_rays(poses[view_idx], self.intrinsics, H, W, inds=inds)
                batch = {
                    "rays_o": rays["rays_o"],
                    "rays_d": rays["rays_d"],
                    "pixels": pixels,
                    "view": view_idx,
                }
                if masks is not None:
                    batch["ray_mask"] = masks[view_idx][inds]
                if obj_feats is not None:
                    batch["obj_feat"] = obj_feats[view_idx]
                return batch

            self._host_assemble_jit = jax.jit(_assemble)

        if view is not None:
            raise ValueError("host_pipeline samples its own views (view=None)")
        v, inds, pixels = self._native_loader.next()
        return self._host_assemble_jit(
            jnp.int32(v), jnp.asarray(inds), jnp.asarray(pixels),
            self.poses_dev, self.masks_dev, self.obj_feats_dev,
        )

    def eval_view(self, view: int):
        """Full-image rays + GT for one view (eval/test loops)."""
        rays = get_rays(self.poses_dev[view], self.intrinsics, self.H, self.W)
        out = {
            "rays_o": rays["rays_o"],
            "rays_d": rays["rays_d"],
            "H": self.H,
            "W": self.W,
            "pose": self.poses[view],
        }
        if self.images is not None:
            out["pixels"] = self.images[view].astype(jnp.float32)
        elif self.images_host is not None:
            out["pixels"] = jnp.asarray(
                self.images_host[view].astype(np.float32) / 255.0
            )
        if self.obj_feats_dev is not None:
            out["obj_feat"] = self.obj_feats_dev[view]
        return out

    def rand_pose_batch(self, rng: jax.Array, rng_np: np.random.Generator):
        """GT-free random-pose batch for CLIP-guided training (provider.py:404-418)."""
        s = int(np.sqrt(self.H * self.W / self.opt.num_rays))
        rH, rW = self.H // s, self.W // s
        pose = rand_poses(rng_np, 1, radius=self.opt.radius)[0]
        rays = get_rays(jnp.asarray(pose), self.intrinsics / s, rH, rW)
        return {"rays_o": rays["rays_o"], "rays_d": rays["rays_d"], "H": rH, "W": rW}
