"""Hard procedural parity scene: thin structures + high-frequency texture.

The ±0.3 dB parity north star (BASELINE.md) is defined on real scenes
(fox / Lego / Table-top) that are not present in this image (zero egress).
This module is the strongest available stand-in (VERDICT r2 item 2a): a
Lego-like procedural object — a wireframe cube of ~2-voxel struts, a 3x3
pillar grid on a thin floor plate, and a center sphere carrying a
high-frequency 3-D checker/stripe texture — rendered to a blender-layout
dataset (transforms_{split}.json + RGBA PNGs) that the full CLI pipeline
consumes exactly like a real capture (ref data formats:
/root/reference/nerf/provider.py:123-128). Thin geometry stresses the
occupancy/marching stack; the HF texture stresses hash-grid capacity; both
are what separate a production config from a smoke test.

GT images come from a high-resolution voxelization rendered with the
shear-warp compositor — deterministic, exactly reproducible, and
self-consistent as a dataset (the renders ARE the ground truth).
"""

from __future__ import annotations

import json
import os

import numpy as np


def hard_volume(R: int = 256, bound: float = 1.0):
    """Procedural GT volume [R, R, R, 4] (rgb + sigma), numpy."""
    c = (np.arange(R, dtype=np.float32) + 0.5) / R * 2 * bound - bound
    X, Y, Z = np.meshgrid(c, c, c, indexing="ij")

    e = 0.6  # cube half-extent
    w = 1.6 * (2 * bound / R)  # strut half-width ~1.6 voxels: thin

    near_e = lambda A: np.abs(np.abs(A) - e) < w
    inside = lambda A: np.abs(A) < e + w

    # wireframe cube: at least two coords pinned to a face, third inside
    frame = (
        (near_e(X) & near_e(Y) & inside(Z))
        | (near_e(X) & near_e(Z) & inside(Y))
        | (near_e(Y) & near_e(Z) & inside(X))
    )

    # 3x3 pillar grid (radius ~1.6 voxels) standing on the floor plate
    pillars = np.zeros_like(frame)
    for px in (-0.3, 0.0, 0.3):
        for py in (-0.3, 0.0, 0.3):
            pillars |= ((X - px) ** 2 + (Y - py) ** 2 < w**2 * 4) & (
                np.abs(Z) < e
            )

    plate = (np.abs(Z + e) < w) & (np.abs(X) < e + w) & (np.abs(Y) < e + w)
    sphere = X**2 + Y**2 + Z**2 < 0.25**2

    geo = frame | pillars | plate | sphere
    sigma = np.where(geo, 60.0, 0.0).astype(np.float32)

    # high-frequency 3-D texture: checker x stripes, ~12 cycles across the
    # object — near the Nyquist limit of a 2048-res top hash level at 800^2
    f = 12.0 * np.pi / bound
    checker = 0.5 + 0.5 * np.sign(np.sin(f * X) * np.sin(f * Y) * np.sin(f * Z))
    stripes = 0.5 + 0.5 * np.sin(2.5 * f * (X + Y + Z) / 3.0)
    r = np.where(sphere, stripes, checker)
    g = np.where(frame | plate, 0.85, 0.25 + 0.5 * stripes)
    b = np.where(pillars, 0.9, 1.0 - checker)
    rgb = np.stack([r, g, b], -1).astype(np.float32)
    return np.concatenate([rgb, sigma[..., None]], -1)


def make_hard_scene(
    root: str,
    n_train: int = 50,
    n_val: int = 8,
    n_test: int = 8,
    H: int = 800,
    W: int = 800,
    gt_res: int = 256,
    radius: float = 2.5,
    bound: float = 1.0,
    seed: int = 0,
) -> str:
    """Write the blender-layout hard scene; returns ``root``.

    Skips regeneration when a matching scene already exists (a marker file
    records the generation parameters).
    """
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from focnerf_tpu.core.camera import rand_poses
    from focnerf_tpu.render.baked import BakedVolume, render_baked

    marker = os.path.join(root, "hard_scene.json")
    params = dict(
        n_train=n_train, n_val=n_val, n_test=n_test, H=H, W=W,
        gt_res=gt_res, radius=radius, bound=bound, seed=seed, version=1,
    )
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh) == params:
                return root

    os.makedirs(root, exist_ok=True)
    vol = BakedVolume(rgba=jnp.asarray(hard_volume(gt_res, bound)), bound=bound)
    fl = 1.2 * W
    fov_x = 2 * np.arctan(W / (2 * fl))

    # poses are written in nerf convention such that the provider's
    # nerf_matrix_to_ngp (scale=1, offset=0) lands back on our cameras —
    # same inversion as tests/helpers.py::make_synthetic_scene
    def ngp_to_nerf(ngp):
        out = np.eye(4, dtype=np.float32)
        out[1, :3] = ngp[0, :3] * np.array([1, -1, -1])
        out[2, :3] = ngp[1, :3] * np.array([1, -1, -1])
        out[0, :3] = ngp[2, :3] * np.array([1, -1, -1])
        out[1, 3] = ngp[0, 3]
        out[2, 3] = ngp[1, 3]
        out[0, 3] = ngp[2, 3]
        return out

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        frames = []
        poses = np.asarray(rand_poses(rng, n, radius=radius))
        img_dir = os.path.join(root, split)
        os.makedirs(img_dir, exist_ok=True)
        for i, pose in enumerate(poses):
            img, _, alpha = render_baked(
                vol, pose, (fl, fl, W / 2.0, H / 2.0), H, W, bg_color=1.0
            )
            rgba = np.concatenate(
                [np.asarray(img), np.asarray(alpha)[..., None]], -1
            )
            path = f"{split}/r_{i}"
            imageio.imwrite(
                os.path.join(root, path + ".png"),
                (np.clip(rgba, 0, 1) * 255).astype(np.uint8),
            )
            frames.append(
                {
                    "file_path": path,
                    "transform_matrix": ngp_to_nerf(pose).tolist(),
                }
            )
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as fh:
            json.dump({"camera_angle_x": float(fov_x), "frames": frames}, fh)
    with open(marker, "w") as fh:
        json.dump(params, fh)
    return root


def hard_dynamic_volume(R: int, t: float, bound: float = 1.0):
    """Time-conditioned hard volume: the textured center sphere ORBITS and
    a picket of thin pillars SWINGS with t, inside the static wireframe.
    Multiple views can supervise each timestamp, so per-t held-out PSNR is
    unambiguous (the one-view-per-time ambiguity of PARITY.md's dynamic
    rows cannot arise by construction)."""
    c = (np.arange(R, dtype=np.float32) + 0.5) / R * 2 * bound - bound
    X, Y, Z = np.meshgrid(c, c, c, indexing="ij")
    e = 0.6
    w = 1.6 * (2 * bound / R)

    near_e = lambda A: np.abs(np.abs(A) - e) < w
    inside = lambda A: np.abs(A) < e + w
    frame = (
        (near_e(X) & near_e(Y) & inside(Z))
        | (near_e(X) & near_e(Z) & inside(Y))
        | (near_e(Y) & near_e(Z) & inside(X))
    )

    ang = 2.0 * np.pi * t
    cx, cy = 0.3 * np.cos(ang), 0.3 * np.sin(ang)  # orbiting sphere
    sphere = (X - cx) ** 2 + (Y - cy) ** 2 + Z**2 < 0.2**2

    lean = 0.35 * np.sin(ang)  # pillars swing in x with height
    pillars = np.zeros_like(frame)
    for py in (-0.3, 0.0, 0.3):
        px = lean * (Z + e) / (2 * e)
        pillars |= ((X - px) ** 2 + (Y - py) ** 2 < w**2 * 4) & (np.abs(Z) < e)

    plate = (np.abs(Z + e) < w) & (np.abs(X) < e + w) & (np.abs(Y) < e + w)
    geo = frame | pillars | plate | sphere
    sigma = np.where(geo, 60.0, 0.0).astype(np.float32)

    f = 12.0 * np.pi / bound
    checker = 0.5 + 0.5 * np.sign(np.sin(f * X) * np.sin(f * Y) * np.sin(f * Z))
    stripes = 0.5 + 0.5 * np.sin(2.5 * f * ((X - cx) + (Y - cy) + Z) / 3.0)
    r = np.where(sphere, stripes, checker)
    g = np.where(frame | plate, 0.85, 0.25 + 0.5 * stripes)
    b = np.where(pillars, 0.9, 1.0 - checker)
    rgb = np.stack([r, g, b], -1).astype(np.float32)
    return np.concatenate([rgb, sigma[..., None]], -1)


def make_hard_dynamic_scene(
    root: str,
    n_times: int = 8,
    views_per_time: int = 4,
    n_val_times: int = 4,
    H: int = 400,
    W: int = 400,
    gt_res: int = 128,
    radius: float = 2.5,
    bound: float = 1.0,
    seed: int = 0,
) -> str:
    """Blender-layout DYNAMIC scene with ``views_per_time`` distinct poses
    per timestamp (train) and one held-out pose per val timestamp; frames
    carry a ``time`` field for the dnerf provider. Returns ``root``."""
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from focnerf_tpu.core.camera import rand_poses
    from focnerf_tpu.render.baked import BakedVolume, render_baked

    marker = os.path.join(root, "hard_dynamic_scene.json")
    params = dict(
        n_times=n_times, views_per_time=views_per_time,
        n_val_times=n_val_times, H=H, W=W, gt_res=gt_res, radius=radius,
        bound=bound, seed=seed, version=1,
    )
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh) == params:
                return root

    os.makedirs(root, exist_ok=True)
    fl = 1.2 * W
    fov_x = 2 * np.arctan(W / (2 * fl))

    def ngp_to_nerf(ngp):
        out = np.eye(4, dtype=np.float32)
        out[1, :3] = ngp[0, :3] * np.array([1, -1, -1])
        out[2, :3] = ngp[1, :3] * np.array([1, -1, -1])
        out[0, :3] = ngp[2, :3] * np.array([1, -1, -1])
        out[1, 3] = ngp[0, 3]
        out[2, 3] = ngp[1, 3]
        out[0, 3] = ngp[2, 3]
        return out

    rng = np.random.default_rng(seed)
    vols = {}

    def vol_at(t):
        if t not in vols:
            vols[t] = BakedVolume(
                rgba=jnp.asarray(hard_dynamic_volume(gt_res, t, bound)),
                bound=bound,
            )
        return vols[t]

    for split, times, vpt in (
        ("train", np.linspace(0, 1, n_times), views_per_time),
        ("val", np.linspace(0, 1, n_val_times), 1),
        ("test", np.linspace(0, 1, n_val_times), 1),
    ):
        frames = []
        img_dir = os.path.join(root, split)
        os.makedirs(img_dir, exist_ok=True)
        i = 0
        for t in times:
            poses = np.asarray(rand_poses(rng, vpt, radius=radius))
            for pose in poses:
                img, _, alpha = render_baked(
                    vol_at(float(t)), pose, (fl, fl, W / 2.0, H / 2.0), H, W,
                    bg_color=1.0,
                )
                rgba = np.concatenate(
                    [np.asarray(img), np.asarray(alpha)[..., None]], -1
                )
                path = f"{split}/r_{i}"
                imageio.imwrite(
                    os.path.join(root, path + ".png"),
                    (np.clip(rgba, 0, 1) * 255).astype(np.uint8),
                )
                frames.append({
                    "file_path": path,
                    "time": float(t),
                    "transform_matrix": ngp_to_nerf(pose).tolist(),
                })
                i += 1
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as fh:
            json.dump({"camera_angle_x": float(fov_x), "frames": frames}, fh)
    with open(marker, "w") as fh:
        json.dump(params, fh)
    return root
