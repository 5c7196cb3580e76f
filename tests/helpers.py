"""Test helpers: write a tiny blender-style synthetic scene to disk."""

import json
import os

import numpy as np


def make_synthetic_scene(
    root: str,
    n_train: int = 6,
    n_val: int = 2,
    H: int = 32,
    W: int = 32,
    radius: float = 2.5,
    sphere_r: float = 0.5,
    rgba: bool = True,
):
    """Blender-layout scene: transforms_{train,val,test}.json + PNG renders of
    an analytic two-color sphere. Poses are already in ngp convention, so the
    provider's nerf_matrix_to_ngp is inverted here (we write poses whose ngp
    conversion lands back on our cameras).
    """
    import imageio.v2 as imageio

    from focnerf_tpu.core.camera import rand_poses
    from focnerf_tpu.core.rays import get_rays
    import jax.numpy as jnp

    os.makedirs(root, exist_ok=True)
    fov_x = 2 * np.arctan(W / (2 * W * 1.2))  # fl_x = 1.2 * W
    fl = 1.2 * W

    def ngp_to_nerf(ngp):
        """Inverse of nerf_matrix_to_ngp with scale=1, offset=0."""
        out = np.eye(4, dtype=np.float32)
        # ngp rows (0,1,2) came from nerf rows (1,2,0) with negated cols 1,2
        out[1, :3] = ngp[0, :3] * np.array([1, -1, -1])
        out[2, :3] = ngp[1, :3] * np.array([1, -1, -1])
        out[0, :3] = ngp[2, :3] * np.array([1, -1, -1])
        out[1, 3] = ngp[0, 3]
        out[2, 3] = ngp[1, 3]
        out[0, 3] = ngp[2, 3]
        return out

    rng = np.random.default_rng(0)

    def render_gt(pose):
        rays = get_rays(jnp.asarray(pose), (fl, fl, W / 2, H / 2), H, W)
        o, d = np.asarray(rays["rays_o"]), np.asarray(rays["rays_d"])
        b = np.sum(o * d, -1)
        c = np.sum(o * o, -1) - sphere_r**2
        disc = b * b - c
        t = -b - np.sqrt(np.maximum(disc, 0))
        hit = (disc > 0) & (t > 0)
        pt = o + t[:, None] * d
        rgb = np.ones((o.shape[0], 3), np.float32)
        rgb[hit] = np.where(pt[hit, 1:2] > 0, [[0.9, 0.2, 0.1]], [[0.1, 0.3, 0.9]])
        alpha = hit.astype(np.float32)
        return rgb.reshape(H, W, 3), alpha.reshape(H, W)

    for split, n in (("train", n_train), ("val", n_val), ("test", n_val)):
        frames = []
        poses = rand_poses(rng, n, radius=radius)
        img_dir = os.path.join(root, split)
        os.makedirs(img_dir, exist_ok=True)
        for i, ngp_pose in enumerate(poses):
            rgb, alpha = render_gt(ngp_pose)
            if rgba:
                img = np.concatenate([rgb, alpha[..., None]], -1)
            else:
                img = rgb
            path = f"{split}/r_{i}"
            imageio.imwrite(
                os.path.join(root, path + ".png"), (np.clip(img, 0, 1) * 255).astype(np.uint8)
            )
            frames.append(
                {
                    "file_path": path,
                    "time": i / max(n - 1, 1),
                    "transform_matrix": ngp_to_nerf(ngp_pose).tolist(),
                }
            )
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": float(fov_x), "frames": frames}, f)
    return root
