"""Baked real-time rendering: dense voxel bake + shear-warp compositing.

The TPU-native answer to the reference's interactive `run_cuda` inference
loop (nerf/renderer.py:318-354) and the 30 FPS composition target
(COMBINED.py:592-618): per-sample hash-grid gathers can never reach real
time on TPU (random-row gathers run at ~0.1 G rows/s on v5e — PERF.md), so
inference is *baked* SNeRG-style into a dense RGBA voxel grid once per
trained object, and frames are rendered with the shear-warp factorization
(Lacroute & Levoy):

  1. pick the volume axis most aligned with the view direction;
  2. every slice along that axis maps to a common reference plane through a
     per-slice uniform scale+translation (perspective projection through the
     eye) — a SEPARABLE resampling, executed as two small matmuls per slice
     on the MXU (interpolation matrices are built on the fly from iota math);
  3. slices composite front-to-back into an intermediate image with dense
     VPU ops (per-pixel dt from the ray obliquity, exact for the pinhole);
  4. one final projective warp maps the intermediate image to screen pixels
     (the only gather in the pipeline: H*W indices per frame, each fetching a
     (2,2) bilinear footprint).

Multi-object composition collapses to a *bake-time* voxel merge by max
density (the per-sample argmax fusion of COMBINED.py:247-251 evaluated on
the voxel grid), so frame cost is O(1) in object count; rigid editing
(editable.py:443-471) becomes a voxel-space shift of one object's volume
before the merge.

View dependence: the bake evaluates the color net with the outward radial
direction per voxel (a diffuse approximation; the exact per-sample path
remains available for quality evals). Measured PSNR of baked vs per-sample
renders is recorded in PERF.md.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BakedVolume(NamedTuple):
    """Dense bake. ``rgba`` is [R, R, R, P+1]: P payload channels + raw sigma
    last, axes (x, y, z), world [-b, b]. P == 3 is plain rgb (sh_deg == 0);
    with sh_deg = n the payload is 3*n^2 SH coefficients (layout [l, rgb])
    contracted against the per-ray basis at render time."""

    rgba: jax.Array
    bound: float
    sh_deg: int = 0


class QuantizedVolume(NamedTuple):
    """uint8-RESIDENT bake: the volume stays uint8 in HBM and dequantizes
    INSIDE the compositing fold, so per-frame volume reads cost 1/4 the
    fp32 (1/2 the bf16) bandwidth — the lever at 512^3+, where the frame is
    volume-read-bound (VERDICT r2 item 5). Payload channels are affine
    (q/255 * scale + lo); the sigma channel stores sqrt(sigma)/sqrt_max
    (render sensitivity concentrates near the transparent end) with its
    sqrt_max in ``scales[-1]`` and ``los[-1] == 0``."""

    q: jax.Array  # [R, R, R, P+1] uint8
    scales: jax.Array  # [P+1] float32
    los: jax.Array  # [P+1] float32
    bound: float
    sh_deg: int = 0


def quantize_volume(vol) -> QuantizedVolume:
    """In-memory uint8 quantization (same math as save_volume(quantize=True));
    idempotent on an already-quantized volume."""
    if isinstance(vol, QuantizedVolume):
        return vol
    rgba = np.asarray(vol.rgba, np.float32)
    payload, sigma = rgba[..., :-1], rgba[..., -1:]
    lo = payload.min(axis=(0, 1, 2))
    hi = payload.max(axis=(0, 1, 2))
    scale = np.where(hi > lo, hi - lo, 1.0).astype(np.float32)
    qp = np.clip(np.round((payload - lo) / scale * 255.0), 0, 255)
    s_max = float(max(np.sqrt(sigma.max()), 1e-8))
    qs = np.clip(np.round(np.sqrt(np.maximum(sigma, 0.0)) / s_max * 255.0), 0, 255)
    return QuantizedVolume(
        q=jnp.asarray(np.concatenate([qp, qs], -1).astype(np.uint8)),
        scales=jnp.asarray(np.concatenate([scale, [s_max]]).astype(np.float32)),
        los=jnp.asarray(np.concatenate([lo, [0.0]]).astype(np.float32)),
        bound=vol.bound,
        sh_deg=vol.sh_deg,
    )


def dequantize_volume(qvol: QuantizedVolume) -> BakedVolume:
    """Dense fp32 view of a quantized volume (for compose/merge/mesh paths)."""
    x = qvol.q.astype(jnp.float32) / 255.0
    y = x * qvol.scales + qvol.los
    y = y.at[..., -1].set(y[..., -1] ** 2)  # sigma stored in sqrt space
    return BakedVolume(rgba=y, bound=qvol.bound, sh_deg=qvol.sh_deg)


# --------------------------------------------------------------------- bake
def bake_field(
    params,
    cfg,
    *,
    resolution: int = 256,
    obj_feat: Optional[jax.Array] = None,
    occ_bits: Optional[jax.Array] = None,
    grid_size: int = 128,
    chunk: int = 2**16,
    sh_degree: int = 0,
    n_dirs: int = 48,
) -> BakedVolume:
    """Evaluate a trained field on a dense voxel grid.

    ``occ_bits`` ([CAS, grid_size^3] or [grid_size^3]) optionally zeroes
    density outside the trained occupancy (suppresses hash-collision noise in
    never-seen space, like the bitfield does for the marching renderer).

    ``sh_degree`` > 0 bakes VIEW-DEPENDENT color: the color net is sampled at
    ``n_dirs`` Fibonacci-sphere directions per voxel and least-squares
    projected onto sh_degree^2 SH basis functions per color channel (the
    SNeRG-style factorization); the renderer contracts the coefficients with
    the per-ray basis. 0 keeps the diffuse radial-direction bake.
    """
    from focnerf_tpu.models.nerf import color_fn, density_fn, encode_objfeat

    R = resolution
    b = float(cfg.bound)
    centers = (jnp.arange(R, dtype=jnp.float32) + 0.5) / R * (2 * b) - b
    X, Y, Z = jnp.meshgrid(centers, centers, centers, indexing="ij")
    pts = jnp.stack([X, Y, Z], -1).reshape(-1, 3)  # [R^3, 3] x-major

    objfeat_enc = None
    if cfg.use_objfeat:
        assert obj_feat is not None, "cfg.use_objfeat=True requires obj_feat"
        objfeat_enc = encode_objfeat(params, cfg, obj_feat)

    n = pts.shape[0]
    pad = (-n) % chunk
    pts_p = jnp.pad(pts, ((0, pad), (0, 0))).reshape(-1, chunk, 3)

    # python loop over a single compiled chunk, NOT lax.map: the hash-grid
    # MXU forward scans internally, and a scan nested in an outer loop
    # compiles pathologically (PERF.md); per-dispatch overhead is ~1.6 ms
    # against a multi-ms chunk.
    #
    # The encode runs in "gather" mode here: the MXU one-hot forward trades
    # gathers for synthetic matmul flops — a winning trade at train batch
    # sizes (~130k samples) but ~1 PFLOP of one-hots at bake scale (R^3*8
    # corners); plain gathers are ~20 s for a 256^3 bake.
    from focnerf_tpu.ops import hashgrid as _hg

    if sh_degree > 0:
        from focnerf_tpu.ops.sh import sh_encode

        # Fibonacci sphere directions + least-squares SH projection matrix
        i = np.arange(n_dirs, dtype=np.float64) + 0.5
        phi = np.arccos(1.0 - 2.0 * i / n_dirs)
        theta = np.pi * (1.0 + 5.0**0.5) * i
        dirs_np = np.stack(
            [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)],
            -1,
        ).astype(np.float32)  # [D, 3]
        Ymat = np.asarray(sh_encode(jnp.asarray(dirs_np), sh_degree))  # [D, L]
        proj = jnp.asarray(np.linalg.pinv(Ymat))  # [L, D]
        dirs_dev = jnp.asarray(dirs_np)

        @jax.jit
        def eval_chunk(p):
            sigma, geo = density_fn(params, cfg, p)
            n_pts = p.shape[0]
            d_all = jnp.broadcast_to(dirs_dev[:, None, :], (n_dirs, n_pts, 3))
            geo_all = jnp.broadcast_to(geo[None], (n_dirs,) + geo.shape)
            rgb = color_fn(params, cfg, d_all, geo_all, objfeat_enc)  # [D, n, 3]
            coef = jnp.einsum("ld,dnc->nlc", proj, rgb)  # [n, L, 3]
            return jnp.concatenate(
                [coef.reshape(n_pts, -1), sigma[..., None]], -1
            )
    else:

        @jax.jit
        def eval_chunk(p):
            sigma, geo = density_fn(params, cfg, p)
            d = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-6)
            rgb = color_fn(params, cfg, d, geo, objfeat_enc)
            return jnp.concatenate([rgb, sigma[..., None]], -1)

    prev_mode = _hg.FORWARD_MODE
    _hg.FORWARD_MODE = "gather"
    try:
        rgba = jnp.concatenate(
            [eval_chunk(pts_p[i]) for i in range(pts_p.shape[0])]
        )[:n]
    finally:
        _hg.FORWARD_MODE = prev_mode

    if occ_bits is not None:
        occ2 = occ_bits.reshape(-1, grid_size**3)  # [CAS, H^3]
        cas = occ2.shape[0]
        # look each bake voxel up in the cascade that OWNS its position
        # (mip_from_pos with dt->0, matching the marcher's _mip_level /
        # raymarching.cu:42-54): cascade c covers [-2^c, 2^c], so a plain
        # .any() union reads every cascade at the wrong scale for bound > 1
        # (holes where the coarse grid decayed, phantom bits elsewhere).
        _, e_pos = jnp.frexp(jnp.max(jnp.abs(pts), axis=-1))
        level = jnp.clip(e_pos, 0, cas - 1)
        mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), b)
        cell = jnp.clip(
            (0.5 * (pts / mip_bound[:, None] + 1.0) * grid_size).astype(jnp.int32),
            0, grid_size - 1,
        )
        lin = (cell[:, 0] * grid_size + cell[:, 1]) * grid_size + cell[:, 2]
        occ_r = occ2[level, lin]
        rgba = rgba.at[:, -1].set(jnp.where(occ_r, rgba[:, -1], 0.0))

    ch = rgba.shape[-1]
    return BakedVolume(
        rgba=rgba.reshape(R, R, R, ch), bound=b, sh_deg=sh_degree
    )


def save_volume(path: str, vol, quantize: bool = False) -> None:
    """Persist a baked volume.

    Default: npz with float16 payload (1/2 the bytes; the shear-warp path
    resamples in bf16 anyway). ``quantize=True`` stores uint8 instead —
    1/4 the bytes of fp32 serving state — with per-channel affine scales:
    payload channels quantize over their own [min, max]; density quantizes
    over [0, max] in SQRT space (sigma spans orders of magnitude and the
    render is most sensitive near the transparent end). Quality gate in
    tests/test_baked.py (sphere-scene render within ~0.5 dB of fp16).

    Accepts a QuantizedVolume too: saved directly when quantize=True,
    dequantized first for the fp16 format."""
    if isinstance(vol, QuantizedVolume) and not quantize:
        vol = dequantize_volume(vol)
    if not quantize:
        np.savez_compressed(
            path,
            rgba=np.asarray(vol.rgba, np.float16),
            bound=np.float32(vol.bound),
            sh_deg=np.int32(vol.sh_deg),
        )
        return
    qvol = quantize_volume(vol)  # single source for the quantization math
    q = np.asarray(qvol.q)
    np.savez_compressed(
        path,
        q_payload=q[..., :-1],
        q_sigma=q[..., -1],
        lo=np.asarray(qvol.los[:-1]),
        scale=np.asarray(qvol.scales[:-1]),
        sigma_sqrt_max=np.float32(qvol.scales[-1]),
        bound=np.float32(vol.bound),
        sh_deg=np.int32(vol.sh_deg),
    )


def load_volume(path: str, resident: bool = False):
    """Load a baked volume (fp16 or uint8-quantized — autodetected).

    ``resident=True`` on a quantized file returns a QuantizedVolume that
    stays uint8 in HBM (1/4 the serving bytes AND 1/4 the per-frame read
    bandwidth — dequantization happens inside the compositing fold); on an
    fp16 file it quantizes in memory first. Default returns a dense
    BakedVolume either way."""
    with np.load(path) as z:
        bound = float(z["bound"])
        sh_deg = int(z["sh_deg"]) if "sh_deg" in z else 0
        if "q_payload" in z:  # quantized form (save_volume(quantize=True))
            if resident:
                return QuantizedVolume(
                    q=jnp.asarray(
                        np.concatenate(
                            [z["q_payload"], z["q_sigma"][..., None]], -1
                        )
                    ),
                    scales=jnp.asarray(
                        np.concatenate(
                            [z["scale"], [float(z["sigma_sqrt_max"])]]
                        ).astype(np.float32)
                    ),
                    los=jnp.asarray(
                        np.concatenate([z["lo"], [0.0]]).astype(np.float32)
                    ),
                    bound=bound,
                    sh_deg=sh_deg,
                )
            payload = (
                z["q_payload"].astype(np.float32) / 255.0 * z["scale"] + z["lo"]
            )
            s = z["q_sigma"].astype(np.float32) / 255.0 * float(
                z["sigma_sqrt_max"]
            )
            rgba = np.concatenate([payload, (s * s)[..., None]], -1)
            return BakedVolume(rgba=jnp.asarray(rgba), bound=bound, sh_deg=sh_deg)
        vol = BakedVolume(
            rgba=jnp.asarray(z["rgba"].astype(np.float32)),
            bound=bound,
            sh_deg=sh_deg,
        )
        return quantize_volume(vol) if resident else vol


def shift_volume(vol: BakedVolume, offset_world: Sequence[float]) -> BakedVolume:
    """Rigid-translate a baked object by whole voxels: the object appears at
    field position + offset_world. NOTE the sign convention of the ray-offset
    editing flow (editable.py:443-471, render/compose.py): there object k's
    field is queried at (x + offset_k), which places it in the scene at
    -offset_k — so the baked equivalent of a compose offset is
    ``shift_volume(vol, -offset_k)``."""
    R = vol.rgba.shape[0]
    vox = R / (2.0 * vol.bound)
    rgba = vol.rgba
    for ax in range(3):
        s = int(round(float(offset_world[ax]) * vox))
        if s == 0:
            continue
        rgba = jnp.roll(rgba, s, axis=ax)
        # zero the wrapped-around band
        idx = jnp.arange(R)
        band = (idx < s) if s > 0 else (idx >= R + s)
        shape = [1, 1, 1, 1]
        shape[ax] = R
        rgba = jnp.where(band.reshape(shape), 0.0, rgba)
    return BakedVolume(rgba=rgba, bound=vol.bound, sh_deg=vol.sh_deg)


def rotate_volume(
    vol: BakedVolume,
    axis: int,
    degrees: float,
    center: Sequence[float] = (0.0, 0.0, 0.0),
) -> BakedVolume:
    """Rigid-rotate a baked object about one axis (editing extension beyond
    the reference, whose editing is translation-only — editable.py:443-471).

    Exact multiples of 90 degrees are lossless axis permutations/flips;
    arbitrary angles resample trilinearly (the object ROTATES by +degrees
    right-handed about ``axis`` through ``center`` in world units; source
    coordinates outside the cube read as empty). Edit-time cost, not
    per-frame: the rotated volume feeds the same merge/render path.
    """
    R = vol.rgba.shape[0]
    b = float(vol.bound)
    # RIGHT-HANDED in-plane pair about +axis is the CYCLIC pair, not the
    # ascending one — about +y it is (z, x); using ascending (x, z) there
    # silently negates the y rotation (round-3 review finding)
    u_ax, v_ax = ((1, 2), (2, 0), (0, 1))[axis]
    deg = float(degrees) % 360.0

    if deg % 90.0 == 0.0 and all(abs(c) < 1e-9 for c in center):
        k = int(deg // 90) % 4
        rgba = vol.rgba
        # +90 deg right-handed about `axis`: (u, v) -> (-v, u)
        for _ in range(k):
            rgba = jnp.flip(jnp.swapaxes(rgba, u_ax, v_ax), u_ax)
        return BakedVolume(rgba=rgba, bound=vol.bound, sh_deg=vol.sh_deg)

    th = np.deg2rad(deg)
    c_, s_ = float(np.cos(th)), float(np.sin(th))
    centers = (jnp.arange(R, dtype=jnp.float32) + 0.5) / R * (2 * b) - b
    # 2-D source-coordinate planes over (u, v) — the axis coordinate is
    # invariant under an about-axis rotation, so each axis-slice block
    # resamples independently from ITSELF (keeps transients at
    # O(block * R^2) instead of O(R^3) — a 512^3 edit stays inside HBM)
    u = centers[:, None] - center[u_ax]
    v = centers[None, :] - center[v_ax]
    su = c_ * u + s_ * v + center[u_ax]  # inverse rotation R(-th)(u, v)
    sv = -s_ * u + c_ * v + center[v_ax]
    to_vox = lambda g: (g + b) / (2 * b) * R - 0.5

    from jax.scipy.ndimage import map_coordinates

    # move the invariant axis to the front, resample plane-block by block
    perm = (axis, u_ax, v_ax)
    inv_perm = tuple(np.argsort(perm))
    V = jnp.transpose(vol.rgba, perm + (3,))  # [R(axis), R(u), R(v), CH]
    cu = jnp.broadcast_to(to_vox(su)[None], (1, R, R))
    cv = jnp.broadcast_to(to_vox(sv)[None], (1, R, R))
    c0 = jnp.zeros((1, R, R), jnp.float32)

    @jax.jit
    def rot_block(block):  # [K, R, R, CH] -> same, rotated in-plane
        def one(sl):  # [R, R, CH]
            return jnp.stack(
                [
                    map_coordinates(
                        sl[None, :, :, c], [c0, cu, cv], order=1,
                        mode="constant", cval=0.0,
                    )[0]
                    for c in range(sl.shape[-1])
                ],
                -1,
            )

        return jax.vmap(one)(block)

    K = 32
    out = []
    for i in range(0, R, K):
        out.append(rot_block(V[i : i + K]))
    V = jnp.concatenate(out, 0)
    return BakedVolume(
        rgba=jnp.transpose(V, inv_perm + (3,)),
        bound=vol.bound,
        sh_deg=vol.sh_deg,
    )


def merge_volumes(vols: List[BakedVolume]) -> BakedVolume:
    """Max-density argmax fusion of per-object volumes — the voxel-space
    equivalent of best_densities_and_colors_v3 (COMBINED.py:247-251)."""
    assert len(vols) > 0
    out = vols[0].rgba
    for v in vols[1:]:
        assert v.rgba.shape == out.shape and v.bound == vols[0].bound
        assert v.sh_deg == vols[0].sh_deg
        take = v.rgba[..., -1:] > out[..., -1:]
        out = jnp.where(take, v.rgba, out)
    return BakedVolume(rgba=out, bound=vols[0].bound, sh_deg=vols[0].sh_deg)


# ------------------------------------------------------------------- render
def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _grid_geometry(e_z, e_y, e_x, b: float, ri: int):
    """Intermediate-plane pixel grid: the volume footprint on z'=0 seen from
    the (permuted-coords) eye. Returns (gy [ri], gx [ri], ymin, xmin, dy_i,
    dx_i). Shared by the compositor, the final warp, and GT pre-warping."""
    corners = jnp.array([-b, b], jnp.float32)
    s_c = e_z / (e_z - corners)  # scale for the two extreme slices [2]
    uy = e_y + (corners[None, :] - e_y) * s_c[:, None]  # [2 slices, 2 corners]
    ux = e_x + (corners[None, :] - e_x) * s_c[:, None]
    ymin, ymax = jnp.min(uy), jnp.max(uy)
    xmin, xmax = jnp.min(ux), jnp.max(ux)
    dy_i = (ymax - ymin) / ri
    dx_i = (xmax - xmin) / ri
    gy = ymin + (jnp.arange(ri, dtype=jnp.float32) + 0.5) * dy_i  # [Ri]
    gx = xmin + (jnp.arange(ri, dtype=jnp.float32) + 0.5) * dx_i
    return gy, gx, ymin, xmin, dy_i, dx_i


@functools.partial(jax.jit, static_argnames=("axis", "flip", "ri"))
def warp_gt_to_intermediate(
    gt,  # [H, W, 3] ground-truth image
    pose,  # [4, 4] c2w
    intr,  # [4] fx, fy, cx, cy
    bound: float,
    *,
    axis: int,
    flip: bool,
    ri: int,
):
    """Resample a GT image onto the shear-warp intermediate plane.

    Each intermediate pixel is one primary ray (eye -> plane point); its
    supervising color is the GT bilinearly sampled where that ray crosses the
    screen. Precomputing this once per pose lets training supervise the
    compositor output DIRECTLY — the screen-space warp (whose forward lowers
    to a scalar-loop gather and whose backward is an H*W overlapping
    scatter-add inside the train graph; PERF.md voxel-backward bisect) never
    enters the hot loop. Returns (warped_gt [ri,ri,3], mask [ri,ri] — 1 where
    the ray lands inside the image in front of the camera).
    """
    pose = jnp.asarray(pose, jnp.float32)
    intr = jnp.asarray(intr, jnp.float32)
    H, W = gt.shape[0], gt.shape[1]
    b = bound
    others = [a for a in range(3) if a != axis]
    e = pose[:3, 3]
    e_z, e_y, e_x = e[axis], e[others[0]], e[others[1]]
    if flip:
        e_z = -e_z
    gy, gx, _, _, _, _ = _grid_geometry(e_z, e_y, e_x, b, ri)

    # plane point in world coords (plane z'=0 is world plane [axis]=0,
    # independent of flip — the flip only mirrors the slice ORDER)
    p_world = jnp.zeros((ri, ri, 3), jnp.float32)
    p_world = p_world.at[..., others[0]].set(gy[:, None])
    p_world = p_world.at[..., others[1]].set(gx[None, :])

    # project into the camera (get_rays convention: +z forward)
    rel = p_world - pose[:3, 3]
    p_cam = jnp.einsum("ijr,rc->ijc", rel, pose[:3, :3])  # R^T @ rel
    z = p_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    u = p_cam[..., 0] / zs * fx + cx - 0.5  # column (W axis)
    v = p_cam[..., 1] / zs * fy + cy - 0.5  # row (H axis)

    mask = (z > 0) & (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
    x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    wy = jnp.clip(v - y0, 0.0, 1.0)[..., None]
    wx = jnp.clip(u - x0, 0.0, 1.0)[..., None]
    g00 = gt[y0, x0]
    g01 = gt[y0, x0 + 1]
    g10 = gt[y0 + 1, x0]
    g11 = gt[y0 + 1, x0 + 1]
    wgt = (
        g00 * (1 - wy) * (1 - wx)
        + g01 * (1 - wy) * wx
        + g10 * wy * (1 - wx)
        + g11 * wy * wx
    )
    return wgt, mask.astype(jnp.float32)


def _fold_blocks(
    V_f2b,  # [n_blocks, K, Ry, Rx, CH] slice blocks, front-to-back
    z_f2b,  # [n_blocks, K] slice z' coordinates (same order)
    e_z,
    e_y,
    e_x,
    gy,  # [ri] intermediate-grid y centers
    gx,  # [ri]
    dt,  # [ri, ri] per-pixel step length
    b: float,
    R: int,  # full spatial resolution of the slices (y/x extents)
    ri: int,
    *,
    density_scale: float,
    remat: bool,
    carry=None,  # optional (od, C, D) to continue from (identity if None)
    with_depth: bool = True,  # False drops the depth accumulator from the
    # scan carry entirely (the carry blocks DCE) — used by the SP train
    # step, whose loss never reads depth
    return_od: bool = False,  # True returns the accumulated optical depth
    # instead of T = exp(-od) — the SP step combines slabs in od space so
    # the cross-device fold also stays division-free under AD
    dequant=None,  # optional block -> numeric-block fn applied INSIDE the
    # scan body: uint8-resident rendering reads raw uint8 from HBM and
    # dequantizes in registers (QuantizedVolume)
):
    """Resample + front-to-back composite a sequence of slice blocks.

    The core fold shared by _composite_core (whole volume on one device)
    and parallel/voxel_sp.py (each device folds its own slab of a
    slice-sharded field; alpha compositing is associative, so per-device
    partials starting from the identity carry combine exactly).

    Transmittance is carried as OPTICAL DEPTH (od; T = exp(-od)) and the
    within-block exclusive transmittance is computed exactly in log space:
    1 - alpha_k = exp(-sigma_k*dt), so prefix products become prefix sums.
    The cumprod form's VJP divides by (1 - alpha_k), which is exactly 0
    once exp underflows (sigma*dt > ~87 fp32) -> NaN grads on opaque
    surfaces; cumsum's VJP has no division.

    Returns (T [ri,ri] — or od when return_od — C [ri,ri,CH-1]
    premultiplied, D [ri,ri]; D is None when with_depth=False)."""
    CH = V_f2b.shape[-1]
    dtype = V_f2b.dtype
    if dequant is not None:
        dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    iota = jnp.arange(R, dtype=jnp.float32)

    def block_body(carry, xs):
        if with_depth:
            od, C, D = carry  # [Ri,Ri], [Ri,Ri,CH-1], [Ri,Ri]
        else:
            od, C = carry
        Vb, zb = xs  # [K, Ry, Rx, CH], [K]
        if dequant is not None:
            Vb = dequant(Vb).astype(dtype)
        s_k = e_z / (e_z - zb)  # [K]
        # source world coords feeding intermediate pixels (inverse projection)
        ys = e_y + (gy[None, :] - e_y) / s_k[:, None]  # [K, Ri]
        xs_ = e_x + (gx[None, :] - e_x) / s_k[:, None]
        py = (ys + b) / (2 * b) * R - 0.5  # voxel coords
        px = (xs_ + b) / (2 * b) * R - 0.5
        My = _hat(py[:, None, :] - iota[None, :, None]).astype(dtype)  # [K, R, Ri]
        Mx = _hat(px[:, None, :] - iota[None, :, None]).astype(dtype)
        tmp = jnp.einsum("kyxc,kyY->kYxc", Vb, My,
                         preferred_element_type=jnp.float32)
        sl = jnp.einsum("kYxc,kxX->kYXc", tmp.astype(dtype), Mx,
                        preferred_element_type=jnp.float32)  # [K, Ri, Ri, CH]
        sigma = jnp.maximum(sl[..., -1], 0.0) * density_scale
        s = sigma * dt[None]  # per-sample optical depth [K, Ri, Ri]
        alpha = 1.0 - jnp.exp(-s)
        # exclusive within-block transmittance in log space, entering od.
        # Built by shifting, never as acc - s (exp(inf - inf) = NaN if a
        # sigma spike overflows — see ops/composite.py).
        acc_excl = jnp.concatenate(
            [jnp.zeros_like(s[:1]), jnp.cumsum(s[:-1], axis=0)], 0
        )
        w = jnp.exp(-(acc_excl + od[None])) * alpha  # Tw_excl * T_in * alpha
        C = C + jnp.einsum("kij,kijc->ijc", w, sl[..., :-1])
        if with_depth:
            D = D + jnp.einsum("kij,k->ij", w, e_z - zb)
            od = od + acc_excl[-1] + s[-1]
            return (od, C, D), None
        od = od + acc_excl[-1] + s[-1]
        return (od, C), None

    if carry is None:
        carry = (
            jnp.zeros((ri, ri), jnp.float32),
            jnp.zeros((ri, ri, CH - 1), jnp.float32),
        ) + ((jnp.zeros((ri, ri), jnp.float32),) if with_depth else ())
    body = jax.checkpoint(block_body) if remat else block_body
    out, _ = jax.lax.scan(body, carry, (V_f2b, z_f2b))
    od = out[0]
    first = od if return_od else jnp.exp(-od)
    if with_depth:
        return first, out[1], out[2]
    return first, out[1], None


def sh_contract_plane(C, e_z, e_y, e_x, gy, gx, *, axis, flip, ri, sh_deg):
    """Contract a composited SH payload [ri, ri, L*3] with ONE basis per
    intermediate pixel (each pixel is exactly one primary ray through the
    eye): rgb = sum_l Y_l(dir) * C[..., l, :], clipped to [0, 1].

    ``e_z`` must already carry the flip negation (both callers — the
    monolithic _composite_core and the slice-sharded parallel/voxel_sp.py
    step — negate it before folding)."""
    from focnerf_tpu.ops.sh import sh_encode

    others = [a for a in range(3) if a != axis]
    dz_p = jnp.broadcast_to(-e_z, (ri, ri))
    dy_p = jnp.broadcast_to((gy - e_y)[:, None], (ri, ri))
    dx_p = jnp.broadcast_to((gx - e_x)[None, :], (ri, ri))
    d_world = jnp.zeros((ri, ri, 3), jnp.float32)
    d_world = d_world.at[..., axis].set(dz_p * (-1.0 if flip else 1.0))
    d_world = d_world.at[..., others[0]].set(dy_p)
    d_world = d_world.at[..., others[1]].set(dx_p)
    d_world = d_world / jnp.maximum(
        jnp.linalg.norm(d_world, axis=-1, keepdims=True), 1e-9
    )
    L = sh_deg * sh_deg
    Y = sh_encode(d_world, sh_deg)  # [Ri, Ri, L]
    C = jnp.einsum("ijl,ijlc->ijc", Y, C.reshape(ri, ri, L, 3))
    return jnp.clip(C, 0.0, 1.0)


def _composite_core(
    rgba,  # [R, R, R, 4] axes (x, y, z)
    bound: float,
    pose,  # [4, 4] c2w
    *,
    axis: int,
    flip: bool,
    ri: int,
    density_scale: float,
    sh_deg: int = 0,
    remat: bool = False,
    block: int = 32,
    quant=None,  # (scales [CH], los [CH]) when rgba is uint8-resident:
    # the volume stays uint8 through the transpose/flip relayout and
    # dequantizes inside the fold (QuantizedVolume)
):
    """Slice-resample + front-to-back composite onto the intermediate plane.

    Returns (C [ri,ri,3] premultiplied color, T [ri,ri] transmittance,
    D [ri,ri] depth-along-z', (ymin, xmin, dy_i, dx_i) intermediate-grid
    geometry). Split from the final warp so training can supervise in
    intermediate space (the warp's backward is an H*W overlapping
    scatter-add — see PERF.md voxel-backward bisect)."""
    R = rgba.shape[0]
    CH = rgba.shape[-1]  # payload channels + 1 (sigma last)
    b = bound

    # --- permute so the principal axis is leading (slice axis), others (y, x)
    others = [a for a in range(3) if a != axis]
    V = jnp.transpose(rgba, (axis, others[0], others[1], 3))  # [Rz', Ry', Rx', 4]
    dequant = None
    if quant is not None:
        scales, los = quant
        dq_dtype = (
            jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
        )
        s_b = (scales / 255.0).astype(dq_dtype)
        l_b = los.astype(dq_dtype)

        def dequant(Vb):
            y = Vb.astype(dq_dtype) * s_b + l_b
            return y.at[..., -1].set(y[..., -1] ** 2)  # sigma in sqrt space

    elif jax.default_backend() != "cpu":
        V = V.astype(jnp.bfloat16)  # resampling matmuls ride the bf16 MXU path
    e = pose[:3, 3]
    e_z, e_y, e_x = e[axis], e[others[0]], e[others[1]]
    if flip:  # put the eye on the +z' side
        V = jnp.flip(V, 0)
        e_z = -e_z

    centers = (jnp.arange(R, dtype=jnp.float32) + 0.5) / R * (2 * b) - b  # z'_k
    dz = 2.0 * b / R

    # --- intermediate grid on the z'=0 plane: the volume footprint seen from e
    gy, gx, ymin, xmin, dy_i, dx_i = _grid_geometry(e_z, e_y, e_x, b, ri)

    # per-intermediate-pixel ray obliquity: dt = dz * |d| / |d_z|, d through e
    ddy = gy[:, None] - e_y
    ddx = gx[None, :] - e_x
    dlen = jnp.sqrt(ddy**2 + ddx**2 + e_z**2)
    dt = dz * dlen / jnp.maximum(jnp.abs(e_z), 1e-6)  # [Ri, Ri]

    # ---- block-batched resample + composite. A slice-at-a-time scan is
    # overhead-bound on TPU (256 sequential tiny matmuls measured 1.3 s per
    # 800^2 frame); instead slices are resampled K at a time as one batched
    # MXU einsum, and compositing inside a block uses the exclusive
    # log-space prefix-sum form (alpha compositing is associative; see
    # _fold_blocks), leaving only R/K sequential folds.
    K = min(block, R)
    assert R % K == 0
    n_blocks = R // K
    # front-to-back: nearest (+z') slice first
    V_f2b = jnp.flip(V, 0).reshape(n_blocks, K, R, R, CH)
    z_f2b = jnp.flip(centers, 0).reshape(n_blocks, K)

    T, C, D = _fold_blocks(
        V_f2b, z_f2b, e_z, e_y, e_x, gy, gx, dt, b, R, ri,
        density_scale=density_scale, remat=remat, dequant=dequant,
    )

    if sh_deg > 0:
        C = sh_contract_plane(
            C, e_z, e_y, e_x, gy, gx, axis=axis, flip=flip, ri=ri,
            sh_deg=sh_deg,
        )

    return C, T, D, (ymin, xmin, dy_i, dx_i)


@functools.partial(
    jax.jit, static_argnames=("axis", "flip", "H", "W", "ri", "sh_deg", "remat")
)
def _render_core(
    rgba,  # [R, R, R, 4] axes (x, y, z)
    bound: float,
    pose,  # [4, 4] c2w
    intr,  # [4] fx, fy, cx, cy
    *,
    axis: int,
    flip: bool,
    H: int,
    W: int,
    ri: int,
    bg_color: float,
    density_scale: float,
    sh_deg: int = 0,
    remat: bool = False,
    quant=None,
):
    C, T, D, (ymin, xmin, dy_i, dx_i) = _composite_core(
        rgba, bound, pose, axis=axis, flip=flip, ri=ri,
        density_scale=density_scale, sh_deg=sh_deg, remat=remat, quant=quant,
    )
    others = [a for a in range(3) if a != axis]
    e = pose[:3, 3]
    e_z, e_y, e_x = e[axis], e[others[0]], e[others[1]]
    if flip:
        e_z = -e_z

    # --- final warp: screen pixel -> plane z'=0 -> bilinear sample
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    jj, ii = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    dirs = jnp.stack(
        [(ii + 0.5 - cx) / fx, (jj + 0.5 - cy) / fy, jnp.ones_like(ii)], -1
    )  # cam space [H, W, 3]
    d_world = jnp.einsum("hwc,rc->hwr", dirs, pose[:3, :3])
    d_z = d_world[..., axis] * (-1.0 if flip else 1.0)
    d_y = d_world[..., others[0]]
    d_x = d_world[..., others[1]]
    t_pl = -e_z / jnp.where(jnp.abs(d_z) < 1e-9, 1e-9, d_z)
    hit = t_pl > 0
    p_y = e_y + d_y * t_pl
    p_x = e_x + d_x * t_pl
    fy_i = (p_y - ymin) / dy_i - 0.5  # intermediate pixel coords
    fx_i = (p_x - xmin) / dx_i - 0.5

    buf = jnp.concatenate([C, T[..., None], D[..., None]], -1)  # [Ri, Ri, 5]
    y0 = jnp.clip(jnp.floor(fy_i).astype(jnp.int32), 0, ri - 2)
    x0 = jnp.clip(jnp.floor(fx_i).astype(jnp.int32), 0, ri - 2)
    wy = jnp.clip(fy_i - y0, 0.0, 1.0)
    wx = jnp.clip(fx_i - x0, 0.0, 1.0)
    starts = jnp.stack([y0, x0], -1).reshape(-1, 2)
    win = jax.lax.gather(
        buf,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        ),
        slice_sizes=(2, 2, 5),
        mode="clip",
    ).reshape(H, W, 2, 2, 5)
    wy = wy[..., None]
    wx = wx[..., None]
    smp = (
        win[:, :, 0, 0] * (1 - wy) * (1 - wx)
        + win[:, :, 0, 1] * (1 - wy) * wx
        + win[:, :, 1, 0] * wy * (1 - wx)
        + win[:, :, 1, 1] * wy * wx
    )  # [H, W, 5]
    rgb_s, T_s, D_s = smp[..., :3], smp[..., 3], smp[..., 4]
    rgb_s = jnp.where(hit[..., None], rgb_s, 0.0)
    T_s = jnp.clip(jnp.where(hit, T_s, 1.0), 0.0, 1.0)
    image = rgb_s + T_s[..., None] * bg_color
    depth = jnp.where(hit, D_s, 0.0)
    return image, depth, 1.0 - T_s


def render_baked(
    vol,
    pose,
    intrinsics,
    H: int,
    W: int,
    *,
    bg_color: float = 1.0,
    intermediate_scale: int = 2,
    density_scale: float = 1.0,
):
    """Shear-warp render of a baked volume -> (image [H,W,3], depth [H,W],
    alpha [H,W]). ``pose``/``intrinsics`` follow core.rays.get_rays
    conventions. The principal axis/sign is chosen on the host (6 cached jit
    variants). ``vol`` may be a BakedVolume or a QuantizedVolume — the
    latter stays uint8 in HBM and dequantizes inside the fold."""
    quant = None
    if isinstance(vol, QuantizedVolume):
        quant = (vol.scales, vol.los)
        vol = BakedVolume(rgba=vol.q, bound=vol.bound, sh_deg=vol.sh_deg)
    pose_np = np.asarray(pose, np.float32)
    fwd = pose_np[:3, :3] @ np.array([0.0, 0.0, 1.0], np.float32)
    axis = int(np.argmax(np.abs(fwd)))
    eye = pose_np[:3, 3]
    b = float(vol.bound)
    # The factorization needs the eye strictly outside the slice slab along
    # the chosen axis (every s_k = e_z/(e_z - z_k) positive; at |e_z| <= b
    # slices behind the eye flip sign and at e_z ~ 0 the footprint math
    # divides by zero). Prefer the view-dominant axis, but for oblique
    # exterior cameras (looking along x while standing far out in y) fall
    # back to the axis the eye is actually outside of.
    if abs(eye[axis]) <= b:
        axis = int(np.argmax(np.abs(eye)))
    if abs(eye[axis]) <= b:
        raise ValueError(
            f"render_baked: eye {eye.tolist()} is inside the volume cube "
            f"(bound {b}); shear-warp needs an exterior camera — move the "
            "eye out or use the per-sample render path"
        )
    # eye must sit on the +z' side: flip when the eye coordinate is negative
    flip = bool(pose_np[axis, 3] < 0)
    ri = int(vol.rgba.shape[0] * intermediate_scale)
    return _render_core(
        vol.rgba,
        float(vol.bound),
        jnp.asarray(pose_np),
        jnp.asarray(intrinsics, jnp.float32),
        axis=axis,
        flip=flip,
        H=H,
        W=W,
        ri=ri,
        bg_color=bg_color,
        density_scale=density_scale,
        sh_deg=int(vol.sh_deg),
        quant=quant,
    )
