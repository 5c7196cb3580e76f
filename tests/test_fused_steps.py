"""Fused K-step dispatch (train/fused.py) must match per-step training.

The fused chunk's contract is bit-compatible PRNG consumption with the
sequential loop, so two trainers with the same seed — one at
steps_per_dispatch=1, one at K>1 — must produce the same parameter
trajectory, error map and occupancy state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.data.provider import DatasetOptions, NeRFDataset
from focnerf_tpu.models.nerf import NeRFConfig
from focnerf_tpu.train.trainer import Trainer

from helpers import make_synthetic_scene


def _tiny_cfg():
    return NeRFConfig(
        num_levels=2, base_resolution=4, log2_hashmap_size=8,
        hidden_dim=16, hidden_dim_color=16, geo_feat_dim=7,
        use_objfeat=False, compute_dtype=jnp.float32,
    )


def _dataset(tmp_path, tag, error_map=False):
    scene = make_synthetic_scene(
        str(tmp_path / f"scene_{tag}"), n_train=3, n_val=1, H=16, W=16
    )
    return NeRFDataset(
        DatasetOptions(path=scene, num_rays=64, scale=1.0, error_map=error_map),
        split="train",
    )


def _trainer(tmp_path, tag, K, **kw):
    return Trainer(
        f"t{tag}", _tiny_cfg(), workspace=str(tmp_path / f"ws_{tag}"),
        iters=8, num_steps=16, steps_per_dispatch=K, eval_interval=1000,
        use_tensorboard=False, eval_save_images=False, use_checkpoint="scratch",
        seed=3, **kw,
    )


def _assert_tree_close(a, b, atol=2e-4, frac=0.02):
    """Trees equal up to adam-amplified float noise.

    scan vs eager reassociates float reductions; for a hash-table entry
    whose gradient is near zero, adam's m/sqrt(v) normalization turns that
    rounding noise into a full ±lr step. So individual entries may differ
    by ~lr — correctness evidence is that only a tiny FRACTION do (a wrong
    batch or RNG chain shifts essentially every parameter)."""
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    bad = total = 0
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        bad += int(np.sum(np.abs(x - y) > atol + 0.05 * np.abs(y)))
        total += x.size
    assert bad / max(total, 1) <= frac, f"{bad}/{total} elements differ"


class TestFusedParity:
    def test_uniform_path_matches_per_step(self, tmp_path):
        ds1 = _dataset(tmp_path, "a")
        ds2 = _dataset(tmp_path, "b")
        t1 = _trainer(tmp_path, "seq", 1)
        t2 = _trainer(tmp_path, "fused", 4)
        t1.train(ds1, None, max_epochs=1, steps_per_epoch=8)
        t2.train(ds2, None, max_epochs=1, steps_per_epoch=8)
        assert t1.global_step == t2.global_step == 8
        assert t2._fused_cache, "fused path never engaged"
        _assert_tree_close(t1.state.params, t2.state.params)
        _assert_tree_close(t1.state.ema_params, t2.state.ema_params)

    def test_error_map_matches(self, tmp_path):
        ds1 = _dataset(tmp_path, "a", error_map=True)
        ds2 = _dataset(tmp_path, "b", error_map=True)
        t1 = _trainer(tmp_path, "seq", 1)
        t2 = _trainer(tmp_path, "fused", 4)
        t1.train(ds1, None, max_epochs=1, steps_per_epoch=4)
        t2.train(ds2, None, max_epochs=1, steps_per_epoch=4)
        assert t2._fused_cache, "fused path never engaged"
        np.testing.assert_allclose(
            np.asarray(ds1.error_map), np.asarray(ds2.error_map),
            rtol=0.05, atol=2e-4,
        )

    def test_occupancy_path_matches_and_respects_update_ticks(self, tmp_path):
        kw = dict(
            use_occupancy=True, update_extra_interval=4, train_slab=16,
            max_steps=64, density_thresh=0.01,
        )
        ds1 = _dataset(tmp_path, "a")
        ds2 = _dataset(tmp_path, "b")
        t1 = _trainer(tmp_path, "seq", 1, **kw)
        t2 = _trainer(tmp_path, "fused", 4, **kw)
        t1.train(ds1, None, max_epochs=1, steps_per_epoch=8)
        t2.train(ds2, None, max_epochs=1, steps_per_epoch=8)
        assert t2._fused_cache, "fused path never engaged"
        _assert_tree_close(t1.state.params, t2.state.params)
        np.testing.assert_allclose(
            np.asarray(t1.occupancy.density_grid),
            np.asarray(t2.occupancy.density_grid), rtol=0.05, atol=2e-4,
        )

    def test_chunk_never_straddles_occupancy_tick(self, tmp_path):
        """K=8 > interval=4: the fuser must cap chunks at the next tick
        (fusing 4, the largest power of two that fits) rather than skip
        grid updates mid-chunk."""
        kw = dict(
            use_occupancy=True, update_extra_interval=4, train_slab=16,
            max_steps=64, density_thresh=0.01,
        )
        ds = _dataset(tmp_path, "a")
        t = _trainer(tmp_path, "cap", 8, **kw)
        assert t._fused_steps_possible(ds, remaining=8) == 4
        t.global_step = 2  # misaligned: only 2 steps until the next tick
        assert t._fused_steps_possible(ds, remaining=8) == 2

    def test_gradphase_fused_matches_per_step(self, tmp_path):
        kw = dict(
            use_occupancy=True, update_extra_interval=4, train_slab=16,
            max_steps=64, density_thresh=0.01, grad_level_phases=2,
        )
        ds1 = _dataset(tmp_path, "a")
        ds2 = _dataset(tmp_path, "b")
        t1 = _trainer(tmp_path, "seq", 1, **kw)
        t2 = _trainer(tmp_path, "fused", 4, **kw)
        t1.train(ds1, None, max_epochs=1, steps_per_epoch=4)
        t2.train(ds2, None, max_epochs=1, steps_per_epoch=4)
        assert t2._fused_cache, "fused path never engaged"
        _assert_tree_close(t1.state.params, t2.state.params)

    def test_gradphase_requires_occupancy(self, tmp_path):
        # the non-occupancy per-step path compiles a single unphased step;
        # allowing gradphase there would silently break fused==sequential
        with pytest.raises(ValueError, match="grad_level_phases"):
            _trainer(tmp_path, "gpguard", 1, grad_level_phases=2)

    def test_fallbacks(self, tmp_path):
        ds = _dataset(tmp_path, "a")
        # rand_pose >= 0 (CLIP branch) is per-step only
        t = _trainer(tmp_path, "rp", 4)
        t.rand_pose = 0
        assert t._fused_steps_possible(ds, remaining=8) == 1
        # epoch remainder smaller than K: fuse the power-of-two that fits
        t2 = _trainer(tmp_path, "rem", 4)
        assert t2._fused_steps_possible(ds, remaining=3) == 2
        assert t2._fused_steps_possible(ds, remaining=1) == 1
        # gradphase: chunk must be a multiple of P (K=3 -> fuse 2)
        t3 = _trainer(tmp_path, "gp", 3, use_occupancy=True,
                      update_extra_interval=16, train_slab=16, max_steps=64,
                      grad_level_phases=2)
        assert t3._fused_steps_possible(ds, remaining=16) == 2
        # gradphase phase-misaligned start stays per-step
        t3.global_step = 1
        assert t3._fused_steps_possible(ds, remaining=16) == 1


class TestVoxelFused:
    def test_voxel_fused_matches_per_step(self):
        """_fit_field_loop with steps_per_dispatch>1 (scan + variant switch)
        must reproduce the per-step trajectory: same shuffled view order,
        same per-view step math, same final PSNR up to scan float noise."""
        from focnerf_tpu.core.camera import rand_poses
        from focnerf_tpu.render.baked import render_baked
        from focnerf_tpu.train.voxel import fit_voxels

        from test_voxel_train import _gt_volume

        gt_vol = _gt_volume(16)
        H = W = 24
        intr = (28.8, 28.8, 12.0, 12.0)
        poses = np.asarray(rand_poses(np.random.default_rng(0), 8, radius=2.5))
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, W)[0]) for p in poses]
        )
        kw = dict(resolution=16, iters=22, lr=0.1, tv_weight=1e-5, seed=5)
        vol1, info1 = fit_voxels(poses, imgs, intr, **kw)
        vol2, info2 = fit_voxels(poses, imgs, intr, steps_per_dispatch=8, **kw)
        # 22 iters = chunks 8+8+6 (tail trace) — exercises the tail path
        assert info2["psnr"] == pytest.approx(info1["psnr"], abs=0.2)
        np.testing.assert_allclose(
            np.asarray(vol1.rgba), np.asarray(vol2.rgba), atol=5e-3
        )

    def test_vm_fused_matches_per_step(self):
        from focnerf_tpu.core.camera import rand_poses
        from focnerf_tpu.render.baked import render_baked
        from focnerf_tpu.train.voxel_vm import fit_vm_voxels

        from test_voxel_train import _gt_volume

        gt_vol = _gt_volume(16)
        H = W = 24
        intr = (28.8, 28.8, 12.0, 12.0)
        poses = np.asarray(rand_poses(np.random.default_rng(1), 6, radius=2.5))
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, W)[0]) for p in poses]
        )
        kw = dict(resolution=16, rank=4, iters=16, lr=0.05, seed=2)
        vol1, info1 = fit_vm_voxels(poses, imgs, intr, **kw)
        vol2, info2 = fit_vm_voxels(poses, imgs, intr, steps_per_dispatch=8, **kw)
        assert info2["psnr"] == pytest.approx(info1["psnr"], abs=0.2)

    def test_kplanes_fused_matches_per_step(self):
        """Time-conditioned family: the fused loop must feed each view's own
        t through the switch (a wrong t indexing trains the wrong plane)."""
        from focnerf_tpu.core.camera import rand_poses
        from focnerf_tpu.render.baked import render_baked
        from focnerf_tpu.train.voxel_kplanes import fit_kplanes

        from test_voxel_train import _gt_volume

        gt_vol = _gt_volume(16)
        H = W = 24
        intr = (28.8, 28.8, 12.0, 12.0)
        poses = np.asarray(rand_poses(np.random.default_rng(2), 6, radius=2.5))
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, W)[0]) for p in poses]
        )
        times = np.linspace(0, 1, 6).astype(np.float32)
        kw = dict(resolution=16, rank=2, time_res=4, iters=12, lr=0.05, seed=7)
        f1, info1 = fit_kplanes(poses, imgs, times, intr, **kw)
        f2, info2 = fit_kplanes(poses, imgs, times, intr,
                                steps_per_dispatch=6, **kw)
        assert info2["psnr"] == pytest.approx(info1["psnr"], abs=0.2)
