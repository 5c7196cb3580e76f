"""Tests: losses, color space, checkpoints, error map, sharded train step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.train.loss import eff_distloss, huber_loss, mape_loss


class TestLosses:
    def test_mape(self):
        p = jnp.array([1.1, 2.0])
        t = jnp.array([1.0, 2.0])
        np.testing.assert_allclose(
            float(mape_loss(p, t, eps=0.0)), (0.1 / 1.0 + 0.0) / 2, rtol=1e-5
        )

    def test_huber_quadratic_then_linear(self):
        t = jnp.zeros(2)
        small = float(huber_loss(jnp.array([0.05, 0.0]), t, delta=0.1)) * 2
        np.testing.assert_allclose(small, 0.5 * 0.05**2 / 0.1, rtol=1e-5)
        big = float(huber_loss(jnp.array([1.0]), jnp.zeros(1), delta=0.1))
        np.testing.assert_allclose(big, 1.0 - 0.05, rtol=1e-5)

    def test_distloss_matches_pairwise(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.uniform(0, 0.2, (4, 16)), jnp.float32)
        m = jnp.sort(jnp.asarray(rng.uniform(0, 1, (4, 16)), jnp.float32), axis=-1)
        d = jnp.full((4, 16), 1 / 16)
        got = float(eff_distloss(w, m, d))
        # O(N^2) definition
        pair = np.einsum(
            "bi,bj,bij->b", np.asarray(w), np.asarray(w),
            np.abs(np.asarray(m)[:, :, None] - np.asarray(m)[:, None, :]),
        )
        want = float(np.mean(pair + np.sum(np.asarray(w) ** 2 * np.asarray(d), -1) / 3))
        assert got == pytest.approx(want, rel=1e-4)

    def test_distloss_zero_for_delta_weights(self):
        # all weight on one sample -> no pairwise spread, only self term
        w = jnp.zeros((1, 8)).at[0, 3].set(1.0)
        m = jnp.linspace(0, 1, 8)[None]
        d = jnp.full((1, 8), 0.125)
        np.testing.assert_allclose(float(eff_distloss(w, m, d)), 0.125 / 3, rtol=1e-5)


class TestColor:
    def test_srgb_roundtrip(self):
        from focnerf_tpu.utils.color import linear_to_srgb, srgb_to_linear

        x = jnp.linspace(0, 1, 64)
        np.testing.assert_allclose(
            np.asarray(srgb_to_linear(linear_to_srgb(x))), np.asarray(x), atol=1e-5
        )


class TestCheckpoints:
    def test_save_restore_roundtrip(self, tmp_path):
        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.ops.occupancy import init_occupancy
        from focnerf_tpu.train.checkpoints import CheckpointManager
        from focnerf_tpu.train.state import create_train_state, make_optimizer

        cfg = NeRFConfig(num_levels=2, base_resolution=4, log2_hashmap_size=8,
                         use_objfeat=False, compute_dtype=jnp.float32)
        opt = make_optimizer()
        state = create_train_state(jax.random.key(0), cfg, opt)
        state = state._replace(step=jnp.int32(7))
        occ = init_occupancy(1.0, grid_size=16)
        occ = occ._replace(mean_density=jnp.float32(3.5))

        mgr = CheckpointManager(str(tmp_path / "ck"), max_keep=2)
        mgr.save(state, occ)
        template = create_train_state(jax.random.key(1), cfg, opt)
        restored, r_occ, _ = mgr.restore(template, init_occupancy(1.0, grid_size=16))
        assert int(restored.step) == 7
        np.testing.assert_allclose(
            np.asarray(restored.params["grid"]), np.asarray(state.params["grid"])
        )
        assert float(r_occ.mean_density) == 3.5
        mgr.close()

    def test_restore_occupancy_mismatch(self, tmp_path):
        """A --cuda_ray checkpoint must restore into a caller that passed no
        occupancy template (composition flow), and a grid-less checkpoint must
        restore when the caller expected one (occ comes back None)."""
        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.ops.occupancy import init_occupancy
        from focnerf_tpu.train.checkpoints import CheckpointManager
        from focnerf_tpu.train.state import create_train_state, make_optimizer

        cfg = NeRFConfig(num_levels=2, base_resolution=4, log2_hashmap_size=8,
                         use_objfeat=False, compute_dtype=jnp.float32)
        opt = make_optimizer()
        state = create_train_state(jax.random.key(0), cfg, opt)
        occ = init_occupancy(1.0, grid_size=16)._replace(mean_density=jnp.float32(2.5))

        # with-grid checkpoint, template without occupancy
        mgr = CheckpointManager(str(tmp_path / "with_occ"))
        mgr.save(state, occ)
        template = create_train_state(jax.random.key(1), cfg, opt)
        restored, r_occ, _ = mgr.restore(template)  # no occupancy template
        assert r_occ is not None and float(r_occ.mean_density) == 2.5
        assert r_occ.density_grid.shape == occ.density_grid.shape
        mgr.close()

        # grid-less checkpoint, caller expected occupancy
        mgr2 = CheckpointManager(str(tmp_path / "no_occ"))
        mgr2.save(state)
        restored2, r_occ2, _ = mgr2.restore(template, init_occupancy(1.0, grid_size=16))
        assert r_occ2 is None
        np.testing.assert_allclose(
            np.asarray(restored2.params["grid"]), np.asarray(state.params["grid"])
        )
        mgr2.close()

    def test_restore_dnerf_checkpoint_without_template(self, tmp_path):
        """A dnerf checkpoint must restore via the saved model_config alone
        (viewer/composition flow): create_train_state must build the dnerf
        param tree from a DNeRFConfig, and a [T, CAS, H^3] grid must come
        back as a TimeOccupancyState, not a mis-classed static grid."""
        from focnerf_tpu.models.dnerf import DNeRFConfig
        from focnerf_tpu.render.dnerf_renderer import (
            TimeOccupancyState,
            init_time_occupancy,
        )
        from focnerf_tpu.train.checkpoints import (
            CheckpointManager,
            load_object_occupancy,
            load_object_params,
            save_model_config,
        )
        from focnerf_tpu.train.state import create_train_state, make_optimizer

        cfg = DNeRFConfig(num_levels=2, base_resolution=4, log2_hashmap_size=8,
                          use_objfeat=False, compute_dtype=jnp.float32)
        opt = make_optimizer()
        state = create_train_state(jax.random.key(0), cfg, opt)
        assert "deform_net" in state.params  # dnerf init dispatched
        occ = init_time_occupancy(1.0, time_slots=4, grid_size=16)
        ckdir = str(tmp_path / "dn")
        mgr = CheckpointManager(ckdir)
        mgr.save(state, occ)
        mgr.close()
        save_model_config(ckdir, cfg)

        params, cfg2 = load_object_params(ckdir)  # no cfg passed
        assert isinstance(cfg2, DNeRFConfig)
        assert "deform_net" in params
        r_occ = load_object_occupancy(ckdir, cfg2)
        assert isinstance(r_occ, TimeOccupancyState)
        assert r_occ.density_grid.shape == occ.density_grid.shape

    def test_best_checkpoint(self, tmp_path):
        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.train.checkpoints import BestCheckpoint
        from focnerf_tpu.train.state import create_train_state, make_optimizer

        cfg = NeRFConfig(num_levels=2, base_resolution=4, log2_hashmap_size=8,
                         use_objfeat=False, compute_dtype=jnp.float32)
        opt = make_optimizer()
        best = BestCheckpoint(str(tmp_path / "best"))
        assert best.metric() is None
        state = create_train_state(jax.random.key(0), cfg, opt)._replace(step=jnp.int32(11))
        best.save(state, psnr=27.5)
        assert best.metric() == 27.5
        template = create_train_state(jax.random.key(1), cfg, opt)
        restored = best.restore(template)
        assert int(restored.step) == 11
        np.testing.assert_allclose(
            np.asarray(restored.params["grid"]), np.asarray(state.params["grid"])
        )
        # a later, better save replaces the slot
        state2 = state._replace(step=jnp.int32(22))
        best.save(state2, psnr=30.0)
        assert best.metric() == 30.0
        assert int(best.restore(template).step) == 22
        best.close()

    def test_trainer_rejects_unknown_ckpt_mode(self, tmp_path):
        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.train.trainer import Trainer

        cfg = NeRFConfig(num_levels=2, base_resolution=4, log2_hashmap_size=8,
                         use_objfeat=False, compute_dtype=jnp.float32)
        with pytest.raises(ValueError, match="unknown checkpoint mode"):
            Trainer("t", cfg, workspace=str(tmp_path / "ws"),
                    use_checkpoint="bogus_mode", use_tensorboard=False)

    def test_max_keep(self, tmp_path):
        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.train.checkpoints import CheckpointManager
        from focnerf_tpu.train.state import create_train_state, make_optimizer

        cfg = NeRFConfig(num_levels=2, base_resolution=4, log2_hashmap_size=8,
                         use_objfeat=False, compute_dtype=jnp.float32)
        opt = make_optimizer()
        mgr = CheckpointManager(str(tmp_path / "ck"), max_keep=2)
        for s in (1, 2, 3):
            st = create_train_state(jax.random.key(0), cfg, opt)._replace(step=jnp.int32(s))
            mgr.save(st)
        assert mgr.latest_step() == 3
        steps = sorted(int(d) for d in os.listdir(tmp_path / "ck") if d.isdigit())
        assert steps == [2, 3]
        mgr.close()


class TestCkptInterval:
    def test_saves_on_cadence_and_final_epoch(self, tmp_path):
        """ckpt_interval=3 over 4 epochs saves at epoch 3 (cadence) and
        epoch 4 (final) only — the per-epoch full-state d2h is the dominant
        ladder wall cost on the tunneled chip (PERF.md round 4)."""
        from focnerf_tpu.data.provider import DatasetOptions, NeRFDataset
        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.train.trainer import Trainer
        from helpers import make_synthetic_scene

        scene = make_synthetic_scene(
            str(tmp_path / "scene"), n_train=2, n_val=1, H=16, W=16
        )
        ds = NeRFDataset(DatasetOptions(path=scene, num_rays=64, scale=1.0),
                         split="train")
        cfg = NeRFConfig(
            num_levels=2, base_resolution=4, log2_hashmap_size=8,
            hidden_dim=16, hidden_dim_color=16, geo_feat_dim=7,
            use_objfeat=False, compute_dtype=jnp.float32,
        )
        tr = Trainer(
            "t", cfg, workspace=str(tmp_path / "ws"), iters=8, num_steps=16,
            ckpt_interval=3, eval_interval=1000, use_tensorboard=False,
            eval_save_images=False,
        )
        tr.train(ds, None, max_epochs=4, steps_per_epoch=2)
        ck = tmp_path / "ws" / "checkpoints"
        steps = sorted(int(d) for d in os.listdir(ck) if d.isdigit())
        # epoch 3 -> step 6 (cadence), epoch 4 -> step 8 (final always saves)
        assert steps == [6, 8]


class TestErrorMap:
    def test_update(self):
        from focnerf_tpu.train.steps import update_error_map

        em = jnp.full((128 * 128,), 0.1)
        inds = jnp.array([0, 5])
        err = jnp.array([1.0, 0.5])
        em2 = update_error_map(em, inds, err)
        np.testing.assert_allclose(float(em2[0]), 0.1 * 0.1 + 0.9 * 1.0, rtol=1e-5)
        np.testing.assert_allclose(float(em2[5]), 0.1 * 0.1 + 0.9 * 0.5, rtol=1e-5)
        np.testing.assert_allclose(float(em2[1]), 0.1)


class TestShardedStep:
    def test_dp_matches_single_device(self):
        """8-way DP must produce the same params as unsharded training."""
        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
        from focnerf_tpu.parallel.sharding import make_sharded_train_step
        from focnerf_tpu.train.state import create_train_state, make_optimizer
        from focnerf_tpu.train.steps import make_train_step

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = NeRFConfig(num_levels=2, base_resolution=4, log2_hashmap_size=8,
                         use_objfeat=False, compute_dtype=jnp.float32)
        opt = make_optimizer(lr=1e-2)
        state = create_train_state(jax.random.key(0), cfg, opt)
        n = 64
        batch = {
            "rays_o": jnp.zeros((n, 3)).at[:, 2].set(-2.0),
            "rays_d": jnp.zeros((n, 3)).at[:, 2].set(1.0),
            "pixels": jnp.full((n, 3), 0.4),
        }
        plain = make_train_step(cfg, opt, num_steps=8, donate=False)
        s_plain, m_plain = plain(state, batch, jax.random.key(1))

        mesh = make_mesh(8)
        sharded = make_sharded_train_step(cfg, opt, mesh, num_steps=8)
        s_shard, m_shard = sharded(
            replicate(state, mesh), shard_batch(batch, mesh), jax.random.key(1)
        )
        np.testing.assert_allclose(float(m_plain["loss"]), float(m_shard["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s_plain.params["sigma_net"][0]),
            np.asarray(s_shard.params["sigma_net"][0]),
            rtol=1e-5, atol=1e-7,
        )

    def test_multichip_dryrun(self):
        import __graft_entry__ as g

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        g.dryrun_multichip(8)


class TestBucketSlabs:
    def test_repick_shrinks_and_grows(self, tmp_path):
        """Bucketed slab schedule (ref mean_count allocation,
        nerf/renderer.py:483-495): the bucket tracks the measured mean
        samples/ray once past warmup, never below the smallest bucket and
        never above train_slab."""
        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.train.trainer import Trainer

        cfg = NeRFConfig(num_levels=2, base_resolution=4, log2_hashmap_size=8,
                         use_objfeat=False, compute_dtype=jnp.float32)
        tr = Trainer("t", cfg, workspace=str(tmp_path / "ws"),
                     use_occupancy=True, train_slab=128, bucket_slabs=True,
                     use_tensorboard=False)
        assert tr._slab_buckets == [16, 32, 64, 128]
        assert tr.active_slab == 128

        # pre-warmup: no shrink even with tiny measured samples
        tr.global_step = 100
        tr._last_mean_samples = 4.0
        for _ in range(8):
            tr._maybe_repick_slab()
        assert tr.active_slab == 128

        # post-warmup: EMA converges to ~4 -> smallest bucket
        tr.global_step = 300
        for _ in range(32):
            tr._maybe_repick_slab()
        assert tr.active_slab == 16

        # grid loosens again -> bucket grows
        tr._last_mean_samples = 90.0
        for _ in range(32):
            tr._maybe_repick_slab()
        assert tr.active_slab == 128

    def test_occ_step_cache_per_slab(self, tmp_path):
        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.train.trainer import Trainer

        cfg = NeRFConfig(num_levels=2, base_resolution=4, log2_hashmap_size=8,
                         use_objfeat=False, compute_dtype=jnp.float32)
        tr = Trainer("t", cfg, workspace=str(tmp_path / "ws"),
                     use_occupancy=True, train_slab=32, bucket_slabs=True,
                     use_tensorboard=False)
        s32 = tr._occ_step(32)
        assert tr._occ_step(32) is s32  # cached
        s16 = tr._occ_step(16)
        assert s16 is not s32


class TestClipRandPose:
    """CLIP-guided GT-free rand-pose branch (ref nerf/utils.py:796-838)."""

    def _trainer(self, tmp_path, **kw):
        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.train.trainer import Trainer

        cfg = NeRFConfig(num_levels=2, base_resolution=4, log2_hashmap_size=8,
                         use_objfeat=False, compute_dtype=jnp.float32)
        return Trainer("t", cfg, workspace=str(tmp_path / "ws"), num_steps=16,
                       use_tensorboard=False, use_checkpoint="scratch", **kw)

    def _rand_pose_ds(self):
        from focnerf_tpu.core.camera import rand_poses
        from focnerf_tpu.core.rays import get_rays

        class DS:
            def rand_pose_batch(self, rng, rng_np):
                pose = rand_poses(rng_np, 1, radius=2.5)[0]
                rays = get_rays(jnp.asarray(pose), (9.6, 9.6, 4.0, 4.0), 8, 8)
                return {"rays_o": rays["rays_o"], "rays_d": rays["rays_d"],
                        "H": 8, "W": 8}

        return DS()

    def test_clip_branch_trains(self, tmp_path):
        # stand-in differentiable "CLIP" objective: push renders toward grey
        def stub_loss(img):
            return jnp.mean((img - 0.5) ** 2)

        tr = self._trainer(tmp_path, rand_pose=0, clip_loss_fn=stub_loss)
        p0 = jax.tree_util.tree_leaves(tr.state.params)[0].copy()
        losses = [tr.train_step_once(self._rand_pose_ds()) for _ in range(3)]
        assert all(np.isfinite(l) for l in losses)
        assert tr.global_step == 3
        p1 = jax.tree_util.tree_leaves(tr.state.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))

    def test_unavailable_clip_disables_branch(self, tmp_path):
        tr = self._trainer(tmp_path, rand_pose=0, clip_text="")
        assert tr._maybe_clip_step(self._rand_pose_ds()) is None
        # branch disabled itself (no cached CLIP weights offline) + warned
        assert tr.rand_pose == -1
        assert "rand-pose branch" in open(tr.log_path).read()


class TestMaskPenaltyStability:
    def test_all_inside_mask_batch_stays_finite(self):
        """A batch sampled fully inside the object mask makes the
        outside-sigma vector exactly zero; the penalty's gradient must be
        finite (regression: ||0||'s grad is 0/0 = NaN — the reference's
        torch.norm shares the hazard, nerf/renderer.py:163-165)."""
        import optax

        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.train.state import create_train_state
        from focnerf_tpu.train.steps import make_train_step

        cfg = NeRFConfig(num_levels=2, base_resolution=4,
                         log2_hashmap_size=8, use_objfeat=False,
                         compute_dtype=jnp.float32)
        optimizer = optax.adam(1e-2)
        state = create_train_state(jax.random.key(0), cfg, optimizer)
        step = make_train_step(cfg, optimizer, num_steps=8, donate=False)
        batch = {
            "rays_o": jnp.zeros((8, 3)).at[:, 2].set(-2.0),
            "rays_d": jnp.zeros((8, 3)).at[:, 2].set(1.0),
            "pixels": jnp.full((8, 3), 0.5),
            "ray_mask": jnp.ones((8,), bool),  # ALL rays inside the mask
        }
        for it in range(3):
            state, m = step(state, batch, jax.random.key(it))
            assert np.isfinite(float(m["loss"]))
        assert all(
            bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(state.params)
        )


class TestLrNet:
    def test_per_group_lr_scales_net_updates(self):
        """--lr_net: network-group updates scale by lr_net/lr while the grid
        group keeps --lr, and the opt-state pytree stays identical to plain
        adam (checkpoint-template compatibility; ref dnerf/network.py:255)."""
        import optax

        from focnerf_tpu.models.nerf import NeRFConfig
        from focnerf_tpu.train.state import create_train_state, make_optimizer

        cfg = NeRFConfig(num_levels=2, base_resolution=4,
                         log2_hashmap_size=8, use_objfeat=False,
                         compute_dtype=jnp.float32)
        opt_single = make_optimizer(lr=1e-2, iters=100)
        opt_split = make_optimizer(lr=1e-2, iters=100, lr_net=1e-3)
        state = create_train_state(jax.random.key(0), cfg, opt_single)
        # identical synthetic gradients
        g = jax.tree.map(jnp.ones_like, state.params)
        st1 = opt_single.init(state.params)
        st2 = opt_split.init(state.params)
        assert jax.tree_util.tree_structure(st1) == jax.tree_util.tree_structure(st2)
        u1, _ = opt_single.update(g, st1, state.params)
        u2, _ = opt_split.update(g, st2, state.params)
        # grid group identical; every net group scaled by 0.1
        np.testing.assert_allclose(np.asarray(u2["grid"]), np.asarray(u1["grid"]))
        for k in u1:
            if k == "grid":
                continue
            for a, b in zip(jax.tree.leaves(u1[k]), jax.tree.leaves(u2[k])):
                np.testing.assert_allclose(
                    np.asarray(b), 0.1 * np.asarray(a), rtol=1e-6
                )


class TestMSSSIM:
    def test_identity_and_ordering(self):
        from focnerf_tpu.train.meters import ms_ssim, ssim

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.random((96, 96, 3)), jnp.float32)
        assert abs(float(ms_ssim(a, a)) - 1.0) < 1e-5
        small = jnp.clip(a + 0.02 * jnp.asarray(rng.normal(size=a.shape)), 0, 1)
        big = jnp.clip(a + 0.3 * jnp.asarray(rng.normal(size=a.shape)), 0, 1)
        assert float(ms_ssim(a, small)) > float(ms_ssim(a, big))
        # small images auto-shrink the pyramid instead of crashing
        assert np.isfinite(float(ms_ssim(a[:16, :16], small[:16, :16])))

    def test_ssim_bounded_on_in_range_inputs(self):
        """SSIM of [0,1] images is provably <= 1. The TPU backend's default
        bf16 conv precision violated this in production (r4c exact ladder
        logged SSIM 1.08); meters now force Precision.HIGHEST — this pins
        the invariant on whatever backend runs the suite."""
        from focnerf_tpu.train.meters import ssim

        rng = np.random.default_rng(3)
        for i in range(5):
            a = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
            b = jnp.clip(
                a + 0.3 * jnp.asarray(rng.normal(size=a.shape)), 0, 1
            ).astype(jnp.float32)
            v = float(ssim(a, b))
            assert -1.0 <= v <= 1.0 + 1e-5, v

    def test_lpips_meter_substitute(self):
        """Without lpips weights the meter measures 1 - ms_ssim and says so
        in its name (never silently zero, never mislabeled as real LPIPS)."""
        from focnerf_tpu.train.meters import LPIPSMeter, ms_ssim

        m = LPIPSMeter()
        if m.available:  # real lpips present: nothing to substitute
            return
        assert "ms-ssim" in m.name
        rng = np.random.default_rng(1)
        a = np.asarray(rng.random((48, 48, 3)), np.float32)
        b = np.clip(a + 0.2 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
        m.update(a, b)
        expect = 1.0 - float(ms_ssim(jnp.asarray(a), jnp.asarray(b)))
        assert abs(m.measure() - expect) < 1e-6
        assert m.measure() > 0.0
        m.update(a, a)
        assert m.vals[-1] < 1e-5


class TestGraftEntry:
    def test_entry_lowers(self):
        """The driver compile-checks entry() single-chip; lowering the
        jitted fn against its example args catches signature/shape rot."""
        import __graft_entry__ as g

        fn, args = g.entry()
        jax.jit(fn).lower(*args)  # tracing succeeds = shapes consistent


class TestGridCapacityShape:
    """Round-4 capacity-shape axis: --grid_levels/--grid_featdim reshape the
    hash grid (L x F) at the SAME desired_resolution and feature count. The
    reference pins 16x2 (gridencoder/grid.py __init__); 8x4 halves gather
    rows per sample — quality-gated in tools/quality_exp.py (cap84)."""

    def test_flags_reach_nerf_config(self):
        from focnerf_tpu.config import parse_options

        o = parse_options(["x", "--grid_levels", "8", "--grid_featdim", "4"])
        c = o.nerf_config()
        assert (c.num_levels, c.level_dim) == (8, 4)

    def test_same_desired_resolution_and_width(self):
        from focnerf_tpu.config import parse_options

        c16 = parse_options(["x"]).nerf_config()
        c8 = parse_options(
            ["x", "--grid_levels", "8", "--grid_featdim", "4"]
        ).nerf_config()
        s16, s8 = c16.grid_spec, c8.grid_spec
        # same finest lattice up to geometric-ladder ceil rounding
        # (desired_resolution = 2048*bound for both)
        assert abs(s16.resolutions[-1] - s8.resolutions[-1]) <= 2
        # same concatenated feature width -> MLP input unchanged
        assert s16.output_dim == s8.output_dim == 32

    def test_cap84_train_step_smoke(self):
        """One optimization step on the 8x4 shape with the -O stochastic
        stack: params update, loss is finite (plumbing end-to-end)."""
        import optax

        from focnerf_tpu.models.nerf import (
            NeRFConfig, color_fn, density_fn, init_nerf_params,
        )

        cfg = NeRFConfig(
            use_objfeat=False, num_levels=8, level_dim=4,
            stochastic_corners=1, stochastic_min_size=1,
            compute_dtype=jnp.float32,
        )
        params = init_nerf_params(jax.random.key(0), cfg)
        x = jax.random.uniform(jax.random.key(1), (64, 3), minval=-1, maxval=1)
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (64, 1))

        def loss_fn(p, rng):
            sigma, geo = density_fn(p, cfg, x, rng=rng)
            color = color_fn(p, cfg, d, geo)
            return jnp.mean(sigma**2) + jnp.mean((color - 0.5) ** 2)

        opt = optax.adam(1e-2)
        st = opt.init(params)
        l0, g = jax.value_and_grad(loss_fn)(params, jax.random.key(2))
        up, st = opt.update(g, st)
        p1 = optax.apply_updates(params, up)
        assert np.isfinite(float(l0))
        assert float(jnp.abs(p1["grid"] - params["grid"]).max()) > 0
