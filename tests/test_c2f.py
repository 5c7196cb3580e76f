"""Coarse-to-fine hash-level schedule (HashGridSpec.truncate +
hashgrid_encode_c2f + Trainer c2f stages).

The truncated spec must be exactly the first-A-levels layout of the full
spec (offsets are cumulative, so the sub-table is a prefix slice), the
c2f encode must match the full encode on active features with zero fine
features and ZERO gradient into fine-level table rows, and the trainer
must compile one step per (slab, phase, stage) and switch at boundaries.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.ops.hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    hashgrid_encode_c2f,
    hashgrid_init,
)


def _spec(**kw):
    return HashGridSpec.create(
        num_levels=6, level_dim=2, base_resolution=4,
        log2_hashmap_size=10, desired_resolution=64, **kw,
    )


def test_truncate_is_prefix_layout():
    spec = _spec()
    sub = spec.truncate(4)
    ref = HashGridSpec.create(
        num_levels=4, level_dim=2, base_resolution=4,
        log2_hashmap_size=10, per_level_scale=spec.per_level_scale,
    )
    assert sub.resolutions == ref.resolutions == spec.resolutions[:4]
    assert sub.offsets == ref.offsets == spec.offsets[:5]
    assert sub.hashed == ref.hashed
    assert sub.table_rows == spec.offsets[4]


def test_truncate_filters_grad_levels_and_validates():
    spec = dataclasses.replace(_spec(), grad_levels=(1, 3, 5))
    assert spec.truncate(4).grad_levels == (1, 3)
    assert spec.truncate(1).grad_levels is None  # empty subset -> None
    with pytest.raises(ValueError):
        spec.truncate(0)
    with pytest.raises(ValueError):
        spec.truncate(7)


def test_c2f_encode_matches_sub_spec_plus_zero_pad():
    spec = _spec()
    table = hashgrid_init(jax.random.key(0), spec)
    x = jax.random.uniform(jax.random.key(1), (129, 3))
    active = 4
    sub = spec.truncate(active)
    out = hashgrid_encode_c2f(table, x, spec, active)
    ref = hashgrid_encode(table[: sub.table_rows], x, sub)
    assert out.shape == (129, spec.output_dim)
    np.testing.assert_array_equal(out[:, : sub.output_dim], ref)
    np.testing.assert_array_equal(out[:, sub.output_dim :], 0.0)


@pytest.mark.parametrize("active", [0, 6, 99])
def test_c2f_inactive_values_are_full_encode(active):
    spec = _spec()
    table = hashgrid_init(jax.random.key(0), spec)
    x = jax.random.uniform(jax.random.key(1), (65, 3))
    np.testing.assert_array_equal(
        hashgrid_encode_c2f(table, x, spec, active),
        hashgrid_encode(table, x, spec),
    )


def test_c2f_fine_rows_get_zero_gradient():
    spec = _spec()
    table = hashgrid_init(jax.random.key(0), spec)
    x = jax.random.uniform(jax.random.key(1), (257, 3))
    active = 3
    cut = spec.truncate(active).table_rows

    def loss(t, fn, *a):
        out = fn(t, x, *a)
        return jnp.sum(jnp.sin(3.0 * out) * jnp.arange(out.shape[-1]))

    g = jax.grad(loss)(table, lambda t, x: hashgrid_encode_c2f(t, x, spec, active))
    np.testing.assert_array_equal(np.asarray(g[cut:]), 0.0)
    # prefix rows match the sub-spec's own gradient exactly
    g_sub = jax.grad(loss)(
        table[:cut], lambda t, x: hashgrid_encode(t, x, spec.truncate(active))
    )
    np.testing.assert_allclose(np.asarray(g[:cut]), np.asarray(g_sub), rtol=1e-6)


def test_c2f_stochastic_mode_runs():
    spec = dataclasses.replace(_spec(), stochastic_k=1, stochastic_min_size=1)
    table = hashgrid_init(jax.random.key(0), spec)
    x = jax.random.uniform(jax.random.key(1), (64, 3))
    out = hashgrid_encode_c2f(table, x, spec, 4, rng=jax.random.key(2))
    assert out.shape == (64, spec.output_dim)
    assert not np.any(np.asarray(out[:, 4 * spec.level_dim :]))


def test_trainer_c2f_stage_switch(tmp_path):
    from focnerf_tpu.models.nerf import NeRFConfig
    from focnerf_tpu.train.trainer import Trainer

    cfg = NeRFConfig(
        num_levels=4, log2_hashmap_size=8, hidden_dim=16,
        hidden_dim_color=16, geo_feat_dim=7, use_objfeat=False,
    )
    tr = Trainer(
        "t", cfg, workspace=str(tmp_path), iters=10, use_occupancy=True,
        c2f="0.5:2", use_tensorboard=False, train_slab=16, skip_march=True,
        eval_save_images=False,
    )
    tr.global_step = 0
    c, key = tr._phase_cfg()
    assert c.active_levels == 2 and key == (0, 2)
    tr.global_step = 5
    c, key = tr._phase_cfg()
    assert c.active_levels == 0 and key == (0, 0)


def test_trainer_c2f_with_grad_phases_subsets_active_levels(tmp_path):
    from focnerf_tpu.models.nerf import NeRFConfig
    from focnerf_tpu.train.trainer import Trainer

    cfg = NeRFConfig(
        num_levels=4, log2_hashmap_size=8, hidden_dim=16,
        hidden_dim_color=16, geo_feat_dim=7, use_objfeat=False,
    )
    tr = Trainer(
        "t", cfg, workspace=str(tmp_path), iters=10, use_occupancy=True,
        c2f="0.5:2", grad_level_phases=2, use_tensorboard=False,
        train_slab=16, skip_march=True, eval_save_images=False,
    )
    tr.global_step = 0
    c, key = tr._phase_cfg()
    # phase 0 over the 2 ACTIVE levels only
    assert c.active_levels == 2 and c.grad_levels == (0,)
    tr.global_step = 1
    c, _ = tr._phase_cfg()
    assert c.grad_levels == (1,)
    tr.global_step = 8  # past the stage: phases span all levels again
    c, _ = tr._phase_cfg()
    assert c.active_levels == 0 and c.grad_levels == (0, 2)


def test_trainer_c2f_validation(tmp_path):
    from focnerf_tpu.models.nerf import NeRFConfig
    from focnerf_tpu.train.trainer import Trainer

    cfg = NeRFConfig(num_levels=4, log2_hashmap_size=8, use_objfeat=False)
    with pytest.raises(ValueError, match="occupancy"):
        Trainer("t", cfg, workspace=str(tmp_path), c2f="0.5:2",
                use_tensorboard=False)
    with pytest.raises(ValueError, match="outside"):
        Trainer("t", cfg, workspace=str(tmp_path), c2f="0.5:9",
                use_occupancy=True, use_tensorboard=False)


def test_trainer_c2f_trains_end_to_end(tmp_path):
    """A tiny occupancy run crossing a stage boundary steps without error
    and the loss is finite (the compiled-step cache gains one entry per
    stage)."""
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
        num_levels=4, log2_hashmap_size=8, hidden_dim=16,
        hidden_dim_color=16, geo_feat_dim=7, use_objfeat=False,
        stochastic_corners=1, stochastic_min_size=1,
        compute_dtype=jnp.float32,
    )
    tr = Trainer(
        "t", cfg, workspace=str(tmp_path / "ws"), iters=4, num_steps=32,
        use_occupancy=True, c2f="0.5:2", use_tensorboard=False,
        train_slab=16, skip_march=True, eval_save_images=False,
        update_extra_interval=100, dt_gamma=0.0, max_steps=64,
    )
    for _ in range(4):
        loss = tr.train_step_once(ds)
        assert np.isfinite(loss)
    keys = set(getattr(tr, "_occ_step_cache").keys())
    assert {(16, (0, 2)), (16, (0, 0))} <= keys
