"""Alternating level-subset table backward (HashGridSpec.grad_levels):
live levels must receive EXACTLY the full-backward gradient rows, skipped
levels exactly zero, forward unchanged — across all three backward modes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.ops import hashgrid as hg
from focnerf_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode, hashgrid_init


def _spec(**kw):
    return HashGridSpec.create(
        num_levels=6, level_dim=2, base_resolution=4,
        log2_hashmap_size=10, desired_resolution=64, **kw,
    )


def _grad(spec, table, x, rng=None):
    def loss(t):
        out = hashgrid_encode(t, x, spec, rng=rng)
        return jnp.sum(jnp.sin(3.0 * out) * jnp.arange(out.shape[-1]))

    return jax.grad(loss)(table)


@pytest.mark.parametrize("mode", ["sort", "mxu", "hybrid"])
def test_grad_levels_masks_exactly(mode):
    spec = _spec()
    live = (0, 2, 5)
    spec_sub = dataclasses.replace(spec, grad_levels=live)
    table = hashgrid_init(jax.random.key(0), spec)
    x = jax.random.uniform(jax.random.key(1), (257, 3))

    old = hg.BACKWARD_MODE
    hg.BACKWARD_MODE = mode
    try:
        g_full = _grad(spec, table, x)
        g_sub = _grad(spec_sub, table, x)
    finally:
        hg.BACKWARD_MODE = old

    # forward identical
    np.testing.assert_allclose(
        np.asarray(hashgrid_encode(table, x, spec_sub)),
        np.asarray(hashgrid_encode(table, x, spec)),
    )
    for lvl in range(spec.num_levels):
        s, e = spec.offsets[lvl], spec.offsets[lvl + 1]
        blk_full = np.asarray(g_full[s:e])
        blk_sub = np.asarray(g_sub[s:e])
        if lvl in live:
            np.testing.assert_allclose(blk_sub, blk_full, rtol=2e-4,
                                       atol=1e-6, err_msg=f"level {lvl}")
        else:
            assert np.all(blk_sub == 0.0), f"level {lvl} should be masked"


def test_grad_levels_stochastic_uniform_k():
    """The uniform-K fast-contrib path must respect the mask too."""
    spec = dataclasses.replace(
        _spec(), stochastic_k=1, stochastic_min_size=1
    )
    live = (1, 3)
    spec_sub = dataclasses.replace(spec, grad_levels=live)
    table = hashgrid_init(jax.random.key(0), spec)
    x = jax.random.uniform(jax.random.key(1), (129, 3))
    rng = jax.random.key(7)
    g_full = _grad(spec, table, x, rng=rng)
    g_sub = _grad(spec_sub, table, x, rng=rng)
    for lvl in range(spec.num_levels):
        s, e = spec.offsets[lvl], spec.offsets[lvl + 1]
        if lvl in live:
            np.testing.assert_allclose(
                np.asarray(g_sub[s:e]), np.asarray(g_full[s:e]),
                rtol=2e-4, atol=1e-6,
            )
        else:
            assert np.all(np.asarray(g_sub[s:e]) == 0.0)


def test_phase_partition_covers_all_levels():
    """Two alternating phases must partition the level set."""
    spec = _spec()
    L = spec.num_levels
    p0 = tuple(l for l in range(L) if l % 2 == 0)
    p1 = tuple(l for l in range(L) if l % 2 == 1)
    assert sorted(p0 + p1) == list(range(L))
