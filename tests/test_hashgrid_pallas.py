"""Fused one-hot backward kernel vs a numpy scatter (interpret mode on CPU).

ops/hashgrid_pallas.py::hashgrid_bwd_level is a kernel-pattern demonstrator
(like ops/composite_pallas.py): correct, but NOT wired as the default
backward — on the v5e relay the int8 dot_general lowers to a VPU loop
(~100x off MXU speed) and Mosaic compile time grows superlinearly in the
one-hot height (see the negative-result entry in PERF.md round 2).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.ops.hashgrid_pallas import hashgrid_bwd_level


@pytest.mark.parametrize("use_int8", [True, False])
@pytest.mark.parametrize(
    "size,m",
    [
        (524288, 4096),  # hashed level (multi-segment hi axis)
        (13824, 10000),  # dense level, sub-segment hi axis
        (4920, 50000),  # heavy collisions (m >> size)
    ],
)
def test_matches_numpy_scatter(size, m, use_int8):
    rng = np.random.default_rng(size)
    r = rng.integers(0, size, m).astype(np.int32)
    c = rng.normal(size=(m, 2)).astype(np.float32)
    out = np.asarray(
        hashgrid_bwd_level(
            jnp.asarray(r), jnp.asarray(c), size=size, interpret=True,
            use_int8=use_int8,
        )
    )
    ref = np.zeros((size, 2), np.float32)
    np.add.at(ref, r, c)
    # int8: ~1% relative (symmetric per-stripe quantization);
    # bf16: contribs rounded to bf16, fp32 accumulation — ~0.5% worst-case
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert rel < (0.02 if use_int8 else 0.01), f"rel err {rel}"
    # structure: rows never touched stay exactly zero
    untouched = np.setdiff1d(np.arange(size), r)
    if len(untouched):
        assert np.abs(out[untouched]).max() == 0.0


def test_ragged_padding_is_neutral():
    size = 13824
    rng = np.random.default_rng(0)
    r = rng.integers(1, size, 777).astype(np.int32)  # avoid row 0
    c = rng.normal(size=(777, 2)).astype(np.float32)
    out = np.asarray(
        hashgrid_bwd_level(jnp.asarray(r), jnp.asarray(c), size=size, interpret=True)
    )
    # padding lands on row 0 with zero contribution
    assert np.abs(out[0]).max() == 0.0
