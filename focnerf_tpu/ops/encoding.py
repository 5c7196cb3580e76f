"""Encoder dispatch (the reference's *missing* encoding.py, reconstructed).

torch-ngp's ``get_encoder`` maps names to encoder instances; the FOC-NeRF
snapshot lost the file entirely (imported at nerf/network.py:5 but absent —
SURVEY §1 L1). Here the same surface returns (encode_fn, init_fn, output_dim)
triples over the functional ops.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

from focnerf_tpu.ops.freq import freq_encode, freq_output_dim
from focnerf_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode, hashgrid_init
from focnerf_tpu.ops.sh import sh_encode


def get_encoder(
    encoding: str = "hashgrid",
    input_dim: int = 3,
    degree: int = 4,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: float = 2048,
):
    """Returns (encode_fn(params, x) -> feats, init_fn(rng) -> params, out_dim).

    Stateless encoders (frequency / spherical harmonics) take params=None.
    Names follow torch-ngp: 'None' | 'frequency' | 'sphere_harmonics' |
    'hashgrid' | 'tiledgrid'.
    """
    if encoding in ("None", "none", None):
        return (lambda p, x: x), (lambda rng: None), input_dim

    if encoding == "frequency":
        fn = lambda p, x: freq_encode(x, degree)
        return fn, (lambda rng: None), freq_output_dim(input_dim, degree)

    if encoding == "sphere_harmonics":
        fn = lambda p, x: sh_encode(x, degree)
        return fn, (lambda rng: None), degree**2

    if encoding in ("hashgrid", "tiledgrid"):
        # 'tiledgrid' differs only in skipping the hash for overflow levels;
        # with log2_hashmap_size=19 the layouts coincide for typical configs.
        spec = HashGridSpec.create(
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            input_dim=input_dim,
        )
        fn = lambda p, x: hashgrid_encode(p, x, spec)
        init = lambda rng: hashgrid_init(rng, spec)
        return fn, init, spec.output_dim

    raise ValueError(f"unknown encoding {encoding!r}")
