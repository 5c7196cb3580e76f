"""Tiny bias-free MLPs as plain bf16 matmul chains.

Replaces tcnn FullyFusedMLP / the ffmlp CUDA extension. On TPU the MXU plus
XLA fusion already gives the "fully fused" behaviour those kernels hand-roll
on GPU (shared-memory-resident activations, wmma tiles — ffmlp/src/ffmlp.cu),
so the model layer is ordinary ``dot_general`` chains: weights stored fp32,
compute in a configurable dtype (bf16 by default) with fp32 accumulation.

tcnn networks are bias-free (as is torch-ngp's nn.Linear(bias=False) variant,
nerf/network.py:50-66) — we match that.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def mlp_init(rng: jax.Array, dims: Sequence[int], dtype=jnp.float32) -> List[jax.Array]:
    """Init a bias-free MLP with layer sizes dims[0] -> ... -> dims[-1].

    Kaiming-uniform fan-in init (torch nn.Linear default scheme).
    Returns a list of [in, out] weight matrices.
    """
    keys = jax.random.split(rng, len(dims) - 1)
    ws = []
    for k, d_in, d_out in zip(keys, dims[:-1], dims[1:]):
        bound = (1.0 / d_in) ** 0.5
        ws.append(jax.random.uniform(k, (d_in, d_out), dtype=dtype, minval=-bound, maxval=bound))
    return ws


def mlp_apply(ws: Sequence[jax.Array], x: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    """ReLU MLP forward; hidden activations in compute_dtype, fp32 accumulation.

    No output activation (callers apply trunc_exp / sigmoid as needed).
    Returns fp32.
    """
    h = x.astype(compute_dtype)
    n = len(ws)
    for i, w in enumerate(ws):
        h = jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32)
        if i < n - 1:
            h = jax.nn.relu(h).astype(compute_dtype)
    return h
