"""Truncated exponential: exp forward, gradient clamped for stability.

Parity target: activation.py:5-18 in the reference (``trunc_exp``), which
computes exp(x) in fp32 forward and backpropagates g * exp(clamp(x, -15, 15)).
"""

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x):
    return jnp.exp(x.astype(jnp.float32))


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    x = x.astype(jnp.float32)
    y = jnp.exp(x)
    return y, dx.astype(jnp.float32) * jnp.exp(jnp.clip(x, -15.0, 15.0))
