"""Classic NeRF frequency (positional) encoding.

Replaces the freqencoder CUDA extension (freqencoder/src/freqencoder.cu:30-94):
output = [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{deg-1} x), cos(2^{deg-1} x)]
with output dim D + 2*D*degree (freqencoder/freq.py:61). Used by the D-NeRF
time / deformation encoders (dnerf/network.py:34-35).
"""

import jax.numpy as jnp


def freq_encode(x, degree: int = 4):
    """x [..., D] -> [..., D * (1 + 2*degree)]."""
    outs = [x]
    for f in range(degree):
        xf = x * (2.0**f)
        outs.append(jnp.sin(xf))
        outs.append(jnp.cos(xf))
    return jnp.concatenate(outs, axis=-1)


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim + 2 * input_dim * degree
