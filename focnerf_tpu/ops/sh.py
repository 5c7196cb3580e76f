"""Real spherical-harmonics direction encoding (degrees 1-4).

Replaces the tcnn SphericalHarmonics encoding / torch-ngp shencoder used by
nerf/network_tcnn.py:523-529 (degree 4 -> 16 features). Evaluated directly as
polynomials of the unit direction; XLA fuses this into the color MLP input.

NOTE on input convention: the reference feeds tcnn directions mapped to
[0, 1] (``d = (d + 1) / 2``) because tcnn internally maps back to [-1, 1].
Here ``sh_encode`` takes unit directions in [-1, 1] directly.
"""

import jax.numpy as jnp

# hardcoded SH polynomial constants (standard real SH basis, as in tiny-cuda-nn)
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199


def sh_encode(d, degree: int = 4):
    """Encode unit directions d [..., 3] into SH features [..., degree**2]."""
    if not 1 <= degree <= 4:
        raise ValueError(f"sh degree must be in [1, 4], got {degree}")
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    one = jnp.ones_like(x)

    out = [_C0 * one]
    if degree >= 2:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)
