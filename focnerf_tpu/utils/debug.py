"""Numerical-health guards.

XLA is race-free by construction (SURVEY §5: the CUDA reference needed
atomics; there is no TSAN equivalent to port). What remains worth guarding is
numerical health: NaN/Inf detection inside jitted steps via checkify, plus a
quick host-side pytree audit.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def checkify_step(step_fn):
    """Wrap a jitted-able step with checkify NaN/div guards.

    Returns (checked_fn); call as ``err, out = checked_fn(...)`` and raise
    with ``err.throw()`` when debugging training instabilities.
    """
    from jax.experimental import checkify

    return checkify.checkify(step_fn, errors=checkify.float_checks)


def tree_health(tree: Any) -> Dict[str, Dict[str, float]]:
    """Host-side audit: per-leaf nan/inf counts and magnitude stats."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        name = jax.tree_util.keystr(path)
        out[name] = {
            "nan": int(np.isnan(a).sum()),
            "inf": int(np.isinf(a).sum()),
            "absmax": float(np.abs(a).max()) if a.size else 0.0,
        }
    return out


def assert_finite(tree: Any, where: str = ""):
    bad = {k: v for k, v in tree_health(tree).items() if v["nan"] or v["inf"]}
    if bad:
        raise FloatingPointError(f"non-finite values {where}: {bad}")
