"""Static FLOP / memory-traffic counter for jitted programs (roofline/MFU).

XLA's ``compiled.cost_analysis()`` visits a ``while`` body ONCE, so any
program containing ``lax.scan`` / ``lax.fori_loop`` (every training step in
this repo: the hash-grid chunk scans, the od-space compositing scan, the
fused K-step dispatch) is undercounted by the trip count. This walker
traverses the *jaxpr* instead and multiplies loop bodies by their static
trip counts, so the number it reports is the LOGICAL work of one program
execution:

- ``flops``: MXU work — ``dot_general`` + ``conv_general_dilated`` only
  (2*M*N*K per contraction). Elementwise VPU flops are excluded on
  purpose: MFU is conventionally model flops over matmul peak, and on TPU
  the elementwise tail fuses into the matmuls' HBM traffic anyway.
- ``gather_bytes``: bytes moved by ``gather`` / ``scatter*`` /
  ``dynamic_slice`` rows (read + write of the addressed elements). These
  random-access ops never ride the MXU; on this workload (hash-table
  lookups, occupancy probes) they are the HBM-side roofline term.

Counting is on the pre-optimization jaxpr, i.e. logical work: operations
that XLA later fuses away are still counted, and ``jax.checkpoint``
recompute is NOT counted (grad-of-checkpoint traces the rematerialized
ops only at lowering). Both choices match the standard MFU definition
(useful flops, not executed flops).

Used by bench.py to emit ``mfu`` / ``hbm_gather_util`` against the chip's
public peak (VERDICT r4 item 6: place every rays/s claim against the
hardware ceiling). No reference counterpart — the reference reports raw
rays/s only (torch-ngp style; /root/reference/nerf/utils.py logs).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np

# public TPU v5e (v5 lite) per-chip peaks; jax.devices() on the bench chip
# reports "TPU v5 lite". bf16 MXU peak and HBM bandwidth from the public
# spec sheet (cloud.google.com/tpu/docs/v5e; scaling-book ch.1 table).
TPU_V5E_PEAK_BF16_FLOPS = 197e12
TPU_V5E_HBM_BYTES_PER_S = 819e9


def _dot_general_flops(eqn) -> float:
    """2*M*N*K*batch for one dot_general, from operand avals."""
    (lhs, rhs) = (v.aval for v in eqn.invars[:2])
    dnums = eqn.params["dimension_numbers"]
    (lc, rc), (lb, _rb) = dnums
    batch = math.prod(lhs.shape[d] for d in lb) if lb else 1
    k = math.prod(lhs.shape[d] for d in lc) if lc else 1
    m = math.prod(
        lhs.shape[d] for d in range(lhs.ndim) if d not in set(lc) | set(lb)
    )
    n = math.prod(
        rhs.shape[d]
        for d in range(rhs.ndim)
        if d not in set(rc) | set(_rb)
    )
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    # flops = 2 * out_elems * (reduction size = prod(kernel spatial) * C_in)
    dnums = eqn.params["dimension_numbers"]
    k_spatial = math.prod(rhs.shape[d] for d in dnums.rhs_spec[2:])
    c_in = rhs.shape[dnums.rhs_spec[1]]
    return 2.0 * out.size * k_spatial * c_in


def _nbytes(aval) -> float:
    try:
        return float(aval.size * np.dtype(aval.dtype).itemsize)
    except Exception:  # abstract tokens etc.
        return 0.0


_GATHERISH = {"gather", "dynamic_slice", "take", "take_along_axis"}
_SCATTERISH = {"scatter", "scatter-add", "scatter_add", "scatter-update",
               "dynamic_update_slice"}


def _count_jaxpr(jaxpr, mult: float, acc: dict) -> None:
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            acc["flops"] += mult * _dot_general_flops(eqn)
        elif prim == "conv_general_dilated":
            acc["flops"] += mult * _conv_flops(eqn)
        elif prim in _GATHERISH:
            # read the addressed rows + write the result
            acc["gather_bytes"] += mult * 2.0 * _nbytes(eqn.outvars[0].aval)
        elif prim in _SCATTERISH:
            # read-modify-write of the addressed rows (updates operand)
            upd = eqn.invars[-1].aval
            acc["gather_bytes"] += mult * 3.0 * _nbytes(upd)
        elif prim == "scan":
            length = eqn.params.get("length", 1)
            inner = eqn.params["jaxpr"].jaxpr
            _count_jaxpr(inner, mult * length, acc)
        elif prim == "while":
            # trip count is dynamic; visit once and record that the result
            # is a lower bound (bench paths use scan/fori with static
            # bounds, so this fires only for genuinely dynamic loops)
            acc["dynamic_while"] = True
            _count_jaxpr(eqn.params["body_jaxpr"].jaxpr, mult, acc)
        elif prim == "cond":
            # count the most expensive branch
            best: dict = {}
            for br in eqn.params["branches"]:
                sub = {"flops": 0.0, "gather_bytes": 0.0}
                _count_jaxpr(br.jaxpr, mult, sub)
                if sub["flops"] >= best.get("flops", -1.0):
                    best = sub
            acc["flops"] += best.get("flops", 0.0)
            acc["gather_bytes"] += best.get("gather_bytes", 0.0)
        else:
            # recurse into any call-like primitive (pjit, remat/checkpoint,
            # custom_vjp/jvp, closed_call, core_call ...)
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    inner = getattr(sub, "jaxpr", sub)
                    _count_jaxpr(inner, mult, acc)
                    break


def count_program(fn, *args, **kwargs) -> dict:
    """Logical flops + gather traffic of ``fn(*args)``, loops unrolled.

    Returns ``{"flops", "gather_bytes", "dynamic_while"}``. ``fn`` may be
    jitted or plain; tracing happens on abstract values (no device work).
    """
    # NOTE: do not unwrap __wrapped__ — jax transforms (grad, jit) set it
    # to the ORIGINAL function; make_jaxpr traces transformed callables
    # directly (jit appears as a pjit eqn the walker recurses into)
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    acc = {"flops": 0.0, "gather_bytes": 0.0, "dynamic_while": False}
    _count_jaxpr(closed.jaxpr, 1.0, acc)
    return acc


def roofline(
    fn,
    *args,
    step_seconds: float,
    steps_per_program: int = 1,
    peak_flops: float = TPU_V5E_PEAK_BF16_FLOPS,
    hbm_bytes_per_s: float = TPU_V5E_HBM_BYTES_PER_S,
    **kwargs,
) -> dict:
    """MFU + gather-bandwidth utilization for one measured program.

    ``step_seconds`` is the measured wall time of ONE train step;
    ``steps_per_program`` divides the counted work when ``fn`` folds K
    steps into one dispatch (fori_loop harnesses).
    """
    c = count_program(fn, *args, **kwargs)
    flops_per_step = c["flops"] / steps_per_program
    gbytes_per_step = c["gather_bytes"] / steps_per_program
    return {
        "flops_per_step": flops_per_step,
        "gather_bytes_per_step": gbytes_per_step,
        "achieved_tflops": flops_per_step / step_seconds / 1e12,
        "mfu": flops_per_step / step_seconds / peak_flops,
        "gather_gbps": gbytes_per_step / step_seconds / 1e9,
        "hbm_gather_util": gbytes_per_step / step_seconds / hbm_bytes_per_s,
        "lower_bound": bool(c["dynamic_while"]),
    }
