"""Pallas TPU kernel: fused one-hot hash-table backward for one level.

The XLA path (ops/hashgrid.py::_encode_bwd_mxu) materializes the int8
one-hot factors ([B, HI] and [B, LO]) in HBM between construction and the
MXU matmul — measured ~5 ms/level of pure HBM traffic on top of the ~1.4 ms
int8 flop floor (m*(HI+LO) bytes per level written AND read back). This
kernel keeps the one-hots entirely in VMEM: each grid step loads one
_SUB-entry stripe of raw (row id, contribution) pairs (~8 bytes/entry),
quantizes it, builds [_SEG, _SUB]/[_SUB, _LO] int8 one-hot tiles by
comparing iotas against the entry row/column (entries ride the lane axis
for the hi factor and the sublane axis for the lo factor — both prepared
host-side, so no transposes/relayouts appear anywhere in the kernel), runs
the 2x-peak int8 MXU contraction, and dequantizes into the fp32 output.

The hi axis is tiled by a SECOND grid dimension (_SEG = 128 rows per
segment) rather than sized per level: Mosaic compile time grows
superlinearly in the one-hot height (measured 2 s at 32 rows, 14 s at 128,
>9 min at 1024), while a static 128-row kernel stepped across segments
compiles once and reuses cleanly. Flops are identical either way
(2 * m * size per channel — the price of the one-hot recast).

This is the scatter-add of `kernel_grid_backward` (gridencoder.cu:88-245)
— atomicAdd over table rows — recast a third time: round-1 sorted scatter,
round-2 XLA one-hot matmuls, now a fused kernel at the int8 flop floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LO = 512  # low-radix width of the row decomposition
_SUB = 1024  # entries per grid step (the MXU contraction depth)
_SEG = 128  # hi rows per segment (the one-hot height; static for Mosaic)


def _bwd_level_kernel(r_ref, rcol_ref, c_ref, out_ref, *, C, use_int8):
    """One grid step: accumulate _SUB pairs into segment s of the table.

    Grid is (n_seg, n_stripes); program (s, i) folds entry stripe i into
    hi rows [s*_SEG, (s+1)*_SEG). r_ref [1, 1, _SUB] int32 (entries on
    lanes), rcol_ref [1, _SUB, 1] int32 (entries on sublanes), c_ref
    [1, 1, _SUB, C] f32. out_ref [C, _SEG, _LO] f32 — the segment's block,
    resident across the inner (stripe) grid dimension.

    ``use_int8``: int8 one-hots ride the 2x-peak int8 MXU path when the
    stack lowers int8 dot_general to the MXU (round-2: it fell back to a
    ~500x VPU loop); the bf16 variant is exact (one-hots and bf16-rounded
    contribs, fp32 accumulation) and matches the XLA path's precision.
    """
    s = pl.program_id(0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    hi_t = r_ref[0] // _LO - s * _SEG  # [1, SUB], segment-relative
    lo_col = rcol_ref[0] % _LO  # [SUB, 1]

    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (_SEG, 1), 0)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LO), 1)
    oh_hi = hi_iota == hi_t  # [SEG, SUB] bool; rows outside the segment miss

    if use_int8:
        oh_lo = (lo_col == lo_iota).astype(jnp.int8)  # [SUB, LO]
        for ch in range(C):
            c_ch = c_ref[0, 0, :, ch].reshape(1, -1)  # [1, SUB]
            # per-(stripe, channel) symmetric int8 quantization
            scale = jnp.maximum(jnp.max(jnp.abs(c_ch)), 1e-30) / 127.0
            q_t = jnp.round(c_ch / scale).astype(jnp.int8)
            lhs = jnp.where(oh_hi, q_t, jnp.int8(0))  # [SEG, SUB] int8
            prod = jax.lax.dot_general(
                lhs,
                oh_lo,
                dimension_numbers=(((1,), (0,)), ((), ())),  # canonical MXU
                preferred_element_type=jnp.int32,
            )  # [SEG, LO]
            out_ref[ch] += scale * prod.astype(jnp.float32)
    else:
        oh_lo = (lo_col == lo_iota).astype(jnp.bfloat16)  # [SUB, LO]
        for ch in range(C):
            c_ch = c_ref[0, 0, :, ch].reshape(1, -1).astype(jnp.bfloat16)
            lhs = jnp.where(oh_hi, c_ch, jnp.bfloat16(0))  # [SEG, SUB]
            prod = jax.lax.dot_general(
                lhs,
                oh_lo,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [SEG, LO] fp32
            out_ref[ch] += prod


@functools.partial(jax.jit, static_argnames=("size", "interpret", "use_int8"))
def hashgrid_bwd_level(
    r: jax.Array,  # [m] int32, in-level row ids in [0, size)
    c: jax.Array,  # [m, C] float32 contributions
    *,
    size: int,
    interpret: bool = False,
    use_int8: bool = True,
) -> jax.Array:
    """d_T[s, ch] = sum over i of (r[i] == s) * c[i, ch], as [size, C] f32.

    Zero-contribution padding is the caller's tool for ragged m: rows with
    c == 0 land anywhere (conventionally row 0) without effect.
    ``use_int8=False`` selects the exact bf16 variant (see kernel doc).
    """
    m = r.shape[0]
    C = c.shape[1]
    n_hi = -(-size // _LO)
    n_seg = -(-n_hi // _SEG)

    pad = (-m) % _SUB
    if pad:
        r = jnp.pad(r, (0, pad))  # row 0 with zero contribution
        c = jnp.pad(c, ((0, pad), (0, 0)))
    n_stripes = r.shape[0] // _SUB
    r2 = r.reshape(n_stripes, 1, _SUB)
    rcol = r.reshape(n_stripes, _SUB, 1)
    c2 = c.reshape(n_stripes, 1, _SUB, C)

    out = pl.pallas_call(
        functools.partial(_bwd_level_kernel, C=C, use_int8=use_int8),
        grid=(n_seg, n_stripes),
        in_specs=[
            pl.BlockSpec(
                (1, 1, _SUB), lambda s, i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _SUB, 1), lambda s, i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, _SUB, C),
                lambda s, i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (C, _SEG, _LO), lambda s, i: (0, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, n_seg * _SEG, _LO), jnp.float32),
        # the AOT accounting charges the full output + pipelined input
        # blocks against the 16 MB default scoped limit; v5e has 128 MB
        # of VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(r2, rcol, c2)
    # [C, HI, LO] -> [size, C]
    return out.reshape(C, n_seg * _SEG * _LO)[:, :size].T
