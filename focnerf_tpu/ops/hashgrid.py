"""Multiresolution hash-grid encoding (Instant-NGP), TPU-native.

Replaces the gridencoder CUDA extension (gridencoder/src/gridencoder.cu) and
the tcnn HashGrid used by the active FOC-NeRF model (nerf/network_tcnn.py:
478-490). Layout parity with gridencoder/grid.py:96-136:

  - per level l: resolution R_l = ceil(base * s^l), s = per-level scale;
  - dense levels index with strides (R_l+1)^d (align_corners=False) while the
    dense table fits in 2^log2_hashmap_size entries, padded to a multiple of 8;
  - overflowing levels use the XOR-prime spatial hash
    h = x ^ (y * 2654435761) ^ (z * 805459861)  (mod level size)
    (gridencoder.cu:51-63, primes[0]==1);
  - trilinear interpolation of the 2^3 corners; out-of-[0,1] inputs encode
    to zeros (gridencoder.cu:110-135).

TPU design: indices for all (level, corner) pairs are built with vector
integer ops (VPU) and resolved through ONE fused gather from the flat
[total, C] table; the backward pass is the XLA-generated scatter-add, so the
op is fully differentiable w.r.t. both the table and the inputs (the input
gradient flows through the trilinear weights — needed by D-NeRF deformation).
A Pallas kernel variant can slot in behind the same signature for the hot
path; the math here is the reference oracle for it.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# per-dim hash primes (gridencoder.cu:54) — up to 7 input dims (D-NeRF hyper
# grids use 3 + ambient dims)
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static description of a hash-grid encoding (hashable; safe to close over in jit)."""

    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    per_level_scale: float = 2.0
    input_dim: int = 3
    # derived
    resolutions: Tuple[int, ...] = ()
    offsets: Tuple[int, ...] = ()  # num_levels + 1 entries, in table rows
    hashed: Tuple[bool, ...] = ()

    @classmethod
    def create(
        cls,
        num_levels: int = 16,
        level_dim: int = 2,
        base_resolution: int = 16,
        log2_hashmap_size: int = 19,
        per_level_scale: float | None = None,
        desired_resolution: float | None = None,
        input_dim: int = 3,
    ) -> "HashGridSpec":
        if desired_resolution is not None:
            per_level_scale = float(
                np.exp2(np.log2(desired_resolution / base_resolution) / (num_levels - 1))
            )
        assert per_level_scale is not None
        max_params = 2**log2_hashmap_size
        resolutions, offsets, hashed = [], [0], []
        offset = 0
        for lvl in range(num_levels):
            res = int(np.ceil(base_resolution * per_level_scale**lvl))
            dense_size = (res + 1) ** input_dim
            params_in_level = min(max_params, dense_size)
            params_in_level = int(np.ceil(params_in_level / 8) * 8)
            resolutions.append(res)
            hashed.append(dense_size > max_params)
            offset += params_in_level
            offsets.append(offset)
        return cls(
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            per_level_scale=float(per_level_scale),
            input_dim=input_dim,
            resolutions=tuple(resolutions),
            offsets=tuple(offsets),
            hashed=tuple(hashed),
        )

    @property
    def table_rows(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def level_size(self, lvl: int) -> int:
        return self.offsets[lvl + 1] - self.offsets[lvl]


def hashgrid_init(rng: jax.Array, spec: HashGridSpec, dtype=jnp.float32) -> jax.Array:
    """Uniform(-1e-4, 1e-4) init, as gridencoder/grid.py:138-140."""
    return jax.random.uniform(
        rng, (spec.table_rows, spec.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def _level_corner_indices(x01: jax.Array, spec: HashGridSpec, lvl: int):
    """Corner table rows + trilinear weights for one level.

    Returns (rows [N, 8] int32 — rows into the FLAT table, including the level
    offset — and weights [N, 8] float32).
    """
    D = spec.input_dim
    # exact CUDA arithmetic: scale = exp2(l * log2(s)) * H - 1 (gridencoder.cu:138)
    scale = np.float32(np.exp2(lvl * np.log2(spec.per_level_scale)) * spec.base_resolution - 1.0)
    res = spec.resolutions[lvl]
    size = spec.level_size(lvl)

    pos = x01.astype(jnp.float32) * scale + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    base = pos_grid.astype(jnp.uint32)  # [N, D]

    n_corners = 1 << D
    # corner bit pattern, following gridencoder.cu:166-178 (bit d -> +1 in dim d)
    bits = np.array(
        [[(c >> d) & 1 for d in range(D)] for c in range(n_corners)], dtype=np.float32
    )  # [8, D]
    w = jnp.prod(
        jnp.where(bits[None, :, :] > 0, frac[:, None, :], 1.0 - frac[:, None, :]), axis=-1
    )  # [N, 8]
    corner = base[:, None, :] + bits.astype(np.uint32)[None, :, :]  # [N, 8, D] uint32

    if spec.hashed[lvl]:
        h = jnp.zeros(corner.shape[:-1], jnp.uint32)
        for d in range(D):
            h = h ^ (corner[..., d] * jnp.uint32(_PRIMES[d]))
        idx = h % jnp.uint32(size)
    else:
        stride = 1
        idx = jnp.zeros(corner.shape[:-1], jnp.uint32)
        for d in range(D):
            idx = idx + corner[..., d] * jnp.uint32(stride)
            stride *= res + 1
        # dense index < (res+1)^D <= size by construction; no modulo needed
    rows = idx.astype(jnp.int32) + jnp.int32(spec.offsets[lvl])
    return rows, w


@functools.lru_cache(maxsize=None)
def _corner_sum_matrices(num_levels: int, n_corners: int, level_dim: int):
    """Constant [L*corners, L*C] selection matrices G_c with
    G_c[l*corners + j, l*C + c] = 1 — the per-level corner sum expressed as a
    matmul. TPU layout note: any tensor shaped [..., L, corners(, C)] gets
    tile-padded up to 16-64x by Mosaic's (8,128) tiling (observed 16 GB for a
    1M-point batch); keeping everything 2-D with a wide minor dim and doing
    the corner reduction on the MXU avoids the blowup entirely.
    """
    # cache NUMPY constants (a cached jnp array created inside one jit trace
    # leaks its tracer into later traces)
    import numpy as _np

    Gs = []
    for c in range(level_dim):
        G = _np.zeros((num_levels * n_corners, num_levels * level_dim), _np.float32)
        for lvl in range(num_levels):
            G[lvl * n_corners : (lvl + 1) * n_corners, lvl * level_dim + c] = 1.0
        Gs.append(G)
    return tuple(Gs)


# Forward value-resolution algorithm:
#   "gather": one fused random-row gather (exact; the only option on CPU);
#   "mxu": levels small enough to keep their sub-table VMEM-resident resolve
#          corner values via hi/lo one-hot matmuls instead of the gather —
#          the per-index gather cost on v5e is a fixed ~10 cycles/row
#          REGARDLESS of table size, so small dense levels (sub-ms as
#          matmuls) are pure win; large/hashed levels stay on the gather;
#   None (default): auto — "mxu" on TPU, "gather" elsewhere.
FORWARD_MODE = None
_MXU_FWD_MAX_ROWS = (1 << 18) + 8  # resolve levels up to 64^3 dense via MXU
_FWD_LO = 128  # low-radix width (one lane tile) of the fwd decomposition
_FWD_CHUNK = 16384  # per-corner entries per matmul block


def _forward_mode() -> str:
    if FORWARD_MODE is not None:
        return FORWARD_MODE
    return "gather" if jax.default_backend() == "cpu" else "mxu"


def _level_vals_mxu(table: jax.Array, rows_in_level: jax.Array, spec: HashGridSpec, lvl: int):
    """Per-corner table values for one level via hi/lo one-hot matmuls.

    rows_in_level: [N, corners] int32, 0 <= r < level_size. Returns a list of
    ``level_dim`` arrays [N, corners] float32 (channel-separated — rank-2
    shapes only, see _corner_sum_matrices for the layout rationale).

    v[m] = T[r_m] with r = hi*_FWD_LO + lo becomes
    tmp[m, lo] = onehot_hi[m] @ T2[hi, lo]  (MXU),
    v[m] = sum_lo onehot_lo[m, lo] * tmp[m, lo]  (VPU row reduce).
    bf16 one-hots are exact; table values ride in bf16 (~0.4% rel — below the
    production bf16 compute dtype's own noise; precision tests use "gather").
    """
    n, n_corners = rows_in_level.shape
    size = spec.level_size(lvl)
    n_hi = -(-size // _FWD_LO)
    off = spec.offsets[lvl]
    pad_rows = n_hi * _FWD_LO - size
    T_lvl = jax.lax.slice_in_dim(table, off, off + size, axis=0)  # [S, C]
    if pad_rows:
        T_lvl = jnp.pad(T_lvl, ((0, pad_rows), (0, 0)))
    T2 = [
        T_lvl[:, c].reshape(n_hi, _FWD_LO).astype(jnp.bfloat16)
        for c in range(spec.level_dim)
    ]

    m_total = n * n_corners
    r = rows_in_level.reshape(-1)
    chunk = min(_FWD_CHUNK, -(-m_total // 1024) * 1024)
    pad = (-m_total) % chunk
    if pad:
        r = jnp.pad(r, (0, pad))
    n_chunks = r.shape[0] // chunk
    r = r.reshape(n_chunks, chunk)

    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_hi), 1)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _FWD_LO), 1)

    def block(_, r_b):
        oh_hi = ((r_b[:, None] // _FWD_LO) == hi_iota).astype(jnp.bfloat16)
        oh_lo = (r_b[:, None] % _FWD_LO) == lo_iota  # [B, LO] bool
        vs = []
        for ch in range(spec.level_dim):
            tmp = jnp.dot(oh_hi, T2[ch], preferred_element_type=jnp.float32)
            vs.append(jnp.sum(jnp.where(oh_lo, tmp, 0.0), axis=1))  # [B]
        return None, jnp.stack(vs, 0)  # [C, B]

    _, v = jax.lax.scan(block, None, r)  # [K, C, B]
    v = jnp.moveaxis(v, 1, 0).reshape(spec.level_dim, -1)[:, :m_total]
    return [v[c].reshape(n, n_corners) for c in range(spec.level_dim)]


def _encode_impl(table: jax.Array, x: jax.Array, spec: HashGridSpec):
    """Shared forward.

    Returns (out [N, L*C], rows [N, L*corners], weights [N, L*corners]) —
    all rank-2 with wide minor dims (layout-safe, see _corner_sum_matrices).
    Feature order is level-major then channel: out[:, l*C + c].
    """
    n = x.shape[0]
    n_corners = 1 << spec.input_dim
    rows_l, w_l = [], []
    for lvl in range(spec.num_levels):
        rows, w = _level_corner_indices(x, spec, lvl)
        rows_l.append(rows)
        w_l.append(w)
    rows = jnp.concatenate(rows_l, axis=1)  # [N, L*corners]
    weights = jnp.concatenate(w_l, axis=1)  # [N, L*corners]

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)  # [N]
    weights = jnp.where(oob[:, None], 0.0, weights)  # zero output + grads for oob

    mxu_lvls = (
        [
            lvl
            for lvl in range(spec.num_levels)
            if spec.level_size(lvl) <= _MXU_FWD_MAX_ROWS
        ]
        if _forward_mode() == "mxu"
        else []
    )
    gather_lvls = [lvl for lvl in range(spec.num_levels) if lvl not in mxu_lvls]

    # channel-separated per-level value blocks vcs[c][lvl] : [N, corners]
    vcs = [[None] * spec.num_levels for _ in range(spec.level_dim)]
    if gather_lvls:
        g_rows = jnp.concatenate([rows_l[lvl] for lvl in gather_lvls], axis=1)
        g_vals = jnp.take(table, g_rows.reshape(-1), axis=0)  # [N*G*corners, C]
        for c in range(spec.level_dim):
            vc = g_vals[:, c].reshape(n, len(gather_lvls) * n_corners)
            for gi, lvl in enumerate(gather_lvls):
                vcs[c][lvl] = vc[:, gi * n_corners : (gi + 1) * n_corners]
    for lvl in mxu_lvls:
        per_ch = _level_vals_mxu(table, rows_l[lvl] - spec.offsets[lvl], spec, lvl)
        for c in range(spec.level_dim):
            vcs[c][lvl] = per_ch[c]

    Gs = _corner_sum_matrices(spec.num_levels, n_corners, spec.level_dim)
    out = jnp.zeros((n, spec.num_levels * spec.level_dim), jnp.float32)
    for c in range(spec.level_dim):
        vc = jnp.concatenate(vcs[c], axis=1)  # [N, L*corners]
        out = out + jnp.dot(
            (weights * vc).astype(jnp.float32), Gs[c], preferred_element_type=jnp.float32
        )
    return out, rows, weights


def hashgrid_encode(
    table: jax.Array, x01: jax.Array, spec: HashGridSpec, input_grads: bool = False
) -> jax.Array:
    """Encode points x01 [..., D] in [0, 1] -> features [..., L * C].

    Out-of-range inputs produce zero features (reference gridencoder.cu:110-135).

    ``input_grads=False`` (default) routes through a custom VJP whose table
    backward sorts indices before the scatter-add — XLA TPU's scatter with
    unsorted duplicate indices serializes pathologically (measured 80x slower
    than the same scatter on sorted indices on v5e); position gradients are
    dropped (the static NeRF never differentiates w.r.t. sample positions).
    ``input_grads=True`` uses plain autodiff (needed by the D-NeRF
    deformation field, which backprops through the warped positions).
    """
    prefix = x01.shape[:-1]
    x = x01.reshape(-1, spec.input_dim)
    if input_grads:
        out, _, _ = _encode_impl(table, x, spec)
    else:
        out = _encode_sorted_bwd(table, x, spec)
    return out.reshape(*prefix, spec.output_dim)  # out already [N, L*C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _encode_sorted_bwd(table, x, spec: HashGridSpec):
    out, _, _ = _encode_impl(table, x, spec)
    return out


def _encode_fwd(table, x, spec: HashGridSpec):
    out, rows, weights = _encode_impl(table, x, spec)
    return out, (rows, weights, table.shape[0])


# Table-gradient backward algorithm:
#   "mxu": per-level hi/lo one-hot decomposition — two matmuls per level turn
#          the segment-sum into MXU work, no sort and no scatter (measured
#          1.69 s -> 0.33 s per train step on v5e, identical train quality);
#   "sort": argsort + sorted scatter-add (exact fp32; faster on CPU where the
#           matmul formulation's ~26 TFLOP has no MXU to run on);
#   None (default): auto — "mxu" on TPU, "sort" elsewhere.
BACKWARD_MODE = None


def _backward_mode() -> str:
    if BACKWARD_MODE is not None:
        return BACKWARD_MODE
    # "axon" is a tunneled TPU backend; treat any non-CPU backend as MXU-class
    return "sort" if jax.default_backend() == "cpu" else "mxu"
_MXU_CHUNK = 32768  # contributions per matmul block (bounds one-hot memory)
_LO = 512  # low-radix width of the index decomposition


def _encode_bwd_mxu(spec: HashGridSpec, rows, weights, g, n_rows):
    """d_table via per-level one-hot matmuls.

    For level l with S_l rows, decompose the in-level row r = hi*_LO + lo;
    then d_T[hi, lo] = sum_i onehot_hi[i, hi] * onehot_lo[i, lo] * contrib[i]
    = (onehot_hi * contrib)^T @ onehot_lo — an MXU matmul per (level, chunk,
    channel). bf16 one-hots are exact; contributions ride in bf16 with fp32
    accumulation (preferred_element_type).
    """
    n = rows.shape[0]
    n_corners = 1 << spec.input_dim
    Gs = _corner_sum_matrices(spec.num_levels, n_corners, spec.level_dim)
    g32 = g.astype(jnp.float32)

    # per-channel contribution for every (point, level*corner) entry
    contribs = [
        weights * jnp.dot(g32, Gs[c].T, preferred_element_type=jnp.float32)
        for c in range(spec.level_dim)
    ]  # each [N, L*corners]

    d_parts = []
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LO), 1)
    for lvl in range(spec.num_levels):
        size = spec.level_size(lvl)
        n_hi = -(-size // _LO)
        sl = slice(lvl * n_corners, (lvl + 1) * n_corners)
        r_l = (rows[:, sl] - spec.offsets[lvl]).reshape(-1)  # [N*corners]
        c_l = [c[:, sl].reshape(-1) for c in contribs]

        m = r_l.shape[0]
        chunk = min(_MXU_CHUNK, -(-m // 1024) * 1024)  # avoid huge pads on small m
        pad = (-m) % chunk
        if pad:
            r_l = jnp.pad(r_l, (0, pad))  # padded rows get zero contrib
            c_l = [jnp.pad(c, (0, pad)) for c in c_l]
        n_chunks = r_l.shape[0] // chunk
        r_l = r_l.reshape(n_chunks, chunk)
        c_l = jnp.stack([c.reshape(n_chunks, chunk) for c in c_l], -1)  # [K, B, C]

        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_hi), 1)

        def block(acc, xs):
            r_b, c_b = xs  # [B], [B, C]
            oh_lo = ((r_b[:, None] % _LO) == lo_iota).astype(jnp.bfloat16)  # [B, LO]
            oh_hi = (r_b[:, None] // _LO) == hi_iota  # [B, HI] bool
            for ch in range(spec.level_dim):
                lhs = jnp.where(oh_hi, c_b[:, ch : ch + 1], 0.0).astype(jnp.bfloat16)
                acc = acc.at[ch].add(
                    jnp.dot(lhs.T, oh_lo, preferred_element_type=jnp.float32)
                )
            return acc, None

        acc0 = jnp.zeros((spec.level_dim, n_hi, _LO), jnp.float32)
        acc, _ = jax.lax.scan(block, acc0, (r_l, c_l))
        # [C, HI, LO] -> [S_l, C]
        d_parts.append(acc.reshape(spec.level_dim, n_hi * _LO)[:, :size].T)
    return jnp.concatenate(d_parts, axis=0)


def _encode_bwd(spec: HashGridSpec, residuals, g):
    """Sorted scatter-add table gradient.

    d_table[r] = sum of w * g over every (point, level, corner) hitting row
    r, with g [N, L*C]. The per-entry cotangent w[n, l*8+j] * g[n, l*C+c] is
    built with the same constant selection matmuls as the forward (layout-
    safe 2-D shapes throughout). Indices are sorted before the scatter-add —
    XLA TPU's scatter with unsorted duplicates serializes ~80x slower.
    NOTE: fancier formulations measured SLOWER end-to-end on v5e (multi-
    operand lax.sort: +30%; cumsum-boundary segment sums: +50%) — PERF.md.
    """
    rows, weights, n_rows = residuals  # [N, L*corners] each
    n = rows.shape[0]
    n_corners = 1 << spec.input_dim
    if _backward_mode() == "mxu":
        d_table = _encode_bwd_mxu(spec, rows, weights, g, n_rows)
        return d_table, jnp.zeros((n, spec.input_dim), g.dtype)
    Gs = _corner_sum_matrices(spec.num_levels, n_corners, spec.level_dim)

    flat_rows = rows.reshape(-1)
    order = jnp.argsort(flat_rows)
    sorted_rows = flat_rows[order]
    contribs = []
    for c in range(spec.level_dim):
        # g_exp[n, l*corners+j] = g[n, l*C+c]
        g_exp = jnp.dot(
            g.astype(jnp.float32), Gs[c].T, preferred_element_type=jnp.float32
        )
        contribs.append((weights * g_exp).reshape(-1)[order])
    d_table = (
        jnp.zeros((n_rows, spec.level_dim), jnp.float32)
        .at[sorted_rows]
        .add(jnp.stack(contribs, axis=-1))
    )
    return d_table, jnp.zeros((n, spec.input_dim), g.dtype)


_encode_sorted_bwd.defvjp(_encode_fwd, _encode_bwd)
