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
    # TPU training-throughput mode: when > 0, *hashed* levels resolve K
    # corners sampled with probability proportional to their trilinear
    # weights instead of interpolating all 2^D — an unbiased estimator of the
    # interpolation (E[T_c | c ~ w] = sum_c w_c T_c) that cuts the per-sample
    # random-gather rows (the v5e hot-loop floor, PERF.md) by 2^D/K. Active
    # only when the encode is given an rng (training); eval stays exact.
    stochastic_k: int = 0
    # stochastic_k also applies to *dense* levels with at least this many
    # rows (their 8-corner resolution — MXU one-hots or gathers — dominates
    # the encode once the hashed levels go stochastic). 0 = hashed-only.
    stochastic_min_size: int = 0
    # table-BACKWARD level subset: when not None, only these levels receive
    # table gradients this step (the rest are structurally skipped — the
    # compiler never builds their one-hot/sort legs). The alternating-phase
    # trainer compiles one step per phase and round-robins them; with adam
    # (per-parameter scale-invariant) no gradient rescale is needed. The
    # FORWARD always resolves every level — rendering is unchanged.
    grad_levels: "Tuple[int, ...] | None" = None
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

    def truncate(self, active: int) -> "HashGridSpec":
        """Spec for the first ``active`` levels (coarse-to-fine training).

        Levels are laid out independently and offsets are cumulative, so
        the truncated table is exactly ``table[:sub.table_rows]`` — a
        prefix slice of the full table. Used by hashgrid_encode_c2f: a
        stage trained at ``active < num_levels`` structurally skips the
        fine levels' gathers AND their backward one-hot/sort legs (the
        coarse-to-fine schedule of the NGP-family literature, here as a
        throughput lever: at stochastic K=1 the encode cost is linear in
        the level count).
        """
        if not 0 < active <= self.num_levels:
            raise ValueError(f"active={active} outside [1, {self.num_levels}]")
        gl = self.grad_levels
        if gl is not None:
            gl = tuple(l for l in gl if l < active) or None
        return dataclasses.replace(
            self,
            num_levels=active,
            resolutions=self.resolutions[:active],
            offsets=self.offsets[: active + 1],
            hashed=self.hashed[:active],
            grad_levels=gl,
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

    rows = _coords_to_rows(corner, spec, lvl)
    return rows, w


def _level_sampled_indices(x01: jax.Array, spec: HashGridSpec, lvl: int, u3: jax.Array):
    """Rows of K weight-sampled corners, computed DIRECTLY.

    The trilinear corner weights factorize per axis (w_c = prod_d f_d^{b_d}
    (1-f_d)^{1-b_d}), so sampling a corner with probability w_c is D
    independent Bernoulli(f_d) draws — no need to materialize all 2^D corner
    rows, weights, and a CDF-select (which cost ~2x the stochastic encode's
    gather time at production shapes). u3: [N, K, D] uniforms. Returns rows
    [N, K] int32 into the flat table.
    """
    scale = np.float32(
        np.exp2(lvl * np.log2(spec.per_level_scale)) * spec.base_resolution - 1.0
    )
    pos = x01.astype(jnp.float32) * scale + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid  # [N, D]
    base = pos_grid.astype(jnp.uint32)
    bits = (u3 < frac[:, None, :]).astype(jnp.uint32)  # [N, K, D]
    corner = base[:, None, :] + bits
    return _coords_to_rows(corner, spec, lvl)


def _coords_to_rows(coords: jax.Array, spec: HashGridSpec, lvl: int) -> jax.Array:
    """Integer vertex coords [..., D] (uint32) -> flat table rows [...] (int32),
    including the level offset (gridencoder.cu get_grid_index :67-84)."""
    D = spec.input_dim
    res = spec.resolutions[lvl]
    size = spec.level_size(lvl)
    if spec.hashed[lvl]:
        h = jnp.zeros(coords.shape[:-1], jnp.uint32)
        for d in range(D):
            h = h ^ (coords[..., d] * jnp.uint32(_PRIMES[d]))
        idx = h % jnp.uint32(size)
    else:
        stride = 1
        idx = jnp.zeros(coords.shape[:-1], jnp.uint32)
        for d in range(D):
            idx = idx + coords[..., d] * jnp.uint32(stride)
            stride *= res + 1
        # dense index < (res+1)^D <= size by construction; no modulo needed
    return idx.astype(jnp.int32) + jnp.int32(spec.offsets[lvl])


@functools.lru_cache(maxsize=None)
def _is_stochastic_level(spec: HashGridSpec, lvl: int) -> bool:
    if spec.stochastic_k <= 0:
        return False
    if spec.hashed[lvl]:
        return True
    return (
        spec.stochastic_min_size > 0
        and spec.level_size(lvl) >= spec.stochastic_min_size
    )


def _col_layout(spec: HashGridSpec) -> Tuple[Tuple[int, int], ...]:
    """Per-level (col_start, n_cols) into the packed [N, total_cols] row /
    weight arrays. Exact levels carry all 2^D corners; stochastic levels
    (hashed, plus dense >= stochastic_min_size) carry only the K sampled
    corners."""
    n_corners = 1 << spec.input_dim
    out, start = [], 0
    for lvl in range(spec.num_levels):
        ncols = spec.stochastic_k if _is_stochastic_level(spec, lvl) else n_corners
        out.append((start, ncols))
        start += ncols
    return tuple(out)


def _total_cols(spec: HashGridSpec) -> int:
    s, n = _col_layout(spec)[-1]
    return s + n


@functools.lru_cache(maxsize=None)
def _corner_sum_matrices(layout: Tuple[Tuple[int, int], ...], level_dim: int):
    """Constant [total_cols, L*C] selection matrices G_c with
    G_c[col_start_l + j, l*C + c] = 1 — the per-level corner sum expressed as
    a matmul. TPU layout note: any tensor shaped [..., L, corners(, C)] gets
    tile-padded up to 16-64x by Mosaic's (8,128) tiling (observed 16 GB for a
    1M-point batch); keeping everything 2-D with a wide minor dim and doing
    the corner reduction on the MXU avoids the blowup entirely.
    """
    # cache NUMPY constants (a cached jnp array created inside one jit trace
    # leaks its tracer into later traces)
    import numpy as _np

    num_levels = len(layout)
    total = layout[-1][0] + layout[-1][1]
    Gs = []
    for c in range(level_dim):
        G = _np.zeros((total, num_levels * level_dim), _np.float32)
        for lvl, (start, ncols) in enumerate(layout):
            G[start : start + ncols, lvl * level_dim + c] = 1.0
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


def _encode_impl(table: jax.Array, x: jax.Array, spec: HashGridSpec, u=None):
    """Shared forward.

    Returns (out [N, L*C], rows [N, total_cols], weights [N, total_cols]) —
    all rank-2 with wide minor dims (layout-safe, see _corner_sum_matrices).
    Feature order is level-major then channel: out[:, l*C + c].

    ``u`` [N, n_stoch_levels, K] in [0, 1): uniform draws for the stochastic
    corner selection of hashed levels (spec.stochastic_k > 0). Each draw picks
    corner j with probability w_j via inverse-CDF; the sampled value carries
    weight 1/K, so the estimator is unbiased for the trilinear interpolation.
    """
    n = x.shape[0]
    n_corners = 1 << spec.input_dim
    layout = _col_layout(spec)
    stoch_lvls = [
        lvl for lvl, (_, ncols) in enumerate(layout) if ncols != n_corners
    ]
    if stoch_lvls:
        assert u is not None and u.shape == (
            n, len(stoch_lvls), spec.stochastic_k, spec.input_dim
        )

    rows_l, w_l = [], []
    for lvl in range(spec.num_levels):
        if lvl in stoch_lvls:
            k = spec.stochastic_k
            rows = _level_sampled_indices(
                x, spec, lvl, u[:, stoch_lvls.index(lvl)]
            )  # [N, K]
            w = jnp.full((n, k), 1.0 / k, jnp.float32)
        else:
            rows, w = _level_corner_indices(x, spec, lvl)  # [N, corners]
        rows_l.append(rows)
        w_l.append(w)
    rows = jnp.concatenate(rows_l, axis=1)  # [N, total_cols]
    weights = jnp.concatenate(w_l, axis=1)  # [N, total_cols]

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)  # [N]
    weights = jnp.where(oob[:, None], 0.0, weights)  # zero output + grads for oob

    mxu_lvls = (
        [
            lvl
            for lvl in range(spec.num_levels)
            if spec.level_size(lvl) <= _MXU_FWD_MAX_ROWS
            and layout[lvl][1] == n_corners  # stoch levels: 1-row gathers win
        ]
        if _forward_mode() == "mxu"
        else []
    )
    gather_lvls = [lvl for lvl in range(spec.num_levels) if lvl not in mxu_lvls]

    # channel-separated per-level value blocks vcs[c][lvl] : [N, ncols_l]
    vcs = [[None] * spec.num_levels for _ in range(spec.level_dim)]
    if gather_lvls:
        g_rows = jnp.concatenate([rows_l[lvl] for lvl in gather_lvls], axis=1)
        g_cols = g_rows.shape[1]
        g_vals = jnp.take(table, g_rows.reshape(-1), axis=0)  # [N*g_cols, C]
        for c in range(spec.level_dim):
            vc = g_vals[:, c].reshape(n, g_cols)
            col = 0
            for lvl in gather_lvls:
                ncols = layout[lvl][1]
                vcs[c][lvl] = vc[:, col : col + ncols]
                col += ncols
    for lvl in mxu_lvls:
        per_ch = _level_vals_mxu(table, rows_l[lvl] - spec.offsets[lvl], spec, lvl)
        for c in range(spec.level_dim):
            vcs[c][lvl] = per_ch[c]

    K = spec.stochastic_k
    if K > 0 and all(ncols == K for _, ncols in layout):
        # uniform-K fast combine (the all-levels-stochastic training mode):
        # each level's K sampled entries are contiguous, so the level sum is
        # a reshape-reduce and for K == 1 a pure interleave — no selection
        # matmuls. With every level on the gather path this makes the whole
        # training forward one fused gather + elementwise math.
        chans = []
        for c in range(spec.level_dim):
            vc = jnp.concatenate(vcs[c], axis=1)  # [N, L*K]
            wv = (weights * vc).astype(jnp.float32)
            if K > 1:
                wv = wv.reshape(n, spec.num_levels, K).sum(-1)
            chans.append(wv)  # [N, L]
        out = jnp.stack(chans, -1).reshape(n, spec.num_levels * spec.level_dim)
        return out, rows, weights

    Gs = _corner_sum_matrices(layout, spec.level_dim)
    out = jnp.zeros((n, spec.num_levels * spec.level_dim), jnp.float32)
    for c in range(spec.level_dim):
        vc = jnp.concatenate(vcs[c], axis=1)  # [N, total_cols]
        out = out + jnp.dot(
            (weights * vc).astype(jnp.float32), Gs[c], preferred_element_type=jnp.float32
        )
    return out, rows, weights


def hashgrid_encode(
    table: jax.Array,
    x01: jax.Array,
    spec: HashGridSpec,
    input_grads: bool = False,
    rng: jax.Array | None = None,
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

    ``rng``: when given and ``spec.stochastic_k > 0``, hashed levels resolve K
    stochastically sampled corners (training-throughput mode, see
    HashGridSpec.stochastic_k). Without an rng the encode is always exact —
    eval/inference callers need no change. Stochastic mode requires the
    custom-VJP path (it drops position gradients by construction).
    """
    prefix = x01.shape[:-1]
    x = x01.reshape(-1, spec.input_dim)
    stochastic = spec.stochastic_k > 0 and rng is not None and not input_grads
    if not stochastic and spec.stochastic_k > 0:
        spec = dataclasses.replace(spec, stochastic_k=0)
    if stochastic:
        n_stoch = sum(
            _is_stochastic_level(spec, lvl) for lvl in range(spec.num_levels)
        )
        u = jax.random.uniform(
            rng, (x.shape[0], n_stoch, spec.stochastic_k, spec.input_dim)
        )
    else:
        u = jnp.zeros((x.shape[0], 0, 0, 0), jnp.float32)
    if input_grads:
        out, _, _ = _encode_impl(table, x, spec, u)
    else:
        out = _encode_sorted_bwd(table, x, u, spec)
    return out.reshape(*prefix, spec.output_dim)  # out already [N, L*C]


def hashgrid_encode_c2f(
    table: jax.Array,
    x01: jax.Array,
    spec: HashGridSpec,
    active_levels: int,
    input_grads: bool = False,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Coarse-to-fine encode: resolve only the first ``active_levels``
    levels, zero-fill the fine levels' feature slots.

    ``active_levels`` is STATIC (one compiled step per stage — same
    recipe as the grad_levels phase steps). 0 or >= num_levels means the
    plain full encode. Feature order is level-major (out[:, l*C + c]), so
    the zero fill is a trailing pad; the sigma MLP sees a constant-zero
    block for inactive levels and their table rows receive exactly zero
    gradient (the cotangent of the prefix slice). The schedule itself
    lives in the trainer (Trainer(c2f=...)); quality rationale: coarse
    levels first is the BARF/Nerfies anti-aliasing schedule, used here
    for throughput — encode fwd AND bwd cost is ~linear in level count
    at stochastic K=1.
    """
    if active_levels <= 0 or active_levels >= spec.num_levels:
        return hashgrid_encode(table, x01, spec, input_grads=input_grads, rng=rng)
    sub = spec.truncate(active_levels)
    out = hashgrid_encode(
        table[: sub.table_rows], x01, sub, input_grads=input_grads, rng=rng
    )
    pad = jnp.zeros(
        (*out.shape[:-1], spec.output_dim - sub.output_dim), out.dtype
    )
    return jnp.concatenate([out, pad], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _encode_sorted_bwd(table, x, u, spec: HashGridSpec):
    out, _, _ = _encode_impl(table, x, spec, u)
    return out


def _encode_fwd(table, x, u, spec: HashGridSpec):
    out, rows, weights = _encode_impl(table, x, spec, u)
    return out, (rows, weights, table.shape[0], u.shape)


# Table-gradient backward algorithm:
#   "mxu": per-level hi/lo one-hot decomposition — two matmuls per level turn
#          the segment-sum into MXU work, no sort and no scatter (measured
#          1.69 s -> 0.33 s per train step on v5e, identical train quality);
#   "sort": argsort + sorted scatter-add (exact fp32; faster on CPU where the
#           matmul formulation's ~26 TFLOP has no MXU to run on);
#   "hybrid": MXU one-hots for levels up to BACKWARD_HYBRID_MAX_ROWS (small
#           n_hi -> cheap one-hot build) + ONE sort over only the big-level
#           entries (~60% fewer rows through the pass-dominated TPU sort);
#           round-3 A/B candidate (bench.py --hash --bwd hybrid);
#   None (default): auto — "mxu" on TPU, "sort" elsewhere.
BACKWARD_MODE = None
BACKWARD_HYBRID_MAX_ROWS = 1 << 16  # "small level" cutoff for "hybrid"

# int8 variant of the "mxu" backward: contributions are quantized per
# (chunk, channel) with a symmetric max-abs scale and the one-hot matmuls run
# on the v5e int8 MXU path (2x bf16 peak). ~0.4% relative gradient noise on
# top of the bf16 path's own; quality-gated (see PERF.md). OPT-IN: the
# default training path stays exact-bf16 so parity runs are exact by
# default (ADVICE r2); enable via --grid_int8 or BACKWARD_INT8 = True.
#   None (default): off.
BACKWARD_INT8 = None


def _backward_mode() -> str:
    if BACKWARD_MODE is not None:
        return BACKWARD_MODE
    # "axon" is a tunneled TPU backend; treat any non-CPU backend as MXU-class
    return "sort" if jax.default_backend() == "cpu" else "mxu"


def _backward_int8() -> bool:
    if BACKWARD_INT8 is not None:
        return BACKWARD_INT8
    return False


# How the "mxu" backward materializes its hi one-hot operand:
#   "where": broadcast compare-select against an iota (the round-2 path);
#   "scatter": zeros.at[iota, hi].set(contrib) — ONE write per entry with
#       unique indices instead of a B x n_hi compare grid. Same HBM bytes
#       for the operand itself, but skips the compare-select generation —
#       an on-chip A/B candidate for the 53 ms one-hot-build leg
#       (PERF.md round-2 backward bisect).
#   None (default): "where".
BACKWARD_ONEHOT_BUILD = None


def _onehot_build() -> str:
    return BACKWARD_ONEHOT_BUILD or "where"


_MXU_CHUNK = 32768  # contributions per matmul block (bounds one-hot memory)
_LO = 512  # low-radix width of the index decomposition


def _contribs(spec: HashGridSpec, layout, weights, g32):
    """Per-channel cotangent for every (point, level-column) entry.

    Uniform-K layouts (every level stochastic with the same K — the -O2
    all-levels-stochastic training mode) skip the [N, 32] x [32, total_cols]
    selection matmuls: the column block of level l is just g[:, l*C + c]
    repeated K times (weights still multiply — they carry the 1/K estimator
    scale and the out-of-bounds zeroing).
    """
    K = spec.stochastic_k
    if K > 0 and all(ncols == K for _, ncols in layout):
        out = []
        for c in range(spec.level_dim):
            g_lvl = g32[:, c :: spec.level_dim]  # [N, L]
            g_exp = (
                g_lvl
                if K == 1
                else jnp.repeat(g_lvl, K, axis=1)
            )
            out.append(weights * g_exp)
        return out
    Gs = _corner_sum_matrices(layout, spec.level_dim)
    return [
        weights * jnp.dot(g32, Gs[c].T, preferred_element_type=jnp.float32)
        for c in range(spec.level_dim)
    ]  # each [N, total_cols]


def _encode_bwd_mxu(spec: HashGridSpec, rows, weights, g, n_rows, levels=None):
    """d_table via per-level one-hot matmuls.

    ``levels``: optional level subset (the "hybrid" mode resolves small
    levels here and big ones through the sort); skipped levels contribute
    zero blocks.

    For level l with S_l rows, decompose the in-level row r = hi*_LO + lo;
    then d_T[hi, lo] = sum_i onehot_hi[i, hi] * onehot_lo[i, lo] * contrib[i]
    = (onehot_hi * contrib)^T @ onehot_lo — an MXU matmul per (level, chunk,
    channel). bf16 one-hots are exact; contributions ride in bf16 with fp32
    accumulation (preferred_element_type).
    """
    layout = _col_layout(spec)
    g32 = g.astype(jnp.float32)
    use_int8 = _backward_int8()
    contribs = _contribs(spec, layout, weights, g32)

    d_parts = []
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LO), 1)
    for lvl in range(spec.num_levels):
        size = spec.level_size(lvl)
        if levels is not None and lvl not in levels:
            d_parts.append(jnp.zeros((size, spec.level_dim), jnp.float32))
            continue
        n_hi = -(-size // _LO)
        start, ncols = layout[lvl]
        sl = slice(start, start + ncols)
        r_l = (rows[:, sl] - spec.offsets[lvl]).reshape(-1)  # [N*ncols]
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
            oh_hi = (r_b[:, None] // _LO) == hi_iota  # [B, HI] bool
            if use_int8:
                # exact int8 one-hots; contributions symmetric-quantized per
                # (chunk, channel); int8 x int8 -> int32 rides the 2x-peak MXU
                # path, dequantized into the fp32 accumulator per chunk.
                oh_lo8 = ((r_b[:, None] % _LO) == lo_iota).astype(jnp.int8)
                for ch in range(spec.level_dim):
                    c_ch = c_b[:, ch]
                    scale = jnp.maximum(jnp.max(jnp.abs(c_ch)), 1e-30) / 127.0
                    q = jnp.round(c_ch / scale).astype(jnp.int8)  # [B]
                    lhs = jnp.where(oh_hi, q[:, None], 0).astype(jnp.int8)
                    prod = jax.lax.dot_general(
                        lhs,
                        oh_lo8,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )  # [HI, LO]
                    acc = acc.at[ch].add(scale * prod.astype(jnp.float32))
            elif _onehot_build() == "scatter":
                # one unique-index write per entry instead of a B x width
                # compare grid for BOTH operands (A/B candidate for the
                # one-hot-build leg; same operand bytes, no compare-select)
                B = r_b.shape[0]
                b_iota = jax.lax.iota(jnp.int32, B)
                oh_lo = (
                    jnp.zeros((B, _LO), jnp.bfloat16)
                    .at[b_iota, r_b % _LO]
                    .set(1.0, indices_are_sorted=True, unique_indices=True)
                )
                hi_b = r_b // _LO
                for ch in range(spec.level_dim):
                    lhs = (
                        jnp.zeros((B, n_hi), jnp.bfloat16)
                        .at[b_iota, hi_b]
                        .set(
                            c_b[:, ch].astype(jnp.bfloat16),
                            indices_are_sorted=True,
                            unique_indices=True,
                        )
                    )
                    acc = acc.at[ch].add(
                        jnp.dot(lhs.T, oh_lo, preferred_element_type=jnp.float32)
                    )
            else:
                oh_lo = ((r_b[:, None] % _LO) == lo_iota).astype(jnp.bfloat16)
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
    r, with g [N, L*C]. The per-entry cotangent w[n, col] * g[n, l*C+c] is
    built with the same constant selection matmuls as the forward (layout-
    safe 2-D shapes throughout). Indices are sorted before the scatter-add —
    XLA TPU's scatter with unsorted duplicates serializes ~80x slower.
    NOTE: fancier formulations measured SLOWER end-to-end on v5e (multi-
    operand lax.sort: +30%; cumsum-boundary segment sums: +50%) — PERF.md.
    """
    rows, weights, n_rows, u_shape = residuals  # rows/weights [N, total_cols]
    n = rows.shape[0]
    d_u = jnp.zeros(u_shape, jnp.float32)
    mode = _backward_mode()
    live = (
        tuple(range(spec.num_levels))
        if spec.grad_levels is None
        else tuple(spec.grad_levels)
    )
    if mode == "mxu":
        d_table = _encode_bwd_mxu(
            spec, rows, weights, g, n_rows,
            levels=None if spec.grad_levels is None else live,
        )
        return d_table, jnp.zeros((n, spec.input_dim), g.dtype), d_u

    layout = _col_layout(spec)
    if mode == "hybrid":
        # small levels (cheap one-hot builds) on the MXU; ONE sort over
        # only the big-level entries — the TPU sort is pass-dominated, so
        # shrinking its input is the lever (PERF.md round-2 close-out)
        small = [
            l for l in live
            if spec.level_size(l) <= BACKWARD_HYBRID_MAX_ROWS
        ]
        big = [l for l in live if l not in small]
        d_small = _encode_bwd_mxu(spec, rows, weights, g, n_rows, levels=small)
        if not big:
            return d_small, jnp.zeros((n, spec.input_dim), g.dtype), d_u
        cols = np.concatenate(
            [np.arange(layout[l][0], layout[l][0] + layout[l][1]) for l in big]
        )
        contribs_all = _contribs(spec, layout, weights, g.astype(jnp.float32))
        rows_b = rows[:, cols].reshape(-1)
        order = jnp.argsort(rows_b)
        sorted_rows = rows_b[order]
        d_big = (
            jnp.zeros((n_rows, spec.level_dim), jnp.float32)
            .at[sorted_rows]
            .add(
                jnp.stack(
                    [c[:, cols].reshape(-1)[order] for c in contribs_all], -1
                )
            )
        )
        return d_small + d_big, jnp.zeros((n, spec.input_dim), g.dtype), d_u

    if spec.grad_levels is None:
        rows_live, col_sel = rows, None
    else:
        col_sel = np.concatenate(
            [np.arange(layout[l][0], layout[l][0] + layout[l][1]) for l in live]
        )
        rows_live = rows[:, col_sel]
    flat_rows = rows_live.reshape(-1)
    order = jnp.argsort(flat_rows)
    sorted_rows = flat_rows[order]
    contribs = [
        (c if col_sel is None else c[:, col_sel]).reshape(-1)[order]
        for c in _contribs(spec, layout, weights, g.astype(jnp.float32))
    ]
    d_table = (
        jnp.zeros((n_rows, spec.level_dim), jnp.float32)
        .at[sorted_rows]
        .add(jnp.stack(contribs, axis=-1))
    )
    return d_table, jnp.zeros((n, spec.input_dim), g.dtype), d_u


_encode_sorted_bwd.defvjp(_encode_fwd, _encode_bwd)


def hashgrid_tv_loss(
    table: jax.Array,
    x01: jax.Array,
    spec: HashGridSpec,
) -> jax.Array:
    """Total-variation regularizer of the hash table at sampled points.

    Port of gridencoder.cu ``kernel_grad_tv`` (:549-610) /
    ``GridEncoder.grad_total_variation`` (grid.py:165-185): at each sampled
    point's base vertex, per level and axis, penalize the feature difference
    to the +1/-1 neighbor vertex; the per-(vertex, axis-side) energy is the
    root-sum-square over channels, whose autodiff gradient reproduces the
    CUDA kernel's ``delta * rsqrt(sum delta^2 + 1e-9)`` accumulation. (The
    CUDA kernel scatters the gradient only into the base vertex — a one-sided
    approximation forced by the atomics; autodiff here also credits the
    neighbor, the exact TV gradient.)

    Returns the MEAN over points of the per-point TV energy, scaled by
    1/(2D) as the kernel does; multiply by your weight (ref default 1e-7 *
    B=1e6 sampled points — i.e. weight ~0.1 on the mean).
    """
    x = x01.reshape(-1, spec.input_dim)
    D = spec.input_dim
    total = jnp.zeros((), jnp.float32)
    for lvl in range(spec.num_levels):
        scale = np.float32(
            np.exp2(lvl * np.log2(spec.per_level_scale)) * spec.base_resolution - 1.0
        )
        res = spec.resolutions[lvl]
        pos_grid = jnp.floor(x.astype(jnp.float32) * scale + 0.5).astype(jnp.uint32)
        base_rows = _coords_to_rows(pos_grid, spec, lvl)  # [N]
        v0 = jnp.take(table, base_rows, axis=0).astype(jnp.float32)  # [N, C]
        for d in range(D):
            cur = pos_grid[:, d]
            for side in (+1, -1):
                ok = (cur < res) if side > 0 else (cur > 0)
                moved = cur + side if side > 0 else jnp.maximum(cur, 1) - 1
                nb = pos_grid.at[:, d].set(jnp.where(ok, moved, cur))
                rows = _coords_to_rows(nb, spec, lvl)
                vn = jnp.take(table, rows, axis=0).astype(jnp.float32)
                delta2 = jnp.sum((v0 - vn) ** 2, axis=-1)
                e = jnp.sqrt(delta2 + 1e-9)
                total = total + jnp.sum(jnp.where(ok, e, 0.0))
    return total / (2 * D) / x.shape[0]
