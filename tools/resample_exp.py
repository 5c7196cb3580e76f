"""A/B the shear-warp slice resample: dense hat-matrix einsums vs banded
gather-lerp.

The compositor (render/baked.py::_composite_core) resamples each K-slice
block onto the intermediate grid with two MXU einsums against hat-function
matrices. Those matrices are 2-sparse per output column (linear interp),
so the einsum burns ~R/2 x synthetic flops — at 256^3/ri=512 the pair is
~1.4 TFLOP forward and dominates the 44 ms train step (vm_256 A/B showed
param traffic is NOT the wall: VM == dense). The banded alternative
computes each output row directly as w0*V[y0] + w1*V[y0+1] (row gathers of
contiguous [x, c] slabs — bandwidth, not flops).

Variants (each timed fwd-only and value_and_grad, fresh inputs per rep,
scalar-fetch sync):
  einsum     the production pair of hat einsums
  gather     2-tap row-gather + lerp along y, transpose, same along x
  gather_vjp same forward, custom VJP whose backward is the TRANSPOSE
             banded resample (masked T-tap gather — no scatter anywhere)

Usage: python tools/resample_exp.py [--res 256] [--k 32] [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, ".")

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def make_coords(K, R, ri, seed=0):
    """Per-slice affine resample coords mimicking _composite_core geometry:
    py[k, Y] = a_k * Y + b_k with scales s_k of an eye at ~2.5b."""
    rng = np.random.default_rng(seed)
    z = np.linspace(-0.9, 0.9, K)
    e_z = 2.5
    s_k = e_z / (e_z - z)  # [K] in ~[0.73, 1.56]
    # footprint [-1.1, 1.1] mapped over ri pixels, inverse-projected per slice
    g = -1.1 + (np.arange(ri) + 0.5) * (2.2 / ri)
    ys = g[None, :] / s_k[:, None]  # world coord feeding each intermediate px
    py = (ys + 1.0) / 2.0 * R - 0.5  # voxel coords [K, ri]
    return jnp.asarray(py, jnp.float32)


def resample_einsum(V, py, px):
    """The production formulation (render/baked.py block_body)."""
    R = V.shape[1]
    iota = jnp.arange(R, dtype=jnp.float32)
    My = _hat(py[:, None, :] - iota[None, :, None]).astype(V.dtype)  # [K, R, Ri]
    Mx = _hat(px[:, None, :] - iota[None, :, None]).astype(V.dtype)
    tmp = jnp.einsum("kyxc,kyY->kYxc", V, My, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "kYxc,kxX->kYXc", tmp.astype(V.dtype), Mx,
        preferred_element_type=jnp.float32,
    )


def _gather_axis1(V, p):
    """2-tap lerp along axis 1 of [K, R, ...] at positions p [K, Ri]."""
    R = V.shape[1]
    i0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, R - 2)
    w1 = jnp.clip(p - i0, 0.0, 1.0)
    # out-of-support positions (hat == 0 for both taps) must contribute 0
    valid = (p > -1.0) & (p < R)
    edge0 = jnp.where((p < 0.0), _hat(p - i0), 1.0)  # partial left tap
    edge1 = jnp.where((p > R - 1.0), _hat(p - (i0 + 1)), 1.0)

    def one(Vk, i0k):
        return Vk[i0k], Vk[i0k + 1]

    g0, g1 = jax.vmap(one)(V, i0)  # [K, Ri, ...]
    shape = w1.shape + (1,) * (V.ndim - 2)
    w1 = w1.reshape(shape)
    m = (valid.astype(V.dtype) * edge0 * edge1).reshape(shape)
    e0 = edge0.reshape(shape)
    e1 = edge1.reshape(shape)
    valid_b = valid.reshape(shape)
    out = (1.0 - w1) * g0 * e0 + w1 * g1 * e1
    return jnp.where(valid_b, out, 0.0)


def resample_gather(V, py, px):
    """Separable 2-tap gather-lerp: rows along y, transpose, rows along x."""
    t = _gather_axis1(V, py)  # [K, Ri, x, c]
    t = jnp.swapaxes(t, 1, 2)  # [K, x, Ri, c]
    t = _gather_axis1(t, px)  # [K, Ri(x), Ri(y), c]
    return jnp.swapaxes(t, 1, 2).astype(jnp.float32)  # [K, Ri, Ri, c]


def _transpose_resample_axis1(G, p, R, T):
    """Adjoint of _gather_axis1: dV[k, y] = sum_Y hat(p[k, Y] - y) G[k, Y].

    p is affine and monotone in Y per k, so the contributing window per y is
    a contiguous run of <= T outputs: gather T rows of G and mask — no
    scatter."""
    K, Ri = p.shape
    # first Y with p[Y] > y - 1  (window start), via the affine inverse
    a = (p[:, -1] - p[:, 0]) / (Ri - 1)  # [K] slope
    b = p[:, 0]
    y = jnp.arange(R, dtype=jnp.float32)
    Y0 = jnp.ceil((y[None, :] - 1.0 - b[:, None]) / a[:, None])  # [K, R]
    Y0 = jnp.clip(Y0.astype(jnp.int32), 0, jnp.maximum(Ri - T, 0))

    def one(Gk, pk, Y0k):
        def tap(t):
            idx = Y0k + t  # [R]
            w = _hat(pk[idx] - y)  # [R]
            shape = (R,) + (1,) * (Gk.ndim - 1)
            return w.reshape(shape) * Gk[idx]

        return sum(tap(t) for t in range(T))

    return jax.vmap(one)(G, p, Y0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def resample_gather_cvjp(V, py, px, T):
    return resample_gather(V, py, px)


def _rg_fwd(V, py, px, T):
    return resample_gather(V, py, px), (V.shape[1], py, px)


def _rg_bwd(T, res, g):
    R, py, px = res
    # adjoint of (gather_y -> transpose -> gather_x -> transpose)
    g = jnp.swapaxes(g, 1, 2)  # [K, Ri(x), Ri(y), c]
    g = _transpose_resample_axis1(g, px, R, T)  # [K, x, Ri(y), c]
    g = jnp.swapaxes(g, 1, 2)  # [K, Ri(y), x, c]
    g = _transpose_resample_axis1(g, py, R, T)  # [K, y, x, c]
    return g, None, None


resample_gather_cvjp.defvjp(_rg_fwd, _rg_bwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--ri_mult", type=int, default=2)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variants", type=str, default="einsum,gather,gather_vjp")
    args = ap.parse_args()

    R, K = args.res, args.k
    ri = R * args.ri_mult
    C = 4
    py = make_coords(K, R, ri, 0)
    px = make_coords(K, R, ri, 1)
    a_min = float(jnp.min((py[:, -1] - py[:, 0]) / (ri - 1)))
    T = int(np.ceil(2.0 / a_min)) + 1  # max taps of the transpose window

    key = jax.random.key(0)
    dtype = jnp.float32 if args.cpu else jnp.bfloat16

    # correctness check at f32 on small shapes first
    Vs = jax.random.normal(jax.random.key(9), (4, 32, 32, C), jnp.float32)
    pys = make_coords(4, 32, 64, 2)
    pxs = make_coords(4, 32, 64, 3)
    ref = resample_einsum(Vs, pys, pxs)
    got = resample_gather(Vs, pys, pxs)
    err = float(jnp.max(jnp.abs(ref - got)))
    Ts = int(np.ceil(2.0 / float(jnp.min((pys[:, -1] - pys[:, 0]) / 63)))) + 1
    gotc = resample_gather_cvjp(Vs, pys, pxs, Ts)
    errc = float(jnp.max(jnp.abs(ref - gotc)))
    gr = jax.grad(lambda v: jnp.sum(resample_einsum(v, pys, pxs) ** 2))(Vs)
    gg = jax.grad(
        lambda v: jnp.sum(resample_gather_cvjp(v, pys, pxs, Ts) ** 2)
    )(Vs)
    gerr = float(jnp.max(jnp.abs(gr - gg))) / (float(jnp.max(jnp.abs(gr))) + 1e-9)
    print(
        json.dumps(
            {"check": "fwd/cvjp/grad max err", "fwd": err, "cvjp": errc,
             "grad_rel": gerr, "T": Ts}
        ),
        flush=True,
    )

    fns = {
        "einsum": lambda v: resample_einsum(v, py, px),
        "gather": lambda v: resample_gather(v, py, px),
        "gather_vjp": lambda v: resample_gather_cvjp(v, py, px, T),
    }

    # folded harness: FOLD applications inside ONE dispatch (per-dispatch
    # relay overhead is ~tens of ms — it buried the first, unfolded version
    # of this experiment; PERF.md pitfalls). The carry perturbs the input
    # each iteration so nothing dedups or hoists.
    FOLD = 16
    for name in args.variants.split(","):
        f = fns[name]

        def fwd_fold(v):
            def body(i, carry):
                v, acc = carry
                out = f(v * (1.0 + 1e-6 * i))
                # consume the FULL output — reducing a slice lets XLA slice
                # the gather itself (measured 0.01 ms "wins" that were DCE)
                return (v, acc + jnp.sum(out))

            return jax.lax.fori_loop(0, FOLD, body, (v, jnp.float32(0.0)))[1]

        def grad_fold(v):
            g = jax.grad(lambda x: jnp.sum(f(x) ** 2))

            def body(i, v):
                return v - (1e-12 * (i + 1)) * g(v).astype(v.dtype)

            return jnp.sum(jax.lax.fori_loop(0, FOLD, body, v)[0, 0])

        for tag, fn in (("fwd", jax.jit(fwd_fold)), ("grad", jax.jit(grad_fold))):
            try:
                ts = []
                for r in range(args.reps):
                    v = jax.random.normal(
                        jax.random.fold_in(key, r), (K, R, R, C), dtype
                    )
                    jax.block_until_ready(v)
                    t0 = time.time()
                    _ = float(fn(v))  # scalar fetch forces completion
                    ts.append(time.time() - t0)
                ms = (min(ts[1:]) if len(ts) > 1 else ts[0]) * 1e3 / FOLD
                print(
                    json.dumps(
                        {"variant": f"{name}_{tag}", "ms": round(ms, 2),
                         "res": R, "ri": ri, "K": K, "T": T, "fold": FOLD,
                         "compile_s": round(ts[0], 1)}
                    ),
                    flush=True,
                )
            except Exception as e:
                print(json.dumps({"variant": f"{name}_{tag}", "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
