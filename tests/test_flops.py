"""utils/flops.py: the jaxpr FLOP walker must scale loop bodies by trip
count (XLA's cost_analysis does not — the reason this module exists)."""

import jax
import jax.numpy as jnp
import pytest

from focnerf_tpu.utils.flops import count_program, roofline


def test_dot_flops_exact():
    x = jnp.ones((64, 128), jnp.float32)
    w = jnp.ones((128, 32), jnp.float32)
    c = count_program(lambda a, b: a @ b, x, w)
    assert c["flops"] == 2 * 64 * 128 * 32
    assert not c["dynamic_while"]


def test_scan_multiplies_by_length():
    x = jnp.ones((32, 32), jnp.float32)

    def f(a):
        out, _ = jax.lax.scan(lambda c, _: (c @ c, None), a, None, length=7)
        return out

    c = count_program(f, x)
    assert c["flops"] == 7 * 2 * 32**3


def test_fori_static_bounds_counted():
    x = jnp.ones((16, 16), jnp.float32)

    def f(a):
        return jax.lax.fori_loop(0, 5, lambda i, c: c @ c, a)

    c = count_program(f, x)
    # fori_loop lowers to scan when bounds are static -> 5x; if this jax
    # version lowers to while instead, the walker must flag the bound
    if c["dynamic_while"]:
        assert c["flops"] == 2 * 16**3
    else:
        assert c["flops"] == 5 * 2 * 16**3


def test_nested_call_recursion():
    x = jnp.ones((8, 8), jnp.float32)

    @jax.jit
    def inner(a):
        return a @ a

    def f(a):
        return inner(inner(a))

    assert count_program(f, x)["flops"] == 2 * 2 * 8**3


def test_gather_bytes():
    tbl = jnp.ones((1024, 4), jnp.float32)
    idx = jnp.zeros((256,), jnp.int32)
    c = count_program(lambda t, i: t[i], tbl, idx)
    # read + write of 256x4 f32 rows
    assert c["gather_bytes"] == 2 * 256 * 4 * 4
    assert c["flops"] == 0


def test_grad_counts_backward_too():
    x = jnp.ones((32, 64), jnp.float32)
    w = jnp.ones((64, 16), jnp.float32)

    def loss(w, x):
        return jnp.sum((x @ w) ** 2)

    fwd = count_program(loss, w, x)["flops"]
    both = count_program(jax.grad(loss), w, x)["flops"]
    # backward adds dL/dw = x^T @ g (and possibly dL/dx): >= 2x forward
    assert both >= 2 * fwd


def test_roofline_shapes():
    x = jnp.ones((64, 64), jnp.float32)
    r = roofline(lambda a: a @ a, x, step_seconds=1e-3)
    assert r["flops_per_step"] == 2 * 64**3
    assert r["mfu"] == pytest.approx(2 * 64**3 / 1e-3 / 197e12)
    assert r["achieved_tflops"] == pytest.approx(2 * 64**3 / 1e-3 / 1e12)


def test_real_train_step_counts():
    """The actual bench-path occupancy train step must produce a nonzero,
    loop-scaled count (smoke: the walker handles every primitive in it)."""
    import optax

    from focnerf_tpu.models.nerf import NeRFConfig
    from focnerf_tpu.render.renderer import render_rays_occupancy
    from focnerf_tpu.train.state import create_train_state, make_optimizer

    cfg = NeRFConfig(
        use_objfeat=False, compute_dtype=jnp.float32, stochastic_corners=1,
        stochastic_min_size=1,
    )
    optimizer = make_optimizer(lr=1e-2, iters=100)
    state = create_train_state(jax.random.key(0), cfg, optimizer)
    gs = 32
    occ_bits = jnp.ones((1, gs**3), bool)
    n = 64

    def loss_fn(params, rng):
        o = jnp.zeros((n, 3)) + jnp.array([0.0, 0.0, -2.0])
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
        out = render_rays_occupancy(
            params, cfg, o, d, occ_bits, dt_gamma=0.0, max_steps=64,
            slab=8, bg_color=1.0, rng=rng, perturb=True,
        )
        return jnp.mean(out["image"] ** 2)

    def train_step(state, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        return optax.apply_updates(state.params, updates), loss

    c = count_program(train_step, state, jax.random.key(0))
    assert c["flops"] > 1e6  # MLP matmuls over n*slab samples
    assert c["gather_bytes"] > 0  # hash-table + occupancy gathers
