"""Unit tests for encoder ops and compositing (golden values + gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.ops.activation import trunc_exp
from focnerf_tpu.ops.composite import composite_rays, composite_weights
from focnerf_tpu.ops.freq import freq_encode, freq_output_dim
from focnerf_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode, hashgrid_init
from focnerf_tpu.ops.sh import sh_encode

_PRIMES = (1, 2654435761, 805459861)


class TestTruncExp:
    def test_forward(self):
        x = jnp.array([-2.0, 0.0, 3.0])
        np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp([-2.0, 0.0, 3.0]), rtol=1e-5)

    def test_grad_clamped(self):
        g = jax.grad(lambda x: trunc_exp(x).sum())(jnp.array([20.0, 1.0]))
        np.testing.assert_allclose(np.asarray(g), [np.exp(15.0), np.exp(1.0)], rtol=1e-5)


class TestSH:
    def test_degree_1_constant(self):
        d = jnp.array([[0.3, -0.5, 0.81]])
        out = np.asarray(sh_encode(d, degree=1))
        np.testing.assert_allclose(out, [[0.28209479]], rtol=1e-6)

    def test_output_dims(self):
        d = jnp.ones((5, 3)) / np.sqrt(3)
        for deg in (1, 2, 3, 4):
            assert sh_encode(d, degree=deg).shape == (5, deg**2)

    def test_degree2_components(self):
        d = jnp.array([[0.6, 0.0, 0.8]])
        out = np.asarray(sh_encode(d, degree=2))[0]
        C1 = 0.4886025119029199
        np.testing.assert_allclose(out[1:], [-C1 * 0.0, C1 * 0.8, -C1 * 0.6], rtol=1e-6, atol=1e-8)


class TestFreq:
    def test_dims_and_values(self):
        x = jnp.array([[0.25, -1.0]])
        deg = 3
        out = np.asarray(freq_encode(x, degree=deg))
        assert out.shape == (1, freq_output_dim(2, deg))
        np.testing.assert_allclose(out[0, :2], [0.25, -1.0])
        np.testing.assert_allclose(out[0, 2:4], np.sin([0.25, -1.0]), rtol=1e-6)
        np.testing.assert_allclose(out[0, 4:6], np.cos([0.25, -1.0]), rtol=1e-6)
        np.testing.assert_allclose(out[0, 6:8], np.sin([0.5, -2.0]), rtol=1e-6)


def _np_hashgrid_reference(table, x, spec):
    """Independent numpy reimplementation of the gridencoder forward."""
    n = x.shape[0]
    out = np.zeros((n, spec.num_levels, spec.level_dim), np.float32)
    for lvl in range(spec.num_levels):
        scale = np.float32(
            np.exp2(lvl * np.log2(spec.per_level_scale)) * spec.base_resolution - 1.0
        )
        res = spec.resolutions[lvl]
        size = spec.level_size(lvl)
        for b in range(n):
            if np.any(x[b] < 0) or np.any(x[b] > 1):
                continue
            pos = x[b] * scale + 0.5
            pg = np.floor(pos).astype(np.uint32)
            fr = pos - pg
            acc = np.zeros(spec.level_dim, np.float32)
            for c in range(8):
                w = 1.0
                cc = pg.copy()
                for d in range(3):
                    if (c >> d) & 1:
                        w *= fr[d]
                        cc[d] += 1
                    else:
                        w *= 1 - fr[d]
                if spec.hashed[lvl]:
                    h = np.uint32(0)
                    for d in range(3):
                        h ^= np.uint32(cc[d] * np.uint32(_PRIMES[d]))
                    idx = int(h % np.uint32(size))
                else:
                    idx = int(cc[0] + cc[1] * (res + 1) + cc[2] * (res + 1) ** 2)
                acc += w * table[spec.offsets[lvl] + idx]
            out[b, lvl] = acc
    return out.reshape(n, -1)


@pytest.fixture
def sort_backward():
    """Pin the exact (fp32, sorted-scatter) backward for precision tests."""
    import focnerf_tpu.ops.hashgrid as hg

    old = hg.BACKWARD_MODE
    hg.BACKWARD_MODE = "sort"
    yield
    hg.BACKWARD_MODE = old


class TestHashGrid:
    def _spec(self, **kw):
        kw.setdefault("num_levels", 4)
        kw.setdefault("base_resolution", 4)
        kw.setdefault("log2_hashmap_size", 7)
        kw.setdefault("per_level_scale", 2.0)
        return HashGridSpec.create(**kw)

    def test_layout_matches_reference_wrapper(self):
        # bound=1 production spec: L16/C2/T2^19/base16 -> 2048 top resolution
        spec = HashGridSpec.create(desired_resolution=2048)
        assert spec.resolutions[0] == 16 and spec.resolutions[-1] == 2048
        assert spec.per_level_scale == pytest.approx(np.exp2(np.log2(2048 / 16) / 15))
        # dense until (res+1)^3 > 2^19
        for lvl, res in enumerate(spec.resolutions):
            assert spec.hashed[lvl] == ((res + 1) ** 3 > 2**19)
            assert spec.level_size(lvl) % 8 == 0
            assert spec.level_size(lvl) <= 2**19
        assert spec.output_dim == 32

    def test_matches_numpy_reference(self):
        spec = self._spec()
        rng = np.random.default_rng(0)
        table = rng.normal(size=(spec.table_rows, spec.level_dim)).astype(np.float32)
        x = rng.uniform(0, 1, size=(32, 3)).astype(np.float32)
        got = np.asarray(hashgrid_encode(jnp.asarray(table), jnp.asarray(x), spec))
        want = _np_hashgrid_reference(table, x, spec)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_hashed_levels_exercised(self):
        spec = self._spec()
        assert any(spec.hashed), "test spec must include hashed levels"
        assert not all(spec.hashed), "test spec must include dense levels"

    def test_trilinear_exact_on_dense_level(self):
        # single dense level, res 4: table holds f(x,y,z) = linear function =>
        # trilinear interp must reproduce it exactly
        spec = HashGridSpec.create(
            num_levels=1, level_dim=1, base_resolution=4, log2_hashmap_size=10, per_level_scale=2.0
        )
        res = spec.resolutions[0]
        coords = np.stack(
            np.meshgrid(np.arange(res + 1), np.arange(res + 1), np.arange(res + 1), indexing="ij"),
            -1,
        ).reshape(-1, 3)
        # table laid out with stride (res+1): idx = x + y*(res+1) + z*(res+1)^2
        table = np.zeros((spec.table_rows, 1), np.float32)
        flat = coords[:, 0] + coords[:, 1] * (res + 1) + coords[:, 2] * (res + 1) ** 2
        lin = (2.0 * coords[:, 0] - 3.0 * coords[:, 1] + 0.5 * coords[:, 2]).astype(np.float32)
        table[flat, 0] = lin
        x = np.array([[0.3, 0.7, 0.2], [0.0, 0.0, 0.0], [0.99, 0.5, 0.01]], np.float32)
        got = np.asarray(hashgrid_encode(jnp.asarray(table), jnp.asarray(x), spec))[:, 0]
        scale = res - 1.0  # exp2(0)*4 - 1
        pos = x * scale + 0.5
        want = 2.0 * pos[:, 0] - 3.0 * pos[:, 1] + 0.5 * pos[:, 2]
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_oob_is_zero(self):
        spec = self._spec()
        table = hashgrid_init(jax.random.key(0), spec)
        x = jnp.array([[1.2, 0.5, 0.5], [-0.1, 0.2, 0.3]])
        out = np.asarray(hashgrid_encode(table, x, spec))
        np.testing.assert_array_equal(out, 0.0)

    def test_table_gradient_is_scatter_of_weights(self, sort_backward):
        spec = self._spec(num_levels=2)
        rng = np.random.default_rng(1)
        table = jnp.asarray(rng.normal(size=(spec.table_rows, spec.level_dim)), jnp.float32)
        x = jnp.asarray(rng.uniform(0.05, 0.95, size=(8, 3)), jnp.float32)

        g = jax.grad(lambda t: hashgrid_encode(t, x, spec).sum())(table)
        # finite-difference check on a handful of touched entries
        touched = np.nonzero(np.asarray(g).sum(-1))[0][:5]
        eps = 1e-3
        for row in touched:
            tp = table.at[row, 0].add(eps)
            tm = table.at[row, 0].add(-eps)
            fd = (
                float(hashgrid_encode(tp, x, spec).sum())
                - float(hashgrid_encode(tm, x, spec).sum())
            ) / (2 * eps)
            assert fd == pytest.approx(float(g[row, 0]), rel=2e-3, abs=5e-4)

    def test_input_gradient_flows(self):
        # needed by D-NeRF: grad w.r.t. the (deformed) input position
        spec = self._spec(num_levels=2)
        table = hashgrid_init(jax.random.key(2), spec) * 1e4  # make grads non-tiny
        x = jnp.array([[0.33, 0.44, 0.55]])
        g = jax.grad(lambda p: hashgrid_encode(table, p, spec, input_grads=True).sum())(x)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)

    def test_sorted_bwd_matches_autodiff(self, sort_backward):
        """The sorted-scatter custom VJP must produce identical table grads."""
        spec = self._spec()
        rng = np.random.default_rng(5)
        table = jnp.asarray(rng.normal(size=(spec.table_rows, spec.level_dim)), jnp.float32)
        x = jnp.asarray(rng.uniform(0, 1, size=(64, 3)), jnp.float32)
        cot = jnp.asarray(rng.normal(size=(64, spec.output_dim)), jnp.float32)

        def f_custom(t):
            return (hashgrid_encode(t, x, spec) * cot).sum()

        def f_plain(t):
            return (hashgrid_encode(t, x, spec, input_grads=True) * cot).sum()

        g1 = jax.grad(f_custom)(table)
        g2 = jax.grad(f_plain)(table)
        # the segment backward computes per-row sums as cumsum differences,
        # which carries ~1e-6 float32 accumulation noise
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)

    def test_default_path_drops_input_grads(self):
        spec = self._spec(num_levels=2)
        table = hashgrid_init(jax.random.key(2), spec)
        x = jnp.array([[0.33, 0.44, 0.55]])
        g = jax.grad(lambda p: hashgrid_encode(table, p, spec).sum())(x)
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_batched_shape(self):
        spec = self._spec()
        table = hashgrid_init(jax.random.key(3), spec)
        x = jnp.zeros((4, 7, 3)) + 0.5
        assert hashgrid_encode(table, x, spec).shape == (4, 7, spec.output_dim)


def _seq_composite_reference(sigmas, deltas, rgbs, T_thresh, density_scale=1.0):
    """Sequential python port of the CUDA compositing loop (raymarching.cu:540-567)."""
    n, T = sigmas.shape
    image = np.zeros((n, 3))
    ws = np.zeros(n)
    for i in range(n):
        Tcur = 1.0
        for t in range(T):
            if Tcur < T_thresh:
                break
            alpha = 1.0 - np.exp(-deltas[i, t] * density_scale * sigmas[i, t])
            w = alpha * Tcur
            image[i] += w * rgbs[i, t]
            ws[i] += w
            Tcur *= 1.0 - alpha + 1e-15
    return image, ws


class TestComposite:
    def test_matches_sequential_reference(self):
        rng = np.random.default_rng(0)
        sigmas = rng.uniform(0, 20, size=(16, 32)).astype(np.float32)
        deltas = rng.uniform(0.01, 0.1, size=(16, 32)).astype(np.float32)
        rgbs = rng.uniform(0, 1, size=(16, 32, 3)).astype(np.float32)
        for thresh in (0.0, 1e-4, 1e-1):
            out = composite_rays(
                jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(deltas), T_thresh=thresh
            )
            img_ref, ws_ref = _seq_composite_reference(sigmas, deltas, rgbs, thresh)
            np.testing.assert_allclose(np.asarray(out["image"]), img_ref, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(out["weights_sum"]), ws_ref, rtol=1e-4, atol=1e-5)

    def test_opaque_wall(self):
        sigmas = jnp.concatenate([jnp.zeros((1, 5)), jnp.full((1, 1), 1e6), jnp.zeros((1, 4))], -1)
        deltas = jnp.full((1, 10), 0.1)
        w = np.asarray(composite_weights(sigmas, deltas))
        np.testing.assert_allclose(w[0, 5], 1.0, rtol=1e-5)
        np.testing.assert_allclose(w[0, 6:], 0.0, atol=1e-6)

    def test_opaque_wall_grads_finite(self):
        """Fully-opaque samples (alpha == 1 exactly) must keep GRADIENTS
        finite (regression: cumprod's VJP divides by 1-alpha = 0)."""
        deltas = jnp.full((1, 10), 0.1)

        def f(sigmas):
            return jnp.sum(composite_weights(sigmas, deltas) ** 2)

        sig = jnp.concatenate(
            [jnp.zeros((1, 5)), jnp.full((1, 1), 1e6), jnp.zeros((1, 4))], -1
        )
        g = jax.grad(f)(sig)
        assert bool(jnp.isfinite(g).all())

    def test_inf_sigma_forward_and_grads_finite(self):
        """A sigma spike to inf (trunc_exp fp32 overflow) must not NaN the
        forward or the finite samples' gradients (regression: the exclusive
        prefix computed as acc - s gives exp(inf - inf) = NaN)."""
        deltas = jnp.full((1, 8), 0.1)
        sig = jnp.ones((1, 8)).at[0, 3].set(jnp.inf)
        w = composite_weights(sig, deltas)
        assert bool(jnp.isfinite(w).all()), np.asarray(w)
        # samples behind the inf wall get exactly 0 weight
        np.testing.assert_allclose(np.asarray(w[0, 4:]), 0.0, atol=0.0)

        def f(s):
            # gradient w.r.t. the FINITE samples must stay finite (the inf
            # entry's own grad may legitimately be non-finite)
            return jnp.sum(composite_weights(s, deltas)[:, :3] ** 2)

        g = jax.grad(f)(sig)
        assert bool(jnp.isfinite(g[0, :3]).all()), np.asarray(g)

    def test_bg_blend(self):
        out = composite_rays(
            jnp.zeros((2, 4)), jnp.zeros((2, 4, 3)), jnp.ones((2, 4)), bg_color=1.0
        )
        np.testing.assert_allclose(np.asarray(out["image"]), 1.0)

    def test_grad_finite(self):
        rng = np.random.default_rng(1)
        sigmas = jnp.asarray(rng.uniform(0, 5, (4, 16)), jnp.float32)
        deltas = jnp.full((4, 16), 0.05)
        g = jax.grad(lambda s: composite_weights(s, deltas).sum())(sigmas)
        assert np.all(np.isfinite(np.asarray(g)))


class TestGetEncoder:
    def test_dispatch_surface(self):
        from focnerf_tpu.ops.encoding import get_encoder

        fn, init, dim = get_encoder("frequency", input_dim=2, degree=3)
        assert dim == 2 + 2 * 2 * 3
        out = fn(init(None), jnp.ones((4, 2)))
        assert out.shape == (4, dim)

        fn, init, dim = get_encoder("sphere_harmonics", degree=4)
        assert dim == 16
        assert fn(None, jnp.ones((4, 3)) / np.sqrt(3.0)).shape == (4, 16)

        fn, init, dim = get_encoder(
            "hashgrid", num_levels=2, base_resolution=4, log2_hashmap_size=8
        )
        params = init(jax.random.key(0))
        assert fn(params, jnp.full((4, 3), 0.5)).shape == (4, dim)

        fn, init, dim = get_encoder("None", input_dim=3)
        assert dim == 3

    def test_unknown_raises(self):
        from focnerf_tpu.ops.encoding import get_encoder

        with pytest.raises(ValueError):
            get_encoder("bogus")


class TestMXUBackward:
    def _setup(self):
        import focnerf_tpu.ops.hashgrid as hg

        spec = hg.HashGridSpec.create(
            num_levels=4, base_resolution=4, log2_hashmap_size=7, per_level_scale=2.0
        )
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=(spec.table_rows, spec.level_dim)), jnp.float32)
        x = jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)
        cot = jnp.asarray(rng.normal(size=(64, spec.output_dim)), jnp.float32)
        return hg, spec, table, x, cot

    def test_mxu_matches_sort_backward(self):
        hg, spec, table, x, cot = self._setup()

        def gradfn(t):
            return (hg.hashgrid_encode(t, x, spec) * cot).sum()

        old = hg.BACKWARD_MODE
        try:
            hg.BACKWARD_MODE = "sort"
            g_sort = jax.grad(gradfn)(table)
            hg.BACKWARD_MODE = "mxu"
            g_mxu = jax.grad(gradfn)(table)
        finally:
            hg.BACKWARD_MODE = old
        # bf16 contributions: ~0.5% relative gradient noise is expected and
        # training-neutral (validated on hardware: identical PSNR)
        np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_sort), atol=8e-3)
        # structure must match exactly: same nonzero rows
        nz_s = np.asarray(jnp.abs(g_sort).sum(-1) > 1e-6)
        nz_m = np.asarray(jnp.abs(g_mxu).sum(-1) > 1e-6)
        np.testing.assert_array_equal(nz_m, nz_s)

    def test_mxu_forward_matches_gather(self):
        """The hi/lo one-hot forward must agree with the fused gather on every
        level class (dense small, dense large, hashed) to bf16 tolerance."""
        hg, spec, table, x, cot = self._setup()
        assert any(spec.hashed), "spec must exercise hashed levels"
        old = hg.FORWARD_MODE
        try:
            hg.FORWARD_MODE = "gather"
            out_g = hg.hashgrid_encode(table, x, spec)
            hg.FORWARD_MODE = "mxu"
            out_m = hg.hashgrid_encode(table, x, spec)
        finally:
            hg.FORWARD_MODE = old
        # table values ride in bf16 on the MXU path (~0.4% rel)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_g), atol=2e-2,
                                   rtol=1e-2)
        # levels above the size cutoff use the gather in both modes -> exact
        cut = [lvl for lvl in range(spec.num_levels)
               if spec.level_size(lvl) > hg._MXU_FWD_MAX_ROWS]
        for lvl in cut:
            sl = slice(lvl * spec.level_dim, (lvl + 1) * spec.level_dim)
            np.testing.assert_array_equal(
                np.asarray(out_m[:, sl]), np.asarray(out_g[:, sl])
            )

    def test_mxu_forward_grad_matches(self):
        """Autodiff through the MXU forward must produce the same table
        gradient structure as through the gather forward."""
        hg, spec, table, x, cot = self._setup()

        def gradfn(t):
            return (hg.hashgrid_encode(t, x, spec, input_grads=True) * cot).sum()

        old = hg.FORWARD_MODE
        try:
            hg.FORWARD_MODE = "gather"
            g_g = jax.grad(gradfn)(table)
            hg.FORWARD_MODE = "mxu"
            g_m = jax.grad(gradfn)(table)
        finally:
            hg.FORWARD_MODE = old
        np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_g), atol=2e-2)

    def test_mxu_training_converges(self):
        """End-to-end: a few optimization steps with the MXU backward reduce loss."""
        import optax

        hg, spec, table, x, cot = self._setup()
        # realizable target: the encoding under a different table
        table2 = jnp.asarray(
            np.random.default_rng(1).normal(size=(spec.table_rows, spec.level_dim)),
            jnp.float32,
        )
        target = hg.hashgrid_encode(table2, x, spec)
        opt = optax.adam(1e-2)
        state = opt.init(table)

        @jax.jit
        def step(table, state):
            def loss(t):
                return jnp.mean((hg.hashgrid_encode(t, x, spec) - target) ** 2)
            l, g = jax.value_and_grad(loss)(table)
            up, state2 = opt.update(g, state, table)
            return optax.apply_updates(table, up), state2, l

        losses = []
        for _ in range(50):
            table, state, l = step(table, state)
            losses.append(float(l))
        assert losses[-1] < losses[0] * 0.5


class TestHashgridTV:
    """TV regularizer parity (gridencoder.cu:549-643, grid.py:165-185)."""

    def test_tv_decreases_under_descent(self):
        from focnerf_tpu.ops.hashgrid import HashGridSpec, hashgrid_tv_loss

        spec = HashGridSpec.create(
            num_levels=4, level_dim=2, base_resolution=8,
            log2_hashmap_size=12, desired_resolution=64,
        )
        table = jax.random.normal(jax.random.key(0), (spec.table_rows, 2))
        x = jax.random.uniform(jax.random.key(1), (256, 3))
        loss0 = float(hashgrid_tv_loss(table, x, spec))
        assert loss0 > 0
        g = jax.grad(hashgrid_tv_loss)(table, x, spec)
        assert g.shape == table.shape
        table2 = table - 0.5 * g
        loss1 = float(hashgrid_tv_loss(table2, x, spec))
        assert loss1 < loss0

    def test_tv_zero_on_constant_table(self):
        from focnerf_tpu.ops.hashgrid import HashGridSpec, hashgrid_tv_loss

        spec = HashGridSpec.create(
            num_levels=2, level_dim=2, base_resolution=8,
            log2_hashmap_size=12, desired_resolution=16,
        )
        table = jnp.ones((spec.table_rows, 2))
        x = jax.random.uniform(jax.random.key(1), (64, 3))
        # constant table -> all deltas zero -> only the 1e-9 eps floor remains
        assert float(hashgrid_tv_loss(table, x, spec)) < 1e-3


class TestStochasticCorners:
    """Stochastic-corner training mode (HashGridSpec.stochastic_k)."""

    def test_unbiased_and_dense_exact(self):
        import dataclasses

        from focnerf_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode, hashgrid_init

        spec = HashGridSpec.create(
            num_levels=6, level_dim=2, base_resolution=16,
            log2_hashmap_size=14, desired_resolution=256,
        )
        assert any(spec.hashed) and not all(spec.hashed)
        sspec = dataclasses.replace(spec, stochastic_k=1)
        table = hashgrid_init(jax.random.key(0), spec) * 1e4
        x = jax.random.uniform(jax.random.key(1), (128, 3))
        exact = hashgrid_encode(table, x, spec)

        # no rng -> exact even with stochastic_k set
        np.testing.assert_allclose(
            np.asarray(hashgrid_encode(table, x, sspec)), np.asarray(exact), atol=1e-5
        )

        acc = jnp.zeros_like(exact)
        R = 300
        for i in range(R):
            acc = acc + hashgrid_encode(table, x, sspec, rng=jax.random.key(i))
        mc = acc / R
        n_dense = sum(not h for h in spec.hashed) * spec.level_dim
        np.testing.assert_allclose(  # dense levels stay exact per-draw
            np.asarray(mc[:, :n_dense]), np.asarray(exact[:, :n_dense]), atol=1e-4
        )
        rel = np.median(
            np.abs(np.asarray(mc[:, n_dense:] - exact[:, n_dense:]))
            / (np.abs(np.asarray(exact[:, n_dense:])) + 1e-3)
        )
        assert rel < 0.1, f"MC mean should approach exact, rel={rel}"

    def test_grad_unbiased(self):
        import dataclasses

        from focnerf_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode, hashgrid_init

        spec = HashGridSpec.create(
            num_levels=4, level_dim=2, base_resolution=16,
            log2_hashmap_size=14, desired_resolution=128,
        )
        sspec = dataclasses.replace(spec, stochastic_k=2)
        table = hashgrid_init(jax.random.key(0), spec)
        x = jax.random.uniform(jax.random.key(1), (64, 3))
        const = jax.random.normal(jax.random.key(2), (64, spec.output_dim))
        loss = lambda t, s, k: jnp.sum(hashgrid_encode(t, x, s, rng=k) * const)
        g_exact = jax.grad(loss)(table, spec, None)
        gacc = jnp.zeros_like(g_exact)
        R = 300
        for i in range(R):
            gacc = gacc + jax.grad(loss)(table, sspec, jax.random.key(i))
        rel = float(jnp.linalg.norm(gacc / R - g_exact) / jnp.linalg.norm(g_exact))
        assert rel < 0.1, rel

    def test_dense_stochastic_min_size(self):
        """stochastic_min_size extends corner sampling to big dense levels:
        still unbiased, small dense levels stay exact per-draw."""
        import dataclasses

        from focnerf_tpu.ops.hashgrid import (
            HashGridSpec, _col_layout, hashgrid_encode, hashgrid_init,
        )

        spec = HashGridSpec.create(
            num_levels=6, level_dim=2, base_resolution=8,
            log2_hashmap_size=14, desired_resolution=256,
        )
        min_size = 2**11
        sspec = dataclasses.replace(
            spec, stochastic_k=1, stochastic_min_size=min_size
        )
        layout = _col_layout(sspec)
        stoch = [layout[l][1] == 1 for l in range(spec.num_levels)]
        # at least one DENSE level got the stochastic treatment
        assert any(s and not spec.hashed[l] for l, s in enumerate(stoch))
        # and the small dense levels did not
        assert any((not s) and spec.level_size(l) < min_size
                   for l, s in enumerate(stoch))

        table = hashgrid_init(jax.random.key(0), spec) * 1e4
        x = jax.random.uniform(jax.random.key(1), (128, 3))
        exact = hashgrid_encode(table, x, spec)
        # no rng -> exact
        np.testing.assert_allclose(
            np.asarray(hashgrid_encode(table, x, sspec)), np.asarray(exact),
            atol=1e-5,
        )
        acc = jnp.zeros_like(exact)
        R = 400
        for i in range(R):
            acc = acc + hashgrid_encode(table, x, sspec, rng=jax.random.key(i))
        mc = acc / R
        for l in range(spec.num_levels):
            cols = slice(l * spec.level_dim, (l + 1) * spec.level_dim)
            err = np.abs(np.asarray(mc[:, cols] - exact[:, cols]))
            if stoch[l]:
                rel = np.median(err / (np.abs(np.asarray(exact[:, cols])) + 1e-3))
                assert rel < 0.12, f"level {l} biased: rel={rel}"
            else:
                assert err.max() < 1e-4, f"exact level {l} drifted"


class TestUniformKFastPaths:
    """All-levels-stochastic (uniform-K) layout: the fast combine/contrib
    shortcuts must match the general selection-matmul formulation exactly,
    and the backward variants must agree on the uniform layout."""

    def _setup(self, k=1):
        import dataclasses

        import focnerf_tpu.ops.hashgrid as hg

        spec = hg.HashGridSpec.create(
            num_levels=4, base_resolution=4, log2_hashmap_size=7,
            per_level_scale=2.0,
        )
        # stochastic_min_size=1: EVERY level (dense included) samples K
        # corners -> uniform layout, pure-gather training forward
        uspec = dataclasses.replace(
            spec, stochastic_k=k, stochastic_min_size=1
        )
        assert all(
            n == k for _, n in hg._col_layout(uspec)
        ), hg._col_layout(uspec)
        rng = np.random.default_rng(0)
        table = jnp.asarray(
            rng.normal(size=(spec.table_rows, spec.level_dim)), jnp.float32
        )
        x = jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)
        cot = jnp.asarray(rng.normal(size=(64, spec.output_dim)), jnp.float32)
        return hg, uspec, table, x, cot

    @pytest.mark.parametrize("k", [1, 2])
    def test_forward_matches_manual_expectation(self, k):
        """For fixed u the uniform-K output must equal (1/K) sum_j T[row_j]
        (weights carry the estimator scale), recomputed by hand from the
        residual rows."""
        hg, uspec, table, x, cot = self._setup(k)
        key = jax.random.key(7)
        u = jax.random.uniform(key, (x.shape[0], uspec.num_levels, k, 3))
        out, rows, weights = hg._encode_impl(table, x, uspec, u)
        T = np.asarray(table)
        r = np.asarray(rows)  # [N, L*K]
        w = np.asarray(weights)
        exp = np.zeros((x.shape[0], uspec.output_dim), np.float32)
        for lvl in range(uspec.num_levels):
            for c in range(uspec.level_dim):
                cols = slice(lvl * k, (lvl + 1) * k)
                exp[:, lvl * uspec.level_dim + c] = np.sum(
                    w[:, cols] * T[r[:, cols], c], axis=1
                )
        np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-5, atol=1e-6)

    def test_backward_modes_agree_on_uniform_layout(self):
        hg, uspec, table, x, cot = self._setup(1)
        key = jax.random.key(3)

        def gradfn(t):
            return (hg.hashgrid_encode(t, x, uspec, rng=key) * cot).sum()

        old_m, old_b = hg.BACKWARD_MODE, hg.BACKWARD_ONEHOT_BUILD
        try:
            hg.BACKWARD_MODE = "sort"
            g_sort = jax.grad(gradfn)(table)
            hg.BACKWARD_MODE = "mxu"
            hg.BACKWARD_ONEHOT_BUILD = "where"
            g_where = jax.grad(gradfn)(table)
            hg.BACKWARD_ONEHOT_BUILD = "scatter"
            g_scat = jax.grad(gradfn)(table)
        finally:
            hg.BACKWARD_MODE, hg.BACKWARD_ONEHOT_BUILD = old_m, old_b
        assert float(jnp.abs(g_sort).sum()) > 0  # the grad isn't trivially 0
        np.testing.assert_allclose(
            np.asarray(g_where), np.asarray(g_sort), atol=8e-3
        )
        # the two one-hot builds are the SAME bf16 math -> bitwise equal
        np.testing.assert_array_equal(np.asarray(g_scat), np.asarray(g_where))

    def test_uniform_k_unbiased(self):
        """MC average of the K=1 all-levels-stochastic encode converges to
        the exact trilinear encode."""
        hg, uspec, table, x, cot = self._setup(1)
        exact = hg.hashgrid_encode(table, x, uspec)  # no rng -> exact
        acc = np.zeros(exact.shape, np.float64)
        reps = 600
        for i in range(reps):
            acc += np.asarray(
                hg.hashgrid_encode(table, x, uspec, rng=jax.random.key(i))
            )
        err = np.abs(acc / reps - np.asarray(exact))
        scale = np.abs(np.asarray(exact)).mean() + 1e-6
        assert err.mean() / scale < 0.12, err.mean() / scale

    @pytest.mark.parametrize("stoch", [True, False])
    def test_hybrid_backward_matches_sort(self, stoch):
        """'hybrid' (small levels on MXU one-hots + one sort over only the
        big-level entries) must match the pure sort backward on both the
        uniform-K and the exact (mixed-corner) layouts."""
        import dataclasses

        import focnerf_tpu.ops.hashgrid as hg

        # log2=12 gives genuinely mixed level sizes (128/736/4096/4096)
        spec = hg.HashGridSpec.create(
            num_levels=4, base_resolution=4, log2_hashmap_size=12,
            per_level_scale=2.0,
        )
        if stoch:
            spec = dataclasses.replace(
                spec, stochastic_k=1, stochastic_min_size=1
            )
        rng_np = np.random.default_rng(0)
        table = jnp.asarray(
            rng_np.normal(size=(spec.table_rows, spec.level_dim)), jnp.float32
        )
        x = jnp.asarray(rng_np.uniform(0, 1, (64, 3)), jnp.float32)
        cot = jnp.asarray(
            rng_np.normal(size=(64, spec.output_dim)), jnp.float32
        )
        key = jax.random.key(9) if stoch else None

        def gradfn(t):
            return (hg.hashgrid_encode(t, x, spec, rng=key) * cot).sum()

        old_m, old_h = hg.BACKWARD_MODE, hg.BACKWARD_HYBRID_MAX_ROWS
        try:
            hg.BACKWARD_MODE = "sort"
            g_sort = jax.grad(gradfn)(table)
            hg.BACKWARD_MODE = "hybrid"
            hg.BACKWARD_HYBRID_MAX_ROWS = 1000  # splits 128/736 vs 4096
            sizes = [spec.level_size(l) for l in range(spec.num_levels)]
            small = [l for l, s in enumerate(sizes) if s <= 1000]
            assert 0 < len(small) < spec.num_levels, (sizes, small)
            g_hyb = jax.grad(gradfn)(table)
        finally:
            hg.BACKWARD_MODE, hg.BACKWARD_HYBRID_MAX_ROWS = old_m, old_h
        assert float(jnp.abs(g_sort).sum()) > 0
        np.testing.assert_allclose(
            np.asarray(g_hyb), np.asarray(g_sort), atol=8e-3
        )
