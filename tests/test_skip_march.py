"""Skip-field sphere-tracing marcher vs the candidate-ladder marcher.

The skip march (ops/marching.py::march_rays_skip) replaces the dense
[N, max_steps] bitfield probe with a lax.scan walk over precomputed safe
empty-space radii (ops/occupancy.py::occupancy_skip_field) — the TPU answer
to the CUDA marcher's per-thread DDA skipping (raymarching.cu:365-377).
"""

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.core.rays import get_rays
from focnerf_tpu.core.camera import rand_poses
from focnerf_tpu.ops.marching import march_rays, march_rays_skip
from focnerf_tpu.ops.occupancy import occupancy_skip_field


def _random_occ(rng, gs=16, p=0.05):
    return jnp.asarray(rng.random((1, gs**3)) < p)


class TestSkipField:
    def test_codes_are_safe(self):
        gs = 16
        rng = np.random.default_rng(0)
        occ = _random_occ(rng, gs, p=0.03)
        skip = np.asarray(occupancy_skip_field(occ, gs)).reshape(gs, gs, gs)
        occ3 = np.asarray(occ).reshape(gs, gs, gs)
        # occupied <-> code 0
        np.testing.assert_array_equal(skip == 0, occ3)
        occ_idx = np.argwhere(occ3)
        for c in np.argwhere(skip >= 2):
            k = int(skip[tuple(c)]) - 1
            d = np.abs(occ_idx - c[None]).max(-1).min() if len(occ_idx) else 99
            assert d > k, f"cell {c} code {k+1} but occupied at L-inf {d}"

    def test_empty_grid_max_codes(self):
        gs = 32
        skip = np.asarray(occupancy_skip_field(jnp.zeros((1, gs**3), bool), gs))
        assert skip.min() >= 1 + gs // 2  # everything maximally skippable


def _sphere_occ(gs=128, r=0.5):
    c = (jnp.arange(gs) + 0.5) / gs * 2 - 1
    X, Y, Z = jnp.meshgrid(c, c, c, indexing="ij")
    return ((X**2 + Y**2 + Z**2) < r**2).reshape(1, -1)


class TestSkipMarch:
    def _rays(self, n=256, seed=0):
        pose = rand_poses(np.random.default_rng(seed), 1, radius=2.5)[0]
        rays = get_rays(jnp.asarray(pose), (96.0, 96.0, 32.0, 32.0), 64, 64)
        idx = np.random.default_rng(seed + 1).integers(0, 64 * 64, n)
        o, d = rays["rays_o"][idx], rays["rays_d"][idx]
        b = jnp.sum(o * d, -1)
        nears = jnp.maximum(0.05, -b - 1.8)
        fars = -b + 1.8
        return o, d, nears, fars

    def test_samples_only_in_occupied_cells(self):
        gs = 64
        occ = _sphere_occ(gs)
        skip = occupancy_skip_field(occ, gs)
        o, d, nears, fars = self._rays()
        res = march_rays_skip(
            o, d, nears, fars, skip, bound=1.0, dt_gamma=0.0,
            max_steps=256, slab=32, grid_size=gs,
        )
        ts = np.asarray(res.ts)
        valid = np.asarray(res.valid)
        occ3 = np.asarray(occ).reshape(gs, gs, gs)
        pts = np.asarray(o)[:, None, :] + np.asarray(d)[:, None, :] * ts[..., None]
        cell = np.clip(((pts + 1) / 2 * gs).astype(int), 0, gs - 1)
        inside = occ3[cell[..., 0], cell[..., 1], cell[..., 2]]
        assert inside[valid].all()
        # ts strictly increasing among valid samples
        for i in range(ts.shape[0]):
            v = ts[i][valid[i]]
            assert (np.diff(v) > 0).all()

    def test_matches_ladder_march_coverage(self):
        """Both marchers must cover the same occupied intervals: compare
        per-ray entry depth and total occupied path length."""
        gs = 64
        occ = _sphere_occ(gs)
        skip = occupancy_skip_field(occ, gs)
        o, d, nears, fars = self._rays(seed=3)
        kw = dict(bound=1.0, dt_gamma=0.0, max_steps=256, grid_size=gs)
        ladder = march_rays(o, d, nears, fars, occ, slab=64, **kw)
        sphere = march_rays_skip(o, d, nears, fars, skip, slab=64, **kw)

        lv, sv = np.asarray(ladder.valid), np.asarray(sphere.valid)
        lt, st = np.asarray(ladder.ts), np.asarray(sphere.ts)
        ld, sd = np.asarray(ladder.dts), np.asarray(sphere.dts)
        dt_min = 2 * np.sqrt(3) / 256
        hit_l = lv.any(-1)
        hit_s = sv.any(-1)
        # same rays hit (within the 1-sample fringe)
        assert (hit_l == hit_s).mean() > 0.97
        both = hit_l & hit_s
        # entry depth within two fine steps for the bulk; corner-grazing rays
        # may differ by ~a cell: the step-based walk (like the CUDA marcher's
        # dt stepping, raymarching.cu:349-383) can overstep a sub-dt corner
        # clip that the dense candidate ladder happens to probe
        t0_l = np.where(lv, lt, np.inf).min(-1)[both]
        t0_s = np.where(sv, st, np.inf).min(-1)[both]
        err = np.abs(t0_l - t0_s)
        assert np.quantile(err, 0.95) < 2.5 * dt_min
        assert err.max() < 3 * (2.0 / 64)  # never off by more than ~3 cells
        # occupied path length (sum of dts) within 10%
        len_l = (ld * lv).sum(-1)[both]
        len_s = (sd * sv).sum(-1)[both]
        rel = np.abs(len_l - len_s) / np.maximum(len_l, dt_min)
        assert np.median(rel) < 0.1, f"median rel length err {np.median(rel)}"

    def test_cluttered_grid_reaches_far_wall(self):
        """Regression: skip codes pinned at 1-2 advance ~1 cell/iteration, so
        a fixed slab+48 iteration budget starved rays of far content. A comb
        of occupied planes keeps every empty cell within L-inf 1 of an
        occupied one; an axis ray between two planes must still collect its
        samples from the far half of the volume."""
        gs = 64
        occ3 = np.zeros((gs, gs, gs), bool)
        occ3[:, ::2, :] = True  # comb: every other y-plane occupied
        skip = occupancy_skip_field(jnp.asarray(occ3.reshape(1, -1)), gs)
        # ray along +x in an EMPTY y-plane: crosses gs cells, all code 1-2
        y_empty = (1.5 / gs) * 2 - 1  # center of y-cell 1 (unoccupied)
        o = jnp.array([[-1.5, y_empty, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        nears, fars = jnp.array([0.5]), jnp.array([3.5])
        res = march_rays_skip(
            o, d, nears, fars, skip, bound=1.0, dt_gamma=0.0,
            max_steps=256, slab=16, grid_size=gs,
        )
        # the comb's empty plane holds no samples; the marcher must walk the
        # full extent (gs iterations > old slab+48 budget) and exit at fars
        # rather than stopping mid-volume with t stuck inside the grid
        ts = np.asarray(res.ts)
        valid = np.asarray(res.valid)
        assert not valid.any()  # nothing occupied on this ray's path
        # ...and a neighboring ray nudged into an occupied plane must
        # collect samples all the way to the BACK half of the volume
        y_occ = (2.0 / gs) * 2 - 1  # boundary-adjacent occupied plane
        o2 = jnp.array([[-1.5, y_occ + 1e-4, 0.0]])
        res2 = march_rays_skip(
            o2, d, nears, fars, skip, bound=1.0, dt_gamma=0.0,
            max_steps=256, slab=200, grid_size=gs,
        )
        ts2, v2 = np.asarray(res2.ts), np.asarray(res2.valid)
        x_hit = (o2[0, 0] + ts2[0]) * v2[0]
        assert v2.any() and x_hit.max() > 0.9, (
            f"far-wall starvation: deepest sample x={x_hit.max():.2f}"
        )

    def test_dt_gamma_recurrence(self):
        gs = 64
        occ = _sphere_occ(gs)
        skip = occupancy_skip_field(occ, gs)
        o, d, nears, fars = self._rays(seed=5)
        res = march_rays_skip(
            o, d, nears, fars, skip, bound=1.0, dt_gamma=1 / 128,
            max_steps=512, slab=32, grid_size=gs,
        )
        ts, dts, valid = np.asarray(res.ts), np.asarray(res.dts), np.asarray(res.valid)
        dt_min = 2 * np.sqrt(3) / 512
        dt_max = 2 * np.sqrt(3) / 64
        want = np.clip(ts * (1 / 128), dt_min, dt_max)
        np.testing.assert_allclose(dts[valid], want[valid], rtol=1e-5)

    def test_leaps_stay_on_lattice_across_phase_boundaries(self):
        """Empty-space leaps that cross a dt-recurrence phase change must
        land exactly on the scalar recurrence t += clamp(t*g, lo, hi).

        Scene: occupancy only in a thin far wall (x > 0.85), so the marcher
        takes long closed-form leaps. Ray A starts at the center with a tiny
        near (crosses the dt_min-pinned -> geometric boundary mid-leap);
        ray B enters from outside and crosses geometric -> dt_max-pinned
        (boundary t = dt_max/gamma ~ 1.73 with gamma = 1/32) before hitting
        the wall. Guards the ADVICE-r2 phase-clamp fix in march_rays_skip.
        """
        gs = 64
        c = (jnp.arange(gs) + 0.5) / gs * 2 - 1
        X, _, _ = jnp.meshgrid(c, c, c, indexing="ij")
        occ = (X > 0.85).reshape(1, -1)
        skip = occupancy_skip_field(occ, gs)
        o = jnp.asarray([[0.0, 0.0, 0.0], [-2.0, 0.01, 0.01]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
        nears = jnp.asarray([1e-3, 1.0], jnp.float32)
        fars = jnp.asarray([1.0, 3.0], jnp.float32)
        gamma, max_steps = 1 / 32, 512
        dt_min = 2 * np.sqrt(3) / max_steps
        dt_max = 2 * np.sqrt(3) / gs
        res = march_rays_skip(
            o, d, nears, fars, skip, bound=1.0, dt_gamma=gamma,
            max_steps=max_steps, slab=16, grid_size=gs,
        )
        ts, valid = np.asarray(res.ts), np.asarray(res.valid)
        assert valid[0].any() and valid[1].any()
        for r in range(2):
            # exact scalar recurrence from this ray's t0
            t, lattice = float(nears[r]), []
            while t < float(fars[r]) + dt_max:
                lattice.append(t)
                t += float(np.clip(t * gamma, dt_min, dt_max))
            lattice = np.asarray(lattice)
            for tv in ts[r][valid[r]]:
                err = np.abs(lattice - tv).min()
                assert err < 5e-5 * max(tv, 1.0), (
                    f"ray {r}: sample t={tv:.6f} off-lattice by {err:.2e}"
                )
