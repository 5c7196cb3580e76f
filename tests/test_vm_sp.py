"""Collapse-sharded VM SP (parallel/vm_sp.py): the 8-way step must match
the 1-way step exactly (same factors, same adam), converge, and slice the
hat-einsum operands rather than replicating the dense collapse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.train.voxel_vm import collapse_vm, init_vm_field

from test_voxel_sp import _setup


def _steps(R, key0, lr=1e-2):
    from focnerf_tpu.parallel.mesh import make_mesh
    from focnerf_tpu.parallel.vm_sp import make_vm_sp_step

    opt8, step8 = make_vm_sp_step(
        make_mesh(8), resolution=R, warp_axis=key0[0], flip=key0[1],
        lr=lr, tv_weight=1e-4, block=2,
    )
    opt1, step1 = make_vm_sp_step(
        make_mesh(1), resolution=R, warp_axis=key0[0], flip=key0[1],
        lr=lr, tv_weight=1e-4, block=2,
    )
    return opt8, step8, opt1, step1


class TestVMSP:
    def test_vm_sp_matches_single_device(self):
        """One 8-way collapse-sharded step == the 1-way step: the sliced
        hat einsums + optical-depth partial combine must reproduce the
        monolithic collapse-and-fold exactly (factor grads psum across
        the zero-padded dynamic_slice cotangents)."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        R = 16
        key0, poses, gts, masks, intr, H = _setup(R=R)
        field0 = init_vm_field(R, rank=4, rng=jax.random.key(1))
        opt8, step8, opt1, step1 = _steps(R, key0)

        f8, _, mse8 = step8(
            field0, opt8.init(field0), jnp.asarray(poses[0]), gts[0], masks[0]
        )
        f1, _, mse1 = step1(
            field0, opt1.init(field0), jnp.asarray(poses[0]), gts[0], masks[0]
        )
        np.testing.assert_allclose(float(mse8), float(mse1), rtol=2e-5)
        for a, b in zip(jax.tree.leaves(f8), jax.tree.leaves(f1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_vm_sp_local_slab_matches_collapse(self):
        """_collapse_vm_local_slab(d) must equal collapse_vm rows
        [d*R_loc:(d+1)*R_loc] along the warp axis, for every axis."""
        from focnerf_tpu.parallel.vm_sp import _collapse_vm_local_slab

        R, D = 16, 4
        field = init_vm_field(R, rank=3, rng=jax.random.key(2))
        dense = collapse_vm(field)
        for axis in range(3):
            for d in range(D):
                loc = _collapse_vm_local_slab(field, axis, jnp.int32(d), R // D)
                want = jax.lax.slice_in_dim(
                    dense, d * (R // D), (d + 1) * (R // D), axis=axis
                )
                # canonical output keeps [X, Y, Z, C] order
                np.testing.assert_allclose(
                    np.asarray(loc), np.asarray(want), atol=1e-5
                )

    def test_vm_sp_converges_and_fits(self):
        """A short collapse-sharded fit must reduce the error, and the
        fit driver must return a renderable volume."""
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from focnerf_tpu.parallel.vm_sp import fit_vm_sp

        R = 16
        key0, poses, gts, masks, intr, H = _setup(R=R)
        # reconstruct images for the fit driver (it warps internally)
        from focnerf_tpu.render.baked import render_baked

        from test_voxel_sp import _gt_volume

        gt_vol = _gt_volume()
        imgs = np.stack(
            [np.asarray(render_baked(gt_vol, p, intr, H, H)[0]) for p in poses]
        )
        vol, info = fit_vm_sp(
            poses, imgs, intr, resolution=R, rank=4, iters=40, lr=5e-2,
            log_every=0, block=2,
        )
        assert info["psnr"] > 10.0, info
        assert vol.rgba.shape == (R, R, R, 4)
