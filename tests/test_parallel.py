"""Object-sharded composition tests on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focnerf_tpu.models.nerf import NeRFConfig, init_nerf_params
from focnerf_tpu.parallel.mesh import make_mesh
from focnerf_tpu.parallel.sharding import compose_rays_sharded, shard_objects
from focnerf_tpu.render.compose import compose_rays, stack_object_params

TINY = NeRFConfig(
    num_levels=2, base_resolution=4, log2_hashmap_size=8,
    use_objfeat=False, compute_dtype=jnp.float32,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestObjectSharding:
    def test_sharded_compose_matches_local(self):
        params_list = [init_nerf_params(jax.random.key(i), TINY) for i in range(8)]
        # amplify grids so densities differ decisively across objects
        for i, p in enumerate(params_list):
            p["grid"] = p["grid"] * (1e4 + i * 1e3)
        stacked = stack_object_params(params_list)

        o = jnp.zeros((16, 3)).at[:, 2].set(-2.0)
        d = jnp.zeros((16, 3)).at[:, 2].set(1.0)

        local = compose_rays(stacked, TINY, o, d, num_steps=16, bg_color=1.0)

        mesh = make_mesh(8)
        sharded_params = shard_objects(stacked, mesh)
        dist = compose_rays_sharded(
            sharded_params, TINY, o, d, mesh, num_steps=16, bg_color=1.0
        )
        np.testing.assert_allclose(
            np.asarray(dist["image"]), np.asarray(local["image"]), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dist["alpha"]), np.asarray(local["alpha"]), rtol=1e-4, atol=1e-5
        )
