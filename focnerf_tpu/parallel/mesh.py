"""Device mesh + sharding helpers.

TPU-native replacement for the reference's vestigial DDP/NCCL scaffolding
(nerf/utils.py:671-717, 1317-1331 — never exercised there: world_size is
always 1). Here parallelism is real and tested:

  - ``data`` axis: ray-batch data parallelism — batches are sharded on the
    leading axis, params replicated; XLA inserts the gradient psum
    (the NCCL allreduce equivalent) automatically under jit;
  - ``objects`` axis (composition): per-object NeRFs sharded across devices,
    fused with a max-density psum-style reduction (render/compose.py).

Collectives ride ICI via jax.sharding; no hand-written NCCL calls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    arr = np.array(devs)
    if len(axis_names) > 1:
        raise NotImplementedError("only 1-D meshes are used; compose axes upstream")
    return Mesh(arr, axis_names)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device_put a batch dict with the leading axis sharded over ``axis``.

    Scalar / unbatched entries (e.g. obj_feat [F]) are replicated.
    """
    n = mesh.shape[axis]

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] >= n:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
