"""focnerf-tpu: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of FOC-NeRF.

FOC-NeRF (reference: joejep/FOCNeRF, a torch-ngp fork) trains one Instant-NGP
NeRF per detected object (YOLOv8-seg masks), conditions color on per-image
backbone features, and composes/edits scenes from per-object fields.

This package is a ground-up TPU-first redesign:

- CUDA extensions (gridencoder / raymarching / ffmlp / tcnn) are replaced by
  XLA-fused jnp ops and Pallas TPU kernels with fixed shapes and no atomics.
- The ``Trainer`` god-class becomes a functional ``train_step(state, batch)``
  under ``jax.jit``; occupancy grid, EMA and counters are explicit state.
- Multi-object composition streams a running (max-density, argmax-rgb)
  reduction instead of materializing per-object [H*W, T] fields, removing the
  reference's 4-object OOM ceiling (README.md:111-113 in the reference).
- Scaling is ``jax.sharding.Mesh`` + pjit/shard_map: ray-batch data
  parallelism with psum'd hash-table gradients, object-sharded composition.
"""

__version__ = "0.1.0"
