"""Fused multi-step training: K optimizer steps in ONE device dispatch.

Why this exists: on a tunneled chip the per-dispatch cost dominates the
step loop — PERF.md round-4 measured ~120 ms/step wall at the production
parity config against ~23 ms of compute, i.e. the relay RTT is ~80% of
training wall time. The reference never faces this (its train loop and
CUDA kernels share a PCIe-local process, nerf/utils.py:818-905); the
TPU-native answer is to move the *loop* onto the device: `lax.scan` over
K steps, with per-step batch assembly (view draw, pixel sampling, ray
gen, GT gather) and the error-map EMA folded into the same compiled
program. One dispatch then costs one RTT for K steps.

Bit-compatibility contract (tested in tests/test_fused_steps.py): the
scan body consumes the PRNG chain exactly like Trainer's sequential
loop — `rng, r = split(rng); k_batch, k = split(r)`, view from
`fold_in(k_batch, 17)` — so a fused run and a per-step run produce
identical parameter trajectories. Occupancy-grid maintenance stays at
chunk boundaries (the Trainer aligns chunks to update_extra_interval),
which is also exactly the sequential cadence.

grad_level_phases > 1 is supported by unrolling one sub-step per phase
inside the scan body (each phase's cfg is static, so each sub-step is
its own traced computation; scan length becomes K // P).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from focnerf_tpu.train.steps import update_error_map


def make_fused_chunk(
    step_raws: Sequence[Callable],
    assemble: Callable,
    n_views: int,
    *,
    K: int,
    use_occupancy: bool,
    has_error_map: bool,
    donate: bool = True,
):
    """Build the jitted K-step chunk.

    Args:
      step_raws: un-jitted step impls (``make_train_step(...).raw`` /
        ``make_train_step_occupancy(...).raw``), one per gradphase (length
        P; P == 1 when phasing is off). K must be a multiple of P.
      assemble: pure batch assembler
        (rng, view, poses, images, masks, obj_feats, error_map) -> batch
        (data/provider.py::make_batch_assemble).
      n_views: number of training views (static).
      K: steps per dispatch.
      use_occupancy: step signature takes (state, batch, occ_bits, rng)
        instead of (state, batch, rng).
      has_error_map: carry + update the per-view error map in the scan.

    Returns a jitted function
      (state, error_map, rng, occ_bits, poses, images, masks, obj_feats)
        -> (state, error_map, rng, losses [K], mean_samples [K])
    where error_map / occ_bits / masks / obj_feats may be None (static).
    """
    P = len(step_raws)
    if K % P != 0:
        raise ValueError(f"K={K} must be a multiple of gradphase count {P}")

    def chunk_impl(state, error_map, rng, occ_bits, poses, images, masks, obj_feats):
        def body(carry, _):
            state, error_map, rng = carry
            losses, msamples = [], []
            for step_raw in step_raws:
                # PRNG chain identical to Trainer.train's sequential loop
                rng, r = jax.random.split(rng)
                k_batch, k = jax.random.split(r)
                view = jax.random.randint(
                    jax.random.fold_in(k_batch, 17), (), 0, n_views
                )
                batch = assemble(
                    k_batch, view, poses, images, masks, obj_feats, error_map
                )
                if use_occupancy:
                    state, metrics = step_raw(state, batch, occ_bits, k)
                else:
                    state, metrics = step_raw(state, batch, k)
                if has_error_map and "inds_coarse" in batch:
                    em = update_error_map(
                        error_map[view], batch["inds_coarse"],
                        metrics["per_ray_error"],
                    )
                    error_map = error_map.at[view].set(em)
                losses.append(metrics["loss"])
                msamples.append(
                    jnp.asarray(metrics.get("mean_samples", 0.0), jnp.float32)
                )
            return (state, error_map, rng), (
                jnp.stack(losses), jnp.stack(msamples)
            )

        (state, error_map, rng), (losses, msamples) = jax.lax.scan(
            body, (state, error_map, rng), None, length=K // P
        )
        return state, error_map, rng, losses.reshape(-1), msamples.reshape(-1)

    # donate the train state + error map (both replaced every call); the
    # dataset arrays / occ bits are read-only inputs
    dn = (0, 1) if donate else ()
    return jax.jit(chunk_impl, donate_argnums=dn)
