"""D-NeRF trainer: the shared Trainer shell with time threaded everywhere.

Parity target: ``dnerf/utils.py`` (Trainer subclass overriding
train/eval/test_step to pass ``time``, time-conditioned ``save_mesh``
:221-243) + the time-axis occupancy grid of dnerf/renderer.py:74,286.

Reuses the full checkpoint/resume/eval-cadence/mp4 machinery of
train.trainer.Trainer via its subclass hooks.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from focnerf_tpu.models.dnerf import DNeRFConfig, dnerf_density, init_dnerf_params
from focnerf_tpu.render.dnerf_renderer import (
    init_time_occupancy,
    render_image_dnerf,
    time_occupancy_bitfield,
    update_time_occupancy,
)
from focnerf_tpu.train.dnerf_steps import (
    make_dnerf_train_step,
    make_dnerf_train_step_occupancy,
)
from focnerf_tpu.train.state import TrainState, create_train_state
from focnerf_tpu.train.trainer import Trainer


class DNeRFTrainer(Trainer):
    def __init__(self, *args, time_slots: int = 64, **kw):
        self.time_slots = time_slots
        super().__init__(*args, **kw)

    # ---------------------------------------------------------------- hooks
    def _create_state(self, seed: int) -> TrainState:
        params = init_dnerf_params(jax.random.key(seed), self.cfg)
        return create_train_state(jax.random.key(seed), self.cfg, self.optimizer, params=params)

    def _init_occupancy(self):
        return init_time_occupancy(self.cfg.bound, time_slots=self.time_slots)

    def _build_steps(self, *, ema_decay: float, color_space: str):
        if self.use_occupancy:
            self._train_step_occ = make_dnerf_train_step_occupancy(
                self.cfg,
                self.optimizer,
                dt_gamma=self.dt_gamma,
                max_steps=self.max_steps,
                slab=self.train_slab,
                min_near=self.min_near,
                ema_decay=ema_decay,
                skip_field=self.skip_march,
            )
        self._train_step = make_dnerf_train_step(
            self.cfg,
            self.optimizer,
            num_steps=self.num_steps,
            min_near=self.min_near,
            ema_decay=ema_decay,
        )
        self._eval_step = None  # eval goes through _render_view

    def _mark_untrained(self, train_dataset):
        # camera coverage is time-independent; the per-slot grids all start
        # at zero and the frustum test of the static path (ops/occupancy.py)
        # would need a [T] broadcast — the reference likewise skips
        # mark_untrained for dnerf (dnerf/renderer.py has no override).
        return

    def _occ_bits_for_batch(self, batch):
        bits = time_occupancy_bitfield(
            self.occupancy, batch["time"], self.density_thresh
        )
        if self.skip_march:
            if not hasattr(self, "_skip_field_jit"):
                from focnerf_tpu.ops.occupancy import occupancy_skip_field

                self._skip_field_jit = jax.jit(occupancy_skip_field)
            bits = self._skip_field_jit(bits)
        return bits

    def _maybe_update_occupancy(self):
        if self.occupancy is None:
            return
        if self.global_step % self.update_extra_interval != 0:
            return
        if not hasattr(self, "_occ_update_jit"):
            cfg = self.cfg

            @jax.jit
            def _upd(occ, params, slot, rng):
                dens = lambda x, t: dnerf_density(params, cfg, x, t)[0]
                return update_time_occupancy(
                    occ, dens, rng, bound=cfg.bound, time_slot=slot,
                    density_scale=cfg.density_scale,
                )

            self._occ_update_jit = _upd
        # rotate the refreshed slot (one slot per update keeps the cost
        # equal to a static-grid refresh; every slot is hit every
        # time_slots * update_extra_interval steps)
        slot = jnp.int32(
            (self.global_step // self.update_extra_interval) % self.time_slots
        )
        self.occupancy = self._occ_update_jit(
            self.occupancy, self.state.params, slot, self._next_rng()
        )

    def _render_view(self, params, view, dataset, render_kwargs):
        kw = dict(render_kwargs)
        if self.occupancy is not None:
            kw["occ_bits"] = time_occupancy_bitfield(
                self.occupancy, view["time"], self.density_thresh
            )
            kw.setdefault("dt_gamma", self.dt_gamma)
            kw.setdefault("max_steps", self.max_steps)
            kw.setdefault("slab", max(self.train_slab, 64))
        return render_image_dnerf(
            params,
            self.cfg,
            jnp.asarray(view["pose"]),
            dataset.intrinsics,
            dataset.H,
            dataset.W,
            view["time"],
            bg_color=1.0,
            **kw,
        )

    def _render_kwargs(self) -> dict:
        # occupancy bits are per-view (time-dependent) — added in _render_view
        return dict(
            num_steps=self.num_steps,
            max_ray_batch=self.max_ray_batch,
            min_near=self.min_near,
        )

    def _mesh_density(self, params, t: float = 0.0):
        cfg = self.cfg
        tt = jnp.asarray(t, jnp.float32)
        return lambda x: dnerf_density(params, cfg, x, tt)[0]

    def save_mesh(
        self,
        resolution: int = 256,
        threshold: float = 10.0,
        path: Optional[str] = None,
        t: float = 0.0,
    ):
        """Time-conditioned mesh export (ref dnerf/utils.py:221-243)."""
        from focnerf_tpu.utils.mesh_extract import extract_mesh, save_obj

        dens = self._mesh_density(self.state.ema_params, t=t)
        verts, faces = extract_mesh(
            dens, bound=self.cfg.bound, resolution=resolution, threshold=threshold
        )
        if path is None:
            os.makedirs(os.path.join(self.workspace, "meshes"), exist_ok=True)
            path = os.path.join(
                self.workspace, "meshes", f"{self.name}_{self.epoch}_t{t:.2f}.obj"
            )
        save_obj(path, verts, faces)
        self.log(f"[mesh t={t:.2f}] saved {path} ({len(verts)} verts)")
        return path
