"""Training orchestration: epochs, eval, occupancy maintenance, checkpoints.

Functional-core/imperative-shell rebuild of the reference ``Trainer``
(nerf/utils.py:660-1557). The hot path is one jitted ``train_step``; this
class only owns the loop, logging, metric meters, checkpoint policy and the
occupancy-grid maintenance cadence (update every ``update_extra_interval``
steps, ref nerf/utils.py:1216-1219 + renderer.py:419-507).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from focnerf_tpu.models.nerf import NeRFConfig, density_fn
from focnerf_tpu.ops.occupancy import (
    OccupancyState,
    init_occupancy,
    mark_untrained_grid,
    occupancy_bitfield,
    update_occupancy,
)
from focnerf_tpu.render.renderer import render_image
from focnerf_tpu.train.checkpoints import BestCheckpoint, CheckpointManager
from focnerf_tpu.train.meters import LPIPSMeter, PSNRMeter, SSIMMeter
from focnerf_tpu.train.state import TrainState, create_train_state, make_optimizer
from focnerf_tpu.train.steps import (
    make_eval_step,
    make_train_step,
    make_train_step_occupancy,
    update_error_map,
)


@jax.jit
def _error_map_step(error_map, view, inds_coarse, per_ray_error):
    """Per-step error-map EMA as ONE dispatch with a device view index
    (ref nerf/utils.py:893-899 error_map update). Keeping this fused and
    sync-free matters on the tunneled chip: every host round-trip in the
    step loop costs ~an RTT (PERF.md round-4 dispatch note)."""
    em = update_error_map(error_map[view], inds_coarse, per_ray_error)
    return error_map.at[view].set(em)


class Trainer:
    def __init__(
        self,
        name: str,
        cfg: NeRFConfig,
        workspace: str = "workspace",
        *,
        lr: float = 1e-2,
        lr_net=None,  # >0/non-None: per-group LR for non-grid params
        lr_warmup: int = 0,  # linear LR ramp steps (0 = reference behavior)
        alpha_loss: float = 0.0,  # direct alpha-supervision weight (RGBA GT)
        grad_clip: float = 0.0,  # global grad-norm clip (0 = off)
        grad_level_phases: int = 0,  # >1: alternating level-subset backward
        c2f: str = "",  # coarse-to-fine stage list "frac:levels,..." — see below
        iters: int = 30000,
        num_steps: int = 512,
        max_ray_batch: int = 4096,
        use_occupancy: bool = False,
        dt_gamma: float = 1 / 128,
        max_steps: int = 1024,
        train_slab: int = 128,
        upsample_steps: int = 0,
        density_thresh: float = 10.0,
        update_extra_interval: int = 16,
        ema_decay: float = 0.95,
        min_near: float = 0.2,
        color_space: str = "srgb",
        tv_weight: float = 0.0,
        bucket_slabs: bool = False,
        skip_march: bool = False,
        eval_interval: int = 50,
        steps_per_dispatch: int = 1,  # >1: fuse K steps into ONE device dispatch
        ckpt_interval: int = 1,  # epochs between rolling checkpoint saves
        eval_save_images: bool = True,
        eval_renderer: str = "oneshot",
        max_keep_ckpt: int = 2,
        use_checkpoint: str = "latest",
        seed: int = 0,
        use_tensorboard: bool = True,
        rand_pose: int = -1,
        clip_text: str = "",
        clip_loss_fn=None,
    ):
        self.name = name
        self.cfg = cfg
        self.workspace = workspace
        self.iters = iters
        self.num_steps = num_steps
        self.upsample_steps = upsample_steps
        self.max_ray_batch = max_ray_batch
        self.use_occupancy = use_occupancy
        self.dt_gamma = dt_gamma
        self.max_steps = max_steps
        self.train_slab = train_slab
        # bucketed slab schedule (the reference's mean_count-sized CUDA
        # allocation, nerf/renderer.py:483-495, recast for static shapes):
        # precompiled steps at power-of-two slabs; each occupancy-update tick
        # re-picks the smallest bucket covering the measured mean samples/ray.
        # Starts at the widest bucket so early (pre-pruning) steps never
        # truncate — plain slab-16 training collapses quality (PERF.md).
        self.bucket_slabs = bucket_slabs
        # sphere-trace marcher over the precomputed skip field instead of the
        # dense candidate-ladder probe (ops/marching.py::march_rays_skip)
        self.skip_march = skip_march
        self._occ_cache = None  # (bits-or-skip) rebuilt per occupancy update
        self._slab_buckets = sorted(
            {min(1 << i, train_slab) for i in range(4, 11) if (1 << i) <= train_slab}
            | {train_slab}
        )
        self.active_slab = train_slab
        self._mean_samples_ema = float(train_slab)
        self.density_thresh = density_thresh
        self.update_extra_interval = update_extra_interval
        self.min_near = min_near
        self.tv_weight = tv_weight
        self.eval_interval = eval_interval
        # fused multi-step dispatch (train/fused.py): lax.scan K optimizer
        # steps + on-device batch assembly + error-map EMA into one compiled
        # program. On the tunneled chip one dispatch costs ~one RTT (~100 ms,
        # PERF.md round-4), so K=16 cuts the dispatch tax ~16x. Bit-identical
        # PRNG chain to the per-step loop (tests/test_fused_steps.py).
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))
        self._fused_cache: dict = {}
        self._fused_assemble = None
        self._fused_assemble_ds = None
        # rolling-checkpoint cadence in epochs. The reference saves every
        # epoch (nerf/utils.py train: save_checkpoint per epoch) — over the
        # tunneled chip that d2h of the full train state measured ~84 s per
        # 59 s epoch at the production parity config, i.e. >half the wall.
        # The final epoch always saves regardless.
        self.ckpt_interval = max(1, int(ckpt_interval))
        # intermediate-eval PNG dumps are pure observability; on the
        # tunneled chip each one costs a ~58 s d2h, so headless runs
        # (tools/parity.py) turn them off and keep only the final eval's
        self.eval_save_images = eval_save_images
        # "iter": compacted-worklist full-image renders (render/iterative.py,
        # the reference's rays_alive inference loop) — needs the skip field,
        # so it applies only when use_occupancy is on
        self.eval_renderer = eval_renderer
        self.epoch = 0
        # step of the most recent evaluate() — lets callers skip a redundant
        # post-train eval when the cadence eval already ran at the final
        # step (a full 800^2/50-view eval costs ~20 min on the tunneled
        # chip; the r5 exact ladder paid it twice)
        self.last_eval_step = -1
        self.global_step = 0
        # CLIP-guided rand-pose branch (ref nerf/utils.py:796-838):
        # rand_pose == 0 -> every step is a GT-free random-pose step;
        # rand_pose > 0 -> one rand-pose step per (rand_pose+1) steps.
        # The differentiable loss comes from clip_loss_fn (tests inject a
        # stand-in) or make_jax_clip_loss(clip_text) — which is None when
        # CLIP weights are not in the local HF cache (no egress here).
        self.rand_pose = rand_pose
        self._clip_text = clip_text
        self._clip_loss = clip_loss_fn
        self._clip_step_fn = None
        self._clip_warned = False
        self._np_rng = np.random.default_rng(seed + 1)

        os.makedirs(workspace, exist_ok=True)
        self.log_path = os.path.join(workspace, f"log_{name}.txt")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(workspace, "run", name))
            except Exception:
                self._tb = None

        self.rng = jax.random.key(seed)
        self.alpha_loss = alpha_loss
        self.grad_level_phases = max(0, grad_level_phases)
        if self.grad_level_phases > 1 and not use_occupancy:
            # the non-occupancy per-step path compiles one unphased step in
            # _build_steps; silently phase-splitting only the fused path
            # would break the fused==sequential bit-compat contract
            raise ValueError(
                "grad_level_phases > 1 requires the occupancy path (the "
                "phased step cache lives in _occ_step); drop gradphase or "
                "pass use_occupancy=True / --cuda_ray"
            )
        # coarse-to-fine level schedule: "0.3:8,0.6:12" trains the first 8
        # hash levels until 30% of iters, 12 until 60%, all afterwards
        # (boundaries <= 1 are fractions of iters, > 1 absolute steps). One
        # compiled step per stage (cfg.active_levels is static); encode
        # fwd+bwd cost is ~linear in level count at stochastic K=1, so the
        # early stages run ~2x. Eval/occupancy updates always use the full
        # cfg. Throughput lever + the BARF/Nerfies anti-overfit schedule.
        self._c2f_stages: list = []
        for part in filter(None, (p.strip() for p in c2f.split(","))):
            b, lv = part.split(":")
            bf = float(b)
            end = int(round(bf * iters)) if bf <= 1.0 else int(bf)
            self._c2f_stages.append((end, int(lv)))
        self._c2f_stages.sort()
        if self._c2f_stages:
            if not use_occupancy:
                raise ValueError(
                    "c2f schedule requires the occupancy path (its per-stage "
                    "step cache lives in _occ_step); drop c2f or pass "
                    "use_occupancy=True / --cuda_ray"
                )
            bad = [lv for _, lv in self._c2f_stages if not 0 < lv <= cfg.num_levels]
            if bad:
                raise ValueError(
                    f"c2f levels {bad} outside [1, {cfg.num_levels}]"
                )
        self.optimizer = make_optimizer(
            lr=lr, iters=iters, lr_net=lr_net, warmup=lr_warmup,
            grad_clip=grad_clip,
        )
        self.state: TrainState = self._create_state(seed)
        self.occupancy = self._init_occupancy() if use_occupancy else None
        self._build_steps(ema_decay=ema_decay, color_space=color_space)

        self.metrics = [PSNRMeter(), SSIMMeter(), LPIPSMeter()]
        ckpt_dir = os.path.join(workspace, "checkpoints")
        self.ckpt = CheckpointManager(ckpt_dir, max_keep=max_keep_ckpt)
        from focnerf_tpu.train.checkpoints import save_model_config

        save_model_config(ckpt_dir, cfg)
        # best-PSNR checkpoint (nerf/utils.py:1434-1493): saved by evaluate()
        # whenever eval PSNR improves, stored without the occupancy grid
        self.best = BestCheckpoint(os.path.join(workspace, "best"))
        self.best_psnr = self.best.metric() if self.best.metric() is not None else -np.inf

        # modes: scratch | latest | latest_model | best | <explicit path>
        # (ref nerf/utils.py:775-793)
        if use_checkpoint in ("latest", "latest_model"):
            restored = self.ckpt.restore(self.state, self.occupancy)
            if restored is not None:
                state, occ, _ = restored
                if use_checkpoint == "latest":
                    self.state = state
                    # adopt the saved grid only in occupancy mode (a grid-less
                    # trainer has no occupancy step function to feed it to)
                    if occ is not None and self.occupancy is not None:
                        self.occupancy = occ
                    self.global_step = int(self.state.step)
                else:  # model weights only, fresh optimizer/step (ref :784-787)
                    self.state = self.state._replace(
                        params=state.params, ema_params=state.ema_params
                    )
                self.log(f"[INFO] resumed ({use_checkpoint}) from step {int(state.step)}")
        elif use_checkpoint == "best":
            restored = self.best.restore(self.state)
            if restored is not None:
                self.state = restored
                self.global_step = int(self.state.step)
                self.log(
                    f"[INFO] resumed best checkpoint (psnr={self.best_psnr:.2f}, "
                    f"step {self.global_step})"
                )
            else:
                self.log("[WARN] no best checkpoint found; starting from scratch")
        elif use_checkpoint in ("scratch", ""):
            pass
        elif os.sep in use_checkpoint or os.path.isdir(use_checkpoint):
            mgr = CheckpointManager(use_checkpoint)
            restored = mgr.restore(self.state, self.occupancy)
            if restored is not None:
                self.state, occ, _ = restored
                if occ is not None and self.occupancy is not None:
                    self.occupancy = occ
                self.global_step = int(self.state.step)
        else:
            raise ValueError(
                f"unknown checkpoint mode {use_checkpoint!r}; expected "
                "scratch | latest | latest_model | best | <path>"
            )

    # ------------------------------------------------------------ subclass hooks
    # (the D-NeRF trainer reuses the whole loop/eval/checkpoint shell by
    # overriding these — the reference subclasses its Trainer the same way,
    # dnerf/utils.py:1-243)
    def _create_state(self, seed: int) -> TrainState:
        return create_train_state(jax.random.key(seed), self.cfg, self.optimizer)

    def _init_occupancy(self):
        return init_occupancy(self.cfg.bound)

    def _build_steps(self, *, ema_decay: float, color_space: str):
        self._ema_decay = ema_decay
        self._color_space = color_space
        self._supports_fused = True  # subclasses with bespoke steps opt out
        if self.use_occupancy:
            self._occ_step_cache = {}
            self._train_step_occ = self._occ_step(self.train_slab)
        self._train_step = make_train_step(
            self.cfg,
            self.optimizer,
            num_steps=self.num_steps,
            upsample_steps=self.upsample_steps,
            min_near=self.min_near,
            ema_decay=ema_decay,
            color_space=color_space,
            tv_weight=self.tv_weight,
            alpha_weight=self.alpha_loss,
            donate=False,
        )
        self._eval_step = make_eval_step(
            self.cfg, num_steps=self.num_steps, min_near=self.min_near
        )

    def _phase_cfg(self):
        """cfg for this step's backward phase and c2f stage.

        grad_level_phases > 1 round-robins the hash-table backward over
        level subsets; a c2f schedule truncates the encode to the stage's
        active level count. Both are static in the compiled step — the
        returned key distinguishes cache entries. Forward (phases) and
        every eval path stay exact; see ops/hashgrid.py."""
        import dataclasses as _dc

        cfg = self.cfg
        active = 0
        for end, lv in self._c2f_stages:
            if self.global_step < end:
                active = lv
                break
        if active:
            cfg = _dc.replace(cfg, active_levels=active)
        P = self.grad_level_phases
        if P <= 1:
            return cfg, (0, active)
        phase = self.global_step % P
        # subset over the ACTIVE levels only — inactive fine levels get no
        # gradient anyway, and phase-splitting them would waste a phase
        n_lv = active or cfg.num_levels
        lv = tuple(l for l in range(n_lv) if l % P == phase)
        return _dc.replace(cfg, grad_levels=lv), (phase, active)

    def _occ_step(self, slab: int):
        """Occupancy train step compiled for this slab bucket (lazy).

        Subclasses that build their own single occupancy step (the D-NeRF
        trainer) don't populate the cache and fall back to it."""
        cache = getattr(self, "_occ_step_cache", None)
        if cache is None:
            return self._train_step_occ
        cfg, phase = self._phase_cfg()
        key = (slab, phase)
        if key not in cache:
            cache[key] = make_train_step_occupancy(
                cfg,
                self.optimizer,
                dt_gamma=self.dt_gamma,
                max_steps=self.max_steps,
                slab=slab,
                min_near=self.min_near,
                ema_decay=self._ema_decay,
                color_space=self._color_space,
                tv_weight=self.tv_weight,
                alpha_weight=self.alpha_loss,
                donate=False,
                skip_field=self.skip_march,
            )
        return cache[key]

    def _mark_untrained(self, train_dataset):
        self.occupancy = mark_untrained_grid(
            self.occupancy,
            jnp.asarray(train_dataset.poses),
            train_dataset.intrinsics,
            bound=self.cfg.bound,
        )

    def _render_view(self, params, view, dataset, render_kwargs):
        """Render one eval/test view -> (img [H,W,3], depth [H,W])."""
        if (
            self.eval_renderer in ("iter", "iter_dev")
            and self.occupancy is not None
        ):
            from focnerf_tpu.render.iterative import render_image_iterative

            kw = render_kwargs
            occ_skip = kw.get("occ_skip")
            if occ_skip is None:
                from focnerf_tpu.ops.occupancy import occupancy_skip_field

                occ_skip = occupancy_skip_field(kw["occ_bits"])
            return render_image_iterative(
                params,
                self.cfg,
                jnp.asarray(view["pose"]),
                dataset.intrinsics,
                dataset.H,
                dataset.W,
                occ_skip=occ_skip,
                dt_gamma=kw.get("dt_gamma", 0.0),
                max_steps=kw.get("max_steps", 1024),
                min_near=kw.get("min_near", 0.2),
                obj_feat=view.get("obj_feat"),
                bg_color=1.0,
                # "iter_dev": the whole worklist drain is ONE dispatch
                # (sweep + on-device while_loop) — no per-round host sync
                device_loop=(self.eval_renderer == "iter_dev"),
            )
        return render_image(
            params,
            self.cfg,
            jnp.asarray(view["pose"]),
            dataset.intrinsics,
            dataset.H,
            dataset.W,
            obj_feat=view.get("obj_feat"),
            bg_color=1.0,
            **render_kwargs,
        )

    # ------------------------------------------------------------------ logging
    def log(self, msg: str):
        print(msg)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    # ------------------------------------------------------------------ train
    def _next_rng(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    def _maybe_update_occupancy(self):
        if self.occupancy is None:
            return
        if self.global_step % self.update_extra_interval != 0:
            return
        if not hasattr(self, "_occ_update_jit"):
            cfg = self.cfg

            @jax.jit
            def _upd(occ, params, rng):
                dens = lambda x: density_fn(params, cfg, x)[0]
                return update_occupancy(
                    occ, dens, rng, bound=cfg.bound, density_scale=cfg.density_scale
                )

            self._occ_update_jit = _upd
        self.occupancy = self._occ_update_jit(
            self.occupancy, self.state.params, self._next_rng()
        )
        self._occ_cache = None  # bitfield/skip field must be rebuilt
        self._maybe_repick_slab()

    def _maybe_repick_slab(self):
        """Re-pick the slab bucket from the measured mean samples/ray (EMA).

        Shrinking only begins once the grid has had a few update rounds
        (global_step >= 256) — truncating before pruning matures is exactly
        the slab-16 quality collapse documented in PERF.md."""
        if not (self.bucket_slabs and self.use_occupancy):
            return
        m = getattr(self, "_last_mean_samples", None)
        if m is None:
            return
        self._mean_samples_ema = 0.8 * self._mean_samples_ema + 0.2 * float(m)
        if self.global_step < 256:
            return
        want = 1.25 * self._mean_samples_ema
        new = next((b for b in self._slab_buckets if b >= want), self.train_slab)
        if new != self.active_slab:
            self.log(
                f"[slab] mean samples/ray {self._mean_samples_ema:.1f} -> "
                f"bucket {self.active_slab} => {new}"
            )
            self.active_slab = new

    def _maybe_clip_step(self, train_dataset) -> Optional[float]:
        """Run a CLIP rand-pose step when scheduled; returns its loss or None."""
        if self.rand_pose < 0:
            return None
        if self.rand_pose > 0 and (
            self.global_step % (self.rand_pose + 1) != self.rand_pose
        ):
            return None
        if self._clip_loss is None:
            from focnerf_tpu.train.clip_guidance import make_jax_clip_loss

            if self._clip_text:
                self._clip_loss = make_jax_clip_loss(self._clip_text)
            if self._clip_loss is None:
                if not self._clip_warned:
                    self.log(
                        "[WARN] rand_pose >= 0 but no CLIP loss available "
                        "(weights not cached / no clip_text); skipping the "
                        "rand-pose branch"
                    )
                    self._clip_warned = True
                self.rand_pose = -1
                return None
        batch = train_dataset.rand_pose_batch(self._next_rng(), self._np_rng)
        if self._clip_step_fn is None:
            from focnerf_tpu.train.steps import make_clip_step

            self._clip_step_fn = make_clip_step(
                self.cfg, self.optimizer, self._clip_loss,
                H=int(batch["H"]), W=int(batch["W"]),
                num_steps=min(self.num_steps, 128), min_near=self.min_near,
                ema_decay=self._ema_decay,
            )
        self.state, metrics = self._clip_step_fn(
            self.state, batch["rays_o"], batch["rays_d"], self._next_rng()
        )
        self.global_step += 1
        return float(metrics["loss"])

    def train_step_once(self, train_dataset) -> float:
        """One training step, returning the (synced) loss — the unit of the
        GUI's train-while-viewing bursts (ref Trainer.train_gui,
        nerf/utils.py:1082-1141)."""
        clip_loss = self._maybe_clip_step(train_dataset)
        if clip_loss is not None:
            return clip_loss
        self._maybe_update_occupancy()
        k_batch, k = jax.random.split(self._next_rng())
        batch = train_dataset.train_batch(k_batch)
        if self.occupancy is not None:
            bits = self._occ_bits_for_batch(batch)
            self.state, metrics = self._occ_step(self.active_slab)(
                self.state, batch, bits, k
            )
            self._last_mean_samples = metrics.get("mean_samples")
        else:
            self.state, metrics = self._train_step(self.state, batch, k)
        self.global_step += 1
        return float(metrics["loss"])

    def _occ_bits_for_batch(self, batch):
        if self._occ_cache is None:
            bits = occupancy_bitfield(self.occupancy, self.density_thresh)
            if self.skip_march:
                if not hasattr(self, "_skip_field_jit"):
                    from focnerf_tpu.ops.occupancy import occupancy_skip_field

                    self._skip_field_jit = jax.jit(occupancy_skip_field)
                bits = self._skip_field_jit(bits)
            self._occ_cache = bits
        return self._occ_cache

    # ------------------------------------------------------------ fused chunks
    def _cfg_phase_list(self):
        """Per-substep cfgs for the current c2f stage: length P when
        grad_level_phases is on (phase i trains level subset i), else [cfg].
        Mirrors _phase_cfg but enumerates ALL phases — the fused chunk
        unrolls one sub-step per phase (train/fused.py)."""
        import dataclasses as _dc

        cfg = self.cfg
        active = 0
        for end, lv in self._c2f_stages:
            if self.global_step < end:
                active = lv
                break
        if active:
            cfg = _dc.replace(cfg, active_levels=active)
        P = self.grad_level_phases
        if P <= 1:
            return [cfg], (1, active)
        n_lv = active or cfg.num_levels
        cfgs = [
            _dc.replace(
                cfg, grad_levels=tuple(l for l in range(n_lv) if l % P == phase)
            )
            for phase in range(P)
        ]
        return cfgs, (P, active)

    def _fused_steps_possible(self, train_dataset, remaining: int) -> int:
        """How many steps the next dispatch may fuse (1 = per-step path).

        Fusing is only used when a full steps_per_dispatch chunk fits —
        bounded by the epoch remainder, the next occupancy-update tick
        (grid maintenance stays at chunk boundaries, preserving the
        sequential cadence), the next c2f stage boundary, and gradphase
        alignment — so the compile cache holds exactly one chunk per
        (slab, stage) instead of one per odd-sized tail."""
        K = self.steps_per_dispatch
        if (
            K <= 1
            or not getattr(self, "_supports_fused", False)
            or self.rand_pose >= 0
            or getattr(train_dataset, "images", None) is None
        ):
            return 1
        gs = self.global_step
        cap = remaining
        if self.occupancy is not None:
            # a due occupancy update must never fall strictly inside the
            # chunk — the NEXT tick after gs is at the next multiple of iv
            # (the tick at gs itself already fired before this chunk)
            iv = self.update_extra_interval
            next_due = ((gs // iv) + 1) * iv if gs % iv else gs + iv
            cap = min(cap, next_due - gs)
        for end, _lv in self._c2f_stages:
            if gs < end:
                cap = min(cap, end - gs)
                break
        # step DOWN through power-of-two sizes so epoch remainders and
        # tick-misaligned starts still fuse — the compile cache stays
        # bounded at {K} ∪ {powers of two < K} per (slab, stage)
        P = max(1, self.grad_level_phases)
        for n in sorted({K} | {1 << i for i in range(K.bit_length())},
                        reverse=True):
            if n <= 1:
                break
            if n <= cap and n % P == 0 and (P == 1 or gs % P == 0):
                return n
        return 1

    def _fused_chunk_fn(self, train_dataset, K: int):
        cfgs, (P, active) = self._cfg_phase_list()
        has_em = train_dataset.error_map is not None
        # key on dataset identity too: the assembler bakes in the dataset's
        # intrinsics/poses, so a second train() with a different dataset must
        # not silently reuse the previous dataset's compiled chunk
        key = (K, self.active_slab if self.use_occupancy else -1, P, active,
               has_em, train_dataset.masks_dev is not None,
               train_dataset.obj_feats_dev is not None, id(train_dataset))
        fn = self._fused_cache.get(key)
        if fn is not None:
            return fn
        if self._fused_assemble is None or self._fused_assemble_ds != id(train_dataset):
            self._fused_assemble = train_dataset.assemble_fn()
            self._fused_assemble_ds = id(train_dataset)
        if self.use_occupancy:
            raws = [
                make_train_step_occupancy(
                    cfg,
                    self.optimizer,
                    dt_gamma=self.dt_gamma,
                    max_steps=self.max_steps,
                    slab=self.active_slab,
                    min_near=self.min_near,
                    ema_decay=self._ema_decay,
                    color_space=self._color_space,
                    tv_weight=self.tv_weight,
                    alpha_weight=self.alpha_loss,
                    donate=False,
                    skip_field=self.skip_march,
                ).raw
                for cfg in cfgs
            ]
        else:
            raws = [
                make_train_step(
                    cfg,
                    self.optimizer,
                    num_steps=self.num_steps,
                    upsample_steps=self.upsample_steps,
                    min_near=self.min_near,
                    ema_decay=self._ema_decay,
                    color_space=self._color_space,
                    tv_weight=self.tv_weight,
                    alpha_weight=self.alpha_loss,
                    donate=False,
                ).raw
                for cfg in cfgs
            ]
        from focnerf_tpu.train.fused import make_fused_chunk

        fn = make_fused_chunk(
            raws,
            self._fused_assemble,
            train_dataset.n_views,
            K=K,
            use_occupancy=self.use_occupancy,
            has_error_map=has_em,
            # params/ema_params alias one buffer at init (and whenever a
            # checkpoint restores them equal) — donating the state would
            # donate that buffer twice. Matches the per-step path.
            donate=False,
        )
        self._fused_cache[key] = fn
        return fn

    def _run_fused_chunk(self, train_dataset, K: int):
        """Dispatch one fused K-step chunk; returns the per-step losses [K]."""
        bits = self._occ_bits_for_batch(None) if self.occupancy is not None else None
        fn = self._fused_chunk_fn(train_dataset, K)
        state, em, rng, losses, msamples = fn(
            self.state, train_dataset.error_map, self.rng, bits,
            *train_dataset.fused_batch_inputs(),
        )
        self.state = state
        self.rng = rng
        if train_dataset.error_map is not None:
            train_dataset.error_map = em
        if self.occupancy is not None:
            # the per-step loop stores only the LAST step's mean_samples;
            # match that cadence exactly so _maybe_repick_slab's EMA (and
            # hence the slab-bucket trajectory) is identical in both paths
            self._last_mean_samples = msamples[-1]
        self.global_step += K
        return losses

    def train(self, train_dataset, valid_dataset=None, max_epochs: int = 1, steps_per_epoch: Optional[int] = None):
        if steps_per_epoch is None:
            steps_per_epoch = train_dataset.n_views
        if self.epoch == 0 and self.global_step > 0 and steps_per_epoch > 0:
            # resumed from a checkpoint: continue the epoch numbering so
            # eval/ckpt cadences line up with the pre-crash run (orbax
            # restores step, not epoch)
            self.epoch = self.global_step // steps_per_epoch
        if self.occupancy is not None:
            self._mark_untrained(train_dataset)
        for _ep in range(max_epochs):
            self.epoch += 1
            t0 = time.time()
            losses = []
            done = 0
            while done < steps_per_epoch:
                self._maybe_update_occupancy()
                n = self._fused_steps_possible(train_dataset, steps_per_epoch - done)
                if n > 1:
                    # one device dispatch for n steps (train/fused.py):
                    # batch assembly, optimizer steps and the error-map EMA
                    # all ride a single lax.scan program
                    losses.append(self._run_fused_chunk(train_dataset, n))
                    done += n
                    continue
                # distinct subkeys: pixel sampling and the train step's random
                # background must not share a stream
                k_batch, k = jax.random.split(self._next_rng())
                batch = train_dataset.train_batch(k_batch)
                if self.occupancy is not None:
                    bits = self._occ_bits_for_batch(batch)
                    self.state, metrics = self._occ_step(self.active_slab)(
                        self.state, batch, bits, k
                    )
                    self._last_mean_samples = metrics.get("mean_samples")
                else:
                    self.state, metrics = self._train_step(self.state, batch, k)
                self.global_step += 1
                done += 1
                losses.append(metrics["loss"])
                if train_dataset.error_map is not None and "inds_coarse" in batch:
                    # one fused dispatch (gather + EMA + scatter); view stays
                    # a device scalar — no host sync in the step loop
                    train_dataset.error_map = _error_map_step(
                        train_dataset.error_map, batch["view"],
                        batch["inds_coarse"], metrics["per_ray_error"],
                    )
            mean_loss = float(
                jnp.mean(jnp.concatenate([jnp.atleast_1d(l) for l in losses]))
            )
            self.log(
                f"[epoch {self.epoch}] loss={mean_loss:.6f} "
                f"steps={self.global_step} time={time.time()-t0:.1f}s"
            )
            if self._tb is not None:
                self._tb.add_scalar("train/loss", mean_loss, self.global_step)
            if valid_dataset is not None and self.epoch % self.eval_interval == 0:
                self.evaluate(valid_dataset, save_images=self.eval_save_images)
            if self.epoch % self.ckpt_interval == 0 or _ep == max_epochs - 1:
                self.save_checkpoint()

    # ------------------------------------------------------------------ eval
    def _render_kwargs(self) -> dict:
        """Shared render_image kwargs; routes through the occupancy-accelerated
        path whenever the model trains with the grid (the reference renders
        eval/test/GUI through run_cuda when --cuda_ray, renderer.py:318-354)."""
        kw = dict(
            num_steps=self.num_steps,
            upsample_steps=self.upsample_steps,
            max_ray_batch=self.max_ray_batch,
            min_near=self.min_near,
        )
        if self.occupancy is not None:
            bits = occupancy_bitfield(self.occupancy, self.density_thresh)
            kw.update(
                occ_bits=bits,
                dt_gamma=self.dt_gamma,
                max_steps=self.max_steps,
                slab=max(self.train_slab, 64),
            )
            if self.skip_march:
                from focnerf_tpu.ops.occupancy import occupancy_skip_field

                kw["occ_skip"] = occupancy_skip_field(bits)
        return kw

    def evaluate(self, dataset, name: str = "val", save_images=None, use_ema: bool = True):
        # default to the configured cadence behavior: callers that forget
        # save_images must not override --no-eval_save_images (round-5
        # forensics: the post-train eval d2h'd 50 800^2 PNGs at ~90 s/view
        # through the tunneled chip and tripped the wedge guard)
        if save_images is None:
            save_images = self.eval_save_images
        params = self.state.ema_params if use_ema else self.state.params
        for m in self.metrics:
            m.clear()
        out_dir = os.path.join(self.workspace, "validation")
        os.makedirs(out_dir, exist_ok=True)
        render_kwargs = self._render_kwargs()
        for v in range(dataset.n_views):
            view = dataset.eval_view(v)
            img, depth = self._render_view(params, view, dataset, render_kwargs)
            if "pixels" in view:
                # metrics stay ON DEVICE (meters are jnp-native): each
                # update fetches one scalar, never the 7.7 MB image — on
                # the tunneled chip a full-image d2h costs ~58 s/view
                # (PERF.md), which dominated eval wall clock
                gt = jnp.asarray(view["pixels"]).reshape(dataset.H, dataset.W, -1)
                if gt.shape[-1] == 4:
                    gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
                # metrics are defined on display-range images: raw renders
                # can exceed [0, 1] (weights_sum fp error, floaters against
                # the bg fold), and SSIM's variance terms blow past 1.0 on
                # out-of-range inputs (round-4 parity logged SSIM 1.33; the
                # saved PNG scored 0.83). Clamp exactly like _save_image.
                pred = jnp.clip(img, 0.0, 1.0)
                for m in self.metrics:
                    m.update(pred, gt)
            if save_images:
                self._save_image(
                    os.path.join(out_dir, f"{self.name}_{name}_{self.epoch:04d}_{v:04d}.png"),
                    np.asarray(img),
                )
        report = " | ".join(m.report() for m in self.metrics)
        self.log(f"[eval epoch {self.epoch}] {report}")
        if self._tb is not None:
            for m in self.metrics:
                self._tb.add_scalar(f"eval/{m.name}", m.measure(), self.global_step)
        results = {m.name: m.measure() for m in self.metrics}
        self.last_eval_step = self.global_step
        psnr_meter = next((m for m in self.metrics if m.name == "PSNR"), None)
        # only update best when real GT views were measured (vals non-empty)
        psnr = results["PSNR"] if (psnr_meter is not None and psnr_meter.vals) else None
        if psnr is not None and np.isfinite(psnr) and psnr > self.best_psnr:
            self.best_psnr = float(psnr)
            self.best.save(self.state, self.best_psnr)
            self.log(f"[INFO] new best checkpoint (PSNR {self.best_psnr:.2f})")
        return results

    def test(
        self,
        dataset,
        write_video: bool = True,
        use_ema: bool = True,
        save_gt: bool = False,
    ):
        """Render the test split; optionally write an mp4 (utils.py:1072-1076).

        ``save_gt`` also writes the ground-truth image next to each render
        when the split carries pixels (ref main_nerf.py --save_gt)."""
        params = self.state.ema_params if use_ema else self.state.params
        out_dir = os.path.join(self.workspace, "results")
        os.makedirs(out_dir, exist_ok=True)
        render_kwargs = self._render_kwargs()
        frames = []
        for v in range(dataset.n_views):
            view = dataset.eval_view(v)
            img, depth = self._render_view(params, view, dataset, render_kwargs)
            arr = np.asarray(img)
            frames.append((np.clip(arr, 0, 1) * 255).astype(np.uint8))
            self._save_image(os.path.join(out_dir, f"{self.name}_{v:04d}.png"), arr)
            self._save_image(
                os.path.join(out_dir, f"{self.name}_{v:04d}_depth.png"), np.asarray(depth)
            )
            if save_gt and "pixels" in view:
                gt = np.asarray(view["pixels"]).reshape(dataset.H, dataset.W, -1)
                if gt.shape[-1] == 4:
                    gt = gt[..., :3] * gt[..., 3:] + (1.0 - gt[..., 3:])
                self._save_image(
                    os.path.join(out_dir, f"{self.name}_{v:04d}_gt.png"), gt
                )
        if write_video and len(frames) > 1:
            from focnerf_tpu.utils.video import write_video as _wv

            _wv(os.path.join(out_dir, f"{self.name}.mp4"), frames, fps=25)
        return frames

    @staticmethod
    def _save_image(path: str, arr: np.ndarray):
        import imageio.v2 as imageio

        if arr.ndim == 2:
            arr = arr / max(float(arr.max()), 1e-6)
            arr = np.repeat(arr[..., None], 3, -1)
        imageio.imwrite(path, (np.clip(arr, 0, 1) * 255).astype(np.uint8))

    # ------------------------------------------------------------------ ckpt/mesh
    def save_checkpoint(self):
        self.ckpt.save(self.state, self.occupancy)

    def save_mesh(self, resolution: int = 256, threshold: float = 10.0, path: Optional[str] = None):
        """Extract a density iso-surface mesh (utils.py:971-992, 512-542)."""
        from focnerf_tpu.utils.mesh_extract import extract_mesh, save_obj

        params = self.state.ema_params
        dens = self._mesh_density(params)
        verts, faces = extract_mesh(
            dens, bound=self.cfg.bound, resolution=resolution, threshold=threshold
        )
        if path is None:
            os.makedirs(os.path.join(self.workspace, "meshes"), exist_ok=True)
            path = os.path.join(self.workspace, "meshes", f"{self.name}_{self.epoch}.obj")
        save_obj(path, verts, faces)
        self.log(f"[mesh] saved {path} ({len(verts)} verts, {len(faces)} faces)")
        return path

    def _mesh_density(self, params):
        return lambda x: density_fn(params, self.cfg, x)[0]
