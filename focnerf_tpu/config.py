"""Unified option set for all CLIs.

Replaces the reference's duplicated argparse blocks (flags.py:4-65 and its
drifted copy at main_nerf.py:18-77 — e.g. the --yolo_model default differed
between them; here there is exactly one definition). One dataclass, one
``add_args``/``from_args`` pair, shared by every app.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import List, Optional, Tuple


@dataclasses.dataclass
class Options:
    path: str = ""
    workspace: str = "workspace"
    seed: int = 0
    test: bool = False

    # training (flags.py:14-23)
    iters: int = 30000
    lr: float = 1e-2
    # 0 = train everything at --lr (the nerf-family reference behavior).
    # >0: grid at --lr, all networks at --lr_net (the DNERF reference's
    # per-group split, dnerf/network.py:255-264; its default is 1e-3)
    lr_net: float = 0.0
    # linear LR warmup steps (0 = reference behavior). Robustness lever:
    # cold lr=1e-2 showed seed-dependent transparent collapse in the first
    # ~250 steps of the round-4 production parity run (tools/collapse_probe.py)
    lr_warmup: int = 0
    # >0 adds mean((weights_sum - gt_alpha)^2) * alpha_loss when GT is RGBA.
    # d(alpha)/d(sigma) = T*dt stays nonzero at sigma=0, so this keeps an
    # escape gradient out of the transparent-collapse basin (train/steps.py)
    alpha_loss: float = 0.0
    # >0: clip the global gradient norm before adam. Robustness lever for
    # the saturation collapse (geo-feature blowup -> color sigmoid pins at
    # 1.0 -> irrecoverable white render; round-4 parity seed 0 diagnosis)
    grad_clip: float = 0.0
    # >1: round-robin the hash-table backward over N level subsets (one
    # compiled step per phase; forward always exact). Cuts the encode
    # backward ~Nx on the -O path (ops/hashgrid.py grad_levels)
    grad_level_phases: int = 0
    # coarse-to-fine hash-level schedule, e.g. "0.3:8,0.6:12": train the
    # first 8 levels until 30% of iters, 12 until 60%, all 16 after.
    # Encode fwd+bwd cost is ~linear in level count at stochastic K=1, so
    # coarse stages run ~2x (train/trainer.py c2f; occupancy path only)
    c2f: str = ""
    ckpt: str = "latest"
    num_rays: int = 4096
    cuda_ray: bool = False  # kept name for parity; enables occupancy marching
    max_steps: int = 1024
    num_steps: int = 512
    # >0: two-pass importance sampling on the uniform path — coarse density
    # pass -> inverse-CDF samples merged into the z grid (torch-ngp's
    # legacy upsample_steps; flows into train steps and staged eval)
    upsample_steps: int = 0
    # test mode: also save the ground-truth image next to each test render
    # (ref main_nerf.py --save_gt)
    save_gt: bool = False
    # accepted for reference-CLI compatibility, no effect here: --ff/--tcnn
    # selected CUDA MLP backends (one bf16 dot_general field serves all —
    # PARITY_MAP.md) and --post gated code that is commented out in the
    # reference itself (main_nerf.py:325-385)
    ff: bool = False
    tcnn: bool = False
    post: bool = False
    # reference main_dnerf.py:38-39 boolean variant flags; aliases for
    # --dnerf_variant basis|hyper (applied in parse_options)
    basis: bool = False
    hyper: bool = False
    update_extra_interval: int = 16
    # >1: fuse K optimizer steps into ONE device dispatch (lax.scan over
    # on-device batch assembly + step + error-map EMA, train/fused.py).
    # Amortizes the per-dispatch RTT on tunneled/remote chips ~Kx; PRNG
    # chain is bit-identical to per-step training. 16 aligns with
    # --update_extra_interval so occupancy ticks stay at chunk boundaries.
    steps_per_dispatch: int = 1
    max_ray_batch: int = 4096
    # epochs between intermediate evals (ref main_nerf.py --eval_interval)
    eval_interval: int = 50
    # epochs between rolling checkpoint saves (1 = reference behavior:
    # save_checkpoint every epoch). On the tunneled chip the full-state d2h
    # measured ~84 s vs 59 s of epoch compute at the production parity
    # config; the final epoch always saves.
    ckpt_interval: int = 1
    # --no-eval_save_images: skip intermediate-eval PNG dumps (metrics stay
    # on device; on the tunneled chip each 800^2 image d2h costs ~58 s)
    eval_save_images: bool = True
    # post-train mesh export resolution (ref main_nerf.py:298 uses 256);
    # 0 skips the export entirely (headless parity runs)
    mesh_res: int = 256
    # full-image eval renderer: "oneshot" ([N, slab] chunks), "iter"
    # (compacted alive-ray worklist, render/iterative.py — the reference's
    # rays_alive loop; needs --cuda_ray), or "iter_dev" (same worklist but
    # drained entirely on device in one dispatch — no per-round host sync).
    # Default "iter" since round 5: it is the reference-faithful inference
    # path (raymarching.cu:701-914), matches oneshot to 2e-3
    # (tests/test_iterative_render.py), and measured 3.6x faster on-chip
    # (PERF.md round-4). Falls back to oneshot when occupancy is off.
    eval_renderer: str = "iter"
    patch_size: int = 1
    train_slab: int = 128  # TPU addition: per-ray sample budget (occupancy path)
    # bucketed slab schedule: precompiled 16/32/.../train_slab occupancy
    # steps, re-picked from the measured mean samples/ray (the reference's
    # mean_count-sized allocation, nerf/renderer.py:483-495)
    bucket_slabs: bool = False
    # sphere-trace training marcher over the precomputed empty-space skip
    # field (ops/marching.py::march_rays_skip) — ~8x fewer bitfield gathers
    skip_march: bool = False

    # precision / backend (flags.py:26-29)
    fp16: bool = False  # bf16 compute on TPU

    # dataset (flags.py:31-43)
    color_space: str = "srgb"
    preload: bool = True
    bound: float = 2.0
    scale: float = 0.33
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    dt_gamma: float = 1 / 128
    min_near: float = 0.2
    density_thresh: float = 10.0
    bg_radius: float = -1.0
    downscale: int = 1

    # GUI / viewer (flags.py:45-51)
    gui: bool = False
    W: int = 1920
    H: int = 1080
    radius: float = 5.0
    fovy: float = 50.0
    max_spp: int = 64

    # experimental (flags.py:53-56)
    error_map: bool = False
    clip_text: str = ""
    rand_pose: int = -1
    # TPU additions: hash-table TV regularizer weight (gridencoder.cu:628-643;
    # 0 = off, like the reference) and the stochastic-corner training mode
    # (ops/hashgrid.py HashGridSpec.stochastic_k; 0 = exact trilinear)
    tv_weight: float = 0.0
    stochastic_corners: int = 0
    stochastic_min_size: int = 0  # also sample dense levels >= this many rows
    # opt-in int8 MXU hash-table backward (~2x one-hot matmul peak, ~0.4%
    # relative gradient noise — quality-gated in tools/quality_exp.py).
    # Off by default so the reference-parity path trains with exact grads.
    grid_int8: bool = False
    # hash-grid capacity shape: L levels x F feats/level at the SAME
    # desired_resolution (2048*bound) and feature count. The reference pins
    # 16x2 (gridencoder __init__); 8x4 halves the per-sample gather rows —
    # a round-4 throughput axis (bench.py --levels/--featdim), promotable
    # once the on-chip ladder + 3-seed quality gate pass.
    grid_levels: int = 16
    grid_featdim: int = 2

    # yolo / objects / composition (flags.py:58-64)
    yolo_model: str = "yolov8s-seg.pt"
    disable_yolo: bool = False
    legacy: bool = False
    n_chunks: int = 5  # 0 turns off obj-feat conditioning
    bound_inf: Optional[Tuple[float, ...]] = None
    edit_x: float = 0.0
    ckpt_dir: str = ""
    objects_of_interest: List[str] = dataclasses.field(default_factory=list)
    mo_density_infer: bool = False

    # editing (editable.py:76-79)
    edit_object: str = ""
    offset_x: float = 0.0
    offset_y: float = 0.0
    offset_z: float = 0.0
    # TPU addition beyond the reference (translation-only editing,
    # editable.py:443-471): rigid ROTATION of the edited object in degrees
    # about each world axis (right-handed, applied x then y then z) — the
    # baked path rotates the volume, the per-sample path rotates rays
    rotate_x: float = 0.0
    rotate_y: float = 0.0
    rotate_z: float = 0.0

    # baked real-time inference (render/baked.py): --baked routes the
    # composition/editing apps through the shear-warp renderer
    baked: bool = False
    bake_res: int = 256
    bake_sh: int = 0  # >0: view-dependent SH bake of this degree (1-4)
    # store baked_*.npz volumes uint8-quantized (1/4 the fp32 bytes; ~0.5 dB
    # gate — render/baked.py::save_volume)
    bake_quantize: bool = False
    # measure the bake's quality cost at every bake (render/bake_gate.py):
    # per-object bake-vs-exact probe PSNR -> <workspace>/bake_quality.json.
    # --no-bake_gate skips the probe renders.
    bake_gate: bool = True
    # dense voxel training (train/voxel.py): photometric loss location.
    # "intermediate" pre-warps GTs onto the shear-warp plane (~370x faster
    # backward on TPU — PERF.md); "screen" is the exact end-to-end oracle.
    voxel_supervise: str = "intermediate"
    # >1: coarse-to-fine stages (resolution doubles per stage up to
    # bake_res, Plenoxels-style; iters split evenly across stages)
    voxel_c2f: int = 1
    # main_voxel --voxel_dynamic: train the low-rank time-factorized dense
    # family (train/voxel_dynamic.py) over the dnerf provider's times
    voxel_dynamic: bool = False
    voxel_rank: int = 4  # rank K of the time factorization
    voxel_time_slots: int = 16  # time slots S of the interpolated basis
    # time-axis smoothness weight for the dynamic families (K-planes
    # time-plane / dynvoxel basis second differences); the round-4 dynamic
    # quality campaign sweeps this against per-t held-out PSNR
    voxel_time_smooth: float = 1e-3
    # main_voxel --voxel_vm K: train the TensoRF-style VM-factorized family
    # (train/voxel_vm.py, rank K planes x vectors; 0 = dense field)
    voxel_vm: int = 0
    # main_voxel --voxel_kplanes K: train the K-planes dynamic family
    # (train/voxel_kplanes.py, six rank-K space-time planes; time resolution
    # = --voxel_time_slots). Dynamic scenes at production resolution — the
    # low-rank --voxel_dynamic family stores K dense R^3 deltas instead.
    voxel_kplanes: int = 0
    # main_voxel --voxel_sp: shard the dense field/grad/adam state over all
    # local devices along the shear-warp slice axis (parallel/voxel_sp.py)
    # — the trainable resolution scales with device count instead of one
    # chip's HBM. Dense diffuse family only.
    voxel_sp: bool = False
    # with --voxel_sp: hybrid DP x SP on a 2-D (data, slice) mesh — N
    # pose-parallel rows, devices/N slice shards per row
    # (parallel/voxel_sp.py::make_voxel_dp_sp_step). 0 = pure SP.
    voxel_dp: int = 0

    # dnerf
    dnerf_variant: str = "deform"
    time_slots: int = 64
    # time at which to export the mesh (ref dnerf/utils.py:221-243 exports
    # at a caller-chosen t); None -> bracket the motion at t=0 and t=1
    mesh_t: float = None

    @property
    def use_objfeat(self) -> bool:
        return self.n_chunks > 0

    def nerf_config(self, yolo_feats_dim: int = 144):
        import jax.numpy as jnp

        from focnerf_tpu.models.nerf import NeRFConfig

        return NeRFConfig(
            bound=self.bound,
            use_objfeat=self.use_objfeat,
            yolo_feats_dim=yolo_feats_dim,
            bg_radius=self.bg_radius,
            compute_dtype=jnp.bfloat16 if self.fp16 else jnp.float32,
            stochastic_corners=self.stochastic_corners,
            stochastic_min_size=self.stochastic_min_size,
            num_levels=self.grid_levels,
            level_dim=self.grid_featdim,
        )

    def dnerf_config(self):
        import jax.numpy as jnp

        from focnerf_tpu.models.dnerf import DNeRFConfig

        return DNeRFConfig(
            bound=self.bound,
            variant=self.dnerf_variant,
            use_objfeat=False,
            bg_radius=self.bg_radius,
            compute_dtype=jnp.bfloat16 if self.fp16 else jnp.float32,
            stochastic_corners=self.stochastic_corners,
            stochastic_min_size=self.stochastic_min_size,
        )

    def dataset_options(self, split_num_rays: Optional[int] = None):
        from focnerf_tpu.data.provider import DatasetOptions

        return DatasetOptions(
            path=self.path,
            scale=self.scale,
            offset=tuple(self.offset),
            downscale=self.downscale,
            num_rays=split_num_rays or self.num_rays,
            preload_dtype="float16" if self.fp16 else "float32",
            rand_pose=self.rand_pose,
            radius=self.radius,
            error_map=self.error_map,
            patch_size=self.patch_size,
            color_space=self.color_space,
            edit_x=self.edit_x,
            # --no-preload == the reference's host-side DataLoader path:
            # uint8 stack in host RAM + native threaded sampler
            host_pipeline=not self.preload,
        )


def build_parser(edit: bool = False, dnerf: bool = False) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("path", type=str)
    p.add_argument("-O", action="store_true", help="equals --fp16 --cuda_ray --preload")
    p.add_argument("-O2", action="store_true",
                   help="-O plus the round-5 quality-gated throughput levers: "
                        "alternating level-subset backward (--grad_level_phases 2) and "
                        "the coarse-to-fine stage schedule (--c2f 0.3:8,0.6:12). "
                        "3-seed gates: within allstoch's seed spread, mean "
                        "-0.4 dB at the 800-iter gate budget (PERF.md round-5); "
                        "prefer -O when quality is the headline")
    defaults = Options()
    for f in dataclasses.fields(Options):
        if f.name == "path":
            continue
        arg = f"--{f.name}"
        if f.type == "bool" or isinstance(getattr(defaults, f.name), bool):
            # BooleanOptionalAction so True-default flags are reachable from
            # the CLI (--no-preload selects the host-side pipeline; plain
            # store_true made `not self.preload` unreachable)
            p.add_argument(
                arg,
                action=argparse.BooleanOptionalAction,
                default=getattr(defaults, f.name),
            )
        elif f.name in ("offset", "bound_inf", "objects_of_interest"):
            p.add_argument(arg, nargs="+", default=getattr(defaults, f.name))
        else:
            if f.name == "mesh_t":
                caster = float  # default is None; a bare str would leak through
            else:
                caster = type(getattr(defaults, f.name)) if getattr(defaults, f.name) is not None else str
            p.add_argument(arg, type=caster, default=getattr(defaults, f.name))
    return p


def parse_options(argv=None, **parser_kw) -> Options:
    args = build_parser(**parser_kw).parse_args(argv)
    d = vars(args)
    O_flag = d.pop("O", False)
    O2_flag = d.pop("O2", False)
    O_flag = O_flag or O2_flag
    opt = Options(**{k: v for k, v in d.items() if k in {f.name for f in dataclasses.fields(Options)}})
    if opt.offset is not None:
        opt.offset = tuple(float(x) for x in opt.offset)
    if opt.basis and opt.hyper:
        raise ValueError("--basis and --hyper are mutually exclusive")
    if opt.basis:
        opt.dnerf_variant = "basis"  # reference main_dnerf.py:38 alias
    if opt.hyper:
        opt.dnerf_variant = "hyper"  # reference main_dnerf.py:39 alias
    if opt.bound_inf is not None and not isinstance(opt.bound_inf, tuple):
        opt.bound_inf = tuple(float(x) for x in opt.bound_inf)
    if O_flag:
        opt.fp16 = True
        opt.cuda_ray = True
        opt.preload = True
        # TPU-native accelerations beyond the reference's -O (measured
        # faster AND quality-neutral-or-better on synthetic scenes; PERF.md):
        # stochastic-corner hash encode for training, bucketed slab schedule.
        # min_size=1 = uniform-K (ALL levels sample one corner): promoted
        # round 3 after the on-chip ladder (190.2k vs 171.6k rays/s) and the
        # 3-seed quality gate (allstoch within seed spread of fast; PERF.md).
        opt.stochastic_corners = 1
        opt.stochastic_min_size = 1
        opt.bucket_slabs = True
        opt.skip_march = True
    if O2_flag:
        # round-5 throughput tier: levers pass the 3-seed quality gate at
        # the seed-spread bar (allstoch sigma 0.51 dB; gp2 -0.36, c2f -0.23,
        # composed -0.42 — tools/quality_exp.py, ONCHIP_QUEUE_RESULTS r5)
        # but not the strict ~0.3 dB bar composed, so they stay OUT of -O.
        # Measured stage speeds at the reference config: gp2 241k, c2f-8
        # 315k rays/s vs the 190k -O default (PERF.md round-4/5 ladders).
        if not opt.grad_level_phases:
            opt.grad_level_phases = 2
        if not opt.c2f and opt.grid_levels >= 12:
            # default schedule assumes the reference's 16 levels; shrunken
            # grids (--grid_levels 8) keep c2f opt-in rather than erroring
            opt.c2f = "0.3:8,0.6:12"
    if opt.grid_int8:
        from focnerf_tpu.ops import hashgrid

        hashgrid.BACKWARD_INT8 = True
    return opt
