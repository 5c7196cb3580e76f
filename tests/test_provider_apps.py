"""Dataset provider + CLI app tests on a synthetic on-disk scene."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from helpers import make_synthetic_scene

from focnerf_tpu.data.provider import DatasetOptions, NeRFDataset


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    return make_synthetic_scene(root)


def _opts(scene, **kw):
    kw.setdefault("scale", 1.0)
    kw.setdefault("num_rays", 64)
    return DatasetOptions(path=scene, **kw)


class TestProvider:
    def test_blender_load(self, scene):
        ds = NeRFDataset(_opts(scene), split="train")
        assert ds.mode == "blender"
        assert ds.n_views == 6
        assert ds.H == ds.W == 32
        assert ds.images.shape == (6, 32 * 32, 4)  # RGBA from disk
        np.testing.assert_allclose(
            ds.intrinsics[:2], [1.2 * 32, 1.2 * 32], rtol=1e-5
        )

    def test_poses_roundtrip_through_ngp_conversion(self, scene):
        """Poses written by the helper must land back on ngp convention."""
        ds = NeRFDataset(_opts(scene), split="train")
        for p in ds.poses:
            R = p[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            # camera on the r=2.5 orbit looking at origin
            np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 2.5, rtol=1e-4)
            fwd = R[:, 2]
            cos = fwd @ (-p[:3, 3] / np.linalg.norm(p[:3, 3]))
            assert cos > 0.999

    def test_train_batch_shapes(self, scene):
        ds = NeRFDataset(_opts(scene), split="train")
        b = ds.train_batch(jax.random.key(0))
        assert b["rays_o"].shape == (64, 3)
        assert b["rays_d"].shape == (64, 3)
        assert b["pixels"].shape == (64, 4)
        assert float(jnp.abs(b["rays_o"][0]).max()) > 0

    def test_batch_pixels_match_image(self, scene):
        """GT gather must align with sampled ray indices."""
        from focnerf_tpu.core.rays import get_rays

        ds = NeRFDataset(_opts(scene), split="train")
        b = ds.train_batch(jax.random.key(1), view=2)
        full = get_rays(ds.poses_dev[2], ds.intrinsics, ds.H, ds.W)
        # reconstruct indices by matching ray directions
        d0 = np.asarray(b["rays_d"][0])
        alld = np.asarray(full["rays_d"])
        idx = np.argmin(np.linalg.norm(alld - d0, axis=-1))
        want = np.asarray(ds.images[2][idx])
        np.testing.assert_allclose(np.asarray(b["pixels"][0]), want, atol=1e-6)

    def test_masked_dataset(self, scene):
        masks = np.zeros((6, 32, 32), bool)
        masks[:, 8:24, 8:24] = True
        feats = np.random.default_rng(0).normal(size=(6, 144)).astype(np.float32)
        ds = NeRFDataset(
            _opts(scene), split="train",
            mask_details={"masks": masks, "feats": feats},
        )
        assert ds.obj_feats.shape == (6, 144)
        b = ds.train_batch(jax.random.key(0), view=0)
        assert "ray_mask" in b and "obj_feat" in b
        np.testing.assert_allclose(np.asarray(b["obj_feat"]), feats[0], rtol=1e-6)
        # alpha channel equals mask
        img = np.asarray(ds.images[0]).reshape(32, 32, 4)
        np.testing.assert_array_equal(img[..., 3] > 0.5, masks[0])

    def test_eval_view(self, scene):
        ds = NeRFDataset(_opts(scene), split="val")
        v = ds.eval_view(0)
        assert v["rays_o"].shape == (32 * 32, 3)
        assert v["pixels"].shape == (32 * 32, 4)

    def test_colmap_mode(self, scene, tmp_path):
        # colmap layout: single transforms.json; reference split is
        # frames[:1] val / frames[1:] train after file_path sort
        with open(os.path.join(scene, "transforms_train.json")) as f:
            t = json.load(f)
        root = str(tmp_path / "colmap")
        os.makedirs(root)
        os.symlink(os.path.join(scene, "train"), os.path.join(root, "train"))
        with open(os.path.join(root, "transforms.json"), "w") as f:
            json.dump(t, f)
        tr = NeRFDataset(DatasetOptions(path=root, scale=1.0), split="train")
        va = NeRFDataset(DatasetOptions(path=root, scale=1.0), split="val")
        assert tr.mode == "colmap"
        assert tr.n_views == 5 and va.n_views == 1  # 6 frames -> 5/1 split
        te = NeRFDataset(DatasetOptions(path=root, scale=1.0), split="test", n_test=4)
        assert te.n_views == 5  # slerp path n_test+1
        assert te.images is None

    def test_sidecar_path_alignment_colmap(self, scene, tmp_path):
        """Masks/feats must pair with the right images even when the provider
        sorts frames and applies the colmap train split (the sidecar records
        per-row paths; positional pairing would silently corrupt training)."""
        with open(os.path.join(scene, "transforms_train.json")) as f:
            t = json.load(f)
        # adversarial frame order: reverse of the provider's file_path sort
        t["frames"] = sorted(t["frames"], key=lambda d: d["file_path"], reverse=True)
        root = str(tmp_path / "colmap_align")
        os.makedirs(root)
        os.symlink(os.path.join(scene, "train"), os.path.join(root, "train"))
        with open(os.path.join(root, "transforms.json"), "w") as f:
            json.dump(t, f)

        # sidecar rows in the raw (reversed) json order, feats keyed by index
        raw_paths = [fr["file_path"] + ".png" for fr in t["frames"]]
        n = len(raw_paths)
        feats = np.arange(n, dtype=np.float32)[:, None] * np.ones((n, 144), np.float32)
        masks = np.ones((n, 32, 32), bool)
        md = {"masks": masks, "feats": feats, "paths": np.array(raw_paths)}

        ds = NeRFDataset(DatasetOptions(path=root, scale=1.0), split="train", mask_details=md)
        feat_of_path = {p: feats[i][0] for i, p in enumerate(raw_paths)}
        for v in range(ds.n_views):
            rel = os.path.relpath(ds.paths[v], root)
            assert ds.obj_feats[v][0] == feat_of_path[rel], (
                f"view {v} ({rel}) got feats of another frame"
            )

    def test_legacy_sidecar_without_paths_refused(self, scene, tmp_path):
        """A round-1 sidecar npz (no per-row 'paths') must be refused at
        load: the provider's frame sorting + split selection silently
        misalign positional rows (ADVICE round 1, high)."""
        import pytest

        from focnerf_tpu.data.yolo_sidecar import load_sidecar

        root = str(tmp_path / "legacy")
        os.makedirs(os.path.join(root, "yolo"))
        np.savez(
            os.path.join(root, "yolo", "train.npz"),
            masks=np.ones((2, 8, 8), bool),
            feats=np.zeros((2, 144), np.float32),
        )
        with pytest.raises(ValueError, match="paths"):
            load_sidecar(root, "train")
        assert load_sidecar(root, "val") is None  # absent file still -> None

    def test_dnerf_times(self, scene):
        from focnerf_tpu.data.dnerf_provider import DNeRFDataset

        ds = DNeRFDataset(_opts(scene), split="train")
        assert ds.times.shape == (6,)
        assert ds.times.min() == 0.0 and ds.times.max() == 1.0
        b = ds.train_batch(jax.random.key(0), view=3)
        assert float(b["time"]) == pytest.approx(ds.times[3])


@pytest.mark.slow
class TestMainNerfCLI:
    def test_end_to_end_train_and_test(self, scene, tmp_path):
        """Full CLI flow with disable_yolo: background object, tiny budget."""
        from focnerf_tpu.apps.main_nerf import main

        ws = str(tmp_path / "ws")
        argv = [
            scene, "--workspace", ws, "--iters", "12", "--num_steps", "24",
            "--disable_yolo", "--scale", "1.0", "--num_rays", "64",
            "--bound", "1.0", "--max_ray_batch", "256",
        ]
        main(argv)
        # trained workspace with checkpoint + logs exists
        obj_ws = f"{ws}_background"
        assert os.path.isdir(os.path.join(obj_ws, "checkpoints"))
        assert os.path.exists(os.path.join(ws, "train_times.txt"))
        assert os.path.exists(os.path.join(ws, "obj_feats", "background.npz"))
        # test mode renders from the checkpoint; --save_gt also writes the
        # ground-truth next to each render (ref main_nerf.py --save_gt);
        # --tcnn is accepted as a no-op compatibility flag
        main(argv + ["--test", "--save_gt", "--tcnn"])
        results = os.listdir(os.path.join(obj_ws, "results"))
        assert any(r.endswith(".png") for r in results)
        assert any(r.endswith("_gt.png") for r in results)

    def test_resume_trains_remaining_iters_only(self, scene, tmp_path):
        """--ckpt latest resumes at the checkpoint step and trains only the
        REMAINING iters (round-4 relay-wedge recovery: the old code re-ran
        ceil(iters/epoch) full epochs past the target), continuing the
        epoch numbering so eval/ckpt cadences line up."""
        from focnerf_tpu.apps.main_nerf import main
        from focnerf_tpu.train.checkpoints import CheckpointManager

        ws = str(tmp_path / "ws")
        # scene has 6 train views -> steps_per_epoch=6; epoch-aligned iters
        # keep the step counts exact (partial epochs round up by design)
        argv = [
            scene, "--workspace", ws, "--iters", "12", "--num_steps", "24",
            "--disable_yolo", "--scale", "1.0", "--num_rays", "64",
            "--bound", "1.0", "--max_ray_batch", "256",
        ]
        main(argv)
        ck = os.path.join(f"{ws}_background", "checkpoints")
        mgr = CheckpointManager(ck)
        assert mgr.latest_step() == 12
        mgr.close()
        # same target: nothing left to train — step must stay at 12
        main(argv)
        mgr = CheckpointManager(ck)
        assert mgr.latest_step() == 12
        mgr.close()
        # raised target: trains exactly the one remaining epoch
        main([a if a != "12" else "18" for a in argv])
        mgr = CheckpointManager(ck)
        assert mgr.latest_step() == 18
        mgr.close()


class TestConfig:
    def test_O_macro(self):
        from focnerf_tpu.config import parse_options

        opt = parse_options(["scene", "-O"])
        assert opt.fp16 and opt.cuda_ray and opt.preload

    def test_O2_macro(self):
        from focnerf_tpu.config import parse_options

        opt = parse_options(["scene", "-O2"])
        # O2 implies everything -O sets...
        assert opt.fp16 and opt.cuda_ray and opt.preload
        assert opt.stochastic_min_size == 1 and opt.skip_march
        # ...plus the round-5 quality-gated throughput levers
        assert opt.grad_level_phases == 2
        assert opt.c2f == "0.3:8,0.6:12"
        # explicit user flags win over the tier defaults
        opt = parse_options(["scene", "-O2", "--grad_level_phases", "4",
                             "--c2f", "0.5:8"])
        assert opt.grad_level_phases == 4
        assert opt.c2f == "0.5:8"
        # shrunken grids keep the 16-level default schedule OFF
        opt = parse_options(["scene", "-O2", "--grid_levels", "8"])
        assert opt.c2f == ""
        # -O alone stays exactly the reference-parity fast preset
        opt = parse_options(["scene", "-O"])
        assert opt.grad_level_phases == 0 and opt.c2f == ""

    def test_defaults_match_reference(self):
        from focnerf_tpu.config import parse_options

        opt = parse_options(["scene"])
        assert opt.iters == 30000
        assert opt.num_rays == 4096
        assert opt.max_steps == 1024
        assert opt.num_steps == 512
        assert opt.bound == 2.0
        assert opt.scale == 0.33
        assert opt.dt_gamma == pytest.approx(1 / 128)
        assert opt.density_thresh == 10.0

    def test_objects_of_interest(self):
        from focnerf_tpu.config import parse_options

        opt = parse_options(["scene", "--objects_of_interest", "book", "cup"])
        assert opt.objects_of_interest == ["book", "cup"]

    def test_bound_inf(self):
        from focnerf_tpu.config import parse_options

        opt = parse_options(["scene", "--bound_inf", "-1", "-1", "-1", "1", "1", "1"])
        assert opt.bound_inf == (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)


@pytest.mark.slow
class TestVoxelCLI:
    def test_voxel_train_and_view(self, scene, tmp_path):
        """main_voxel trains a dense field, saves the baked cache, and the
        viewer serves a voxel-only workspace (no network checkpoint)."""
        import numpy as np

        from focnerf_tpu.apps.main_voxel import main as voxel_main
        from focnerf_tpu.apps.viewer_app import _view_only
        from focnerf_tpu.config import parse_options

        ws = str(tmp_path / "vxws")
        voxel_main([
            scene, "--workspace", ws, "--iters", "40", "--bake_res", "16",
            "--scale", "1.0", "--bound", "1.0",
        ])
        assert os.path.exists(os.path.join(ws, "baked_16_sh0.npz"))
        # mesh export of the trained dense field (ref main_nerf.py:298)
        mesh = os.path.join(ws, "mesh.obj")
        assert os.path.exists(mesh) and os.path.getsize(mesh) > 0
        opt = parse_options([
            scene, "--workspace", ws, "--baked", "--bake_res", "16",
            "--scale", "1.0", "--bound", "1.0",
        ])
        render_fn, _ = _view_only(opt)
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 2.5
        img = render_fn(pose, (38.4, 38.4, 16.0, 16.0), 32, 32, 0.0)
        assert img.shape == (32, 32, 3) and np.isfinite(img).all()

    def test_voxel_dynamic_cli(self, scene, tmp_path):
        """--voxel_dynamic trains the time-factorized dense family over the
        dnerf provider's per-frame times and saves the dynamic field."""
        from focnerf_tpu.apps.main_voxel import main as voxel_main
        from focnerf_tpu.train.voxel_dynamic import load_dyn_field

        ws = str(tmp_path / "dvxws")
        voxel_main([
            scene, "--workspace", ws, "--iters", "30", "--bake_res", "16",
            "--voxel_dynamic", "--voxel_rank", "2", "--voxel_time_slots", "4",
            "--scale", "1.0", "--bound", "1.0",
        ])
        path = os.path.join(ws, "dynvoxel_16_sh0.npz")
        assert os.path.exists(path)
        # time-bracket meshes (ref dnerf/utils.py:221-243)
        assert os.path.exists(os.path.join(ws, "mesh_t0.00.obj"))
        assert os.path.exists(os.path.join(ws, "mesh_t1.00.obj"))
        field, bound, sh = load_dyn_field(path)
        assert field.deltas.shape[0] == 2 and field.wslots.shape == (4, 2)

    def test_voxel_workspace_composes(self, scene, tmp_path):
        """Voxel-trained workspaces (no network checkpoint) are first-class
        composition citizens under --baked: combined discovers the
        `<prefix>_<obj>` dir by its baked_*.npz, loads the trained volume
        directly, and renders/edits it like any checkpointed object."""
        import numpy as np

        from focnerf_tpu.apps import combined, editable
        from focnerf_tpu.apps.main_voxel import main as voxel_main

        root = str(tmp_path / "objs")
        os.makedirs(root, exist_ok=True)
        voxel_main([
            scene, "--workspace", os.path.join(root, "ws_background"),
            "--iters", "40", "--bake_res", "16",
            "--scale", "1.0", "--bound", "1.0",
        ])
        comb_ws = str(tmp_path / "comb")
        combined.main([
            scene, "--ckpt_dir", root, "--workspace", comb_ws, "--baked",
            "--bake_res", "16", "--scale", "1.0", "--bound", "1.0",
        ])
        out = os.path.join(comb_ws, "rgbs_w", "0000.png")
        assert os.path.exists(out) and os.path.getsize(out) > 0
        assert os.path.exists(os.path.join(comb_ws, "log.txt"))

        # the per-sample path has no network to march -> clear refusal
        with pytest.raises(SystemExit, match="baked"):
            combined.main([
                scene, "--ckpt_dir", root,
                "--workspace", str(tmp_path / "comb2"),
                "--bake_res", "16", "--scale", "1.0", "--bound", "1.0",
            ])

        # editing translates the voxel object through the same flow
        edit_ws = str(tmp_path / "edit")
        editable.main([
            scene, "--ckpt_dir", root, "--workspace", edit_ws, "--baked",
            "--bake_res", "16", "--edit_object", "background",
            "--offset_x", "0.25", "--scale", "1.0", "--bound", "1.0",
        ])
        assert os.path.exists(os.path.join(edit_ws, "rgbs_w", "0000.png"))

    def test_mixed_ckpt_and_voxel_composition(self, scene, tmp_path):
        """A checkpointed object and a voxel-trained object merge in ONE
        --baked composition (exercises the ckpt-stack reindexing when
        volume objects are interleaved)."""
        from focnerf_tpu.apps import combined
        from focnerf_tpu.apps.main_nerf import main as nerf_main
        from focnerf_tpu.apps.main_voxel import main as voxel_main

        root = str(tmp_path / "objs")
        os.makedirs(root, exist_ok=True)
        # checkpointed object: 'background' via the hash-grid trainer
        nerf_main([
            scene, "--workspace", os.path.join(root, "ws"),
            "--iters", "20", "--num_steps", "16", "--disable_yolo",
            "--scale", "1.0", "--num_rays", "64", "--bound", "1.0",
            "--max_ray_batch", "128",
        ])
        # voxel object: 'sphere' (any name) trained by main_voxel
        voxel_main([
            scene, "--workspace", os.path.join(root, "ws_sphere"),
            "--iters", "30", "--bake_res", "16",
            "--scale", "1.0", "--bound", "1.0",
        ])
        comb_ws = str(tmp_path / "compmix")
        combined.main([
            scene, "--ckpt_dir", root, "--workspace", comb_ws, "--baked",
            "--bake_res", "16", "--scale", "1.0", "--bound", "1.0",
        ])
        out = os.path.join(comb_ws, "rgbs_w", "0000.png")
        assert os.path.exists(out) and os.path.getsize(out) > 0
        log = open(os.path.join(comb_ws, "log.txt")).read()
        assert "background" in log and "sphere" in log
        # the bake-vs-exact gate ran for the checkpointed object at bake
        # time (voxel objects skip it: their trained field IS the volume)
        import json as _json

        gate = os.path.join(root, "ws_background", "bake_quality.json")
        assert os.path.exists(gate)
        rep = _json.load(open(gate))
        assert np.isfinite(rep["psnr_baked_vs_exact_mean"])

    def test_voxel_kplanes_cli(self, scene, tmp_path):
        """--voxel_kplanes trains the six-plane space-time family and the
        viewer serves it with the time slider (kplanes_*.npz path)."""
        import numpy as np

        from focnerf_tpu.apps.main_voxel import main as voxel_main
        from focnerf_tpu.apps.viewer_app import _view_only
        from focnerf_tpu.config import parse_options
        from focnerf_tpu.train.voxel_kplanes import load_kplanes_field

        ws = str(tmp_path / "kpws")
        voxel_main([
            scene, "--workspace", ws, "--iters", "30", "--bake_res", "16",
            "--voxel_kplanes", "2", "--voxel_time_slots", "4",
            "--scale", "1.0", "--bound", "1.0",
        ])
        path = os.path.join(ws, "kplanes_16_sh0.npz")
        assert os.path.exists(path)
        assert os.path.exists(os.path.join(ws, "mesh_t0.00.obj"))
        field, bound, sh = load_kplanes_field(path)
        assert field.space.shape == (3, 16, 16, 2, 4)
        assert field.time.shape == (3, 16, 4, 2, 4)

        opt = parse_options([
            scene, "--workspace", ws, "--baked", "--bake_res", "16",
            "--scale", "1.0", "--bound", "1.0",
        ])
        render_fn, _ = _view_only(opt)
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 2.5
        img = render_fn(pose, (38.4, 38.4, 16.0, 16.0), 32, 32, 0.5)
        assert img.shape == (32, 32, 3) and np.isfinite(img).all()

    def test_voxel_kplanes_sp_cli(self, scene, tmp_path):
        """--voxel_kplanes --voxel_sp trains the collapse-sharded dynamic
        family over the 8-device CPU mesh end-to-end."""
        import jax

        from focnerf_tpu.apps.main_voxel import main as voxel_main
        from focnerf_tpu.train.voxel_kplanes import load_kplanes_field

        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        ws = str(tmp_path / "kpspws")
        voxel_main([
            scene, "--workspace", ws, "--iters", "24", "--bake_res", "16",
            "--voxel_kplanes", "2", "--voxel_time_slots", "4", "--voxel_sp",
            "--scale", "1.0", "--bound", "1.0",
        ])
        path = os.path.join(ws, "kplanes_16_sh0.npz")
        assert os.path.exists(path)
        field, bound, sh = load_kplanes_field(path)
        assert field.space.shape == (3, 16, 16, 2, 4)


@pytest.mark.slow
class TestOccupancyTrainerCLI:
    def test_cuda_ray_path_end_to_end(self, scene, tmp_path):
        """--cuda_ray: occupancy-grid maintenance + accelerated train steps."""
        from focnerf_tpu.apps.main_nerf import main

        ws = str(tmp_path / "occ_ws")
        main([
            scene, "--workspace", ws, "--iters", "20", "--cuda_ray",
            "--disable_yolo", "--scale", "1.0", "--num_rays", "64",
            "--bound", "1.0", "--max_ray_batch", "256",
            "--train_slab", "16", "--max_steps", "64",
            "--update_extra_interval", "8", "--num_steps", "24",
        ])
        assert os.path.isdir(os.path.join(f"{ws}_background", "checkpoints"))
        # log shows finite losses
        log = open(os.path.join(f"{ws}_background", "log_ngp.txt")).read()
        assert "loss=" in log and "nan" not in log


@pytest.mark.slow
class TestKillResume:
    def test_sigkill_mid_train_resumes_from_latest(self, scene, tmp_path):
        """Elastic recovery: a training process killed WITHOUT warning
        (SIGKILL — no atexit, no finally) must resume from the last orbax
        checkpoint on the next invocation and train to completion."""
        import signal
        import subprocess
        import time as _t

        ws = str(tmp_path / "krws")
        argv = [
            sys.executable, "-c",
            (
                "import os, sys;"
                "os.environ['JAX_PLATFORMS']='cpu';"
                "import jax; jax.config.update('jax_platforms','cpu');"
                f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r});"
                "from focnerf_tpu.apps.main_nerf import main;"
                f"main([{scene!r}, '--workspace', {ws!r}, '--iters', '200',"
                " '--num_steps', '16', '--disable_yolo', '--scale', '1.0',"
                " '--num_rays', '64', '--bound', '1.0',"
                " '--max_ray_batch', '128'])"
            ),
        ]
        env = {**os.environ}
        env.pop("XLA_FLAGS", None)
        env["PYTHONPATH"] = ":".join(
            p for p in env.get("PYTHONPATH", "").split(":")
            if p and "axon" not in p
        )
        proc = subprocess.Popen(argv, env=env, stdout=subprocess.DEVNULL,
                                stderr=subprocess.STDOUT)
        ckpt_dir = os.path.join(ws + "_background", "checkpoints")
        # wait for the first checkpoint to land, then SIGKILL mid-training
        deadline = _t.time() + 240
        found = False
        while _t.time() < deadline and proc.poll() is None:
            if os.path.isdir(ckpt_dir) and any(
                d.isdigit() for d in os.listdir(ckpt_dir)
            ):
                found = True
                break
            _t.sleep(1.0)
        assert found, "no checkpoint appeared before the deadline"
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)

        # second invocation must RESUME (not restart) and finish
        from focnerf_tpu.apps.main_nerf import main as nerf_main

        nerf_main([
            scene, "--workspace", ws, "--iters", "200", "--num_steps", "16",
            "--disable_yolo", "--scale", "1.0", "--num_rays", "64",
            "--bound", "1.0", "--max_ray_batch", "128",
        ])
        log = open(os.path.join(ws + "_background", "log_ngp.txt")).read()
        assert "resumed" in log, log[-500:]
        import re as _re

        m = _re.search(r"resumed \(latest\) from step (\d+)", log)
        assert m and int(m.group(1)) > 0, log[-500:]

    def test_editable_rotation(self, scene, tmp_path):
        """--rotate_z edits the object (a TPU-side extension — the
        reference edits by translation only). Checkpointed objects rotate
        on BOTH paths (baked volume rotation / per-sample ray rotation,
        oracle in test_compose_utils); voxel-trained objects have no
        network, so the non-baked run still refuses with the
        compose-with---baked message."""
        from focnerf_tpu.apps import editable
        from focnerf_tpu.apps.main_voxel import main as voxel_main

        root = str(tmp_path / "objs")
        os.makedirs(root, exist_ok=True)
        voxel_main([
            scene, "--workspace", os.path.join(root, "ws_background"),
            "--iters", "30", "--bake_res", "16",
            "--scale", "1.0", "--bound", "1.0",
        ])
        edit_ws = str(tmp_path / "rot")
        editable.main([
            scene, "--ckpt_dir", root, "--workspace", edit_ws, "--baked",
            "--bake_res", "16", "--edit_object", "background",
            "--rotate_z", "90", "--offset_x", "0.1",
            "--scale", "1.0", "--bound", "1.0",
        ])
        assert os.path.exists(os.path.join(edit_ws, "rgbs_w", "0000.png"))

        with pytest.raises(SystemExit, match="rotate|baked"):
            editable.main([
                scene, "--ckpt_dir", root, "--workspace",
                str(tmp_path / "rot2"), "--edit_object", "background",
                "--bake_res", "16", "--rotate_z", "45",
                "--scale", "1.0", "--bound", "1.0",
            ])
