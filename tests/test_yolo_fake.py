"""run_yolo_on_frames against a fake ultralytics (VERDICT r2 item 7).

The real-YOLO sidecar path (data/yolo_sidecar.py::run_yolo_on_frames — the
port of /root/reference/nerf/utils.py:364-477 + nerf/provider.py:234-337)
cannot run in CI (no ultralytics weights in the image). This fixture
emulates the exact slice of the ultralytics Results API the sidecar
consumes — ``YOLO(name).predict(img)[0]`` with ``.names`` (id->str dict),
``.boxes.cls``/``.boxes.xyxy`` tensors, ``.masks.data`` half-resolution
float mask tensors, and the torch backbone hook
``model.model(x)[1][0][2] -> [1, 144, 20, 20]`` — so the mask OR-merge,
background complement, bbox extraction, and 20x20 masked feature pooling
execute and are checked numerically without weights.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from focnerf_tpu.data import yolo_sidecar


H = W = 64  # image size; instance masks come in at 32x32 to force resize


class _FakeBoxes:
    def __init__(self, cls_ids, xyxy):
        self.cls = torch.tensor(cls_ids, dtype=torch.float32)
        self.xyxy = torch.tensor(np.asarray(xyxy, np.float32))


class _FakeMasks:
    def __init__(self, data):
        self.data = torch.tensor(np.asarray(data, np.float32))


class _FakeResult:
    names = {0: "cup", 1: "book"}

    def __init__(self, cls_ids, xyxy, masks):
        if cls_ids:
            self.boxes = _FakeBoxes(cls_ids, xyxy)
            self.masks = _FakeMasks(masks)
        else:  # no detections: ultralytics gives empty boxes, masks=None
            self.boxes = _FakeBoxes([], np.zeros((0, 4)))
            self.masks = None


def _half_mask(x0, x1, y0, y1):
    """32x32 box mask (half the image resolution)."""
    m = np.zeros((32, 32), np.float32)
    m[y0:y1, x0:x1] = 1.0
    return m


def _make_results():
    # frame 0: two 'cup' instances (OR-merge!) + one 'book'
    f0 = _FakeResult(
        [0, 0, 1],
        [[0, 0, 16, 16], [8, 8, 31, 31], [40, 40, 60, 60]],
        [_half_mask(0, 8, 0, 8), _half_mask(4, 12, 4, 12), _half_mask(20, 30, 20, 30)],
    )
    # frame 1: one 'book'
    f1 = _FakeResult([1], [[2, 2, 30, 30]], [_half_mask(1, 15, 1, 15)])
    # frame 2: nothing detected
    f2 = _FakeResult([], [], [])
    return [f0, f1, f2]


class _FakeTorchModel:
    """Backbone hook: deterministic [1, 144, 20, 20] features from the input."""

    def __call__(self, x):  # x: [1, 3, 640, 640]
        pooled = torch.nn.functional.adaptive_avg_pool2d(x, (20, 20))  # [1,3,20,20]
        f = pooled.repeat(1, 48, 1, 1)  # [1, 144, 20, 20]
        # make channels distinguishable so pooling errors can't cancel
        scale = torch.arange(1, 145, dtype=torch.float32).view(1, 144, 1, 1)
        return (None, [[None, None, f * scale]])


def _install_fake_ultralytics(monkeypatch, results):
    it = iter(results)

    class _FakeYOLO:
        def __init__(self, model_name):
            self.model = _FakeTorchModel()

        def predict(self, img, conf=0.25, verbose=False):
            return [next(it)]

    mod = types.ModuleType("ultralytics")
    mod.YOLO = _FakeYOLO
    monkeypatch.setitem(sys.modules, "ultralytics", mod)


def _write_frames(tmp_path, n=3):
    import imageio.v2 as imageio

    paths = []
    rng = np.random.default_rng(0)
    for v in range(n):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        p = os.path.join(tmp_path, f"r_{v}.png")
        imageio.imwrite(p, img)
        paths.append(p)
    return paths


class TestRunYoloOnFrames:
    def test_masks_merge_boxes_feats(self, tmp_path, monkeypatch):
        _install_fake_ultralytics(monkeypatch, _make_results())
        paths = _write_frames(str(tmp_path))
        out = yolo_sidecar.run_yolo_on_frames(paths, "fake.pt")

        assert out["names"] == ["book", "cup", "background"]
        cup, book, bg = out["cup__masks"], out["book__masks"], out["background__masks"]
        assert cup.shape == (3, H, W) and cup.dtype == bool

        # frame 0 cup = OR of both instances, nearest-upsampled 32->64
        exp0 = np.kron(
            (_half_mask(0, 8, 0, 8) + _half_mask(4, 12, 4, 12)) > 0,
            np.ones((2, 2), bool),
        )
        np.testing.assert_array_equal(cup[0], exp0)
        assert not cup[1].any() and not cup[2].any()

        # background = complement of the union of all object masks
        np.testing.assert_array_equal(bg[0], ~(cup[0] | book[0]))
        assert bg[2].all()  # nothing detected in frame 2

        # bbox of a single-instance class; -1 sentinel where undetected
        np.testing.assert_allclose(out["book__bboxes"][1], [2, 2, 30, 30])
        np.testing.assert_allclose(out["cup__bboxes"][1], [-1, -1, -1, -1])
        np.testing.assert_allclose(out["book__bboxes"][2], [-1, -1, -1, -1])

        # feature pooling: masked 20x20 mean where detected, zeros where not,
        # global mean for background — recomputed independently here
        import cv2
        import torch as _t

        feats = out["cup__feats"]
        assert feats.shape == (3, 144) and feats.dtype == np.float32
        img0 = cv2.imread(paths[0])
        x = _t.from_numpy(
            cv2.resize(img0, (640, 640)).astype(np.float32) / 255.0
        ).permute(2, 0, 1)[None]
        f = _FakeTorchModel()(x)[1][0][2][0].numpy()  # [144, 20, 20]
        m20 = cv2.resize(cup[0].astype(np.uint8), (20, 20)) > 0
        np.testing.assert_allclose(feats[0], f[:, m20].mean(-1), rtol=1e-5)
        np.testing.assert_allclose(feats[2], np.zeros(144))
        np.testing.assert_allclose(
            out["background__feats"][0], f.mean((-2, -1)), rtol=1e-5
        )

    def test_preprocess_scene_e2e_and_provider_load(self, tmp_path, monkeypatch):
        """Full sidecar flow with the fake: preprocess -> npz -> load_sidecar."""
        _install_fake_ultralytics(monkeypatch, _make_results())
        scene = str(tmp_path)
        paths = _write_frames(scene)
        frames = [
            {"file_path": os.path.basename(p), "transform_matrix": np.eye(4).tolist()}
            for p in paths
        ]
        with open(os.path.join(scene, "transforms_train.json"), "w") as fh:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, fh)

        yolo_sidecar.preprocess_scene(scene, splits=("train",), model_name="fake.pt")
        side = yolo_sidecar.load_sidecar(scene, "train")
        assert side is not None
        assert sorted(side["names"].tolist()) == ["background", "book", "cup"]
        assert side["cup__masks"].shape == (3, H, W)
        assert side["paths"].shape == (3,)
        # path-keyed alignment survives the roundtrip
        assert [os.path.basename(p) for p in side["paths"]] == [
            os.path.basename(p) for p in paths
        ]
