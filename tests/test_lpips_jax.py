"""Pure-JAX LPIPS loader (train/lpips_jax.py).

Real AlexNet/LPIPS weights cannot be fetched in this image (zero egress),
so these tests exercise the full activation path with random weights of
the EXACT torchvision/lpips shapes: the dump contract, loader shape
validation, metric sanity (zero at identity, positive and symmetric
otherwise), and the meter takeover (reference LPIPSMeter,
nerf/utils.py:624-658).
"""

import os

import numpy as np
import pytest

from focnerf_tpu.train.lpips_jax import (
    JaxLPIPS,
    load_weights,
    try_create,
)

_CHANNELS = [64, 192, 384, 256, 256]
_CONV_SHAPES = [
    (64, 3, 11, 11),
    (192, 64, 5, 5),
    (384, 192, 3, 3),
    (256, 384, 3, 3),
    (256, 256, 3, 3),
]


def _fake_weights(path):
    rng = np.random.default_rng(0)
    arrs = {}
    for i, shape in enumerate(_CONV_SHAPES):
        arrs[f"conv{i}_w"] = rng.normal(0, 0.05, shape).astype(np.float32)
        arrs[f"conv{i}_b"] = rng.normal(0, 0.05, shape[0]).astype(np.float32)
    for i, c in enumerate(_CHANNELS):
        # lpips lin weights are non-negative 1x1 convs
        arrs[f"lin{i}"] = np.abs(rng.normal(0, 0.05, (1, c, 1, 1))).astype(
            np.float32
        )
    np.savez(path, **arrs)
    return arrs


def test_loader_absent_and_invalid(tmp_path):
    assert load_weights(str(tmp_path / "nope.npz")) is None
    bad = tmp_path / "bad.npz"
    np.savez(bad, conv0_w=np.zeros((3, 3), np.float32))
    assert load_weights(str(bad)) is None


def test_metric_sanity(tmp_path):
    p = str(tmp_path / "lpips_alex.npz")
    _fake_weights(p)
    model = try_create(p)
    assert isinstance(model, JaxLPIPS)

    rng = np.random.default_rng(1)
    a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    b = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    assert model(a, a) == pytest.approx(0.0, abs=1e-6)
    dab = model(a, b)
    assert dab > 0
    assert model(b, a) == pytest.approx(dab, rel=1e-5)
    # a small perturbation is perceptually closer than an unrelated image
    eps = np.clip(a + 0.01 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    assert model(a, eps) < dab


def test_meter_takeover(tmp_path, monkeypatch):
    p = str(tmp_path / "lpips_alex.npz")
    _fake_weights(p)
    monkeypatch.setenv("FOCNERF_LPIPS_NPZ", p)
    from focnerf_tpu.train.meters import LPIPSMeter

    m = LPIPSMeter()
    assert m.available
    assert m.name == "LPIPS (alex, jax)"
    rng = np.random.default_rng(2)
    a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    m.update(a, a)
    assert m.measure() == pytest.approx(0.0, abs=1e-6)

    # without the env var (and no cache file) the labeled substitute stays
    monkeypatch.delenv("FOCNERF_LPIPS_NPZ")
    monkeypatch.setenv("HOME", str(tmp_path))
    m2 = LPIPSMeter()
    assert m2.name in ("LPIPS* (ms-ssim-dist)", "LPIPS (alex)")
