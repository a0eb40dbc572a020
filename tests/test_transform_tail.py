"""Golden tests for the dead-in-reference transform surface tail
(VERDICT r2 #6): short-side scale jitter, standalone horizontal flip, and the
per-frame shifted random resized crop — each compared against the reference
video_dataset/transform.py functions run side-by-side."""

import sys
import types

import numpy as np
import pytest

from gava_clip_tpu.data import video as V


@pytest.fixture(scope="module")
def ref_transform():
    """Import reference video_dataset.transform with torchvision stubbed."""
    if "av" not in sys.modules:
        sys.modules["av"] = types.ModuleType("av")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__path__ = []
        tvt = types.ModuleType("torchvision.transforms")
        tvt.__path__ = []
        tvt.ToPILImage = tvt.ToTensor = tvt.Compose = object
        tvf = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tvt
        tvt.functional = tvf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib
    return importlib.import_module("video_dataset.transform")


def _to_ref(frames):
    """(T, H, W, C) numpy -> (T, C, H, W) torch float."""
    import torch
    return torch.from_numpy(np.ascontiguousarray(
        frames.transpose(0, 3, 1, 2))).float()


def test_short_side_scale_jitter_golden(ref_transform):
    rs = np.random.RandomState(5)
    frames = rs.rand(3, 24, 40, 3).astype(np.float32)
    for seed, inv in [(0, False), (1, False), (2, True)]:
        np.random.seed(seed)
        want, _ = ref_transform.random_short_side_scale_jitter(
            _to_ref(frames), 16, 20, inverse_uniform_sampling=inv)
        want = want.numpy().transpose(0, 2, 3, 1)
        got = V.random_short_side_scale_jitter(
            frames, 16, 20, inverse_uniform_sampling=inv,
            rng=np.random.RandomState(seed))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_short_side_scale_jitter_noop_when_matching():
    frames = np.random.RandomState(0).rand(2, 16, 30, 3).astype(np.float32)
    out = V.random_short_side_scale_jitter(frames, 16, 16)
    assert out is frames  # short side already == size


def test_horizontal_flip_golden(ref_transform):
    rs = np.random.RandomState(7)
    frames = rs.rand(2, 8, 10, 3).astype(np.float32)
    for seed in range(4):
        np.random.seed(seed)
        want, _ = ref_transform.horizontal_flip(0.5, _to_ref(frames))
        want = want.numpy().transpose(0, 2, 3, 1)
        got = V.horizontal_flip(0.5, frames, rng=np.random.RandomState(seed))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_resized_crop_with_shift_golden(ref_transform, monkeypatch):
    """Fix the two sampled boxes and compare the per-frame interpolated
    crop+resize math (reference transform.py:580-622; its input layout is
    (C, T, H, W))."""
    rs = np.random.RandomState(11)
    frames = rs.rand(5, 28, 36, 3).astype(np.float32)
    boxes = [(2, 3, 20, 24), (5, 8, 16, 20)]
    calls = iter(boxes)
    monkeypatch.setattr(ref_transform, "_get_param_spatial_crop",
                        lambda *a, **k: next(calls))
    import torch
    ref_in = torch.from_numpy(np.ascontiguousarray(
        frames.transpose(3, 0, 1, 2))).float()      # (C, T, H, W)
    want = ref_transform.random_resized_crop_with_shift(
        ref_in, 16, 16).numpy().transpose(1, 2, 3, 0)
    got = V.resized_crop_with_shift(frames, 16, boxes[0], boxes[1])
    assert got.shape == want.shape == (5, 16, 16, 3)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_random_resized_crop_with_shift_shapes():
    rs = np.random.RandomState(3)
    frames = rs.randint(0, 255, (4, 40, 50, 3), dtype=np.uint8)
    out = V.random_resized_crop_with_shift(frames, 32, rng=rs)
    assert out.shape == (4, 32, 32, 3) and out.dtype == np.uint8
