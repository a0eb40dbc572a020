"""Native framepipe (C++ via ctypes): build, parity vs cv2, integration."""

import numpy as np
import pytest

from gava_clip_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++/libframepipe unavailable")


def test_resize_matches_cv2():
    import cv2
    rs = np.random.RandomState(0)
    frames = rs.randint(0, 255, (3, 48, 64, 3), np.uint8)
    got = native.resize_bilinear(frames, 32, 40)
    want = np.stack([cv2.resize(f, (40, 32), interpolation=cv2.INTER_LINEAR)
                     for f in frames])
    # cv2 uses fixed-point bilinear; allow +-2 quantization difference
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


def test_crop_resize_matches_cv2():
    import cv2
    rs = np.random.RandomState(1)
    frames = rs.randint(0, 255, (2, 50, 60, 3), np.uint8)
    got = native.crop_resize(frames, 5, 8, 30, 40, 24, 24)
    want = np.stack([cv2.resize(f[5:35, 8:48], (24, 24),
                                interpolation=cv2.INTER_LINEAR) for f in frames])
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


def test_center_crop_exact():
    rs = np.random.RandomState(2)
    frames = rs.randint(0, 255, (2, 40, 50, 3), np.uint8)
    got = native.center_crop(frames, 32)
    np.testing.assert_array_equal(got, frames[:, 4:36, 9:41])


def test_keep_aspect_resize_uses_native():
    from gava_clip_tpu.data.video import keep_aspect_resize
    rs = np.random.RandomState(3)
    frames = rs.randint(0, 255, (2, 48, 64, 3), np.uint8)
    a = keep_aspect_resize(frames, 32, use_native=True)
    b = keep_aspect_resize(frames, 32, use_native=False)
    assert a.shape == b.shape == (2, 32, 42, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 2
