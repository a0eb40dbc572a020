"""Device preprocessing: normalize semantics, train-augment pipeline, val
float path parity with the reference order of operations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.data.device_preprocess import (CLIP_MEAN, CLIP_STD,
                                                  make_train_augment,
                                                  normalize_frames,
                                                  val_preprocess_float)


def test_normalize_uint8_matches_float_math():
    rs = np.random.RandomState(0)
    u8 = rs.randint(0, 255, (2, 2, 8, 8, 3), np.uint8)
    got = np.asarray(normalize_frames(jnp.asarray(u8), CLIP_MEAN, CLIP_STD))
    want = (u8.astype(np.float32) / 255.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_train_augment_mirror_only():
    aug = jax.jit(make_train_augment(None, mirror=True,
                                     mean=(0.5,) * 3, std=(0.5,) * 3))
    rs = np.random.RandomState(1)
    u8 = rs.randint(0, 255, (4, 2, 8, 8, 3), np.uint8)
    out = np.asarray(aug(jax.random.PRNGKey(0), jnp.asarray(u8)))
    base = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    flipped = base[:, :, :, ::-1]
    # each clip is either the original or the mirrored version
    for b in range(4):
        ok = np.allclose(out[b], base[b], atol=1e-5) or \
            np.allclose(out[b], flipped[b], atol=1e-5)
        assert ok


def test_train_augment_with_randaugment_and_erasing():
    aug = jax.jit(make_train_augment("rand-m5-n1", mirror=False,
                                     erase_prob=1.0))
    rs = np.random.RandomState(2)
    u8 = rs.randint(0, 255, (2, 2, 16, 16, 3), np.uint8)
    out = np.asarray(aug(jax.random.PRNGKey(3), jnp.asarray(u8)))
    assert out.shape == u8.shape
    assert np.isfinite(out).all()


def test_augment_order_crop_first_pinned(tmp_path):
    """Pins the documented augmentation-order deviation (data/datasets.py):
    the train dataset emits already-cropped (T, S, S, 3) uint8 clips — the
    random resized crop happens host-side BEFORE device-side RandAugment,
    unlike the reference's augment-then-crop (video_dataset/dataset.py:98-113).
    If this order ever changes, update the deviation note alongside."""
    import cv2
    from gava_clip_tpu.data.datasets import VideoDataset, VideoDatasetConfig
    w = cv2.VideoWriter(str(tmp_path / "a.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"), 30, (48, 40))
    rs = np.random.RandomState(0)
    for _ in range(12):
        w.write(rs.randint(0, 255, (40, 48, 3), np.uint8))
    w.release()
    (tmp_path / "train.csv").write_text("a.mp4,0\n")
    ds = VideoDataset(VideoDatasetConfig(
        list_path=str(tmp_path / "train.csv"), data_root=str(tmp_path),
        random_sample=True, num_frames=4, sampling_rate=-1, spatial_size=32,
        is_train=True))
    frames, label, nte = ds[0]
    # cropped to spatial_size BEFORE any augmentation — uint8, square
    assert frames.shape == (4, 32, 32, 3) and frames.dtype == np.uint8
    # and the device augment consumes exactly that cropped layout
    aug = jax.jit(make_train_augment("rand-m5-n1", mirror=True,
                                     mean=(0.45,) * 3, std=(0.225,) * 3))
    out = np.asarray(aug(jax.random.PRNGKey(0), jnp.asarray(frames[None])))
    assert out.shape == (1, 4, 32, 32, 3)


def test_val_preprocess_float_order():
    """normalize -> resize -> crop must equal resize -> crop -> normalize
    (linearity), matching the reference op order (dataset.py:117-135)."""
    rs = np.random.RandomState(3)
    frames = rs.rand(2, 20, 28, 3).astype(np.float32)
    out = np.asarray(val_preprocess_float(jnp.asarray(frames), 16,
                                          mean=(0.4,) * 3, std=(0.2,) * 3))
    assert out.shape == (2, 16, 16, 3)
    # linearity check: de-normalizing recovers the resized/cropped image
    from gava_clip_tpu.data.device_preprocess import (center_crop_jax,
                                                      keep_aspect_resize_jax)
    resized = center_crop_jax(keep_aspect_resize_jax(jnp.asarray(frames), 16), 16)
    np.testing.assert_allclose(out * 0.2 + 0.4, np.asarray(resized), atol=1e-5)
