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
