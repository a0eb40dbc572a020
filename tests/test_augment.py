"""TPU-native RandAugment / RandomErasing: per-op semantics vs PIL, policy
plumbing, temporal consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.data import rand_augment as RA
from gava_clip_tpu.data.random_erasing import (RandomErasingConfig,
                                               erase_clip,
                                               random_erasing_batch)


def _clip(T=2, H=16, W=16, seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(T, H, W, 3).astype(np.float32))


def _pil_roundtrip(fn, img01, *args):
    from PIL import Image
    u8 = (np.asarray(img01) * 255).astype(np.uint8)
    out = fn(Image.fromarray(u8), *args)
    return np.asarray(out).astype(np.float32) / 255.0


def test_invert_and_posterize_match_pil():
    from PIL import ImageOps
    clip = _clip()
    got = np.asarray(RA.invert(clip, 0.0))
    want = np.stack([_pil_roundtrip(ImageOps.invert, clip[t]) for t in range(2)])
    np.testing.assert_allclose(got, want, atol=1 / 255 + 1e-6)

    got = np.asarray(RA.posterize(clip, 3))
    want = np.stack([_pil_roundtrip(lambda im: ImageOps.posterize(im, 3), clip[t])
                     for t in range(2)])
    np.testing.assert_allclose(got, want, atol=1 / 255 + 1e-6)


def test_solarize_matches_pil():
    from PIL import ImageOps
    clip = _clip(seed=1)
    got = np.asarray(RA.solarize(clip, 128))
    want = np.stack([_pil_roundtrip(lambda im: ImageOps.solarize(im, 128), clip[t])
                     for t in range(2)])
    np.testing.assert_allclose(got, want, atol=2 / 255)


def test_autocontrast_and_equalize_match_pil_on_static_clip():
    from PIL import ImageOps
    frame = _clip(T=1, seed=2)[0]
    clip = frame[None]  # T=1: clip-pooled histogram == PIL per-frame
    got = np.asarray(RA.auto_contrast(clip, 0.0))[0]
    want = _pil_roundtrip(ImageOps.autocontrast, frame)
    np.testing.assert_allclose(got, want, atol=2 / 255)

    got = np.asarray(RA.equalize(clip, 0.0))[0]
    want = _pil_roundtrip(ImageOps.equalize, frame)
    np.testing.assert_allclose(got, want, atol=2 / 255)


def test_enhance_ops_identity_at_factor_one():
    clip = _clip(seed=3)
    for op in (RA.color, RA.contrast, RA.brightness, RA.sharpness):
        out = np.asarray(op(clip, 1.0))
        np.testing.assert_allclose(out, np.asarray(clip), atol=1e-5)


def test_translate_shifts_content():
    clip = _clip(seed=4)
    out = np.asarray(RA.translate_x(clip, 0.25))  # src_x = x + 4
    np.testing.assert_allclose(out[:, :, :12], np.asarray(clip)[:, :, 4:],
                               atol=1e-4)
    np.testing.assert_allclose(out[:, :, 12:], 0.5, atol=1e-5)  # gray fill


def test_rotate_identity_at_zero():
    clip = _clip(seed=5)
    out = np.asarray(RA.rotate(clip, 0.0))
    np.testing.assert_allclose(out, np.asarray(clip), atol=1e-4)


def test_parse_config_string():
    cfg = RA.parse_rand_augment_config("rand-m7-n4-mstd0.5-inc1")
    assert cfg.magnitude == 7 and cfg.num_layers == 4
    assert cfg.mag_std == 0.5 and cfg.increasing


def test_rand_augment_batch_jits_and_is_deterministic():
    clips = jnp.stack([_clip(seed=6)[0:2], _clip(seed=7)[0:2]])
    key = jax.random.PRNGKey(0)
    f = jax.jit(lambda k, c: RA.rand_augment_batch(k, c, "rand-m7-n2-mstd0.5"))
    a = np.asarray(f(key, clips))
    b = np.asarray(f(key, clips))
    np.testing.assert_array_equal(a, b)
    assert a.shape == clips.shape
    assert np.isfinite(a).all() and a.min() >= 0 and a.max() <= 1
    # different key -> different augmentation (with high probability)
    c = np.asarray(f(jax.random.PRNGKey(1), clips))
    assert not np.allclose(a, c)


def test_random_erasing_cube_consistency():
    clip = jnp.ones((4, 16, 16, 3))
    cfg = RandomErasingConfig(probability=1.0, cube=True)
    out = np.asarray(erase_clip(jax.random.PRNGKey(0), clip, cfg))
    erased = out != 1.0
    assert erased.any()
    # same box and fill in every frame (cube mode)
    for t in range(1, 4):
        np.testing.assert_array_equal(erased[t], erased[0])
        np.testing.assert_array_equal(out[t], out[0])


def test_random_erasing_probability_zero():
    clip = jnp.ones((2, 8, 8, 3))
    cfg = RandomErasingConfig(probability=0.0)
    out = np.asarray(random_erasing_batch(jax.random.PRNGKey(0), clip[None], cfg))
    np.testing.assert_array_equal(out[0], np.asarray(clip))
