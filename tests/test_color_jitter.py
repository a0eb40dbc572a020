"""Color-jitter family semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.data import color_jitter as CJ


def _clip(seed=0, T=2, S=16):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(T, S, S, 3).astype(np.float32))


def test_grayscale_channels_equal():
    g = np.asarray(CJ.grayscale(_clip()))
    np.testing.assert_allclose(g[..., 0], g[..., 1])
    np.testing.assert_allclose(g[..., 1], g[..., 2])


def test_jitters_identity_at_alpha_one():
    clip = _clip(1)
    half = jnp.asarray(0.5)  # u=0.5 -> alpha=1
    for fn in (CJ.brightness_jitter, CJ.contrast_jitter, CJ.saturation_jitter):
        out = np.asarray(fn(0.4, half, clip))
        np.testing.assert_allclose(out, np.asarray(clip), atol=1e-6)


def test_hue_rotate_zero_identity_and_period():
    clip = _clip(2)
    np.testing.assert_allclose(np.asarray(CJ.hue_rotate(jnp.asarray(0.0), clip)),
                               np.asarray(clip), atol=1e-4)
    # 360-degree rotation returns (approximately) the original
    out = np.asarray(CJ.hue_rotate(jnp.asarray(360.0), clip))
    np.testing.assert_allclose(out, np.asarray(clip), atol=1e-3)
    # gray pixels are hue-invariant
    gray = jnp.full((1, 4, 4, 3), 0.5)
    out = np.asarray(CJ.hue_rotate(jnp.asarray(90.0), gray))
    np.testing.assert_allclose(out, 0.5, atol=1e-4)


def test_lighting_jitter_zero_std():
    clip = _clip(3)
    out = np.asarray(CJ.lighting_jitter(jax.random.PRNGKey(0), clip, alphastd=0.0))
    np.testing.assert_allclose(out, np.asarray(clip), atol=1e-7)


def test_color_jitter_jits_and_randomizes():
    clip = _clip(4)
    f = jax.jit(lambda k, c: CJ.color_jitter(k, c, 0.4, 0.4, 0.4))
    a = np.asarray(f(jax.random.PRNGKey(0), clip))
    b = np.asarray(f(jax.random.PRNGKey(1), clip))
    assert a.shape == clip.shape
    assert not np.allclose(a, b)
    assert a.min() >= 0 and a.max() <= 1
