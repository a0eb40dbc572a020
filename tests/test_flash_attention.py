"""Pallas attention kernel vs the einsum reference (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from gava_clip_tpu.ops.flash_attention import (flash_attention,
                                               _reference_attention)


def test_flash_matches_reference():
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(3, 214, 8 * 16).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 214, 8 * 16).astype(np.float32))
    v = jnp.asarray(rs.randn(3, 214, 8 * 16).astype(np.float32))
    want = _reference_attention(q, k, v, num_heads=8)
    got = flash_attention(q, k, v, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_flash_aligned_length():
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(2, 128, 64).astype(np.float32))
    want = _reference_attention(q, q, q, num_heads=4)
    got = flash_attention(q, q, q, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_flash_gradients_match():
    rs = np.random.RandomState(2)
    q = jnp.asarray(rs.randn(2, 150, 64).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 150, 64).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 150, 64).astype(np.float32))

    g1 = jax.grad(lambda a, b, c: (flash_attention(a, b, c, 4) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda a, b, c: (_reference_attention(a, b, c, 4) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
