"""Pallas int8 dequant GEMM (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.ops.int8_matmul import int8_matmul, quantized_linear
from gava_clip_tpu.ops.quant import quantize_weight


def test_int8_matmul_matches_dequant_reference():
    rs = np.random.RandomState(0)
    x = rs.randn(64, 96).astype(np.float32)
    w = rs.randn(96, 80).astype(np.float32) * 0.05
    q, scale = quantize_weight(w)
    want = x @ (q.astype(np.float32) * scale)
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(q),
                                 jnp.asarray(scale), block_m=32, block_n=32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_int8_matmul_unaligned_shapes():
    rs = np.random.RandomState(1)
    x = rs.randn(33, 48).astype(np.float32)
    w = rs.randn(48, 50).astype(np.float32)
    q, scale = quantize_weight(w)
    want = x @ (q.astype(np.float32) * scale)
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(q),
                                 jnp.asarray(scale), block_m=32, block_n=32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_quantized_linear_with_bias_and_batch_dims():
    rs = np.random.RandomState(2)
    w = rs.randn(16, 24).astype(np.float32) * 0.1
    b = rs.randn(24).astype(np.float32)
    q, scale = quantize_weight(w)
    qp = {"kernel": {"q": jnp.asarray(q), "scale": jnp.asarray(scale)},
          "bias": jnp.asarray(b)}
    x = jnp.asarray(rs.randn(2, 5, 16).astype(np.float32))
    got = np.asarray(quantized_linear(qp, x))
    want = np.asarray(x) @ (q.astype(np.float32) * scale) + b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_w8a8_matmul_matches_compose():
    """Fused Pallas w8a8 kernel (interpret mode) vs the XLA composition."""
    from gava_clip_tpu.ops.int8_matmul import (int8_apply, quantize_act,
                                               w8a8_matmul)
    from gava_clip_tpu.ops.quant import quantize_weight
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(70, 64).astype(np.float32))
    w = rs.randn(64, 80).astype(np.float32) * 0.05
    q, scale = quantize_weight(w)
    got = np.asarray(w8a8_matmul(x, jnp.asarray(q), jnp.asarray(scale)))
    xq, xs = quantize_act(x)
    want = np.asarray(int8_apply({"qa": jnp.asarray(q),
                                  "scale": jnp.asarray(scale)}, xq, xs,
                                 out_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=1e-5)
    full = np.asarray(x) @ w
    assert np.abs(got - full).max() / np.abs(full).max() < 0.02


def test_w8a8_matmul3_matches_singles():
    from gava_clip_tpu.ops.int8_matmul import w8a8_matmul, w8a8_matmul3
    from gava_clip_tpu.ops.quant import quantize_weight
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(16, 32).astype(np.float32))
    ws = [rs.randn(32, 32).astype(np.float32) * 0.05 for _ in range(3)]
    qs, ss = zip(*[quantize_weight(w) for w in ws])
    qs = tuple(jnp.asarray(q) for q in qs)
    ss = tuple(jnp.asarray(s) for s in ss)
    outs = w8a8_matmul3(x, qs, ss)
    for o, q, s in zip(outs, qs, ss):
        np.testing.assert_allclose(np.asarray(o),
                                   np.asarray(w8a8_matmul(x, q, s)),
                                   atol=1e-5)
