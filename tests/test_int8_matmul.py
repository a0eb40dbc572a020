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
