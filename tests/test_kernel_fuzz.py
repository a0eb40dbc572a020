"""Randomized-shape fuzz for the centerpiece Pallas kernels (interpret mode
on CPU): the fixed-shape parity tests pin the shapes the models use today;
this sweep guards the padding/tiling arithmetic (sublane-quantum pads,
lane-128 pads, masked tails) against shapes nobody hand-picked.

Seeded draws — deterministic, so a pass is stable; any failing draw is a
reproducible counterexample.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.ops.flash_attention import (flash_attention,
                                               _reference_attention)
from gava_clip_tpu.ops.int8_matmul import w8a8_matmul


def _draws(seed, n):
    rs = np.random.RandomState(seed)
    for _ in range(n):
        yield rs


def test_flash_attention_shape_fuzz():
    rs = np.random.RandomState(42)
    for i in range(6):
        H = int(rs.choice([1, 2, 4]))
        Dh = int(rs.choice([8, 16, 32]))
        D = H * Dh
        B = int(rs.randint(1, 4))
        Lq = int(rs.randint(1, 70))
        Lk = int(rs.randint(1, 70))
        q = jnp.asarray(rs.randn(B, Lq, D).astype(np.float32) * 0.2)
        k = jnp.asarray(rs.randn(B, Lk, D).astype(np.float32) * 0.2)
        v = jnp.asarray(rs.randn(B, Lk, D).astype(np.float32) * 0.2)

        got = np.asarray(flash_attention(q, k, v, H))
        want = np.asarray(_reference_attention(q, k, v, H))
        np.testing.assert_allclose(
            got, want, atol=2e-5, rtol=1e-4,
            err_msg=f"draw {i}: B={B} Lq={Lq} Lk={Lk} H={H} Dh={Dh}")

        # gradients through the Pallas backward at the same shape
        g_got = jax.grad(lambda a: flash_attention(a, k, v, H).sum())(q)
        g_want = jax.grad(
            lambda a: _reference_attention(a, k, v, H).sum())(q)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), atol=5e-5, rtol=1e-3,
            err_msg=f"grad draw {i}: B={B} Lq={Lq} Lk={Lk} H={H} Dh={Dh}")


def test_w8a8_matmul_shape_fuzz():
    from gava_clip_tpu.ops.int8_matmul import force_tpu_kernels
    force_tpu_kernels(True)  # interpret-mode Pallas on CPU
    try:
        rs = np.random.RandomState(7)
        for i in range(6):
            M = int(rs.randint(1, 200))
            K = int(rs.choice([32, 64, 96, 128, 192]))
            N = int(rs.randint(1, 300))
            x = rs.randn(M, K).astype(np.float32) * 0.5
            w_q = rs.randint(-127, 128, (K, N)).astype(np.int8)
            scale = np.abs(rs.randn(1, N)).astype(np.float32) * 0.01
            bias = rs.randn(N).astype(np.float32)

            got = np.asarray(w8a8_matmul(jnp.asarray(x), jnp.asarray(w_q),
                                         jnp.asarray(scale),
                                         bias=jnp.asarray(bias)),
                             np.float32)

            # reference: same per-row symmetric act quant, fp math
            amax = np.maximum(np.abs(x).max(axis=1, keepdims=True), 1e-6)
            xs = amax / 127.0
            xq = np.clip(np.rint(x / xs), -127, 127)
            want = (xq @ w_q.astype(np.float32)) * xs * scale + bias

            np.testing.assert_allclose(
                got, want, atol=5e-3, rtol=5e-3,
                err_msg=f"draw {i}: M={M} K={K} N={N}")
    finally:
        force_tpu_kernels(False)
