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


def _np_quant_rows(x):
    amax = np.maximum(np.abs(x).max(axis=1, keepdims=True), 1e-6)
    xs = amax / 127.0
    return np.clip(np.rint(x / xs), -127, 127), xs


def _np_ln(x, scale, bias, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def test_w8a8_matmul3_shape_fuzz():
    """Shared-quant LN+triple-GEMM at random shapes vs a numpy model of
    the same math (LN -> one per-row quant -> three int8 dots)."""
    from gava_clip_tpu.ops.int8_matmul import force_tpu_kernels, w8a8_matmul3
    force_tpu_kernels(True)
    try:
        rs = np.random.RandomState(13)
        for i in range(4):
            M = int(rs.randint(1, 150))
            K = int(rs.choice([32, 64, 128]))
            N = int(rs.choice([24, 64, 100, 128]))
            x = rs.randn(M, K).astype(np.float32) * 0.5
            wq3 = tuple(rs.randint(-127, 128, (K, N)).astype(np.int8)
                        for _ in range(3))
            s3 = tuple(np.abs(rs.randn(1, N)).astype(np.float32) * 0.01
                       for _ in range(3))
            b3 = tuple(rs.randn(N).astype(np.float32) for _ in range(3))
            ln = (rs.randn(K).astype(np.float32),
                  rs.randn(K).astype(np.float32))

            got = w8a8_matmul3(jnp.asarray(x),
                               tuple(map(jnp.asarray, wq3)),
                               tuple(map(jnp.asarray, s3)),
                               bias3=tuple(map(jnp.asarray, b3)),
                               ln=tuple(map(jnp.asarray, ln)))

            xn = _np_ln(x, ln[0], ln[1])
            xq, xs = _np_quant_rows(xn)
            for j in range(3):
                want = (xq @ wq3[j].astype(np.float32)) * xs * s3[j] + b3[j]
                np.testing.assert_allclose(
                    np.asarray(got[j], np.float32), want,
                    atol=5e-3, rtol=5e-3,
                    err_msg=f"draw {i} proj {j}: M={M} K={K} N={N}")
    finally:
        force_tpu_kernels(False)


def _np_quick_gelu(x):
    return x / (1.0 + np.exp(-1.702 * x))


def test_w8a8_mlp_res_shape_fuzz():
    """Fused LN->fc1->QuickGELU->(requant)->fc2->+residual at random shapes
    vs the numpy model of each stage."""
    from gava_clip_tpu.ops.int8_matmul import force_tpu_kernels, w8a8_mlp_res
    force_tpu_kernels(True)
    try:
        rs = np.random.RandomState(29)
        for i in range(4):
            M = int(rs.randint(1, 120))
            K = int(rs.choice([32, 64, 128]))
            H = int(rs.choice([48, 64, 128]))
            x = rs.randn(M, K).astype(np.float32) * 0.5
            res = rs.randn(M, K).astype(np.float32) * 0.5
            mk = lambda k, n: {"kernel": {
                "qa": jnp.asarray(rs.randint(-127, 128, (k, n)).astype(np.int8)),
                "scale": jnp.asarray(np.abs(rs.randn(1, n)).astype(np.float32) * 0.01)},
                "bias": jnp.asarray(rs.randn(n).astype(np.float32))}
            fc1, fc2 = mk(K, H), mk(H, K)
            ln = (rs.randn(K).astype(np.float32),
                  rs.randn(K).astype(np.float32))

            got = np.asarray(w8a8_mlp_res(
                jnp.asarray(x), fc1, fc2, tuple(map(jnp.asarray, ln)),
                jnp.asarray(res)), np.float32)

            xn = _np_ln(x, ln[0], ln[1])
            xq, xs = _np_quant_rows(xn)
            h = (xq @ np.asarray(fc1["kernel"]["qa"], np.float32)) * xs \
                * np.asarray(fc1["kernel"]["scale"]) + np.asarray(fc1["bias"])
            h = _np_quick_gelu(h)
            hq, hs = _np_quant_rows(h)
            want = (hq @ np.asarray(fc2["kernel"]["qa"], np.float32)) * hs \
                * np.asarray(fc2["kernel"]["scale"]) \
                + np.asarray(fc2["bias"]) + res
            np.testing.assert_allclose(
                got, want, atol=1e-2, rtol=1e-2,
                err_msg=f"draw {i}: M={M} K={K} H={H}")
    finally:
        force_tpu_kernels(False)


def test_w8a8_matmul3_cat_fuzz_vs_concat():
    """The VMEM-stitched two-input qkv kernel at random (B, Lx, Le) must
    equal w8a8_matmul3 on the host-concatenated kv (both sublane-aligned),
    for every clips_per_block that divides B."""
    from gava_clip_tpu.ops.int8_matmul import (force_tpu_kernels,
                                               w8a8_matmul3,
                                               w8a8_matmul3_cat)
    force_tpu_kernels(True)
    try:
        rs = np.random.RandomState(31)
        for i in range(3):
            B = int(rs.choice([2, 4]))
            Lx = 8 * int(rs.randint(1, 5))
            Le = 8 * int(rs.randint(1, 3))
            K = int(rs.choice([32, 64]))
            N = int(rs.choice([32, 64, 96]))
            x = rs.randn(B, Lx, K).astype(np.float32) * 0.3
            e = rs.randn(B, Le, K).astype(np.float32) * 0.3
            wq3 = tuple(jnp.asarray(rs.randint(-127, 128, (K, N)).astype(np.int8))
                        for _ in range(3))
            s3 = tuple(jnp.asarray(np.abs(rs.randn(1, N)).astype(np.float32) * 0.01)
                       for _ in range(3))
            b3 = tuple(jnp.asarray(rs.randn(N).astype(np.float32))
                       for _ in range(3))
            ln = (jnp.asarray(rs.randn(K).astype(np.float32)),
                  jnp.asarray(rs.randn(K).astype(np.float32)))

            got = w8a8_matmul3_cat(jnp.asarray(x), jnp.asarray(e),
                                   wq3, s3, bias3=b3, ln=ln,
                                   clips_per_block=2)
            cat = np.concatenate([x, e], axis=1).reshape(B * (Lx + Le), K)
            want = w8a8_matmul3(jnp.asarray(cat), wq3, s3, bias3=b3, ln=ln)
            for j in range(3):
                np.testing.assert_allclose(
                    np.asarray(got[j], np.float32).reshape(-1, N),
                    np.asarray(want[j], np.float32), atol=5e-3, rtol=5e-3,
                    err_msg=f"draw {i} proj {j}: B={B} Lx={Lx} Le={Le} "
                            f"K={K} N={N}")
    finally:
        force_tpu_kernels(False)


def test_flash_attention_streaming_and_causal_fuzz():
    """The packed-path fuzz above never reaches the streaming
    (KV-blocked online-softmax) kernel (Lk <= 640 goes packed) nor the
    causal path. Draws here pin both: causal at random short L (the text
    tower / train decode shapes) and non-causal at Lk > 640 (streaming)."""
    rs = np.random.RandomState(17)
    # causal draws (streaming kernel handles causal at any L)
    for i in range(3):
        H = int(rs.choice([1, 2, 4]))
        Dh = int(rs.choice([8, 16]))
        D = H * Dh
        B = int(rs.randint(1, 3))
        L = int(rs.randint(2, 90))
        q = jnp.asarray(rs.randn(B, L, D).astype(np.float32) * 0.2)
        k = jnp.asarray(rs.randn(B, L, D).astype(np.float32) * 0.2)
        v = jnp.asarray(rs.randn(B, L, D).astype(np.float32) * 0.2)
        # the stock streaming kernel's backward must trace inside the
        # interpret context on CPU (same convention as
        # test_streaming_long_unaligned_with_grads)
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flash_attention(q, k, v, H, causal=True))
            g_got = jax.grad(
                lambda a: flash_attention(a, k, v, H, causal=True).sum())(q)
        want = np.asarray(_reference_attention(q, k, v, H, causal=True))
        np.testing.assert_allclose(
            got, want, atol=2e-5, rtol=1e-4,
            err_msg=f"causal draw {i}: B={B} L={L} H={H} Dh={Dh}")
        g_want = jax.grad(
            lambda a: _reference_attention(a, k, v, H, causal=True).sum())(q)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), atol=5e-5, rtol=1e-3,
            err_msg=f"causal grad draw {i}: B={B} L={L} H={H} Dh={Dh}")

    # one long non-causal draw past the packed threshold (streaming path)
    H, Dh, B = 2, 16, 1
    D = H * Dh
    Lq, Lk = 37, 641 + int(rs.randint(0, 64))
    q = jnp.asarray(rs.randn(B, Lq, D).astype(np.float32) * 0.2)
    k = jnp.asarray(rs.randn(B, Lk, D).astype(np.float32) * 0.2)
    v = jnp.asarray(rs.randn(B, Lk, D).astype(np.float32) * 0.2)
    got = np.asarray(flash_attention(q, k, v, H))
    want = np.asarray(_reference_attention(q, k, v, H))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4,
                               err_msg=f"streaming: Lq={Lq} Lk={Lk}")
