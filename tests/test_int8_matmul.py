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


def test_w8a8_matmul3_cat_matches_concat():
    """The VMEM-stitched two-input qkv kernel (sublane-aligned serving
    layout) must equal w8a8_matmul3 over the HBM-concatenated kv."""
    from gava_clip_tpu.ops.int8_matmul import w8a8_matmul3, w8a8_matmul3_cat
    from gava_clip_tpu.ops.quant import quantize_weight
    rs = np.random.RandomState(5)
    B, Lx, Le, K = 4, 16, 8, 32
    x = jnp.asarray(rs.randn(B, Lx, K).astype(np.float32) * 0.1)
    e = jnp.asarray(rs.randn(B, Le, K).astype(np.float32) * 0.1)
    ws = [rs.randn(K, K).astype(np.float32) * 0.05 for _ in range(3)]
    qs, ss = zip(*[quantize_weight(w) for w in ws])
    qs = tuple(jnp.asarray(q) for q in qs)
    ss = tuple(jnp.asarray(s) for s in ss)
    b3 = tuple(jnp.asarray(rs.randn(K).astype(np.float32) * 0.01)
               for _ in range(3))
    ln = (jnp.asarray(rs.rand(K).astype(np.float32) + 0.5),
          jnp.asarray(rs.randn(K).astype(np.float32) * 0.1))

    got = w8a8_matmul3_cat(x, e, qs, ss, bias3=b3, ln=ln,
                           clips_per_block=2)
    kv = jnp.concatenate([x, e], axis=1)
    want = w8a8_matmul3(kv.reshape(-1, K), qs, ss, bias3=b3, ln=ln)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w).reshape(B, Lx + Le, K),
            atol=2e-5)
        assert g.shape == (B, Lx + Le, K)


def test_int8_mlp_st_backward_matches_float_reference():
    """Hand-written dx/d_residual of the fused frozen-int8 MLP vs autodiff
    of the float composition on dequantized weights (straight-through:
    quantization treated as identity, so tolerances absorb the quant
    noise)."""
    from gava_clip_tpu.ops.int8_matmul import int8_mlp_st
    from gava_clip_tpu.ops.quant import quantize_weight
    rs = np.random.RandomState(0)
    M, K, H = 16, 32, 64
    x = jnp.asarray(rs.randn(M, K).astype(np.float32))
    r = jnp.asarray(rs.randn(M, K).astype(np.float32))
    w1 = rs.randn(K, H).astype(np.float32) * 0.1
    w2 = rs.randn(H, K).astype(np.float32) * 0.1
    b1 = rs.randn(H).astype(np.float32) * 0.01
    b2 = rs.randn(K).astype(np.float32) * 0.01
    ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(K).astype(np.float32))
    ln_b = jnp.asarray(0.01 * rs.randn(K).astype(np.float32))
    q1, s1 = quantize_weight(w1)
    q2, s2 = quantize_weight(w2)

    def fused(x, r):
        return int8_mlp_st(x, jnp.asarray(q1), jnp.asarray(s1),
                           jnp.asarray(b1), jnp.asarray(q2), jnp.asarray(s2),
                           jnp.asarray(b2), ln_s, ln_b, r).sum()

    def ref(x, r):
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        n = (x - mean) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b
        h = n @ jnp.asarray(q1.astype(np.float32) * s1) + b1
        a = h * jax.nn.sigmoid(1.702 * h)
        return (r + a @ jnp.asarray(q2.astype(np.float32) * s2) + b2).sum()

    gx, gr = jax.grad(fused, argnums=(0, 1))(x, r)
    gx_ref, gr_ref = jax.grad(ref, argnums=(0, 1))(x, r)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=0.05, atol=0.05)


def test_int8_qkv3_st_backward_matches_float_reference():
    from gava_clip_tpu.ops.int8_matmul import int8_qkv3_st
    from gava_clip_tpu.ops.quant import quantize_weight
    rs = np.random.RandomState(1)
    M, K = 16, 32
    x = jnp.asarray(rs.randn(M, K).astype(np.float32))
    ws = [rs.randn(K, K).astype(np.float32) * 0.1 for _ in range(3)]
    bs = [rs.randn(K).astype(np.float32) * 0.01 for _ in range(3)]
    ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(K).astype(np.float32))
    ln_b = jnp.asarray(0.01 * rs.randn(K).astype(np.float32))
    qs = [quantize_weight(w) for w in ws]

    def fused(x):
        q, k, v = int8_qkv3_st(
            x, *(jnp.asarray(qi[0]) for qi in qs),
            *(jnp.asarray(qi[1]) for qi in qs),
            *(jnp.asarray(b) for b in bs), ln_s, ln_b)
        return (q * 1.0 + k * 2.0 + v * 3.0).sum()

    def ref(x):
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        n = (x - mean) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b
        outs = [n @ jnp.asarray(q.astype(np.float32) * s) + b
                for (q, s), b in zip(qs, bs)]
        return (outs[0] * 1.0 + outs[1] * 2.0 + outs[2] * 3.0).sum()

    gx = jax.grad(fused)(x)
    gx_ref = jax.grad(ref)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=0.05, atol=0.05)


def test_w8a8_matmul3_cat_shape_fuzz():
    """Stitched two-input qkv kernel across (Lx, Le, B, clips_per_block)
    combinations — every 8-aligned serving geometry must match the
    concatenated single-input kernel (robustness for batch-sweep and
    future shape changes)."""
    import numpy as np
    import jax.numpy as jnp
    from gava_clip_tpu.ops.int8_matmul import w8a8_matmul3, w8a8_matmul3_cat
    rs = np.random.RandomState(21)
    K, N = 32, 48
    ln = (jnp.asarray(np.abs(rs.randn(K)).astype(np.float32) + 0.5),
          jnp.asarray(rs.randn(K).astype(np.float32) * 0.1))
    qs, ss, b3 = [], [], []
    for _ in range(3):
        w = rs.randn(K, N).astype(np.float32)
        q = np.clip(np.round(w / np.abs(w).max(0) * 127), -127,
                    127).astype(np.int8)
        qs.append(jnp.asarray(q))
        ss.append(jnp.asarray((np.abs(w).max(0) / 127)
                              .astype(np.float32).reshape(1, -1)))
        b3.append(jnp.asarray(rs.randn(N).astype(np.float32) * 0.01))
    qs, ss, b3 = tuple(qs), tuple(ss), tuple(b3)

    for B, Lx, Le, cpb in [(2, 8, 8, 1), (4, 16, 8, 2), (4, 24, 16, 4),
                           (6, 8, 24, 3), (8, 32, 8, 8)]:
        x = jnp.asarray(rs.randn(B, Lx, K).astype(np.float32) * 0.3)
        e = jnp.asarray(rs.randn(B, Le, K).astype(np.float32) * 0.3)
        got = w8a8_matmul3_cat(x, e, qs, ss, bias3=b3, ln=ln,
                               clips_per_block=cpb)
        kv = jnp.concatenate([x, e], axis=1).reshape(-1, K)
        want = w8a8_matmul3(kv, qs, ss, bias3=b3, ln=ln)
        for g, w_ in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g.reshape(-1, N)), np.asarray(w_),
                atol=1e-4, rtol=1e-4,
                err_msg=f"B={B} Lx={Lx} Le={Le} cpb={cpb}")
