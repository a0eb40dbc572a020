"""Pallas attention kernel vs the einsum reference (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

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


def test_streaming_long_sequence():
    """L=1024 goes through the streaming (KV-blocked) kernel."""
    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(2, 1024, 4 * 32).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 1024, 4 * 32).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 1024, 4 * 32).astype(np.float32))
    want = _reference_attention(q, k, v, num_heads=4)
    got = flash_attention(q, k, v, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_streaming_long_unaligned_with_grads():
    """Unaligned long L exercises the segment-id padding path + backward."""
    rs = np.random.RandomState(4)
    q = jnp.asarray(rs.randn(1, 700, 2 * 32).astype(np.float32))
    k = jnp.asarray(rs.randn(1, 700, 2 * 32).astype(np.float32))
    v = jnp.asarray(rs.randn(1, 700, 2 * 32).astype(np.float32))
    want = _reference_attention(q, k, v, num_heads=2)
    got = flash_attention(q, k, v, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    # backward of the stock streaming kernel must trace inside the
    # interpret context on CPU (on TPU no context is needed)
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(lambda a: (flash_attention(a, k, v, 2) ** 2).sum())(q)
    g2 = jax.grad(lambda a: (_reference_attention(a, k, v, 2) ** 2).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-3)


def test_causal_text_shape():
    """Causal at the text-tower shape (L=77, padded to 128 in-kernel)."""
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(3, 77, 4 * 16).astype(np.float32))
    want = _reference_attention(x, x, x, num_heads=4, causal=True)
    got = flash_attention(x, x, x, 4, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_causal_gradients():
    rs = np.random.RandomState(6)
    q = jnp.asarray(rs.randn(2, 77, 2 * 32).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 77, 2 * 32).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 77, 2 * 32).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(lambda a, b, c: (flash_attention(a, b, c, 2,
                                                       causal=True)
                                       ** 2).sum(),
                      argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda a, b, c: (_reference_attention(a, b, c, 2,
                                                        causal=True)
                                   ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_packed_backward_cross_attention_shape():
    """Backward at the vision shape: Lq=197 queries vs Lk=283 keys
    (prompts-as-keys restructure), bf16 inputs."""
    rs = np.random.RandomState(7)
    q = jnp.asarray(rs.randn(4, 197, 6 * 32).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rs.randn(4, 283, 6 * 32).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rs.randn(4, 283, 6 * 32).astype(np.float32), jnp.bfloat16)
    got = flash_attention(q, k, v, 6)
    want = _reference_attention(q, k, v, 6)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=3e-2)
    g1 = jax.grad(lambda a, b, c: (flash_attention(a, b, c, 6)
                                   .astype(jnp.float32) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda a, b, c: (_reference_attention(a, b, c, 6)
                                   .astype(jnp.float32) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=0.5,
                                   rtol=0.05)


def test_large_scores_saturate_without_overflow():
    """The single-pass softmax replaces max-subtraction with a clamp at
    exp2-arg 110 (the 2^17 headroom keeps row sums finite even with every
    key at the clamp). Scaled scores below the clamp must be exact vs the
    reference; far beyond (q*k ~ 1e5) the kernel must degrade to finite
    outputs (uniform saturation), never inf/NaN."""
    rs = np.random.RandomState(2)
    # large-ish scores (|scaled| ~ 20 < 110): still exact
    q = jnp.asarray(2.0 * rs.randn(2, 30, 64).astype(np.float32))
    k = jnp.asarray(2.0 * rs.randn(2, 40, 64).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 40, 64).astype(np.float32))
    want = _reference_attention(q, k, v, num_heads=4)
    got = flash_attention(q, k, v, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)
    # pathological scores (scaled >> 126): finite, convex-combination range
    qh = jnp.asarray(300.0 * np.abs(rs.randn(1, 16, 64)).astype(np.float32))
    got = np.asarray(flash_attention(qh, qh, v[:1, :16], 4))
    assert np.isfinite(got).all()
    assert np.abs(got).max() <= np.abs(np.asarray(v[:1, :16])).max() + 1e-3


def test_fused_int8_out_projection_matches_composition():
    """flash_attention_out_int8 (attention + in-kernel act-quant int8
    out-projection + residual — the w8a8 serving hot path) vs the explicit
    reference composition, interpret mode on CPU."""
    from gava_clip_tpu.ops.flash_attention import flash_attention_out_int8
    rs = np.random.RandomState(8)
    B, Lq, Lk, D, H = 3, 30, 38, 64, 4
    q = jnp.asarray(rs.randn(B, Lq, D).astype(np.float32) * 0.1)
    k = jnp.asarray(rs.randn(B, Lk, D).astype(np.float32) * 0.1)
    v = jnp.asarray(rs.randn(B, Lk, D).astype(np.float32) * 0.1)
    r = jnp.asarray(rs.randn(B, Lq, D).astype(np.float32) * 0.1)
    wq = jnp.asarray(rs.randint(-127, 127, (D, D), np.int8))
    sc = jnp.asarray(np.abs(rs.randn(1, D)).astype(np.float32) * 0.01)
    b = jnp.asarray(rs.randn(D).astype(np.float32) * 0.01)
    outp = {"kernel": {"qa": wq, "scale": sc}, "bias": b}

    got = np.asarray(flash_attention_out_int8(q, k, v, H, outp, r),
                     np.float32)

    attn = np.asarray(_reference_attention(q, k, v, H), np.float32)
    xs = np.maximum(np.abs(attn).max(-1, keepdims=True), 1e-6) / 127.0
    aq = np.clip(np.round(attn / xs), -127, 127).astype(np.int32)
    want = ((aq @ np.asarray(wq, np.int32)).astype(np.float32) * xs
            * np.asarray(sc) + np.asarray(b) + np.asarray(r, np.float32))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_int8_lq_matches_sliced_q():
    """lq= valid-query count: passing the full (longer) q buffer with lq=N
    must equal slicing q[:, :N] first. This is the serving-path layout where
    q is the whole qkv projection row block (models/vision.py _block)."""
    from gava_clip_tpu.ops.flash_attention import flash_attention_out_int8
    rs = np.random.RandomState(9)
    B, Lq_full, Lx, Lk, D, H = 2, 27, 21, 33, 64, 4
    q = jnp.asarray(rs.randn(B, Lq_full, D).astype(np.float32) * 0.1)
    k = jnp.asarray(rs.randn(B, Lk, D).astype(np.float32) * 0.1)
    v = jnp.asarray(rs.randn(B, Lk, D).astype(np.float32) * 0.1)
    r = jnp.asarray(rs.randn(B, Lx, D).astype(np.float32) * 0.1)
    wq = jnp.asarray(rs.randint(-127, 127, (D, D), np.int8))
    sc = jnp.asarray(np.abs(rs.randn(1, D)).astype(np.float32) * 0.01)
    b = jnp.asarray(rs.randn(D).astype(np.float32) * 0.01)
    outp = {"kernel": {"qa": wq, "scale": sc}, "bias": b}

    got = flash_attention_out_int8(q, k, v, H, outp, r, lq=Lx)
    want = flash_attention_out_int8(q[:, :Lx], k, v, H, outp, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)
    assert got.shape == (B, Lx, D)


def test_fused_int8_two_source_matches_concat():
    """flash_attention_out_int8_2src over separate (k1,v1)/(k2,v2) must
    equal the single-source kernel over the concatenated kv — the no-concat
    serving path for prompt extras (models/vision.py _block)."""
    from gava_clip_tpu.ops.flash_attention import (
        flash_attention_out_int8, flash_attention_out_int8_2src)
    rs = np.random.RandomState(11)
    B, L1, L2, D, H = 2, 29, 13, 64, 4
    q = jnp.asarray(rs.randn(B, L1, D).astype(np.float32) * 0.1)
    k1 = jnp.asarray(rs.randn(B, L1, D).astype(np.float32) * 0.1)
    v1 = jnp.asarray(rs.randn(B, L1, D).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rs.randn(B, L2, D).astype(np.float32) * 0.1)
    v2 = jnp.asarray(rs.randn(B, L2, D).astype(np.float32) * 0.1)
    r = jnp.asarray(rs.randn(B, L1, D).astype(np.float32) * 0.1)
    wq = jnp.asarray(rs.randint(-127, 127, (D, D), np.int8))
    sc = jnp.asarray(np.abs(rs.randn(1, D)).astype(np.float32) * 0.01)
    b = jnp.asarray(rs.randn(D).astype(np.float32) * 0.01)
    outp = {"kernel": {"qa": wq, "scale": sc}, "bias": b}

    got = flash_attention_out_int8_2src(q, k1, v1, k2, v2, H, outp, r)
    want = flash_attention_out_int8(
        q, jnp.concatenate([k1, k2], axis=1),
        jnp.concatenate([v1, v2], axis=1), H, outp, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)


def test_fused_int8_k_segments_matches_dense():
    """k_segments (the sublane-aligned serving layout: zero-pad rows between
    patch rows and extras rows) must equal attention over only the valid
    keys. Layout here: 21 valid patch keys, pad to 24, then 9 valid extras
    keys, pad to 40 total."""
    from gava_clip_tpu.ops.flash_attention import flash_attention_out_int8
    rs = np.random.RandomState(12)
    B, D, H = 2, 64, 4
    lx, Lxp, le = 21, 24, 9
    Lk = 40   # Lxp + 16 (extras padded 9 -> 16)
    q = jnp.asarray(rs.randn(B, Lxp, D).astype(np.float32) * 0.1)
    k = jnp.asarray(rs.randn(B, Lk, D).astype(np.float32) * 0.1)
    v = jnp.asarray(rs.randn(B, Lk, D).astype(np.float32) * 0.1)
    r = jnp.asarray(rs.randn(B, Lxp, D).astype(np.float32) * 0.1)
    wq = jnp.asarray(rs.randint(-127, 127, (D, D), np.int8))
    sc = jnp.asarray(np.abs(rs.randn(1, D)).astype(np.float32) * 0.01)
    b = jnp.asarray(rs.randn(D).astype(np.float32) * 0.01)
    outp = {"kernel": {"qa": wq, "scale": sc}, "bias": b}
    segs = ((0, lx), (Lxp, Lxp + le))

    got = flash_attention_out_int8(q, k, v, H, outp, r, k_segments=segs)

    kd = jnp.concatenate([k[:, :lx], k[:, Lxp:Lxp + le]], axis=1)
    vd = jnp.concatenate([v[:, :lx], v[:, Lxp:Lxp + le]], axis=1)
    want = flash_attention_out_int8(q, kd, vd, H, outp, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)


def test_clamp_monitor_detects_drift():
    """The opt-in drift monitor (ADVICE r2): records the exact max exp2
    argument and flags logits past the saturating clamp at 110."""
    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.ops import flash_attention as FA
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(2, 16, 32).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 16, 32).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 16, 32).astype(np.float32))
    FA.enable_clamp_monitor(True)
    try:
        jax.jit(lambda a, b, c: FA.flash_attention(a, b, c, num_heads=2))(
            q, k, v).block_until_ready()
        assert FA.clamp_stats["calls"] >= 1
        assert not FA.clamp_stats["clipped"]
        small_max = FA.clamp_stats["max_exp2_arg"]
        assert 0 < small_max < FA._CLAMP_LIMIT

        FA.enable_clamp_monitor(True)  # reset stats
        jax.jit(lambda a, b, c: FA.flash_attention(a, b, c, num_heads=2))(
            q * 40.0, k * 40.0, v).block_until_ready()
        assert FA.clamp_stats["clipped"]
        assert FA.clamp_stats["max_exp2_arg"] >= FA._CLAMP_LIMIT
    finally:
        FA.enable_clamp_monitor(False)
    # monitor off: stats stay reset
    FA.flash_attention(q, k, v, num_heads=2)
    assert FA.clamp_stats["calls"] == 0


def test_int8_qk_scores_close_to_fp32():
    """set_int8_qk(True): the QK^T dot runs int8 (per-row q/k quant in VMEM,
    rank-1 rescale folded into the exp2 arg). Softmax probabilities are
    insensitive to ~0.4% relative score error at CLIP-scale logits, so the
    attention output must track the fp32-score kernel tightly — the same
    prob-delta contract the bench gate enforces on TPU."""
    from gava_clip_tpu.ops.flash_attention import (flash_attention_out_int8,
                                                   set_int8_qk)
    rs = np.random.RandomState(11)
    B, Lq, Lk, D, H = 3, 30, 38, 64, 4
    q = jnp.asarray(rs.randn(B, Lq, D).astype(np.float32) * 0.3)
    k = jnp.asarray(rs.randn(B, Lk, D).astype(np.float32) * 0.3)
    v = jnp.asarray(rs.randn(B, Lk, D).astype(np.float32) * 0.1)
    r = jnp.asarray(rs.randn(B, Lq, D).astype(np.float32) * 0.1)
    wq = jnp.asarray(rs.randint(-127, 127, (D, D), np.int8))
    sc = jnp.asarray(np.abs(rs.randn(1, D)).astype(np.float32) * 0.01)
    b = jnp.asarray(rs.randn(D).astype(np.float32) * 0.01)
    outp = {"kernel": {"qa": wq, "scale": sc}, "bias": b}

    want = np.asarray(flash_attention_out_int8(q, k, v, H, outp, r),
                      np.float32)
    set_int8_qk(True)
    try:
        got = np.asarray(flash_attention_out_int8(q, k, v, H, outp, r),
                         np.float32)
    finally:
        set_int8_qk(False)
    # scores carry <=0.8% relative quant error; through softmax + AV + the
    # int8 out-projection the output stays within the w8a8 family tolerance
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)
    # and the flag actually changes the computation (not a dead knob)
    assert np.abs(got - want).max() > 0


def test_flash_bwd_recompute_matches_saved_residual():
    """GAVA_FLASH_BWD A/B switch: the recompute backward (residuals q/k/v,
    o+denominator rebuilt in-kernel) and the saved-residual backward must
    produce identical gradients — only their HBM-traffic/FLOP trade differs
    (timed on TPU by tools/run_queued_bench_r04.sh)."""
    from gava_clip_tpu.ops.flash_attention import (flash_attention,
                                                   set_flash_bwd_mode)
    rs = np.random.RandomState(13)
    B, L, D, H = 2, 22, 64, 4
    q = jnp.asarray(rs.randn(B, L, D).astype(np.float32) * 0.2)
    k = jnp.asarray(rs.randn(B, L, D).astype(np.float32) * 0.2)
    v = jnp.asarray(rs.randn(B, L, D).astype(np.float32) * 0.2)
    do = jnp.asarray(rs.randn(B, L, D).astype(np.float32))

    def run():
        f = lambda q, k, v: (flash_attention(q, k, v, H) * do).sum()
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g_saved = run()
    set_flash_bwd_mode("recompute")
    try:
        g_rec = run()
    finally:
        set_flash_bwd_mode("saved")
    for a, b in zip(g_saved, g_rec):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
