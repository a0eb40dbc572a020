"""Fused prompt-extras kernel (ops/extras_kernel.py) parity, interpret mode.

The kernel replaces the per-layer XLA extras composition (cls_proj GEMM,
summary LN + Tb-token attention, local/global broadcasts, concat + pad) in
the w8a8 aligned serving path; numerics must match the composition exactly
(same math, fp32 islands)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.ops.extras_kernel import fused_extras, set_fused_extras
from gava_clip_tpu.ops.int8_matmul import force_tpu_kernels


def _tiny_model():
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                       patch_size=(16, 16), heads=2, layers=2,
                       mlp_factor=2.0, embed_dim=16,
                       use_summary_token=True, use_local_prompts=True,
                       use_global_prompts=True, num_global_prompts=2)
    return VitaClip(VitaClipConfig(vision=cfg, num_classes=3,
                                   zeroshot_evaluation=True),
                    zeroshot_text_features=tf)


def test_fused_extras_matches_xla_composition():
    from gava_clip_tpu.ops.attention import multi_head_attention
    from gava_clip_tpu.ops.linear import linear
    from gava_clip_tpu.ops.norm import layer_norm

    model = _tiny_model()
    vp = model.params["visual"]
    # layer-0 slice of the stacked block weights
    p = jax.tree_util.tree_map(lambda l: jnp.asarray(l[0]), vp["blocks"])
    g = jnp.asarray(vp["global_prompts"][0])
    cfgv = model.cfg.vision
    Tb, G, D = cfgv.num_frames, cfgv.num_global_prompts, cfgv.feature_dim
    Bb = 3
    BT = Bb * Tb
    rs = np.random.RandomState(5)
    cls = jnp.asarray(rs.randn(BT, D).astype(np.float32) * 0.2)

    le = G + 1 + Tb
    le_pad = le + (-le % 8)
    e, summary = fused_extras(cls, p, g, Tb=Tb, num_heads=cfgv.heads,
                              le_pad=le_pad)

    # reference composition (models/vision.py _block, pre-fusion form)
    cls3 = cls.reshape(Bb, Tb, D)
    cls_proj = linear(p["cls_proj"], cls3)
    s_norm = layer_norm(cls_proj, p["summary_ln"]["scale"],
                        p["summary_ln"]["bias"])
    want_summary = cls_proj + multi_head_attention(
        p["summary_attn"], s_norm, s_norm, s_norm, cfgv.heads, impl="xla")
    lp = p["local_prompts"] + cls_proj
    want_e = jnp.concatenate([
        jnp.broadcast_to(g[None], (BT, G, D)),
        want_summary.reshape(BT, 1, D),
        jnp.broadcast_to(lp[:, None], (Bb, Tb, Tb, D)).reshape(BT, Tb, D),
        jnp.zeros((BT, le_pad - le, D), jnp.float32)], axis=1)

    np.testing.assert_allclose(np.asarray(summary),
                               np.asarray(want_summary), atol=2e-5,
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(e), np.asarray(want_e),
                               atol=2e-5, rtol=2e-5)
    assert e.shape == (BT, le_pad, D)


def test_fused_extras_end_to_end_w8a8_logits():
    """Full zero-shot w8a8 forward (forced interpret Pallas, aligned layout,
    flash attention): logits with the fused extras kernel == the XLA extras
    composition."""
    from gava_clip_tpu.ops.quant import quantize_tower_params
    model = _tiny_model()
    qparams = quantize_tower_params(model.params, act_quant=True)
    rs = np.random.RandomState(6)
    video = jnp.asarray(rs.rand(2, 2, 32, 32, 3).astype(np.float32))

    def fwd():
        return np.asarray(model.apply(
            qparams, model.buffers, video, attn_impl="flash")["logits"],
            np.float32)

    force_tpu_kernels(True)
    try:
        want = fwd()
        set_fused_extras(True)
        try:
            got = fwd()
        finally:
            set_fused_extras(False)
    finally:
        force_tpu_kernels(False)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    assert np.abs(got).max() > 0

def test_fused_extras_geometry_fuzz():
    """The fused kernel across (Bb, Tb, G, heads) geometries — the one-hot
    broadcast matmul and block-diagonal attention must hold for any clip
    grouping, not just the flagship (16, 8, 8, 12) shape."""
    from gava_clip_tpu.ops.attention import multi_head_attention
    from gava_clip_tpu.ops.linear import linear
    from gava_clip_tpu.ops.norm import layer_norm
    rs = np.random.RandomState(9)
    for Bb, Tb, G, H, D in [(1, 2, 1, 1, 16), (2, 4, 3, 2, 32),
                            (5, 2, 2, 4, 32), (3, 8, 8, 2, 64)]:
        BT = Bb * Tb

        def lin_p(din, dout):
            return {"kernel": jnp.asarray(
                rs.randn(din, dout).astype(np.float32) * 0.1),
                "bias": jnp.asarray(rs.randn(dout).astype(np.float32) * 0.01)}

        p = {"cls_proj": lin_p(D, D),
             "summary_ln": {"scale": jnp.asarray(
                 np.abs(rs.randn(D)).astype(np.float32) + 0.5),
                 "bias": jnp.asarray(rs.randn(D).astype(np.float32) * 0.1)},
             "summary_attn": {n: lin_p(D, D)
                              for n in ("q", "k", "v", "out")},
             "local_prompts": jnp.asarray(
                 rs.randn(Tb, D).astype(np.float32) * 0.1)}
        g = jnp.asarray(rs.randn(G, D).astype(np.float32) * 0.1)
        cls = jnp.asarray(rs.randn(BT, D).astype(np.float32) * 0.2)
        le = G + 1 + Tb
        le_pad = le + (-le % 8)

        e, summary = fused_extras(cls, p, g, Tb=Tb, num_heads=H,
                                  le_pad=le_pad)

        cls3 = cls.reshape(Bb, Tb, D)
        cp = linear(p["cls_proj"], cls3)
        sn = layer_norm(cp, p["summary_ln"]["scale"], p["summary_ln"]["bias"])
        want_sum = cp + multi_head_attention(p["summary_attn"], sn, sn, sn,
                                             H, impl="xla")
        lp = p["local_prompts"] + cp
        want_e = jnp.concatenate([
            jnp.broadcast_to(g[None], (BT, G, D)),
            want_sum.reshape(BT, 1, D),
            jnp.broadcast_to(lp[:, None], (Bb, Tb, Tb, D)).reshape(BT, Tb, D),
            jnp.zeros((BT, le_pad - le, D), jnp.float32)], axis=1)
        np.testing.assert_allclose(np.asarray(summary), np.asarray(want_sum),
                                   atol=3e-5, rtol=3e-5,
                                   err_msg=f"{(Bb, Tb, G, H, D)}")
        np.testing.assert_allclose(np.asarray(e), np.asarray(want_e),
                                   atol=3e-5, rtol=3e-5,
                                   err_msg=f"{(Bb, Tb, G, H, D)}")
