"""Weight-only int8 quantization: round-trip error, selective targeting,
serving-path agreement with the fp path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.ops.quant import (dequantize_tree, quantization_error,
                                     quantize_tower_params, quantize_weight)


def test_quantize_weight_roundtrip():
    rs = np.random.RandomState(0)
    w = rs.randn(64, 32).astype(np.float32) * 0.05
    q, scale = quantize_weight(w)
    assert q.dtype == np.int8 and scale.shape == (1, 32)
    deq = q.astype(np.float32) * scale
    rel = np.linalg.norm(deq - w) / np.linalg.norm(w)
    assert rel < 0.01


def test_quantize_tower_selective():
    params = {
        "blocks": {"attn": {"q": {"kernel": np.random.randn(2, 16, 16)
                                  .astype(np.float32),
                                  "bias": np.zeros((2, 16), np.float32)}},
                   "mlp": {"fc1": {"kernel": np.random.randn(2, 16, 32)
                                   .astype(np.float32)}},
                   "norm1": {"scale": np.ones((2, 16), np.float32)}},
        "proj": np.random.randn(16, 8).astype(np.float32),
    }
    qp = quantize_tower_params(params)
    assert set(qp["blocks"]["attn"]["q"]["kernel"].keys()) == {"q", "scale"}
    assert set(qp["blocks"]["mlp"]["fc1"]["kernel"].keys()) == {"q", "scale"}
    # non-projection leaves untouched
    assert isinstance(qp["proj"], np.ndarray)
    assert isinstance(qp["blocks"]["norm1"]["scale"], np.ndarray)
    assert isinstance(qp["blocks"]["attn"]["q"]["bias"], np.ndarray)

    err = quantization_error(params, qp)
    assert 0 < err < 0.02

    deq = dequantize_tree(qp, jnp.float32)
    rel = np.linalg.norm(np.asarray(deq["blocks"]["mlp"]["fc1"]["kernel"])
                         - params["blocks"]["mlp"]["fc1"]["kernel"]) \
        / np.linalg.norm(params["blocks"]["mlp"]["fc1"]["kernel"])
    assert rel < 0.02


def test_quantized_serving_close_to_fp(tmp_path):
    from gava_clip_tpu.serve import VideoClassifier
    from tests.test_serve import tiny_classifier  # fixture import (unused)
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                            patch_size=(16, 16), heads=2, layers=2,
                            mlp_factor=2.0, embed_dim=16,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=2),
        num_classes=3, zeroshot_evaluation=True)
    model = VitaClip(cfg, zeroshot_text_features=tf)
    names = ["a", "b", "c"]
    clf_fp = VideoClassifier.from_model(model, names, batch_size=2,
                                        compute_dtype=jnp.float32)
    clf_q = VideoClassifier(model, model.params, names, batch_size=2,
                            compute_dtype=jnp.float32, quantize=True)
    clips = np.random.RandomState(1).randint(0, 255, (2, 2, 32, 32, 3), np.uint8)
    p_fp = clf_fp.classify_clips(clips)
    p_q = clf_q.classify_clips(clips)
    np.testing.assert_allclose(p_q, p_fp, atol=0.05)


def test_w8a8_serving_close_to_fp():
    """Dynamic activation quant + int8 GEMM path: probs within 0.05 of fp."""
    from gava_clip_tpu.serve import VideoClassifier
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                            patch_size=(16, 16), heads=2, layers=2,
                            mlp_factor=2.0, embed_dim=16,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=2),
        num_classes=3, zeroshot_evaluation=True)
    model = VitaClip(cfg, zeroshot_text_features=tf)
    names = ["a", "b", "c"]
    clf_fp = VideoClassifier.from_model(model, names, batch_size=2,
                                        compute_dtype=jnp.float32)
    clf_q = VideoClassifier(model, model.params, names, batch_size=2,
                            compute_dtype=jnp.float32, quantize="w8a8")
    # patch_embed stays bf16 even in w8a8 mode (the conv's patch relayout
    # fuses in XLA; feeding a Pallas GEMM would materialize the transpose)
    assert not isinstance(clf_q.params["visual"]["patch_embed"]["kernel"],
                          dict)
    # the attention/MLP projections ARE act-quantized
    assert set(clf_q.params["visual"]["blocks"]["mlp"]["fc1"]["kernel"]
               .keys()) == {"qa", "scale"}
    clips = np.random.RandomState(1).randint(0, 255, (2, 2, 32, 32, 3),
                                             np.uint8)
    p_fp = clf_fp.classify_clips(clips)
    p_q = clf_q.classify_clips(clips)
    np.testing.assert_allclose(p_q, p_fp, atol=0.05)


def test_int8_dynamic_linear_matches_fp():
    from gava_clip_tpu.ops.int8_matmul import int8_dynamic_linear
    from gava_clip_tpu.ops.quant import quantize_weight
    rs = np.random.RandomState(2)
    w = rs.randn(64, 48).astype(np.float32) * 0.05
    b = rs.randn(48).astype(np.float32) * 0.01
    x = rs.randn(3, 10, 64).astype(np.float32)
    q, scale = quantize_weight(w)
    params = {"kernel": {"qa": jnp.asarray(q), "scale": jnp.asarray(scale)},
              "bias": jnp.asarray(b)}
    got = np.asarray(int8_dynamic_linear(params, jnp.asarray(x)))
    want = x @ w + b
    # int8 x int8 with per-token/per-channel scales: ~1% relative error
    assert np.abs(got - want).max() / np.abs(want).max() < 0.02
