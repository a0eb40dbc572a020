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


def _pathological_vision_sd(rs, L=2, D=32, patch=16, mlp=2.0, emb=16,
                            n_local=1, n_global=2, T=2, n_patch=4):
    """Reference-named vision state dict with CLIP-like int8 pathologies:
    LayerNorm gain outlier channels (activation outliers) and heavy-tailed
    weight rows. Shapes follow the tiny test tower."""
    H = int(D * mlp)

    def w(shape, scale=0.02):
        return (rs.randn(*shape) * scale).astype(np.float32)

    def heavy(mat, frac=0.05, boost=16.0):
        idx = rs.choice(mat.shape[1], max(1, int(mat.shape[1] * frac)),
                        replace=False)
        mat[:, idx] *= boost          # torch layout (out, in): boost in-rows
        return mat

    def ln(prefix, d=D):
        g = np.ones(d, np.float32)
        g[rs.choice(d, 2, replace=False)] = 8.0   # outlier gain channels
        return {f"{prefix}.weight": g, f"{prefix}.bias": w((d,), 0.01)}

    sd = {"patch_embed.proj.weight": w((D, 3, patch, patch)),
          "cls_token": w((D,)), "pos_embed": w((n_patch + 1, D)),
          "time_embed": w((T, D)), "proj": w((D, emb)),
          "global_prompts": w((L, n_global, D)),
          **ln("ln_pre"), **ln("ln_post")}
    for i in range(L):
        b = f"blocks.{i}"
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{b}.attn.{nm}.weight"] = heavy(w((D, D)))
            sd[f"{b}.attn.{nm}.bias"] = w((D,), 0.01)
        sd[f"{b}.mlp.fc1.weight"] = heavy(w((H, D)))
        sd[f"{b}.mlp.fc1.bias"] = w((H,), 0.01)
        sd[f"{b}.mlp.fc2.weight"] = heavy(w((D, H)))
        sd[f"{b}.mlp.fc2.bias"] = w((D,), 0.01)
        sd.update(ln(f"{b}.norm1"))
        sd.update(ln(f"{b}.norm2"))
        sd[f"{b}.cls_proj.weight"] = w((D, D))
        sd[f"{b}.cls_proj.bias"] = w((D,), 0.01)
        sd.update(ln(f"{b}.summary_ln"))
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{b}.summary_attn_layer.{nm}.weight"] = w((D, D))
            sd[f"{b}.summary_attn_layer.{nm}.bias"] = w((D,), 0.01)
        sd[f"{b}.local_prompts"] = w((1, T, D))
    return sd


def test_w8a8_gate_on_outlier_bearing_weights():
    """The int8 accuracy gate measured on CLIP-pathology weights, converted
    through utils/torch_convert (VERDICT r2 #2): heavy-tailed weight rows +
    LayerNorm-gain activation-outlier channels — the documented int8 failure
    modes — must still pass the repo-wide prob-delta and a logit tolerance."""
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    from gava_clip_tpu.utils.torch_convert import (convert_vision_tower,
                                                   merge_pytrees)
    rs = np.random.RandomState(0)
    tf = rs.randn(3, 16).astype(np.float32)
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                            patch_size=(16, 16), heads=2, layers=2,
                            mlp_factor=2.0, embed_dim=16,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=2),
        num_classes=3, zeroshot_evaluation=True)
    model = VitaClip(cfg, zeroshot_text_features=tf)
    sd = _pathological_vision_sd(rs)
    converted = convert_vision_tower(sd, num_layers=2)
    params = dict(model.params)
    params["visual"] = merge_pytrees(model.params["visual"], converted)

    video = jnp.asarray(
        rs.rand(2, 2, 32, 32, 3).astype(np.float32))
    ref = model.apply(params, model.buffers, video)["logits"]
    p_ref = np.asarray(jax.nn.softmax(ref, -1), np.float32)

    for mode, logit_tol in (("w8", 0.15), ("w8a8", 0.3)):
        qp = quantize_tower_params(params, act_quant=(mode == "w8a8"))
        got = model.apply(qp, model.buffers, video)["logits"]
        p_q = np.asarray(jax.nn.softmax(got, -1), np.float32)
        prob_delta = np.abs(p_ref - p_q).max()
        logit_delta = np.abs(np.asarray(ref) - np.asarray(got)).max()
        assert prob_delta <= 0.05, (mode, prob_delta)
        assert logit_delta <= logit_tol, (mode, logit_delta)


def test_inject_clip_pathologies_shapes_and_outliers():
    from gava_clip_tpu.utils.flagship import (build_zero_shot,
                                              inject_clip_pathologies)
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
    path = inject_clip_pathologies(model.params, seed=1)
    g0 = np.asarray(model.params["visual"]["blocks"]["norm1"]["scale"])
    g1 = np.asarray(path["visual"]["blocks"]["norm1"]["scale"])
    assert g1.shape == g0.shape
    assert g1.max() >= 4.0 * np.abs(g0).max()          # outlier channels exist
    assert np.asarray(model.params["visual"]["blocks"]["norm1"]["scale"]).max() \
        == g0.max()                                     # input not mutated
    k0 = np.abs(np.asarray(
        model.params["visual"]["blocks"]["mlp"]["fc1"]["kernel"])).max()
    k1 = np.abs(np.asarray(path["visual"]["blocks"]["mlp"]["fc1"]["kernel"])).max()
    assert k1 > 4.0 * k0                                # heavy rows exist


def test_quantization_error_recognizes_all_leaf_forms(tmp_path):
    """'qa' (w8a8) and 'qt' (frozen-train) trees must report a real error,
    never a silent 0.0; a non-quantized tree raises instead of lying."""
    import numpy as np
    import pytest
    from gava_clip_tpu.ops.quant import (quantization_error,
                                         quantize_frozen_for_train,
                                         quantize_tower_params)
    rs = np.random.RandomState(3)
    params = {"blocks": {
        "attn": {"q": {"kernel": rs.randn(32, 32).astype(np.float32)}},
        "mlp": {"fc1": {"kernel": rs.randn(32, 64).astype(np.float32)}}}}
    for qp in (quantize_tower_params(params, act_quant=True),
               quantize_frozen_for_train(params)):
        err = quantization_error(params, qp)
        assert 0 < err < 0.05, err
    with pytest.raises(ValueError, match="no quantized leaves"):
        quantization_error(params, params)


def test_prepare_inference_params_keeps_scales_fp32():
    """bf16 serving cast must NOT downcast the int8 quantization scales:
    the kernel contract is {'qa': int8, 'scale': fp32}, and a bf16 scale
    adds ~0.2%/channel multiplicative weight error on top of what the
    accuracy gate measured."""
    import jax.numpy as jnp
    import numpy as np
    from gava_clip_tpu.ops.quant import prepare_inference_params
    rs = np.random.RandomState(4)
    params = {"blocks": {"attn": {
        "q": {"kernel": rs.randn(32, 32).astype(np.float32),
              "bias": rs.randn(32).astype(np.float32)}}},
        "ln": {"scale": np.ones(32, np.float32)}}
    out = prepare_inference_params(params, "w8a8", jnp.bfloat16)
    q = out["blocks"]["attn"]["q"]
    assert q["kernel"]["qa"].dtype == jnp.int8
    assert q["kernel"]["scale"].dtype == jnp.float32
    assert q["bias"].dtype == jnp.bfloat16
    assert out["ln"]["scale"].dtype == jnp.bfloat16


def test_dequantize_tree_handles_qt_and_sidecar():
    import numpy as np
    import jax.numpy as jnp
    from gava_clip_tpu.ops.quant import (dequantize_tree,
                                         quantize_frozen_for_train,
                                         quantize_tower_params)
    rs = np.random.RandomState(5)
    params = {"visual": {"patch_embed": {"kernel": rs.randn(48, 32)
                                         .astype(np.float32)},
                         "blocks": {"attn": {"q": {
                             "kernel": rs.randn(32, 32)
                             .astype(np.float32)}}}}}
    # frozen-train 'qt' leaves materialize
    qt = quantize_frozen_for_train(params)
    deq = dequantize_tree(qt, jnp.float32)
    k = deq["visual"]["blocks"]["attn"]["q"]["kernel"]
    assert not isinstance(k, dict)
    np.testing.assert_allclose(
        np.asarray(k), params["visual"]["blocks"]["attn"]["q"]["kernel"],
        atol=0.02)
    # the patch-embed sidecar is dropped, the real kernel survives
    qa = quantize_tower_params(params, act_quant=True)
    assert "kernel_q8" in qa["visual"]["patch_embed"]
    deq = dequantize_tree(qa, jnp.float32)
    pe = deq["visual"]["patch_embed"]
    assert "kernel_q8" not in pe and not isinstance(pe["kernel"], dict)
