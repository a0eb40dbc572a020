"""Logit-level parity of the vision/text towers vs the PyTorch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.models.text import TextConfig, encode_text_tokens, init_text_params
from gava_clip_tpu.models.vision import VisionConfig, init_vision_params, vision_encoder
from gava_clip_tpu.utils.torch_convert import (convert_text_tower,
                                               convert_vision_tower)
from gava_clip_tpu.text import tokenize

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="module")
def small_text(reference_modules):
    import torch
    torch.manual_seed(11)
    ref = reference_modules["VitaCLIP_text_encoder"].CLIPTextEncoder(
        embed_dim=32, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=4, transformer_layers=3)
    # text_projection / positional_embedding are torch.empty -> fill them
    with torch.no_grad():
        torch.nn.init.normal_(ref.positional_embedding, std=0.01)
        torch.nn.init.normal_(ref.text_projection, std=0.02)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_text_tower(sd, 3))
    cfg = TextConfig(embed_dim=32, width=64, heads=4, layers=3)
    return ref, params, cfg


def test_text_encoder_parity(small_text):
    import torch
    ref, params, cfg = small_text
    tokens = tokenize(["a photo of a cat", "person walking slowly with difficulty"])
    with torch.no_grad():
        tt = torch.from_numpy(tokens).long()
        embeds = ref.token_embedding(tt)
        want = ref(embeds, tt).numpy()
    got = np.asarray(encode_text_tokens(params, jnp.asarray(tokens), cfg))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_maple_prompt_injection_parity(small_text):
    """MaPLe per-layer prompt replacement matches reference
    Transformer.forward(maple_prompts=...) (text_encoder.py:97-118)."""
    import torch
    from gava_clip_tpu.models.text import text_transformer, TextConfig
    ref, params, cfg = small_text
    rs = np.random.RandomState(8)
    x = rs.randn(2, 77, 64).astype(np.float32)
    maple = [torch.from_numpy(rs.randn(4, 64).astype(np.float32))
             for _ in range(cfg.layers - 1)]
    with torch.no_grad():
        want = ref.transformer(torch.from_numpy(x).permute(1, 0, 2),
                               maple_prompts=maple).permute(1, 0, 2).numpy()
    maple_j = jnp.asarray(np.stack([m.numpy() for m in maple]))
    got = np.asarray(text_transformer(params, jnp.asarray(x), cfg,
                                      maple_prompts=maple_j))
    np.testing.assert_allclose(got, want, atol=2e-5)


def _make_ref_vision(reference_modules, **kw):
    import torch
    torch.manual_seed(12)
    ref = reference_modules["VitaCLIP_vision_encoder"].CLIPVisionEncoder(
        input_size=(32, 32), num_frames=4, feature_dim=48, patch_size=(16, 16),
        num_heads=4, num_layers=2, mlp_factor=2.0, embed_dim=24, **kw)
    ref.eval()
    return ref


def _convert(ref, **cfg_kw):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_vision_tower(sd, 2))
    cfg = VisionConfig(input_size=(32, 32), num_frames=4, feature_dim=48,
                       patch_size=(16, 16), heads=4, layers=2, mlp_factor=2.0,
                       embed_dim=24, **cfg_kw)
    return params, cfg


def test_vision_encoder_parity_all_prompts(reference_modules):
    """The flagship configuration: summary + local + global prompts on."""
    import torch
    ref = _make_ref_vision(reference_modules, use_summary_token=True,
                           use_local_prompts=True, use_global_prompts=True,
                           num_global_prompts=3)
    params, cfg = _convert(ref, use_summary_token=True, use_local_prompts=True,
                           use_global_prompts=True, num_global_prompts=3)
    x = np.random.RandomState(0).randn(2, 4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        # reference layout: (B, C, T, H, W)
        want_feat, want_sum = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    got_feat, got_sum = vision_encoder(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(got_feat), want_feat.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_sum), want_sum.numpy(), atol=2e-5)


@pytest.mark.parametrize("flags", [
    dict(use_summary_token=True),
    dict(use_summary_token=True, use_local_prompts=True),
    dict(use_local_prompts=True, use_global_prompts=True, num_global_prompts=2),
])
def test_vision_encoder_parity_prompt_combos(reference_modules, flags):
    """Each prompt-flag combination matches the reference — except the
    promptless/summaryless reference paths that crash (SURVEY.md §2.8-1);
    combos here all keep the reference runnable."""
    import torch
    if not flags.get("use_global_prompts"):
        # reference encoder loop without global prompts is broken (x=blk(x)
        # tuple assignment); emulate by adding globals on both sides? No —
        # only the summary path keeps `summary` bound; test via block-level
        # equivalence instead for those combos.
        ref = _make_ref_vision(reference_modules, **flags)
        blk = ref.blocks[0]
        x = torch.randn(8, 5, 48)  # (B*T, N, C) with T=4 -> B=2
        with torch.no_grad():
            want, want_summary = blk(x)
        params, cfg = _convert(ref, **flags)
        from gava_clip_tpu.models.vision import _block
        p0 = jax.tree_util.tree_map(lambda a: a[0], params["blocks"])
        g = jnp.zeros((0, 48))
        got, got_summary = _block(p0, g, jnp.asarray(x.numpy()), cfg, "xla")
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)
        if want_summary is not None:
            np.testing.assert_allclose(np.asarray(got_summary),
                                       want_summary.numpy(), atol=2e-5)
        return
    ref = _make_ref_vision(reference_modules, **flags)
    params, cfg = _convert(ref, **flags)
    x = np.random.RandomState(7).randn(2, 4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want_feat, _ = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    got_feat, _ = vision_encoder(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(got_feat), want_feat.numpy(), atol=2e-5)


def test_vision_encoder_parity_global_only(reference_modules):
    import torch
    ref = _make_ref_vision(reference_modules, use_global_prompts=True,
                           num_global_prompts=2)
    params, cfg = _convert(ref, use_global_prompts=True, num_global_prompts=2)
    x = np.random.RandomState(1).randn(1, 4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want_feat, want_sum = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    got_feat, got_sum = vision_encoder(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(got_feat), want_feat.numpy(), atol=2e-5)
    assert got_sum is None and want_sum is None


def test_vision_promptless_path_works():
    """Reference quirk SURVEY.md §2.8-1 (promptless forward crashes) is fixed."""
    cfg = VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                       patch_size=(16, 16), heads=2, layers=2, embed_dim=16)
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 2, 32, 32, 3))
    feat, summary = vision_encoder(params, x, cfg)
    assert feat.shape == (1, 16) and summary is None


def test_time_embed_resize_matches_reference(reference_modules):
    """Eval with T != train T exercises the nearest-neighbor time resize."""
    import torch
    ref = _make_ref_vision(reference_modules, use_summary_token=True,
                           use_local_prompts=True, use_global_prompts=True,
                           num_global_prompts=2)
    params, cfg = _convert(ref, use_summary_token=True, use_local_prompts=True,
                           use_global_prompts=True, num_global_prompts=2)
    x = np.random.RandomState(2).randn(1, 8, 32, 32, 3).astype(np.float32)  # T=8, train T=4
    with torch.no_grad():
        want_feat, _ = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    got_feat, _ = vision_encoder(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(got_feat), want_feat.numpy(), atol=2e-5)


def test_init_shapes_match_converted(reference_modules):
    """Fresh init produces the same pytree structure as torch conversion."""
    ref = _make_ref_vision(reference_modules, use_summary_token=True,
                           use_local_prompts=True, use_global_prompts=True,
                           num_global_prompts=3)
    params, cfg = _convert(ref, use_summary_token=True, use_local_prompts=True,
                           use_global_prompts=True, num_global_prompts=3)
    fresh = init_vision_params(jax.random.PRNGKey(0), cfg)
    want = jax.tree_util.tree_map(lambda a: a.shape, params)
    got = jax.tree_util.tree_map(lambda a: a.shape, fresh)
    assert want == got

    tcfg = TextConfig(embed_dim=32, width=64, heads=4, layers=3)
    fresh_t = init_text_params(jax.random.PRNGKey(1), tcfg)
    assert set(fresh_t.keys()) == {"token_embedding", "positional_embedding",
                                   "blocks", "ln_final", "text_projection"}


def test_patch_major_input_matches_frames():
    """input_format='patches' (host patchify + GEMM embed) must match the
    frames conv path exactly — same math, different layout."""
    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.models.vision import (VisionConfig, init_vision_params,
                                             patchify, vision_encoder)
    cfg = VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                       patch_size=(16, 16), heads=2, layers=2,
                       mlp_factor=2.0, embed_dim=16,
                       use_summary_token=True, use_local_prompts=True,
                       use_global_prompts=True, num_global_prompts=2)
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.rand(2, 2, 32, 32, 3).astype(np.float32))
    f_feat, f_sum = vision_encoder(params, video, cfg)
    p_feat, p_sum = vision_encoder(params, patchify(video, cfg.patch_size),
                                   cfg, input_format="patches")
    np.testing.assert_allclose(np.asarray(p_feat), np.asarray(f_feat),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p_sum), np.asarray(f_sum),
                               rtol=2e-5, atol=2e-5)


def test_patch_major_w8a8_sidecar():
    """quantize_tower_params(act_quant=True) adds an int8 sidecar for the
    patch embed without touching the conv kernel; the patches path stays
    close to fp on it."""
    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.models.vision import (VisionConfig, init_vision_params,
                                             patchify, vision_encoder)
    from gava_clip_tpu.ops.quant import quantize_tower_params
    cfg = VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                       patch_size=(16, 16), heads=2, layers=2,
                       mlp_factor=2.0, embed_dim=16)
    params = {"visual": init_vision_params(jax.random.PRNGKey(0), cfg)}
    qp = quantize_tower_params(params, act_quant=True)
    pe = qp["visual"]["patch_embed"]
    assert not isinstance(pe["kernel"], dict)           # conv path untouched
    assert set(pe["kernel_q8"].keys()) == {"qa", "scale"}
    rs = np.random.RandomState(1)
    video = jnp.asarray(rs.rand(1, 2, 32, 32, 3).astype(np.float32))
    ref_feat, _ = vision_encoder(params["visual"], video, cfg)
    q_feat, _ = vision_encoder(qp["visual"], patchify(video, cfg.patch_size),
                               cfg, input_format="patches")
    np.testing.assert_allclose(np.asarray(q_feat), np.asarray(ref_feat),
                               atol=0.05)


def test_non_default_patch_size_geometry():
    """--patch_size is part of the reference's public flag surface
    (training/train.py:91, default 16); pin a ViT-L/14-style non-16 patch:
    conv embed == patch-major GEMM embed at patch 8 on a 24x24 input
    (3x3 patch grid — odd token count exercises the pad/align paths)."""
    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.models.vision import (VisionConfig, init_vision_params,
                                             patchify, vision_encoder)
    cfg = VisionConfig(input_size=(24, 24), num_frames=2, feature_dim=32,
                       patch_size=(8, 8), heads=2, layers=2,
                       mlp_factor=2.0, embed_dim=16,
                       use_summary_token=True, use_local_prompts=True,
                       use_global_prompts=True, num_global_prompts=2)
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(2)
    video = jnp.asarray(rs.rand(2, 2, 24, 24, 3).astype(np.float32))
    f_feat, f_sum = vision_encoder(params, video, cfg)
    assert f_feat.shape[0] == 2
    p_feat, p_sum = vision_encoder(params, patchify(video, cfg.patch_size),
                                   cfg, input_format="patches")
    np.testing.assert_allclose(np.asarray(p_feat), np.asarray(f_feat),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p_sum), np.asarray(f_sum),
                               rtol=2e-5, atol=2e-5)
