"""Pipeline parallelism (parallel/pipeline.py): GPipe over stacked-weight
towers must be numerically identical to the sequential lax.scan, on 2- and
4-stage meshes, with and without microbatching."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gava_clip_tpu.parallel.pipeline import pipeline_scan, stage_params


def _pipe_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("pipe",))


def _toy_stack(L=4, D=16, rs=None):
    rs = rs or np.random.RandomState(0)
    return {"w": jnp.asarray(rs.randn(L, D, D).astype(np.float32) * 0.2),
            "b": jnp.asarray(rs.randn(L, D).astype(np.float32) * 0.1)}


def _toy_block(carry, p):
    return jnp.tanh(carry @ p["w"] + p["b"])


@pytest.mark.parametrize("stages,microbatches", [(2, 1), (2, 2), (4, 4),
                                                 (4, 2)])
def test_pipeline_matches_sequential_scan(stages, microbatches):
    rs = np.random.RandomState(1)
    stacked = _toy_stack(L=4, rs=rs)
    x = jnp.asarray(rs.randn(8, 16).astype(np.float32))

    def body(c, p):
        return _toy_block(c, p), None
    want, _ = jax.lax.scan(body, x, stacked)

    mesh = _pipe_mesh(stages)
    staged = stage_params(stacked, mesh)
    got = pipeline_scan(_toy_block, staged, x, mesh,
                        microbatches=microbatches)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_real_vision_block():
    """The ACTUAL vision transformer block (summary token + local/global
    prompts) pipelined over 2 stages == its sequential scan — no per-layer
    surgery needed because the tower already stacks weights for lax.scan
    (models/vision.py)."""
    from gava_clip_tpu.models.vision import VisionConfig, _block
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                       patch_size=(16, 16), heads=2, layers=4,
                       mlp_factor=2.0, embed_dim=16,
                       use_summary_token=True, use_local_prompts=True,
                       use_global_prompts=True, num_global_prompts=2)
    model = VitaClip(VitaClipConfig(vision=cfg, num_classes=3,
                                    zeroshot_evaluation=True),
                     zeroshot_text_features=tf)
    vp = model.params["visual"]
    blocks = vp["blocks"]
    g_prompts = vp["global_prompts"]

    rs = np.random.RandomState(3)
    B, T, L_tok, D = 2, 2, 13, 32
    h = jnp.asarray(rs.randn(B * T, L_tok, D).astype(np.float32) * 0.1)
    s0 = jnp.zeros((B, T, D), jnp.float32)

    def block_fn(carry, layer_params):
        x, _ = carry
        p, g = layer_params
        x, summary = _block(p, g, x, cfg, "xla")
        if summary is None:
            summary = jnp.zeros((B, T, D), x.dtype)
        return (x, summary)

    def body(c, p):
        return block_fn(c, p), None
    want_x, want_s = jax.lax.scan(body, (h, s0), (blocks, g_prompts))[0]

    mesh = _pipe_mesh(2)
    staged = stage_params((blocks, g_prompts), mesh)
    got_x, got_s = pipeline_scan(block_fn, staged, (h, s0), mesh,
                                 microbatches=2)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stages,microbatches,remat",
                         [(2, 2, False), (4, 2, False), (2, 2, True)])
def test_pipeline_backward_matches_sequential(stages, microbatches, remat):
    """GPipe BACKWARD (VERDICT r4 #6): jax.grad through pipeline_scan (the
    schedule is a lax.scan, every op incl. ppermute transposable) must
    reproduce the sequential tower's gradients for both the stacked weights
    and the input — i.e. the reverse ppermute schedule + per-stage
    microbatch grad accumulation is exact, with and without block remat."""
    rs = np.random.RandomState(5)
    stacked = _toy_stack(L=4, rs=rs)
    x = jnp.asarray(rs.randn(8, 16).astype(np.float32))
    tgt = jnp.asarray(rs.randn(8, 16).astype(np.float32))

    def seq_loss(params, xx):
        def body(c, p):
            return _toy_block(c, p), None
        out, _ = jax.lax.scan(body, xx, params)
        return jnp.mean((out - tgt) ** 2)

    want_gp, want_gx = jax.grad(seq_loss, argnums=(0, 1))(stacked, x)

    mesh = _pipe_mesh(stages)
    staged = stage_params(stacked, mesh)

    def pipe_loss(sp, xx):
        out = pipeline_scan(_toy_block, sp, xx, mesh,
                            microbatches=microbatches, remat=remat)
        return jnp.mean((out - tgt) ** 2)

    got_gp, got_gx = jax.grad(pipe_loss, argnums=(0, 1))(staged, x)
    for k in stacked:
        want = np.asarray(want_gp[k])
        got = np.asarray(got_gp[k]).reshape(want.shape)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(want_gx),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_train_step_grads_real_block():
    """Gradients through the REAL vision block pipelined over 2 stages ==
    the sequential scan's — the pp surface trains, not just serves."""
    from gava_clip_tpu.models.vision import VisionConfig, _block
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                       patch_size=(16, 16), heads=2, layers=4,
                       mlp_factor=2.0, embed_dim=16,
                       use_summary_token=True, use_local_prompts=True,
                       use_global_prompts=True, num_global_prompts=2)
    model = VitaClip(VitaClipConfig(vision=cfg, num_classes=3,
                                    zeroshot_evaluation=True),
                     zeroshot_text_features=tf)
    vp = model.params["visual"]
    rs = np.random.RandomState(9)
    B, T, L_tok, D = 2, 2, 13, 32
    h = jnp.asarray(rs.randn(B * T, L_tok, D).astype(np.float32) * 0.1)
    s0 = jnp.zeros((B, T, D), jnp.float32)

    def block_fn(carry, layer_params):
        x, _ = carry
        p, g = layer_params
        x, summary = _block(p, g, x, cfg, "xla")
        if summary is None:
            summary = jnp.zeros((B, T, D), x.dtype)
        return (x, summary)

    def seq_loss(stacked):
        def body(c, p):
            return block_fn(c, p), None
        (out_x, out_s), _ = jax.lax.scan(body, (h, s0), stacked)
        return jnp.mean(out_x ** 2) + jnp.mean(out_s ** 2)

    stacked = (vp["blocks"], vp["global_prompts"])
    want = jax.grad(seq_loss)(stacked)

    mesh = _pipe_mesh(2)
    staged = stage_params(stacked, mesh)

    def pipe_loss(sp):
        out_x, out_s = pipeline_scan(block_fn, sp, (h, s0), mesh,
                                     microbatches=2)
        return jnp.mean(out_x ** 2) + jnp.mean(out_s ** 2)

    got = jax.grad(pipe_loss)(staged)
    flat_w, _ = jax.tree_util.tree_flatten(want)
    flat_g, _ = jax.tree_util.tree_flatten(got)
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(g).reshape(np.asarray(w).shape),
                                   np.asarray(w), atol=2e-5, rtol=2e-5)


def test_stage_params_validates_divisibility():
    mesh = _pipe_mesh(2)
    with pytest.raises(ValueError, match="not divisible"):
        stage_params({"w": jnp.zeros((3, 4, 4))}, mesh)


def test_pipeline_full_model_forward_matches_default():
    """model.apply(pp=(mesh, M)) — the ENTIRE zero-shot forward with the
    vision block stack pipelined over 2 stages — must reproduce the
    default sequential logits (vision.py wires parallel/pipeline.py behind
    the pp kwarg)."""
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                       patch_size=(16, 16), heads=2, layers=4,
                       mlp_factor=2.0, embed_dim=16,
                       use_summary_token=True, use_local_prompts=True,
                       use_global_prompts=True, num_global_prompts=2)
    model = VitaClip(VitaClipConfig(vision=cfg, num_classes=3,
                                    zeroshot_evaluation=True),
                     zeroshot_text_features=tf)
    rs = np.random.RandomState(4)
    video = jnp.asarray(rs.rand(4, 2, 32, 32, 3).astype(np.float32))

    want = np.asarray(model.apply(model.params, model.buffers,
                                  video)["logits"], np.float32)
    mesh = _pipe_mesh(2)
    got = np.asarray(model.apply(model.params, model.buffers, video,
                                 pp=(mesh, 2))["logits"], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pipeline_no_summary_token_microbatched():
    """Regression (round-4 review): with use_summary_token=False the
    scan_body substitute summary must size from the LOCAL microbatch, not
    the closed-over full batch — pp=(mesh, M>1) used to trip a fori_loop
    carry-shape mismatch on prompts-off configs."""
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                       patch_size=(16, 16), heads=2, layers=4,
                       mlp_factor=2.0, embed_dim=16,
                       use_summary_token=False, use_local_prompts=False,
                       use_global_prompts=False)
    model = VitaClip(VitaClipConfig(vision=cfg, num_classes=3,
                                    zeroshot_evaluation=True),
                     zeroshot_text_features=tf)
    rs = np.random.RandomState(8)
    video = jnp.asarray(rs.rand(4, 2, 32, 32, 3).astype(np.float32))
    want = np.asarray(model.apply(model.params, model.buffers,
                                  video)["logits"], np.float32)
    got = np.asarray(model.apply(model.params, model.buffers, video,
                                 pp=(_pipe_mesh(2), 2))["logits"],
                     np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
