"""KAPT projector variants: class-wise uni (flagship), token-wise (the fixed
form of the reference's broken branch), and zero-init behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.models.prompts import (PromptConfig, _project_knowledge,
                                          assemble_prompts, init_prompt_params)


def _cfg(**kw):
    base = dict(n_cls=3, n_ctx=4, ctx_dim=32, emb_dim=8,
                init="cntn_split_uni_disc", csc=True,
                knowledge_versions=("v1", "v2"))
    base.update(kw)
    return PromptConfig(**base)


def test_zero_init_projector_is_identity_ctx():
    """Zero-init KAPT projector adds nothing at step 0 (kapt_head.py:17-22)."""
    cfg = _cfg()
    params = init_prompt_params(jax.random.PRNGKey(0), cfg)
    cntn = jnp.asarray(np.random.RandomState(0).randn(3, 2, 768), jnp.float32)
    out = _project_knowledge(params["projector"], cntn, cfg)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_class_uni_projection_shapes_and_classwise():
    cfg = _cfg()
    rs = np.random.RandomState(1)
    proj = {"w1": jnp.asarray(rs.randn(3, 768, 8), jnp.float32),
            "w2": jnp.asarray(rs.randn(3, 8, 32), jnp.float32)}
    cntn = jnp.asarray(rs.randn(3, 2, 768), jnp.float32)
    out = np.asarray(_project_knowledge(proj, cntn, cfg))
    assert out.shape == (3, 2, 4, 32)
    # broadcast over token positions
    np.testing.assert_allclose(out[:, :, 0], out[:, :, 1])
    # per-class weights: recompute class 1 by hand
    h = np.maximum(np.asarray(cntn)[1] @ np.asarray(proj["w1"])[1], 0)
    want = h @ np.asarray(proj["w2"])[1]
    np.testing.assert_allclose(out[1, :, 0], want, rtol=1e-3, atol=1e-3)


def test_token_wise_projection():
    cfg = _cfg(init="cntn_disc", token_wise_mlp=True)
    rs = np.random.RandomState(2)
    proj = {"w1": jnp.asarray(rs.randn(4, 768, 8), jnp.float32),
            "b1": jnp.asarray(rs.randn(4, 8), jnp.float32),
            "w2": jnp.asarray(rs.randn(4, 8, 32), jnp.float32),
            "b2": jnp.asarray(rs.randn(4, 32), jnp.float32)}
    cntn = jnp.asarray(rs.randn(3, 2, 768), jnp.float32)
    out = np.asarray(_project_knowledge(proj, cntn, cfg))
    assert out.shape == (3, 2, 4, 32)
    # token positions differ (per-token MLPs)
    assert not np.allclose(out[:, :, 0], out[:, :, 1])
    # hand-check class 0, kv 0, token 2
    x = np.asarray(cntn)[0, 0]
    h = np.maximum(x @ np.asarray(proj["w1"])[2] + np.asarray(proj["b1"])[2], 0)
    want = h @ np.asarray(proj["w2"])[2] + np.asarray(proj["b2"])[2]
    np.testing.assert_allclose(out[0, 0, 2], want, rtol=1e-3, atol=1e-3)
