"""Golden tests for the core math kit against the PyTorch reference modules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.ops import quick_gelu, layer_norm, multi_head_attention

jax.config.update("jax_default_matmul_precision", "highest")


def test_quick_gelu_matches_reference(reference_modules):
    import torch
    torch.manual_seed(1)
    ref = reference_modules["VitaCLIP_vision_encoder_utils"].QuickGELU()
    x = torch.randn(4, 33, 64)
    want = ref(x).numpy()
    got = np.asarray(quick_gelu(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_layer_norm_matches_reference(reference_modules):
    import torch
    torch.manual_seed(2)
    ln = reference_modules["VitaCLIP_vision_encoder_utils"].LayerNorm(48)
    with torch.no_grad():
        ln.weight.copy_(torch.randn(48))
        ln.bias.copy_(torch.randn(48))
    x = torch.randn(5, 7, 48)
    want = ln(x).detach().numpy()
    got = np.asarray(layer_norm(jnp.asarray(x.numpy()),
                                jnp.asarray(ln.weight.detach().numpy()),
                                jnp.asarray(ln.bias.detach().numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _attn_params_from_torch(attn):
    """Convert the reference Attention module's weights to our layout."""
    def cv(linear):
        return {"kernel": jnp.asarray(linear.weight.detach().numpy().T),
                "bias": jnp.asarray(linear.bias.detach().numpy())}
    return {"q": cv(attn.q_proj), "k": cv(attn.k_proj),
            "v": cv(attn.v_proj), "out": cv(attn.out_proj)}


def test_attention_matches_reference(reference_modules):
    import torch
    torch.manual_seed(3)
    Attention = reference_modules["VitaCLIP_vision_encoder_utils"].Attention
    attn = Attention(q_in_dim=64, k_in_dim=64, v_in_dim=64,
                     qk_proj_dim=64, v_proj_dim=64, num_heads=4, out_dim=64)
    x = torch.randn(3, 11, 64)
    with torch.no_grad():
        want = attn(x, x, x).numpy()
    params = _attn_params_from_torch(attn)
    xj = jnp.asarray(x.numpy())
    got = np.asarray(multi_head_attention(params, xj, xj, xj, num_heads=4))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_causal_mask_matches_torch_mha(reference_modules):
    """Text tower uses nn.MultiheadAttention + additive causal mask."""
    import torch
    torch.manual_seed(4)
    d, h, L = 32, 4, 9
    mha = torch.nn.MultiheadAttention(d, h)
    mask = torch.full((L, L), float("-inf")).triu_(1)
    x = torch.randn(L, 2, d)  # (L, N, D) torch MHA layout
    with torch.no_grad():
        want = mha(x, x, x, need_weights=False, attn_mask=mask)[0].numpy()

    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    params = {
        "q": {"kernel": jnp.asarray(w[:d].T), "bias": jnp.asarray(b[:d])},
        "k": {"kernel": jnp.asarray(w[d:2 * d].T), "bias": jnp.asarray(b[d:2 * d])},
        "v": {"kernel": jnp.asarray(w[2 * d:].T), "bias": jnp.asarray(b[2 * d:])},
        "out": {"kernel": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
                "bias": jnp.asarray(mha.out_proj.bias.detach().numpy())},
    }
    xj = jnp.asarray(x.numpy()).transpose(1, 0, 2)  # (N, L, D)
    mj = jnp.asarray(mask.numpy())
    got = np.asarray(multi_head_attention(params, xj, xj, xj, num_heads=h, mask=mj))
    np.testing.assert_allclose(got, want.transpose(1, 0, 2), atol=1e-5)
