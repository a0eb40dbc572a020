"""MemoryPromptLearner parity vs reference memory_head.py (dead code in the
reference's live path — rebuilt for inventory completeness)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.models.memory_prompt import (init_memory_prompt_params,
                                                memory_prompt_features,
                                                template_slots)
from gava_clip_tpu.models.text import TextConfig
from gava_clip_tpu.utils.torch_convert import convert_text_tower

jax.config.update("jax_default_matmul_precision", "highest")

N_CLS, B, SUBLEN, INP, OUT = 3, 2, 3, 24, 32


@pytest.fixture(scope="module")
def towers(reference_modules):
    import torch
    torch.manual_seed(11)
    txt = reference_modules["VitaCLIP_text_encoder"].CLIPTextEncoder(
        embed_dim=OUT, transformer_width=OUT, transformer_heads=2,
        transformer_layers=2)
    with torch.no_grad():
        torch.nn.init.normal_(txt.positional_embedding, std=0.01)
        torch.nn.init.normal_(txt.text_projection, std=0.02)
    txt.eval()
    sd = {k: v.detach().numpy().copy() for k, v in txt.state_dict().items()}
    cfg = TextConfig(embed_dim=OUT, width=OUT, heads=2, layers=2)
    params = jax.tree_util.tree_map(jnp.asarray, convert_text_tower(sd, 2))
    return txt, params, cfg


def _torch_learner(reference_modules, txt, split):
    import torch
    torch.manual_seed(12)
    ref_mod = reference_modules["memory_head"]
    return ref_mod.MemoryPromptLearner(
        txt, N_CLS, splitMLP=split, sublen=SUBLEN, inp_dim=INP, out_dim=OUT,
        batch_size=B)


def _convert(ref, split):
    import torch
    if split:
        return {
            "w1": jnp.stack([jnp.asarray(ref.mem_projet[c][0].weight.detach().numpy().T)
                             for c in range(N_CLS)]),
            "b1": jnp.stack([jnp.asarray(ref.mem_projet[c][0].bias.detach().numpy())
                             for c in range(N_CLS)]),
            "w2": jnp.stack([jnp.asarray(ref.mem_projet[c][2].weight.detach().numpy().T)
                             for c in range(N_CLS)]),
            "b2": jnp.stack([jnp.asarray(ref.mem_projet[c][2].bias.detach().numpy())
                             for c in range(N_CLS)]),
        }
    return {"w1": jnp.asarray(ref.mem_projet[0].weight.detach().numpy().T),
            "b1": jnp.asarray(ref.mem_projet[0].bias.detach().numpy()),
            "w2": jnp.asarray(ref.mem_projet[2].weight.detach().numpy().T),
            "b2": jnp.asarray(ref.mem_projet[2].bias.detach().numpy())}


def test_template_slots(towers):
    _, params, _ = towers
    tokens, pre, is_e, post = template_slots(params)
    assert tokens[0] == 49406 and tokens[4] == 49407  # SOT ... EOT
    assert pre.shape == (1, OUT) and is_e.shape == (1, OUT)
    assert post.shape == (73, OUT)
    assert 1 + 1 + 1 + 1 + 73 == 77


@pytest.mark.parametrize("split", [True, False], ids=["class_wise", "shared"])
def test_memory_prompt_parity(reference_modules, towers, split):
    import torch
    txt, params, cfg = towers
    ref = _torch_learner(reference_modules, txt, split)
    our = _convert(ref, split)

    rs = np.random.RandomState(3)
    m = rs.randn(B, SUBLEN, INP).astype(np.float32)
    v = rs.randn(B, SUBLEN, OUT).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(m),
                   torch.from_numpy(v.reshape(B * SUBLEN, OUT))).numpy()
    got = np.asarray(memory_prompt_features(our, params, jnp.asarray(m),
                                            jnp.asarray(v), cfg,
                                            split_mlp=split))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_init_shapes():
    p = init_memory_prompt_params(jax.random.PRNGKey(0), N_CLS, INP, OUT)
    assert p["w1"].shape == (N_CLS, INP, OUT // 2)
    assert p["w2"].shape == (N_CLS, OUT // 2, OUT)
    p2 = init_memory_prompt_params(jax.random.PRNGKey(0), N_CLS, INP, OUT,
                                   split_mlp=False)
    assert p2["w1"].shape == (INP, OUT // 2)
