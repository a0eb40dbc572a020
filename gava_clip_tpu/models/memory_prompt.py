"""MemoryPromptLearner — KEPLER memory projected into an "X is X" token
template through the frozen text tower.

Counterpart of reference training/memory_head.py:10-77. The reference keeps
this commented out of its live path (VitaCLIP_model.py:15,164-166); it is
rebuilt here for inventory completeness, TPU-first: the per-class
nn.ModuleList loop with one text-tower call per class becomes stacked
projector weights + ONE batched (n_cls·B·sublen, 77) tower call.
"""

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..text import tokenize
from .text import TextConfig, encode_text_embeds

TEMPLATE = "X is X"


def init_memory_prompt_params(rng, num_classes: int, inp_dim: int = 768,
                              out_dim: int = 512,
                              split_mlp: bool = True) -> Dict:
    """Projector MLP inp_dim -> out_dim//2 -> Tanh -> out_dim; class-wise
    stacked bank when split_mlp (reference memory_head.py:33-47)."""
    h = out_dim // 2
    r1, r2 = jax.random.split(rng)

    def lin(r, fan_in, shape):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(r, shape, jnp.float32, -bound, bound)

    if split_mlp:
        return {
            "w1": lin(r1, inp_dim, (num_classes, inp_dim, h)),
            "b1": jnp.zeros((num_classes, h)),
            "w2": lin(r2, h, (num_classes, h, out_dim)),
            "b2": jnp.zeros((num_classes, out_dim)),
        }
    return {
        "w1": lin(r1, inp_dim, (inp_dim, h)), "b1": jnp.zeros((h,)),
        "w2": lin(r2, h, (h, out_dim)), "b2": jnp.zeros((out_dim,)),
    }


def template_slots(text_params, context_length: int = 77):
    """Token embeddings of the 'X is X' template split around the two X
    slots: (tokens (L,), pre (1,W), is (1,W), post (L-4,W))."""
    tokens = np.asarray(tokenize([TEMPLATE])[0])   # [SOT, X, is, X, EOT, 0..]
    emb = np.asarray(text_params["token_embedding"])[tokens]
    return tokens, emb[:1], emb[2:3], emb[4:]


def memory_prompt_features(params: Dict, text_params: Dict, m: jax.Array,
                           v: jax.Array, text_cfg: Optional[TextConfig] = None,
                           split_mlp: bool = True,
                           compute_dtype=jnp.float32) -> jax.Array:
    """m (B, sublen, inp_dim) memory features, v (B, sublen, out_dim) value
    features -> gait-parameter set embeddings:
    (n_cls, B, out_dim) when split_mlp else (B, out_dim)
    (reference memory_head.py:57-77, sublen-mean included)."""
    text_cfg = text_cfg or TextConfig()
    B, S, _ = m.shape
    mf = m.reshape(B * S, -1).astype(jnp.float32)
    vf = v.reshape(B * S, 1, -1).astype(jnp.float32)

    if split_mlp:
        h = jnp.tanh(jnp.einsum("me,ceh->cmh", mf, params["w1"])
                     + params["b1"][:, None])
        mem = jnp.einsum("cmh,cho->cmo", h, params["w2"]) \
            + params["b2"][:, None]                       # (C, B*S, W)
        C = mem.shape[0]
        mem = mem.reshape(C * B * S, 1, -1)
        vf = jnp.tile(vf, (C, 1, 1))
    else:
        hid = jnp.tanh(mf @ params["w1"] + params["b1"])
        mem = (hid @ params["w2"] + params["b2"]).reshape(B * S, 1, -1)
        C = None

    tokens, pre, is_e, post = template_slots(text_params)
    n = mem.shape[0]

    def rep(x):
        return jnp.broadcast_to(jnp.asarray(x, mem.dtype)[None],
                                (n,) + x.shape)

    prompt = jnp.concatenate([rep(pre), mem, rep(is_e), vf, rep(post)],
                             axis=1)                      # (n, 77, W)
    eot_idx = jnp.full((n,), int(np.argmax(tokens)), jnp.int32)
    feats = encode_text_embeds(text_params, prompt, eot_idx, text_cfg,
                               compute_dtype=compute_dtype)
    if split_mlp:
        return feats.reshape(C, B, S, -1).mean(axis=2)
    return feats.reshape(B, S, -1).mean(axis=1)
