"""CLIP text tower, TPU-native.

Functionally equivalent to the reference CLIPTextEncoder
(training/VitaCLIP_text_encoder.py:120-171): 12x width-512, 8-head
pre-LN transformer with a causal mask, fp32 LayerNorm islands, EOT-token
pooling through a (width, embed_dim) projection.

Design differences from the torch reference (TPU-first):
  * all layers' weights are stacked on a leading axis and the tower runs as a
    single `lax.scan` — one compiled block regardless of depth;
  * the whole (n_cls * n_kv) prompt batch is encoded in ONE call instead of a
    per-class Python loop (reference VitaCLIP_model.py:282-290);
  * softmax/LN in fp32, matmuls in the configured compute dtype.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import layer_norm, multi_head_attention, mlp, quick_gelu
from .common import init_attention, init_layer_norm, init_linear


@dataclass(frozen=True)
class TextConfig:
    embed_dim: int = 512
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12


def init_text_params(rng, cfg: TextConfig):
    rngs = jax.random.split(rng, 6)
    width = cfg.width

    def one_block(r):
        r1, r2, r3 = jax.random.split(r, 3)
        return {
            "attn": init_attention(r1, width),
            "ln_1": init_layer_norm(width),
            "mlp": {"fc1": init_linear(r2, width, width * 4),
                    "fc2": init_linear(r3, width * 4, width)},
            "ln_2": init_layer_norm(width),
        }

    block_rngs = jax.random.split(rngs[0], cfg.layers)
    blocks = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[one_block(r) for r in block_rngs])

    return {
        "token_embedding": 0.02 * jax.random.normal(rngs[1], (cfg.vocab_size, width)),
        "positional_embedding": 0.01 * jax.random.normal(rngs[2], (cfg.context_length, width)),
        "blocks": blocks,
        "ln_final": init_layer_norm(width),
        "text_projection": (width ** -0.5) * jax.random.normal(rngs[3], (width, cfg.embed_dim)),
    }


def causal_mask(length: int) -> jax.Array:
    """Additive causal mask (upper triangle = -inf), as in the reference
    build_attention_mask (training/VitaCLIP_text_encoder.py:146-152)."""
    return jnp.triu(jnp.full((length, length), -jnp.inf), k=1)


def text_transformer(params, x: jax.Array, cfg: TextConfig,
                     attn_impl: str = "xla",
                     maple_prompts=None) -> jax.Array:
    """Run the causal transformer stack over embedded prompts (N, L, W).

    maple_prompts: optional (layers-1, P, W) MaPLe-style per-layer prompts —
    from the second block on, tokens [1:1+P] are replaced by that layer's
    learned prompts before the block (reference Transformer.forward,
    VitaCLIP_text_encoder.py:97-118)."""
    def block_fn(h, p):
        hn = layer_norm(h, p["ln_1"]["scale"], p["ln_1"]["bias"])
        # causal=True routes the flash impl through the streaming kernel's
        # in-kernel causal mask; the xla impl builds the additive mask
        h = h + multi_head_attention(p["attn"], hn, hn, hn, cfg.heads,
                                     impl=attn_impl, causal=True)
        hn = layer_norm(h, p["ln_2"]["scale"], p["ln_2"]["bias"])
        h = h + mlp(p["mlp"], hn, quick_gelu)
        return h, None

    if maple_prompts is None:
        x, _ = jax.lax.scan(block_fn, x, params["blocks"])
        return x

    first = jax.tree_util.tree_map(lambda a: a[0], params["blocks"])
    rest = jax.tree_util.tree_map(lambda a: a[1:], params["blocks"])
    x, _ = block_fn(x, first)
    n_p = maple_prompts.shape[1]

    def maple_block(h, inputs):
        p, mp = inputs
        ctx = jnp.broadcast_to(mp[None].astype(h.dtype),
                               (h.shape[0], n_p, h.shape[-1]))
        h = jnp.concatenate([h[:, :1], ctx, h[:, 1 + n_p:]], axis=1)
        return block_fn(h, p)

    x, _ = jax.lax.scan(maple_block, x, (rest, maple_prompts))
    return x


def encode_text_embeds(params, prompt_embeds: jax.Array, eot_idx: jax.Array,
                       cfg: TextConfig, compute_dtype=jnp.float32,
                       attn_impl: str = "xla") -> jax.Array:
    """Encode pre-embedded prompts (N, L, W) -> pooled features (N, embed_dim).

    Mirrors reference forward (training/VitaCLIP_text_encoder.py:154-171):
    +positional embedding, transformer, ln_final, gather at the EOT position,
    project to embed_dim. `eot_idx` (N,) carries the EOT column per row.
    """
    x = prompt_embeds.astype(compute_dtype) + params["positional_embedding"].astype(compute_dtype)
    x = text_transformer(params, x, cfg, attn_impl=attn_impl)
    x = layer_norm(x, params["ln_final"]["scale"], params["ln_final"]["bias"])
    pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    return pooled @ params["text_projection"].astype(pooled.dtype)


def encode_text_tokens(params, tokens: jax.Array, cfg: TextConfig,
                       compute_dtype=jnp.float32, attn_impl: str = "xla") -> jax.Array:
    """Encode raw token ids (N, L): embed, then pool at EOT (= argmax of the
    EOT id per row; padding is 0 so each row has exactly one EOT)."""
    embeds = jnp.take(params["token_embedding"], tokens, axis=0)
    eot_idx = jnp.argmax((tokens == cfg.vocab_size - 1).astype(jnp.int32), axis=-1)
    return encode_text_embeds(params, embeds, eot_idx, cfg,
                              compute_dtype=compute_dtype, attn_impl=attn_impl)
