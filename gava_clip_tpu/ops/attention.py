"""Multi-head attention.

Matches the reference math exactly (separate q/k/v projections, scale applied
to q, softmax over keys — reference training/VitaCLIP_vision_encoder_utils.py:
31-81; the text tower's nn.MultiheadAttention is the same math with a packed
in-projection, which the checkpoint converter splits).

Two execution paths share one parameter layout:
  * `attention_core` — plain einsum attention, fp32 softmax. XLA fuses this
    well; it is the parity/reference path and the CPU-test path.
  * a Pallas flash-attention kernel (ops/flash_attention.py) used on TPU for
    long sequences; wired in via `attention_core(..., impl="flash")`.

Parameter layout per attention module:
  {"q": {"kernel","bias"}, "k": {...}, "v": {...}, "out": {...}}
with kernels stored (in_dim, out_dim).
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .linear import linear


def attention_core(q: jax.Array, k: jax.Array, v: jax.Array,
                   num_heads: int,
                   mask: Optional[jax.Array] = None,
                   impl: str = "xla",
                   causal: bool = False) -> jax.Array:
    """Scaled dot-product attention over projected q/k/v.

    q: (B, Lq, H*Dh), k/v: (B, Lk, H*Dh). mask: additive (Lq, Lk) or
    broadcastable, applied in fp32 before softmax. `causal=True` is the
    structured form of the text tower's triangular mask — the flash path
    handles it in-kernel (tile skipping) instead of via an additive mask.
    Returns (B, Lq, H*Dh).
    """
    B, Lq, D = q.shape
    Lk = k.shape[1]
    Dh = D // num_heads

    if impl == "flash" and mask is None:
        from .flash_attention import flash_attention
        return flash_attention(q, k, v, num_heads, causal=causal)
    if causal and mask is None:
        mask = jnp.where(
            jnp.tril(jnp.ones((Lq, Lk), bool)), 0.0, -jnp.inf)

    qh = q.reshape(B, Lq, num_heads, Dh)
    kh = k.reshape(B, Lk, num_heads, Dh)
    vh = v.reshape(B, Lk, num_heads, Dh)

    scale = Dh ** -0.5
    # (B, H, Lq, Lk) scores; softmax in fp32 for bf16 activations.
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), vh)
    return out.reshape(B, Lq, D)


def multi_head_attention(params: Dict, q: jax.Array, k: jax.Array,
                         v: jax.Array, num_heads: int,
                         mask: Optional[jax.Array] = None,
                         impl: str = "xla",
                         causal: bool = False) -> jax.Array:
    """Full attention module: project q/k/v, attend, project out."""
    if (q is k and k is v and isinstance(params["q"]["kernel"], dict)
            and "qa" in params["q"]["kernel"]
            and jax.default_backend() == "tpu"):
        # w8a8 self-attention: one fused kernel reads + quantizes the shared
        # input tile once and runs all three int8 projections against it
        # (saves 2/3 of the activation HBM reads and quant work)
        from .int8_matmul import w8a8_matmul3
        x2 = q.reshape(-1, q.shape[-1])
        outs = w8a8_matmul3(
            x2,
            tuple(params[n]["kernel"]["qa"] for n in ("q", "k", "v")),
            tuple(params[n]["kernel"]["scale"] for n in ("q", "k", "v")),
            bias3=tuple(params[n]["bias"] for n in ("q", "k", "v")))
        qp, kp, vp = (o.reshape(q.shape[:-1] + (o.shape[-1],))
                      for o in outs)
    else:
        qp = linear(params["q"], q)
        kp = linear(params["k"], k)
        vp = linear(params["v"], v)
    out = attention_core(qp, kp, vp, num_heads, mask=mask, impl=impl,
                         causal=causal)
    return linear(params["out"], out)
