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
        from jax.ad_checkpoint import checkpoint_name

        from .flash_attention import flash_attention
        # name the kernel output so a save_only_these_names remat policy
        # (models/vision.py remat='save_attn') can keep it as a residual:
        # saving the (B, Lq, D) output skips re-running the flash forward
        # kernel during backward (measured 1.2 ms/layer at the flagship
        # train shape) for ~84 MB/layer of HBM. A no-op without the policy.
        return checkpoint_name(
            flash_attention(q, k, v, num_heads, causal=causal), "attn_out")
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
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(out.reshape(B, Lq, D), "attn_out")


def multi_head_attention(params: Dict, q: jax.Array, k: jax.Array,
                         v: jax.Array, num_heads: int,
                         mask: Optional[jax.Array] = None,
                         impl: str = "xla",
                         causal: bool = False) -> jax.Array:
    """Full attention module: project q/k/v, attend, project out."""
    from .int8_matmul import kernels_active
    if (q is k and k is v and isinstance(params["q"]["kernel"], dict)
            and "qa" in params["q"]["kernel"]
            and kernels_active()):
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
        # 'qkv' checkpoint-name: under models/vision.py remat=
        # 'save_attn_qkv' the three projections are kept as residuals, so
        # the backward needs NO recompute upstream of the flash kernel
        # (its residuals ARE q/k/v) and the LN1+qkv GEMM re-run disappears
        # (~19 ms/step at the flagship shape vs ~10 ms of HBM round-trip
        # for the saved tensors). No-op without the policy.
        from jax.ad_checkpoint import checkpoint_name
        qp = checkpoint_name(linear(params["q"], q), "qkv")
        kp = checkpoint_name(linear(params["k"], k), "qkv")
        vp = checkpoint_name(linear(params["v"], v), "qkv")
    out = attention_core(qp, kp, vp, num_heads, mask=mask, impl=impl,
                         causal=causal)
    return linear(params["out"], out)
