"""Fused prompt-"extras" kernel for the w8a8 serving path.

Per vision layer, the prompt machinery around the main attention —
cls_proj GEMM, summary LayerNorm, Tb-token summary attention (4 more
GEMMs), local-prompt add + per-clip broadcast, global-prompt broadcast,
extras concatenation — is ~10 XLA ops of negligible FLOPs whose dispatch
gaps cost ~0.14 ms/layer at the bench shape (ceiling accounting,
PROGRESS.md). This kernel computes the whole branch in ONE Pallas launch
and emits the ready-to-use extras block (BT, Le_pad, D) that feeds
w8a8_matmul3_cat, plus the per-frame summary tokens.

Mosaic-friendly construction (everything rank<=3, no gathers):
  * the Tb-token per-clip summary self-attention becomes ONE (BT, BT)
    score dot with a static block-diagonal mask (row//Tb == col//Tb) —
    at BT=128 the full tile is far cheaper than per-clip loops;
  * the per-clip local-prompt broadcast (every frame row of clip b gets
    clip b's Tb rows) is a static one-hot matmul:
    repeat(x, Tb) == onehot(row -> clip) @ x.reshape(Bb, Tb*D) — the MXU
    does the broadcast, no rank-4 relayout;
  * scale folds / fp32 islands follow ops/attention.py semantics (exact
    softmax here — the tile is tiny, pass count is irrelevant).

All extras weights are bf16 even in w8a8 mode (quantize_tower_params only
targets /attn/ and /mlp/ kernels), so this kernel is pure bf16/fp32.
A/B flag: GAVA_FUSED_EXTRAS=1 (models/vision.py), queued for the first
healthy relay window; interpret-mode parity is pinned by
tests/test_extras_kernel.py.
"""

import functools
import os

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

FUSED_EXTRAS = os.environ.get("GAVA_FUSED_EXTRAS", "0") == "1"


def set_fused_extras(enabled: bool) -> None:
    """Route the serving extras branch through the fused kernel (trace-time
    flag; affects functions traced after the call)."""
    global FUSED_EXTRAS
    FUSED_EXTRAS = enabled


def _extras_kernel(cls_ref, wc_ref, bc_ref, lns_ref, lnb_ref,
                   wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                   wo_ref, bo_ref, lp_ref, gp_ref,
                   e_ref, sum_ref, *, Tb: int, G: int, num_heads: int,
                   head_dim: int, le_pad: int):
    BT, D = cls_ref.shape
    Bb = BT // Tb
    f32 = jnp.float32
    cls = cls_ref[...].astype(f32)

    # cls_proj
    cp = jnp.dot(cls, wc_ref[...].astype(f32),
                 preferred_element_type=f32) + bc_ref[...].astype(f32)

    # summary LN (fp32 island, biased variance — ops/norm.py semantics)
    mu = jnp.mean(cp, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(cp - mu), axis=-1, keepdims=True)
    sn = (cp - mu) * jax.lax.rsqrt(var + 1e-5) \
        * lns_ref[...].astype(f32) + lnb_ref[...].astype(f32)

    # summary attention: one (BT, BT) score tile, block-diagonal mask
    q = jnp.dot(sn, wq_ref[...].astype(f32),
                preferred_element_type=f32) + bq_ref[...].astype(f32)
    k = jnp.dot(sn, wk_ref[...].astype(f32),
                preferred_element_type=f32) + bk_ref[...].astype(f32)
    v = jnp.dot(sn, wv_ref[...].astype(f32),
                preferred_element_type=f32) + bv_ref[...].astype(f32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BT, BT), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BT, BT), 1)
    blockmask = (rows // Tb) == (cols // Tb)
    scale = head_dim ** -0.5
    heads_out = []
    # per-head outputs are concatenated (a VMEM value build) rather than
    # scattered via .at[].set — the scatter lowering captures an empty
    # index constant pallas_call rejects for some head geometries
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(q[:, sl], k[:, sl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32) * scale
        s = jnp.where(blockmask, s, -1e30)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        heads_out.append(jnp.dot(p, v[:, sl], preferred_element_type=f32))
    attn = (heads_out[0] if num_heads == 1
            else jnp.concatenate(heads_out, axis=1))
    summary = cp + jnp.dot(attn, wo_ref[...].astype(f32),
                           preferred_element_type=f32) \
        + bo_ref[...].astype(f32)
    sum_ref[...] = summary.astype(sum_ref.dtype)

    # local rows: lpb[b, t'] = local_prompts[t'] + cp[b, t'], each clip's
    # Tb-row block repeated for its Tb frame rows via a static one-hot
    # matmul (repeat == onehot @ reshape; the MXU does the broadcast)
    lp_flat = (jnp.tile(lp_ref[...].astype(f32), (Bb, 1))
               + cp).reshape(Bb, Tb * D)
    clip_of_row = jax.lax.broadcasted_iota(jnp.int32, (BT, Bb), 0) // Tb
    clip_id = jax.lax.broadcasted_iota(jnp.int32, (BT, Bb), 1)
    onehot = (clip_of_row == clip_id).astype(f32)
    local = jnp.dot(onehot, lp_flat,
                    preferred_element_type=f32).reshape(BT, Tb, D)

    # assemble e = [global (G) | summary (1) | local (Tb) | zero pad]
    gp = jnp.broadcast_to(gp_ref[...].astype(f32)[None], (BT, G, D))
    e_out = jnp.concatenate([gp, summary[:, None], local], axis=1)
    if le_pad > G + 1 + Tb:
        e_out = jnp.concatenate(
            [e_out, jnp.zeros((BT, le_pad - (G + 1 + Tb), D), f32)], axis=1)
    e_ref[...] = e_out.astype(e_ref.dtype)


def fused_extras(cls, p, g_prompt, *, Tb: int, num_heads: int,
                 le_pad: int):
    """cls (BT, D) [x[:, 0] rows] -> (extras (BT, le_pad, D),
    summary (BT//Tb, Tb, D)).

    p: the block's param subtree (cls_proj, summary_ln, summary_attn,
    local_prompts); g_prompt (G, D). Replaces the XLA extras composition
    in models/vision.py _block for the all-prompts-on serving config."""
    BT, D = cls.shape
    G = g_prompt.shape[0]
    head_dim = D // num_heads
    assert le_pad >= G + 1 + Tb, (le_pad, G, Tb)
    a = p["summary_attn"]
    args = (cls,
            p["cls_proj"]["kernel"], p["cls_proj"]["bias"].reshape(1, D),
            p["summary_ln"]["scale"].reshape(1, D),
            p["summary_ln"]["bias"].reshape(1, D),
            a["q"]["kernel"], a["q"]["bias"].reshape(1, D),
            a["k"]["kernel"], a["k"]["bias"].reshape(1, D),
            a["v"]["kernel"], a["v"]["bias"].reshape(1, D),
            a["out"]["kernel"], a["out"]["bias"].reshape(1, D),
            p["local_prompts"], g_prompt)
    def _whole(x):
        n = x.ndim
        return pl.BlockSpec(x.shape, lambda n=n: (0,) * n)
    in_specs = [_whole(x) for x in args]
    e, summary = pl.pallas_call(
        functools.partial(_extras_kernel, Tb=Tb, G=G, num_heads=num_heads,
                          head_dim=head_dim, le_pad=le_pad),
        grid=(),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((BT, le_pad, D), lambda: (0, 0, 0)),
                   pl.BlockSpec((BT, D), lambda: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((BT, le_pad, D), cls.dtype),
                   jax.ShapeDtypeStruct((BT, D), cls.dtype)],
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return e, summary.reshape(BT // Tb, Tb, D)
