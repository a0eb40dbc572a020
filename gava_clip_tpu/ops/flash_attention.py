"""Pallas TPU attention kernels.

Two regimes, dispatched by shape (both on the packed (B, L, H*Dh) activation
layout the q/k/v projections produce — no head relayout in HBM for the hot
path):

1. **Packed whole-row kernels** for the Vita-CLIP shape regime (short
   sequences of ~200-400 tokens per frame row, huge effective batch B*T,
   12 heads x 64 dims — reference attention semantics:
   training/VitaCLIP_vision_encoder_utils.py:31-81):
     * forward: one grid cell per batch row holds the whole padded sequence
       in VMEM and loops the heads; the (L, L) fp32 score tile never
       touches HBM, and the softmax costs ONE elementwise pass over it
       (see _onepass_softmax_av — at the bench shape each pass is ~0.15
       ms/layer, 4x the MXU dots, so pass count IS the kernel's cost
       model). Sequence padding is to the sublane quantum (8), not 128:
       garbage rows are real VPU work. Measured on v5e at (B=64 rows,
       Lq=197/Lk=214, bf16): 0.27 ms/layer vs 0.53 for the XLA einsum
       composition; the int8-out fused variant runs 0.30 ms/layer.
     * backward: same whole-row layout; recomputes the forward's exact
       exp2-clamp softmax weights in VMEM (no probs residuals in HBM —
       only the forward output and the tiny (B, Lq, H) per-head denominator
       ride along as residuals) in 2 elementwise passes and emits dq/dk/dv
       from one kernel.

2. **Streaming flash** for long sequences and the causal text tower: wraps
   the stock `jax.experimental.pallas.ops.tpu.flash_attention` (KV-blocked
   online softmax, fwd + bwd kernels) with a packed<->head-major relayout
   (O(L) relayout amortized against O(L^2) attention at these lengths) and
   128-boundary padding via segment ids.

CPU tests run both paths in interpret mode.
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one grid cell per batch row is independent work: let Mosaic split the grid
# across the two v5e megacores
_PARALLEL_1D = pltpu.CompilerParams(dimension_semantics=("parallel",))

# above this key length the whole-row VMEM layout stops being the right
# trade (score tile is Lq x Lk fp32 per head) and the streaming kernel wins
_PACKED_MAX_LK = 640

# int8 QK^T score dots in the SERVING kernels (flash_attention_out_int8*).
# Trace-time flag; env GAVA_INT8_QK=1 arms it for A/B benching without code
# changes (tools/run_queued_bench_r04.sh). Accuracy rides the same bench
# prob-delta gate as the rest of w8a8.
import os as _os
_INT8_QK = _os.environ.get("GAVA_INT8_QK", "0") == "1"


def set_int8_qk(enabled: bool) -> None:
    """Route the serving kernels' QK^T score dots through the int8 MXU
    (per-row q/k quantization in VMEM, rank-1 rescale fused into the exp2
    pass). Affects functions traced after the call."""
    global _INT8_QK
    _INT8_QK = enabled


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# packed whole-row kernels (short L, no mask)
# ---------------------------------------------------------------------------



def _zero_tail_rows(x, valid: int):
    """Zero rows >= valid of a (L, D) VMEM tile. Partial-tile loads fill the
    ragged tail with arbitrary adjacent bits which can decode as inf/NaN in
    bf16; 0 * NaN = NaN would contaminate every valid row through the
    contraction dots, so garbage rows must be zeroed, not just masked."""
    if valid >= x.shape[0]:
        return x
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows < valid, x, jnp.zeros_like(x))

def _onepass_softmax_av_masked(q, k, v, colmask, scale, num_heads,
                               head_dim, store, store_den=None,
                               int8_qk: bool = False):
    """Core of _onepass_softmax_av with an explicit valid-key mask
    (colmask: None or (1, Lk) {0,1} fp32) — callers with a non-prefix
    valid-key layout (the stitched two-source kernel) build their own.

    The softmax denominator rides the AV dot: a ones column is appended to
    each head's v slice in VMEM, so `e @ [v_h | 1]` yields the (Lq, Dh)
    numerator AND the row sums in ONE MXU dot — the Dh+1-wide output costs
    the same single 128-lane tile pass as Dh=64 alone, eliminating the
    separate `e @ ones(Lk, 128)` dot (1 of the 3 MXU dots per head).
    The ones column needs no masking for garbage/padded key rows: their e
    columns are forced to 0 by colmask (zeroing k alone would NOT do it —
    a zero score still exps to 1 — which is why padded columns were always
    colmasked, in the old separate-denominator form too).

    int8_qk: run the QK^T score dot on the int8 MXU — q/k head slices are
    quantized per-row symmetric in VMEM and the rank-1 rescale
    (qs_row x ks_col) folds into the exp2 argument, so the score tile still
    gets exactly ONE elementwise traversal. The AV dot deliberately stays
    bf16: quantizing `e` per-row needs a row-max reduction over the
    (Lq, Lk) tile — a second wide pass, re-paying what the one-pass
    softmax eliminated. Serving-only knob (see set_int8_qk), gated by the
    bench prob-delta check like every other w8a8 deviation."""
    Lk = k.shape[0]
    c = scale * 1.4426950408889634                    # fold scale into exp2
    ones_col = jnp.ones((Lk, 1), v.dtype)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        if int8_qk:
            qh = q[:, sl].astype(jnp.float32)
            kh = k[:, sl].astype(jnp.float32)
            qs = jnp.maximum(jnp.max(jnp.abs(qh), axis=1, keepdims=True),
                             1e-6)
            ks = jnp.maximum(jnp.max(jnp.abs(kh), axis=1, keepdims=True),
                             1e-6)
            qq = jnp.round(qh * (127.0 / qs)).astype(jnp.int8)
            kq = jnp.round(kh * (127.0 / ks)).astype(jnp.int8)
            s32 = jax.lax.dot_general(
                qq, kq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            # rank-1 rescale fused into the single elementwise pass
            e = jnp.exp2(jnp.minimum(
                s32.astype(jnp.float32)
                * (qs * (c / (127.0 * 127.0))) * ks.T, 110.0))
        else:
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            e = jnp.exp2(jnp.minimum(s * c, 110.0))
        if colmask is not None:
            e = e * colmask
        e = e.astype(v.dtype)
        v_aug = jnp.concatenate([v[:, sl], ones_col], axis=1)
        out = jnp.dot(e, v_aug, preferred_element_type=jnp.float32)
        denom = out[:, head_dim:head_dim + 1]
        store(sl, out[:, :head_dim] / jnp.maximum(denom, 1e-30))
        if store_den is not None:
            store_den(h, denom)


def _onepass_softmax_av(q, k, v, lk_valid, scale, num_heads, head_dim,
                        store, store_den=None):
    """Whole-row attention with the single-elementwise-pass softmax.

    Every elementwise traversal of the num_heads (Lq, Lk) fp32 score tiles
    costs ~0.15 ms/layer at the bench shape (64 rows, L=214) — ~4x the MXU
    dots themselves — so the naive softmax's ~7 passes (scale, mask-where,
    max, sub+exp, sum, div, store cast) dominate the kernel. This form
    keeps exactly ONE: scale folds into the exp2 constant, the
    max-subtraction becomes a saturating clamp at exp2-arg 110 (exact
    whenever scaled scores < 110 — any non-pathological CLIP tower;
    beyond that probs saturate uniformly instead of overflowing; the 2^17
    margin below fp32's 2^127 keeps the row sums and the e@v accumulator
    finite even with every key at the clamp: 2^110 * Lk * |v| < 2^128
    for Lk <= 640), the padded-key-column mask is a broadcast {0,1}
    multiply, and the store cast fuses in. The softmax denominator rides
    the AV dot itself (ones column appended to v in VMEM — see
    _onepass_softmax_av_masked) and the divide happens on the
    (Lq, head_dim) AV output — head_dim/Lk of the elements.

    `store(h_slice, out)` receives each head's normalized (Lq, head_dim)
    fp32 output.
    """
    Lk = k.shape[0]
    colmask = None
    if lk_valid < Lk:
        colmask = (jax.lax.broadcasted_iota(jnp.int32, (1, Lk), 1)
                   < lk_valid).astype(jnp.float32)
    _onepass_softmax_av_masked(q, k, v, colmask, scale, num_heads,
                               head_dim, store, store_den)


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      lk_valid: int, num_heads: int, head_dim: int):
    q = q_ref[0]
    k = _zero_tail_rows(k_ref[0], lk_valid)
    v = _zero_tail_rows(v_ref[0], lk_valid)

    def store(sl, out):
        o_ref[0, :, sl] = out.astype(o_ref.dtype)

    _onepass_softmax_av(q, k, v, lk_valid, scale, num_heads, head_dim, store)


def _attention_kernel_den(q_ref, k_ref, v_ref, o_ref, den_ref, *,
                          scale: float, lk_valid: int, num_heads: int,
                          head_dim: int):
    """_attention_kernel that also emits the per-head softmax denominators
    (B, Lq, H fp32) — saved as custom-VJP residuals so the backward kernel
    needs no output/denominator recompute dot (see _attention_bwd_kernel)."""
    q = q_ref[0]
    k = _zero_tail_rows(k_ref[0], lk_valid)
    v = _zero_tail_rows(v_ref[0], lk_valid)

    def store(sl, out):
        o_ref[0, :, sl] = out.astype(o_ref.dtype)

    def store_den(h, denom):
        den_ref[0, :, h:h + 1] = denom

    _onepass_softmax_av(q, k, v, lk_valid, scale, num_heads, head_dim,
                        store, store_den)


def _attention_bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, den_ref,
                          dq_ref, dk_ref, dv_ref, *, scale: float,
                          lq_valid: int, lk_valid: int, num_heads: int,
                          head_dim: int):
    """Whole-row flash backward consuming the SAVED forward output and
    per-head softmax denominators (emitted by _attention_kernel_den, kept
    as custom-VJP residuals — under the save_attn* remat policies they are
    checkpoint-named so no forward re-run is needed to produce them).

    Per head this keeps: the score recompute dot (s), the exp pass, the
    dp dot, the ds pass, and the three gradient dots — the o-recompute
    `e @ [v | 1]` dot of the previous version is gone (saved o gives
    delta = rowsum(do * o) directly; saved denom gives inv_d).
    Wide (Lq, Lk) elementwise work stays at TWO passes per head (the
    dominant cost at these shapes, ~4x the MXU dots):
      * e = exp2(clamp(s*c) at 110) * colmask, stored bf16 (pass 1);
      * ds = e * inv_denom * (dp - delta), stored bf16 (pass 2).
    dv = e^T @ (do * inv_denom) pushes the normalization onto do's rows
    instead of p's tile.

    Partial-tile hygiene: q/do garbage rows are zeroed, so their dp/delta
    and hence ds rows are exactly 0 (no dk/dv contamination; their dq rows
    are never stored). o and den garbage rows are zeroed too — loaded
    partial-tile bits can decode as NaN, and 0 (from zeroed do) * NaN = NaN
    would poison delta; with den zeroed, inv_d clamps to a finite 1e30 and
    every garbage-row product still multiplies a hard 0. k/v garbage rows
    are zeroed AND their e columns masked to 0, so dk/dv garbage rows
    receive exactly 0."""
    q = _zero_tail_rows(q_ref[0], lq_valid)
    k = _zero_tail_rows(k_ref[0], lk_valid)
    v = _zero_tail_rows(v_ref[0], lk_valid)
    do = _zero_tail_rows(do_ref[0], lq_valid)
    o = _zero_tail_rows(o_ref[0], lq_valid)
    den = _zero_tail_rows(den_ref[0], lq_valid)            # (Lq, H) fp32
    Lk = k.shape[0]
    c = scale * 1.4426950408889634
    colmask = None
    if lk_valid < Lk:
        colmask = (jax.lax.broadcasted_iota(jnp.int32, (1, Lk), 1)
                   < lk_valid).astype(jnp.float32)
    contract_q = (((0,), (0,)), ((), ()))     # (Lq,Lk) x (Lq,Dh) -> (Lk,Dh)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh, doh = q[:, sl], k[:, sl], v[:, sl], do[:, sl]
        inv_d = 1.0 / jnp.maximum(den[:, h:h + 1], 1e-30)   # (Lq, 1)
        delta = jnp.sum(doh.astype(jnp.float32)
                        * o[:, sl].astype(jnp.float32), axis=-1,
                        keepdims=True)                      # (Lq, 1)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        e = jnp.exp2(jnp.minimum(s * c, 110.0))
        if colmask is not None:
            e = e * colmask
        e = e.astype(v.dtype)                                   # pass 1
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (e.astype(jnp.float32) * inv_d * (dp - delta)
              ).astype(v.dtype)                                 # pass 2
        do_n = (doh.astype(jnp.float32) * inv_d).astype(v.dtype)
        dq = jnp.dot(ds, kh, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, qh, contract_q,
                                 preferred_element_type=jnp.float32) * scale
        dv = jax.lax.dot_general(e, do_n, contract_q,
                                 preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _pad_seq(x, Lp):
    if x.shape[1] == Lp:
        return x
    return jnp.pad(x, ((0, 0), (0, Lp - x.shape[1]), (0, 0)))


def _packed_forward(q: jax.Array, k: jax.Array, v: jax.Array,
                    num_heads: int, want_denom: bool = False):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    head_dim = D // num_heads
    # On TPU the kernel runs on PARTIAL tiles: Mosaic masks the ragged-tail
    # stores and fills out-of-bounds loads with finite values (zeros/repeats,
    # never NaN), so no explicit HBM pad/slice copies are needed — padded key
    # columns are masked in-kernel (lk_valid), padded query rows produce
    # garbage that is never stored. The CPU interpreter pads blocks with
    # garbage that can be NaN, so tests pad explicitly.
    # pad only to the fp32 sublane quantum (8): Mosaic handles lane-
    # unaligned score tiles fine, and every garbage row in the block
    # costs real VPU work in the exp pass (256->200 q rows at the bench
    # shape was -19% kernel time)
    Lqp, Lkp = _ceil_to(Lq, 8), _ceil_to(Lk, 8)
    interp = jax.default_backend() != "tpu"
    if interp:
        q, k, v = _pad_seq(q, Lqp), _pad_seq(k, Lkp), _pad_seq(v, Lkp)
    Lqo = Lqp if interp else Lq

    blk_q = pl.BlockSpec((1, Lqp, D), lambda b: (b, 0, 0))
    blk_kv = pl.BlockSpec((1, Lkp, D), lambda b: (b, 0, 0))
    if want_denom:
        # denom: per-head softmax row sums, (B, Lq, H) fp32 — a tiny extra
        # output that lets the backward kernel skip the output/denominator
        # recompute dot entirely (residuals of _packed_flash)
        blk_den = pl.BlockSpec((1, Lqp, num_heads), lambda b: (b, 0, 0))
        out, den = pl.pallas_call(
            functools.partial(_attention_kernel_den, scale=head_dim ** -0.5,
                              lk_valid=Lk, num_heads=num_heads,
                              head_dim=head_dim),
            grid=(B,),
            in_specs=[blk_q, blk_kv, blk_kv],
            out_specs=[blk_q, blk_den],
            out_shape=[jax.ShapeDtypeStruct((B, Lqo, D), q.dtype),
                       jax.ShapeDtypeStruct((B, Lqo, num_heads),
                                            jnp.float32)],
            compiler_params=_PARALLEL_1D,
            interpret=interp,
        )(q, k, v)
        return (out[:, :Lq], den[:, :Lq]) if interp else (out, den)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=head_dim ** -0.5,
                          lk_valid=Lk, num_heads=num_heads, head_dim=head_dim),
        grid=(B,),
        in_specs=[blk_q, blk_kv, blk_kv],
        out_specs=blk_q,
        out_shape=jax.ShapeDtypeStruct((B, Lqo, D), q.dtype),
        compiler_params=_PARALLEL_1D,
        interpret=interp,  # CPU tests run interpreted
    )(q, k, v)
    return out[:, :Lq] if interp else out


def _packed_backward(q, k, v, do, o, den, num_heads: int):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    head_dim = D // num_heads
    # pad only to the fp32 sublane quantum (8): Mosaic handles lane-
    # unaligned score tiles fine, and every garbage row in the block
    # costs real VPU work in the exp pass (256->200 q rows at the bench
    # shape was -19% kernel time)
    Lqp, Lkp = _ceil_to(Lq, 8), _ceil_to(Lk, 8)
    interp = jax.default_backend() != "tpu"
    if interp:
        q, k, v = _pad_seq(q, Lqp), _pad_seq(k, Lkp), _pad_seq(v, Lkp)
        do, o, den = _pad_seq(do, Lqp), _pad_seq(o, Lqp), _pad_seq(den, Lqp)
    Lqo, Lko = (Lqp, Lkp) if interp else (Lq, Lk)

    blk_q = pl.BlockSpec((1, Lqp, D), lambda b: (b, 0, 0))
    blk_kv = pl.BlockSpec((1, Lkp, D), lambda b: (b, 0, 0))
    blk_den = pl.BlockSpec((1, Lqp, num_heads), lambda b: (b, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attention_bwd_kernel, scale=head_dim ** -0.5,
                          lq_valid=Lq, lk_valid=Lk, num_heads=num_heads,
                          head_dim=head_dim),
        grid=(B,),
        in_specs=[blk_q, blk_kv, blk_kv, blk_q, blk_q, blk_den],
        out_specs=[blk_q, blk_kv, blk_kv],
        out_shape=[jax.ShapeDtypeStruct((B, Lqo, D), q.dtype),
                   jax.ShapeDtypeStruct((B, Lko, D), k.dtype),
                   jax.ShapeDtypeStruct((B, Lko, D), v.dtype)],
        compiler_params=_PARALLEL_1D,
        interpret=interp,
    )(q, k, v, do, o, den)
    return dq[:, :Lq], dk[:, :Lk], dv[:, :Lk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _packed_flash_saved(q, k, v, num_heads):
    return _packed_forward(q, k, v, num_heads)


def _packed_fwd(q, k, v, num_heads):
    from jax.ad_checkpoint import checkpoint_name
    # the differentiated forward also emits the per-head softmax
    # denominators; o and den ride as residuals so the backward kernel has
    # no output-recompute dot. Both are checkpoint-named 'attn_out' so the
    # save_attn* remat policies (models/vision.py) keep them — otherwise
    # rematerializing den would re-run this kernel and undo the saving.
    out, den = _packed_forward(q, k, v, num_heads, want_denom=True)
    out = checkpoint_name(out, "attn_out")
    den = checkpoint_name(den, "attn_out")
    return out, (q, k, v, out, den)


def _packed_bwd(num_heads, res, g):
    q, k, v, o, den = res
    return _packed_backward(q, k, v, g, o, den, num_heads)


_packed_flash_saved.defvjp(_packed_fwd, _packed_bwd)


# --- recompute-backward variant (the pre-saved-residual form), kept as an
# A/B switch: the saved-residual backward trades the in-kernel o-recompute
# `e @ [v|1]` dot for (Lq, D)+(Lq, H) extra residual HBM traffic per layer.
# It landed during a relay outage (commit 5d2e104), so its TPU effect is
# unmeasured; GAVA_FLASH_BWD=recompute lets the queued bench time both and
# settle keep-or-revert with one healthy window (VERDICT r3 #2).

def _attention_bwd_kernel_recompute(q_ref, k_ref, v_ref, do_ref,
                                    dq_ref, dk_ref, dv_ref, *, scale: float,
                                    lq_valid: int, lk_valid: int,
                                    num_heads: int, head_dim: int):
    """Whole-row flash backward with IN-KERNEL output/denominator recompute:
    residuals are just (q, k, v); o and den are rebuilt per head via the
    same `e @ [v|1]` denominator-fused dot the forward uses. Wide
    elementwise work is the same TWO passes as the saved-residual kernel —
    the delta difference is one extra MXU dot vs two fewer HBM residual
    streams."""
    q = _zero_tail_rows(q_ref[0], lq_valid)
    k = _zero_tail_rows(k_ref[0], lk_valid)
    v = _zero_tail_rows(v_ref[0], lk_valid)
    do = _zero_tail_rows(do_ref[0], lq_valid)
    Lk = k.shape[0]
    c = scale * 1.4426950408889634
    colmask = None
    if lk_valid < Lk:
        colmask = (jax.lax.broadcasted_iota(jnp.int32, (1, Lk), 1)
                   < lk_valid).astype(jnp.float32)
    ones_col = jnp.ones((Lk, 1), v.dtype)
    contract_q = (((0,), (0,)), ((), ()))     # (Lq,Lk) x (Lq,Dh) -> (Lk,Dh)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh, doh = q[:, sl], k[:, sl], v[:, sl], do[:, sl]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        e = jnp.exp2(jnp.minimum(s * c, 110.0))
        if colmask is not None:
            e = e * colmask
        e = e.astype(v.dtype)                                   # pass 1
        v_aug = jnp.concatenate([vh, ones_col], axis=1)
        num = jnp.dot(e, v_aug, preferred_element_type=jnp.float32)
        inv_d = 1.0 / jnp.maximum(num[:, head_dim:head_dim + 1], 1e-30)
        oh = num[:, :head_dim] * inv_d
        delta = jnp.sum(doh.astype(jnp.float32) * oh, axis=-1,
                        keepdims=True)
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (e.astype(jnp.float32) * inv_d * (dp - delta)
              ).astype(v.dtype)                                 # pass 2
        do_n = (doh.astype(jnp.float32) * inv_d).astype(v.dtype)
        dq = jnp.dot(ds, kh, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, qh, contract_q,
                                 preferred_element_type=jnp.float32) * scale
        dv = jax.lax.dot_general(e, do_n, contract_q,
                                 preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _packed_backward_recompute(q, k, v, do, num_heads: int):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    head_dim = D // num_heads
    Lqp, Lkp = _ceil_to(Lq, 8), _ceil_to(Lk, 8)
    interp = jax.default_backend() != "tpu"
    if interp:
        q, k, v = _pad_seq(q, Lqp), _pad_seq(k, Lkp), _pad_seq(v, Lkp)
        do = _pad_seq(do, Lqp)
    Lqo, Lko = (Lqp, Lkp) if interp else (Lq, Lk)

    blk_q = pl.BlockSpec((1, Lqp, D), lambda b: (b, 0, 0))
    blk_kv = pl.BlockSpec((1, Lkp, D), lambda b: (b, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attention_bwd_kernel_recompute,
                          scale=head_dim ** -0.5,
                          lq_valid=Lq, lk_valid=Lk, num_heads=num_heads,
                          head_dim=head_dim),
        grid=(B,),
        in_specs=[blk_q, blk_kv, blk_kv, blk_q],
        out_specs=[blk_q, blk_kv, blk_kv],
        out_shape=[jax.ShapeDtypeStruct((B, Lqo, D), q.dtype),
                   jax.ShapeDtypeStruct((B, Lko, D), k.dtype),
                   jax.ShapeDtypeStruct((B, Lko, D), v.dtype)],
        compiler_params=_PARALLEL_1D,
        interpret=interp,
    )(q, k, v, do)
    return dq[:, :Lq], dk[:, :Lk], dv[:, :Lk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _packed_flash_recompute(q, k, v, num_heads):
    return _packed_forward(q, k, v, num_heads)


def _packed_fwd_recompute(q, k, v, num_heads):
    from jax.ad_checkpoint import checkpoint_name
    out = _packed_forward(q, k, v, num_heads)
    out = checkpoint_name(out, "attn_out")
    return out, (q, k, v)


def _packed_bwd_recompute(num_heads, res, g):
    q, k, v = res
    return _packed_backward_recompute(q, k, v, g, num_heads)


_packed_flash_recompute.defvjp(_packed_fwd_recompute, _packed_bwd_recompute)

# trace-time selection; env GAVA_FLASH_BWD={saved,recompute} for A/B runs
_BWD_MODE = _os.environ.get("GAVA_FLASH_BWD", "saved")


def set_flash_bwd_mode(mode: str) -> None:
    """'saved' (default: backward consumes forward output + per-head
    denominators as residuals) or 'recompute' (backward rebuilds them
    in-kernel; residuals are q/k/v only). Affects traces after the call."""
    global _BWD_MODE
    assert mode in ("saved", "recompute"), mode
    _BWD_MODE = mode


def _packed_flash(q, k, v, num_heads):
    if _BWD_MODE == "recompute":
        return _packed_flash_recompute(q, k, v, num_heads)
    return _packed_flash_saved(q, k, v, num_heads)


# ---------------------------------------------------------------------------
# streaming flash (long L / causal): stock TPU kernel + packed relayout
# ---------------------------------------------------------------------------

def _streaming_flash(q, k, v, num_heads: int, causal: bool):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention as _tpu_flash)

    B, Lq, D = q.shape
    Lk = k.shape[1]
    Dh = D // num_heads
    Lqp, Lkp = _ceil_to(Lq, 128), _ceil_to(Lk, 128)

    def head_major(x, Lp):
        x = _pad_seq(x, Lp)
        return x.reshape(B, Lp, num_heads, Dh).transpose(0, 2, 1, 3)

    qh, kh, vh = head_major(q, Lqp), head_major(k, Lkp), head_major(v, Lkp)

    seg = None
    if (Lq != Lqp or Lk != Lkp) and not (causal and Lq == Lk and Lqp == Lkp):
        # mask padded kv columns out of valid rows (causal equal-length
        # padding needs nothing: padded cols are above every valid diagonal)
        q_seg = (jnp.arange(Lqp) >= Lq).astype(jnp.int32)[None].repeat(B, 0)
        kv_seg = (jnp.arange(Lkp) >= Lk).astype(jnp.int32)[None].repeat(B, 0)
        seg = SegmentIds(q=q_seg, kv=kv_seg)

    call = functools.partial(_tpu_flash, qh, kh, vh, segment_ids=seg,
                             causal=causal, sm_scale=Dh ** -0.5)
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out = call()
    else:
        out = call()
    out = out.transpose(0, 2, 1, 3).reshape(B, Lqp, D)
    return out[:, :Lq]


# ---------------------------------------------------------------------------
# clamp drift monitor (debug mode)
# ---------------------------------------------------------------------------
# The packed kernels' one-pass softmax replaces max-subtraction with a
# saturating clamp at exp2-arg 110 (exact while scaled logits stay below it;
# above it relative weighting between above-clamp keys flattens silently —
# forward and backward). Nothing in the fast path detects a trained tower
# drifting past the clamp, so this opt-in monitor recomputes the exact max
# exp2-argument outside the kernel (debug mode trades one extra fp32 score
# einsum for certainty) and records it host-side via jax.debug.callback.

_CLAMP_LIMIT = 110.0
_monitor_enabled = False
clamp_stats = {"max_exp2_arg": 0.0, "clipped": False, "calls": 0}


def enable_clamp_monitor(enabled: bool = True) -> None:
    """Toggle the drift monitor (and reset its stats). Must be called before
    tracing — the check is baked in at trace time."""
    global _monitor_enabled
    _monitor_enabled = enabled
    clamp_stats.update(max_exp2_arg=0.0, clipped=False, calls=0)


def _record_max_arg(m):
    m = float(m)
    clamp_stats["calls"] += 1
    if m > clamp_stats["max_exp2_arg"]:
        clamp_stats["max_exp2_arg"] = m
    if m >= _CLAMP_LIMIT:
        clamp_stats["clipped"] = True


def _monitor_clamp(q, k, num_heads):
    B, Lq, D = q.shape
    Dh = D // num_heads
    c = (Dh ** -0.5) * 1.4426950408889634
    qh = q.reshape(B, Lq, num_heads, Dh).astype(jnp.float32)
    kh = k.reshape(B, k.shape[1], num_heads, Dh).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
    # the kernel clamp is one-sided — min(s*c, 110) only saturates POSITIVE
    # scaled logits — so only the positive max counts toward drift (a large
    # negative logit underflows exp2 harmlessly and must not flag 'clipped')
    jax.debug.callback(_record_max_arg,
                       jnp.maximum(jnp.max(s), 0.0) * c)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    num_heads: int = 12, causal: bool = False) -> jax.Array:
    """Self-attention over packed (B, L, H*Dh) q/k/v.

    Non-causal short-L goes through the whole-row packed kernels (fwd + bwd);
    causal or long-L goes through the streaming (KV-blocked online-softmax)
    kernels. Both are differentiable with Pallas backward passes.
    """
    if not causal and k.shape[1] <= _PACKED_MAX_LK:
        if _monitor_enabled:
            _monitor_clamp(q, k, num_heads)
        return _packed_flash(q, k, v, num_heads)
    return _streaming_flash(q, k, v, num_heads, causal)


def _reference_attention(q, k, v, num_heads, causal: bool = False):
    B, Lq, D = q.shape
    Dh = D // num_heads
    qh = q.reshape(B, Lq, num_heads, Dh)
    kh = k.reshape(B, k.shape[1], num_heads, Dh)
    vh = v.reshape(B, v.shape[1], num_heads, Dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh * (Dh ** -0.5), kh,
                        preferred_element_type=jnp.float32)
    if causal:
        mask = jnp.tril(jnp.ones((Lq, k.shape[1]), bool))
        scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), vh)
    return out.reshape(B, Lq, D)


def _int8_outproj_epilogue(a, w_ref, s_ref, b_ref, r_ref, o_ref):
    """Shared serving epilogue of the fused attention kernels: per-row int8
    quant of the attention output (in VMEM), int8 out-projection, rescale,
    bias, residual add, store. One definition — a fix here reaches both the
    single-source and the stitched two-source kernels."""
    xs = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True), 1e-6) \
        * (1.0 / 127.0)
    aq = jnp.round(a * (1.0 / xs)).astype(jnp.int8)
    acc = jnp.dot(aq, w_ref[...], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * s_ref[...].astype(jnp.float32) \
        + b_ref[...].astype(jnp.float32) + r_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _attention_out_kernel(q_ref, k_ref, v_ref, w_ref, s_ref, b_ref, r_ref,
                          o_ref, attn_ref, *, scale: float, lk_valid: int,
                          k_segments, num_heads: int, head_dim: int,
                          int8_qk: bool = False):
    """Inference fusion: whole-row attention, then the int8 out-projection,
    bias, and residual add — the attention output never leaves VMEM.

    k_segments: None for the prefix-valid layout (keys 0..lk_valid), or a
    static tuple of (start, end) valid-key ranges for the sublane-aligned
    serving layout, where zero-pad rows sit BETWEEN the patch rows and the
    prompt-extras rows (models/vision.py pads each clip's token count to
    the 8-row quantum so 3D<->2D reshapes are layout-preserving bitcasts
    instead of 42 MB repack copies). Segment rows are genuine GEMM outputs
    (finite), so masking their exp terms suffices — no zeroing needed."""
    q = q_ref[0]
    if k_segments is not None:
        k, v = k_ref[0], v_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, k.shape[0]), 1)
        m = None
        for s0, s1 in k_segments:
            seg = (rows >= s0) & (rows < s1)
            m = seg if m is None else (m | seg)
        colmask = m.astype(jnp.float32)
    else:
        # q garbage rows stay row-local (their outputs are never stored);
        # k/v ragged-tail garbage rows MUST be zeroed (see _zero_tail_rows)
        k = _zero_tail_rows(k_ref[0], lk_valid)
        v = _zero_tail_rows(v_ref[0], lk_valid)
        colmask = None
        if lk_valid < k.shape[0]:
            colmask = (jax.lax.broadcasted_iota(
                jnp.int32, (1, k.shape[0]), 1) < lk_valid
                ).astype(jnp.float32)

    def store(sl, out):
        attn_ref[:, sl] = out

    _onepass_softmax_av_masked(q, k, v, colmask, scale, num_heads,
                               head_dim, store, int8_qk=int8_qk)
    _int8_outproj_epilogue(attn_ref[...], w_ref, s_ref, b_ref, r_ref, o_ref)


def flash_attention_out_int8(q, k, v, num_heads, out_params, residual,
                             lq: int | None = None,
                             k_segments: tuple | None = None):
    """Fused attention + w8a8 out-projection + residual for the inference
    path: returns residual + Linear_int8(attention(q, k, v)).

    out_params: {'kernel': {'qa' (D, D) int8, 'scale' (1, D)}, 'bias' (D,)}.
    Not differentiable (inference only — the train path composes
    flash_attention with the w8a8-free linear instead).

    lq: if given, only the first lq rows of q are treated as queries and the
    output has lq rows; q itself may be LONGER (e.g. the full 214-row qkv
    projection including prompt extras). This lets the caller skip the
    `qp[:, :Lx]` slice, whose non-contiguous materialization before the
    kernel costs a full HBM round-trip of the query tensor per layer —
    the kernel's ragged 8-row-quantum block tail masks the extra rows for
    free instead.

    k_segments: static ((start, end), ...) valid-key ranges for callers on
    the sublane-aligned padded layout (zero-pad rows interleaved between
    patch and extras rows; see _attention_out_kernel). Requires k's row
    count to be 8-aligned (no ragged tail). Mutually exclusive with
    relying on the lk prefix mask."""
    from jax.experimental.pallas import tpu as pltpu

    B, Lq_arr, D = q.shape
    Lq = Lq_arr if lq is None else lq
    Lk = k.shape[1]
    if k_segments is not None:
        assert Lk % 8 == 0, "k_segments requires 8-aligned key rows"
    head_dim = D // num_heads
    # pad only to the fp32 sublane quantum (8): Mosaic handles lane-
    # unaligned score tiles fine, and every garbage row in the block
    # costs real VPU work in the exp pass (256->200 q rows at the bench
    # shape was -19% kernel time)
    Lqp, Lkp = _ceil_to(Lq, 8), _ceil_to(Lk, 8)
    interp = jax.default_backend() != "tpu"
    if interp:
        q = _pad_seq(q[:, :Lq], Lqp)
        k, v = _pad_seq(k, Lkp), _pad_seq(v, Lkp)
        residual = _pad_seq(residual, Lqp)
    # on TPU no padding happens: every 8-quantum block tail (Lqp rows over
    # an Lq-row out/residual array, or over a longer lq-caller q array) is
    # handled by Pallas/Mosaic ragged fetch+store masking

    wq = out_params["kernel"]["qa"]
    ws = out_params["kernel"]["scale"]
    bias = out_params["bias"].reshape(1, D)

    blk_q = pl.BlockSpec((1, Lqp, D), lambda b: (b, 0, 0))
    blk_kv = pl.BlockSpec((1, Lkp, D), lambda b: (b, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attention_out_kernel, scale=head_dim ** -0.5,
                          lk_valid=Lk, k_segments=k_segments,
                          num_heads=num_heads, head_dim=head_dim,
                          int8_qk=_INT8_QK),
        grid=(B,),
        in_specs=[blk_q, blk_kv, blk_kv,
                  pl.BlockSpec((D, D), lambda b: (0, 0)),
                  pl.BlockSpec((1, D), lambda b: (0, 0)),
                  pl.BlockSpec((1, D), lambda b: (0, 0)),
                  blk_q],
        out_specs=blk_q,
        out_shape=jax.ShapeDtypeStruct((B, Lqp if interp else Lq, D),
                                       q.dtype),
        scratch_shapes=[pltpu.VMEM((Lqp, D), jnp.float32)],
        compiler_params=_PARALLEL_1D,
        interpret=interp,
    )(q, k, v, wq, ws, bias, residual)
    return out[:, :Lq] if interp else out


def _attention_out_kernel_2src(q_ref, k1_ref, v1_ref, k2_ref, v2_ref,
                               w_ref, s_ref, b_ref, r_ref, o_ref, attn_ref,
                               *, scale: float, lk1_valid: int,
                               lk2_valid: int, num_heads: int,
                               head_dim: int, int8_qk: bool = False):
    """_attention_out_kernel over TWO kv sources (patch rows + prompt-extras
    rows) — the sources never get concatenated in HBM; they are stitched
    along the sublane axis IN VMEM (both tiles are 8-row aligned, one cheap
    copy) so every head keeps the same single physical score tile as the
    pre-concatenated layout. Scoring the small source separately instead
    would round its Lk2 lanes up to a full 128-lane tile per head and cost
    +50% exp-pass VPU work (measured: 1.04 -> 1.17 ms/block)."""
    q = q_ref[0]
    L1, L2 = k1_ref.shape[1], k2_ref.shape[1]
    k = jnp.concatenate([_zero_tail_rows(k1_ref[0], lk1_valid),
                         _zero_tail_rows(k2_ref[0], lk2_valid)], axis=0)
    v = jnp.concatenate([_zero_tail_rows(v1_ref[0], lk1_valid),
                         _zero_tail_rows(v2_ref[0], lk2_valid)], axis=0)
    # valid-key mask with the stitched layout's gap (rows lk1..L1 are the
    # zeroed sublane tail of source 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, L1 + L2), 1)
    colmask = None
    if lk1_valid < L1 or lk2_valid < L2:
        colmask = ((rows < lk1_valid)
                   | ((rows >= L1) & (rows < L1 + lk2_valid))
                   ).astype(jnp.float32)

    def store(sl, out):
        attn_ref[:, sl] = out

    _onepass_softmax_av_masked(q, k, v, colmask, scale, num_heads,
                               head_dim, store, int8_qk=int8_qk)
    _int8_outproj_epilogue(attn_ref[...], w_ref, s_ref, b_ref, r_ref, o_ref)


def flash_attention_out_int8_2src(q, k1, v1, k2, v2, num_heads, out_params,
                                  residual):
    """flash_attention_out_int8 over two separate kv sources: attention keys
    are the union [k1; k2] (order-invariant), so the caller never has to
    interleave the per-frame patch rows with the prompt-extras rows —
    skipping the (B, L1+L2, D) kv concatenate whose HBM write + re-read
    cost ~0.05 ms/layer at the bench shape.

    q/k1/v1: (B, L1, D) patch-row projections (queries == k1 rows);
    k2/v2: (B, L2, D) extras projections. Inference-only (no VJP).

    Status: correct and tested, but NOT wired into the serving path —
    end-to-end it measured 586 clips/s vs 609 for the concat+lq layout
    (models/vision.py _block): feeding it requires a second qkv-projection
    kernel launch per layer whose overhead + weight refetch outweigh the
    0.025 ms concat. Kept for callers whose extras are projected anyway
    (e.g. cross-attention over a precomputed memory)."""
    from jax.experimental.pallas import tpu as pltpu

    B, Lq, D = q.shape
    L1, L2 = k1.shape[1], k2.shape[1]
    head_dim = D // num_heads
    Lqp = _ceil_to(Lq, 8)
    L1p, L2p = _ceil_to(L1, 8), _ceil_to(L2, 8)
    interp = jax.default_backend() != "tpu"
    if interp:
        q = _pad_seq(q, Lqp)
        k1, v1 = _pad_seq(k1, L1p), _pad_seq(v1, L1p)
        k2, v2 = _pad_seq(k2, L2p), _pad_seq(v2, L2p)
        residual = _pad_seq(residual, Lqp)

    wq = out_params["kernel"]["qa"]
    ws = out_params["kernel"]["scale"]
    bias = out_params["bias"].reshape(1, D)

    blk_q = pl.BlockSpec((1, Lqp, D), lambda b: (b, 0, 0))
    blk_k1 = pl.BlockSpec((1, L1p, D), lambda b: (b, 0, 0))
    blk_k2 = pl.BlockSpec((1, L2p, D), lambda b: (b, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attention_out_kernel_2src,
                          scale=head_dim ** -0.5, lk1_valid=L1,
                          lk2_valid=L2, num_heads=num_heads,
                          head_dim=head_dim, int8_qk=_INT8_QK),
        grid=(B,),
        in_specs=[blk_q, blk_k1, blk_k1, blk_k2, blk_k2,
                  pl.BlockSpec((D, D), lambda b: (0, 0)),
                  pl.BlockSpec((1, D), lambda b: (0, 0)),
                  pl.BlockSpec((1, D), lambda b: (0, 0)),
                  blk_q],
        out_specs=blk_q,
        out_shape=jax.ShapeDtypeStruct((B, Lqp if interp else Lq, D),
                                       q.dtype),
        scratch_shapes=[pltpu.VMEM((Lqp, D), jnp.float32)],
        compiler_params=_PARALLEL_1D,
        interpret=interp,
    )(q, k1, v1, k2, v2, wq, ws, bias, residual)
    return out[:, :Lq] if interp else out
