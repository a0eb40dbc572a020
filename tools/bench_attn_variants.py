"""A/B candidate kernels for the w8a8 inference block at the bench shape.

Variants:
  base    — current composition: w8a8_matmul3 (LN+quant+qkv) ->
            flash_attention_out_int8 -> w8a8_mlp_res.
  mega    — ONE kernel per frame row: LN + quant + int8 qkv + per-head
            attention + int8 out-proj + residual + LN + int8 MLP + residual,
            nothing intermediate touches HBM.

Run with --parity on CPU (interpret mode) to check numerics; run on TPU for
timing. The winner gets promoted into ops/.
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from gava_clip_tpu.ops.int8_matmul import (_ln_f32, _quant_rows, _quick_gelu,
                                           w8a8_matmul3, w8a8_mlp_res)
from gava_clip_tpu.ops.flash_attention import (_zero_tail_rows,
                                               flash_attention_out_int8)

B, T, Lx, Lext, D, H, HEADS = 8, 8, 197, 17, 768, 3072, 12
Lkv = Lx + Lext


def _mega_kernel(x_ref, e_ref, wq_ref, wk_ref, wv_ref, sqkv_ref, bqkv_ref,
                 wo_ref, so_ref, bo_ref, w1_ref, s1_ref, b1_ref,
                 w2_ref, s2_ref, b2_ref, ln1_ref, ln2_ref, o_ref,
                 *, scale, heads, head_dim, lx_valid, le_valid):
    """One transformer layer for ONE frame row, entirely in VMEM.

    x (Lx, D) tokens; e (Lext, D) extra attention keys (prompts/summary).
    kv = LN1([x; e]) -> int8 qkv; q only from x rows. Attention per head,
    int8 out-proj + residual, LN2 + int8 MLP (QuickGELU) + residual."""
    x = _zero_tail_rows(x_ref[0].astype(jnp.float32), lx_valid)
    e = _zero_tail_rows(e_ref[0].astype(jnp.float32), le_valid)
    ln1_s = ln1_ref[0, :1]
    ln1_b = ln1_ref[0, 1:2]
    xn = _ln_f32(x, ln1_s.astype(jnp.float32), ln1_b.astype(jnp.float32))
    en = _ln_f32(e, ln1_s.astype(jnp.float32), ln1_b.astype(jnp.float32))
    kvn = jnp.concatenate([xn, en], axis=0)
    kvq, kvs = _quant_rows(kvn)
    s = sqkv_ref[...].astype(jnp.float32)     # (3, D) stacked q/k/v scales
    b = bqkv_ref[...].astype(jnp.float32)     # (3, D) stacked biases

    def proj(w_ref, idx, rows_q, rows_s):
        acc = jnp.dot(rows_q, w_ref[...], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * rows_s * s[idx:idx + 1] \
            + b[idx:idx + 1]

    Lxp = x.shape[0]
    q = proj(wq_ref, 0, kvq[:Lxp], kvs[:Lxp])
    k = proj(wk_ref, 1, kvq, kvs)
    v = proj(wv_ref, 2, kvq, kvs)

    Lkvp = k.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (Lxp, Lkvp), 1)
    # key validity: rows < lx_valid from x, rows in [Lxp, Lxp+le_valid) from e
    key_ok = (col < lx_valid) | ((col >= Lxp) & (col < Lxp + le_valid))
    attn = jnp.zeros((Lxp, 0), jnp.float32)
    outs = []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        scores = jax.lax.dot_general(
            q[:, sl].astype(jnp.bfloat16), k[:, sl].astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(key_ok, scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        outs.append(jnp.dot(probs.astype(jnp.bfloat16),
                            v[:, sl].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=-1)

    aq, ashw = _quant_rows(attn)
    acc = jnp.dot(aq, wo_ref[...], preferred_element_type=jnp.int32)
    x = x + acc.astype(jnp.float32) * ashw * so_ref[...].astype(jnp.float32) \
        + bo_ref[...].astype(jnp.float32)

    ln2_s = ln2_ref[0, :1]
    ln2_b = ln2_ref[0, 1:2]
    hN = _ln_f32(x, ln2_s.astype(jnp.float32), ln2_b.astype(jnp.float32))
    hq, hs = _quant_rows(hN)
    acc1 = jnp.dot(hq, w1_ref[...], preferred_element_type=jnp.int32)
    hmid = acc1.astype(jnp.float32) * hs * s1_ref[...].astype(jnp.float32) \
        + b1_ref[...].astype(jnp.float32)
    hmid = _quick_gelu(hmid)
    mq, ms = _quant_rows(hmid)
    acc2 = jnp.dot(mq, w2_ref[...], preferred_element_type=jnp.int32)
    y = x + acc2.astype(jnp.float32) * ms * s2_ref[...].astype(jnp.float32) \
        + b2_ref[...].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def mega_layer(x, extras, attn_p, mlp_p, ln1, ln2, heads=HEADS):
    """x (B, Lx, D) tokens; extras (B, Lext, D) extra-key rows."""
    Bn, Lx_, D_ = x.shape
    Le_ = extras.shape[1]
    head_dim = D_ // heads
    interp = jax.default_backend() != "tpu"
    Lxp = (Lx_ + 127) // 128 * 128
    Lep = (Le_ + 127) // 128 * 128
    if interp:
        pad = lambda a, L: jnp.pad(a, ((0, 0), (0, L - a.shape[1]), (0, 0)))
        x = pad(x, Lxp)
        extras = pad(extras, Lep)

    sqkv = jnp.concatenate([attn_p[n]["kernel"]["scale"].astype(jnp.float32)
                            for n in ("q", "k", "v")], axis=0)
    bqkv = jnp.stack([attn_p[n]["bias"].astype(jnp.float32)
                      for n in ("q", "k", "v")], axis=0)
    ln1m = jnp.stack([ln1[0], ln1[1]], axis=0).reshape(1, 2, D_)
    ln2m = jnp.stack([ln2[0], ln2[1]], axis=0).reshape(1, 2, D_)

    blk_x = pl.BlockSpec((1, Lxp, D_), lambda b: (b, 0, 0))
    blk_e = pl.BlockSpec((1, Lep, D_), lambda b: (b, 0, 0))
    fixed = lambda *shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape))

    from jax.experimental.pallas import tpu as pltpu
    out = pl.pallas_call(
        functools.partial(_mega_kernel, scale=head_dim ** -0.5, heads=heads,
                          head_dim=head_dim, lx_valid=Lx_, le_valid=Le_),
        grid=(Bn,),
        in_specs=[blk_x, blk_e,
                  fixed(D_, D_), fixed(D_, D_), fixed(D_, D_),
                  fixed(3, D_), fixed(3, D_),
                  fixed(D_, D_), fixed(1, D_), fixed(1, D_),
                  fixed(D_, H), fixed(1, H), fixed(1, H),
                  fixed(H, D_), fixed(1, D_), fixed(1, D_),
                  fixed(1, 2, D_), fixed(1, 2, D_)],
        out_specs=blk_x,
        out_shape=jax.ShapeDtypeStruct((Bn, Lxp if interp else Lx_, D_),
                                       x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interp,
    )(x, extras,
      attn_p["q"]["kernel"]["qa"], attn_p["k"]["kernel"]["qa"],
      attn_p["v"]["kernel"]["qa"], sqkv, bqkv,
      attn_p["out"]["kernel"]["qa"], attn_p["out"]["kernel"]["scale"],
      attn_p["out"]["bias"].reshape(1, D_),
      mlp_p["fc1"]["kernel"]["qa"], mlp_p["fc1"]["kernel"]["scale"],
      mlp_p["fc1"]["bias"].reshape(1, H),
      mlp_p["fc2"]["kernel"]["qa"], mlp_p["fc2"]["kernel"]["scale"],
      mlp_p["fc2"]["bias"].reshape(1, D_),
      ln1m, ln2m)
    return out[:, :Lx_] if interp else out


def base_layer(x, extras, attn_p, mlp_p, ln1, ln2, heads=HEADS):
    """Current production composition for the same math."""
    Bn, Lx_, D_ = x.shape
    kv = jnp.concatenate([x, extras], axis=1)
    kv2 = kv.reshape(-1, D_)
    outs = w8a8_matmul3(
        kv2, tuple(attn_p[n]["kernel"]["qa"] for n in ("q", "k", "v")),
        tuple(attn_p[n]["kernel"]["scale"] for n in ("q", "k", "v")),
        bias3=tuple(attn_p[n]["bias"] for n in ("q", "k", "v")),
        ln=ln1)
    qp, kp, vp = (o.reshape(kv.shape) for o in outs)
    x = flash_attention_out_int8(qp[:, :Lx_], kp, vp, heads, attn_p["out"], x)
    x2 = x.reshape(-1, D_)
    y = w8a8_mlp_res(x2, mlp_p["fc1"], mlp_p["fc2"], ln2, x2)
    return y.reshape(Bn, Lx_, D_)


def make_params(rs):
    # weight scales sized so dequantized weights are ~N(0, 1/sqrt(fan_in))
    # and attention scores stay in the exact (non-saturating) domain of the
    # production kernels' clamped softmax — like a real trained tower
    # (|scaled scores| < 110; the clamp semantics are covered by
    # tests/test_flash_attention.py::test_large_scores_saturate_without_overflow)
    def qleaf(k, n):
        return {"kernel": {"qa": jnp.asarray(rs.randint(-127, 128, (k, n), np.int8)),
                           "scale": jnp.asarray(
                               np.abs(rs.randn(1, n)).astype(np.float32)
                               * (0.5 / 127.0 / np.sqrt(k)))},
                "bias": jnp.asarray(rs.randn(n).astype(np.float32) * 0.01)}
    attn_p = {n: qleaf(D, D) for n in ("q", "k", "v", "out")}
    mlp_p = {"fc1": qleaf(D, H), "fc2": qleaf(H, D)}
    ln1 = (jnp.asarray(1 + 0.01 * rs.randn(D).astype(np.float32)),
           jnp.asarray(0.01 * rs.randn(D).astype(np.float32)))
    ln2 = (jnp.asarray(1 + 0.01 * rs.randn(D).astype(np.float32)),
           jnp.asarray(0.01 * rs.randn(D).astype(np.float32)))
    return attn_p, mlp_p, ln1, ln2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rs = np.random.RandomState(0)
    attn_p, mlp_p, ln1, ln2 = make_params(rs)
    x = jnp.asarray(rs.randn(B * T, Lx, D).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    extras = jnp.asarray(rs.randn(B * T, Lext, D).astype(np.float32) * 0.1
                         ).astype(jnp.bfloat16)

    if args.parity:
        a = np.asarray(base_layer(x, extras, attn_p, mlp_p, ln1, ln2),
                       np.float32)
        b = np.asarray(mega_layer(x, extras, attn_p, mlp_p, ln1, ln2),
                       np.float32)
        diff = np.abs(a - b).max()
        rel = diff / max(np.abs(a).max(), 1e-6)
        print(f"parity max abs diff {diff:.5f} (rel {rel:.5f})")
        assert rel < 2e-2, "mega kernel diverges from base composition"
        print("PARITY OK")
        return

    dev = jax.devices()[0]
    x, extras = jax.device_put((x, extras), dev)

    for name, fn in (("base", base_layer), ("mega", mega_layer)):
        @jax.jit
        def chain(x, extras, fn=fn):
            def body(i, carry):
                h, acc = carry
                o = fn(h, extras, attn_p, mlp_p, ln1, ln2)
                s = o.astype(jnp.float32).sum()
                return (h + (s * 0).astype(h.dtype), acc + s)
            return jax.lax.fori_loop(0, args.iters, body,
                                     (x, jnp.float32(0)))[1]
        float(chain(x, extras))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(x, extras))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{name}: {best*1e3:.3f} ms/layer  "
              f"(x12 = {best*12*1e3:.1f} ms/fwd-equiv)")


if __name__ == "__main__":
    main()
