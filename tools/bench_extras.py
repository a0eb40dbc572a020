"""Microbench the per-layer prompt "extras" machinery of the vision block
(models/vision.py:_block) at the flagship zero-shot shape: cls_proj GEMM,
summary LN + 8-token summary attention, local-prompt broadcast, kv concat.

These ops carry negligible FLOPs; the question is how much launch-bound
wall time they cost per layer (the ceiling accounting's 0.14 ms/layer
"unaccounted" row). Uses the two-length chain-difference timing from
tools/ablate_w8a8.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, T = 8, 8
ITERS_LO, ITERS_HI = 30, 150


def chain_time(fn, *args, reps=3):
    best = {}
    for iters in (ITERS_LO, ITERS_HI):
        @jax.jit
        def chain(*a, iters=iters):
            def body(i, carry):
                return fn(*carry)
            return jax.lax.fori_loop(0, iters, body, a)[-1]

        float(chain(*args))
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(*args))
            b = min(b, time.perf_counter() - t0)
        best[iters] = b
    return (best[ITERS_HI] - best[ITERS_LO]) / (ITERS_HI - ITERS_LO)


def main():
    from gava_clip_tpu.ops.linear import linear
    from gava_clip_tpu.ops.norm import layer_norm
    from gava_clip_tpu.ops.attention import multi_head_attention
    from gava_clip_tpu.ops.quant import quantize_tower_params

    rs = np.random.RandomState(0)
    BT, Lx, D, G = B * T, 197, 768, 8
    Bb, Tb = B, T
    dev = jax.devices()[0]
    print("device:", dev)

    def mk(*shape, dtype=jnp.bfloat16):
        return jax.device_put(jnp.asarray(
            rs.randn(*shape).astype(np.float32) * 0.02).astype(dtype), dev)

    x = mk(BT, Lx, D)
    g_prompt = mk(G, D)
    lp_w = mk(Tb, D)
    cls_proj_p = {"kernel": mk(D, D), "bias": mk(D, dtype=jnp.float32)}
    sum_ln = {"scale": mk(D, dtype=jnp.float32),
              "bias": mk(D, dtype=jnp.float32)}
    sum_attn = {n: {"kernel": mk(D, D), "bias": mk(D, dtype=jnp.float32)}
                for n in ("q", "k", "v", "out")}
    # the quantized variant the real w8a8 tower carries
    sum_attn_q = jax.device_put(jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 and a.ndim == 2 else a,
        quantize_tower_params({"attn": {n: dict(v) for n, v in
                                        sum_attn.items()}},
                              act_quant=True)["attn"]), dev)

    def extras_branch(x, acc, attn_p):
        cls = x[:, 0].reshape(Bb, Tb, D)
        cls_proj = linear(cls_proj_p, cls)
        extras = [jnp.broadcast_to(g_prompt[None].astype(x.dtype),
                                   (BT, G, D))]
        s_norm = layer_norm(cls_proj, sum_ln["scale"], sum_ln["bias"])
        summary = cls_proj + multi_head_attention(
            attn_p, s_norm, s_norm, s_norm, 12, impl="xla")
        extras.append(summary.reshape(BT, 1, D))
        lp = lp_w[None].astype(x.dtype) + cls_proj
        extras.append(jnp.broadcast_to(lp[:, None], (Bb, Tb, Tb, D))
                      .reshape(BT, Tb, D))
        kv = jnp.concatenate([x] + extras, axis=1)
        s = kv.astype(jnp.float32).sum()
        return (x + (s * 0).astype(x.dtype), acc + s)

    qp_full = mk(BT, 214, D)

    def slice_copy(x, acc):
        # the `qp[:, :Lx]` slice in _block: non-contiguous along axis 1,
        # must materialize ~19 MB before the attention kernel reads it
        q = qp_full[:, :Lx] * jnp.float32(1.0).astype(x.dtype)
        s = q.astype(jnp.float32).sum()
        return (x + (s * 0).astype(x.dtype), acc + s)

    def summary_mha_only(x, acc, attn_p):
        cls = x[:, 0].reshape(Bb, Tb, D)
        s_norm = layer_norm(cls, sum_ln["scale"], sum_ln["bias"])
        out = multi_head_attention(attn_p, s_norm, s_norm, s_norm, 12,
                                   impl="xla")
        s = out.astype(jnp.float32).sum()
        return (x + (s * 0).astype(x.dtype), acc + s)

    for name, fn in [
        ("extras full (bf16 summary attn)",
         lambda x, a: extras_branch(x, a, sum_attn)),
        ("extras full (w8a8 summary attn)",
         lambda x, a: extras_branch(x, a, sum_attn_q)),
        ("qp[:, :197] slice materialization", slice_copy),
        ("summary MHA only (bf16)",
         lambda x, a: summary_mha_only(x, a, sum_attn)),
        ("summary MHA only (w8a8)",
         lambda x, a: summary_mha_only(x, a, sum_attn_q)),
    ]:
        dt = chain_time(fn, x, jnp.float32(0))
        print(f"{name}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
