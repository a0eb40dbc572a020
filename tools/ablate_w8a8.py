"""Decompose the w8a8 zero-shot forward at the bench shape (B=8, T=8).

1. Tower depth scaling: forward time at 12/6/2 layers -> per-layer cost and
   fixed overhead (patch embed, final proj, logits).
2. Kernel microbenches at the exact per-layer shapes: qkv triple GEMM,
   flash attention + int8 out-proj, fused MLP.

All timings use the data-dependent chain-in-one-jit trick (the relay's
block_until_ready is unreliable), measured at TWO chain lengths with the
difference taken — the ~30 ms relay round-trip per chain invocation
otherwise inflates every per-iter figure by (RTT / iters), which at 30
iters is a ~1 ms/iter floor that once made healthy kernels read as 10x
slow.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# GAVA_BENCH_TINY=1 shrinks shapes/iters so the FULL tool path is
# smoke-testable on the 1-core CPU host (same pattern as bench.py) —
# a queued-suite slot must never be the first time this code runs.
TINY = os.environ.get("GAVA_BENCH_TINY") == "1"
if TINY:
    # smoke mode must never touch the TPU relay (its PJRT init blocks
    # indefinitely during outage windows — CLAUDE.md); env JAX_PLATFORMS
    # is ignored by the axon plugin, config.update is the working override
    jax.config.update("jax_platforms", "cpu")
B, T = (1, 2) if TINY else (8, 8)
ITERS_LO, ITERS_HI = (2, 4) if TINY else (30, 150)
IMG = 96 if TINY else 224
DEPTHS = (3, 2, 1) if TINY else (12, 6, 2)


def chain_time(fn, *args, reps=3):
    """Per-iteration time of fn via data-dependent chains at two lengths;
    the (HI-LO)/(HI-LO iters) difference cancels the constant relay
    round-trip so the result is pure device time."""
    best = {}
    for iters in (ITERS_LO, ITERS_HI):
        @jax.jit
        def chain(*a, iters=iters):
            def body(i, carry):
                return fn(*carry)
            return jax.lax.fori_loop(0, iters, body, a)[-1]

        float(chain(*args))  # compile + warm
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(*args))
            b = min(b, time.perf_counter() - t0)
        best[iters] = b
    return (best[ITERS_HI] - best[ITERS_LO]) / (ITERS_HI - ITERS_LO)


def tower_scaling():
    from gava_clip_tpu.ops.quant import quantize_tower_params
    from gava_clip_tpu.utils.flagship import build_zero_shot
    from gava_clip_tpu.models.vita_clip import VitaClipConfig
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.text import TextConfig
    from gava_clip_tpu.models.vita_clip import VitaClip

    times = {}
    for L in DEPTHS:
        cfg = VitaClipConfig(
            vision=VisionConfig(input_size=(IMG, IMG), num_frames=T,
                                feature_dim=768, patch_size=(16, 16),
                                heads=12, layers=L, mlp_factor=4.0,
                                embed_dim=512, use_summary_token=True,
                                use_local_prompts=True,
                                use_global_prompts=True, num_global_prompts=8),
            text=TextConfig(),
            num_classes=400, zeroshot_evaluation=True)
        rs = np.random.RandomState(0)
        model = VitaClip(cfg, zeroshot_text_features=rs.randn(400, 512).astype(np.float32),
                         rng=jax.random.PRNGKey(0))
        params = jax.device_put(jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            quantize_tower_params(model.params, act_quant=True)),
            jax.devices()[0])
        buffers = jax.device_put(model.buffers, jax.devices()[0])
        video = jax.jit(lambda k: jax.random.uniform(
            k, (B, T, IMG, IMG, 3), jnp.float32))(jax.random.PRNGKey(0))

        def fwd(v, acc, params=params, buffers=buffers, model=model):
            s = model.apply(params, buffers, v, compute_dtype=jnp.bfloat16,
                            attn_impl="flash",
                            scan_unroll=L)["logits"].astype(jnp.float32).sum()
            return (v + (s * 0).astype(v.dtype), acc + s)

        dt = chain_time(fwd, video, jnp.float32(0))
        times[L] = dt * 1e3
        print(f"layers={L}: {dt*1e3:.3f} ms/fwd  ({B/dt:.1f} clips/s)")

    hi, _, lo = DEPTHS
    per_layer = (times[hi] - times[lo]) / (hi - lo)
    fixed = times[hi] - hi * per_layer
    print(f"per-layer: {per_layer:.3f} ms   fixed: {fixed:.3f} ms "
          f"({fixed/times[hi]*100:.1f}% of total)")
    return times


def kernel_micro():
    from gava_clip_tpu.ops.int8_matmul import (w8a8_matmul3, w8a8_mlp_res,
                                               w8a8_matmul)
    from gava_clip_tpu.ops.flash_attention import flash_attention_out_int8

    rs = np.random.RandomState(0)
    BT, Lx, Lkv, D, H = ((B * T, 40, 48, 256, 512) if TINY
                         else (B * T, 197, 214, 768, 3072))
    heads = 4 if TINY else 12
    dev = jax.devices()[0]

    def mk(*shape, dtype=jnp.bfloat16):
        return jax.device_put(jnp.asarray(
            rs.randn(*shape).astype(np.float32)).astype(dtype), dev)

    def mkq(*shape):
        return jax.device_put(jnp.asarray(
            rs.randint(-127, 127, shape, np.int8)), dev)

    x2 = mk(BT * Lkv, D)
    wq3 = tuple(mkq(D, D) for _ in range(3))
    s3 = tuple(jax.device_put(jnp.abs(jnp.asarray(
        rs.randn(1, D).astype(np.float32))) * 0.01, dev) for _ in range(3))
    b3 = tuple(mk(D, dtype=jnp.float32) for _ in range(3))
    ln = (mk(D, dtype=jnp.float32), mk(D, dtype=jnp.float32))

    def qkv(x, acc):
        o = w8a8_matmul3(x, wq3, s3, bias3=b3, ln=ln)
        s = o[0].astype(jnp.float32).sum()
        return (x + (s * 0).astype(x.dtype), acc + s)

    dt = chain_time(qkv, x2, jnp.float32(0))
    gemm_tops = 3 * 2 * BT * Lkv * D * D / dt
    print(f"qkv triple GEMM ({BT*Lkv}x{D}x{D}x3): {dt*1e3:.3f} ms "
          f"({gemm_tops/1e12:.0f} TOP/s)")

    q = mk(BT, Lx, D)
    k = mk(BT, Lkv, D)
    v = mk(BT, Lkv, D)
    res = mk(BT, Lx, D)
    out_p = {"kernel": {"qa": mkq(D, D),
                        "scale": jax.device_put(jnp.abs(jnp.asarray(
                            rs.randn(1, D).astype(np.float32))) * 0.01, dev)},
             "bias": mk(D, dtype=jnp.float32)}

    def attn(q, acc):
        o = flash_attention_out_int8(q, k, v, heads, out_p, res)
        s = o.astype(jnp.float32).sum()
        return (q + (s * 0).astype(q.dtype), acc + s)

    dt = chain_time(attn, q, jnp.float32(0))
    attn_flops = BT * (2 * Lx * Lkv * D * 2 + 2 * Lx * D * D)
    print(f"flash attn + int8 out ({BT}x{Lx}x{Lkv}): {dt*1e3:.3f} ms "
          f"({attn_flops/dt/1e12:.0f} TF/s-equiv)")

    xm = mk(BT * Lx, D)
    fc1 = {"kernel": {"qa": mkq(D, H),
                      "scale": jax.device_put(jnp.abs(jnp.asarray(
                          rs.randn(1, H).astype(np.float32))) * 0.01, dev)},
           "bias": mk(H, dtype=jnp.float32)}
    fc2 = {"kernel": {"qa": mkq(H, D),
                      "scale": jax.device_put(jnp.abs(jnp.asarray(
                          rs.randn(1, D).astype(np.float32))) * 0.01, dev)},
           "bias": mk(D, dtype=jnp.float32)}
    resm = mk(BT * Lx, D)

    def mlp(x, acc):
        o = w8a8_mlp_res(x, fc1, fc2, ln, resm)
        s = o.astype(jnp.float32).sum()
        return (x + (s * 0).astype(x.dtype), acc + s)

    dt = chain_time(mlp, xm, jnp.float32(0))
    mlp_tops = 2 * 2 * BT * Lx * D * H / dt
    print(f"fused MLP ({BT*Lx}x{D}x{H}): {dt*1e3:.3f} ms "
          f"({mlp_tops/1e12:.0f} TOP/s)")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    tower_scaling()
    kernel_micro()
