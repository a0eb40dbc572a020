"""Batch sweep of the w8a8 patch-major zero-shot forward.

The conv prologue was one reason B=16/32 regressed in round 2 (its HBM
relayout grows with B); with patch-major input the embed is a contiguous
GEMM, so the optimal batch may have moved. Chain-in-one-jit timing (see
bench.py for why per-call host timing is unreliable here).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.models.vision import patchify
    from gava_clip_tpu.ops.quant import quantize_tower_params
    from gava_clip_tpu.utils.flagship import build_zero_shot

    T = 8
    ITERS = 100
    model = build_zero_shot(num_frames=T, num_classes=400)
    buffers = jax.device_put(model.buffers, jax.devices()[0])

    def cast_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x, tree)

    params = jax.device_put(
        cast_bf16(quantize_tower_params(model.params, act_quant=True)),
        jax.devices()[0])
    print("device:", jax.devices()[0])

    for B in (int(x) for x in (sys.argv[1:] or ["4", "8", "16", "32"])):
        video = jax.jit(lambda k: patchify(jax.random.uniform(
            k, (B, T, 224, 224, 3), jnp.bfloat16), (16, 16)))(
                jax.random.PRNGKey(0))

        @jax.jit
        def chain(p, v):
            def body(i, carry):
                vv, acc = carry
                s = model.apply(p, buffers, vv, compute_dtype=jnp.bfloat16,
                                attn_impl="flash", scan_unroll=12,
                                input_format="patches")["logits"] \
                    .astype(jnp.float32).sum()
                return (vv + (s * 0).astype(vv.dtype), acc + s)
            return jax.lax.fori_loop(0, ITERS, body, (v, jnp.float32(0)))[1]

        float(chain(params, video))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(params, video))
            best = max(best, B * ITERS / (time.perf_counter() - t0))
        print(f"B={B}: {best:.1f} clips/s  ({B / best * 1e3:.2f} ms/iter)")


if __name__ == "__main__":
    main()
