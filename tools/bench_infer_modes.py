"""Compare inference modes (bf16 / w8 / w8a8) at the bench workload shape.

Uses the chained-in-jit measurement (data-dependent chain of forwards inside
one jit, single scalar read) — immune to the relay's unreliable
block_until_ready (see CLAUDE.md).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(model, params, buffers, B, T, iters=20, reps=3, unroll=12):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(params, video):
        def body(i, carry):
            v, acc = carry
            logits = model.apply(params, buffers, v,
                                 compute_dtype=jnp.bfloat16,
                                 attn_impl="flash", scan_unroll=unroll)["logits"]
            s = logits.astype(jnp.float32).sum()
            return (v + (s * 0).astype(v.dtype), acc + s)
        return jax.lax.fori_loop(0, iters, body,
                                 (video, jnp.float32(0)))[1]

    video = jax.jit(lambda k: jax.random.uniform(
        k, (B, T, 224, 224, 3), jnp.float32))(jax.random.PRNGKey(0))
    float(chain(params, video))
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(params, video))
        dt = time.perf_counter() - t0
        best = max(best, B * iters / dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+", default=["bf16", "w8a8"])
    ap.add_argument("--batches", nargs="+", type=int, default=[8])
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.ops.quant import quantize_tower_params
    from gava_clip_tpu.utils.flagship import build_zero_shot

    model = build_zero_shot(num_frames=args.frames, num_classes=400)
    buffers = jax.device_put(model.buffers, jax.devices()[0])

    for mode in args.modes:
        if mode == "bf16":
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if np.issubdtype(x.dtype, np.floating) else x, model.params)
        else:
            params = quantize_tower_params(model.params,
                                           act_quant=(mode == "w8a8"))
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
                params)
        params = jax.device_put(params, jax.devices()[0])
        for B in args.batches:
            cps = measure(model, params, buffers, B, args.frames)
            print(f"mode={mode:5s} B={B:3d}: {cps:.1f} clips/s", flush=True)


if __name__ == "__main__":
    main()
