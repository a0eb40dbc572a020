"""Time the REAL vision `_block` (w8a8 inference path) in isolation at the
flagship zero-shot shape, to close the gap between the depth-scaling
per-layer figure (tools/ablate_w8a8.py: 1.099 ms) and the sum of kernel
microbenches (0.959 ms). Chain-difference timing as elsewhere.
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
    from gava_clip_tpu.models.vision import (VisionConfig, init_vision_params,
                                             _block)
    from gava_clip_tpu.ops.quant import quantize_tower_params

    cfg = VisionConfig(input_size=(224, 224), num_frames=T, feature_dim=768,
                       patch_size=(16, 16), heads=12, layers=1,
                       mlp_factor=4.0, embed_dim=512, use_summary_token=True,
                       use_local_prompts=True, use_global_prompts=True,
                       num_global_prompts=8)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = init_vision_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda a: np.asarray(a), params)
    blk = jax.tree_util.tree_map(lambda a: a[0], params["blocks"])
    blk = quantize_tower_params({"blocks": blk}, act_quant=True)["blocks"]
    dev = jax.devices()[0]
    blk = jax.device_put(jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if (hasattr(a, "dtype") and a.dtype in (np.float32, jnp.float32)
            and np.ndim(a) >= 2) else a, blk), dev)
    g_prompt = jax.device_put(
        jnp.asarray(params["global_prompts"][0]).astype(jnp.bfloat16), dev)

    rs = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(
        rs.randn(B * T, 197, 768).astype(np.float32) * 0.02)
        .astype(jnp.bfloat16), dev)
    print("device:", dev)

    def step(x, acc):
        y, _ = _block(blk, g_prompt, x, cfg, "flash")
        s = y.astype(jnp.float32).sum()
        return (y * jnp.float32(0.02 / 1.0).astype(y.dtype)
                + x * (s * 0).astype(x.dtype), acc + s)

    dt = chain_time(step, x, jnp.float32(0))
    print(f"real _block (w8a8, flash): {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
