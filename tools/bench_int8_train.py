"""Decompose the --int8_frozen train-step regression (fp 310 ms -> int8 439).

Times, at the flagship shape (B=4, T=70), via two-length chains:
  1. quantize_frozen_for_train alone (the per-step weight requant pass)
  2. forward-only loss, bf16 frozen vs int8 'qt' frozen
  3. full grad step, both

Usage: python tools/bench_int8_train.py [--stages 1 2 3]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def chain_time(make_body, init, lo=5, hi=20, reps=3):
    best = {}
    for iters in (lo, hi):
        @jax.jit
        def chain(a, iters=iters):
            return jax.lax.fori_loop(0, iters, make_body, a)

        r = chain(init)
        jax.block_until_ready(r)
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(init))
            b = min(b, time.perf_counter() - t0)
        best[iters] = b
    return (best[hi] - best[lo]) / (hi - lo)


def main():
    from gava_clip_tpu.models.vita_clip import trainable_mask
    from gava_clip_tpu.ops.quant import quantize_frozen_for_train
    from gava_clip_tpu.train.state import (combine_params, create_train_state,
                                           make_optimizer, partition_params)
    from gava_clip_tpu.train.step import LossConfig, compute_losses
    from gava_clip_tpu.utils.flagship import build_flagship

    B, T = 4, 70
    model = build_flagship(num_frames=T)
    mask = trainable_mask(model.params, model.cfg)
    trainable, frozen = partition_params(
        jax.tree_util.tree_map(jnp.asarray, model.params), mask)
    jax.block_until_ready(frozen)
    loss_cfg = LossConfig(num_classes=3, focal_ordinal=True, fo_beta=0.2,
                          use_support_memory=True, add_nte=True)
    rs = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in {
        "video": rs.rand(B, T, 224, 224, 3).astype(np.float32),
        "labels": rs.randint(0, 3, size=B),
        "nte": rs.randn(B, 70, 512).astype(np.float32),
        "memory": rs.randn(64, 4, 512).astype(np.float32),
        "mt_labels": rs.randint(0, 3, size=64)}.items()}
    print("device:", jax.devices()[0])

    # 1. requant pass alone
    def requant_body(i, fz):
        q = quantize_frozen_for_train(fz)
        leaf = q["visual"]["blocks"]["mlp"]["fc1"]["kernel"]["qt"]
        # data-dep: feed a scalar back into one float leaf
        s = (leaf.astype(jnp.float32).sum() * 0)
        return jax.tree_util.tree_map(
            lambda x: x + s.astype(x.dtype) if x.dtype != jnp.int8 else x,
            fz)

    dt = chain_time(requant_body, frozen)
    print(f"requant pass: {dt * 1e3:.1f} ms")

    def make_loss(fi):
        def loss_fn(tr, fz, b):
            if fi:
                fz = quantize_frozen_for_train(fz)
            params = combine_params(tr, fz)
            outputs = model.apply(params, model.buffers, b["video"],
                                  memory=b.get("memory"),
                                  video_nte=b.get("nte"),
                                  compute_dtype=jnp.bfloat16,
                                  attn_impl="flash", remat="full")
            return compute_losses(outputs, b["labels"], b.get("mt_labels"),
                                  loss_cfg)
        return loss_fn

    for fi in (False, True):
        tag = "int8" if fi else "bf16"
        loss_fn = make_loss(fi)

        def fwd_body(i, carry, loss_fn=loss_fn):
            tr, acc = carry
            loss, _ = loss_fn(tr, frozen, batch)
            return (jax.tree_util.tree_map(
                lambda x: x + (loss * 0).astype(x.dtype), tr), acc + loss)

        dt = chain_time(fwd_body, (trainable, jnp.float32(0)))
        print(f"fwd-only {tag}: {dt * 1e3:.1f} ms")

        grad_fn = jax.grad(loss_fn, has_aux=True)

        def grad_body(i, carry, grad_fn=grad_fn):
            tr, acc = carry
            g, m = grad_fn(tr, frozen, batch)
            return (jax.tree_util.tree_map(
                lambda x, gg: x + gg * 0, tr, g), acc + m["total"])

        dt = chain_time(grad_body, (trainable, jnp.float32(0)))
        print(f"fwd+bwd {tag}: {dt * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
