"""Measure the flagship train step on the real TPU across configs.

Usage: python tools/bench_train_step.py [--remat full dots none] [--steps 20]

Reference workload shape: B=4, T=70, 224^2 ViT-B/16, batch_split as in
train_scripts/updrs_3cls_train_tulip.sh. Reports median step ms per config
plus a tunnel-health check (see CLAUDE.md: the TPU relay has degradation
windows; re-run if the variance flag trips).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", nargs="+", default=["full", "save_attn_qkv"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=70)
    ap.add_argument("--no_donate", action="store_true")
    ap.add_argument("--attn", default="flash")
    ap.add_argument("--unroll", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.models.vita_clip import trainable_mask
    from gava_clip_tpu.train.state import create_train_state, make_optimizer
    from gava_clip_tpu.train.step import LossConfig, make_train_step
    from gava_clip_tpu.utils.flagship import build_flagship

    print(f"backend: {jax.default_backend()}")
    model = build_flagship(num_frames=args.frames)
    mask = trainable_mask(model.params, model.cfg)
    opt = make_optimizer(lr=5e-6, num_steps=2000, weight_decay=0.2)

    loss_cfg = LossConfig(num_classes=3, focal_ordinal=True, fo_beta=0.2,
                          use_support_memory=True, add_nte=True)

    rs = np.random.RandomState(0)
    B, T = args.batch, args.frames
    batch_np = {
        "video": rs.rand(B, T, 224, 224, 3).astype(np.float32),
        "labels": rs.randint(0, 3, size=B),
        "nte": rs.randn(B, 70, 512).astype(np.float32),
        "memory": rs.randn(64, 4, 512).astype(np.float32),
        "mt_labels": rs.randint(0, 3, size=64),
    }

    for remat in args.remat:
        state = create_train_state(model.params, mask, opt)
        # commit to device once (CLAUDE.md: uncommitted numpy re-transfers
        # through the relay every call)
        state = jax.tree_util.tree_map(jnp.asarray, state)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        jax.block_until_ready(state.trainable)

        step = make_train_step(model, loss_cfg, opt,
                               compute_dtype=jnp.bfloat16,
                               attn_impl=args.attn, remat=remat,
                               donate=not args.no_donate,
                               scan_unroll=args.unroll)
        t0 = time.time()
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics["total"])
        compile_s = time.time() - t0
        times = []
        for _ in range(args.steps):
            t0 = time.time()
            state, metrics = step(state, batch)
            jax.block_until_ready(metrics["total"])
            times.append(time.time() - t0)
        med = float(np.median(times)) * 1e3
        spread = (max(times) - min(times)) / np.median(times)
        flag = "  [HIGH VARIANCE - tunnel may be degraded]" if spread > 1.0 else ""
        print(f"remat={remat:5s} donate={not args.no_donate} attn={args.attn}: "
              f"median {med:.1f} ms  ({B / med * 1e3:.2f} clips/s)  "
              f"compile {compile_s:.1f}s  min {min(times)*1e3:.1f}  "
              f"max {max(times)*1e3:.1f}{flag}")


if __name__ == "__main__":
    main()
