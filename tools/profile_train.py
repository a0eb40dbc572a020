"""Capture + parse a device trace of the flagship train step.

Writes a jax.profiler trace of a few donated train steps at the reference
shape (B=4, T=70 — train_scripts/updrs_3cls_train_tulip.sh), then parses the
trace-event JSON for per-op device durations, aggregated by op category.
This is the same methodology that found the 1.53 ms of reshape repacks in
the round-3 inference forward (PROGRESS.md).

Usage: python tools/profile_train.py [--remat full] [--steps 3] [--top 40]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def categorize(name: str) -> str:
    n = name.lower()
    if "pallas" in n or "custom-call" in n:
        # pallas kernels keep their python-side names
        m = re.search(r"(flash|w8a8|int8|attn|matmul|mlp|qkv)[\w\d_]*", n)
        return f"pallas:{m.group(0)}" if m else "custom-call"
    for k in ("convolution", "dot", "copy", "transpose", "reshape",
              "bitcast", "concatenate", "scatter", "gather", "reduce",
              "all-reduce", "dynamic-slice", "dynamic-update-slice", "select",
              "broadcast", "iota", "convert", "pad", "slice"):
        if n.startswith(k) or f" {k}" in n[:40]:
            return k
    # XLA fusion names embed their op recipe (add_add_fusion.6,
    # convert_reduce_fusion.32) — anything *_fusion is a fusion
    if "fusion" in n:
        return "fusion"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", default="full")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=70)
    ap.add_argument("--frozen_int8", action="store_true")
    ap.add_argument("--outdir", default="/tmp/jaxtrace_train")
    ap.add_argument("--parse_only", action="store_true",
                    help="re-parse an existing trace in --outdir")
    args = ap.parse_args()
    if args.parse_only:
        parse(args)
        return

    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.models.vita_clip import trainable_mask
    from gava_clip_tpu.train.state import create_train_state, make_optimizer
    from gava_clip_tpu.train.step import LossConfig, make_train_step
    from gava_clip_tpu.utils.flagship import build_flagship

    B, T = args.batch, args.frames
    model = build_flagship(num_frames=T)
    mask = trainable_mask(model.params, model.cfg)
    opt = make_optimizer(lr=5e-6, num_steps=2000, weight_decay=0.2)
    loss_cfg = LossConfig(num_classes=3, focal_ordinal=True, fo_beta=0.2,
                          use_support_memory=True, add_nte=True)
    rs = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in {
        "video": rs.rand(B, T, 224, 224, 3).astype(np.float32),
        "labels": rs.randint(0, 3, size=B),
        "nte": rs.randn(B, 70, 512).astype(np.float32),
        "memory": rs.randn(64, 4, 512).astype(np.float32),
        "mt_labels": rs.randint(0, 3, size=64)}.items()}
    state = jax.tree_util.tree_map(jnp.asarray, create_train_state(
        model.params, mask, opt))
    jax.block_until_ready(state.trainable)
    attn = "flash" if jax.default_backend() == "tpu" else "xla"
    step = make_train_step(model, loss_cfg, opt, compute_dtype=jnp.bfloat16,
                           attn_impl=attn, remat=args.remat, donate=True,
                           frozen_int8=args.frozen_int8)
    # compile + warm outside the trace
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total"])

    os.system(f"rm -rf {args.outdir}")
    jax.profiler.start_trace(args.outdir)
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total"])
    jax.profiler.stop_trace()
    parse(args)


def parse(args):
    paths = glob.glob(f"{args.outdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace written", file=sys.stderr)
        sys.exit(1)
    d = json.loads(gzip.open(sorted(paths)[-1]).read())
    events = d["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and "args" in e}
    # leaf op rows live on the "XLA Ops" thread of the device pid; the
    # module/while/checkpoint parent spans live on other threads and would
    # double-count
    op_tracks = {k for k, n in tids.items() if "XLA Ops" in n}
    if not op_tracks:  # fallback: device pid, skip known parent spans
        dev_pids = {p for p, n in pids.items()
                    if "TPU" in n or "/device" in n.lower()}
        op_tracks = {k for k in tids if k[0] in dev_pids}
    # collect leaf rows per track, then convert to SELF time: XLA op tracks
    # nest (while/checkpoint/call spans contain their body ops), so raw
    # durations double-count — subtract each span's children.
    by_track = defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if (e.get("pid"), e.get("tid")) not in op_tracks:
            continue
        name = e.get("name", "?")
        if name.startswith(("$", "pro", "Steps")):
            continue
        by_track[(e["pid"], e["tid"])].append(
            (e["ts"], e["ts"] + e["dur"], e["dur"], name))
    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    n_ev = 0
    for rows in by_track.values():
        rows.sort(key=lambda r: (r[0], -r[2]))
        stack = []  # (end, child_total_accum_index)
        selfs = []
        for ts, end, dur, name in rows:
            while stack and ts >= stack[-1][0]:
                stack.pop()
            if stack:
                stack[-1][1][0] -= dur  # subtract from parent's self time
            cell = [dur]
            selfs.append((name, cell))
            stack.append((end, cell))
        for name, cell in selfs:
            d = max(cell[0], 0.0)
            per_op[name] += d
            per_cat[categorize(name)] += d
            n_ev += 1
    total = sum(per_cat.values())
    steps_us = total / args.steps
    print(f"\n== device total {total/1e3:.3f} ms over {args.steps} steps "
          f"({steps_us/1e3:.3f} ms/step busy), {n_ev} events ==")
    print("\n-- by category (ms/step) --")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"{v/args.steps/1e3:9.3f}  {100*v/total:5.1f}%  {k}")
    print(f"\n-- top {args.top} ops (ms/step) --")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{v/args.steps/1e3:9.3f}  {k[:140]}")


if __name__ == "__main__":
    main()
