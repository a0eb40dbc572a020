"""End-to-end training-driver run at the flagship shape (VERDICT r4 #1).

Every driver-recorded TPU number so far came from bench.py's synthetic-input
jit loops. This tool runs the ACTUAL production path — cli/train.py:
thread-pool prefetcher -> cv2 decode of real encoded video -> on-device
normalize -> jitted train step -> periodic eval -> async checkpoint ->
auto-resume continuation — against a synthesized TULIP-format dataset
(70-frame cv2-encoded clips + train/val csv + nte/*.npy + memory pkl +
ke dir: the exact asset formats of SURVEY.md §2.7), and writes ONE JSON
artifact with:

  - sustained e2e ms/step, computed from metrics.jsonl "t" wall stamps
    between print steps (the pipelined rate the driver actually achieves,
    NOT the per-print-step sync time), eval windows excluded
  - the host/device decomposition: loader-only decode ms/batch, relay
    H2D transfer ms/batch (42 MB uint8 at B=4 T=70 224^2), and the known
    device step (bench_train.json) for the overlap statement
  - loss trajectory (first-k vs last-k print records) and eval accuracy
  - a resume continuation: second invocation auto-resumes from the
    first run's checkpoint and continues at the exact next step

Reference behavior being matched: train_scripts/updrs_3cls_train_tulip.sh
(B=4, T=70, 224^2, KAPT v1-v5 + support memory + NTE + focal-ordinal,
2000 steps/fold).

Usage:
  python tools/run_e2e_train.py --steps 150 --out queued_bench_r05/e2e_train.json
  python tools/run_e2e_train.py --tiny            # CPU smoke (CI-safe)
"""

import argparse
import json
import os
import os.path as osp
import pickle
import shutil
import sys
import time

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


# ---------------------------------------------------------------- dataset

def _write_clip(path: str, label: int, T: int, size: int,
                rs: np.random.RandomState):
    """A 70-frame clip with a class-separable signal: a moving bright blob
    whose size/intensity depends on the label, over a smooth textured
    background (smooth = realistic inter-frame compression, so decode cost
    is representative of real chunked gait video, not noise)."""
    import cv2
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    base = (96 + 48 * np.sin(xx / 23.0) * np.cos(yy / 31.0))
    radius = size * (0.10 + 0.11 * label)       # class signal: blob size
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                        (size, size))
    assert w.isOpened(), f"cv2 VideoWriter failed for {path}"
    cx0, cy0 = rs.uniform(0.25, 0.75, 2) * size
    for t in range(T):
        cx = cx0 + np.sin(t / 9.0) * size * 0.18
        cy = cy0 + np.cos(t / 7.0) * size * 0.18
        blob = 120.0 * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2)
                                / (2 * radius ** 2)))
        frame = np.clip(base + blob + rs.randn(size, size) * 4, 0, 255)
        w.write(np.stack([frame] * 3, -1).astype(np.uint8))
    w.release()


def build_dataset(cwd: str, n_train: int, n_val: int, T: int, size: int,
                  embed_dim: int = 512, nte_dim: int = 512,
                  kdim: int = 768, n_cls: int = 3, seed: int = 0):
    """Lay out datasets/tulip/chunks_0/ exactly as the reference expects
    (remap_fold_data_root rewrites --data_root tulip to this path)."""
    rs = np.random.RandomState(seed)
    root = osp.join(cwd, "datasets", "tulip", "chunks_0")
    nte_dir = osp.join(root, "nte")
    os.makedirs(nte_dir, exist_ok=True)

    def make_split(split: str, n: int):
        lines = []
        for i in range(n):
            label = i % n_cls
            name = f"{split}_{i:03d}_CC0.mp4"
            _write_clip(osp.join(root, name), label, T, size, rs)
            lines.append(f"{name},{label}")
            # NTE: class-shifted rows, ~15% zero rows (validity-mask path)
            nte = rs.randn(70, nte_dim).astype(np.float32) + 0.1 * label
            nte[rs.rand(70) < 0.15] = 0.0
            np.save(osp.join(nte_dir, name.rsplit(".", 1)[0] + ".npy"), nte)
        with open(osp.join(root, f"{split}_updrs.csv"), "w") as f:
            f.write("\n".join(lines) + "\n")

    make_split("train", n_train)
    make_split("val", n_val)

    # memory bank pkl (utils/preprocess.py format, SURVEY.md §2.7)
    os.makedirs(osp.join(cwd, "data", "gait"), exist_ok=True)
    n_mem = 96
    mem = {"embeds": rs.randn(n_mem, 4, embed_dim).astype(np.float32),
           "updrs": np.array([i % n_cls for i in range(n_mem)]),
           "diag": np.array([i % n_cls for i in range(n_mem)])}
    mem_path = osp.join(cwd, "data", "gait", "tulip_dict_basic_4f.pkl")
    with open(mem_path, "wb") as f:
        pickle.dump(mem, f)

    # knowledge dir, v1-v5 (kapt_head.py formats)
    kdir = osp.join(cwd, "data", "ke_updrs")
    os.makedirs(kdir, exist_ok=True)
    np.save(osp.join(kdir, "all.npy"), rs.randn(n_cls, kdim).astype(np.float32))
    for kv in ("v1", "v2", "v3", "v4", "v5"):
        np.save(osp.join(kdir, f"EntityEmb_{kv}.npy"),
                rs.randn(n_cls, kdim).astype(np.float32))
        with open(osp.join(kdir, f"simQdesc_{kv}.txt"), "w") as f:
            for c in range(n_cls):
                f.write(f"gait knowledge {kv} severity {c} with step "
                        f"irregularity and reduced walking speed\n")

    classes = osp.join(cwd, "classes.txt")
    shutil.copy(osp.join(REPO, "classes", "updrs_3cls_classes.txt"), classes)
    return classes, mem_path, kdir


# ---------------------------------------------------------------- driver

def driver_argv(args, classes, mem_path, kdir, num_steps, resume_dir=None):
    tiny = args.tiny
    argv = [
        "--nfold", "1", "--type", "updrs", "--data_root", "tulip",
        "--text_prompt_classes_path", classes,
        "--num_steps", str(num_steps),
        "--eval_freq", str(args.eval_freq),
        "--save_freq", str(args.save_freq),
        "--print_freq", str(args.print_freq),
        "--batch_size", str(args.batch),
        "--num_frames", str(args.frames),
        "--spatial_size", "32" if tiny else "224",
        "--lr", str(args.lr), "--num_workers", str(args.workers),
        "--no_mirror",
        "--use_text_prompt_learning", "--use_text_prompt_CSC",
        "--use_summary_token", "--use_local_prompts", "--use_global_prompts",
        "--text_prompt_init", "cntn_split_uni_disc",
        "--knowledge_dir", kdir,
        "--use_support_memory", "--memory_data_path", mem_path,
        "--mem_batch_size", "64",
        "--clLoss_nte_video", "--use_focal_ordinal_loss",
    ]
    for kv in ("v1", "v2", "v3", "v4", "v5"):
        argv += ["--knowledge_version", kv]
    if tiny:
        argv += ["--patch_size", "16", "--num_layers", "2",
                 "--num_heads", "2", "--feature_dim", "32",
                 "--embed_dim", "32", "--mlp_factor", "2.0",
                 "--text_transformer_width", "32",
                 "--text_transformer_heads", "2",
                 "--text_transformer_layers", "2",
                 "--text_num_prompts", "2", "--num_global_prompts", "2"]
    else:
        argv += ["--use_bf16", "--text_num_prompts", "8",
                 "--num_global_prompts", "8"]
    if resume_dir:
        argv += ["--auto_resume", "--checkpoint_dir", resume_dir]
    return argv


def read_metrics(logdir):
    path = osp.join(logdir, "fold_0", "metrics.jsonl")
    with open(path) as f:
        return [json.loads(x) for x in f if x.strip()], path


def sustained_ms(records, print_freq, warmup_steps):
    """Pipelined e2e rate: wall-time deltas between consecutive loss-print
    records print_freq steps apart, with no eval record between them."""
    out = []
    prev = None
    for r in records:
        if "loss" not in r:
            prev = None            # eval boundary: drop the spanning pair
            continue
        if prev is not None and r["step"] - prev["step"] == print_freq \
                and prev["step"] >= warmup_steps:
            out.append((r["t"] - prev["t"]) / print_freq * 1e3)
        prev = r
    return out


def run_driver(argv, cwd):
    """Invoke cli/train.py main() in-process; return the new log dir."""
    from gava_clip_tpu.cli.train import main
    before = set(os.listdir("logs")) if osp.isdir("logs") else set()
    # the driver names logdirs by minute — avoid a same-minute collision
    while osp.isdir("logs") and any(
            time.strftime("%m%d-%H%M") in d for d in os.listdir("logs")):
        time.sleep(5)
    main(argv)
    after = set(os.listdir("logs"))
    new = sorted(after - before)
    assert len(new) == 1, f"expected one new logdir, got {new}"
    return osp.join(os.getcwd(), "logs", new[0])


def measure_host_decode(args, steps=8):
    """Loader-only rate: how fast the prefetcher + cv2 decode path can feed
    batches with NO device in the loop (the host-side ceiling)."""
    from gava_clip_tpu.data.loader import LoaderConfig, create_train_loader
    root = osp.join(os.getcwd(), "datasets", "tulip", "chunks_0")
    cfg = LoaderConfig(
        train_list_path=osp.join(root, "train_updrs.csv"), data_root=root,
        batch_size=args.batch, num_frames=args.frames, sampling_rate=1,
        spatial_size=32 if args.tiny else 224, num_workers=args.workers,
        num_steps=steps + 2, add_nte=True, type="updrs")
    loader = create_train_loader(cfg)
    it = iter(loader)
    next(it)                                    # warm the prefetcher
    t0 = time.time()
    n = 0
    for batch in it:
        n += 1
    return (time.time() - t0) / max(n, 1) * 1e3


def measure_transfer(args, reps=6):
    """H2D ms for one uint8 video batch (through the serialized relay in
    this environment; PCIe on a real v5e host)."""
    import jax
    import jax.numpy as jnp
    size = 32 if args.tiny else 224
    v = np.random.randint(0, 255, (args.batch, args.frames, size, size, 3),
                          dtype=np.uint8)
    times = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(jnp.asarray(v))
        times.append(time.time() - t0)
    return float(np.median(times) * 1e3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--resume-extra", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=70)
    ap.add_argument("--eval-freq", type=int, default=75)
    ap.add_argument("--save-freq", type=int, default=75)
    ap.add_argument("--print-freq", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--n-train", type=int, default=24)
    ap.add_argument("--n-val", type=int, default=8)
    ap.add_argument("--clip-size", type=int, default=256)
    ap.add_argument("--workdir", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: tiny model/clips, 12 steps")
    args = ap.parse_args()

    if args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")
        args.steps, args.resume_extra = 12, 4
        args.batch, args.frames, args.clip_size = 2, 4, 48
        args.eval_freq = args.save_freq = 6
        args.print_freq, args.workers = 2, 2
        args.n_train, args.n_val = 6, 4

    t_start = time.time()
    cwd = args.workdir or osp.join(
        "/tmp", f"gava_e2e_train_{'tiny' if args.tiny else 'full'}")
    fresh = not osp.isdir(osp.join(cwd, "datasets"))
    os.makedirs(cwd, exist_ok=True)
    os.chdir(cwd)
    if fresh:
        print(f"[e2e] synthesizing dataset under {cwd} ...", flush=True)
        classes, mem_path, kdir = build_dataset(
            cwd, args.n_train, args.n_val, args.frames, args.clip_size,
            embed_dim=32 if args.tiny else 512,
            nte_dim=32 if args.tiny else 512)
    else:
        classes = osp.join(cwd, "classes.txt")
        mem_path = osp.join(cwd, "data", "gait", "tulip_dict_basic_4f.pkl")
        kdir = osp.join(cwd, "data", "ke_updrs")
    dataset_s = time.time() - t_start

    # ---- run 1: fresh training
    print(f"[e2e] run 1: {args.steps} steps ...", flush=True)
    t0 = time.time()
    logdir1 = run_driver(
        driver_argv(args, classes, mem_path, kdir, args.steps), cwd)
    run1_s = time.time() - t0
    rec1, metrics_path1 = read_metrics(logdir1)

    # ---- run 2: auto-resume continuation from run 1's checkpoints
    print("[e2e] run 2: auto-resume continuation ...", flush=True)
    t0 = time.time()
    logdir2 = run_driver(
        driver_argv(args, classes, mem_path, kdir,
                    args.steps + args.resume_extra,
                    resume_dir=osp.join(logdir1, "fold_0")), cwd)
    run2_s = time.time() - t0
    rec2, _ = read_metrics(logdir2)

    # ---- analysis
    warmup = 3 * args.print_freq
    rates = sustained_ms(rec1, args.print_freq, warmup_steps=warmup)
    loss_recs = [r for r in rec1 if "loss" in r]
    eval_recs = [r for r in rec1 if "eval_acc" in r]
    k = max(1, min(3, len(loss_recs) // 3))
    loss_first = float(np.mean([r["loss"] for r in loss_recs[:k]]))
    loss_last = float(np.mean([r["loss"] for r in loss_recs[-k:]]))
    data_ms = [r["data_time_s"] * 1e3 for r in loss_recs
               if r["step"] >= warmup]
    resume_first = min((r["step"] for r in rec2 if "loss" in r),
                       default=None)

    host_ms = measure_host_decode(args)
    h2d_ms = measure_transfer(args)

    result = {
        "metric": "e2e train driver, flagship shape (cli/train.py, real "
                  "cv2 decode + prefetch + eval + async ckpt + resume)",
        "unit": "ms/step sustained",
        "value": round(float(np.median(rates)), 1) if rates else None,
        "sustained_ms_per_step_p90": (round(float(np.percentile(rates, 90)), 1)
                                      if rates else None),
        # the relay oscillates (CLAUDE.md): p25 / best-4 windows show the
        # healthy-window pipeline rate; the median absorbs degraded windows
        "sustained_ms_per_step_p25": (round(float(np.percentile(rates, 25)), 1)
                                      if rates else None),
        "sustained_ms_per_step_best4": (round(float(np.mean(
            np.sort(rates)[:4])), 1) if len(rates) >= 4 else None),
        "n_rate_windows": len(rates),
        "config": {"batch": args.batch, "frames": args.frames,
                   "steps_run1": args.steps, "print_freq": args.print_freq,
                   "n_train_clips": args.n_train, "clip_px": args.clip_size,
                   "lr": args.lr, "workers": args.workers,
                   "tiny": args.tiny},
        "loss_first": round(loss_first, 4), "loss_last": round(loss_last, 4),
        "loss_decreased": loss_last < loss_first,
        "eval_accs": [round(r["eval_acc"], 2) for r in eval_recs],
        "eval_ran": len(eval_recs) > 0,
        "resume": {"expected_first_step": args.steps,
                   "observed_first_step": resume_first,
                   "exact": resume_first == args.steps,
                   "extra_steps": args.resume_extra},
        "host_decode_ms_per_batch": round(host_ms, 1),
        "h2d_transfer_ms_per_batch": round(h2d_ms, 1),
        "print_step_sync_ms_p50": (round(float(np.median(
            [r["batch_time_s"] * 1e3 for r in loss_recs
             if r["step"] >= warmup])), 1) if loss_recs else None),
        "data_time_ms_p50": (round(float(np.median(data_ms)), 1)
                             if data_ms else None),
        "wall_s": {"dataset_synth": round(dataset_s, 1),
                   "run1": round(run1_s, 1), "run2": round(run2_s, 1)},
        "logdir": logdir1,
    }
    import jax
    result["device"] = str(jax.devices()[0])
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        out = args.out if osp.isabs(args.out) else osp.join(REPO, args.out)
        os.makedirs(osp.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            f.write(line + "\n")
        shutil.copy(metrics_path1,
                    osp.join(osp.dirname(out), "e2e_train_metrics.jsonl"))
    ok = (rates and result["loss_decreased"] and result["eval_ran"]
          and result["resume"]["exact"])
    print(f"[e2e] {'PASS' if ok else 'INCOMPLETE'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
