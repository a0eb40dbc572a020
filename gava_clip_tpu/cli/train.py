"""Training driver — the TPU-native counterpart of reference training/train.py.

Reproduces the driver behavior: class count from '*' lines, per-fold LOSO
loop with data-root remapping, AdamW + cosine schedule, loss composition
(CE x focal-ordinal + memory + NTE), periodic eval with confusion-matrix
macro-F1 best-model selection, checkpoints carrying text_features, per-fold
and aggregate reports (results.txt, confusion matrices), config.yaml dump.

TPU-native execution model: one jitted train step (forward+losses+grads+
AdamW) over a 'data'-sharded mesh; metric all-reduces are implicit; uint8
frames are normalized on-device.
"""

import argparse
import os
import os.path as osp
import time
from datetime import datetime
from typing import List, Optional

import numpy as np

from ..data.device_preprocess import (DEFAULT_MEAN, DEFAULT_STD,
                                      make_train_augment, normalize_frames)
from ..data.loader import (LoaderConfig, create_memory_loader,
                           create_train_loader, create_val_loader)
from ..data.video import parse_classes_file
from ..models.factory import build_model_from_args
from ..train import checkpoint as ckpt_lib
from ..train.metrics import (StepAnomalyDetector, f1_from_confusion,
                             summary_from_confusion)
from ..train.state import create_train_state, make_optimizer
from ..train.step import LossConfig, make_train_step
from ..utils.config import (build_train_parser, remap_fold_data_root,
                            save_config)


def _log(msg: str):
    print(f"[{datetime.now().time()}] {msg}", flush=True)


def loader_config_from_args(args) -> LoaderConfig:
    return LoaderConfig(
        train_list_path=args.train_list_path, val_list_path=args.val_list_path,
        eval_list_path=args.eval_list_path, data_root=args.data_root,
        train_data_root=args.train_data_root, val_data_root=args.val_data_root,
        eval_data_root=args.eval_data_root, batch_size=args.batch_size,
        num_frames=args.num_frames, sampling_rate=args.sampling_rate,
        tsn_sampling=args.tsn_sampling, spatial_size=args.spatial_size,
        num_spatial_views=args.num_spatial_views,
        num_temporal_views=args.num_temporal_views,
        mean=args.mean, std=args.std, auto_augment=args.auto_augment,
        mirror=args.mirror, use_support_memory=args.use_support_memory,
        memory_data_path=args.memory_data_path,
        mem_batch_size=args.mem_batch_size, for_zero_shot=args.for_zero_shot,
        num_workers=args.num_workers, dummy_dataset=args.dummy_dataset,
        add_nte=args.add_nte, num_steps=args.num_steps or 0,
        type=args.type, nfold=args.nfold, embed_dim=args.embed_dim,
        eval_all_views=getattr(args, 'eval_all_views', False),
        allow_seek=getattr(args, 'allow_seek', True),
        cache_dir=getattr(args, 'decoded_cache_dir', '') or '')


def _mean_std(args):
    def norm3(v, default):
        if v is None:
            return (default,) * 3
        return tuple(v * 3) if len(v) == 1 else tuple(v)
    return norm3(args.mean, 0.45), norm3(args.std, 0.225)


# jitted eval steps are cached ON the model object so repeated eval passes
# in one fold reuse the compiled executable instead of re-tracing. Not an
# id(model)-keyed module dict (ids are recyclable after GC — a later model
# at a reused address would silently get a step closing over the dead one)
# and not a WeakKeyDictionary either: the cached step closes over the model,
# so a weak-dict VALUE would strongly pin its own KEY and never evict.
# Storing on the instance makes the model<->step cycle gc-collectable the
# moment the fold drops its model reference.
def _get_eval_step(model, num_classes, mean, std, compute_dtype, attn_impl,
                   num_views):
    from ..train.step import make_eval_step
    key = (num_classes, tuple(mean), tuple(std),
           str(compute_dtype), attn_impl, num_views)
    cache = getattr(model, "_eval_step_cache", None)
    if cache is None:
        cache = model._eval_step_cache = {}
    if key not in cache:
        cache[key] = make_eval_step(
            model, num_classes, compute_dtype=compute_dtype,
            attn_impl=attn_impl, mean=mean, std=std, num_views=num_views)
    return cache[key]


def evaluate(model, params, loader, num_classes: int, mean, std,
             compute_dtype, batch_size: int, attn_impl: str = "xla",
             mesh=None) -> tuple:
    """Eval loop through the jitted confusion-matrix step (train/step.py).

    Batches are padded to `batch_size` (one compiled shape); pad rows are
    excluded via the step's valid mask. The confusion matrix accumulates on
    device. With a mesh, video/labels are sharded on the 'data' axis and the
    step's einsum performs the cross-device reduction — the reference's
    `all_reduce(conf_mat)` semantics (train.py:531-534, 646-688) — while the
    forward runs data-parallel over all chips.
    """
    import jax.numpy as jnp

    # H2D runs on a prefetch thread (transfer batch k+1 while the device
    # evaluates batch k) and both the hit count and the confusion matrix
    # accumulate ON DEVICE — a per-batch int(h) sync would drain the
    # pipeline every step (same serialization the r5 e2e train capture
    # measured; see data/device_prefetch.py).
    def _to_device(batch):
        video = np.asarray(batch["video"])
        labels = np.asarray(batch["labels"], np.int32)
        n = video.shape[0]
        if n < batch_size:
            video = np.concatenate(
                [video, np.repeat(video[-1:], batch_size - n, axis=0)])
            labels = np.concatenate(
                [labels, np.zeros(batch_size - n, np.int32)])
        valid = np.arange(batch_size) < n
        if video.ndim == 6:  # multi-view eval: flatten views for the step
            B, V = video.shape[:2]
            video = video.reshape((B * V,) + video.shape[2:])
        else:
            V = 1
        dev = {"video": jnp.asarray(video), "labels": jnp.asarray(labels),
               "valid": jnp.asarray(valid)}
        if mesh is not None:
            from ..parallel.mesh import shard_batch
            dev = shard_batch(dev, mesh)
        return dev, n, V

    from ..data.device_prefetch import prefetch_to_device
    conf_dev = None
    hit_dev = None
    tot = 0
    n_batches = 0
    for dev, n, V in prefetch_to_device(iter(loader), _to_device, size=2):
        step = _get_eval_step(model, num_classes, mean, std, compute_dtype,
                              attn_impl, V)
        h, c = step(params, dev["video"], dev["labels"], dev["valid"])
        conf_dev = c if conf_dev is None else conf_dev + c
        hit_dev = h if hit_dev is None else hit_dev + h
        tot += n
        n_batches += 1
        if n_batches % 50 == 0:  # rare: each fetch drains the pipeline
            _log(f"[Evaluation] num_samples: {tot}  "
                 f"cumulative_acc1: {int(hit_dev) / tot * 100.:.2f}%")
    conf = (np.asarray(conf_dev).astype(np.int64) if conf_dev is not None
            else np.zeros((num_classes, num_classes), np.int64))
    hit1 = int(hit_dev) if hit_dev is not None else 0
    acc = hit1 / max(tot, 1) * 100
    _log(f"Accuracy on validation set: top1={acc:.2f}%")
    return acc, conf


def train_one_fold(args, fold: int, classnames: List[str], num_classes: int,
                   logdir: Optional[str]) -> tuple:
    import jax
    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    attn_impl = "flash" if jax.default_backend() == "tpu" else "xla"
    if getattr(args, "debug_attn_clamp", False):
        from ..ops import flash_attention as _fa
        _fa.enable_clamp_monitor(True)
    # rematerialize the vision blocks for long clips (T=70 flagship);
    # short clips fit activations in HBM without recompute
    remat = getattr(args, "remat_policy", "save_attn_qkv") \
        if args.num_frames >= 16 else False
    mean, std = _mean_std(args)

    from ..models.vita_clip import trainable_mask
    model = build_model_from_args(args, num_classes, classnames=classnames)
    mask = trainable_mask(model.params, model.cfg)
    optimizer = make_optimizer(args.lr, args.num_steps, args.weight_decay)
    state = create_train_state(model.params, mask, optimizer)

    state, resume_step, _ = ckpt_lib.resume_from_checkpoint(state, mask, args)

    lcfg = loader_config_from_args(args)
    # Multi-host: each process loads only its slice of the global batch
    # (the reference's DistributedSampler role, dataloader.py:113-120);
    # shard_batch(per_host=True) assembles the global array. The val loader
    # stays global per host: eval batches are ragged across ranks
    # (len % world != 0) and a per-rank slice would deadlock the collective
    # eval step — duplicate decode is the safe price, matching the
    # reference's rank-0 evaluate().
    pidx, pcount = jax.process_index(), jax.process_count()
    val_loader = create_val_loader(lcfg)
    train_loader = create_train_loader(lcfg, resume_step=resume_step,
                                       rank=pidx, world_size=pcount)
    memory_loader = create_memory_loader(lcfg, resume_step=resume_step,
                                         rank=pidx, world_size=pcount)

    loss_cfg = LossConfig(
        num_classes=num_classes,
        focal_ordinal=args.focal_ordinal_loss,
        fo_beta=0.2 if "updrs" in args.type else 0.0,
        sigmoid_loss=args.sigmoid_loss,
        use_support_memory=args.use_support_memory,
        add_nte=args.add_nte,
        memory_loss_weight=args.memory_loss_weight,
        vnte_loss_weight=args.vnte_loss_weight)

    # donate=True: the TrainState buffers are reused in-place every step
    # (this is the measured configuration — see PROGRESS.md)
    step_fn = make_train_step(model, loss_cfg, optimizer,
                              batch_split=args.batch_split,
                              compute_dtype=compute_dtype,
                              attn_impl=attn_impl, remat=remat, donate=True,
                              frozen_int8=getattr(args, "int8_frozen", False))

    # data-parallel mesh over all local devices: params replicated, batches
    # sharded on 'data'; XLA inserts the gradient all-reduce (SURVEY.md §2.6)
    mesh = None
    shardable = args.batch_size % jax.device_count() == 0 and \
        (not args.use_support_memory
         or args.mem_batch_size % jax.device_count() == 0)
    if jax.device_count() > 1 and shardable:
        from ..parallel.mesh import create_mesh, replicate, shard_batch
        mesh = create_mesh()
        state = replicate(state, mesh)
        _log(f"data-parallel over {mesh.size} devices")

    @jax.jit
    def text_features_fn(params):
        return model.text_features_only(params, model.buffers,
                                        compute_dtype=compute_dtype)

    writer = None
    metrics_jsonl = None
    if logdir:
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(log_dir=osp.join(logdir, f"fold_{fold}"))
        except ImportError:
            pass
        args.checkpoint_dir = osp.join(logdir, f"fold_{fold}")
        os.makedirs(args.checkpoint_dir, exist_ok=True)
        metrics_jsonl = osp.join(args.checkpoint_dir, "metrics.jsonl")

    best_perf, best_acc = 0.0, 0.0
    save_conf = np.zeros((num_classes, num_classes), np.int64)
    anomaly = StepAnomalyDetector()
    batch_st = train_st = time.time()

    # device-side augmentation (RandAugment + mirror) when requested;
    # plain normalize otherwise — both fuse into the train step's first GEMM
    use_aug = bool(args.auto_augment) or args.mirror
    augment = jax.jit(make_train_augment(args.auto_augment, args.mirror,
                                         mean, std)) if use_aug else None
    aug_key = jax.random.PRNGKey(0)

    # preemption-safe checkpointing: preemptible TPU VMs get SIGTERM with a
    # grace window — catch it, finish the in-flight step, write a resumable
    # checkpoint (the resume-exact sampler continues bit-identically), and
    # exit cleanly. The flag-and-check form keeps the signal handler trivial
    # (async-signal-safe) and the save on the main thread.
    import signal
    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:          # non-main thread (tests drive this inline)
        prev_handler = None

    # H2D prefetch: transfer batch N+1 (uint8 video + labels/nte/memory)
    # from a background thread while the device executes step N — without
    # it decode + transfer + step serialize (measured 1571 ms/step vs the
    # 261 ms device step, queued_bench_r05/e2e_train.json). Augment stays
    # in the main loop: it is step-indexed (fold_in(aug_key, i)) and its
    # dispatch is async anyway.
    def _to_device(pair):
        batch, mem_batch = pair
        db = {
            "video": jnp.asarray(batch["video"]),
            "labels": jnp.asarray(batch["labels"]),
        }
        if args.add_nte:
            db["nte"] = jnp.asarray(batch["nte"])
        if args.use_support_memory:
            db["memory"] = jnp.asarray(mem_batch["memory"])
            db["mt_labels"] = jnp.asarray(mem_batch["mt_labels"])
        if mesh is not None:
            db = shard_batch(db, mesh, per_host=True)
        return db

    pair_iter = zip(train_loader, memory_loader)
    n_prefetch = getattr(args, "device_prefetch", 2)
    if n_prefetch and n_prefetch > 0:
        from ..data.device_prefetch import prefetch_to_device
        device_iter = prefetch_to_device(pair_iter, _to_device,
                                         size=n_prefetch)
    else:
        device_iter = map(_to_device, pair_iter)

    for i, db in enumerate(device_iter, start=resume_step):
        if preempted["flag"]:
            _log(f"[preempt] SIGTERM received — checkpointing at step {i} "
                 "and exiting")
            tf = np.asarray(text_features_fn(state.params)) \
                if args.use_text_prompt_learning else None
            ckpt_lib.save_checkpoint(args.checkpoint_dir, state, i,
                                     text_features=tf)
            ckpt_lib.wait_for_saves()
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
            close = getattr(device_iter, "close", None)
            if close is not None:   # join the prefetch thread before exit
                close()
            raise SystemExit(0)
        if augment is not None:
            video = augment(jax.random.fold_in(aug_key, i), db["video"])
        else:
            video = normalize_frames(db["video"], mean, std)
        device_batch = dict(db)
        device_batch["video"] = video
        data_ed = time.time()

        if args.profile_dir and i == resume_step + 2:
            jax.profiler.start_trace(args.profile_dir)
        state, metrics = step_fn(state, device_batch)
        if args.profile_dir and i == resume_step + 4:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready(), metrics)
            jax.profiler.stop_trace()
            _log(f"profiler trace written to {args.profile_dir}")

        if i % args.print_freq == 0:
            loss_v = float(metrics["loss"])
            acc1 = float(metrics["acc1"])
            batch_ed = time.time()
            slow = anomaly.check_step_time(batch_ed - batch_st)
            if slow:
                _log(f"[anomaly] {slow}")
            if not anomaly.check_loss(loss_v):
                _log(f"[anomaly] non-finite loss at step {i}")
                if getattr(args, "nan_recovery", False):
                    try:
                        # rollback target may still be in flight
                        ckpt_lib.wait_for_saves()
                    except Exception as e:
                        # a stale write failure (e.g. ENOSPC) must not
                        # abort the recovery itself — log and roll back to
                        # whatever checkpoint did land
                        _log(f"[anomaly] async checkpoint write failed: "
                             f"{e!r}")
                    rollback = ckpt_lib.find_autoresume_path(args.checkpoint_dir)
                    if rollback:
                        from ..train.state import TrainState, partition_params
                        ck = ckpt_lib.load_checkpoint(rollback)
                        p = jax.tree_util.tree_map(jnp.asarray, ck["params"])
                        tr, fz = partition_params(p, mask)
                        state = TrainState(step=state.step, trainable=tr,
                                           frozen=fz, opt_state=state.opt_state)
                        _log(f"[anomaly] rolled back weights to {rollback}")
            txt = (f"step {i}  batch_time: {batch_ed - batch_st:.3f}  "
                   f"data_time: {data_ed - batch_st:.3f}  "
                   f"loss: {loss_v:.6f}  acc1: {acc1 * 100:.2f}%")
            if getattr(args, "debug_attn_clamp", False):
                from ..ops import flash_attention as _fa
                m = _fa.clamp_stats["max_exp2_arg"]
                txt += f"  attn_max_exp2_arg: {m:.1f}"
                if m >= 0.8 * _fa._CLAMP_LIMIT:
                    _log(f"[anomaly] attention logits at {m:.1f} approaching "
                         f"the exp2 clamp ({_fa._CLAMP_LIMIT}) — softmax will "
                         "flatten silently past it")
            if "loss_mt" in metrics:
                txt += f"  loss_mt: {float(metrics['loss_mt']):.6f}"
            if "loss_vm" in metrics:
                txt += f"  loss_vm: {float(metrics['loss_vm']):.6f}"
            _log(txt)
            if writer is not None:
                writer.add_scalar("train/accuracy", acc1, i + 1)
                writer.add_scalar("train/loss", loss_v, i + 1)
            if metrics_jsonl:
                import json as _json
                # "t" (wall clock) lets offline tools compute the SUSTAINED
                # e2e rate between print steps — batch_time_s alone only
                # times the print step itself, which pays the device sync
                # for the whole pipelined window
                rec = {"step": i, "loss": loss_v, "acc1": acc1,
                       "t": round(batch_ed, 3),
                       "batch_time_s": round(batch_ed - batch_st, 4),
                       "data_time_s": round(data_ed - batch_st, 4)}
                for k in ("loss_mt", "loss_vm"):
                    if k in metrics:
                        rec[k] = float(metrics[k])
                with open(metrics_jsonl, "a") as mf:
                    mf.write(_json.dumps(rec) + "\n")

        if (i + 1) % args.eval_freq == 0:
            _log(f"Start model evaluation at step {i + 1}")
            params = state.params
            eval_acc, conf = evaluate(model, params, val_loader, num_classes,
                                      mean, std, compute_dtype,
                                      args.batch_size, attn_impl=attn_impl,
                                      mesh=mesh)
            eval_perf = float(f1_from_confusion(conf).mean())
            if writer is not None:
                writer.add_scalar("test/accuracy", eval_acc, i + 1)
            if metrics_jsonl:
                import json as _json
                with open(metrics_jsonl, "a") as mf:
                    mf.write(_json.dumps({"step": i + 1, "eval_acc": eval_acc,
                                          "eval_macro_f1": eval_perf,
                                          "t": round(time.time(), 3)}) + "\n")
            if eval_perf >= best_perf:
                best_perf, best_acc = eval_perf, eval_acc
                save_conf = conf
                tf = np.asarray(text_features_fn(params)) \
                    if args.use_text_prompt_learning else None
                ckpt_lib.save_checkpoint(args.checkpoint_dir, state, i + 1,
                                         text_features=tf, is_best=True,
                                         name=f"fold-{fold}",
                                         async_write=True)

        if (i + 1) % args.save_freq == 0:
            tf = np.asarray(text_features_fn(state.params)) \
                if args.use_text_prompt_learning else None
            # device->host fetch is synchronous (donated buffers); the
            # multi-hundred-MB pickle+disk write overlaps the next steps
            ckpt_lib.save_checkpoint(args.checkpoint_dir, state, i + 1,
                                     text_features=tf, async_write=True)
        batch_st = time.time()

    ckpt_lib.wait_for_saves()   # fold end: all checkpoints on disk
    if writer is not None:
        writer.close()
    return best_acc, save_conf


def eval_only_fold(args, fold: int, classnames: List[str], num_classes: int):
    """--eval_only: load the fold's best checkpoint into the full model and
    evaluate on the val split (reference train.py:266,373-387)."""
    import jax
    import jax.numpy as jnp
    from ..utils.torch_convert import merge_pytrees

    compute_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    attn_impl = "flash" if jax.default_backend() == "tpu" else "xla"
    mean, std = _mean_std(args)

    ckpt_path = args.checkpoint_path
    if not ckpt_path or not osp.isfile(ckpt_path):
        for base in (args.checkpoint_dir or "",
                     osp.join(args.checkpoint_dir or "", f"fold_{fold}")):
            for ext in (".ckpt", ".pth"):
                p = osp.join(base, f"fold-{fold}-best{ext}")
                if osp.isfile(p):
                    ckpt_path = p
                    break
            if ckpt_path and osp.isfile(ckpt_path):
                break
    assert ckpt_path and osp.isfile(ckpt_path), "Checkpoint file not found."
    _log(f"eval_only: loading {ckpt_path}")

    model = build_model_from_args(args, num_classes, classnames=classnames)
    ckpt = ckpt_lib.load_checkpoint(ckpt_path)
    if "torch_state_dict" in ckpt:
        from ..utils.torch_convert import convert_vita_clip
        variant = "class_uni" if args.text_prompt_init else None
        loaded = convert_vita_clip(ckpt["torch_state_dict"],
                                   vision_layers=args.num_layers,
                                   text_layers=args.text_transformer_layers,
                                   num_classes=num_classes,
                                   prompt_variant=variant)
    else:
        loaded = ckpt["params"]
    params = jax.tree_util.tree_map(
        jnp.asarray, merge_pytrees(model.params, loaded))

    mesh = None
    if jax.device_count() > 1 and args.batch_size % jax.device_count() == 0:
        from ..parallel.mesh import create_mesh, replicate
        mesh = create_mesh()
        params = replicate(params, mesh)
        _log(f"eval data-parallel over {mesh.size} devices")

    lcfg = loader_config_from_args(args)
    val_loader = create_val_loader(lcfg)
    acc, conf = evaluate(model, params, val_loader, num_classes, mean, std,
                         compute_dtype, args.batch_size, attn_impl=attn_impl,
                         mesh=mesh)
    return acc, conf


def main(argv=None):
    parser = build_train_parser()
    args = parser.parse_args(argv)
    # preemption-resume restarts re-compile the same train/eval steps; the
    # persistent cache turns those into disk loads (utils/jax_cache.py)
    from ..utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    classnames, cls_labels = parse_classes_file(args.text_prompt_classes_path)
    num_classes = len(cls_labels)

    logdir = None
    all_conf = np.zeros((num_classes, num_classes), np.int64)
    performances = []
    if not args.eval_only:
        root_tag = osp.basename(args.data_root.rstrip("/")) if args.data_root else ""
        postfix = ("_" + root_tag + "_") if root_tag else ""
        if args.text_prompt_init:
            postfix += args.text_prompt_init.replace("_", "-") + "_" + \
                "-".join(args.knowledge_version)
        postfix += "_NTE" if args.use_support_memory else ""
        postfix += "_clL" if args.add_nte else ""
        if postfix and postfix[0] != "_":
            postfix = "_" + postfix
        logdir = (f"./logs/{args.type.lower()}"
                  f"{'-zs' if args.for_zero_shot else ''}_"
                  f"{time.strftime('%m%d-%H%M')}{postfix}/")
        os.makedirs(logdir, exist_ok=True)
        save_config(args, osp.join(logdir, "config.yaml"))
        result_file = osp.join(logdir, "results.txt")

    for n in range(args.nfold):
        if args.eval_only:
            best_acc, conf = eval_only_fold(args, n, classnames, num_classes)
        else:
            remap_fold_data_root(args, n)
            best_acc, conf = train_one_fold(args, n, classnames, num_classes,
                                            logdir)
        performances.append(best_acc)
        all_conf += conf
        if logdir:
            np.savetxt(osp.join(logdir, f"confusion_matrix_fold-{n}.txt"),
                       conf, fmt="%d")
            with open(result_file, "w") as f:
                f.write(" ".join(f"fold-{i} {x}" for i, x in enumerate(performances)))

    if args.eval_only:
        # aggregate eval report (reference train.py:592-606)
        os.makedirs("./eval_output", exist_ok=True)
        tag = f"{args.type.split('_')[0]}_eval"
        avg = float(np.mean(performances)) if performances else 0.0
        _log(f"Eval top-1 accuracy: {avg:.4f}%")
        with open(osp.join("./eval_output", f"{tag}.txt"), "w") as f:
            f.write("  ".join(f"fold-{fi} {x}"
                              for fi, x in enumerate(performances)) + "\n")
            f.write(f"Eval top-1 accuracy: {avg:.4f}%.\n")
            f.write("Confusion matrix:\n")
            for row in all_conf:
                f.write(" ".join(str(int(x)) for x in row) + "\n")
        return performances, all_conf

    if logdir:
        s = summary_from_confusion(all_conf)
        min_max = (max(performances) - min(performances)) if performances else 0.0
        with open(result_file, "a") as f:
            f.write(f"\nTotal average accuracy for {args.nfold}-fold "
                    f"{args.type}: {np.mean(performances):.4f}")
            f.write("\nF1-score per class: " +
                    " ".join(f"{x:.4f}" for x in s["f1_per_class"]))
            f.write(f"\nPrecision: {s['precision']:.4f}")
            f.write(f"\nRecall: {s['recall']:.4f}")
            f.write(f"\nAverage F1-score: {s['f1_mean']:.4f}")
            f.write("\nWeighted F1-score per class: " +
                    " ".join(f"{x:.4f}" for x in s["wf1_per_class"]))
            f.write(f"\nAverage weighted F1-score: {s['wf1_sum']:.4f}")
            f.write(f"\nMin-Max difference: {min_max:.4f}")
        np.savetxt(osp.join(logdir, "confusion_matrix_total.txt"),
                   all_conf, fmt="%d")
        try:
            # aggregate confusion-matrix heatmap (reference train.py:592-641)
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            import seaborn as sns
            plt.figure(figsize=(10, 10))
            sns.heatmap(all_conf.astype(int), annot=True, fmt="d",
                        cmap="Blues", cbar=True)
            plt.xlabel("prediction")
            plt.ylabel("ground truth")
            plt.savefig(osp.join(logdir, "confusion_matrix_total.png"))
            plt.close()
        except ImportError:
            pass
        _log(f"Total average accuracy: {np.mean(performances):.4f}")


if __name__ == "__main__":
    main()
