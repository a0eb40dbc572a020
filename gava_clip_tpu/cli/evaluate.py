"""Cross-fold re-evaluation of a training run directory — the counterpart of
reference evaluation/evaluate.py.

Reloads the run's config.yaml as the source of truth (keeping the CLI's
data_root/list_path/checkpoint overrides), then per fold loads
fold_<n>/fold-<n>-best.ckpt, builds the model in zero-shot mode with the
text_features saved inside the checkpoint (reference evaluate.py:245-246),
drops the memory-head parameters (:252-259), evaluates, and writes the
accuracy/F1/per-class-count report + confusion-matrix heatmap (:302-342).

Reference torch .pth fold checkpoints are also accepted (converted on load).
"""

import argparse
import glob
import os.path as osp
from typing import Optional

import numpy as np

from ..data.loader import create_val_loader
from ..data.video import parse_classes_file
from ..models.factory import build_model_from_args
from ..train.checkpoint import load_checkpoint
from ..train.metrics import f1_from_confusion
from ..utils.config import build_train_parser, load_config_into
from .train import _log, _mean_std, loader_config_from_args


def _params_from_ckpt(model, ckpt, args, num_classes):
    """Overlay checkpoint weights, dropping memory-head keys as the reference
    does (tf_project / sum_proj / memory_project / logit_scale_mt)."""
    import jax
    import jax.numpy as jnp
    from ..utils.torch_convert import convert_vita_clip, merge_pytrees

    drop = ("tf_project", "sum_proj", "memory_project", "logit_scale_mt",
            "logit_bias_mt", "logit_scale_vm")
    if "torch_state_dict" in ckpt:
        sd = {k: v for k, v in ckpt["torch_state_dict"].items()
              if not any(d in k for d in drop)}
        variant = "class_uni" if args.text_prompt_init else None
        loaded = convert_vita_clip(sd, vision_layers=args.num_layers,
                                   text_layers=args.text_transformer_layers,
                                   num_classes=num_classes,
                                   prompt_variant=variant)
    else:
        loaded = {k: v for k, v in ckpt["params"].items() if k not in drop}
    merged = merge_pytrees(model.params, loaded)
    return jax.tree_util.tree_map(jnp.asarray, merged)


def main(argv=None):
    parser = build_train_parser()
    args = parser.parse_args(argv)

    classnames, cls_labels = parse_classes_file(args.text_prompt_classes_path)
    num_classes = len(cls_labels)

    assert osp.isdir(args.checkpoint_dir), args.checkpoint_dir
    nfold = len(glob.glob(osp.join(args.checkpoint_dir, "fold*")))
    config_path = osp.join(args.checkpoint_dir, "config.yaml")
    if osp.isfile(config_path):
        # keep CLI-specified data paths/checkpoints (evaluate.py:189-196)
        keep = [k for k in vars(args)
                if "data_root" in k or "list_path" in k or "checkpoint" in k]
        load_config_into(args, config_path, skip=keep)

    import jax
    import jax.numpy as jnp
    mean, std = _mean_std(args)
    lcfg = loader_config_from_args(args)
    lcfg.num_temporal_views = args.num_temporal_views

    performance = []
    conf_total = np.zeros((num_classes, num_classes), np.int64)
    for nf in range(nfold):
        ckpt_path = None
        for ext in (".ckpt", ".pth"):
            p = osp.join(args.checkpoint_dir, f"fold_{nf}", f"fold-{nf}-best{ext}")
            if osp.isfile(p):
                ckpt_path = p
                break
        if ckpt_path is None:
            continue
        _log(f"Loading checkpoint from {ckpt_path}")
        ckpt = load_checkpoint(ckpt_path)
        assert ckpt.get("text_features") is not None, \
            "checkpoint lacks text_features — cannot zero-shot evaluate"

        # zero-shot model with the checkpoint's learned text features
        args_zs = argparse.Namespace(**vars(args))
        args_zs.use_text_prompt_learning = False
        args_zs.zeroshot_evaluation = True
        args_zs.use_support_memory = False
        args_zs.add_nte = False
        model = build_model_from_args(args_zs, num_classes,
                                      zeroshot_text_features=ckpt["text_features"])
        params = _params_from_ckpt(model, ckpt, args, num_classes)
        attn_impl = "flash" if jax.default_backend() == "tpu" else "xla"
        compute_dtype = jnp.bfloat16 if getattr(args, "bf16", False) \
            else jnp.float32
        from ..ops.quant import prepare_inference_params
        params = prepare_inference_params(
            params, getattr(args, "quantize_eval", ""), compute_dtype)

        # mesh-sharded eval through the jitted confusion-matrix step
        # (train/step.py make_eval_step) — the batch einsum performs the
        # reference's all_reduce(conf_mat) under GSPMD
        mesh = None
        if jax.device_count() > 1 and \
                args.batch_size % jax.device_count() == 0:
            from ..parallel.mesh import create_mesh, replicate
            mesh = create_mesh()
            params = replicate(params, mesh)
            _log(f"eval data-parallel over {mesh.size} devices")

        from .train import evaluate as _evaluate
        loader = create_val_loader(lcfg)
        acc, conf = _evaluate(model, params, loader, num_classes, mean, std,
                              compute_dtype, args.batch_size,
                              attn_impl=attn_impl, mesh=mesh)
        conf_total += conf
        _log(f"Accuracy on evaluation set fold-{nf}: top1={acc:.2f}%")
        performance.append(acc / 100.0)

    _log(f"Overall accuracy: {np.mean(performance) * 100:.2f}%")
    f1 = f1_from_confusion(conf_total.astype(np.float64))
    f1_str = " ".join(f"{x:.4f}" for x in f1)
    _log(f"Per-class F1-score: {f1_str}")
    _log(f"Average F1-score: {f1.mean():.4f}")

    tag = args.data_root.split("datasets/")[-1].replace("/", "_")
    output_file = osp.join(args.checkpoint_dir, f"eval_{tag}.txt")
    seq_num = conf_total.sum(1)
    with open(output_file, "w") as f:
        f.write(f"Overall accuracy: {np.mean(performance) * 100:.2f}%\n")
        f.write(f"Overall F1-score: {f1_str}\n")
        f.write(f"Average F1-score: {f1.mean():.4f}\n")
        f.write("Per-class sequence number:\n")
        f.write(" ".join(str(int(x)) for x in seq_num) + "\n")
        f.write("Overall confusion matrix:\n")
        for row in conf_total:
            f.write(" ".join(str(int(x)) for x in row) + "\n")
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns
        plt.figure(figsize=(10, 10))
        sns.heatmap(conf_total.astype(int), annot=False, fmt="d", cmap="Blues",
                    cbar=True)
        plt.savefig(output_file.replace(".txt", ".png"))
        plt.close()
    except ImportError:
        pass
    return performance, conf_total


if __name__ == "__main__":
    main()
