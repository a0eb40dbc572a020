"""Per-descriptor analysis — counterpart of reference
training/analysis_segment.py.

For each fold's best checkpoint, runs the desc_wise forward (per-descriptor
similarity logits, reference VitaCLIP_model.py:266-276), predicts the class
as the argmax of per-class max-descriptor similarity, and accumulates
per-descriptor precision: among eval clips predicted as class c via
descriptor d, the fraction predicted correctly (analysis_segment.py:170-196).
Writes a text report and (when matplotlib is present) per-class bar charts
labeled with the descriptor texts themselves.
"""

import argparse
import os
import os.path as osp
from typing import Dict, List

import numpy as np

from ..data.device_preprocess import normalize_frames
from ..data.loader import create_val_loader
from ..data.video import parse_classes_file
from ..train.checkpoint import load_checkpoint
from ..utils.config import build_train_parser, load_config_into
from .train import _log, _mean_std, loader_config_from_args


def main(argv=None):
    parser = build_train_parser()
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--data_dir", type=str, default="")
    parser.add_argument("--output_dir", type=str, default="./analysis_output")
    args = parser.parse_args(argv)

    config_fp = osp.join(args.model_dir, "config.yaml")
    assert osp.isfile(config_fp), "config.yaml not found in model_dir"
    keep = [k for k in vars(args) if "data" in k or "list_path" in k
            or k in ("model_dir", "output_dir", "batch_size")]
    load_config_into(args, config_fp, skip=keep)

    classnames, cls_labels = parse_classes_file(args.text_prompt_classes_path)
    n_cls = len(cls_labels)
    mean, std = _mean_std(args)

    import jax
    import jax.numpy as jnp
    from ..models.factory import build_model_from_args
    from ..utils.torch_convert import convert_vita_clip, merge_pytrees

    model = build_model_from_args(args, n_cls, classnames=classnames)
    prompt_texts = model.prompt_assets.prompt_texts
    kv_mask = model.prompt_assets.kv_mask                 # (n_cls, max_kv)
    max_kv = kv_mask.shape[1]

    @jax.jit
    def desc_forward(params, video_u8):
        video = normalize_frames(video_u8, mean, std)
        out = model.apply(params, model.buffers, video, desc_wise=True)
        sim = out["desc_logits"]                          # (B, n_cls, max_kv)
        return jnp.where(jnp.asarray(kv_mask)[None] > 0, sim, -jnp.inf)

    # per (class, descriptor): list of per-fold precisions
    per_desc: Dict[int, Dict[int, List[float]]] = {
        c: {d: [] for d in range(int(kv_mask[c].sum()))} for c in range(n_cls)}

    nfold = args.nfold
    for nf in range(nfold):
        ckpt_path = None
        for ext in (".ckpt", ".pth"):
            p = osp.join(args.model_dir, f"fold_{nf}", f"fold-{nf}-best{ext}")
            if osp.isfile(p):
                ckpt_path = p
                break
        if ckpt_path is None:
            _log(f"fold {nf}: checkpoint missing, skipped")
            continue
        ckpt = load_checkpoint(ckpt_path)
        if "torch_state_dict" in ckpt:
            variant = "class_uni" if args.text_prompt_init else None
            loaded = convert_vita_clip(ckpt["torch_state_dict"],
                                       vision_layers=args.num_layers,
                                       text_layers=args.text_transformer_layers,
                                       num_classes=n_cls,
                                       prompt_variant=variant)
        else:
            loaded = ckpt["params"]
        params = jax.tree_util.tree_map(
            jnp.asarray, merge_pytrees(model.params, loaded))

        lcfg = loader_config_from_args(args)
        if args.data_dir:
            lcfg.val_data_root = osp.join(args.data_dir, f"chunks_{nf}")
            lcfg.val_list_path = osp.join(lcfg.val_data_root, f"val_{args.type}.csv")
        loader = create_val_loader(lcfg)

        hits: Dict[int, Dict[int, List[int]]] = {
            c: {d: [] for d in range(max_kv)} for c in range(n_cls)}
        for batch in loader:
            video = batch["video"]
            n = video.shape[0]
            if n < args.batch_size:
                video = np.concatenate(
                    [video, np.repeat(video[-1:], args.batch_size - n, axis=0)])
            sim = np.asarray(desc_forward(params, jnp.asarray(video)))[:n]
            labels = np.asarray(batch["labels"])[:n]
            best_desc = sim.argmax(-1)                    # (B, n_cls)
            best_score = sim.max(-1)                      # (B, n_cls)
            pred_cls = best_score.argmax(-1)              # (B,)
            for b in range(n):
                c = int(pred_cls[b])
                d = int(best_desc[b, c])
                hits[c][d].append(1 if c == labels[b] else 0)
        for c in range(n_cls):
            for d in per_desc[c]:
                per_desc[c][d].append(
                    float(np.mean(hits[c][d])) if hits[c][d] else 0.0)

    os.makedirs(args.output_dir, exist_ok=True)
    report = osp.join(args.output_dir, f"{args.type}_per_descriptor_precision.txt")
    with open(report, "w") as f:
        for c in range(n_cls):
            f.write(f"class {c} ({classnames[c]}):\n")
            for d, vals in per_desc[c].items():
                label = prompt_texts[c][d] if d < len(prompt_texts[c]) \
                    else f"Segment {d}"
                prec = float(np.mean(vals)) * 100 if vals else 0.0
                f.write(f"  [{prec:6.2f}%] {label}\n")
    _log(f"wrote {report}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        for c in range(n_cls):
            labels = [prompt_texts[c][d] if d < len(prompt_texts[c])
                      else f"Segment {d}" for d in per_desc[c]]
            precs = [float(np.mean(v)) * 100 if v else 0.0
                     for v in per_desc[c].values()]
            fig, ax = plt.subplots(figsize=(12, 8))
            ax.barh(range(len(precs)), precs)
            ax.set_yticks(range(len(precs)))
            ax.set_yticklabels([l[:60] for l in labels], fontsize=8)
            ax.set_xlabel("per-descriptor precision (%)")
            plt.tight_layout()
            plt.savefig(osp.join(args.output_dir,
                                 f"{args.type}_{c}_per_descriptor_precision.png"))
            plt.close(fig)
    except ImportError:
        pass
    return per_desc


if __name__ == "__main__":
    main()
