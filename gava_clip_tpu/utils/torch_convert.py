"""PyTorch checkpoint -> JAX pytree conversion.

Understands the reference checkpoint layouts (SURVEY.md §2.7):
  * CLIP backbone `clip_pretrained.pth`: flat state dict with `visual.*` /
    `textual.*` prefixes (reference VitaCLIP_model.py:135-137);
  * training checkpoints: {'model': DDP `module.`-prefixed state dict,
    'optimizer', 'lr_sched', 'loss_scaler', 'next_step', 'text_features'}
    (reference training/checkpoint.py:96-105).

Kernels are transposed to (in_dim, out_dim); the patch conv is reshaped to
the GEMM layout used by models/vision.py; packed nn.MultiheadAttention
in-projections are split into q/k/v.
"""

from typing import Dict, Optional

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into a flat {name: np.ndarray} dict (host-side torch)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        ckpt = ckpt["model"]
    return {k: _np(v) for k, v in ckpt.items() if hasattr(v, "shape")}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _lin(sd, name) -> Dict[str, np.ndarray]:
    p = {"kernel": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _ln(sd, name) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _attn_separate(sd, name) -> Dict:
    """Reference vision Attention: separate q/k/v/out projections."""
    return {"q": _lin(sd, f"{name}.q_proj"), "k": _lin(sd, f"{name}.k_proj"),
            "v": _lin(sd, f"{name}.v_proj"), "out": _lin(sd, f"{name}.out_proj")}


def _attn_packed(sd, name) -> Dict:
    """torch nn.MultiheadAttention: packed (3W, W) in-projection."""
    w = sd[f"{name}.in_proj_weight"]
    b = sd[f"{name}.in_proj_bias"]
    d = w.shape[1]
    return {
        "q": {"kernel": w[:d].T, "bias": b[:d]},
        "k": {"kernel": w[d:2 * d].T, "bias": b[d:2 * d]},
        "v": {"kernel": w[2 * d:].T, "bias": b[2 * d:]},
        "out": _lin(sd, f"{name}.out_proj"),
    }


def _stack(trees):
    import jax
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def convert_vision_tower(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    """Convert a `visual.`-stripped reference state dict to our pytree."""
    conv_w = sd["patch_embed.proj.weight"]          # (D, 3, ph, pw)
    D = conv_w.shape[0]
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, D)  # (ph*pw*3, D)
    patch = {"kernel": kernel}
    if "patch_embed.proj.bias" in sd:
        patch["bias"] = sd["patch_embed.proj.bias"]
    else:
        patch["bias"] = np.zeros((D,), kernel.dtype)

    blocks = []
    for i in range(num_layers):
        b = f"blocks.{i}"
        blk = {
            "attn": _attn_separate(sd, f"{b}.attn"),
            "norm1": _ln(sd, f"{b}.norm1"),
            "mlp": {"fc1": _lin(sd, f"{b}.mlp.fc1"), "fc2": _lin(sd, f"{b}.mlp.fc2")},
            "norm2": _ln(sd, f"{b}.norm2"),
        }
        if f"{b}.cls_proj.weight" in sd:
            blk["cls_proj"] = _lin(sd, f"{b}.cls_proj")
        if f"{b}.summary_ln.weight" in sd:
            blk["summary_ln"] = _ln(sd, f"{b}.summary_ln")
            blk["summary_attn"] = _attn_separate(sd, f"{b}.summary_attn_layer")
        if f"{b}.local_prompts" in sd:
            blk["local_prompts"] = sd[f"{b}.local_prompts"]
        blocks.append(blk)

    params = {
        "patch_embed": patch,
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "time_embed": sd["time_embed"],
        "blocks": _stack(blocks),
        "ln_pre": _ln(sd, "ln_pre"),
        "ln_post": _ln(sd, "ln_post"),
        "proj": sd["proj"],
    }
    if "global_prompts" in sd:
        params["global_prompts"] = sd["global_prompts"]
    return params


def convert_text_tower(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    """Convert a `textual.`-stripped reference state dict to our pytree."""
    blocks = []
    for i in range(num_layers):
        b = f"transformer.resblocks.{i}"
        blocks.append({
            "attn": _attn_packed(sd, f"{b}.attn"),
            "ln_1": _ln(sd, f"{b}.ln_1"),
            "mlp": {"fc1": _lin(sd, f"{b}.mlp.c_fc"), "fc2": _lin(sd, f"{b}.mlp.c_proj")},
            "ln_2": _ln(sd, f"{b}.ln_2"),
        })
    return {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "blocks": _stack(blocks),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": sd["text_projection"],
    }


def convert_vita_clip(sd: Dict[str, np.ndarray], *, vision_layers: int,
                      text_layers: int, num_classes: int,
                      prompt_variant: Optional[str] = None) -> Dict:
    """Convert a full reference VitaCLIP state dict (``module.`` already
    stripped) into our parameter pytree.

    prompt_variant: None (no KAPT projector), 'class_uni' (the exercised
    "split_uni" path — per-class bias-free MLPs, kapt_head.py:126-131), or
    'plain_uni' (single MLP with bias, kapt_head.py:141-146).
    """
    params: Dict = {}
    vis = strip_prefix(sd, "visual.")
    if vis:
        params["visual"] = convert_vision_tower(vis, vision_layers)
    txt = strip_prefix(sd, "textual.")
    if txt:
        params["textual"] = convert_text_tower(txt, text_layers)

    if "prompt_learner.ctx" in sd:
        prompt: Dict = {"ctx": sd["prompt_learner.ctx"]}
        pfx = "prompt_learner.context_prompt_learner.projector"
        if prompt_variant == "class_uni":
            prompt["projector"] = {
                "w1": np.stack([sd[f"{pfx}.{c}.0.weight"].T for c in range(num_classes)]),
                "w2": np.stack([sd[f"{pfx}.{c}.2.weight"].T for c in range(num_classes)]),
            }
        elif prompt_variant == "plain_uni":
            prompt["projector"] = {
                "w1": sd[f"{pfx}.0.weight"].T, "b1": sd[f"{pfx}.0.bias"],
                "w2": sd[f"{pfx}.2.weight"].T, "b2": sd[f"{pfx}.2.bias"],
            }
        params["prompt"] = prompt

    for scale in ("logit_scale", "logit_bias", "logit_scale_vm",
                  "logit_scale_mt", "logit_bias_mt"):
        if scale in sd:
            params[scale] = sd[scale]
    if "sum_proj.weight" in sd:
        params["sum_proj"] = _lin(sd, "sum_proj")
    if "tf_project.0.weight" in sd:
        params["tf_project"] = {
            "fc1": {"kernel": sd["tf_project.0.weight"].T, "bias": sd["tf_project.0.bias"]},
            "fc2": {"kernel": sd["tf_project.2.weight"].T, "bias": sd["tf_project.2.bias"]},
        }
    if "memory_project.0.0.weight" in sd:
        params["memory_project"] = {
            "w1": np.stack([sd[f"memory_project.{c}.0.weight"].T for c in range(num_classes)]),
            "b1": np.stack([sd[f"memory_project.{c}.0.bias"] for c in range(num_classes)]),
            "w2": np.stack([sd[f"memory_project.{c}.2.weight"].T for c in range(num_classes)]),
            "b2": np.stack([sd[f"memory_project.{c}.2.bias"] for c in range(num_classes)]),
        }
    return params


def adapt_frame_params(tree: Dict, num_frames: int) -> Dict:
    """Adapt frame-indexed params loaded from a checkpoint trained at a
    different num_frames to an eval model built at `num_frames`.

    Only `local_prompts` needs this: its frame axis is baked into the param
    shape (reference VitaCLIP_vision_encoder_utils.py:138). When divisible,
    tile by T // T_train — the reference's token_multiplier semantics
    (utils:179-181, dead code there since T is always self.num_frames, but
    it documents the intent); otherwise nearest-resize like time_embed.
    time_embed itself needs NO adaptation: resize_time_embed reads the param
    shape at runtime (models/vision.py:115-123)."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = adapt_frame_params(v, num_frames)
        elif k == "local_prompts" and v.shape[-2] != num_frames:
            t_train = v.shape[-2]
            if num_frames % t_train == 0:
                reps = [1] * v.ndim
                reps[-2] = num_frames // t_train
                out[k] = np.tile(np.asarray(v), reps)
            else:
                idx = (np.arange(num_frames) * t_train) // num_frames
                out[k] = np.asarray(v)[..., idx, :]
        else:
            out[k] = v
    return out


def merge_pytrees(base: Dict, overlay: Dict) -> Dict:
    """Non-strict overlay (reference load_state_dict(strict=False) analogue):
    leaves present in `overlay` replace those in `base`, recursively."""
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_pytrees(out[k], v)
        else:
            out[k] = v
    return out
