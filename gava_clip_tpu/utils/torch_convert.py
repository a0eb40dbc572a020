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
