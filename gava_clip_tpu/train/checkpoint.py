"""Checkpointing with the reference's resume triad (SURVEY.md §5):
--backbone_path (CLIP weights at model build), --pretrain (weights only,
non-strict), --auto_resume/--resume_path (full state + next_step).

Checkpoints carry {params, opt_state, next_step, text_features} — the
text_features slot is what makes zero-shot re-evaluation of a training run
work (reference checkpoint.py:104-105). Torch .pth checkpoints from the
reference are importable via utils/torch_convert.
"""

import os
import os.path as osp
import pickle
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .state import TrainState, combine_params, partition_params

CKPT_PREFIX = "checkpoint-"


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# async checkpoint writes: the device->host fetch stays SYNCHRONOUS (the
# train step donates the state buffers, so the fetch must complete before
# the next step call), but the pickle+disk write — seconds for the ~600 MB
# flagship payload — overlaps training on one writer thread. One worker
# keeps writes ordered (a later save of the same path never loses to an
# earlier one).
_WRITER = None
_PENDING = []


def _writer():
    global _WRITER
    if _WRITER is None:
        from concurrent.futures import ThreadPoolExecutor
        _WRITER = ThreadPoolExecutor(max_workers=1,
                                     thread_name_prefix="ckpt-writer")
    return _WRITER


def wait_for_saves() -> None:
    """Block until ALL async checkpoint writes landed, then re-raise the
    first failure (every future is joined first — a stale error must not
    leave later writes un-checked). Call before loading a just-saved
    checkpoint (NaN rollback), at fold end, and before process exit."""
    global _PENDING
    pending, _PENDING = _PENDING, []
    first_err = None
    for fut in pending:
        try:
            fut.result()
        except Exception as e:
            if first_err is None:
                first_err = e
    if first_err is not None:
        raise first_err


def _write_payload(payload, path: str) -> str:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def save_checkpoint(checkpoint_dir: str, state: TrainState, next_step: int,
                    text_features: Optional[np.ndarray] = None,
                    is_best: bool = False, name: str = "checkpoint",
                    async_write: bool = False) -> str:
    """Write a checkpoint (reference save_checkpoint, checkpoint.py:80-109).

    Format: a single .npz-like pickle of numpy arrays, structured as
    {params, opt_state, next_step, text_features}. Pickle keeps the exact
    pytree (incl. optax state namedtuples) without an external registry.

    async_write: fetch to host now, write on the background writer thread
    (wait_for_saves() joins). The returned path is where the file WILL be.
    """
    if not checkpoint_dir:
        return ""
    os.makedirs(checkpoint_dir, exist_ok=True)
    payload = {
        "params": _to_numpy_tree(combine_params(state.trainable, state.frozen)),
        "opt_state": _to_numpy_tree(state.opt_state),
        "next_step": int(next_step),
        "text_features": None if text_features is None else np.asarray(text_features),
    }
    fname = f"{name}-best.ckpt" if is_best else f"{name}-{next_step}.ckpt"
    path = osp.join(checkpoint_dir, fname)
    if async_write:
        _PENDING.append(_writer().submit(_write_payload, payload, path))
        return path
    return _write_payload(payload, path)


def save_checkpoint_orbax(checkpoint_dir: str, state: TrainState,
                          next_step: int,
                          text_features: Optional[np.ndarray] = None,
                          is_best: bool = False, name: str = "checkpoint") -> str:
    """Orbax-backed save — same payload layout as save_checkpoint but as an
    Orbax PyTree directory (async/sharded-friendly for multi-host runs)."""
    import orbax.checkpoint as ocp
    payload = {
        "params": _to_numpy_tree(combine_params(state.trainable, state.frozen)),
        "opt_state": _to_numpy_tree(state.opt_state),
        "next_step": int(next_step),
    }
    if text_features is not None:
        payload["text_features"] = np.asarray(text_features)
    fname = f"{name}-best.orbax" if is_best else f"{name}-{next_step}.orbax"
    path = osp.abspath(osp.join(checkpoint_dir, fname))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def load_checkpoint_orbax(path: str, template: Optional[Dict] = None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(osp.abspath(path), item=template)
    return ckptr.restore(osp.abspath(path))


def load_checkpoint(path: str) -> Dict[str, Any]:
    if path.endswith(".orbax") or osp.isdir(path):
        return load_checkpoint_orbax(path)
    if path.endswith(".pth"):  # reference torch checkpoint
        from ..utils.torch_convert import load_torch_state_dict
        import torch
        raw = torch.load(path, map_location="cpu", weights_only=False)
        sd = raw.get("model", raw)
        sd = {k[len("module."):] if k.startswith("module.") else k:
              np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach") else v
              for k, v in sd.items()}
        return {"torch_state_dict": sd,
                "next_step": raw.get("next_step", 0),
                "text_features": (np.asarray(raw["text_features"])
                                  if "text_features" in raw else None)}
    with open(path, "rb") as f:
        return pickle.load(f)


def find_autoresume_path(checkpoint_dir: str) -> Optional[str]:
    """Highest checkpoint-<N> in the dir (reference checkpoint.py:23-44)."""
    if not checkpoint_dir or not osp.isdir(checkpoint_dir):
        return None
    best = None
    for fn in os.listdir(checkpoint_dir):
        m = re.fullmatch(rf"{CKPT_PREFIX}(\d+)\.ckpt", fn)
        if m:
            step = int(m.group(1))
            if best is None or step > best[0]:
                best = (step, osp.join(checkpoint_dir, fn))
    return best[1] if best else None


def resume_from_checkpoint(state: TrainState, mask, args) -> Tuple[TrainState, int, Optional[np.ndarray]]:
    """Apply the pretrain/resume policy (reference checkpoint.py:47-77).
    Returns (state, resume_step, text_features)."""
    if getattr(args, "pretrain", None):
        ckpt = load_checkpoint(args.pretrain)
        if "params" in ckpt:
            from ..utils.torch_convert import merge_pytrees
            params = merge_pytrees(combine_params(state.trainable, state.frozen),
                                   ckpt["params"])
            trainable, frozen = partition_params(
                jax.tree_util.tree_map(jnp.asarray, params), mask)
            state = TrainState(step=state.step, trainable=trainable,
                               frozen=frozen, opt_state=state.opt_state)

    resume_path = getattr(args, "resume_path", None)
    if getattr(args, "auto_resume", False) and resume_path is None:
        resume_path = find_autoresume_path(args.checkpoint_dir)
    if resume_path is None:
        return state, 0, None

    ckpt = load_checkpoint(resume_path)
    params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
    trainable, frozen = partition_params(params, mask)
    opt_state = jax.tree_util.tree_map(
        lambda tmpl, new: jnp.asarray(new) if new is not None else tmpl,
        state.opt_state, ckpt["opt_state"],
        is_leaf=lambda x: x is None)
    next_step = int(ckpt["next_step"])
    state = TrainState(step=jnp.asarray(next_step, jnp.int32),
                       trainable=trainable, frozen=frozen, opt_state=opt_state)
    return state, next_step, ckpt.get("text_features")
