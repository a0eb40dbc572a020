"""Jitted train/eval steps.

One pjit-able function contains the full pipeline: vision tower + batched
text tower + heads + loss composition + grads + AdamW update — the TPU-native
replacement for the reference's autocast/GradScaler/DDP step loop
(train.py:396-494). Data parallelism comes from sharding the batch on the
mesh 'data' axis; XLA inserts the gradient all-reduce.

Micro-batching (--batch_split) is a `lax.scan` over micro-batches with
gradient averaging, replacing the reference's Python slice loop
(train.py:426-487).
"""

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .losses import cross_entropy, focal_ordinal_weight, sigmoid_focal_loss
from .state import TrainState, combine_params


@dataclass(frozen=True)
class LossConfig:
    num_classes: int
    focal_ordinal: bool = False
    fo_beta: float = 0.2               # 0.2 for updrs tasks, 0 otherwise (train.py:361-362)
    sigmoid_loss: bool = False
    use_support_memory: bool = False
    add_nte: bool = False
    memory_loss_weight: float = 0.1
    vnte_loss_weight: float = 0.05


def compute_losses(outputs: Dict, labels: jax.Array,
                   mt_labels: Optional[jax.Array], cfg: LossConfig) -> Tuple[jax.Array, Dict]:
    """Loss composition per reference train.py:446-475."""
    logits = outputs["logits"]
    loss = cross_entropy(logits, labels)
    if cfg.focal_ordinal:
        loss = loss * focal_ordinal_weight(logits, labels, gamma=2.0,
                                           alpha=0.25, beta=cfg.fo_beta)
    loss = loss.mean()
    total = loss
    metrics = {"loss": loss}

    if cfg.use_support_memory and "logits_mt" in outputs:
        if cfg.sigmoid_loss:
            # NB: reference applies memory_loss_weight twice in this branch
            # (scale inside the criterion AND at train.py:459) — reproduced.
            loss_mt = cfg.memory_loss_weight * sigmoid_focal_loss(
                outputs["logits_mt"], mt_labels, use_focal=False,
                scale=cfg.memory_loss_weight).mean()
        else:
            loss_mt = cfg.memory_loss_weight * cross_entropy(
                outputs["logits_mt"], mt_labels).mean()
        total = total + loss_mt
        metrics["loss_mt"] = loss_mt

    if cfg.add_nte and "logits_vm" in outputs:
        loss_vm = -cfg.vnte_loss_weight * jnp.diagonal(outputs["logits_vm"]).mean()
        total = total + loss_vm
        metrics["loss_vm"] = loss_vm

    hit1 = (jnp.argmax(logits, axis=-1) == labels).sum()
    metrics["hit1"] = hit1
    metrics["total"] = total
    return total, metrics


def make_loss_fn(model, loss_cfg: LossConfig, compute_dtype=jnp.float32,
                 attn_impl: str = "xla", remat="none",
                 frozen_int8: bool = False, scan_unroll: int = 1):
    """(trainable, frozen, batch) -> (loss, metrics) — the differentiable
    core of make_train_step, exposed for tests and custom drivers."""

    def loss_fn(trainable, frozen, batch):
        if frozen_int8:
            from ..ops.quant import quantize_frozen_for_train
            frozen = quantize_frozen_for_train(frozen)
        params = combine_params(trainable, frozen)
        outputs = model.apply(params, model.buffers, batch["video"],
                              memory=batch.get("memory"),
                              video_nte=batch.get("nte"),
                              compute_dtype=compute_dtype,
                              attn_impl=attn_impl, remat=remat,
                              scan_unroll=scan_unroll)
        return compute_losses(outputs, batch["labels"],
                              batch.get("mt_labels"), loss_cfg)

    return loss_fn


def make_train_step(model, loss_cfg: LossConfig, optimizer,
                    batch_split: int = 1, compute_dtype=jnp.float32,
                    attn_impl: str = "xla", remat="none",
                    donate: bool = True, frozen_int8: bool = False,
                    scan_unroll: int = 1):
    """Build the jitted train step: (state, batch) -> (state, metrics).

    remat: False/"none" | True/"full" | "dots" — vision-tower
    rematerialization policy (see models/vision.py).

    frozen_int8: run the FROZEN projection kernels (the CLIP backbone —
    reference freeze rule VitaCLIP_model.py:230-239) as int8 MXU GEMMs in
    the forward (and the remat recompute), with a straight-through bf16
    backward for dx. Weights are re-quantized from the frozen bf16 tree
    inside the step (one absmax pass); trainable params are untouched, so
    optimizer math is exact. A documented training-dynamics deviation
    (per-token activation quantization in the forward) — gated by
    tests/test_train_step.py::test_frozen_int8_trains_close_to_bf16.

    batch = {'video': (B,T,H,W,3), 'labels': (B,), 'nte': (B,70,E)?,
             'memory': (Bm,S,E)?, 'mt_labels': (Bm,)?}
    """

    loss_fn = make_loss_fn(model, loss_cfg, compute_dtype=compute_dtype,
                           attn_impl=attn_impl, remat=remat,
                           frozen_int8=frozen_int8, scan_unroll=scan_unroll)
    grad_fn = jax.grad(loss_fn, has_aux=True)

    def split(x):
        return x.reshape((batch_split, x.shape[0] // batch_split) + x.shape[1:])

    def step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        if batch_split == 1:
            grads, metrics = grad_fn(state.trainable, state.frozen, batch)
        else:
            micro = jax.tree_util.tree_map(split, batch)

            def body(carry, mb):
                g_acc, m_acc = carry
                g, m = grad_fn(state.trainable, state.frozen, mb)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                m_acc = jax.tree_util.tree_map(jnp.add, m_acc, m)
                return (g_acc, m_acc), None

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.trainable)
            m0 = {"loss": 0.0, "hit1": jnp.zeros((), jnp.int32), "total": 0.0}
            if loss_cfg.use_support_memory:
                m0["loss_mt"] = 0.0
            if loss_cfg.add_nte:
                m0["loss_vm"] = 0.0
            (grads, metrics), _ = jax.lax.scan(body, (g0, m0), micro)
            grads = jax.tree_util.tree_map(lambda g: g / batch_split, grads)
            for k in metrics:
                if k != "hit1":
                    metrics[k] = metrics[k] / batch_split

        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = jax.tree_util.tree_map(
            lambda p, u: p + u, state.trainable, updates)
        new_state = TrainState(step=state.step + 1, trainable=trainable,
                               frozen=state.frozen, opt_state=opt_state)
        metrics["acc1"] = metrics["hit1"] / batch["labels"].shape[0]
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(model, num_classes: int, compute_dtype=jnp.float32,
                   attn_impl: str = "xla", mean=None, std=None,
                   num_views: int = 1):
    """Eval step: (params, video, labels[, valid]) -> (hit1, conf_mat (C,C)).

    Confusion-matrix accumulation mirrors reference evaluate()
    (train.py:646-688) — rows = true class, cols = prediction — and runs
    entirely on device: under a mesh-sharded batch the one_hot einsum implies
    the cross-device reduction, i.e. the reference's `all_reduce(conf_mat)`
    (train.py:531-534) falls out of GSPMD instead of a host-side np.add.at.

    mean/std: when given, `video` is uint8 and is normalized in-step (fusing
    into the first GEMM). num_views > 1: `video` is (B*V, ...) view-flattened
    and per-view probabilities are averaged before argmax (--eval_all_views).
    valid: optional (B,) bool mask excluding batch padding rows from both
    hit1 and the confusion matrix.
    """
    from ..data.device_preprocess import normalize_frames

    @jax.jit
    def step(params, video, labels, valid=None):
        if mean is not None:
            video = normalize_frames(video, mean, std,
                                     compute_dtype=jnp.float32)
        outputs = model.apply(params, model.buffers, video,
                              compute_dtype=compute_dtype, attn_impl=attn_impl)
        probs = jax.nn.softmax(outputs["logits"], axis=-1)
        if num_views > 1:
            probs = probs.reshape(labels.shape[0], num_views, -1).mean(axis=1)
        preds = jnp.argmax(probs, axis=-1)
        w = (jnp.ones_like(labels, jnp.float32) if valid is None
             else valid.astype(jnp.float32))
        onehot_t = jax.nn.one_hot(labels, num_classes,
                                  dtype=jnp.float32) * w[:, None]
        onehot_p = jax.nn.one_hot(preds, num_classes, dtype=jnp.float32)
        conf = jnp.einsum("bi,bj->ij", onehot_t, onehot_p)
        hit1 = ((preds == labels) * w).sum()
        return hit1, conf

    return step
