"""Loss functions — semantics match reference training/loss_utils.py and the
loss composition in training/train.py:441-475. All pure jnp, per-sample
reductions left to the caller (reference uses reduction='none' CE)."""

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-sample softmax cross entropy with integer labels (as
    torch.nn.CrossEntropyLoss(reduction='none')). Note the reference feeds
    already-log-softmaxed memory logits through this too — applying
    log_softmax again, which this reproduces by construction."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def focal_ordinal_weight(logits: jax.Array, labels: jax.Array,
                         gamma: float = 2.0, alpha: float = 0.25,
                         beta: float = 0.0, scale: float = 1.0) -> jax.Array:
    """Per-sample weight combining a focal term and the ordinal distance
    |argmax(y) - argmax(y_hat)| / (C-1) — reference
    categorical_ordinal_focal_weight (loss_utils.py:9-46)."""
    n_cls = logits.shape[-1]
    y_true = jax.nn.one_hot(labels, n_cls, dtype=jnp.float32)
    y_pred = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    ordinal = jnp.abs(labels - jnp.argmax(y_pred, axis=-1)).astype(jnp.float32)
    weights = ordinal / (n_cls - 1)
    focal = alpha * jnp.power(1.0 - y_pred, gamma)
    combined = (beta * weights[:, None] + focal) * y_true
    return combined.sum(-1) * scale


def sigmoid_focal_loss(logits: jax.Array, labels: jax.Array,
                       alpha: float = 0.25, gamma: float = 2.0,
                       use_focal: bool = False, scale: float = 1.0) -> jax.Array:
    """SigLIP-style ±1 log-sigmoid loss, summed over classes per sample —
    reference sigmoid_focal_loss (loss_utils.py:139-177)."""
    n_cls = logits.shape[-1]
    if labels.ndim == logits.ndim - 1:
        y = jax.nn.one_hot(labels, n_cls, dtype=jnp.float32)
    else:
        y = labels.astype(jnp.float32)
    z = logits.astype(jnp.float32)
    ce = -jax.nn.log_sigmoid((y * 2.0 - 1.0) * z)
    if use_focal:
        p = jax.nn.sigmoid(z)
        p_t = p * y + (1.0 - p) * (1.0 - y)
        a_t = alpha * y + (1.0 - alpha) * (1.0 - y)
        ce = a_t * (1.0 - p_t) ** gamma * ce
    return ce.sum(-1) * scale


def cosine_similarity_nce(sim_mat: jax.Array, temperature: float = 10.0,
                          weight: float = 1.0) -> jax.Array:
    """Cosine-similarity NCE over a square similarity matrix — reference
    cosine_similarity_nce_loss (loss_utils.py:48-79), mean reduction."""
    nomin = jnp.exp(jnp.diagonal(sim_mat, axis1=-2, axis2=-1) / temperature)
    denomin = jnp.exp(sim_mat.sum(-1) / temperature)
    return weight * jnp.mean(-jnp.log(nomin / denomin))


def info_nce(y_pred: jax.Array, y_true: jax.Array, n_cls: int,
             temperature: float = 0.1, weight: float = 1.0,
             eps: float = 1e-7, focal: bool = False) -> jax.Array:
    """InfoNCE over class logits — reference InfoNCE_loss
    (loss_utils.py:81-137, y=None path)."""
    onehot = jax.nn.one_hot(y_true, n_cls, dtype=bool)
    pair_pos = y_pred[onehot]
    prob_pos = jnp.exp(pair_pos / temperature)
    prob_neg = jnp.exp(y_pred / temperature)
    if focal:
        fw = 0.25 * jnp.power(1.0 - prob_pos / prob_neg.sum(-1), 2.0)
        prob_pos = prob_pos * fw
    return weight * (-jnp.log(prob_pos.sum() / (prob_neg.sum() + eps)))
