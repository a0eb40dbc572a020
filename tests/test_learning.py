"""End-to-end learning sanity: the full train step (prompt learning + heads)
separates visually distinct classes on synthetic data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.models.vita_clip import trainable_mask
from gava_clip_tpu.train.state import create_train_state, make_optimizer
from gava_clip_tpu.train.step import LossConfig, make_eval_step, make_train_step
from tests.test_train_step import _tiny_model


def _class_batch(rs, n_per_class=4, T=2, S=32):
    """Class k = a distinct spatial pattern (stripes/checkerboard) + noise;
    separable in feature *direction* (brightness alone would be normalized
    away by the L2-normalized CLIP features)."""
    yy, xx = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
    patterns = [
        (np.sin(2 * np.pi * xx / 8) > 0).astype(np.float32),       # vertical
        (np.sin(2 * np.pi * yy / 8) > 0).astype(np.float32),       # horizontal
        ((np.sin(2 * np.pi * xx / 8) * np.sin(2 * np.pi * yy / 8)) > 0
         ).astype(np.float32),                                      # checker
    ]
    videos, labels = [], []
    for k in range(3):
        for _ in range(n_per_class):
            v = np.broadcast_to(patterns[k][None, :, :, None],
                                (T, S, S, 3)).astype(np.float32) * 0.8 + 0.1
            v = v + rs.randn(T, S, S, 3).astype(np.float32) * 0.05
            videos.append(np.clip(v, 0, 1))
            labels.append(k)
    return np.stack(videos), np.asarray(labels)


def test_model_learns_synthetic_classes(tmp_path):
    model = _tiny_model(tmp_path, support_memory=False, add_nte=False)
    mask = trainable_mask(model.params, model.cfg)
    opt = make_optimizer(lr=5e-3, num_steps=60, weight_decay=0.0)
    state = create_train_state(model.params, mask, opt)
    step = make_train_step(model, LossConfig(num_classes=3), opt, donate=False)
    eval_step = make_eval_step(model, num_classes=3)

    rs = np.random.RandomState(0)
    for i in range(40):
        videos, labels = _class_batch(rs)
        state, metrics = step(state, {"video": jnp.asarray(videos),
                                      "labels": jnp.asarray(labels)})

    test_videos, test_labels = _class_batch(np.random.RandomState(99))
    hit1, conf = eval_step(state.params, jnp.asarray(test_videos),
                           jnp.asarray(test_labels))
    acc = float(hit1) / len(test_labels)
    assert acc >= 0.75, f"model failed to learn separable classes: acc={acc}"
    assert float(metrics["loss"]) < 1.0
