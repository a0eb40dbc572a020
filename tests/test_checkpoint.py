"""Checkpoint save/resume round trips: pickle + orbax backends, auto-resume
scan, pretrain (non-strict) overlay."""

import argparse
import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.train import checkpoint as C
from gava_clip_tpu.train.state import (TrainState, combine_params,
                                       create_train_state, make_optimizer)


def _tiny_state():
    params = {"visual": {"w": jnp.arange(4.0), "frozen_w": jnp.ones(3)},
              "logit_scale": jnp.asarray(2.0)}
    mask = {"visual": {"w": True, "frozen_w": False}, "logit_scale": True}
    opt = make_optimizer(lr=1e-2, num_steps=10)
    return create_train_state(params, mask, opt), mask, opt


def test_pickle_roundtrip_and_autoresume(tmp_path):
    state, mask, opt = _tiny_state()
    C.save_checkpoint(str(tmp_path), state, 3)
    C.save_checkpoint(str(tmp_path), state, 7)
    found = C.find_autoresume_path(str(tmp_path))
    assert found.endswith("checkpoint-7.ckpt")

    args = argparse.Namespace(pretrain=None, resume_path=None,
                              auto_resume=True, checkpoint_dir=str(tmp_path))
    fresh, _, _ = _tiny_state()
    restored, step, tf = C.resume_from_checkpoint(fresh, mask, args)
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(restored.trainable["visual"]["w"]), np.arange(4.0))
    assert tf is None


def test_pretrain_nonstrict_overlay(tmp_path):
    state, mask, opt = _tiny_state()
    # mutate then save as a pretrain source
    mutated = TrainState(step=state.step,
                         trainable=jax.tree_util.tree_map(
                             lambda x: None if x is None else x + 1.0,
                             state.trainable, is_leaf=lambda x: x is None),
                         frozen=state.frozen, opt_state=state.opt_state)
    path = C.save_checkpoint(str(tmp_path), mutated, 5, name="pre")
    args = argparse.Namespace(pretrain=path, resume_path=None,
                              auto_resume=False, checkpoint_dir=None)
    fresh, _, _ = _tiny_state()
    restored, step, _ = C.resume_from_checkpoint(fresh, mask, args)
    assert step == 0  # pretrain loads weights only
    np.testing.assert_array_equal(
        np.asarray(restored.trainable["visual"]["w"]), np.arange(4.0) + 1.0)


def test_resume_is_exact(tmp_path):
    """Interrupt-and-resume reproduces the uninterrupted run exactly:
    params + optimizer state round-trip losslessly and the step loop
    continues from next_step (reference auto_resume semantics +
    deterministic samplers)."""
    import argparse
    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.models.vita_clip import trainable_mask
    from gava_clip_tpu.train.step import LossConfig, make_train_step
    from tests.test_train_step import _tiny_model, _batch

    model = _tiny_model(tmp_path, support_memory=False, add_nte=False)
    mask = trainable_mask(model.params, model.cfg)
    opt = make_optimizer(lr=1e-3, num_steps=10, weight_decay=0.1)
    loss_cfg = LossConfig(num_classes=3)
    step = make_train_step(model, loss_cfg, opt, donate=False)
    batches = [
        {"video": _batch(rs=np.random.RandomState(i))["video"],
         "labels": _batch(rs=np.random.RandomState(i))["labels"]}
        for i in range(4)]

    # uninterrupted run: steps 0..3
    s = create_train_state(model.params, mask, opt)
    for b in batches:
        s, _ = step(s, b)
    want = jax.tree_util.tree_map(
        np.asarray, combine_params(s.trainable, s.frozen))

    # interrupted run: steps 0..1, save, restore, steps 2..3
    s2 = create_train_state(model.params, mask, opt)
    for b in batches[:2]:
        s2, _ = step(s2, b)
    ckpt_dir = str(tmp_path / "ck")
    C.save_checkpoint(ckpt_dir, s2, 2)
    fresh = create_train_state(model.params, mask, opt)
    args = argparse.Namespace(pretrain=None, resume_path=None,
                              auto_resume=True, checkpoint_dir=ckpt_dir)
    s3, resume_step, _ = C.resume_from_checkpoint(fresh, mask, args)
    assert resume_step == 2
    for b in batches[resume_step:]:
        s3, _ = step(s3, b)
    got = jax.tree_util.tree_map(
        np.asarray, combine_params(s3.trainable, s3.frozen))
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(a, b)


def test_orbax_roundtrip(tmp_path):
    state, mask, opt = _tiny_state()
    tf = np.ones((3, 8), np.float32)
    path = C.save_checkpoint_orbax(str(tmp_path), state, 4, text_features=tf)
    ckpt = C.load_checkpoint(path)
    assert int(ckpt["next_step"]) == 4
    np.testing.assert_array_equal(ckpt["text_features"], tf)
    np.testing.assert_array_equal(
        np.asarray(ckpt["params"]["visual"]["w"]), np.arange(4.0))


def test_async_checkpoint_write_roundtrip(tmp_path):
    """async_write=True: the payload is fetched synchronously (safe with
    donated device buffers) and written on the background thread;
    wait_for_saves() joins and the file round-trips identically to a sync
    save."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gava_clip_tpu.train import checkpoint as ckpt_lib
    from gava_clip_tpu.train.state import create_train_state, make_optimizer

    params = {"a": {"kernel": jnp.arange(12.0).reshape(3, 4)},
              "b": jnp.ones((2,))}
    mask = {"a": {"kernel": True}, "b": False}
    opt = make_optimizer(1e-3, 10)
    state = jax.tree_util.tree_map(jnp.asarray,
                                   create_train_state(params, mask, opt))

    p_async = ckpt_lib.save_checkpoint(str(tmp_path), state, 5,
                                       async_write=True)
    ckpt_lib.wait_for_saves()
    p_sync = ckpt_lib.save_checkpoint(str(tmp_path), state, 6)
    a = ckpt_lib.load_checkpoint(p_async)
    s = ckpt_lib.load_checkpoint(p_sync)
    assert a["next_step"] == 5 and s["next_step"] == 6
    np.testing.assert_array_equal(a["params"]["a"]["kernel"],
                                  s["params"]["a"]["kernel"])
    # wait_for_saves is idempotent and surfaces nothing when queue is empty
    ckpt_lib.wait_for_saves()
