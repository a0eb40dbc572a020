"""Tensor-parallel sharding over a 2D ('data', 'model') mesh: the full train
step runs with Megatron-style column/row-sharded tower weights, and results
match the replicated run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gava_clip_tpu.models.vita_clip import trainable_mask
from gava_clip_tpu.parallel.mesh import (create_mesh, replicate,
                                         shard_batch,
                                         shard_params_tensor_parallel,
                                         tensor_parallel_spec)
from gava_clip_tpu.train.state import TrainState, create_train_state, make_optimizer
from gava_clip_tpu.train.step import LossConfig, make_train_step
from tests.test_train_step import _tiny_model, _batch


def test_tp_spec_rules():
    mesh = create_mesh(axis_names=("data", "model"), mesh_shape=(2, 4))
    path = lambda *names: tuple(jax.tree_util.DictKey(n) for n in names)
    k = np.zeros((12, 64, 64))
    assert tensor_parallel_spec(path("visual", "blocks", "attn", "q", "kernel"),
                                k, mesh) == P(None, None, "model")
    assert tensor_parallel_spec(path("visual", "blocks", "attn", "out", "kernel"),
                                k, mesh) == P(None, "model", None)
    assert tensor_parallel_spec(path("visual", "blocks", "mlp", "fc1", "kernel"),
                                k, mesh) == P(None, None, "model")
    assert tensor_parallel_spec(path("visual", "blocks", "mlp", "fc2", "kernel"),
                                k, mesh) == P(None, "model", None)
    assert tensor_parallel_spec(path("visual", "cls_token"),
                                np.zeros((64,)), mesh) == P()


def test_train_step_tensor_parallel_matches_replicated(tmp_path):
    # 4 devices (2 dp x 2 tp): fewer collective participants — the 1-core
    # host can hit XLA's 40 s CPU-rendezvous timeout with 8 under load
    assert len(jax.devices()) >= 4
    model = _tiny_model(tmp_path, support_memory=False, add_nte=False)
    mask = trainable_mask(model.params, model.cfg)
    opt = make_optimizer(lr=1e-3, num_steps=10, weight_decay=0.0)
    loss_cfg = LossConfig(num_classes=3)
    step = make_train_step(model, loss_cfg, opt, donate=False)
    b = _batch(B=8)
    batch = {"video": b["video"], "labels": b["labels"]}

    # replicated DP run
    mesh_dp = create_mesh(n_devices=4)
    s_dp = replicate(create_train_state(model.params, mask, opt), mesh_dp)
    s_dp, m_dp = step(s_dp, shard_batch(batch, mesh_dp))

    # 2D mesh: batch on 'data', tower weights TP-sharded on 'model'
    mesh_2d = create_mesh(n_devices=4, axis_names=("data", "model"),
                          mesh_shape=(2, 2))
    state = create_train_state(model.params, mask, opt)
    tp_params = shard_params_tensor_parallel(state.params, mesh_2d)
    from gava_clip_tpu.train.state import partition_params
    trainable, frozen = partition_params(tp_params, mask)
    opt_state = opt.init(trainable)
    s_tp = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                      frozen=frozen, opt_state=opt_state)
    batch_tp = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.sharding.NamedSharding(mesh_2d, P("data"))),
        batch)
    s_tp, m_tp = step(s_tp, batch_tp)

    np.testing.assert_allclose(float(m_tp["total"]), float(m_dp["total"]),
                               rtol=1e-4, atol=1e-4)
    # a TP-sharded kernel is genuinely distributed across the model axis
    k = s_tp.frozen["visual"]["blocks"]["mlp"]["fc1"]["kernel"]
    assert not k.sharding.is_fully_replicated
