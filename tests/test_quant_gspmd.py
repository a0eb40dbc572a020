"""Quantized paths under GSPMD (VERDICT r3 #3).

The fused w8a8 serving kernels are normally gated on
`jax.default_backend() == "tpu"`, so the CPU mesh tests only ever saw the
XLA fallback — w8a8 serving + shard_map and frozen-int8 training + GSPMD
were untested compositions. `ops.int8_matmul.force_tpu_kernels(True)` routes
the Pallas kernels (interpret mode off-TPU) so a 2-device CPU mesh can pin:

  (a) frozen-int8 training: interpret-mode Pallas straight-through kernels
      under a data-sharded jit step == single-device numerics
      (reference semantics protected: training/train.py:347-349 DDP);
  (b) w8a8 serving: the fused serving kernels under shard_map over the
      data axis == single-device probabilities
      (reference semantics: VitaCLIP_model.py:296-306 zero-shot logits).

Kept at 2 devices and tiny shapes: the 1-core host trips the XLA 40 s
collective rendezvous timeout with wider meshes under load (CLAUDE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gava_clip_tpu.ops.int8_matmul import force_tpu_kernels, kernels_active


@pytest.fixture
def forced_kernels():
    force_tpu_kernels(True)
    assert kernels_active()
    yield
    force_tpu_kernels(False)


def _mesh2():
    return Mesh(np.array(jax.devices()[:2]), ("data",))


def test_w8a8_matmul_under_gspmd_matches_single_device(forced_kernels):
    """The core fused kernel partitions over a data-sharded jit (the
    building block every serving path rests on)."""
    from gava_clip_tpu.ops.int8_matmul import w8a8_matmul
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(16, 64).astype(np.float32))
    w = rs.randn(64, 32).astype(np.float32)
    qa = jnp.asarray(np.clip(np.round(w / np.abs(w).max(0) * 127),
                             -127, 127).astype(np.int8))
    scale = jnp.asarray((np.abs(w).max(0) / 127)
                        .astype(np.float32).reshape(1, -1))
    f = jax.jit(lambda x: w8a8_matmul(x, qa, scale))
    y0 = np.asarray(f(x))
    mesh = _mesh2()
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    y1 = np.asarray(f(xs))
    np.testing.assert_allclose(y0, y1, atol=1e-5)


def _tiny_zero_shot():
    from gava_clip_tpu.models.text import TextConfig
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
    tf = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=2,
                            feature_dim=32, patch_size=(16, 16), heads=2,
                            layers=2, mlp_factor=2.0, embed_dim=16,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=2),
        num_classes=3, zeroshot_evaluation=True)
    return VitaClip(cfg, zeroshot_text_features=tf)


def test_w8a8_serving_shard_map_matches_single_device(forced_kernels):
    """VideoClassifier(quantize='w8a8', mesh=2dev): the fused interpret-mode
    Pallas serving kernels run inside shard_map over the data axis and must
    reproduce the single-device probabilities bit-for-tolerance."""
    from gava_clip_tpu.serve import VideoClassifier
    model = _tiny_zero_shot()
    names = ["normal", "slight", "moderate"]
    rs = np.random.RandomState(1)
    clips = rs.randint(0, 255, (4, 2, 32, 32, 3), np.uint8)

    single = VideoClassifier.from_model(
        model, names, batch_size=4, quantize="w8a8",
        attn_impl="flash").warmup()
    p_single = single.classify_clips(clips)

    sharded = VideoClassifier.from_model(
        model, names, batch_size=4, quantize="w8a8",
        attn_impl="flash", mesh=_mesh2()).warmup()
    p_sharded = sharded.classify_clips(clips)

    assert p_single.shape == (4, 3)
    np.testing.assert_allclose(p_single.sum(-1), 1.0, atol=1e-3)
    np.testing.assert_allclose(p_single, p_sharded, atol=1e-5)


def test_w8a8_forced_kernels_match_xla_fallback():
    """The interpret-mode Pallas serving path and the XLA int8 composition
    are the same math (per-token quant, int8 dot, rank-1 rescale) — the gate
    flip must not change what the model computes."""
    from gava_clip_tpu.serve import VideoClassifier
    model = _tiny_zero_shot()
    names = ["normal", "slight", "moderate"]
    rs = np.random.RandomState(2)
    clips = rs.randint(0, 255, (4, 2, 32, 32, 3), np.uint8)

    p_xla = VideoClassifier.from_model(
        model, names, batch_size=4, quantize="w8a8",
        attn_impl="flash").warmup().classify_clips(clips)
    force_tpu_kernels(True)
    try:
        p_pallas = VideoClassifier.from_model(
            model, names, batch_size=4, quantize="w8a8",
            attn_impl="flash").warmup().classify_clips(clips)
    finally:
        force_tpu_kernels(False)
    # fused kernels accumulate in fp32 with in-VMEM LN/quant; the XLA
    # fallback rounds through the same int8 grid — tight but not bitwise
    np.testing.assert_allclose(p_xla, p_pallas, atol=2e-3)


def test_frozen_int8_grads_gspmd_match_single_device(tmp_path):
    """The frozen-int8 loss/grad core — interpret-mode Pallas
    straight-through kernels (int8_linear_st/int8_mlp_st run Pallas
    unconditionally off-TPU) — under a 2-device data-sharded batch must
    produce the same loss and gradients as the single-device trace.
    Gradients (not post-Adam params) are compared: Adam's v̂-normalization
    amplifies reduction-order-level fp32 noise on zero-init leaves into
    visible param deltas, which says nothing about GSPMD correctness."""
    from gava_clip_tpu.models.vita_clip import trainable_mask
    from gava_clip_tpu.train.state import partition_params
    from gava_clip_tpu.train.step import LossConfig, make_loss_fn
    from tests.test_train_step import _batch, _tiny_model

    model = _tiny_model(tmp_path)
    mask = trainable_mask(model.params, model.cfg)
    loss_cfg = LossConfig(num_classes=3, focal_ordinal=True,
                          use_support_memory=True, add_nte=True)
    batch = _batch(B=4)
    trainable, frozen = partition_params(model.params, mask)
    trainable = jax.tree_util.tree_map(jnp.asarray, trainable)
    frozen = jax.tree_util.tree_map(jnp.asarray, frozen)
    loss_fn = make_loss_fn(model, loss_cfg, frozen_int8=True)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    def run(shard):
        if shard:
            mesh = _mesh2()
            data = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            t = jax.device_put(trainable, repl)
            f = jax.device_put(frozen, repl)
            # video/labels/nte shard on the batch axis; the support-memory
            # bank rides replicated (its batch is a global constant)
            b = dict(batch)
            for k in ("video", "labels", "nte"):
                b[k] = jax.device_put(batch[k], data)
            for k in ("memory", "mt_labels"):
                b[k] = jax.device_put(batch[k], repl)
        else:
            t, f, b = trainable, frozen, batch
        (loss, _), grads = grad_fn(t, f, b)
        jax.block_until_ready(loss)
        return float(loss), grads

    l0, g0 = run(shard=False)
    l1, g1 = run(shard=True)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    paths0 = jax.tree_util.tree_leaves_with_path(g0)
    paths1 = jax.tree_util.tree_leaves_with_path(g1)
    assert len(paths0) == len(paths1) > 0
    for (p0, a), (_, b) in zip(paths0, paths1):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-3)  # fp32 psum reduction-order noise
        np.testing.assert_allclose(a, b, atol=3e-5 * scale, rtol=1e-3,
                                   err_msg=str(p0))
