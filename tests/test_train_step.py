"""Train-step behavior: loss decreases, grads only touch trainable params,
micro-batching is consistent, and the step runs sharded on an 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.models.prompts import PromptConfig
from gava_clip_tpu.models.text import TextConfig
from gava_clip_tpu.models.vision import VisionConfig
from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig, trainable_mask
from gava_clip_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from gava_clip_tpu.train.state import (create_train_state, make_optimizer,
                                       combine_params)
from gava_clip_tpu.train.step import LossConfig, make_eval_step, make_train_step


def _tiny_model(tmp_path, support_memory=True, add_nte=True):
    n_cls = 3
    ke = tmp_path / "ke_updrs"
    ke.mkdir(parents=True, exist_ok=True)
    rs = np.random.RandomState(0)
    for kv in ("v1", "v2"):
        np.save(ke / f"EntityEmb_{kv}.npy", rs.randn(n_cls, 768).astype(np.float32))
        with open(ke / f"simQdesc_{kv}.txt", "w") as f:
            for c in range(n_cls):
                f.write(f"desc {kv} class {c}\n")
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                            patch_size=(16, 16), heads=2, layers=2,
                            mlp_factor=2.0, embed_dim=32,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=2),
        text=TextConfig(embed_dim=32, width=32, heads=2, layers=2),
        num_classes=n_cls, use_text_prompt_learning=True,
        prompt=PromptConfig(n_cls=n_cls, n_ctx=4, ctx_dim=32, emb_dim=8,
                            init="cntn_split_uni_disc", csc=True,
                            knowledge_versions=("v1", "v2"),
                            knowledge_dir=str(ke)),
        use_support_memory=support_memory, add_nte=add_nte)
    classnames = ["normal", "slight difficulty", "moderate difficulty"]
    return VitaClip(cfg, classnames=classnames)


def _batch(B=4, T=2, E=32, Bm=6, rs=None):
    rs = rs or np.random.RandomState(1)
    return {
        "video": jnp.asarray(rs.randn(B, T, 32, 32, 3).astype(np.float32)),
        "labels": jnp.asarray(rs.randint(0, 3, size=B)),
        "nte": jnp.asarray(rs.randn(B, 70, E).astype(np.float32)),
        "memory": jnp.asarray(rs.randn(Bm, 4, E).astype(np.float32)),
        "mt_labels": jnp.asarray(rs.randint(0, 3, size=Bm)),
    }


def test_train_step_decreases_loss(tmp_path):
    model = _tiny_model(tmp_path)
    mask = trainable_mask(model.params, model.cfg)
    opt = make_optimizer(lr=1e-2, num_steps=50, weight_decay=0.0)
    state = create_train_state(model.params, mask, opt)
    loss_cfg = LossConfig(num_classes=3, focal_ordinal=True,
                          use_support_memory=True, add_nte=True)
    step = make_train_step(model, loss_cfg, opt, donate=False)
    batch = _batch()
    _, first = step(state, batch)
    for _ in range(8):
        state, metrics = step(state, batch)
    assert float(metrics["total"]) < float(first["total"])
    assert "loss_mt" in metrics and "loss_vm" in metrics


def test_frozen_params_unchanged(tmp_path):
    model = _tiny_model(tmp_path)
    mask = trainable_mask(model.params, model.cfg)
    opt = make_optimizer(lr=1e-2, num_steps=10, weight_decay=0.1)
    state = create_train_state(model.params, mask, opt)
    loss_cfg = LossConfig(num_classes=3, use_support_memory=True, add_nte=True)
    step = make_train_step(model, loss_cfg, opt, donate=False)
    before = jax.tree_util.tree_map(np.asarray, state.frozen)
    state2, _ = step(state, _batch())
    after = jax.tree_util.tree_map(np.asarray, state2.frozen)
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
    # trainable did change
    t0 = jax.tree_util.tree_leaves(state.trainable)
    t1 = jax.tree_util.tree_leaves(state2.trainable)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(t0, t1))


def test_batch_split_matches_full_batch(tmp_path):
    model = _tiny_model(tmp_path, support_memory=False, add_nte=False)
    mask = trainable_mask(model.params, model.cfg)
    opt = make_optimizer(lr=1e-3, num_steps=10, weight_decay=0.0)
    loss_cfg = LossConfig(num_classes=3)
    batch = {"video": _batch()["video"], "labels": _batch()["labels"]}

    s1 = create_train_state(model.params, mask, opt)
    step1 = make_train_step(model, loss_cfg, opt, batch_split=1, donate=False)
    s1, m1 = step1(s1, batch)

    s2 = create_train_state(model.params, mask, opt)
    step2 = make_train_step(model, loss_cfg, opt, batch_split=2, donate=False)
    s2, m2 = step2(s2, batch)

    # batch_split computes CE means over micro-batches (like the reference),
    # so metrics match when micro-batches are balanced; params stay close.
    np.testing.assert_allclose(float(m1["acc1"]), float(m2["acc1"]))
    for a, b in zip(jax.tree_util.tree_leaves(s1.trainable),
                    jax.tree_util.tree_leaves(s2.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_eval_step_confusion_matrix(tmp_path):
    model = _tiny_model(tmp_path, support_memory=False, add_nte=False)
    eval_step = make_eval_step(model, num_classes=3)
    batch = _batch()
    hit1, conf = eval_step(model.params, batch["video"], batch["labels"])
    conf = np.asarray(conf)
    assert conf.sum() == batch["labels"].shape[0]
    assert int(hit1) == int(np.trace(conf))


def test_train_step_on_8_device_mesh(tmp_path):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    model = _tiny_model(tmp_path)
    mesh = create_mesh()
    mask = trainable_mask(model.params, model.cfg)
    opt = make_optimizer(lr=1e-3, num_steps=10, weight_decay=0.0)
    state = create_train_state(model.params, mask, opt)
    loss_cfg = LossConfig(num_classes=3, use_support_memory=True, add_nte=True)
    step = make_train_step(model, loss_cfg, opt, donate=False)

    state = replicate(state, mesh)
    batch = _batch(B=8, Bm=8)
    batch = shard_batch(batch, mesh)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total"]))
    assert int(state.step) == 1


def test_frozen_int8_trains_close_to_bf16(tmp_path):
    """--int8_frozen gate: int8-forward training (straight-through dx) must
    track the exact-fp train step — same loss trajectory within a small
    tolerance and same prediction after a few steps. Frozen weights get no
    dw either way, so only the forward/dx precision differs."""
    import jax
    import jax.numpy as jnp
    from gava_clip_tpu.models.vita_clip import trainable_mask
    from gava_clip_tpu.train.state import (combine_params, create_train_state,
                                           make_optimizer)
    from gava_clip_tpu.train.step import LossConfig, make_train_step

    model = _tiny_model(tmp_path, support_memory=False, add_nte=False)
    mask = trainable_mask(model.params, model.cfg)
    opt = make_optimizer(1e-3, 10, weight_decay=0.2)
    cfg = LossConfig(num_classes=3)
    rs = np.random.RandomState(5)
    batches = [{"video": jnp.asarray(rs.rand(2, 2, 32, 32, 3)
                                     .astype(np.float32)),
                "labels": jnp.asarray([i % 3, (i + 1) % 3])}
               for i in range(8)]

    trajs = {}
    finals = {}
    for name, fi in (("fp", False), ("int8", True)):
        state = create_train_state(model.params, mask, opt)
        step = make_train_step(model, cfg, opt, donate=False, frozen_int8=fi)
        losses = []
        for b in batches:
            state, m = step(state, b)
            losses.append(float(m["total"]))
        trajs[name] = losses
        finals[name] = combine_params(state.trainable, state.frozen)

    np.testing.assert_allclose(trajs["int8"], trajs["fp"], rtol=0.06,
                               atol=0.05)
    # trainable updates stay close (grads flow through the int8 forward)
    tp = np.asarray(finals["fp"]["visual"]["time_embed"])
    tq = np.asarray(finals["int8"]["visual"]["time_embed"])
    np.testing.assert_allclose(tq, tp, atol=5e-3)


@pytest.mark.parametrize("remat", ["full", "dots", "save_attn",
                                   "save_attn_qkv", "save_attn_mlp"])
def test_remat_policies_match_none(tmp_path, remat):
    """Rematerialization must be a pure memory/compute trade: every policy
    (incl. the named save_attn/save_attn_mlp selective policies, which keep
    the checkpoint-named attention outputs / MLP hiddens as residuals)
    produces the same loss and the same GRADIENTS as remat='none'.

    Gradients, not post-AdamW params: leaves whose true gradient is ~0
    carry fp-reassociation noise (~1e-12) that differs per compilation, and
    Adam's g/(|g|+eps) normalization amplifies that noise into O(lr)
    param deltas — an artifact of near-zero grads, not of remat."""
    model = _tiny_model(tmp_path)
    mask = trainable_mask(model.params, model.cfg)
    loss_cfg = LossConfig(num_classes=3, use_support_memory=True,
                          add_nte=True)
    batch = _batch()
    from gava_clip_tpu.train.step import make_loss_fn

    def grads(mode):
        loss_fn = make_loss_fn(model, loss_cfg, remat=mode)
        state = create_train_state(model.params, mask,
                                   make_optimizer(1e-2, 10, 0.0))
        g, metrics = jax.jit(jax.grad(loss_fn, has_aux=True))(
            state.trainable, state.frozen, batch)
        return g, metrics

    g0, m0 = grads("none")
    g1, m1 = grads(remat)
    np.testing.assert_allclose(float(m1["total"]), float(m0["total"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_save_attn_policy_eliminates_flash_rerun(tmp_path):
    """Structural pin for the save_attn* remat policies: under remat='full'
    the backward re-runs the flash forward kernel (one extra pallas_call in
    the grad jaxpr); with the checkpoint-named outputs saved it must not.
    Trace-only (no execution), so it runs with attn_impl='flash' on CPU."""
    import re
    from gava_clip_tpu.train.step import make_loss_fn

    model = _tiny_model(tmp_path)
    mask = trainable_mask(model.params, model.cfg)
    state = create_train_state(model.params, mask,
                               make_optimizer(1e-3, 10, 0.0))
    loss_cfg = LossConfig(num_classes=3, use_support_memory=True,
                          add_nte=True)
    batch = _batch()

    def n_pallas(mode):
        lf = make_loss_fn(model, loss_cfg, remat=mode, attn_impl="flash")
        jaxpr = jax.make_jaxpr(jax.grad(lf, has_aux=True))(
            state.trainable, state.frozen, batch)
        return len(re.findall(r"pallas_call\[", str(jaxpr)))

    full, saved = n_pallas("full"), n_pallas("save_attn_qkv")
    assert saved == full - 1, (
        f"save_attn_qkv should eliminate exactly the flash-forward re-run "
        f"from the backward: full={full}, save_attn_qkv={saved}")


def test_save_attn_qkv_on_mesh(tmp_path):
    """The named-selective remat policy must compose with GSPMD batch
    sharding (checkpoint_name residuals under a mesh). 2 devices, not 8:
    the policy's extra residual thunks between collectives aggravate the
    1-core virtual-mesh rendezvous-timeout quirk (CLAUDE.md) at 8."""
    model = _tiny_model(tmp_path)
    mesh = create_mesh(n_devices=2, devices=jax.devices()[:2])
    mask = trainable_mask(model.params, model.cfg)
    opt = make_optimizer(lr=1e-3, num_steps=10, weight_decay=0.0)
    state = replicate(create_train_state(model.params, mask, opt), mesh)
    loss_cfg = LossConfig(num_classes=3, use_support_memory=True,
                          add_nte=True)
    step = make_train_step(model, loss_cfg, opt, donate=False,
                           remat="save_attn_qkv")
    batch = shard_batch(_batch(B=4, Bm=4), mesh)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total"]))


def test_save_attn_policy_structural_recompute_bwd_mode(tmp_path):
    """Same structural pin with GAVA_FLASH_BWD=recompute: the custom-VJP
    residuals become (q, k, v), but 'attn_out' is still checkpoint-named,
    so save_attn_qkv must still eliminate exactly the flash-forward re-run
    (the out-projection dw consumes attn_out without re-running the
    kernel). Gradients themselves are pinned equal by
    test_flash_bwd_recompute_matches_saved_residual."""
    import re
    from gava_clip_tpu.ops.flash_attention import set_flash_bwd_mode
    from gava_clip_tpu.train.step import make_loss_fn

    model = _tiny_model(tmp_path)
    mask = trainable_mask(model.params, model.cfg)
    state = create_train_state(model.params, mask,
                               make_optimizer(1e-3, 10, 0.0))
    loss_cfg = LossConfig(num_classes=3, use_support_memory=True,
                          add_nte=True)
    batch = _batch()

    def n_pallas(mode):
        lf = make_loss_fn(model, loss_cfg, remat=mode, attn_impl="flash")
        jaxpr = jax.make_jaxpr(jax.grad(lf, has_aux=True))(
            state.trainable, state.frozen, batch)
        return len(re.findall(r"pallas_call\[", str(jaxpr)))

    set_flash_bwd_mode("recompute")
    try:
        full, saved = n_pallas("full"), n_pallas("save_attn_qkv")
    finally:
        set_flash_bwd_mode("saved")
    assert saved == full - 1, (full, saved)
