"""Training-dynamics parity: several full optimizer steps of our jitted
train step vs the reference's torch loop (train.py:351-357,446-494) from a
converted identical init must produce the same loss trajectory and the same
updated parameters.

This closes the gap between gradient parity (tests/test_model_parity.py)
and end-to-end training parity: it exercises the AdamW hyperparameter
mapping (betas/eps/decoupled weight decay over the trainable set), the
CosineAnnealingLR(T_max=num_steps) schedule alignment (reference steps the
scheduler AFTER optimizer.step(), so update k uses lr(k)), and the full
loss composition (CE + memory CE + NTE diagonal).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model_parity import _build_models, N_CLS, ref_env  # noqa: F401

jax.config.update("jax_default_matmul_precision", "highest")

NUM_STEPS = 5
LR = 1e-3
WD = 0.2


def _batches(rs, n, add_losses):
    out = []
    for i in range(n):
        b = {
            "video": rs.randn(2, 4, 32, 32, 3).astype(np.float32),
            "labels": np.array([i % N_CLS, (i + 1) % N_CLS], np.int64),
        }
        if add_losses:
            b["memory"] = rs.randn(4, 6, 64).astype(np.float32)
            b["mt_labels"] = np.array([0, 1, 2, i % N_CLS], np.int64)
            b["nte"] = rs.randn(2, 70, 64).astype(np.float32)
        out.append(b)
    return out


def _torch_trajectory(ref, batches, add_losses):
    """Reference train loop math (train.py:351-357,420-494) with fp16 off:
    the GradScaler degenerates to plain backward/step."""
    import torch
    ref.train()
    optimizer = torch.optim.AdamW(ref.parameters(), lr=LR, weight_decay=WD)
    lr_sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        optimizer, T_max=NUM_STEPS)
    criterion = torch.nn.CrossEntropyLoss(reduction="none")
    losses = []
    for b in batches:
        optimizer.zero_grad(set_to_none=True)
        logits, logits_mt, logits_vm = ref(
            torch.from_numpy(b["video"].transpose(0, 4, 1, 2, 3)),
            memory=torch.from_numpy(b["memory"]) if add_losses else None,
            video_nte=torch.from_numpy(b["nte"]) if add_losses else None)
        loss_tot = criterion(logits, torch.from_numpy(b["labels"])).mean()
        if add_losses:
            loss_tot = loss_tot + 0.1 * criterion(
                logits_mt, torch.from_numpy(b["mt_labels"])).mean()
            loss_tot = loss_tot - 0.05 * torch.diag(logits_vm).mean()
        loss_tot.backward()
        optimizer.step()
        lr_sched.step()
        losses.append(float(loss_tot.detach()))
    return losses


def _ours_trajectory(model, params, batches, add_losses):
    from gava_clip_tpu.models.vita_clip import trainable_mask
    from gava_clip_tpu.train.state import create_train_state, make_optimizer
    from gava_clip_tpu.train.step import LossConfig, make_train_step

    opt = make_optimizer(LR, NUM_STEPS, weight_decay=WD)
    state = create_train_state(params, trainable_mask(params, model.cfg), opt)
    loss_cfg = LossConfig(num_classes=N_CLS,
                          use_support_memory=add_losses, add_nte=add_losses,
                          memory_loss_weight=0.1, vnte_loss_weight=0.05)
    step = make_train_step(model, loss_cfg, opt, donate=False)
    losses = []
    for b in batches:
        state, metrics = step(state, jax.tree_util.tree_map(jnp.asarray, b))
        losses.append(float(metrics["total"]))
    return losses, state


@pytest.mark.parametrize("add_losses", [False, True],
                         ids=["ce_only", "full_loss"])
def test_five_step_loss_trajectory_matches_reference(ref_env, add_losses):
    ref, model, params = _build_models(ref_env, support_memory=add_losses,
                                       add_nte=add_losses)
    rs = np.random.RandomState(17)
    batches = _batches(rs, NUM_STEPS, add_losses)

    want = _torch_trajectory(ref, batches, add_losses)
    got, state = _ours_trajectory(model, params, batches, add_losses)

    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-4)
    # the trajectory must actually move (optimizer is doing something)
    assert abs(want[0] - want[-1]) > 1e-5

    # updated parameters after 5 AdamW+cosine steps match torch leaves
    import torch
    pairs = [
        (ref.prompt_learner.ctx, state.trainable["prompt"]["ctx"]),
        (ref.visual.time_embed, state.trainable["visual"]["time_embed"]),
        (ref.visual.global_prompts,
         state.trainable["visual"]["global_prompts"]),
        (ref.logit_scale, state.trainable["logit_scale"]),
    ]
    for want_p, got_p in pairs:
        np.testing.assert_allclose(np.asarray(got_p),
                                   want_p.detach().numpy(),
                                   rtol=2e-3, atol=2e-4)
