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


# ---------------------------------------------------------------------------
# long-horizon convergence equivalence (VERDICT r2 #4)
# ---------------------------------------------------------------------------

CONV_STEPS = 120
CONV_LR = 2e-3


def _separable_batches(rs, n, batch=4, protos=None):
    """Synthetic visually-separable data: each class is a fixed low-res color
    prototype upsampled to 32x32 plus noise. Pass the same `protos` for
    train/eval so both draw from one distribution."""
    if protos is None:
        protos = rs.rand(N_CLS, 1, 8, 8, 3).astype(np.float32)

    def clip_for(label):
        base = np.kron(protos[label], np.ones((4, 4, 4, 1), np.float32))
        return base + rs.randn(4, 32, 32, 3).astype(np.float32) * 0.08

    out = []
    for i in range(n):
        labels = np.array([(i + j) % N_CLS for j in range(batch)], np.int64)
        out.append({"video": np.stack([clip_for(l) for l in labels]),
                    "labels": labels})
    return out


def test_long_horizon_convergence_matches_reference(ref_env):
    """~120 AdamW+cosine steps on separable synthetic data: the torch
    reference loop and our jitted step, from converted-identical init, must
    track each other's loss curve and reach the same train accuracy — the
    best available proxy for TULIP top-1 parity without the dataset
    (reference loop: training/train.py:396-494)."""
    import torch
    ref, model, params = _build_models(ref_env, support_memory=False,
                                       add_nte=False)
    rs = np.random.RandomState(23)
    protos = rs.rand(N_CLS, 1, 8, 8, 3).astype(np.float32)
    batches = _separable_batches(rs, CONV_STEPS, protos=protos)
    eval_batches = _separable_batches(np.random.RandomState(99), 6,
                                      protos=protos)

    # --- torch trajectory
    ref.train()
    optimizer = torch.optim.AdamW(ref.parameters(), lr=CONV_LR,
                                  weight_decay=WD)
    lr_sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        optimizer, T_max=CONV_STEPS)
    criterion = torch.nn.CrossEntropyLoss()
    want_losses = []
    for b in batches:
        optimizer.zero_grad(set_to_none=True)
        logits, _, _ = ref(torch.from_numpy(b["video"].transpose(0, 4, 1, 2, 3)))
        loss = criterion(logits, torch.from_numpy(b["labels"]))
        loss.backward()
        optimizer.step()
        lr_sched.step()
        want_losses.append(float(loss.detach()))
    ref.eval()
    hits = tot = 0
    with torch.no_grad():
        for b in eval_batches:
            logits, _, _ = ref(
                torch.from_numpy(b["video"].transpose(0, 4, 1, 2, 3)))
            hits += int((logits.argmax(-1).numpy() == b["labels"]).sum())
            tot += len(b["labels"])
    acc_torch = hits / tot

    # --- our trajectory
    from gava_clip_tpu.models.vita_clip import trainable_mask
    from gava_clip_tpu.train.state import create_train_state, make_optimizer
    from gava_clip_tpu.train.step import LossConfig, make_train_step
    opt = make_optimizer(CONV_LR, CONV_STEPS, weight_decay=WD)
    state = create_train_state(params, trainable_mask(params, model.cfg), opt)
    step = make_train_step(model, LossConfig(num_classes=N_CLS), opt,
                           donate=False)
    got_losses = []
    for b in batches:
        state, metrics = step(state, jax.tree_util.tree_map(jnp.asarray, b))
        got_losses.append(float(metrics["total"]))
    from gava_clip_tpu.train.state import combine_params
    eval_params = combine_params(state.trainable, state.frozen)
    hits = tot = 0
    for b in eval_batches:
        out = model.apply(eval_params, model.buffers, jnp.asarray(b["video"]))
        hits += int((np.asarray(out["logits"]).argmax(-1) == b["labels"]).sum())
        tot += len(b["labels"])
    acc_ours = hits / tot

    want, got = np.asarray(want_losses), np.asarray(got_losses)
    # early steps: still numerically tight (divergence hasn't compounded)
    np.testing.assert_allclose(got[:10], want[:10], rtol=2e-2, atol=2e-2)
    # long horizon: smoothed curves track (fp32 nondeterminism across stacks
    # compounds chaotically per-step, so compare 10-step moving averages)
    kern = np.ones(10) / 10
    sw = np.convolve(want, kern, mode="valid")
    sg = np.convolve(got, kern, mode="valid")
    assert np.abs(sw - sg).max() < 0.25, np.abs(sw - sg).max()
    # both converge: final-window loss well below the initial loss
    assert sg[-1] < 0.35 * got[0] and sw[-1] < 0.35 * want[0], (sg[-1], sw[-1])
    # and reach the same accuracy on held-out separable data
    assert acc_torch >= 0.9 and acc_ours >= 0.9, (acc_torch, acc_ours)
    assert abs(acc_torch - acc_ours) <= 0.1, (acc_torch, acc_ours)


# ---------------------------------------------------------------------------
# long-horizon convergence on the FLAGSHIP loss composition (VERDICT r3 #6)
# ---------------------------------------------------------------------------

FLAG_STEPS = 100


def test_long_horizon_flagship_loss_matches_reference(ref_env,
                                                      reference_modules):
    """~100 AdamW+cosine steps with the full flagship composition —
    CE x focal-ordinal weights + memory CE + NTE diagonal
    (training/train.py:446-475 with focal_ordinal_loss, use_support_memory,
    add_nte all on) — torch reference loop vs our jitted step from
    converted-identical init: loss curves track and both reach the same
    train accuracy on separable synthetic data. Extends the plain-CE
    long-horizon test to the exact loss the production driver runs."""
    import torch
    ref, model, params = _build_models(ref_env, support_memory=True,
                                       add_nte=True)
    rs = np.random.RandomState(31)
    protos = rs.rand(N_CLS, 1, 8, 8, 3).astype(np.float32)
    batches = _separable_batches(rs, FLAG_STEPS, protos=protos)
    for i, b in enumerate(batches):  # memory/NTE side-channels
        b["memory"] = rs.randn(4, 6, 64).astype(np.float32) * 0.1
        b["mt_labels"] = np.array([0, 1, 2, i % N_CLS], np.int64)
        b["nte"] = rs.randn(len(b["labels"]), 70, 64).astype(np.float32) * 0.1
    eval_batches = _separable_batches(np.random.RandomState(77), 6,
                                      protos=protos)

    # --- torch trajectory (train.py:351-362,446-475)
    ref.train()
    optimizer = torch.optim.AdamW(ref.parameters(), lr=CONV_LR,
                                  weight_decay=WD)
    lr_sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        optimizer, T_max=FLAG_STEPS)
    criterion = torch.nn.CrossEntropyLoss(reduction="none")
    fo_criterion = reference_modules[
        "loss_utils"].categorical_ordinal_focal_weight(
        gamma=2.0, alpha=0.25, beta=0.2, scale=1.0)
    want_losses = []
    for b in batches:
        optimizer.zero_grad(set_to_none=True)
        logits, logits_mt, logits_vm = ref(
            torch.from_numpy(b["video"].transpose(0, 4, 1, 2, 3)),
            memory=torch.from_numpy(b["memory"]),
            video_nte=torch.from_numpy(b["nte"]))
        labels = torch.from_numpy(b["labels"])
        loss = criterion(logits, labels)
        loss = loss * fo_criterion(logits, labels)
        loss_tot = loss.mean()
        loss_tot = loss_tot + 0.1 * criterion(
            logits_mt, torch.from_numpy(b["mt_labels"])).mean()
        loss_tot = loss_tot - 0.05 * torch.diag(logits_vm).mean()
        loss_tot.backward()
        optimizer.step()
        lr_sched.step()
        want_losses.append(float(loss_tot.detach()))
    ref.eval()
    hits = tot = 0
    with torch.no_grad():
        for b in eval_batches:
            logits, _, _ = ref(
                torch.from_numpy(b["video"].transpose(0, 4, 1, 2, 3)))
            hits += int((logits.argmax(-1).numpy() == b["labels"]).sum())
            tot += len(b["labels"])
    acc_torch = hits / tot

    # --- our trajectory (the production LossConfig)
    from gava_clip_tpu.models.vita_clip import trainable_mask
    from gava_clip_tpu.train.state import (combine_params, create_train_state,
                                           make_optimizer)
    from gava_clip_tpu.train.step import LossConfig, make_train_step
    opt = make_optimizer(CONV_LR, FLAG_STEPS, weight_decay=WD)
    state = create_train_state(params, trainable_mask(params, model.cfg), opt)
    loss_cfg = LossConfig(num_classes=N_CLS, focal_ordinal=True, fo_beta=0.2,
                          use_support_memory=True, add_nte=True,
                          memory_loss_weight=0.1, vnte_loss_weight=0.05)
    step = make_train_step(model, loss_cfg, opt, donate=False)
    got_losses = []
    for b in batches:
        state, metrics = step(state, jax.tree_util.tree_map(jnp.asarray, b))
        got_losses.append(float(metrics["total"]))
    eval_params = combine_params(state.trainable, state.frozen)
    hits = tot = 0
    for b in eval_batches:
        out = model.apply(eval_params, model.buffers, jnp.asarray(b["video"]))
        hits += int((np.asarray(out["logits"]).argmax(-1) == b["labels"]).sum())
        tot += len(b["labels"])
    acc_ours = hits / tot

    want, got = np.asarray(want_losses), np.asarray(got_losses)
    np.testing.assert_allclose(got[:10], want[:10], rtol=2e-2, atol=2e-2)
    kern = np.ones(10) / 10
    sw = np.convolve(want, kern, mode="valid")
    sg = np.convolve(got, kern, mode="valid")
    assert np.abs(sw - sg).max() < 0.25, np.abs(sw - sg).max()
    # the CE term dominates and must collapse on separable data; the NTE
    # diagonal term is a bounded negative offset, so compare the drop in
    # totals rather than a fixed fraction of a near-zero endpoint
    assert (sw[0] - sw[-1]) > 0.5 and (sg[0] - sg[-1]) > 0.5, (sw[0], sw[-1],
                                                               sg[0], sg[-1])
    assert acc_torch >= 0.9 and acc_ours >= 0.9, (acc_torch, acc_ours)
    assert abs(acc_torch - acc_ours) <= 0.1, (acc_torch, acc_ours)
