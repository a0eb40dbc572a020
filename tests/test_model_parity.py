"""Full-model logit parity: our VitaClip vs the PyTorch reference VitaCLIP,
covering the flagship configuration (KAPT split_uni prompts + summary/local/
global vision prompts + support memory + NTE)."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.models.prompts import PromptConfig
from gava_clip_tpu.models.text import TextConfig
from gava_clip_tpu.models.vision import VisionConfig
from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig, trainable_mask
from gava_clip_tpu.utils.torch_convert import convert_vita_clip, merge_pytrees

jax.config.update("jax_default_matmul_precision", "highest")

N_CLS = 3
KV = ("v1", "v2")


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory, reference_modules):
    """Prepare knowledge/classes assets + import the reference VitaCLIP."""
    import torch
    tmp = tmp_path_factory.mktemp("refmodel")
    ke = tmp / "data" / "ke_updrs"
    ke.mkdir(parents=True)
    rs = np.random.RandomState(7)
    np.save(ke / "EntityEmb_v0.npy", rs.randn(N_CLS, 768).astype(np.float32))
    for kv in KV:
        np.save(ke / f"EntityEmb_{kv}.npy", rs.randn(N_CLS, 768).astype(np.float32))
        with open(ke / f"simQdesc_{kv}.txt", "w") as f:
            for c in range(N_CLS):
                f.write(f"gait description {kv} for class {c} with steps\n")
    classes = tmp / "classes.txt"
    with open(classes, "w") as f:
        f.write("normal\nslight difficulty\nmoderate difficulty\n")
        f.write("*normal\n*slight\n*moderate\n")

    if "video_dataset" not in sys.modules:
        stub = types.ModuleType("video_dataset")
        stub.NUM_COMB = 70
        sys.modules["video_dataset"] = stub
    import importlib
    ref_mod = importlib.import_module("VitaCLIP_model")

    cwd = os.getcwd()
    os.chdir(tmp)
    yield ref_mod, tmp, str(classes)
    os.chdir(cwd)


def _build_models(ref_env, *, support_memory=True, add_nte=True):
    import torch
    ref_mod, tmp, classes_path = ref_env
    torch.manual_seed(21)
    ref = ref_mod.VitaCLIP(
        input_size=(32, 32), num_frames=4, cls_type="updrs", num_classes=N_CLS,
        feature_dim=48, patch_size=(16, 16), num_heads=4, num_layers=2,
        mlp_factor=2.0, embed_dim=64,
        use_summary_token=True, use_local_prompts=True, use_global_prompts=True,
        num_global_prompts=3,
        use_text_prompt_learning=True, text_context_length=77,
        text_vocab_size=49408, text_transformer_width=64,
        text_transformer_heads=4, text_transformer_layers=2,
        text_num_prompts=4, text_prompt_pos="end",
        text_prompt_init="cntn_split_uni_disc", text_prompt_CSC=True,
        text_prompt_classes_path=classes_path,
        knowledge_version=list(KV), use_descriptor=False, token_wise_mlp=False,
        use_support_memory=support_memory, detach_features=False,
        memory_batch_size=8, add_nte=add_nte, use_sigmoid_loss=False,
    )
    # torch.empty-initialized buffers + zero-init learnables: fill with
    # random values so the test exercises the KAPT/ctx math.
    with torch.no_grad():
        torch.nn.init.normal_(ref.textual.positional_embedding, std=0.01)
        torch.nn.init.normal_(ref.textual.text_projection, std=0.02)
        torch.nn.init.normal_(ref.prompt_learner.ctx, std=0.02)
        for c in range(N_CLS):
            proj = ref.prompt_learner.context_prompt_learner.projector[c]
            torch.nn.init.normal_(proj[0].weight, std=0.05)
            torch.nn.init.normal_(proj[2].weight, std=0.05)
    ref.eval()

    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}

    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=4, feature_dim=48,
                            patch_size=(16, 16), heads=4, layers=2,
                            mlp_factor=2.0, embed_dim=64,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=3),
        text=TextConfig(embed_dim=64, width=64, heads=4, layers=2),
        num_classes=N_CLS, cls_type="updrs",
        use_text_prompt_learning=True,
        prompt=PromptConfig(n_cls=N_CLS, n_ctx=4, ctx_dim=64, emb_dim=16,
                            init="cntn_split_uni_disc", csc=True,
                            cls_type="updrs", knowledge_versions=KV,
                            knowledge_dir=str(tmp / "data" / "ke_updrs")),
        use_support_memory=support_memory, add_nte=add_nte,
    )
    classnames = ["normal", "slight difficulty", "moderate difficulty"]
    model = VitaClip(cfg, classnames=classnames, backbone_state=sd)
    converted = convert_vita_clip(sd, vision_layers=2, text_layers=2,
                                  num_classes=N_CLS, prompt_variant="class_uni")
    params = jax.tree_util.tree_map(
        jnp.asarray, merge_pytrees(model.params, converted))
    return ref, model, params


def test_tokenized_prompts_match(ref_env):
    ref, model, _ = _build_models(ref_env)
    for c in range(N_CLS):
        want = ref.prompt_learner.tokenized_prompts[c].numpy()
        got = model.prompt_assets.tokenized[c]
        np.testing.assert_array_equal(got[:want.shape[0]], want)


def test_train_forward_parity(ref_env):
    import torch
    ref, model, params = _build_models(ref_env)
    rs = np.random.RandomState(3)
    x = rs.randn(2, 4, 32, 32, 3).astype(np.float32)
    memory = rs.randn(5, 6, 64).astype(np.float32)
    nte = rs.randn(2, 70, 64).astype(np.float32)

    with torch.no_grad():
        want_logits, want_mt, want_vm = ref(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3)),
            memory=torch.from_numpy(memory),
            video_nte=torch.from_numpy(nte))
        want_tf = ref.text_features.numpy()

    out = model.apply(params, model.buffers, jnp.asarray(x),
                      memory=jnp.asarray(memory), video_nte=jnp.asarray(nte))
    np.testing.assert_allclose(np.asarray(out["logits"]), want_logits.numpy(),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["text_features"]), want_tf, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["logits_mt"]), want_mt.numpy(),
                               rtol=1e-4, atol=2e-3)
    got_vm = np.asarray(out["logits_vm"])
    want_vm = want_vm.numpy()
    np.testing.assert_allclose(got_vm, want_vm, rtol=1e-4, atol=2e-3)

    # an all-zero NTE (missing .npy) must stay finite in our framework —
    # the reference would NaN on the 0/0 norm; we mask it instead.
    nte0 = nte.copy()
    nte0[1] = 0.0
    out0 = model.apply(params, model.buffers, jnp.asarray(x),
                       memory=jnp.asarray(memory), video_nte=jnp.asarray(nte0))
    assert np.isfinite(np.asarray(out0["logits_vm"])).all()


def test_gradient_parity(ref_env):
    """d(sum logits)/d(params) matches torch autograd for representative
    trainable leaves (prompt ctx, KAPT projector, local/global prompts,
    time_embed, logit_scale)."""
    import torch
    ref, model, params = _build_models(ref_env, support_memory=False,
                                       add_nte=False)
    rs = np.random.RandomState(13)
    x = rs.randn(2, 4, 32, 32, 3).astype(np.float32)

    ref.train()
    for p in ref.parameters():
        if p.grad is not None:
            p.grad = None
    logits, _, _ = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    logits.sum().backward()

    def loss_fn(p):
        out = model.apply(p, model.buffers, jnp.asarray(x))
        return out["logits"].sum()

    grads = jax.grad(loss_fn)(params)

    pairs = [
        (ref.prompt_learner.ctx.grad, grads["prompt"]["ctx"]),
        (ref.prompt_learner.context_prompt_learner.projector[1][0].weight.grad.T,
         grads["prompt"]["projector"]["w1"][1]),
        (ref.visual.time_embed.grad, grads["visual"]["time_embed"]),
        (ref.visual.global_prompts.grad, grads["visual"]["global_prompts"]),
        (ref.visual.blocks[0].local_prompts.grad,
         jax.tree_util.tree_map(lambda a: a[0],
                                grads["visual"]["blocks"]["local_prompts"])),
        (ref.logit_scale.grad, grads["logit_scale"]),
    ]
    for want, got in pairs:
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=2e-3, atol=2e-3)


def test_zero_shot_forward_parity(ref_env, tmp_path):
    import torch
    ref_mod, tmp, classes_path = ref_env
    torch.manual_seed(22)
    tf = np.random.RandomState(5).randn(N_CLS, 64).astype(np.float32)
    tf_path = tmp_path / "tf.pth"
    torch.save({"text_features": torch.from_numpy(tf)}, tf_path)

    ref = ref_mod.VitaCLIP(
        input_size=(32, 32), num_frames=4, num_classes=N_CLS,
        feature_dim=48, patch_size=(16, 16), num_heads=4, num_layers=2,
        mlp_factor=2.0, embed_dim=64,
        use_summary_token=True, use_local_prompts=True, use_global_prompts=True,
        num_global_prompts=3, use_text_prompt_learning=False,
        zeroshot_evaluation=True, zeroshot_text_features_path=str(tf_path))
    ref.eval()
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}

    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=4, feature_dim=48,
                            patch_size=(16, 16), heads=4, layers=2,
                            mlp_factor=2.0, embed_dim=64,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=3),
        text=TextConfig(embed_dim=64, width=64, heads=4, layers=2),
        num_classes=N_CLS, zeroshot_evaluation=True)
    model = VitaClip(cfg, backbone_state=sd, zeroshot_text_features=tf)
    converted = convert_vita_clip(sd, vision_layers=2, text_layers=2,
                                  num_classes=N_CLS)
    params = jax.tree_util.tree_map(
        jnp.asarray, merge_pytrees(model.params, converted))

    x = np.random.RandomState(9).randn(2, 4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want, _, _ = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    out = model.apply(params, model.buffers, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out["logits"]), want.numpy(), atol=3e-4)


def test_trainable_mask_matches_reference_freezing(ref_env):
    ref, model, params = _build_models(ref_env)
    mask = trainable_mask(params, model.cfg)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    by_name = {"/".join(str(getattr(p, "key", p)) for p in path): v
               for path, v in flat}
    # spot checks mirroring reference requires_grad settings
    assert by_name["visual/time_embed"] is True
    assert by_name["visual/blocks/local_prompts"] is True
    assert by_name["visual/global_prompts"] is True
    assert by_name["visual/blocks/summary_attn/q/kernel"] is True
    assert by_name["visual/blocks/cls_proj/kernel"] is False      # frozen!
    assert by_name["visual/patch_embed/kernel"] is False
    assert by_name["textual/token_embedding"] is False
    assert by_name["prompt/ctx"] is True
    assert by_name["prompt/projector/w1"] is True
    assert by_name["memory_project/w1"] is True
    assert by_name["logit_scale"] is True

    # count trainable torch params and compare totals
    import numpy as _np
    want_count = sum(p.numel() for p in ref.parameters() if p.requires_grad)
    leaves_mask = jax.tree_util.tree_leaves(mask)
    leaves_p = jax.tree_util.tree_leaves(params)
    got_count = sum(int(_np.prod(l.shape)) for l, m in zip(leaves_p, leaves_mask) if m)
    assert got_count == want_count
