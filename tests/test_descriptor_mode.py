"""KAPT descriptor mode: ragged per-class descriptor counts padded with a kv
mask; parity against the reference VitaCLIP in use_descriptor mode."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.models.prompts import PromptConfig, build_prompt_assets, load_knowledge
from gava_clip_tpu.models.text import TextConfig
from gava_clip_tpu.models.vision import VisionConfig
from gava_clip_tpu.models.vita_clip import VitaClip, VitaClipConfig
from gava_clip_tpu.utils.torch_convert import convert_vita_clip, merge_pytrees

jax.config.update("jax_default_matmul_precision", "highest")

N_CLS = 3


@pytest.fixture(scope="module")
def desc_env(tmp_path_factory, reference_modules):
    """Knowledge dir with RAGGED per-class descriptors (2/3/1)."""
    tmp = tmp_path_factory.mktemp("descmode")
    ke = tmp / "data" / "ke_updrs"
    ke.mkdir(parents=True)
    rs = np.random.RandomState(11)
    np.save(ke / "all.npy", rs.randn(N_CLS, 768).astype(np.float32))
    counts = [2, 3, 1]
    for c, n in enumerate(counts):
        with open(ke / f"descriptor_{c}.txt", "w") as f:
            for d in range(n):
                f.write(f"descriptor {d} of class {c} walking pattern\n")
        np.save(ke / f"descriptor_{c}.npy",
                rs.randn(n, 768).astype(np.float32))
    classes = tmp / "classes.txt"
    with open(classes, "w") as f:
        f.write("normal\nslight difficulty\nmoderate difficulty\n"
                "*normal\n*slight\n*moderate\n")
    return tmp, str(classes), counts


def test_ragged_knowledge_loading(desc_env):
    tmp, classes, counts = desc_env
    cfg = PromptConfig(n_cls=N_CLS, n_ctx=4, ctx_dim=64, emb_dim=16,
                       init="cntn_split_uni_disc", csc=True,
                       use_descriptor=True,
                       knowledge_dir=str(tmp / "data" / "ke_updrs"))
    cntn, disc = load_knowledge(cfg)
    assert [len(d) for d in disc] == counts
    assert [c.shape[0] for c in cntn] == counts


def test_descriptor_forward_parity(desc_env):
    import torch
    tmp, classes_path, counts = desc_env
    if "video_dataset" not in sys.modules:
        import types
        stub = types.ModuleType("video_dataset")
        stub.NUM_COMB = 70
        sys.modules["video_dataset"] = stub
    import importlib
    ref_mod = importlib.import_module("VitaCLIP_model")

    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        torch.manual_seed(31)
        ref = ref_mod.VitaCLIP(
            input_size=(32, 32), num_frames=2, cls_type="updrs",
            num_classes=N_CLS, feature_dim=48, patch_size=(16, 16),
            num_heads=4, num_layers=2, mlp_factor=2.0, embed_dim=64,
            use_summary_token=True, use_local_prompts=True,
            use_global_prompts=True, num_global_prompts=2,
            use_text_prompt_learning=True, text_transformer_width=64,
            text_transformer_heads=4, text_transformer_layers=2,
            text_num_prompts=4, text_prompt_init="cntn_split_uni_disc",
            text_prompt_CSC=True, text_prompt_classes_path=classes_path,
            knowledge_version=[], use_descriptor=True)
        with torch.no_grad():
            torch.nn.init.normal_(ref.textual.positional_embedding, std=0.01)
            torch.nn.init.normal_(ref.textual.text_projection, std=0.02)
            torch.nn.init.normal_(ref.prompt_learner.ctx, std=0.02)
            for c in range(N_CLS):
                proj = ref.prompt_learner.context_prompt_learner.projector[c]
                torch.nn.init.normal_(proj[0].weight, std=0.05)
                torch.nn.init.normal_(proj[2].weight, std=0.05)
        ref.eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        cfg = VitaClipConfig(
            vision=VisionConfig(input_size=(32, 32), num_frames=2,
                                feature_dim=48, patch_size=(16, 16), heads=4,
                                layers=2, mlp_factor=2.0, embed_dim=64,
                                use_summary_token=True, use_local_prompts=True,
                                use_global_prompts=True, num_global_prompts=2),
            text=TextConfig(embed_dim=64, width=64, heads=4, layers=2),
            num_classes=N_CLS, use_text_prompt_learning=True,
            prompt=PromptConfig(n_cls=N_CLS, n_ctx=4, ctx_dim=64, emb_dim=16,
                                init="cntn_split_uni_disc", csc=True,
                                use_descriptor=True,
                                knowledge_dir=str(tmp / "data" / "ke_updrs")))
        classnames = ["normal", "slight difficulty", "moderate difficulty"]
        model = VitaClip(cfg, classnames=classnames, backbone_state=sd)
        # kv mask reflects the ragged counts
        np.testing.assert_array_equal(
            model.prompt_assets.kv_mask.sum(-1), counts)

        converted = convert_vita_clip(sd, vision_layers=2, text_layers=2,
                                      num_classes=N_CLS,
                                      prompt_variant="class_uni")
        params = jax.tree_util.tree_map(
            jnp.asarray, merge_pytrees(model.params, converted))

        x = np.random.RandomState(5).randn(2, 2, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            want, _, _ = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
        out = model.apply(params, model.buffers, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out["logits"]), want.numpy(),
                                   rtol=1e-4, atol=3e-4)
    finally:
        os.chdir(cwd)
