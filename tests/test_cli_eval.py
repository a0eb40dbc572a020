"""End-to-end tests for the evaluate and zero-shot drivers."""

import argparse
import os
import os.path as osp
import pickle

import numpy as np
import pytest

from tests.test_cli_train import _make_assets, _make_dataset

TINY_ARGS = [
    "--nfold", "1", "--type", "updrs",
    "--num_steps", "2", "--eval_freq", "2", "--save_freq", "100",
    "--print_freq", "1", "--batch_size", "2", "--num_frames", "2",
    "--spatial_size", "32", "--patch_size", "16",
    "--num_layers", "2", "--num_heads", "2", "--feature_dim", "32",
    "--embed_dim", "32", "--mlp_factor", "2.0",
    "--text_transformer_width", "32", "--text_transformer_heads", "2",
    "--text_transformer_layers", "2", "--text_num_prompts", "2",
    "--use_text_prompt_learning", "--use_text_prompt_CSC",
    "--use_summary_token", "--use_local_prompts", "--use_global_prompts",
    "--num_global_prompts", "2",
    "--text_prompt_init", "cntn_split_uni_disc",
    "--knowledge_version", "v1",
    "--lr", "1e-3", "--num_workers", "2", "--no_mirror",
]


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from gava_clip_tpu.cli.train import main
    tmp = tmp_path_factory.mktemp("evalrun")
    _make_dataset(tmp)
    classes = _make_assets(tmp)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        main(TINY_ARGS + [
            "--data_root", str(tmp),
            "--text_prompt_classes_path", str(classes),
            "--knowledge_dir", str(tmp / "ke_updrs"),
            "--use_support_memory", "--memory_data_path", str(tmp / "mem.pkl"),
            "--mem_batch_size", "4", "--clLoss_nte_video",
        ])
        logdir = osp.join(str(tmp), "logs", os.listdir("logs")[0])
    finally:
        os.chdir(cwd)
    return tmp, classes, logdir


def test_evaluate_driver(trained_run, monkeypatch):
    from gava_clip_tpu.cli.evaluate import main as eval_main
    tmp, classes, logdir = trained_run
    monkeypatch.chdir(tmp)
    perf, conf = eval_main([
        "--checkpoint_dir", logdir,
        "--data_root", str(tmp),
        "--val_list_path", str(tmp / "val_updrs.csv"),
        "--text_prompt_classes_path", str(classes),
        "--batch_size", "2",
    ])
    assert len(perf) == 1 and 0.0 <= perf[0] <= 1.0
    assert conf.sum() == 4
    outs = [f for f in os.listdir(logdir) if f.startswith("eval_")]
    assert outs, "evaluation report not written"


def test_train_eval_only_mode(trained_run, monkeypatch):
    """`train.py --eval_only` (the reference eval_scripts path) evaluates the
    fold-best checkpoint of a finished run."""
    from gava_clip_tpu.cli.train import main as train_main
    tmp, classes, logdir = trained_run
    monkeypatch.chdir(tmp)
    perf, conf = train_main(TINY_ARGS + [
        "--eval_only",
        "--checkpoint_dir", osp.join(logdir, "fold_0"),
        "--data_root", str(tmp),
        "--val_list_path", str(tmp / "val_updrs.csv"),
        "--text_prompt_classes_path", str(classes),
        "--knowledge_dir", str(tmp / "ke_updrs"),
    ])
    assert len(perf) == 1 and 0.0 <= perf[0] <= 100.0
    assert conf.sum() == 4
    assert osp.isfile("./eval_output/updrs_eval.txt")


def test_iwa_driver(trained_run, monkeypatch):
    """IWA over two copies of the trained run (weights equal across models
    is fine for a pipeline smoke test)."""
    import shutil
    from gava_clip_tpu.cli.iwa import main as iwa_main
    tmp, classes, logdir = trained_run
    logdir2 = logdir + "_copy"
    if not osp.isdir(logdir2):
        shutil.copytree(logdir, logdir2)
    monkeypatch.chdir(tmp)
    perf, conf = iwa_main([
        "--model_dirs", logdir, logdir2,
        "--data_root", str(tmp),
        "--val_list_path", str(tmp / "val_updrs.csv"),
        "--text_prompt_classes_path", str(classes),
        "--batch_size", "2", "--type", "updrs",
    ])
    assert len(perf) == 1 and 0.0 <= perf[0] <= 1.0
    assert conf.sum() == 4


def test_analysis_driver(trained_run, monkeypatch):
    from gava_clip_tpu.cli.analysis import main as analysis_main
    tmp, classes, logdir = trained_run
    monkeypatch.chdir(tmp)
    per_desc = analysis_main([
        "--model_dir", logdir,
        "--data_root", str(tmp),
        "--val_list_path", str(tmp / "val_updrs.csv"),
        "--batch_size", "2",
        "--output_dir", str(tmp / "analysis_out"),
    ])
    assert set(per_desc.keys()) == {0, 1, 2}
    assert osp.isfile(tmp / "analysis_out" / "updrs_per_descriptor_precision.txt")


def _save_torch_backbone(tmp, reference_modules):
    """Create tiny reference-format clip_pretrained.pth and ckpt.pth files."""
    import torch
    torch.manual_seed(33)
    vis = reference_modules["VitaCLIP_vision_encoder"].CLIPVisionEncoder(
        input_size=(32, 32), num_frames=2, feature_dim=32, patch_size=(16, 16),
        num_heads=2, num_layers=2, mlp_factor=2.0, embed_dim=32,
        use_summary_token=True, use_local_prompts=True, use_global_prompts=True,
        num_global_prompts=8)
    txt = reference_modules["VitaCLIP_text_encoder"].CLIPTextEncoder(
        embed_dim=32, transformer_width=32, transformer_heads=2,
        transformer_layers=2)
    with torch.no_grad():
        torch.nn.init.normal_(txt.positional_embedding, std=0.01)
        torch.nn.init.normal_(txt.text_projection, std=0.02)
    flat = {}
    for k, v in vis.state_dict().items():
        flat[f"visual.{k}"] = v
    for k, v in txt.state_dict().items():
        flat[f"textual.{k}"] = v
    backbone = tmp / "clip_pretrained.pth"
    torch.save(flat, backbone)

    vlm = {"model": {f"module.visual.{k}": v for k, v in vis.state_dict().items()}}
    vlm["model"]["module.logit_scale"] = torch.tensor(np.log(1 / 0.07))
    vlm_path = tmp / "ckpt_vlm.pth"
    torch.save(vlm, vlm_path)
    return str(backbone), str(vlm_path)


def test_zero_shot_k400_shape(tmp_path, monkeypatch, reference_modules):
    """Zero-shot at the K400 eval shape (reference eval_scripts/k400_eval.sh):
    the SHIPPED classes/k400_classes.txt (no '*' lines -> CLS_NUM=0 quirk
    path, SURVEY.md §2.8-3), T=8 frames with time-embed interpolation from a
    T=2-trained backbone, TSN eval sampling."""
    import gava_clip_tpu
    from gava_clip_tpu.cli.zero_shot import main as zs_main
    from gava_clip_tpu.data.video import parse_classes_file

    repo_root = osp.dirname(osp.dirname(gava_clip_tpu.__file__))
    k400_classes = osp.join(repo_root, "classes", "k400_classes.txt")
    names, labels = parse_classes_file(k400_classes)
    assert len(labels) == 400 and labels == names  # CLS_NUM=0 fallback

    _make_dataset(tmp_path)
    backbone, vlm = _save_torch_backbone(tmp_path, reference_modules)
    monkeypatch.chdir(tmp_path)
    perf, conf = zs_main([
        "--type", "updrs",
        "--eval_data_root", str(tmp_path),
        "--eval_list_path", str(tmp_path / "val_updrs.csv"),
        "--text_prompt_classes_path", k400_classes,
        "--backbone_path", backbone,
        "--pretrained_vlm", vlm,
        "--batch_size", "2", "--num_frames", "8", "--spatial_size", "32",
        "--num_layers", "2", "--num_heads", "2", "--feature_dim", "32",
        "--embed_dim", "32", "--mlp_factor", "2.0",
        "--text_transformer_width", "32", "--text_transformer_heads", "2",
        "--text_transformer_layers", "2",
        "--num_temporal_views", "1", "--num_workers", "2",
        "--sampling_rate", "-1",  # TSN sampling, k400 eval convention
    ])
    assert 0.0 <= perf <= 1.0
    assert conf.shape == (400, 400) and conf.sum() == 4
    assert osp.isfile("./eval_output/class_name.txt")


def test_train_eval_only_k400_shape(tmp_path, monkeypatch, reference_modules):
    """scripts/k400_eval.sh path: train.py --eval_only with a torch visual
    checkpoint, the shipped 400-class no-'*' list, and batch_split > 1
    (reference eval_scripts/k400_eval.sh)."""
    import gava_clip_tpu
    from gava_clip_tpu.cli.train import main as train_main
    repo_root = osp.dirname(osp.dirname(gava_clip_tpu.__file__))
    k400_classes = osp.join(repo_root, "classes", "k400_classes.txt")
    _make_dataset(tmp_path)
    backbone, vlm = _save_torch_backbone(tmp_path, reference_modules)
    monkeypatch.chdir(tmp_path)
    perf, conf = train_main([
        "--eval_only", "--nfold", "1",
        "--checkpoint_path", vlm,
        "--val_data_root", str(tmp_path),
        "--val_list_path", str(tmp_path / "val_updrs.csv"),
        "--text_prompt_classes_path", k400_classes,
        "--batch_size", "4", "--batch_split", "2", "--num_frames", "2",
        "--spatial_size", "32", "--patch_size", "16",
        "--num_layers", "2", "--num_heads", "2", "--feature_dim", "32",
        "--embed_dim", "32", "--mlp_factor", "2.0",
        "--text_transformer_width", "32", "--text_transformer_heads", "2",
        "--text_transformer_layers", "2",
        "--use_text_prompt_learning", "--text_num_prompts", "2",
        "--use_text_prompt_CSC",
        "--use_summary_token", "--use_local_prompts", "--use_global_prompts",
        "--num_global_prompts", "8",
        "--num_workers", "2", "--no_mirror",
    ])
    assert len(perf) == 1
    assert conf.shape == (400, 400) and conf.sum() == 4
    # reference k400_eval.sh passes no --type, so the report
    # lands under the default type tag
    assert osp.isfile("./eval_output/diag_eval.txt")


def test_zero_shot_driver(tmp_path, monkeypatch, reference_modules):
    from gava_clip_tpu.cli.zero_shot import main as zs_main
    _make_dataset(tmp_path)
    classes = _make_assets(tmp_path)
    backbone, vlm = _save_torch_backbone(tmp_path, reference_modules)

    # knowledge file layout expected by zero_shot: <info_dir>/ke_<type>/
    ke = tmp_path / "data" / "ke_updrs"
    ke.mkdir(parents=True)
    with open(ke / "simQdesc_v1.txt", "w") as f:
        f.write("normal gait\nslightly impaired\nmoderately impaired\n")

    monkeypatch.chdir(tmp_path)
    perf, conf = zs_main([
        "--type", "updrs",
        "--eval_data_root", str(tmp_path),
        "--eval_list_path", str(tmp_path / "val_updrs.csv"),
        "--text_prompt_classes_path", str(classes),
        "--backbone_path", backbone,
        "--pretrained_vlm", vlm,
        "--batch_size", "2", "--num_frames", "2", "--spatial_size", "32",
        "--num_layers", "2", "--num_heads", "2", "--feature_dim", "32",
        "--embed_dim", "32", "--mlp_factor", "2.0",
        "--text_transformer_width", "32", "--text_transformer_heads", "2",
        "--text_transformer_layers", "2",
        "--use_discrete_prompt", "--info_dir", str(tmp_path / "data"),
        "--knowledge_version_single", "v1",
        "--num_temporal_views", "1", "--num_workers", "2",
    ])
    assert 0.0 <= perf <= 1.0
    assert conf.sum() == 4
    assert osp.isfile(tmp_path / "data" / "ke_updrs" / "text_features_v1.npy")
    assert osp.isfile("./eval_output/disc_v1.txt")


def test_evaluate_driver_quantized(trained_run, monkeypatch):
    """--quantize_eval w8a8 runs the int8 inference path in the standalone
    evaluator (XLA composition on CPU) and agrees with the fp run."""
    from gava_clip_tpu.cli.evaluate import main as eval_main
    tmp, classes, logdir = trained_run
    monkeypatch.chdir(tmp)
    common = [
        "--checkpoint_dir", logdir,
        "--data_root", str(tmp),
        "--val_list_path", str(tmp / "val_updrs.csv"),
        "--text_prompt_classes_path", str(classes),
        "--batch_size", "2",
    ]
    perf_fp, conf_fp = eval_main(common)
    perf_q, conf_q = eval_main(common + ["--quantize_eval", "w8a8"])
    assert len(perf_q) == 1 and 0.0 <= perf_q[0] <= 1.0
    assert conf_q.sum() == conf_fp.sum() == 4
    # int8 at these magnitudes must not flip the tiny-model predictions
    assert (conf_q == conf_fp).all()
