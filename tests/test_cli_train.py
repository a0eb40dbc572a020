"""End-to-end smoke test of the training driver on synthetic data:
full flagship feature set (KAPT + memory + NTE + focal-ordinal) at tiny
dimensions, 4 steps, eval + best-checkpoint + reports."""

import os
import pickle

import numpy as np
import pytest


def _make_dataset(root):
    import cv2
    rs = np.random.RandomState(0)
    for name in ("a", "b", "c", "d"):
        w = cv2.VideoWriter(str(root / f"{name}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 10, (40, 40))
        for _ in range(6):
            w.write(rs.randint(0, 255, (40, 40, 3), dtype=np.uint8))
        w.release()
    lines = "a.mp4,0\nb.mp4,1\nc.mp4,2\nd.mp4,1\n"
    for split in ("train", "val"):
        with open(root / f"{split}_updrs.csv", "w") as f:
            f.write(lines)


def _make_assets(root):
    ke = root / "ke_updrs"
    ke.mkdir()
    rs = np.random.RandomState(1)
    np.save(ke / "EntityEmb_v1.npy", rs.randn(3, 768).astype(np.float32))
    with open(ke / "simQdesc_v1.txt", "w") as f:
        f.write("normal gait\nslightly impaired gait\nmoderately impaired gait\n")
    classes = root / "classes.txt"
    with open(classes, "w") as f:
        f.write("normal\nslight difficulty\nmoderate difficulty\n"
                "*normal\n*slight\n*moderate\n")
    mem = {"embeds": rs.randn(12, 3, 32).astype(np.float32),
           "updrs": np.array([0, 1, 2] * 4)}
    with open(root / "mem.pkl", "wb") as f:
        pickle.dump(mem, f)
    return classes


def test_train_driver_end_to_end(tmp_path, monkeypatch):
    from gava_clip_tpu.cli.train import main
    _make_dataset(tmp_path)
    classes = _make_assets(tmp_path)
    monkeypatch.chdir(tmp_path)

    argv = [
        "--nfold", "1", "--type", "updrs",
        "--data_root", str(tmp_path),
        "--text_prompt_classes_path", str(classes),
        "--num_steps", "4", "--eval_freq", "4", "--save_freq", "100",
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
        "--knowledge_dir", str(tmp_path / "ke_updrs"),
        "--use_support_memory", "--memory_data_path", str(tmp_path / "mem.pkl"),
        "--mem_batch_size", "4", "--clLoss_nte_video",
        "--use_focal_ordinal_loss", "--lr", "1e-3", "--num_workers", "2",
        "--no_mirror",
    ]
    main(argv)

    logdirs = [d for d in os.listdir("logs")]
    assert len(logdirs) == 1
    logdir = os.path.join("logs", logdirs[0])
    files = set(os.listdir(logdir))
    assert "config.yaml" in files
    assert "results.txt" in files
    assert "confusion_matrix_fold-0.txt" in files
    fold_files = os.listdir(os.path.join(logdir, "fold_0"))
    assert any(f.startswith("fold-0-best") for f in fold_files)
    assert "metrics.jsonl" in fold_files
    import json
    with open(os.path.join(logdir, "fold_0", "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert any("loss" in r for r in records)
    assert any("eval_macro_f1" in r for r in records)

    with open(os.path.join(logdir, "results.txt")) as f:
        txt = f.read()
    assert "Average F1-score" in txt and "Min-Max difference" in txt

    # resume path: checkpoint reload restores step + params
    from gava_clip_tpu.train.checkpoint import load_checkpoint
    best = [f for f in fold_files if f.startswith("fold-0-best")][0]
    ckpt = load_checkpoint(os.path.join(logdir, "fold_0", best))
    assert ckpt["next_step"] == 4
    assert ckpt["text_features"].shape == (3, 32)
    assert "params" in ckpt and "opt_state" in ckpt
