"""Visualization CLI smoke test."""

import os.path as osp
import pickle

import numpy as np


def test_visualize_pca_and_heatmap(tmp_path):
    from gava_clip_tpu.cli.visualize import main
    rs = np.random.RandomState(0)
    bank = {"embeds": rs.randn(50, 4, 16).astype(np.float32),
            "updrs": rs.randint(0, 3, 50)}
    p = tmp_path / "bank.pkl"
    with open(p, "wb") as f:
        pickle.dump(bank, f)
    out = main(["--embeddings", str(p), "--method", "pca", "--heatmap",
                "--output_dir", str(tmp_path / "vis")])
    assert osp.isfile(out["scatter"]) and osp.isfile(out["heatmap"])


def test_visualize_npy(tmp_path):
    from gava_clip_tpu.cli.visualize import main
    feats = np.random.RandomState(1).randn(30, 8).astype(np.float32)
    p = tmp_path / "f.npy"
    np.save(p, feats)
    out = main(["--embeddings", str(p), "--output_dir", str(tmp_path / "vis")])
    assert osp.isfile(out["scatter"])
