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


def _save_npys(tmp_path, rs, specs):
    paths = []
    for name, n, d in specs:
        p = tmp_path / f"{name}.npy"
        np.save(p, rs.randn(n, d).astype(np.float32))
        paths.append((name, str(p)))
    return paths


def test_cone_plot(tmp_path):
    """Modality-cone scatter (reference visualize.py:67-113): two modality
    groups jointly PCA-projected; each keeps its own label."""
    from gava_clip_tpu.cli.visualize import main
    rs = np.random.RandomState(2)
    paths = _save_npys(tmp_path, rs, [("text", 20, 16), ("video", 30, 16)])
    out = main(["--cones"] + [f"{n}={p}" for n, p in paths]
               + ["--output_dir", str(tmp_path / "vis")])
    assert osp.isfile(out["cones"])
    assert out["points"].shape == (50, 3)
    assert out["labels"].count("text") == 20
    assert out["labels"].count("video") == 30


def test_pairwise_similarity_split(tmp_path):
    from gava_clip_tpu.cli.visualize import main, pairwise_similarity_split
    rs = np.random.RandomState(3)
    base = rs.randn(10, 16).astype(np.float32)
    sub = (base[:5] + 0.01 * rs.randn(5, 16)).astype(np.float32)
    bb, bs = pairwise_similarity_split(base, sub)
    assert bb.shape == (45,)                 # C(10,2) base pairs
    assert bs.shape == (10 * 5 + 10,)        # base->sub + C(5,2) sub pairs
    # near-duplicates of base rows: cross-similarity exceeds base-internal
    assert bs.max() > bb.max()

    base_p = tmp_path / "base.npy"
    np.save(base_p, base)
    sub_p = tmp_path / "sub.npy"
    np.save(sub_p, sub)
    out = main(["--pairwise", f"proj={sub_p}", "--base", str(base_p),
                "--output_dir", str(tmp_path / "vis")])
    assert osp.isfile(out["proj"]["png"])


def test_projected_nte_view(tmp_path):
    """--project_vlm: memory-bank embeds pass through the checkpoint's
    per-class memory_project MLPs before the 2D scatter (reference
    visualize_add.py:84-255)."""
    from gava_clip_tpu.cli.visualize import main
    rs = np.random.RandomState(5)
    E = 16
    bank = {"embeds": rs.randn(40, E).astype(np.float32),
            "updrs": np.concatenate([rs.randint(0, 3, 38), [-1, 3]])}
    with open(tmp_path / "bank.pkl", "wb") as f:
        pickle.dump(bank, f)
    vlm = {"params": {"memory_project": {
        "w1": rs.randn(3, E, 4).astype(np.float32),
        "b1": np.zeros((3, 4), np.float32),
        "w2": rs.randn(3, 4, 2).astype(np.float32),
        "b2": np.zeros((3, 2), np.float32)}}}
    with open(tmp_path / "vlm.ckpt", "wb") as f:
        pickle.dump(vlm, f)
    out = main(["--embeddings", str(tmp_path / "bank.pkl"),
                "--project_vlm", str(tmp_path / "vlm.ckpt"),
                "--output_dir", str(tmp_path / "vis")])
    assert osp.isfile(out["scatter"])


def test_number_words():
    from gava_clip_tpu.offline.embeddings import number_words
    w = number_words(132)
    assert w[0] == "one" and w[19] == "twenty"
    assert w[20] == "twenty-one"
    assert w[29] == "thirty"                 # reference bug fixed
    assert w[98] == "ninety-nine"
    assert w[99] == "one hundred"
    assert w[130] == "one hundred thirty-one"


def test_number_and_pe_studies(tmp_path, reference_modules):
    """Geometry probes against a tiny frozen text tower, via the CLI."""
    from gava_clip_tpu.cli.visualize import main
    from tests.test_cli_eval import _save_torch_backbone
    backbone, _ = _save_torch_backbone(tmp_path, reference_modules)
    common = ["--backbone_path", backbone, "--embed_dim", "32",
              "--text_width", "32", "--text_heads", "2", "--text_layers", "2",
              "--output_dir", str(tmp_path / "vis")]
    out = main(["--study", "number", "--study_n", "12"] + common)
    assert osp.isfile(out["numbers_similarity"])
    assert osp.isfile(out["distance_0_distance"])
    out_pe = main(["--study", "pe", "--study_n", "20"] + common)
    assert osp.isfile(out_pe["similarity"]) and osp.isfile(out_pe["distance"])
