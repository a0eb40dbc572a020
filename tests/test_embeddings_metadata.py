"""Slerp metadata variant + embedding preparation tools."""

import json
import os.path as osp
import pickle

import numpy as np
import pytest

import jax

from gava_clip_tpu.models.text import TextConfig, init_text_params
from gava_clip_tpu.offline.metadata import (build_slerp_metadata, make_pe,
                                            slerp)
from gava_clip_tpu.offline.embeddings import (encode_text_file, encode_texts,
                                              extract_class_text_features)


@pytest.fixture(scope="module")
def tiny_text():
    cfg = TextConfig(embed_dim=32, width=32, heads=2, layers=2)
    return init_text_params(jax.random.PRNGKey(0), cfg), cfg


def test_slerp_endpoints_and_midpoint():
    rs = np.random.RandomState(0)
    v0, v1 = rs.randn(8), rs.randn(8)
    np.testing.assert_allclose(slerp(v0, v1, 0.0)[0], v0, atol=1e-9)
    np.testing.assert_allclose(slerp(v0, v1, 1.0)[0], v1, atol=1e-9)
    # for unit inputs the midpoint is angularly equidistant and unit-norm
    n0 = v0 / np.linalg.norm(v0)
    n1 = v1 / np.linalg.norm(v1)
    mid = slerp(n0, n1, 0.5)[0]
    np.testing.assert_allclose(np.linalg.norm(mid), 1.0, atol=1e-9)
    np.testing.assert_allclose(mid @ n0, mid @ n1, atol=1e-9)


def test_make_pe_norm():
    pe = make_pe(100, 64, l2_norm=2.0)
    np.testing.assert_allclose(np.linalg.norm(pe, axis=-1), 2.0, atol=1e-9)


def test_build_slerp_metadata(tmp_path, tiny_text):
    params, cfg = tiny_text
    part1 = {"vidname": ["a", "b", "c"], "updrs": [0, 1, 2],
             "diag": [1, 0, 1], "leglength": [0.9, 1.0, 1.1],
             "walking speed": [1.0, 1.2, 0.8],
             "step time": [0.5, 0.6, 0.55]}
    paths = build_slerp_metadata(part1, params, cfg,
                                 save_dir=str(tmp_path))
    with open(paths["data"], "rb") as f:
        out = pickle.load(f)
    assert out["embeds"].shape == (6, 32)   # 2 params x 3 rows
    assert out["tokens"].shape == (6, 77)
    assert (out["tokens"] >= 49408).sum() == 6
    with open(paths["updrs"], "rb") as f:
        grouped = pickle.load(f)
    assert set(grouped.keys()) <= {0, 1, 2}


def _full_metadata():
    rs = np.random.RandomState(4)
    return {
        "updrs": [0, 1, 2, -1],
        "diag": [1, 0, 1, 2],
        "left leg length": [0.9, 1.0, 1.1, 0.95],
        "right leg length": [0.92, 1.01, 1.08, 0.97],
        "left step distance is short": rs.rand(4).tolist(),
        "walking pace is slow": rs.rand(4).tolist(),
        "stance percentage is minor": rs.rand(4).tolist(),
    }


def test_normalize_by_leg_length():
    from gava_clip_tpu.offline.metadata import normalize_by_leg_length
    legs = np.array([[1.0, 2.0], [2.0, 2.0]])
    params = {"left step distance is short": np.array([3.0, 4.0]),
              "distance difference is short": np.array([5.0, 6.0]),
              "walking pace is slow": np.array([7.0, 8.0])}
    out = normalize_by_leg_length(params, legs)
    np.testing.assert_allclose(out["left step distance is short"], [3.0, 2.0])
    # 'difference' and non-distance params untouched
    np.testing.assert_allclose(out["distance difference is short"], [5.0, 6.0])
    np.testing.assert_allclose(out["walking pace is slow"], [7.0, 8.0])


def test_build_metadata_dicts_full(tmp_path, tiny_text):
    """Full pairwise pipeline (reference metadata.py:98-378): antonym
    endpoints, pairwise slerp, extended-vocab tokens, embed_dict, label
    dicts with updrs -1 dropped."""
    from gava_clip_tpu.offline.metadata import build_metadata_dicts
    params, cfg = tiny_text
    paths = build_metadata_dicts(_full_metadata(), params, cfg,
                                 save_dir=str(tmp_path))
    with open(paths["data"], "rb") as f:
        out = pickle.load(f)
    # 3 params -> 6 unordered pairs x 4 rows
    assert out["embeds"].shape == (24, 32)
    assert out["tokens"].shape == (24, 77)
    # single-param rows carry 1 number token, pair rows 2
    n_num = (out["tokens"] >= 49408).sum(axis=1)
    assert set(n_num.tolist()) == {1, 2}
    with open(paths["embed"], "rb") as f:
        emb_dict = pickle.load(f)
    assert set(emb_dict["key_embed"]) == {
        "left step distance is short", "walking pace is slow",
        "stance percentage is minor"}
    with open(paths["updrs"], "rb") as f:
        updrs_dict = pickle.load(f)
    assert set(updrs_dict) == {0, 1, 2}          # -1 dropped
    assert sum(v.shape[0] for v in updrs_dict.values()) == 18  # 3 rows x 6
    with open(paths["diag"], "rb") as f:
        diag_dict = pickle.load(f)
    assert sum(v.shape[0] for v in diag_dict.values()) == 24


def test_metadata_cli(tmp_path, reference_modules):
    """CLI round-trip from .pkl and .csv column tables against a tiny
    torch backbone (xlsx needs openpyxl which this image lacks; csv/pkl
    are the supported carriers)."""
    from gava_clip_tpu.offline.metadata import main
    from tests.test_cli_eval import _save_torch_backbone
    backbone, _ = _save_torch_backbone(tmp_path, reference_modules)
    md = _full_metadata()
    with open(tmp_path / "meta.pkl", "wb") as f:
        pickle.dump(md, f)
    common = ["--backbone_path", backbone, "--embed_dim", "32",
              "--text_width", "32", "--text_heads", "2",
              "--text_layers", "2", "--save_dir", str(tmp_path / "out")]
    paths = main(["--metadata_file", str(tmp_path / "meta.pkl")] + common)
    with open(paths["data"], "rb") as f:
        out = pickle.load(f)
    assert out["embeds"].shape == (24, 32)

    import pandas as pd
    pd.DataFrame(md).to_csv(tmp_path / "meta.csv", index=False)
    paths2 = main(["--metadata_file", str(tmp_path / "meta.csv"),
                   "--keep_length", "--no_dict_from_data"] + common)
    assert paths2["data"].endswith("data_dict_raw.pkl")
    assert "updrs" not in paths2


def test_encode_text_file(tmp_path, tiny_text):
    params, cfg = tiny_text
    p = tmp_path / "desc.txt"
    with open(p, "w") as f:
        f.write("normal gait\nslow walking\nshuffling steps\n")
    out = encode_text_file(str(p), params, cfg)
    feats = np.load(out)
    assert feats.shape == (3, 32)

    j = tmp_path / "desc.json"
    with open(j, "w") as f:
        json.dump(["a walk", "a run"], f)
    out = encode_text_file(str(j), params, cfg)
    assert np.load(out).shape == (2, 32)


def test_extract_class_text_features(tmp_path):
    from tests.test_train_step import _tiny_model
    model = _tiny_model(tmp_path, support_memory=False, add_nte=False)
    tf = extract_class_text_features(model, model.params)
    assert tf.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(tf, axis=-1), 1.0, atol=1e-5)
