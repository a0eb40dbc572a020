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
