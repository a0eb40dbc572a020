"""Offline L0 pipeline: gait parameters from synthetic walking skeletons, and
the NTE/memory-bank generator feeding the training-side datasets."""

import math
import os.path as osp
import pickle

import numpy as np
import pytest

from gava_clip_tpu.offline.gait_params import (compute_gait_parameters,
                                               process_skeletons,
                                               save_metadata, GAIT_PARAM_NAMES)
from gava_clip_tpu.offline.preprocess import (PreprocessConfig,
                                              data_preprocess,
                                              enumerate_combinations,
                                              sinusoidal_pe,
                                              orthogonal_num_embedding)


def synthetic_walk(n_frames=240, fps=30, step_freq=1.8, speed=1.2, seed=0):
    """A y-up walking skeleton: pelvis advances in x, feet alternate."""
    rs = np.random.RandomState(seed)
    t = np.arange(n_frames) / fps
    joints = np.zeros((n_frames, 24, 3))
    phase = 2 * np.pi * step_freq * t
    x = speed * t
    joints[:, 0] = np.stack([x, 0.9 + 0.02 * np.sin(2 * phase), np.zeros_like(t)], 1)
    joints[:, 1] = joints[:, 0] + [0, 0, 0.1]    # lhip
    joints[:, 2] = joints[:, 0] + [0, 0, -0.1]   # rhip
    # feet: vertical oscillation with L/R antiphase, forward progression
    joints[:, 10] = np.stack([x + 0.3 * np.sin(phase),
                              0.05 + 0.05 * np.maximum(np.sin(phase), 0),
                              0.1 * np.ones_like(t)], 1)
    joints[:, 11] = np.stack([x - 0.3 * np.sin(phase),
                              0.05 + 0.05 * np.maximum(-np.sin(phase), 0),
                              -0.1 * np.ones_like(t)], 1)
    joints += rs.randn(*joints.shape) * 1e-3
    return joints


def test_gait_parameters_plausible():
    res = compute_gait_parameters(synthetic_walk())
    p = res.params
    assert 0.5 < res.leglength < 1.5
    # stride frequency 1.8 Hz -> two steps/cycle -> ~0.28s step time
    assert 0.2 < p["meansteptime"] < 0.9
    assert 60 < p["cadence"] < 250
    assert p["meanstepwidth"] > 0
    assert np.isfinite(p["mean_minMOS"]) and p["mean_minMOS"] >= 0
    for k in GAIT_PARAM_NAMES:
        assert k in p


def test_process_skeletons_and_save(tmp_path):
    sk = {f"SUB0{i}_walk": {"joints3D": synthetic_walk(seed=i),
                            "gait_score": i % 3, "diag": i % 2}
          for i in range(4)}
    result = process_skeletons(sk)
    assert len(result["vidname"]) == 4
    path = save_metadata(result, str(tmp_path / "tulip_basic_gparams.xlsx"))
    assert osp.isfile(path)


def test_enumerate_combinations():
    combos = enumerate_combinations(8)
    assert len(combos) == 70  # NUM_COMB
    assert all(len(set(c.tolist())) == 4 for c in combos)
    keys = {frozenset(c.tolist()) for c in combos}
    assert len(keys) == 70


def test_num_embedding_orthogonal_to_pe():
    pe = sinusoidal_pe(1000, 64)
    ne = orthogonal_num_embedding(pe)
    dots = pe[:63] @ ne
    assert np.abs(dots).max() < 1e-8
    assert abs(np.linalg.norm(ne) - 1) < 1e-9


@pytest.fixture(scope="module")
def tiny_text():
    import jax
    from gava_clip_tpu.models.text import TextConfig, init_text_params
    cfg = TextConfig(embed_dim=32, width=32, heads=2, layers=2)
    params = init_text_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_preprocess_end_to_end(tmp_path, tiny_text):
    params, tcfg = tiny_text
    n_vid = 5
    rs = np.random.RandomState(0)
    part1 = {"vidname": [f"vid{i}" for i in range(n_vid)],
             "updrs": [0, 1, 2, 1, 0], "diag": [0, 1, 1, 0, 1],
             "leglength": list(0.9 + 0.1 * rs.rand(n_vid))}
    names = ["walking speed", "mean step time", "step width", "cadence",
             "step time asymmetry", "step width variability",
             "margin of stability", "step time variability"]
    for n in names:
        part1[n] = list(rs.rand(n_vid) + 0.5)
    units = {n: "unit" for n in names}
    meta = tmp_path / "tulip_basic_gparams.pkl"
    with open(meta, "wb") as f:
        pickle.dump({"part1": part1, "unit": units}, f)

    out = data_preprocess(str(meta), params, tcfg,
                          save_dir=str(tmp_path / "gait"),
                          video_dir=str(tmp_path / "videos"),
                          cfg=PreprocessConfig(d_model=32))

    with open(out["data"], "rb") as f:
        bank = pickle.load(f)
    assert bank["embeds"].shape == (70 * n_vid, 4, 32)
    assert bank["updrs"].shape == (70 * n_vid, 1)
    assert bank["tokens"].shape == (70 * n_vid, 77)
    assert len(bank["text"]) == 70 * n_vid
    assert (bank["tokens"] >= 49408).sum() == 70 * n_vid * 4  # number tokens
    # embeddings are unit-norm sentences
    norms = np.linalg.norm(bank["embeds"], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    # NTE files: one (70, 32) matrix per video
    nte = np.load(osp.join(out["nte_dir"], "vid0.npy"))
    assert nte.shape == (70, 32)

    with open(out["scale"], "rb") as f:
        scale = pickle.load(f)
    assert "extra_info" in scale and "graduated" in scale["extra_info"]
    assert set(scale["walking speed"].keys()) == {"mean", "std", "shift", "weight"}

    # the bank loads into the training-side MemoryDataset
    from gava_clip_tpu.data.datasets import MemoryDataset
    ds = MemoryDataset(out["data"], cls_type="updrs", for_zero_shot=False)
    emb, label = ds[0]
    assert emb.shape == (4, 32) and 0 <= label <= 2
