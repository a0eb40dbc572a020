"""Decode study modes (reference decode.py:446-497 and :52-86): per-class
centroid decoding, learned-text-feature decoding with tf_project replay,
and the PE number probe."""

import pickle
from dataclasses import asdict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.cli.decode import (centroid_study, class_feature_study,
                                      group_support_memory, pe_probe,
                                      replay_memory_projection)
from gava_clip_tpu.models.decap import DecapConfig, init_decap_params

E = 16        # embed dim of the fake support memory == decap prefix size
N_CLS = 3

CFG = DecapConfig(vocab_size=49408 + 500, n_layer=2, n_head=2, n_embd=64,
                  n_positions=32, prefix_size=E)


@pytest.fixture(scope="module")
def decap():
    return init_decap_params(jax.random.PRNGKey(0), CFG)


def _fake_vlm(rs):
    params = {
        "memory_project": {
            "w1": rs.randn(N_CLS, E, E // 4).astype(np.float32),
            "b1": np.zeros((N_CLS, E // 4), np.float32),
            "w2": rs.randn(N_CLS, E // 4, E // 8).astype(np.float32),
            "b2": np.zeros((N_CLS, E // 8), np.float32),
        },
        "tf_project": {
            "fc1": {"kernel": rs.randn(E, E // 4).astype(np.float32),
                    "bias": np.zeros(E // 4, np.float32)},
            "fc2": {"kernel": rs.randn(E // 4, E // 8).astype(np.float32),
                    "bias": np.zeros(E // 8, np.float32)},
        },
    }
    text_features = rs.randn(N_CLS, E).astype(np.float32)
    return params, text_features


def _fake_bank(rs):
    return {"embeds": rs.randn(10, 3, E).astype(np.float32),
            "updrs": np.array([0, 1, 2, 0, 1, 2, -1, 0, 1, 2]),
            "diag": np.zeros(10, np.int64)}


def test_group_support_memory_drops_invalid(decap):
    bank = _fake_bank(np.random.RandomState(0))
    grouped = group_support_memory(bank, "updrs")
    assert set(grouped) == {"updrs 0", "updrs 1", "updrs 2"}
    assert grouped["updrs 0"].shape == (3, 3, E)   # label -1 dropped


def test_centroid_study_decodes_per_class(decap):
    rs = np.random.RandomState(1)
    vlm, tf = _fake_vlm(rs)
    grouped = group_support_memory(_fake_bank(rs), "updrs")
    sim_s, raw_s = replay_memory_projection(vlm, grouped)
    for k in sim_s:
        assert sim_s[k].shape[-1] == E // 8
        np.testing.assert_allclose(np.linalg.norm(sim_s[k], axis=-1), 1.0,
                                   atol=1e-5)
    out = centroid_study(decap, CFG, sim_s, raw_s, None, None)
    assert set(out) == {"updrs 0", "updrs 1", "updrs 2"}
    assert all(isinstance(v, str) for v in out.values())


def test_class_feature_study_decodes_per_class(decap):
    rs = np.random.RandomState(2)
    vlm, tf = _fake_vlm(rs)
    grouped = group_support_memory(_fake_bank(rs), "updrs")
    sim_s, raw_s = replay_memory_projection(vlm, grouped)
    out = class_feature_study(decap, CFG, vlm, tf, sim_s, raw_s, None, None,
                              "updrs")
    assert set(out) == {"updrs 0", "updrs 1", "updrs 2"}


def test_cli_study_modes_end_to_end(decap, tmp_path, monkeypatch):
    from gava_clip_tpu.cli.decode import main
    rs = np.random.RandomState(3)
    vlm, tf = _fake_vlm(rs)
    with open(tmp_path / "vlm.ckpt", "wb") as f:
        pickle.dump({"params": vlm, "text_features": tf}, f)
    with open(tmp_path / "bank.pkl", "wb") as f:
        pickle.dump(_fake_bank(rs), f)
    with open(tmp_path / "decap.ckpt", "wb") as f:
        pickle.dump({"params": jax.tree_util.tree_map(np.asarray, decap),
                     "config": asdict(CFG)}, f)

    monkeypatch.chdir(tmp_path)
    out = main(["--decap_ckpt", str(tmp_path / "decap.ckpt"),
                "--vlm_ckpt", str(tmp_path / "vlm.ckpt"),
                "--memory_bank", str(tmp_path / "bank.pkl"),
                "--use_centroid", "--output", "centroid.txt"])
    assert set(out) == {"updrs 0", "updrs 1", "updrs 2"}
    assert (tmp_path / "centroid.txt").read_text().startswith("CENTROID")

    out2 = main(["--decap_ckpt", str(tmp_path / "decap.ckpt"),
                 "--vlm_ckpt", str(tmp_path / "vlm.ckpt"),
                 "--memory_bank", str(tmp_path / "bank.pkl"),
                 "--output", "percls.txt"])
    assert set(out2) == {"updrs 0", "updrs 1", "updrs 2"}


def test_pe_probe(tmp_path, reference_modules):
    """PE probe with a tiny text tower: same base sentence embedding, PE row
    per value; decodes a string for each probed percent."""
    from gava_clip_tpu.models.text import TextConfig
    from tests.test_cli_eval import _save_torch_backbone
    backbone, _ = _save_torch_backbone(tmp_path, reference_modules)

    cfg32 = DecapConfig(vocab_size=49408 + 500, n_layer=2, n_head=2,
                        n_embd=64, n_positions=32, prefix_size=32)
    decap32 = init_decap_params(jax.random.PRNGKey(1), cfg32)
    tcfg = TextConfig(embed_dim=32, width=32, heads=2, layers=2)
    out = pe_probe(decap32, cfg32, backbone, None, None,
                   percents=range(30, 72, 14), text_cfg=tcfg)
    assert list(out) == [30, 44, 58]
    assert all(isinstance(v, str) for v in out.values())
