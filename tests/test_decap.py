"""DeCap decoder: forward shapes, loss behavior, overfit sanity, decode."""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gava_clip_tpu.models.decap import (DecapConfig, decap_forward, decap_loss,
                                        descale_number, greedy_decode,
                                        init_decap_params)

CFG = DecapConfig(vocab_size=49408 + 500, n_layer=2, n_head=2, n_embd=64,
                  n_positions=32, prefix_size=16)


@pytest.fixture(scope="module")
def tiny_decap():
    return init_decap_params(jax.random.PRNGKey(0), CFG)


def test_forward_shapes(tiny_decap):
    feats = jnp.zeros((3, 16))
    tokens = jnp.zeros((3, 10), jnp.int32)
    logits = decap_forward(tiny_decap, feats, tokens, CFG)
    assert logits.shape == (3, 11, CFG.vocab_size)


def test_loss_ignores_padding(tiny_decap):
    feats = jnp.zeros((2, 16))
    toks = np.zeros((2, 10), np.int32)
    toks[:, 0] = 49406
    toks[:, 1] = 320
    toks[:, 2] = 49410  # number token
    toks[:, 3] = 49407
    loss, metrics = decap_loss(tiny_decap, feats, jnp.asarray(toks), CFG)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["acc"]) <= 1.0


def test_decoder_overfits_tiny_data(tiny_decap):
    import optax
    rs = np.random.RandomState(0)
    feats = rs.randn(4, 16).astype(np.float32)
    toks = np.zeros((4, 12), np.int32)
    toks[:, 0] = 49406
    for i in range(4):
        toks[i, 1:5] = [300 + i, 400 + i, 49420 + i, 49407]
    params = tiny_decap
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        (loss, m), g = jax.value_and_grad(
            lambda p: decap_loss(p, jnp.asarray(feats), jnp.asarray(toks), CFG),
            has_aux=True)(params)
        u, state = opt.update(g, state, params)
        return optax.apply_updates(params, u), state, loss, m

    first = None
    for i in range(60):
        params, state, loss, m = step(params, state)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5
    assert float(m["acc"]) > 0.5


def test_greedy_decode_runs(tiny_decap):
    feats = np.random.RandomState(1).randn(16).astype(np.float32)
    tokens, numbers = greedy_decode(tiny_decap, feats, CFG, max_len=8)
    assert 1 <= len(tokens) <= 8
    assert all(t < 49408 for t in tokens)  # numbers intercepted


def test_descale_number():
    entry = {"mean": 1.2, "std": 0.3, "shift": 0.0, "weight": 2.0}
    extra = {"graduated": 5.0 / 200, "l2_norm": "n/a", "global_shift": 100}
    # forward: scaled = ((v - mean)/std * weight)/graduated + shift_global
    v = 1.35
    scaled = int(round(((v - 1.2) / 0.3 * 2.0) / extra["graduated"] + 100))
    back = descale_number(scaled, entry, extra)
    assert abs(back - v) < 0.02


def test_decode_feature_with_scale_dict(tiny_decap, tmp_path):
    from gava_clip_tpu.cli.decode import decode_feature
    scale = {"walking speed value": {"mean": 1.0, "std": 0.2, "shift": 0.0,
                                     "weight": 1.0},
             "extra_info": {"graduated": 0.025, "l2_norm": "n/a",
                            "global_shift": 100}}
    feats = np.random.RandomState(2).randn(16).astype(np.float32)
    out = decode_feature(tiny_decap, CFG, feats, scale)
    assert isinstance(out, str)
