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
    # 150 steps: the corrected reference denominator (mean over ALL
    # positions) scales loss_token by valid/total, slowing this tiny overfit
    for i in range(150):
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


def test_cached_decoder_matches_host_loop(tiny_decap):
    """make_greedy_decoder (KV-cached, one jitted while_loop per caption)
    must reproduce greedy_decode (the reference-mirroring host loop:
    decode.py:88-125) token-for-token and number-for-number."""
    from gava_clip_tpu.models.decap import make_greedy_decoder
    decoder = make_greedy_decoder(tiny_decap, CFG, max_len=31)
    rs = np.random.RandomState(3)
    for _ in range(4):
        feats = rs.randn(16).astype(np.float32)
        want = greedy_decode(tiny_decap, feats, CFG, max_len=31)
        got = decoder(feats)
        assert got == want


def test_cached_decoder_number_interception(tiny_decap):
    """Craft the tied embedding so the first prediction is a number token:
    both decoders must intercept it (emit '?' = 286, record the raw value)
    identically, exercising the in-graph interception branch."""
    from gava_clip_tpu.models.decap import (decap_transformer,
                                            make_greedy_decoder,
                                            project_prefix)
    feats = np.random.RandomState(5).randn(16).astype(np.float32)
    prefix = project_prefix(tiny_decap, jnp.asarray(feats)[None])
    h0 = np.asarray(decap_transformer(tiny_decap, prefix[:, None, :], CFG))[0, 0]
    wte = np.array(tiny_decap["wte"])
    wte[49408 + 7] = 10.0 * h0 / np.linalg.norm(h0)
    params = dict(tiny_decap, wte=jnp.asarray(wte))

    tokens, numbers = greedy_decode(params, feats, CFG, max_len=12)
    got_t, got_n = make_greedy_decoder(params, CFG, max_len=12)(feats)
    assert tokens[0] == 286 and numbers[0] == 7
    assert (got_t, got_n) == (tokens, numbers)


def test_batched_decoder_matches_host_loop(tiny_decap):
    """make_batched_decoder (shared while_loop, vmapped token step, padded
    lanes) must agree with the host loop per row; with these random params
    no lane hits EOT (full-length decode) — the staggered-EOT and
    interception branches are pinned by the crafted test below."""
    from gava_clip_tpu.models.decap import make_batched_decoder
    rs = np.random.RandomState(7)
    feats = rs.randn(5, 16).astype(np.float32)
    want = [greedy_decode(tiny_decap, f, CFG, max_len=31) for f in feats]
    got = make_batched_decoder(tiny_decap, CFG, max_len=31, batch=2)(feats)
    assert got == want


def test_batched_decoder_staggered_eot_and_interception(tiny_decap):
    """Craft the tied embedding per lane: lane 0 emits EOT at step 0
    (freezes while its chunk-mate keeps decoding), lane 2 opens with a
    number token (batched interception), lane 1 decodes to max_len; with
    batch=2 the second chunk also carries a zero-padded lane (frozen at
    step 0 via the n_valid mask). Every lane must match the host loop and
    the lane lengths must genuinely differ."""
    from gava_clip_tpu.models.decap import (decap_transformer,
                                            make_batched_decoder,
                                            project_prefix)
    rs = np.random.RandomState(11)
    feats = rs.randn(3, 16).astype(np.float32)
    prefix = project_prefix(tiny_decap, jnp.asarray(feats))
    h0 = np.asarray(decap_transformer(tiny_decap, prefix[:, None, :], CFG))[:, 0]
    wte = np.array(tiny_decap["wte"])
    wte[49407] = 10.0 * h0[0] / np.linalg.norm(h0[0])     # lane 0 -> EOT
    wte[49408 + 7] = 9.0 * h0[2] / np.linalg.norm(h0[2])  # lane 2 -> number
    params = dict(tiny_decap, wte=jnp.asarray(wte))

    want = [greedy_decode(params, f, CFG, max_len=12) for f in feats]
    got = make_batched_decoder(params, CFG, max_len=12, batch=2)(feats)
    assert got == want
    assert want[0][0] == [49407]                       # EOT at step 0
    assert want[2][0][0] == 286 and want[2][1][0] == 7  # intercepted
    assert len({len(t) for t, _ in want}) >= 2          # staggered lengths


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


def test_loss_composition_golden_vs_torch():
    """The loss composition must match the reference exactly at the tensor
    level (decoder_train.py:214,270-278): CrossEntropyLoss(ignore_index=0,
    label_smoothing=0.1, reduction='none') -> loss_token.MEAN() divides by
    ALL positions (ignored entries contribute 0), while loss_number.mean()
    divides by the number-token count only."""
    import torch
    from gava_clip_tpu.models.decap import smoothed_ce
    from gava_clip_tpu.train.losses import focal_ordinal_weight

    rs = np.random.RandomState(7)
    V, BASE, NUM = CFG.vocab_size, CFG.base_vocab, CFG.vocab_size - CFG.base_vocab
    flat_logits = rs.randn(24, V).astype(np.float32)
    flat_tokens = np.zeros(24, np.int64)
    flat_tokens[:6] = rs.randint(1, BASE, 6)          # normal tokens
    flat_tokens[6:9] = rs.randint(BASE, V, 3)          # number tokens
    # rest padding (0)

    lt = jnp.asarray(flat_logits)
    tt = jnp.asarray(flat_tokens.astype(np.int32))
    tok_loss = smoothed_ce(lt, tt)
    valid = (tt != 0).astype(jnp.float32)
    loss_token = float((tok_loss * valid).sum() / tt.shape[0])
    is_num = (tt >= BASE).astype(jnp.float32)
    ow = focal_ordinal_weight(lt[:, BASE:],
                              jnp.clip(tt - BASE, 0, NUM - 1),
                              gamma=2.0, alpha=0.0, beta=0.2)
    loss_number = float((ow * tok_loss * is_num).sum()
                        / jnp.maximum(is_num.sum(), 1.0))

    ce = torch.nn.CrossEntropyLoss(ignore_index=0, label_smoothing=0.1,
                                   reduction="none")
    tl = torch.from_numpy(flat_logits)
    tk = torch.from_numpy(flat_tokens)
    ref_tok = ce(tl, tk)
    np.testing.assert_allclose(loss_token, float(ref_tok.mean()),
                               rtol=1e-5)
    num_ids = np.where(flat_tokens >= BASE)[0]
    ref_ow = focal_ordinal_weight(
        jnp.asarray(flat_logits[num_ids, BASE:]),
        jnp.asarray((flat_tokens[num_ids] - BASE).astype(np.int32)),
        gamma=2.0, alpha=0.0, beta=0.2)
    ref_num = float((np.asarray(ref_ow)
                     * ref_tok[num_ids].numpy()).mean())
    np.testing.assert_allclose(loss_number, ref_num, rtol=1e-4)
