"""DeCap gait-caption decoder: a small GPT-2-style LM with a CLIP-prefix
projector and a number-token vocabulary extension.

Rebuild of the reference decoder (training/decoder_train.py:120-168): a
4-layer/4-head width-768 causal transformer whose vocabulary is the CLIP BPE
vocab (49408) extended with 500 number tokens; `clip_project` is a
bottleneck MLP 512 -> 256 -> 768 whose output is prepended as a prefix
token. The LM head is weight-tied to the token embedding.

Training loss (decoder_train.py:214-215, :262-278): token CE with ignore
index 0 and label smoothing 0.1, plus an ordinal-weighted CE on the number
tokens (ordinal distance measured inside the number sub-vocabulary).

Greedy decoding with number interception/de-scaling lives in
cli/decode.py (reference training/decode.py:88-182).
"""

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layer_norm, multi_head_attention
from ..ops.linear import linear
from .common import init_attention, init_layer_norm, init_linear

BASE_VOCAB = 49408
NUM_TOKENS = 500


@dataclass(frozen=True)
class DecapConfig:
    vocab_size: int = BASE_VOCAB + NUM_TOKENS
    n_layer: int = 4
    n_head: int = 4
    n_embd: int = 768
    n_positions: int = 128
    prefix_size: int = 512
    base_vocab: int = BASE_VOCAB


def gelu_new(x: jax.Array) -> jax.Array:
    """GPT-2 tanh-approximated GELU."""
    return 0.5 * x * (1.0 + jnp.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


def init_decap_params(rng, cfg: DecapConfig = DecapConfig()) -> Dict:
    """Init on host CPU, return numpy leaves. Eager init over the TPU relay
    costs ~19 s (dozens of small dispatches through the serialized stdio
    tunnel, measured 2026-08-19); the same ops on host CPU are ~0.2 s, and
    threefry RNG is backend-deterministic so values are identical. numpy
    leaves keep jit consumers free to commit them wherever they run
    (same policy as VitaClip.__init__)."""
    # local_devices: jax.devices() leads with process 0's (non-addressable)
    # devices on other ranks of a multi-process run
    cpu = jax.local_devices(backend="cpu")[0]

    def one_block(r):
        r1, r2, r3 = jax.random.split(r, 3)
        D = cfg.n_embd
        return {
            "ln_1": init_layer_norm(D),
            "attn": init_attention(r1, D),
            "ln_2": init_layer_norm(D),
            "mlp": {"fc1": init_linear(r2, D, 4 * D),
                    "fc2": init_linear(r3, 4 * D, D)},
        }

    with jax.default_device(cpu):
        rngs = jax.random.split(rng, 8)
        D = cfg.n_embd
        block_rngs = jax.random.split(rngs[0], cfg.n_layer)
        blocks = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[one_block(r) for r in block_rngs])
        params = {
            "wte": 0.02 * jax.random.normal(rngs[1], (cfg.vocab_size, D)),
            "wpe": 0.01 * jax.random.normal(rngs[2], (cfg.n_positions, D)),
            "blocks": blocks,
            "ln_f": init_layer_norm(D),
            "clip_project": {
                "fc1": init_linear(rngs[3], cfg.prefix_size, D // 3,
                                   xavier=False),
                "fc2": init_linear(rngs[4], D // 3, D, xavier=False),
            },
        }
    return jax.tree_util.tree_map(np.asarray, params)


def project_prefix(params: Dict, clip_features: jax.Array) -> jax.Array:
    """Bottleneck prefix projector with Tanh (decoder_train MLP)."""
    h = jnp.tanh(linear(params["clip_project"]["fc1"], clip_features))
    return linear(params["clip_project"]["fc2"], h)


def decap_transformer(params: Dict, embeds: jax.Array, cfg: DecapConfig) -> jax.Array:
    """Causal transformer over input embeddings (B, L, D) -> hidden states."""
    from .text import causal_mask
    L = embeds.shape[1]
    mask = causal_mask(L)
    x = embeds + params["wpe"][:L].astype(embeds.dtype)

    def block_fn(h, p):
        hn = layer_norm(h, p["ln_1"]["scale"], p["ln_1"]["bias"])
        h = h + multi_head_attention(p["attn"], hn, hn, hn, cfg.n_head, mask=mask)
        hn = layer_norm(h, p["ln_2"]["scale"], p["ln_2"]["bias"])
        h = h + linear(p["mlp"]["fc2"], gelu_new(linear(p["mlp"]["fc1"], hn)))
        return h, None

    x, _ = jax.lax.scan(block_fn, x, params["blocks"])
    return layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"])


def decap_forward(params: Dict, clip_features: jax.Array, tokens: jax.Array,
                  cfg: DecapConfig = DecapConfig()) -> jax.Array:
    """(B, prefix_size) clip features + (B, L) tokens -> (B, 1+L, V) logits.
    The projected prefix occupies position 0 (decoder_train.py:161-167)."""
    tok_emb = jnp.take(params["wte"], tokens, axis=0)
    prefix = project_prefix(params, clip_features)[:, None, :]
    h = decap_transformer(params, jnp.concatenate([prefix, tok_emb], axis=1), cfg)
    return h @ params["wte"].T


def smoothed_ce(logits: jax.Array, targets: jax.Array,
                smoothing: float = 0.1) -> jax.Array:
    """Per-token CE with label smoothing (torch CrossEntropyLoss formula)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    smooth = -logp.mean(axis=-1)
    return (1.0 - smoothing) * nll + smoothing * smooth


def decap_loss(params: Dict, clip_features: jax.Array, tokens: jax.Array,
               cfg: DecapConfig = DecapConfig()) -> Tuple[jax.Array, Dict]:
    """Token CE (ignore 0, smoothing .1) + ordinal-weighted CE on number
    tokens (decoder_train.py:262-278). tokens: (B, L) int32."""
    from ..train.losses import focal_ordinal_weight
    logits = decap_forward(params, clip_features, tokens, cfg)[:, :-1]
    flat_logits = logits.reshape(-1, cfg.vocab_size)
    flat_tokens = tokens.reshape(-1)

    tok_loss = smoothed_ce(flat_logits, flat_tokens)
    valid = (flat_tokens != 0).astype(jnp.float32)
    # reference: CrossEntropyLoss(ignore_index=0, reduction='none') zeroes
    # the ignored entries and the subsequent .mean() divides by ALL
    # positions, not the valid count (decoder_train.py:214,275-278) — so
    # the denominator is numel. Dividing by valid.sum() inflated the token
    # term ~(total/valid)x relative to loss_number.
    loss_token = (tok_loss * valid).sum() / flat_tokens.shape[0]

    is_num = (flat_tokens >= cfg.base_vocab).astype(jnp.float32)
    num_logits = flat_logits[:, cfg.base_vocab:]
    num_targets = jnp.clip(flat_tokens - cfg.base_vocab, 0, NUM_TOKENS - 1)
    ow = focal_ordinal_weight(num_logits, num_targets, gamma=2.0, alpha=0.0,
                              beta=0.2)
    loss_number = (ow * tok_loss * is_num).sum() / jnp.maximum(is_num.sum(), 1.0)

    loss = loss_token + loss_number
    acc = (((flat_logits.argmax(-1) == flat_tokens) * valid).sum()
           / jnp.maximum(valid.sum(), 1.0))
    return loss, {"loss_token": loss_token, "loss_number": loss_number,
                  "acc": acc}


def make_greedy_step(params: Dict, cfg: DecapConfig = DecapConfig(),
                     max_len: int = 78):
    """Fixed-shape greedy step: one compile for all positions. Returns
    step(embed_buf (1, max_len, D), pos) -> next-token id at `pos`.

    `params` is a jit ARGUMENT (committed to device once here), not a
    closure capture: closed-over arrays are baked into the HLO as
    constants, and the 153 MB fp32 wte turned one compile into 247 s
    through the relay's remote-compile helper (measured 2026-08-19)."""
    params = jax.device_put(params)

    @jax.jit
    def step(p, embed_buf, pos):
        h = decap_transformer(p, embed_buf, cfg)
        # index the one live row BEFORE the vocab projection: a single
        # (D,) @ (D, V) row-product instead of the full (max_len+1, V)
        # GEMM whose other rows are discarded (~max_len x less work per
        # decode step)
        row = jax.lax.dynamic_index_in_dim(h[0], pos, 0, keepdims=False)
        return jnp.argmax(row @ p["wte"].T, axis=-1)

    return lambda embed_buf, pos: step(params, embed_buf, pos)


def greedy_decode(params: Dict, clip_feature: np.ndarray,
                  cfg: DecapConfig = DecapConfig(),
                  max_len: int = 77) -> Tuple[list, list]:
    """Greedy decode one prefix; returns (token_ids with number tokens
    replaced by '?' (286), raw number values). Mirrors decode.py:88-125;
    runs one fixed-shape jitted forward per step."""
    import jax.numpy as jnp
    D = cfg.n_embd
    max_len = min(max_len, cfg.n_positions - 1)
    buf = np.zeros((1, max_len + 1, D), np.float32)
    prefix = np.asarray(project_prefix(params, jnp.asarray(
        clip_feature.reshape(1, -1), jnp.float32)))
    buf[0, 0] = prefix[0]
    step = make_greedy_step(params, cfg, max_len + 1)

    wte = np.asarray(params["wte"])
    tokens, numbers = [], []
    for pos in range(max_len):
        nxt = int(step(jnp.asarray(buf), pos))
        if nxt >= cfg.base_vocab:
            numbers.append(nxt - cfg.base_vocab)
            nxt = 286  # '?' token (decode.py:111)
        tokens.append(nxt)
        if nxt == cfg.base_vocab - 1:  # EOT
            break
        buf[0, pos + 1] = wte[nxt]
    return tokens, numbers


def make_greedy_decoder(params: Dict, cfg: DecapConfig = DecapConfig(),
                        max_len: int = 77):
    """Device-resident greedy decoder: ONE jit call per caption.

    `greedy_decode` above mirrors the reference's host loop
    (decode.py:88-125): max_len jitted calls per caption, each re-running
    the transformer over the whole (max_len+1)-row buffer — O(L^2) attention
    FLOPs per token and one host<->device round-trip per token (over this
    chip's serialized stdio relay, ~30 ms/call = ~2.3 s/caption of pure
    RTT). This decoder is the TPU-native form: per-layer K/V caches
    (n_layer, max_len, D), a single-token attention step (O(L) per token),
    and the whole greedy loop — including the number-token interception and
    the EOT early exit — inside one `lax.while_loop`, so a caption costs one
    dispatch and compiles once per (params, cfg, max_len).

    Returns fn(clip_feature) -> (tokens list, numbers list), exactly
    `greedy_decode`'s contract (parity-tested in tests/test_decap.py).

    `params` rides as a jit ARGUMENT (committed to device once by this
    factory) — closed over, the 153 MB fp32 wte becomes an HLO constant
    and the relay's remote-compile helper took 247 s on it (2026-08-19).
    """
    max_len = min(max_len, cfg.n_positions - 1)
    D, H = cfg.n_embd, cfg.n_head
    hd = D // H
    scale = hd ** -0.5
    f32 = jnp.float32
    params = jax.device_put(params)

    def token_step(pr, x, ck, cv, pos):
        """One token through all blocks against the caches; returns
        (vocab logits row, updated caches). Same math as decap_transformer
        restricted to the live row (scale-on-q, fp32 softmax)."""
        h = x + pr["wpe"][pos].astype(f32)

        def block(h, inp):
            p, ckl, cvl = inp
            hn = layer_norm(h[None], p["ln_1"]["scale"], p["ln_1"]["bias"])[0]
            qp = linear(p["attn"]["q"], hn)
            ckl = jax.lax.dynamic_update_index_in_dim(
                ckl, linear(p["attn"]["k"], hn), pos, 0)
            cvl = jax.lax.dynamic_update_index_in_dim(
                cvl, linear(p["attn"]["v"], hn), pos, 0)
            qh = (qp * scale).reshape(H, hd)
            s = jnp.einsum("hd,lhd->hl", qh, ckl.reshape(max_len, H, hd),
                           preferred_element_type=f32)
            s = jnp.where((jnp.arange(max_len) <= pos)[None, :], s, -jnp.inf)
            w = jax.nn.softmax(s.astype(f32), axis=-1)
            att = jnp.einsum("hl,lhd->hd", w,
                             cvl.reshape(max_len, H, hd)).reshape(D)
            h = h + linear(p["attn"]["out"], att)
            hn = layer_norm(h[None], p["ln_2"]["scale"], p["ln_2"]["bias"])[0]
            h = h + linear(p["mlp"]["fc2"], gelu_new(linear(p["mlp"]["fc1"], hn)))
            return h, (ckl, cvl)

        h, caches = jax.lax.scan(block, h, (pr["blocks"], ck, cv))
        h = layer_norm(h[None], pr["ln_f"]["scale"],
                       pr["ln_f"]["bias"])[0]
        # row-product against the tied embedding, as in make_greedy_step;
        # returns the LOGITS row (callers argmax) so numeric parity against
        # the full-buffer path is checkable (tools/bench_decode.py)
        return (h @ pr["wte"].T).astype(f32), caches

    @jax.jit
    def decode(pr, clip_feature):
        prefix = project_prefix(
            pr, clip_feature.reshape(1, -1).astype(f32))[0]

        def cond(st):
            pos, _, _, _, _, _, _, done = st
            return (pos < max_len) & ~done

        def body(st):
            pos, x, ck, cv, toks, nums, n_num, _ = st
            logits, (ck, cv) = token_step(pr, x, ck, cv, pos)
            nxt = jnp.argmax(logits).astype(jnp.int32)
            is_num = nxt >= cfg.base_vocab
            nums = jnp.where(is_num,
                             nums.at[n_num].set(nxt - cfg.base_vocab), nums)
            n_num = n_num + is_num.astype(jnp.int32)
            nxt = jnp.where(is_num, jnp.int32(286), nxt)  # '?' (decode.py:111)
            toks = toks.at[pos].set(nxt)
            done = nxt == cfg.base_vocab - 1  # EOT
            return (pos + 1, pr["wte"][nxt].astype(f32), ck, cv,
                    toks, nums, n_num, done)

        st = (jnp.int32(0), prefix,
              jnp.zeros((cfg.n_layer, max_len, D), f32),
              jnp.zeros((cfg.n_layer, max_len, D), f32),
              jnp.zeros((max_len,), jnp.int32),
              jnp.zeros((max_len,), jnp.int32),
              jnp.int32(0), jnp.bool_(False))
        pos, _, _, _, toks, nums, n_num, _ = jax.lax.while_loop(
            cond, body, st)
        return toks, pos, nums, n_num

    def run(clip_feature) -> Tuple[list, list]:
        toks, n_tok, nums, n_num = jax.tree_util.tree_map(
            np.asarray, decode(params, jnp.asarray(clip_feature)))
        return ([int(t) for t in toks[:int(n_tok)]],
                [int(v) for v in nums[:int(n_num)]])

    run.token_step = token_step  # reused (vmapped) by make_batched_decoder
    run.params = params          # device-committed copy, shared downstream
    return run


def make_batched_decoder(params: Dict, cfg: DecapConfig = DecapConfig(),
                         max_len: int = 77, batch: int = 8):
    """Batched form of make_greedy_decoder: vmapped single-token step,
    one shared `lax.while_loop` (runs until every lane hits EOT or
    max_len; finished lanes freeze via masking). One dispatch decodes
    `batch` captions — bulk captioning (cli/decode.py --features with many
    rows) rides the MXU batch dimension instead of looping captions.

    Returns fn(features (N, prefix_size)) -> list of (tokens, numbers)
    per row; N is padded up to a multiple of `batch` internally.
    """
    max_len = min(max_len, cfg.n_positions - 1)
    D = cfg.n_embd
    f32 = jnp.float32
    # reuse the single-caption step math (vmapped over the batch lane)
    _single = make_greedy_decoder(params, cfg, max_len)
    token_step = _single.token_step  # (pr, x, ck, cv, pos) -> (nxt, caches)
    params = _single.params          # device-committed once by the factory

    @jax.jit
    def decode(pr, feats, n_valid):
        prefix = project_prefix(pr, feats.astype(f32))  # (B, D)
        B = prefix.shape[0]
        # padding lanes start done=True: they freeze at step 0 instead of
        # decoding garbage to max_len and stalling the shared loop (a
        # ragged tail batch would otherwise cost up to max_len full
        # vmapped steps for its pad lanes)
        done0 = jnp.arange(B) >= n_valid

        def cond(st):
            pos, _, _, _, _, _, _, done = st
            return (pos < max_len) & ~done.all()

        def body(st):
            pos, x, ck, cv, toks, nums, n_num, done = st
            logits, (ck, cv) = jax.vmap(
                token_step, in_axes=(None, 0, 0, 0, None))(pr, x, ck, cv, pos)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            active = ~done
            is_num = (nxt >= cfg.base_vocab) & active
            nums = jax.vmap(
                lambda nu, idx, val, put:
                jnp.where(put, nu.at[idx].set(val), nu))(
                    nums, n_num, nxt - cfg.base_vocab, is_num)
            n_num = n_num + is_num.astype(jnp.int32)
            out = jnp.where(is_num, jnp.int32(286), nxt)
            toks = jnp.where(active[:, None],
                             toks.at[:, pos].set(out), toks)
            done = done | (active & (out == cfg.base_vocab - 1))
            n_tok_inc = active.astype(jnp.int32)
            x = jnp.where(active[:, None],
                          pr["wte"][out].astype(f32), x)
            return (pos + 1, x, ck, cv, toks,
                    nums, n_num, done), n_tok_inc

        # track per-lane lengths alongside the loop state
        def body_with_len(st):
            (*core, lens) = st
            new_core, inc = body(tuple(core))
            return (*new_core, lens + inc)

        st = (jnp.int32(0), prefix,
              jnp.zeros((B, cfg.n_layer, max_len, D), f32),
              jnp.zeros((B, cfg.n_layer, max_len, D), f32),
              jnp.zeros((B, max_len), jnp.int32),
              jnp.zeros((B, max_len), jnp.int32),
              jnp.zeros((B,), jnp.int32), done0,
              jnp.zeros((B,), jnp.int32))
        out = jax.lax.while_loop(
            lambda st: cond(st[:-1]), body_with_len, st)
        _, _, _, _, toks, nums, n_num, _, lens = out
        return toks, lens, nums, n_num

    def run(features) -> list:
        feats = np.asarray(features, np.float32)
        N = feats.shape[0]
        if N == 0:
            return []
        pad = (-N) % batch
        if pad:
            feats = np.concatenate([feats, np.zeros((pad, feats.shape[1]),
                                                    np.float32)])
        results = []
        for i in range(0, feats.shape[0], batch):
            toks, lens, nums, n_num = jax.tree_util.tree_map(
                np.asarray, decode(params, jnp.asarray(feats[i:i + batch]),
                                   jnp.int32(min(batch, N - i))))
            for b in range(batch):
                results.append((
                    [int(t) for t in toks[b, :int(lens[b])]],
                    [int(v) for v in nums[b, :int(n_num[b])]]))
        return results[:N]

    return run


def descale_number(n: float, entry: Dict, extra: Dict) -> float:
    """Invert the preprocess scaling (decode.py:165-177):
    value = ((n [- global_shift]) * graduated / weight - shift) * std + mean."""
    graduated = extra["graduated"]
    if extra.get("l2_norm") == "n/a":
        n = n - extra["global_shift"]
    return round((float(n) * graduated / entry["weight"] - entry["shift"])
                 * entry["std"] + entry["mean"], 3)
