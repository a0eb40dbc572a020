"""Tokenizer parity with the reference CLIP BPE implementation."""

import numpy as np
import pytest

from gava_clip_tpu.text import ClipBpeTokenizer, tokenize
from gava_clip_tpu.text.tokenizer import SOT_TOKEN, EOT_TOKEN

SAMPLES = [
    "a photo of a cat",
    "normal",
    "slight difficulty",
    "moderate difficulty",
    "the person walks with reduced step length, 0.53 m/s speed!",
    "X X X X X X X X walking dog.",
    "it's a test -- of punctuation, don't/can't; 42 7",
]


def test_special_token_ids():
    tok = ClipBpeTokenizer()
    assert tok.encoder["<|startoftext|>"] == SOT_TOKEN
    assert tok.encoder["<|endoftext|>"] == EOT_TOKEN
    assert len(tok.encoder) == 49408


def test_round_trip():
    tok = ClipBpeTokenizer()
    for s in SAMPLES:
        ids = tok.encode(s)
        assert all(0 <= i < 49408 for i in ids)
        # decode re-inserts word-boundary spaces; compare space-stripped text
        assert tok.decode(ids).replace(" ", "") == s.lower().replace(" ", "")


def test_encode_matches_reference(reference_modules):
    ref_tok = reference_modules["VitaCLIP_text_encoder_utils"].SimpleTokenizer()
    tok = ClipBpeTokenizer()
    for s in SAMPLES:
        assert tok.encode(s) == ref_tok.encode(s), s


def test_tokenize_matches_reference(reference_modules):
    ref_tokenize = reference_modules["VitaCLIP_text_encoder"].tokenize
    want = ref_tokenize(SAMPLES).numpy()
    got = tokenize(SAMPLES)
    np.testing.assert_array_equal(got, want)


def test_tokenize_overflow():
    long_text = "walk " * 100
    with pytest.raises(RuntimeError):
        tokenize(long_text)
    t = tokenize(long_text, truncate=True)
    assert t.shape == (1, 77) and t[0, -1] == EOT_TOKEN
