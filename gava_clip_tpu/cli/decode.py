"""Feature -> gait-sentence decoding — counterpart of reference
training/decode.py.

Greedy decoding with number-token interception: tokens >= 49408 are numbers;
their quantized value is de-scaled back to physical units via the scale-dict
pickle and substituted for the '?' placeholder, with the parameter identity
recovered by byte-matching the preceding words against the known parameter
names (decode.py:127-182).
"""

import argparse
import copy
import pickle
from typing import Dict, Optional

import numpy as np

from ..models.decap import (DecapConfig, descale_number, greedy_decode)
from ..text import ClipBpeTokenizer


def load_decap(path: str):
    import jax
    import jax.numpy as jnp
    with open(path, "rb") as f:
        ckpt = pickle.load(f)
    cfg = DecapConfig(**ckpt["config"]) if "config" in ckpt else DecapConfig()
    params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
    return params, cfg


def decode_feature(params, cfg: DecapConfig, feature: np.ndarray,
                   scale_dict: Optional[Dict] = None,
                   tokenizer: Optional[ClipBpeTokenizer] = None) -> str:
    tokenizer = tokenizer or ClipBpeTokenizer()
    tokens, numbers = greedy_decode(params, feature, cfg)

    # repeated SOT tokens become commas (decode.py:127-130)
    sot = 49406
    sot_ids = [i for i, t in enumerate(tokens) if t == sot]
    for i in sot_ids[:-1]:
        tokens[i] = 267
    text = tokenizer.decode(tokens)
    text = text.replace("<|startoftext|>", "")
    words = text.split()
    q_ids = [i for i, w in enumerate(words) if w == "?"]

    if scale_dict is not None and q_ids:
        extra = scale_dict["extra_info"]
        names = [k for k in scale_dict if k != "extra_info"]
        # byte-match decoded words against known parameter names (:138-166)
        short = [" ".join(n.split()[:-1]) or n for n in names]
        str_len = max(len(s.replace(" ", "")) for s in short)
        key_arr = np.vstack([
            np.frombuffer((s.replace(" ", "") + "_" * str_len)[:str_len].encode(),
                          dtype=np.uint8) for s in short])
        prev = 0
        for qid, n in zip(q_ids, numbers):
            frag = "".join(words[prev:qid])
            frag = (frag + "_" * str_len)[:str_len]
            eqs = np.frombuffer(frag.encode(), np.uint8)[None, :] == key_arr
            kid = int(np.argmax(eqs.sum(1)))
            words[qid] = str(descale_number(n, scale_dict[names[kid]], extra))
            prev = qid + 1
    else:
        for qid, n in zip(q_ids, numbers):
            words[qid] = str(n)

    out = " ".join(words)
    return out.replace("<|startoftext|>", "").replace("<|endoftext|>", "").strip()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--decap_ckpt", type=str, required=True)
    parser.add_argument("--features", type=str, required=True,
                        help=".npy (N, 512) features or memory-bank .pkl")
    parser.add_argument("--scale_dict", type=str, default="")
    parser.add_argument("--output", type=str, default="decoded.txt")
    parser.add_argument("--limit", type=int, default=16)
    args = parser.parse_args(argv)

    params, cfg = load_decap(args.decap_ckpt)
    if args.features.endswith(".pkl"):
        with open(args.features, "rb") as f:
            bank = pickle.load(f)
        feats = np.asarray(bank["embeds"], np.float32)
        if feats.ndim == 3:
            feats = feats.mean(-2)
    else:
        feats = np.load(args.features).astype(np.float32)
    feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)

    scale = None
    if args.scale_dict:
        with open(args.scale_dict, "rb") as f:
            scale = pickle.load(f)

    tok = ClipBpeTokenizer()
    lines = []
    for i, f in enumerate(feats[:args.limit]):
        lines.append(decode_feature(params, cfg, f, scale, tok))
        print(lines[-1])
    with open(args.output, "w") as fo:
        fo.write("\n".join(lines))
    return lines


if __name__ == "__main__":
    main()
