"""Earlier-generation numeric text encoding (slerp variant).

Rebuild of the reference utils/metadata.py: a module-level normalized
sinusoidal PE table (N=5000, L2 norm 2.0 — consumed by decode.py's PE probe,
reference utils/metadata.py:38-51), spherical linear interpolation between
"short ..."/"long ..." sentence embeddings weighted by the graduated
parameter value (:54-96), and a builder that emits the data_dict.pkl /
updrs_dict.pkl / diag_dict.pkl files (:277-379).
"""

import os
import os.path as osp
import pickle
from collections import defaultdict
from typing import Dict

import numpy as np

from ..text import tokenize
from ..text.tokenizer import VOCAB_SIZE

N_PE = 5000
D_MODEL = 512
L2_NORM = 2.0


def make_pe(n: int = N_PE, d_model: int = D_MODEL,
            l2_norm: float = L2_NORM) -> np.ndarray:
    pe = np.zeros((n, d_model))
    pos = np.arange(n)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d_model, 2) * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe / np.linalg.norm(pe, axis=-1, keepdims=True) * l2_norm


PE = make_pe()


def slerp(v0: np.ndarray, v1: np.ndarray, weight=0.5,
          dot_thresh: float = 0.9995) -> np.ndarray:
    """Spherical linear interpolation between (unnormalized) vectors; the
    angle is measured on the normalized pair, the interpolation applied to
    the originals (reference metadata.py:54-96)."""
    v0 = np.asarray(v0, np.float64)
    v1 = np.asarray(v1, np.float64)
    weight = np.atleast_1d(np.asarray(weight, np.float64))
    n0 = v0 / np.linalg.norm(v0, keepdims=True)
    n1 = v1 / np.linalg.norm(v1, keepdims=True)
    dot = np.sum(n0 * n1, axis=-1)
    assert np.abs(dot).max() < dot_thresh, "v0 and v1 are almost colinear"
    theta0 = np.arccos(dot)
    sin0 = np.sin(theta0)
    theta_w = theta0 * weight
    w0 = np.sin(theta0 - theta_w) / sin0
    w1 = np.sin(theta_w) / sin0
    return w0[:, None] * v0 + w1[:, None] * v1


def build_slerp_metadata(part1: Dict[str, list],
                         text_params: Dict,
                         text_cfg=None,
                         save_dir: str = "./data/gait/",
                         graduated: int = 100) -> Dict[str, str]:
    """Per parameter: embed "short <name>" and "long <name>" through the
    frozen text tower, slerp between them weighted by the graduated
    (0..1-normalized) value; tokens carry number words as extended-vocab ids
    (reference metadata.py:270-305 semantics)."""
    import jax
    import jax.numpy as jnp
    from ..models.text import TextConfig, encode_text_tokens
    text_cfg = text_cfg or TextConfig()

    other = ["vidname", "updrs", "diag", "leglength"]
    value_names = [k for k in part1 if k not in other]
    labels = {"updrs": list(part1["updrs"]), "diag": list(part1["diag"])}
    params_j = jax.tree_util.tree_map(jnp.asarray, text_params)

    tok_point = tokenize(".")[0, 1:3]
    output = {"tokens": [], "embeds": [], "updrs": [], "diag": []}
    key_embeds = {}
    for name in value_names:
        v = np.asarray(part1[name], float)
        # graduated weight in (0, 1)
        w = (v - v.min()) / max(v.max() - v.min(), 1e-9)
        w = np.clip(w, 1e-3, 1 - 1e-3)
        toks = tokenize([f"short {name}", f"long {name}"])
        embeds = np.asarray(encode_text_tokens(params_j, jnp.asarray(toks), text_cfg))
        key_embeds[name] = embeds[0]
        interp = slerp(embeds[0], embeds[1], weight=w)   # (num_rows, E)
        scaled = (w * graduated).astype(int)

        eot0 = int(np.argmax(toks[0]))
        for i in range(len(v)):
            row = np.zeros(77, np.int64)
            head = toks[0, :eot0 - 1]                    # SOT + words, no EOT
            row[:len(head)] = head
            row[len(head)] = scaled[i] + VOCAB_SIZE
            row[len(head) + 1:len(head) + 3] = tok_point
            output["tokens"].append(row[None])
            output["embeds"].append(interp[i][None].astype(np.float32))
            output["updrs"].append(int(labels["updrs"][i]))
            output["diag"].append(int(labels["diag"][i]))

    for k in ("tokens", "embeds"):
        output[k] = np.concatenate(output[k], axis=0)
    output["updrs"] = np.asarray(output["updrs"])
    output["diag"] = np.asarray(output["diag"])
    output["key_embed"] = key_embeds

    os.makedirs(save_dir, exist_ok=True)
    data_path = osp.join(save_dir, "data_dict.pkl")
    with open(data_path, "wb") as f:
        pickle.dump(output, f)

    # per-label grouped dictionaries (reference metadata.py:350-379)
    paths = {"data": data_path}
    for key in ("updrs", "diag"):
        grouped = defaultdict(list)
        for i, lab in enumerate(output[key]):
            if key == "updrs" and lab < 0:
                continue
            grouped[int(lab)].append(output["embeds"][i][None])
        grouped = {k: np.concatenate(v, axis=0) for k, v in grouped.items()}
        p = osp.join(save_dir, f"{key}_dict.pkl")
        with open(p, "wb") as f:
            pickle.dump(grouped, f)
        paths[key] = p
    return paths
