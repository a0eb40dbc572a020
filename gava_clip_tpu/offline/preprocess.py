"""Gait-parameter metadata -> support-memory bank + per-video NTE matrices.

Rebuild of the reference utils/preprocess.py (L0): normalizes each gait
parameter against the healthy-subject mean (:146-150), leg-length-normalizes
distance/speed/MOS values (:133-143), encodes numbers either as an
orthogonal [NUM] embedding (SVD construction, :185-194, the default) or as
scaled sinusoidal position encodings with an optimized L2 norm (:195-214),
enumerates all C(n, 4) parameter combinations (:234-275), renders each
combination as four "<param name> is <number>" sentence embeddings through
the frozen CLIP text tower (:293-311), and writes:

  <save_dir>/<base>_dict_basic_4f.pkl    memory bank {embeds (N,4,512),
                                         updrs, diag, tokens, text}
  <save_dir>/<base>_scale_dict_basic_4f.pkl  de-scaling metadata
  <video_dir>/nte/<vid>.npy              per-video (n_comb, 512) NTE

TPU-first: the reference encodes per-combination on GPU in a Python loop;
here all sentence rows of a combination are batched through one jitted text
forward (and chunks stream through the same compiled shape).
"""

import math
import os
import os.path as osp
import pickle
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..text import tokenize
from ..text.tokenizer import EOT_TOKEN, VOCAB_SIZE
from ..models.text import TextConfig, encode_text_embeds, encode_text_tokens

N_LEVELS = 200          # number-token quantization levels (reference N)
SUBSET_LEN = 4
MAX_TEXT_LEN = 77


@dataclass
class PreprocessConfig:
    no_pe: bool = True          # True: orthogonal [NUM] embedding (default run)
    new_pe: bool = False
    l2_norm: Optional[float] = None
    separate: bool = True       # keep 4 per-sentence embeddings (SEPERATE)
    filter_correlated: bool = False
    d_model: int = 512
    batch_rows: int = 4096      # text-tower batch per device call


def sinusoidal_pe(n: int, d_model: int) -> np.ndarray:
    """Row-normalized sinusoidal position table (reference :55-63)."""
    pe = np.zeros((n, d_model), np.float64)
    pos = np.arange(n)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d_model, 2) * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe / np.linalg.norm(pe, axis=-1, keepdims=True)


def orthogonal_num_embedding(pe: np.ndarray) -> np.ndarray:
    """[NUM] embedding orthogonal to the PE rows via SVD (reference
    :185-194; https://arxiv.org/abs/2310.02989)."""
    d = pe.shape[1]
    a = np.vstack([pe[:d - 1], np.zeros((1, d))])
    u, s, vt = np.linalg.svd(a)
    ss = np.zeros((d, d))
    ss[-1, -1] = 1
    ne = (u @ ss @ vt)[-1]
    norm = np.linalg.norm(ne)
    if norm < 1e-12:
        # degenerate u[-1,-1]=0 case: take the null-space direction directly
        ne = vt[-1]
        norm = np.linalg.norm(ne)
    return ne / norm


def enumerate_combinations(n: int, k: int = SUBSET_LEN) -> List[np.ndarray]:
    """All size-k index subsets in the reference's meshgrid traversal order
    (:236-275) — the order defines NTE row identity."""
    index = np.arange(n)
    grid = np.array(np.meshgrid(*([index] * k))).T.reshape(-1, k)
    seen: List[frozenset] = []
    combos: List[np.ndarray] = []
    seen_set = set()
    for row in grid:
        key = frozenset(int(x) for x in row)
        if len(key) < k or key in seen_set:
            continue
        seen_set.add(key)
        combos.append(row.copy())
    assert len(combos) == math.comb(n, k)
    return combos


def load_metadata(path: str) -> Tuple[Dict[str, list], Dict[str, str]]:
    """Metadata table: .xlsx (sheets part1/unit — the reference format) or a
    .pkl {part1, unit} produced by offline/gait_params.save_metadata."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            d = pickle.load(f)
        return d["part1"], {k: (v if isinstance(v, str) else "")
                            for k, v in d["unit"].items()}
    import pandas as pd
    part1 = pd.read_excel(path, sheet_name="part1").to_dict(orient="list")
    unit = pd.read_excel(path, sheet_name="unit").to_dict(orient="list")
    unit = {k: (v[0] if isinstance(v[0], str) else "") for k, v in unit.items()}
    return part1, unit


def data_preprocess(metadata_file: str,
                    text_params: Dict,
                    text_cfg: TextConfig = TextConfig(),
                    save_dir: str = "./data/gait/",
                    video_dir: str = "./datasets/tulip",
                    cfg: PreprocessConfig = PreprocessConfig()) -> Dict[str, str]:
    import jax
    import jax.numpy as jnp

    part1, unit_dict = load_metadata(metadata_file)
    os.makedirs(save_dir, exist_ok=True)

    other = ["vidname", "updrs", "diag", "leglength"]
    video_names = list(part1["vidname"])
    value_names = [k for k in part1.keys() if k not in other]
    unit_dict = {k: unit_dict.get(k, "") for k in value_names}

    diag = np.asarray(part1["diag"], int)
    updrs = np.asarray(part1["updrs"], int)
    normal_idx = np.where(diag == 0)[0]
    if normal_idx.size == 0:
        normal_idx = np.where(updrs == 1)[0]
    leg_lengths = np.asarray(part1["leglength"], float)

    d_model = cfg.d_model
    pe = sinusoidal_pe(1000, d_model)

    # --- per-parameter normalization (reference :118-165) -------------------
    new_dict: Dict[str, np.ndarray] = {}
    raw_dict: Dict[str, np.ndarray] = {}
    scale_dict: Dict[str, Dict] = {}
    max_value = 0.0
    for name in value_names:
        v = np.asarray(part1[name], float).copy()
        if ("distance" in name) or ("speed" in name) or \
                ("margin of stability" in name.lower()):
            v /= leg_lengths.mean()
        raw_dict[name] = v.copy()
        mean = v[normal_idx].mean()
        std = v.std()
        v = (v - mean) / std
        if cfg.no_pe:
            shift, weight = 0.0, 2.5 / np.abs(v).max()
        else:
            shift, weight = -v.min(), 1.0
        v = (v + shift) * weight
        if cfg.no_pe:
            assert np.abs(v).max() < 5.0
        max_value = max(max_value, v.max())
        scale_dict[name] = {"mean": mean, "std": std, "shift": shift,
                            "weight": weight}
        new_dict[name] = v

    # --- parameter-name embeddings through the frozen text tower ------------
    tokens = tokenize(value_names)                       # (P, 77)
    base_embeds = np.asarray(encode_text_tokens(
        jax.tree_util.tree_map(jnp.asarray, text_params),
        jnp.asarray(tokens), text_cfg))
    base_embeds = base_embeds / np.linalg.norm(base_embeds, axis=-1, keepdims=True)

    # --- number-embedding setup (reference :176-222) -------------------------
    l2_norm = cfg.l2_norm
    if cfg.no_pe:
        ne = orthogonal_num_embedding(pe)
        graduated = 5.0 / N_LEVELS
        scale_dict["extra_info"] = {"graduated": graduated, "l2_norm": "n/a",
                                    "global_shift": N_LEVELS / 2}
    else:
        if not cfg.new_pe and l2_norm is None:
            # optimize the PE scale so two far-apart numbers appended to a
            # probe sentence land at the mean name-name similarity (:196-212)
            from scipy.optimize import minimize
            probe_tok = tokenize("the walking speed is")
            probe = np.asarray(encode_text_tokens(
                jax.tree_util.tree_map(jnp.asarray, text_params),
                jnp.asarray(probe_tok), text_cfg))[0]
            probe /= np.linalg.norm(probe)
            name_sims = base_embeds @ base_embeds.T
            pe0, pe1 = pe[0], pe[250]

            def objective(l):
                a = probe + pe0 * l
                b = probe + pe1 * l
                a /= np.linalg.norm(a)
                b /= np.linalg.norm(b)
                return (a @ b - name_sims.mean()) ** 2
            l2_norm = float(minimize(objective, x0=1.0, tol=1e-9).x[0])
        pe = pe * (l2_norm or 1.0)
        graduated = max_value / (N_LEVELS - 1)
        scale_dict["extra_info"] = {"graduated": graduated, "l2_norm": l2_norm}

    # --- "X is X" sentence template (reference :179-183) ---------------------
    ne_tok = tokenize("X is X")                          # [SOT, X, is, X, EOT]
    token_emb = np.asarray(text_params["token_embedding"])
    pre_tok = token_emb[ne_tok[0]][None]                 # (1, 77, W)
    eot_pos = int(np.argmax(ne_tok[0] == EOT_TOKEN))

    jax_text_params = jax.tree_util.tree_map(jnp.asarray, text_params)

    @jax.jit
    def encode_sentences(embeds, pool_idx):
        return encode_text_embeds(jax_text_params, embeds, pool_idx, text_cfg)

    num_rows = len(video_names)
    combos = enumerate_combinations(len(value_names))

    if cfg.filter_correlated:
        all_values = np.vstack([raw_dict[n] for n in value_names])
        pearson = np.corrcoef(all_values)
        combos = [c for c in combos
                  if all(abs(pearson[c[i], c[j]]) <= 0.4
                         for i in range(SUBSET_LEN)
                         for j in range(i + 1, SUBSET_LEN))]

    token_point = tokenize(".")[0, 1:3]
    output = {"embeds": [], "updrs": [], "diag": [], "tokens": [], "text": []}
    npy_dict = {vn: np.empty((0, d_model), np.float32) for vn in video_names}

    for comb in combos:
        values = np.vstack([new_dict[value_names[i]] for i in comb])
        scaled = values / graduated
        if cfg.no_pe:
            scaled = scaled + N_LEVELS / 2
        assert scaled.min() >= 0
        scaled = scaled.astype(int)                      # (4, num_rows)

        embs = base_embeds[comb]                         # (4, W)
        if cfg.no_pe:
            nes = scaled[..., None] * ne                 # (4, num_rows, W)
        else:
            nes = pe[scaled.reshape(-1)].reshape(SUBSET_LEN, num_rows, d_model)

        if cfg.no_pe or cfg.new_pe:
            # render "name is number" through the text tower: template token
            # embeddings with slot1 <- name embedding, slot3 <- number embed
            batch = np.repeat(pre_tok, SUBSET_LEN * num_rows, axis=0)
            batch[:, 1, :] = np.repeat(embs, num_rows, axis=0)
            batch[:, 3, :] = nes.reshape(-1, d_model)
            pooled = np.array(encode_sentences(
                jnp.asarray(batch, jnp.float32),
                jnp.full((batch.shape[0],), eot_pos, jnp.int32)))
            pooled = pooled.reshape(SUBSET_LEN, num_rows, d_model)
            pooled /= np.linalg.norm(pooled, axis=-1, keepdims=True)
        else:
            pooled = embs[:, None, :] + nes
            pooled /= np.linalg.norm(pooled, axis=-1, keepdims=True)

        if cfg.separate:
            pooled = pooled.transpose(1, 0, 2)           # (num_rows, 4, W)
        else:
            pooled = pooled.mean(axis=0)
            pooled /= np.linalg.norm(pooled, axis=-1, keepdims=True)

        # natural-language texts (:324-335)
        base_text = " _ , ".join(value_names[i] for i in comb) + " _"
        words = np.array(base_text.split())
        num_pos = np.where(words == "_")[0]
        texts = np.repeat(words[None], num_rows, axis=0).astype(object)
        for ip, pos in enumerate(num_pos):
            nums = np.round(raw_dict[value_names[comb[ip]]], 3).astype(str)
            unit = unit_dict[value_names[comb[ip]]]
            texts[:, pos] = [f"{n} {unit}" for n in nums]
        texts = [" ".join(t) for t in texts.tolist()]

        # joint tokens with number tokens >= VOCAB_SIZE (:336-349)
        tks = tokens[comb]
        tok = np.zeros((num_rows, MAX_TEXT_LEN), np.float32)
        end_ids = np.argmax(tks, axis=-1)
        prev = 0
        for j in range(SUBSET_LEN):
            start = 0 if j == 0 else 1
            seg = tks[j, start:end_ids[j]]
            tok[:, prev:prev + len(seg)] = seg
            tok[:, prev + len(seg)] = scaled[j] + VOCAB_SIZE
            prev += len(seg) + 1
        tok[:, prev:prev + 2] = token_point

        output["embeds"].append(pooled.astype(np.float32))
        output["updrs"].append(updrs.reshape(num_rows, 1))
        output["diag"].append(diag.reshape(num_rows, 1))
        output["tokens"].append(tok)
        output["text"].extend(texts)
        for vid, vn in enumerate(video_names):
            row = pooled[vid].mean(0, keepdims=True) if cfg.separate \
                else pooled[vid][None]
            npy_dict[vn] = np.vstack([npy_dict[vn], row.astype(np.float32)])

    # per-video NTE files (:400-404)
    nte_dir = osp.join(video_dir, "nte")
    os.makedirs(nte_dir, exist_ok=True)
    for vn in video_names:
        np.save(osp.join(nte_dir, f"{vn}.npy"), npy_dict[vn])

    for k in ("embeds", "updrs", "diag", "tokens"):
        output[k] = np.concatenate(output[k], axis=0)

    base = osp.basename(metadata_file).split("_")[0].replace(".", "")
    data_path = osp.join(save_dir, f"{base}_dict_basic_{SUBSET_LEN}f.pkl")
    with open(data_path, "wb") as f:
        pickle.dump(output, f)
    scale_dict["extra_info"].update(unit_dict)
    scale_path = data_path.replace("dict", "scale_dict")
    with open(scale_path, "wb") as f:
        pickle.dump(scale_dict, f)
    return {"data": data_path, "scale": scale_path, "nte_dir": nte_dir}
