"""Embedding preparation tools — counterpart of reference
utils/prepare_embedding.py.

  * encode_text_file / encode_texts: text lines (or a JSON list) -> CLIP
    text embeddings saved as .npy (reference :264-309); this is how the
    knowledge files data/ke_*/EntityEmb-style .npy assets are produced from
    description text when no KEPLER embeddings exist.
  * extract_class_text_features: replay a trained checkpoint's prompt
    learner + text tower to recover the learned per-class text features
    (reference :311-379) — equivalent to the text_features slot saved in our
    checkpoints but recomputable from weights alone.
  * encode_videos_to_class_dict: run videos through the vision tower and
    group the embeddings by label (reference :381-459).
"""

import json
import os.path as osp
from collections import defaultdict
from typing import Dict, Optional, Sequence

import numpy as np

from ..text import tokenize


def encode_texts(texts: Sequence[str], text_params: Dict, text_cfg=None,
                 batch: int = 256) -> np.ndarray:
    import jax
    import jax.numpy as jnp
    from ..models.text import TextConfig, encode_text_tokens
    text_cfg = text_cfg or TextConfig()
    params = jax.tree_util.tree_map(jnp.asarray, text_params)
    outs = []
    for i in range(0, len(texts), batch):
        toks = tokenize(list(texts[i:i + batch]), truncate=True)
        outs.append(np.asarray(encode_text_tokens(params, jnp.asarray(toks),
                                                  text_cfg)))
    return np.concatenate(outs, axis=0)


def encode_text_file(path: str, text_params: Dict, text_cfg=None,
                     out_path: Optional[str] = None,
                     json_key: Optional[str] = None) -> str:
    if path.endswith(".json"):
        with open(path) as f:
            data = json.load(f)
        texts = data[json_key] if json_key else data
        if isinstance(texts, dict):
            texts = list(texts.values())
    else:
        with open(path) as f:
            texts = [line.strip() for line in f if line.strip()]
    feats = encode_texts(texts, text_params, text_cfg)
    out_path = out_path or osp.splitext(path)[0] + ".npy"
    np.save(out_path, feats)
    return out_path


_DIGITS = ["one", "two", "three", "four", "five", "six", "seven", "eight",
           "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
           "fifteen", "sixteen", "seventeen", "eighteen", "nineteen",
           "twenty"]
_TENS = ["twenty", "thirty", "forty", "fifty", "sixty", "seventy", "eighty",
         "ninety"]

# graduated-adjective probe templates (reference prepare_embedding.py:57-72)
LEVEL_TEMPLATES = {
    "distance": ["the difference in distance covered between a left step and "
                 "a right step is {:s}",
                 "the distance covered from the first contact of right foot "
                 "to the first contact of the left foot is {:s}"],
    "percentage": ["the percentage of the duration when only the left foot "
                   "contacts the ground within one gait cycle is {:s}",
                   "the percentage of the duration when the left foot is off "
                   "the ground within the left walk cycle is {:s}"],
}
LEVEL_WORDS = {
    "speed": ["very slow", "slow", "quick", "fast"],
    "cadence": ["few", "limited", "minimal", "numerous", "maximal",
                "frequent"],
    "distance": ["close", "short", "small", "large", "long", "far"],
    "percentage": ["low", "small", "minor", "large", "high", "major"],
}


def number_words(n: int) -> Sequence[str]:
    """English words for 1..n-1 (reference prepare_embedding.py:41-57 —
    with its multiples-of-ten bug fixed: the reference renders 30 as
    'thirty-twenty' because i%10-1 wraps to digits[-1])."""
    assert 0 < n < 1000
    out = []
    for i in range(1, n):
        if i < 21:
            out.append(_DIGITS[i - 1])
        elif i < 100:
            tens = _TENS[i // 10 - 2]
            out.append(tens if i % 10 == 0 else
                       f"{tens}-{_DIGITS[i % 10 - 1]}")
        else:
            rem = i % 100
            word = f"{_DIGITS[i // 100 - 1]} hundred"
            if rem:
                word += " " + number_words(rem + 1)[-1]
            out.append(word)
    return out


def _sim_and_dist(embeds: np.ndarray):
    normed = embeds / np.linalg.norm(embeds, axis=-1, keepdims=True)
    sim = normed @ normed.T
    sq = (normed ** 2).sum(-1)
    dist = np.sqrt(np.maximum(sq[:, None] + sq[None] - 2 * (normed @ normed.T),
                              0.0))
    return sim, dist


def number_distance_study(text_params, text_cfg=None, n: int = 100) -> Dict:
    """How does the frozen CLIP text tower space out numeric words?
    (reference prepare_embedding.py:35-160). Returns cosine-similarity and
    euclidean-distance matrices for 'This image has <k> dogs' (k=1..n-1)
    plus per-template matrices for the graduated level words. Sentences are
    encoded in ONE batched text-tower call, not the reference's per-sentence
    loop."""
    texts = [f"This image has {t} dogs" for t in number_words(n)]
    sim, dist = _sim_and_dist(encode_texts(texts, text_params, text_cfg))
    out = {"numbers": {"similarity": sim, "distance": dist, "texts": texts}}
    for kind, templates in LEVEL_TEMPLATES.items():
        for ti, tf in enumerate(templates):
            level_texts = [tf.format(w) for w in LEVEL_WORDS[kind]]
            s, d = _sim_and_dist(encode_texts(level_texts, text_params,
                                              text_cfg))
            out[f"{kind}_{ti}"] = {"similarity": s, "distance": d,
                                   "texts": level_texts}
    return out


def pe_distance_study(text_params, text_cfg=None, n: int = 150,
                      l2_norm: float = 0.5) -> Dict:
    """Sinusoidal-PE numeric encoding geometry (reference
    prepare_embedding.py:162-238): one frozen sentence embedding
    ('the walking speed is X') is added to every row-normalized PE row;
    returns the cosine/euclidean matrices over the n shifted rows."""
    from .metadata import make_pe
    d_model = (text_cfg.embed_dim if text_cfg is not None else 512)
    pe = make_pe(n, d_model, l2_norm=l2_norm)
    base = encode_texts(["the walking speed is X"], text_params, text_cfg)[0]
    shifted = pe + base[None, :]
    sim, dist = _sim_and_dist(shifted)
    return {"similarity": sim, "distance": dist}


def extract_class_text_features(model, params) -> np.ndarray:
    """Learned per-class text features from a (restored) model's params."""
    import jax
    return np.asarray(jax.jit(model.text_features_only)(params, model.buffers))


def encode_videos_to_class_dict(model, params, loader, mean, std,
                                batch_size: int) -> Dict[int, np.ndarray]:
    """{label: (N_label, embed_dim) L2-normalized video features}."""
    import jax
    import jax.numpy as jnp
    from ..data.device_preprocess import normalize_frames
    from ..models.vision import vision_encoder

    @jax.jit
    def forward(params, video_u8):
        video = normalize_frames(video_u8, mean, std)
        feats, _ = vision_encoder(params["visual"], video, model.cfg.vision)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    grouped = defaultdict(list)
    for batch in loader:
        video = batch["video"]
        n = video.shape[0]
        if n < batch_size:
            video = np.concatenate(
                [video, np.repeat(video[-1:], batch_size - n, axis=0)])
        feats = np.asarray(forward(params, jnp.asarray(video)))[:n]
        for f, lab in zip(feats, np.asarray(batch["labels"])[:n]):
            grouped[int(lab)].append(f[None])
    return {k: np.concatenate(v, axis=0) for k, v in grouped.items()}
