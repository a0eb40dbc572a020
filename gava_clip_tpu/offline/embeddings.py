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
