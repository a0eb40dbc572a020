"""Flagship model builders.

The flagship configuration mirrors the reference's TULIP UPDRS training setup
(train_scripts/updrs_3cls_train_tulip.sh): ViT-B/16 with summary/local/global
prompts, KAPT split_uni prompts over 5 knowledge versions, support memory and
NTE heads. When real knowledge/backbone assets are absent (e.g. CI or a fresh
checkout), synthetic stand-ins with the correct shapes are generated so the
graph compiles and benchmarks end-to-end.
"""

import os
import os.path as osp
import tempfile
from typing import Optional, Sequence, Tuple

import numpy as np

from ..models.prompts import PromptConfig
from ..models.text import TextConfig
from ..models.vision import VisionConfig
from ..models.vita_clip import VitaClip, VitaClipConfig

UPDRS_3CLS_CLASSNAMES = ("normal", "slight difficulty", "moderate difficulty")
UPDRS_3CLS_LABELS = ("normal", "slight", "moderate")


def make_synthetic_knowledge_dir(n_cls: int, versions: Sequence[str],
                                 seed: int = 0) -> str:
    """Create a temp data/ke_* directory with synthetic KEPLER embeddings and
    class descriptions in the reference file formats (SURVEY.md §2.7)."""
    kdir = tempfile.mkdtemp(prefix="gava_ke_")
    rs = np.random.RandomState(seed)
    np.save(osp.join(kdir, "EntityEmb_v0.npy"),
            rs.randn(n_cls, 768).astype(np.float32))
    np.save(osp.join(kdir, "all.npy"), rs.randn(n_cls, 768).astype(np.float32))
    for kv in versions:
        np.save(osp.join(kdir, f"EntityEmb_{kv}.npy"),
                rs.randn(n_cls, 768).astype(np.float32))
        with open(osp.join(kdir, f"simQdesc_{kv}.txt"), "w") as f:
            for c in range(n_cls):
                f.write(f"a person walking with gait pattern {kv} of severity "
                        f"level {c} showing step irregularities\n")
    return kdir


def build_flagship(num_frames: int = 8,
                   num_classes: int = 3,
                   knowledge_versions: Sequence[str] = ("v1", "v2", "v3", "v4", "v5"),
                   knowledge_dir: Optional[str] = None,
                   backbone_path: Optional[str] = None,
                   use_support_memory: bool = True,
                   add_nte: bool = True,
                   input_size: int = 224,
                   rng_seed: int = 0) -> VitaClip:
    """ViT-B/16 Vita-CLIP with the full GaVA head stack."""
    if knowledge_dir is None:
        knowledge_dir = make_synthetic_knowledge_dir(num_classes, knowledge_versions)

    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(input_size, input_size),
                            num_frames=num_frames, feature_dim=768,
                            patch_size=(16, 16), heads=12, layers=12,
                            mlp_factor=4.0, embed_dim=512,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=8),
        text=TextConfig(embed_dim=512, width=512, heads=8, layers=12),
        num_classes=num_classes, cls_type="updrs",
        use_text_prompt_learning=True,
        prompt=PromptConfig(n_cls=num_classes, n_ctx=8, ctx_dim=512, emb_dim=128,
                            init="cntn_split_uni_disc", csc=True,
                            cls_type="updrs",
                            knowledge_versions=tuple(knowledge_versions),
                            knowledge_dir=knowledge_dir),
        use_support_memory=use_support_memory, add_nte=add_nte)

    backbone_state = None
    if backbone_path and osp.isfile(backbone_path):
        from .torch_convert import load_torch_state_dict
        backbone_state = load_torch_state_dict(backbone_path)

    import jax
    return VitaClip(cfg, classnames=list(UPDRS_3CLS_CLASSNAMES),
                    backbone_state=backbone_state,
                    rng=jax.random.PRNGKey(rng_seed))


def inject_clip_pathologies(params, seed: int = 0,
                            ln_outlier_frac: float = 0.04,
                            ln_outlier_scale: float = 8.0,
                            w_heavy_frac: float = 0.02,
                            w_heavy_scale: float = 16.0):
    """Give a synthetic tower the int8 failure modes of real CLIP weights.

    Real CLIP towers are not N(0, 0.02): they carry (a) a few activation
    outlier channels — LayerNorm gains an order of magnitude above the
    median, which blow up per-token activation scales (the documented
    w8a8 failure mode), and (b) heavy-tailed weight rows that inflate
    per-output-channel weight scales. This mutates a vision-tower pytree
    in the same two ways so the quantization accuracy gate is measured on
    outlier-bearing weights instead of a friendly Gaussian
    (VERDICT r2 #2; reference math protected:
    training/VitaCLIP_model.py:296-306).

    Returns a new pytree (input is not mutated).
    """
    import jax

    rs = np.random.RandomState(seed)

    def boost_channels(x, frac, scale):
        x = np.array(x, np.float32, copy=True)
        flat = x.reshape(-1, x.shape[-1])
        n = max(1, int(round(x.shape[-1] * frac)))
        for row in flat:
            idx = rs.choice(x.shape[-1], n, replace=False)
            row[idx] *= scale
        return x.reshape(x.shape)

    def heavy_rows(k, frac, scale):
        # stacked (L, in, out) or (in, out) kernels: scale a sparse set of
        # input rows (inflates every output channel's absmax)
        k = np.array(k, np.float32, copy=True)
        stk = k.reshape((-1,) + k.shape[-2:])
        n = max(1, int(round(stk.shape[1] * frac)))
        for layer in stk:
            idx = rs.choice(layer.shape[0], n, replace=False)
            layer[idx] *= scale
        return k.reshape(k.shape)

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    visual = {k: v for k, v in params["visual"].items()}
    blocks = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in visual["blocks"].items()}
    for ln in ("norm1", "norm2"):
        blocks[ln] = dict(blocks[ln])
        blocks[ln]["scale"] = boost_channels(blocks[ln]["scale"],
                                             ln_outlier_frac, ln_outlier_scale)
    for mod, names in (("attn", ("q", "k", "v", "out")),
                       ("mlp", ("fc1", "fc2"))):
        blocks[mod] = {k: (dict(v) if isinstance(v, dict) else v)
                       for k, v in blocks[mod].items()}
        for nm in names:
            blocks[mod][nm] = dict(blocks[mod][nm])
            blocks[mod][nm]["kernel"] = heavy_rows(
                blocks[mod][nm]["kernel"], w_heavy_frac, w_heavy_scale)
    visual["blocks"] = blocks
    params["visual"] = visual
    return params


def build_zero_shot(num_frames: int = 8, num_classes: int = 400,
                    input_size: int = 224,
                    text_features: Optional[np.ndarray] = None,
                    backbone_path: Optional[str] = None,
                    rng_seed: int = 0) -> VitaClip:
    """Zero-shot eval model (reference zero_shot.py path): vision prompts on,
    text prompt learning off, precomputed text features."""
    if text_features is None:
        rs = np.random.RandomState(rng_seed)
        text_features = rs.randn(num_classes, 512).astype(np.float32)
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(input_size, input_size),
                            num_frames=num_frames, feature_dim=768,
                            patch_size=(16, 16), heads=12, layers=12,
                            mlp_factor=4.0, embed_dim=512,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=8),
        text=TextConfig(),
        num_classes=num_classes, zeroshot_evaluation=True)
    backbone_state = None
    if backbone_path and osp.isfile(backbone_path):
        from .torch_convert import load_torch_state_dict
        backbone_state = load_torch_state_dict(backbone_path)
    import jax
    return VitaClip(cfg, backbone_state=backbone_state,
                    zeroshot_text_features=text_features,
                    rng=jax.random.PRNGKey(rng_seed))
