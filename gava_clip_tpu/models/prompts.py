"""Text prompt learning: CoOp-style learnable contexts + KAPT knowledge heads.

Rebuilds the behavior of the reference TextPromptLearner
(training/VitaCLIP_text_encoder.py:174-379) and ContextualPromptLearner
(training/kapt_head.py:24-214) as:
  * a host-side asset builder (tokenize prompts, slice frozen prefix/suffix
    embeddings, load knowledge files) producing padded dense arrays, and
  * pure jittable functions assembling (n_cls, max_kv, 77, W) prompt tensors.

TPU-first differences:
  * the reference keeps per-class Python lists (ragged n_kv); we pad to
    max_kv with a validity mask and batch everything;
  * the per-class projector MLP bank becomes stacked weights + one einsum.

Replicated quirk (intentional): in knowledge-aware mode the reference pools
text features at the EOT position of the *tokenized* prompt even though the
assembled sequence is shifted right by n_ctx learned tokens
(VitaCLIP_text_encoder.py:169 + :310-332). We reproduce the same pooling
index for checkpoint-level parity.

Knowledge-file formats honored (SURVEY.md §2.7):
  data/ke_<type>/EntityEmb_<kv>.npy   (n_cls, 768) KEPLER class embeddings
  data/ke_<type>/simQdesc_<kv>.txt    one description line per class
  data/ke_<type>/descriptor_<c>.txt   descriptor lines for class c
  data/ke_<type>/descriptor_<c>.npy   per-descriptor embeddings for class c
  data/ke_<type>/all.npy              (n_cls, 768) overall class embeddings
"""

import os
import os.path as osp
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..text import tokenize
from ..text.tokenizer import EOT_TOKEN


@dataclass(frozen=True)
class PromptConfig:
    n_cls: int
    n_ctx: int = 8                      # --text_num_prompts
    ctx_dim: int = 512                  # text transformer width
    inp_dim: int = 768                  # KEPLER embedding dim
    emb_dim: int = 128                  # projector hidden (ctx_dim // 4)
    init: str = ""                      # '' | subset of {split,uni,cntn,disc} joined by _
    csc: bool = False                   # class-specific contexts
    cls_type: str = "updrs"
    knowledge_versions: Tuple[str, ...] = ()
    use_descriptor: bool = False
    token_wise_mlp: bool = False
    knowledge_dir: str = ""             # default ./data/ke_<type-prefix>
    context_length: int = 77

    @property
    def knowledge_aware(self) -> bool:
        return self.init != ""

    @property
    def use_cntn(self) -> bool:
        return "cntn" in self.init.split("_")

    @property
    def cntn_split(self) -> bool:
        return "split" in self.init.split("_")

    @property
    def uni_mlp(self) -> bool:
        return "uni" in self.init.split("_")

    @property
    def use_disc(self) -> bool:
        return "disc" in self.init.split("_")

    def resolved_knowledge_dir(self) -> str:
        if self.knowledge_dir:
            return self.knowledge_dir
        return f"./data/ke_{self.cls_type.lower().split('_')[0]}"


def _read_lines(path: str) -> List[str]:
    with open(path, "r") as f:
        return [line.strip() for line in f]


def load_knowledge(cfg: PromptConfig) -> Tuple[List[np.ndarray], List[List[str]]]:
    """Load per-class continuous embeddings and discrete descriptions.

    Returns (cntn per class: list of (n_kv_c, 768) float arrays or empty,
    disc per class: list of n_kv_c strings). Mirrors kapt_head.py:59-111.
    """
    kdir = cfg.resolved_knowledge_dir()
    n_cls = cfg.n_cls
    cntn: List[np.ndarray] = [np.zeros((0, cfg.inp_dim), np.float32) for _ in range(n_cls)]
    disc: List[List[str]] = [[] for _ in range(n_cls)]

    if cfg.use_descriptor:
        ent_base = np.load(osp.join(kdir, "all.npy"))[:n_cls]
        for c in range(n_cls):
            lines = _read_lines(osp.join(kdir, f"descriptor_{c}.txt"))
            disc[c] = lines
            if cfg.use_cntn:
                if cfg.cntn_split:
                    cntn[c] = np.load(osp.join(kdir, f"descriptor_{c}.npy")).astype(np.float32)
                else:
                    cntn[c] = np.broadcast_to(
                        ent_base[c][None].astype(np.float32), (len(lines), cfg.inp_dim)).copy()
    else:
        if cfg.use_cntn and not cfg.cntn_split:
            ent0 = np.load(osp.join(kdir, "EntityEmb_v0.npy"))[:n_cls].astype(np.float32)
        for kv in cfg.knowledge_versions:
            if cfg.use_cntn:
                if cfg.cntn_split:
                    ent = np.load(osp.join(kdir, f"EntityEmb_{kv}.npy"))[:n_cls].astype(np.float32)
                else:
                    ent = ent0
                for c in range(n_cls):
                    cntn[c] = np.concatenate([cntn[c], ent[c][None]], axis=0)
            if cfg.use_disc:
                lines = _read_lines(osp.join(kdir, f"simQdesc_{kv}.txt"))
                for c in range(n_cls):
                    disc[c].append(lines[c])
            else:
                for c in range(n_cls):
                    disc[c].append("")
    return cntn, disc


@dataclass
class PromptAssets:
    """Frozen (non-trainable) buffers consumed by prompt assembly and the
    text tower. All arrays are dense, padded over the kv axis."""
    tokenized: np.ndarray       # (n_cls, max_kv, 77) int32
    kv_mask: np.ndarray         # (n_cls, max_kv) float32, 1 = valid
    pool_idx: np.ndarray        # (n_cls, max_kv) int32 — reference EOT quirk
    token_prefix: np.ndarray    # (n_cls, max_kv, 1, W)
    token_suffix: np.ndarray    # (n_cls, max_kv, 77-1-n_ctx, W)
    cntn_embeds: Optional[np.ndarray]  # (n_cls, max_kv, 768) or None
    prompt_texts: List[List[str]]      # for logging / analysis


def build_prompt_assets(classnames: Sequence[str], cfg: PromptConfig,
                        token_embedding: np.ndarray) -> PromptAssets:
    """Host-side: tokenize per-class prompt texts and precompute the frozen
    prefix/suffix embedding slices (reference text_encoder.py:246-307)."""
    n_cls = cfg.n_cls
    assert len(classnames) == n_cls
    classnames = [name.replace("_", " ") for name in classnames]

    cntn_list: List[np.ndarray] = []
    if cfg.knowledge_aware:
        cntn, disc = load_knowledge(cfg)
        prompts = [[d + " " + classnames[c] for d in disc[c]] for c in range(n_cls)]
        cntn_list = cntn
    else:
        prefix = " ".join(["X"] * cfg.n_ctx)
        prompts = [[prefix + " " + name + "."] for name in classnames]

    max_kv = max(len(p) for p in prompts)
    L = cfg.context_length
    W = token_embedding.shape[1]

    tokenized = np.zeros((n_cls, max_kv, L), np.int32)
    kv_mask = np.zeros((n_cls, max_kv), np.float32)
    for c in range(n_cls):
        # tokenize at the CONFIGURED context length — the tokenizer default
        # is 77 and a non-77 cfg.context_length would make the assignment
        # below shape-mismatch (or silently mis-slice the suffix)
        toks = tokenize(prompts[c], context_length=L)
        tokenized[c, :len(prompts[c])] = toks
        kv_mask[c, :len(prompts[c])] = 1.0
        # every prompt must actually carry its EOT (argmax on an all-False
        # row would silently pool at column 0)
        assert (toks == EOT_TOKEN).any(axis=-1).all(), \
            f"class {c}: tokenized prompt lost its EOT (too long?)"

    pool_idx = np.argmax(tokenized == EOT_TOKEN, axis=-1).astype(np.int32)

    embeds = token_embedding[tokenized.reshape(-1)].reshape(n_cls, max_kv, L, W)
    token_prefix = embeds[:, :, :1, :]
    if cfg.knowledge_aware:
        token_suffix = embeds[:, :, 1:L - cfg.n_ctx, :]
    else:
        token_suffix = embeds[:, :, 1 + cfg.n_ctx:, :]

    cntn_embeds = None
    if cfg.knowledge_aware and cfg.use_cntn:
        cntn_embeds = np.zeros((n_cls, max_kv, cfg.inp_dim), np.float32)
        for c in range(n_cls):
            k = cntn_list[c].shape[0]
            if k:
                cntn_embeds[c, :k] = cntn_list[c]

    return PromptAssets(tokenized=tokenized, kv_mask=kv_mask, pool_idx=pool_idx,
                        token_prefix=np.asarray(token_prefix, np.float32),
                        token_suffix=np.asarray(token_suffix, np.float32),
                        cntn_embeds=cntn_embeds, prompt_texts=prompts)


def init_prompt_params(rng, cfg: PromptConfig) -> Dict:
    """Learnable prompt parameters. Zero-init ctx + zero-init projectors in
    knowledge-aware mode (kapt_head.py:17-22,155; text_encoder.py:216-219);
    std-0.02 normal otherwise (text_encoder.py:231-238)."""
    W = cfg.ctx_dim
    params: Dict = {}
    if cfg.knowledge_aware:
        params["ctx"] = jnp.zeros((cfg.n_cls, cfg.n_ctx, W))
        if cfg.use_cntn:
            params["projector"] = _init_projector(cfg)
    else:
        shape = (cfg.n_cls, cfg.n_ctx, W) if cfg.csc else (cfg.n_ctx, W)
        params["ctx"] = 0.02 * jax.random.normal(rng, shape)
    return params


def _init_projector(cfg: PromptConfig) -> Dict:
    """Zero-initialized projection MLP(s), 768 -> emb_dim -> ReLU -> ctx_dim.

    Variants (kapt_head.py:113-155): class-wise (stacked per class; the
    exercised "split_uni" path uses bias-free MLPs), token-wise (stacked per
    token), or plain (single, with bias). All are stacked dense weights here.
    """
    I, E, O = cfg.inp_dim, cfg.emb_dim, cfg.ctx_dim
    if cfg.token_wise_mlp:
        n = cfg.n_ctx
        return {"w1": jnp.zeros((n, I, E)), "b1": jnp.zeros((n, E)),
                "w2": jnp.zeros((n, E, O)), "b2": jnp.zeros((n, O))}
    # class-wise is the reference default (kapt_head.py:42-43)
    if cfg.uni_mlp:
        return {"w1": jnp.zeros((cfg.n_cls, I, E)), "w2": jnp.zeros((cfg.n_cls, E, O))}
    return {"w1": jnp.zeros((cfg.n_cls, cfg.n_ctx, I, E)),
            "w2": jnp.zeros((cfg.n_cls, cfg.n_ctx, E, O))}


def _project_knowledge(proj: Dict, cntn: jax.Array, cfg: PromptConfig) -> jax.Array:
    """Apply the (zero-init) knowledge projector.

    cntn: (n_cls, max_kv, 768) -> (n_cls, max_kv, n_ctx, ctx_dim) additive
    context. Matches kapt_head.py:177-214 semantics for the exercised paths.
    """
    relu = jax.nn.relu
    if cfg.token_wise_mlp:
        # shared across classes: per-token MLPs (fixed version of the
        # reference's broken token_wise branch, kapt_head.py:199-204)
        h = relu(jnp.einsum("ckd,tde->ckte", cntn, proj["w1"]) + proj["b1"])
        out = jnp.einsum("ckte,teo->ckto", h, proj["w2"]) + proj["b2"]
        return out
    if cfg.uni_mlp:
        # class-wise single MLP, broadcast over the n_ctx token positions
        h = relu(jnp.einsum("ckd,cde->cke", cntn, proj["w1"]))
        out = jnp.einsum("cke,ceo->cko", h, proj["w2"])
        return jnp.broadcast_to(out[:, :, None, :],
                                out.shape[:2] + (cfg.n_ctx, out.shape[-1]))
    # class-wise per-token MLPs
    h = relu(jnp.einsum("ckd,ctde->ckte", cntn, proj["w1"]))
    return jnp.einsum("ckte,cteo->ckto", h, proj["w2"])


def assemble_prompts(params: Dict, buffers: Dict, cfg: PromptConfig) -> jax.Array:
    """Build the embedded prompt tensor (n_cls, max_kv, 77, W).

    [SOS] + (ctx [+ projected knowledge]) + suffix, 'end' token position —
    reference TextPromptLearner.forward (text_encoder.py:310-332).
    `buffers` holds token_prefix/token_suffix/cntn_embeds as jnp arrays.
    """
    prefix = buffers["token_prefix"]
    suffix = buffers["token_suffix"]
    n_cls, max_kv = prefix.shape[:2]

    ctx = params["ctx"]
    if not cfg.knowledge_aware and ctx.ndim == 2:
        ctx = jnp.broadcast_to(ctx[None], (n_cls,) + ctx.shape)
    # (n_cls, max_kv, n_ctx, W)
    ctx_kv = jnp.broadcast_to(ctx[:, None], (n_cls, max_kv) + ctx.shape[1:])

    if cfg.knowledge_aware and cfg.use_cntn:
        ctx_kv = ctx_kv + _project_knowledge(params["projector"],
                                             buffers["cntn_embeds"], cfg)

    return jnp.concatenate([prefix, ctx_kv, suffix], axis=-2)
