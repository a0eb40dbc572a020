"""VitaCLIP top-level model: vision + text towers, prompt learning, and the
support-memory / NTE contrastive heads, computed in one jittable graph.

Functional rebuild of reference training/VitaCLIP_model.py:22-401. The
`apply` function is pure: (params, buffers, inputs) -> outputs, so the whole
forward+loss+grad lives in a single jit/pjit region.

TPU-first deviations from the reference (behavior-preserving):
  * the per-class Python loop over text-tower calls (reference :282-290)
    becomes ONE batched (n_cls*max_kv, 77) text forward with a kv mask;
  * the per-class memory-projection ModuleList (:182-190) becomes stacked
    weights + einsums;
  * text_features are returned explicitly instead of stored as a module
    side effect (:293) — the checkpoint writer persists them the same way.
"""

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.linear import linear
from .common import init_linear
from .prompts import (PromptAssets, PromptConfig, assemble_prompts,
                      build_prompt_assets, init_prompt_params)
from .text import TextConfig, encode_text_embeds, init_text_params
from .vision import VisionConfig, init_vision_params, vision_encoder

NUM_COMB = 70


@dataclass(frozen=True)
class VitaClipConfig:
    vision: VisionConfig = field(default_factory=VisionConfig)
    text: TextConfig = field(default_factory=TextConfig)
    num_classes: int = 4
    cls_type: str = "updrs"
    use_text_prompt_learning: bool = False
    prompt: Optional[PromptConfig] = None
    zeroshot_evaluation: bool = False
    use_support_memory: bool = False
    detach_features: bool = False
    add_nte: bool = False
    use_sigmoid_loss: bool = False


def _l2norm(x, axis=-1, eps=0.0):
    # eps > 0 guards an all-zero row (0/0 = NaN); the default 0.0 matches
    # the reference's unguarded x / x.norm()
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def init_head_params(rng, cfg: VitaClipConfig) -> Dict:
    """Logit scales + NTE/memory head parameters (reference :92,148-200)."""
    E = cfg.text.embed_dim
    D = cfg.vision.feature_dim
    rngs = jax.random.split(rng, 8)
    params: Dict = {}
    if cfg.use_sigmoid_loss:
        params["logit_scale"] = jnp.asarray(np.log(np.log(10.0)), jnp.float32)
        params["logit_bias"] = jnp.asarray(-10.0, jnp.float32)
    else:
        params["logit_scale"] = jnp.asarray(np.log(1.0 / 0.07), jnp.float32)
    if cfg.add_nte:
        params["sum_proj"] = init_linear(rngs[0], D, E, xavier=False)
        params["logit_scale_vm"] = jnp.asarray(
            np.log(10.0) if cfg.use_sigmoid_loss else 100.0, jnp.float32)
    if cfg.use_support_memory:
        params["tf_project"] = {"fc1": init_linear(rngs[1], E, E // 4, xavier=False),
                                "fc2": init_linear(rngs[2], E // 4, E // 8, xavier=False)}
        n = cfg.num_classes
        mp1 = [init_linear(r, E, E // 4, xavier=False)
               for r in jax.random.split(rngs[3], n)]
        mp2 = [init_linear(r, E // 4, E // 8, xavier=False)
               for r in jax.random.split(rngs[4], n)]
        params["memory_project"] = {
            "w1": jnp.stack([p["kernel"] for p in mp1]),
            "b1": jnp.stack([p["bias"] for p in mp1]),
            "w2": jnp.stack([p["kernel"] for p in mp2]),
            "b2": jnp.stack([p["bias"] for p in mp2]),
        }
        params["logit_scale_mt"] = jnp.asarray(
            np.log(10.0) if cfg.use_sigmoid_loss else 100.0, jnp.float32)
        if cfg.use_sigmoid_loss:
            params["logit_bias_mt"] = jnp.asarray(-10.0, jnp.float32)
    return params


class VitaClip:
    """Config + frozen-buffer holder with pure `apply`.

    Construction mirrors the reference ctor flow: build towers, overlay the
    CLIP backbone (non-strict), then derive prompt buffers from the (loaded)
    token embedding (reference VitaCLIP_model.py:102-219).
    """

    def __init__(self, cfg: VitaClipConfig,
                 classnames: Optional[Sequence[str]] = None,
                 backbone_state: Optional[Dict[str, np.ndarray]] = None,
                 zeroshot_text_features: Optional[np.ndarray] = None,
                 rng: Optional[jax.Array] = None):
        if cfg.add_nte and not cfg.vision.use_summary_token:
            # the NTE branch consumes the vision tower's summary tokens
            # (reference VitaCLIP_model.py:330-348 reads the summary path);
            # without this check the failure is an opaque NoneType error
            # deep inside a jit trace
            raise ValueError("add_nte=True requires "
                             "vision.use_summary_token=True")
        self.cfg = cfg
        # initialize on host CPU: parameter init is thousands of tiny ops —
        # running them eagerly over a TPU tunnel is minutes of RPC latency;
        # jit moves the weights to device on first use anyway.
        # local_devices, not devices: in a multi-process run jax.devices()
        # leads with process 0's devices, which are NON-addressable on other
        # ranks — init must land on a device this process owns
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            r_vis, r_txt, r_prompt, r_head = jax.random.split(rng, 4)

            params: Dict = {"visual": init_vision_params(r_vis, cfg.vision)}
            if cfg.use_text_prompt_learning:
                params["textual"] = init_text_params(r_txt, cfg.text)

            if backbone_state is not None:
                from ..utils.torch_convert import (convert_text_tower,
                                                   convert_vision_tower,
                                                   merge_pytrees, strip_prefix)
                vis_sd = strip_prefix(backbone_state, "visual.")
                if vis_sd:
                    loaded = convert_vision_tower(vis_sd, cfg.vision.layers)
                    params["visual"] = merge_pytrees(
                        params["visual"],
                        jax.tree_util.tree_map(jnp.asarray, loaded))
                txt_sd = strip_prefix(backbone_state, "textual.")
                if txt_sd and cfg.use_text_prompt_learning:
                    loaded = convert_text_tower(txt_sd, cfg.text.layers)
                    params["textual"] = merge_pytrees(
                        params["textual"],
                        jax.tree_util.tree_map(jnp.asarray, loaded))

            buffers: Dict = {}
            if cfg.use_text_prompt_learning:
                assert classnames is not None and cfg.prompt is not None
                token_embedding = np.asarray(params["textual"]["token_embedding"])
                assets = build_prompt_assets(classnames, cfg.prompt, token_embedding)
                self.prompt_assets = assets
                buffers["token_prefix"] = jnp.asarray(assets.token_prefix)
                buffers["token_suffix"] = jnp.asarray(assets.token_suffix)
                buffers["kv_mask"] = jnp.asarray(assets.kv_mask)
                buffers["pool_idx"] = jnp.asarray(assets.pool_idx)
                if assets.cntn_embeds is not None:
                    buffers["cntn_embeds"] = jnp.asarray(assets.cntn_embeds)
                params["prompt"] = init_prompt_params(r_prompt, cfg.prompt)
            if cfg.zeroshot_evaluation:
                assert zeroshot_text_features is not None
                buffers["text_features"] = jnp.asarray(zeroshot_text_features)

            params.update(init_head_params(r_head, cfg))
        # hand back UNCOMMITTED host arrays: arrays created under
        # default_device(cpu) are committed to CPU and would pin any jit
        # consuming them to the CPU backend; numpy leaves let jit place them
        # on the run's default device instead.
        self.params = jax.tree_util.tree_map(np.asarray, params)
        self.buffers = jax.tree_util.tree_map(np.asarray, buffers)

    def text_features_only(self, params: Dict, buffers: Dict,
                           compute_dtype=jnp.float32) -> jax.Array:
        """Per-class text features without running the vision tower
        (the masked-mean of per-kv pooled features, VitaCLIP_model.py:278-293)."""
        cfg = self.cfg
        assert cfg.use_text_prompt_learning
        tf, kv_mask, kv_count = self._per_kv_text_features(
            params, buffers, compute_dtype=compute_dtype)
        return _l2norm((tf * kv_mask[..., None]).sum(1) / kv_count)

    def _per_kv_text_features(self, params, buffers, compute_dtype,
                              attn_impl: str = "xla"):
        """Shared text-branch core (apply + text_features_only must never
        diverge — the kv-masked mean and the EOT-pooling quirk are
        parity-sensitive): assemble prompts, batch-encode, l2-normalize.
        Returns (tf (n_cls, max_kv, E), kv_mask, kv_count)."""
        cfg = self.cfg
        prompt_embeds = assemble_prompts(params["prompt"], buffers, cfg.prompt)
        n_cls, max_kv, L, W = prompt_embeds.shape
        tf = encode_text_embeds(params["textual"],
                                prompt_embeds.reshape(n_cls * max_kv, L, W),
                                buffers["pool_idx"].reshape(n_cls * max_kv),
                                cfg.text, compute_dtype=compute_dtype,
                                attn_impl=attn_impl)
        tf = _l2norm(tf.astype(jnp.float32)).reshape(n_cls, max_kv, -1)
        kv_mask = buffers["kv_mask"]
        kv_count = jnp.maximum(kv_mask.sum(-1, keepdims=True), 1.0)
        return tf, kv_mask, kv_count

    # ----- pure forward ---------------------------------------------------

    def apply(self, params: Dict, buffers: Dict, x: jax.Array,
              memory: Optional[jax.Array] = None,
              video_nte: Optional[jax.Array] = None,
              desc_wise: bool = False,
              compute_dtype=jnp.float32,
              attn_impl: str = "xla",
              remat: bool = False,
              scan_unroll: int = 1,
              input_format: str = "frames",
              pp=None) -> Dict[str, jax.Array]:
        """Forward pass.

        x: video (B, T, H, W, 3) — or (B, T, N, ph*pw*3) patch-major rows
        with input_format='patches' (models/vision.py patchify); memory:
        (Bm, S, E); video_nte: (B, 70, E).
        pp: optional (mesh-with-'pipe'-axis, microbatches) — pipeline-
        parallel execution of the vision block stack (forward path;
        parallel/pipeline.py).
        Returns dict with logits (B, n_cls), text_features (n_cls, E), and
        optionally logits_mt (Bm, n_cls), logits_vm (B, B), desc_logits.
        Mirrors reference VitaCLIP.forward (VitaCLIP_model.py:241-401).
        """
        cfg = self.cfg
        out: Dict[str, jax.Array] = {}

        video_features, summary = vision_encoder(
            params["visual"], x, cfg.vision, compute_dtype=compute_dtype,
            attn_impl=attn_impl, remat=remat, scan_unroll=scan_unroll,
            input_format=input_format, pp=pp)
        video_features = _l2norm(video_features.astype(jnp.float32))
        logit_scale = jnp.exp(params["logit_scale"])

        if cfg.use_text_prompt_learning:
            tf, kv_mask, kv_count = self._per_kv_text_features(
                params, buffers, compute_dtype=compute_dtype,
                attn_impl=attn_impl)

            sim = logit_scale * jnp.einsum("be,cke->bck", video_features, tf)
            if desc_wise:
                out["desc_logits"] = sim                        # (B, n_cls, max_kv)
            logits = (sim * kv_mask[None]).sum(-1) / kv_count[None, :, 0]

            text_features = (tf * kv_mask[..., None]).sum(1) / kv_count
            text_features = _l2norm(text_features)
        else:
            text_features = _l2norm(buffers["text_features"].astype(jnp.float32))
            logits = logit_scale * video_features @ text_features.T

        if "logit_bias" in params:
            logits = logits + params["logit_bias"]
        out["logits"] = logits
        out["text_features"] = text_features
        if summary is not None:
            out["summary"] = summary

        if cfg.add_nte and video_nte is not None:
            sum_proj = linear(params["sum_proj"], summary.astype(jnp.float32))
            sum_proj = _l2norm(sum_proj)
            valid = (video_nte.sum(axis=(-1, -2)) != 0).astype(jnp.float32)
            valid_mat = jax.lax.stop_gradient(valid[:, None] * valid[None, :])
            # safe norm: all-zero NTE rows (missing .npy) stay zero instead of
            # 0/0=NaN — they are masked by valid_mat anyway; identical result
            # for present NTEs (the reference would NaN here, dataset.py:152)
            nte32 = video_nte.astype(jnp.float32)
            nte = nte32 / jnp.maximum(jnp.linalg.norm(nte32, axis=-1, keepdims=True), 1e-12)
            # mean over the NUM_COMB combination rows of <sum_i, nte_{j,m}>
            similarity = jnp.einsum("ie,jme->ij", sum_proj, nte) / nte.shape[1]
            logits_mat = params["logit_scale_vm"] * (similarity * valid_mat)
            out["logits_vm"] = (jax.nn.log_softmax(logits_mat, axis=-1)
                                + jax.nn.log_softmax(logits_mat, axis=-2))

        if cfg.use_support_memory and memory is not None:
            tfm = text_features
            if cfg.detach_features:
                tfm = jax.lax.stop_gradient(tfm)
            mp = params["memory_project"]
            mem = memory.astype(jnp.float32).mean(axis=1)        # (Bm, E)
            h = jnp.tanh(jnp.einsum("me,ceh->cmh", mem, mp["w1"]) + mp["b1"][:, None])
            memo = jnp.einsum("cmh,chk->cmk", h, mp["w2"]) + mp["b2"][:, None]
            memo = _l2norm(memo)                                 # (n_cls, Bm, E/8)
            tfp = linear(params["tf_project"]["fc2"],
                         jnp.tanh(linear(params["tf_project"]["fc1"], tfm)))
            tfp = _l2norm(tfp)                                   # (n_cls, E/8)
            cols = jnp.einsum("cmk,ck->mc", memo, tfp)
            logits_mt = jax.nn.log_softmax(params["logit_scale_mt"] * cols, axis=-1)
            if "logit_bias_mt" in params:
                logits_mt = logits_mt + params["logit_bias_mt"]
            out["logits_mt"] = logits_mt

        return out


def trainable_mask(params: Dict, cfg: VitaClipConfig) -> Dict:
    """True where a parameter is trainable — the reference freezing rule
    (VitaCLIP_model.py:230-239): inside `visual`, only names containing
    summary/local/global/time_embed train; `textual` is fully frozen;
    everything else (prompt ctx/projector, heads, logit scales) trains."""
    def decide(path, _leaf) -> bool:
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        if keys[0] == "visual":
            name = "/".join(keys)
            return any(s in name for s in ("summary", "local", "global", "time_embed"))
        if keys[0] == "textual":
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)
