"""Vita-CLIP vision tower, TPU-native.

Functionally equivalent to the reference CLIPVisionEncoder + its prompt-aware
TransformerEncoderLayer (training/VitaCLIP_vision_encoder.py:18-132,
training/VitaCLIP_vision_encoder_utils.py:83-220):

  * per-frame ViT (patch conv, per-frame cls token, learned pos + temporal
    embeddings with nearest-neighbor resize for frame-count mismatch);
  * summary token: per-layer attention over the T frame cls tokens, appended
    to every frame's sequence during self-attention, stripped afterwards;
  * local prompts: per-layer learned (T, D) tokens, additively conditioned on
    the projected cls tokens, shared across frames;
  * global prompts: per-layer learned (G, D) tokens inserted after cls.

TPU-first design decisions:
  * input layout is channels-last (B, T, H, W, 3) — the natural TPU layout;
  * the patch conv (stride == kernel) is a pure reshape + one MXU matmul;
  * all 12 blocks run as one `lax.scan` over stacked weights (single compiled
    block body, optional remat);
  * attention softmax in fp32; matmuls in the configured compute dtype;
  * the broken promptless path of the reference (SURVEY.md §2.8-1) is fixed:
    every (summary, local, global) combination works here.
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import layer_norm, multi_head_attention, mlp, quick_gelu
from ..ops.linear import linear, mlp_block
from .common import (init_attention, init_layer_norm, init_linear,
                     prompt_init_limit)


@dataclass(frozen=True)
class VisionConfig:
    input_size: Tuple[int, int] = (224, 224)
    num_frames: int = 8
    feature_dim: int = 768
    patch_size: Tuple[int, int] = (16, 16)
    heads: int = 12
    layers: int = 12
    mlp_factor: float = 4.0
    embed_dim: int = 512
    use_summary_token: bool = False
    use_local_prompts: bool = False
    use_global_prompts: bool = False
    num_global_prompts: int = 8

    @property
    def num_patches(self) -> int:
        return (self.input_size[0] // self.patch_size[0]) * \
               (self.input_size[1] // self.patch_size[1])


def init_vision_params(rng, cfg: VisionConfig):
    D = cfg.feature_dim
    rngs = jax.random.split(rng, 8)
    patch_dim = cfg.patch_size[0] * cfg.patch_size[1] * 3

    def one_block(r):
        r1, r2, r3, r4, r5, r6 = jax.random.split(r, 6)
        blk = {
            "attn": init_attention(r1, D),
            "norm1": init_layer_norm(D),
            "mlp": {"fc1": init_linear(r2, D, round(cfg.mlp_factor * D), bias_std=1e-6),
                    "fc2": init_linear(r3, round(cfg.mlp_factor * D), D, bias_std=1e-6)},
            "norm2": init_layer_norm(D),
        }
        if cfg.use_summary_token or cfg.use_local_prompts:
            blk["cls_proj"] = init_linear(r4, D, D, xavier=False)
        if cfg.use_summary_token:
            blk["summary_ln"] = init_layer_norm(D)
            blk["summary_attn"] = init_attention(r5, D)
        if cfg.use_local_prompts:
            lim = prompt_init_limit(cfg.patch_size, D)
            blk["local_prompts"] = jax.random.uniform(
                r6, (1, cfg.num_frames, D), jnp.float32, -lim, lim)
        return blk

    block_rngs = jax.random.split(rngs[0], cfg.layers)
    blocks = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[one_block(r) for r in block_rngs])

    params = {
        "patch_embed": init_linear(rngs[1], patch_dim, D, xavier=False),
        "cls_token": 0.02 * jax.random.normal(rngs[2], (D,)),
        "pos_embed": 0.02 * jax.random.normal(rngs[3], (cfg.num_patches + 1, D)),
        "time_embed": 0.02 * jax.random.normal(rngs[4], (cfg.num_frames, D)),
        "blocks": blocks,
        "ln_pre": init_layer_norm(D),
        "ln_post": init_layer_norm(D),
        "proj": (D ** -0.5) * jax.random.normal(rngs[5], (D, cfg.embed_dim)),
    }
    if cfg.use_global_prompts:
        lim = prompt_init_limit(cfg.patch_size, D)
        params["global_prompts"] = jax.random.uniform(
            rngs[6], (cfg.layers, cfg.num_global_prompts, D), jnp.float32, -lim, lim)
    return params


def patch_embed(params, x: jax.Array, cfg: VisionConfig) -> jax.Array:
    """(BT, H, W, 3) -> (BT, N, D), the conv of reference ImagePatchEmbed2D.

    Plain-weight path: `lax.conv` with stride == kernel — XLA folds the
    patch relayout into the MXU operand load (0.34 ms at the (64, 224, 224,
    3) bench shape vs 1.74 ms when the (BT, h, w, ph, pw, C) transpose has
    to be materialized in HBM to feed an opaque Pallas GEMM). Quantized
    weights fall back to explicit reshape + linear."""
    BT, H, W, C = x.shape
    ph, pw = cfg.patch_size
    kernel = params["kernel"]
    if not isinstance(kernel, dict):
        wc = kernel.reshape(ph, pw, C, -1).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, wc, window_strides=(ph, pw), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(BT, (H // ph) * (W // pw), wc.shape[-1])
        bias = params.get("bias")
        return y if bias is None else y + bias.astype(y.dtype)
    x = x.reshape(BT, H // ph, ph, W // pw, pw, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)                   # (BT, h, w, ph, pw, C)
    x = x.reshape(BT, (H // ph) * (W // pw), ph * pw * C)
    return linear(params, x)


def patchify(x: jax.Array, patch_size: Tuple[int, int]) -> jax.Array:
    """(B, T, H, W, C) -> (B, T, N, ph*pw*C) patch-major layout.

    Host-side (numpy) or once-per-clip device use: shipping clips patch-major
    moves the conv's strided relayout out of the per-forward hot path — the
    patch embed becomes a plain GEMM on contiguous rows (int8-able), measured
    0.34 ms -> ~0.08 ms at the (64, 224, 224, 3) bench shape. Same bytes
    cross the host->device link, just reordered."""
    B, T, H, W, C = x.shape
    ph, pw = patch_size
    x = x.reshape(B, T, H // ph, ph, W // pw, pw, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(B, T, (H // ph) * (W // pw), ph * pw * C)


def fold_normalize_into_patch_embed(pe_params, mean, std,
                                    patch_size=(16, 16)):
    """Fold the uint8 -> normalized-float preprocessing into the patch-embed
    GEMM weights, so the device consumes RAW uint8 patch rows:

        ((u/255 - mean_c)/std_c) @ W + b  ==  u @ W' + b'
        W'[i, :] = W[i, :] / (255 * std[c(i)])
        b'       = b - sum_i (mean[c(i)] / std[c(i)]) * W[i, :]

    where c(i) = i % 3 is the RGB channel of patch-row element i (patchify
    keeps (ph, pw, C) order). Exact — per-channel normalize is affine in u.
    Quantize AFTER folding (the int8 sidecar must quantize W')."""
    import numpy as _np
    kernel = _np.asarray(pe_params["kernel"], _np.float32)
    P = kernel.shape[0]
    mean = _np.tile(_np.asarray(mean, _np.float32), P // 3)
    std = _np.tile(_np.asarray(std, _np.float32), P // 3)
    w = kernel / (255.0 * std)[:, None]
    b = pe_params.get("bias")
    b = _np.zeros(kernel.shape[1], _np.float32) if b is None \
        else _np.asarray(b, _np.float32)
    b = b - ((mean / std)[:, None] * kernel).sum(axis=0)
    out = dict(pe_params)
    out["kernel"] = w
    out["bias"] = b
    return out


def patch_embed_patches(params, x: jax.Array, compute_dtype) -> jax.Array:
    """Patch-major embed: (BT, N, ph*pw*C) -> (BT, N, D), one GEMM.

    With an int8 sidecar kernel ('kernel_q8' from quantize_tower_params
    act_quant mode) the GEMM runs on the int8 MXU via the fused w8a8 kernel;
    otherwise a plain (XLA-fused) matmul."""
    q8 = params.get("kernel_q8")
    from ..ops.int8_matmul import kernels_active
    if q8 is not None and kernels_active():
        from ..ops.int8_matmul import w8a8_matmul
        BT, N, P = x.shape
        y = w8a8_matmul(x.reshape(BT * N, P).astype(compute_dtype),
                        q8["qa"], q8["scale"],
                        bias=params.get("bias"))
        return y.reshape(BT, N, q8["qa"].shape[-1])
    return linear({"kernel": params["kernel"], "bias": params.get("bias")},
                  x.astype(compute_dtype))


def resize_time_embed(time_embed: jax.Array, T: int) -> jax.Array:
    """Nearest-neighbor resize of (T_train, D) to (T, D), matching
    F.interpolate(mode='nearest') in reference temporal_encoding
    (VitaCLIP_vision_encoder.py:86-100)."""
    T_train = time_embed.shape[0]
    if T == T_train:
        return time_embed
    idx = (jnp.arange(T) * T_train) // T
    return time_embed[idx]


def _block(p, g_prompt, x, cfg: VisionConfig, attn_impl: str,
           lx_valid: int | None = None):
    """One prompt-aware transformer block over per-frame token rows.

    x: (B*T, 1+N, D) = [cls, patches]. Returns (x, summary|None).

    lx_valid: set by vision_encoder's sublane-aligned serving layout —
    x carries (8-quantum) zero-pad rows after the first lx_valid real
    tokens so that every 3D<->2D reshape around the Pallas kernels is a
    layout-preserving bitcast (XLA otherwise materializes each one as a
    full repack copy, ~0.13 ms/layer at the bench shape: the (BT, 214, D)
    tiled layout pads every clip to 216 sublanes while the flat
    (BT*214, D) layout does not). Pad rows are masked out of the
    attention keys (k_segments) and otherwise just ride along row-locally.

    Semantics match reference TransformerEncoderLayer.forward
    (VitaCLIP_vision_encoder_utils.py:155-203) + the encoder's global-prompt
    insert/strip (VitaCLIP_vision_encoder.py:115-121), restructured
    TPU-first: the reference DISCARDS the attention/MLP outputs of the
    summary/local/global tokens (they are stripped right after), so here
    those tokens are appended as extra attention KEYS only — queries are
    just [cls, patches]. Attention is key-order-invariant, so logits match
    the reference within fp tolerance while saving the per-layer
    insert/strip concatenations and the discarded rows' attention+MLP
    compute (~25% of the attention FLOPs at the flagship shape).

    Note: like the reference (utils:160-162, `T = self.num_frames`), the
    summary/local grouping always uses the TRAIN-time frame count — an eval
    clip with T = k * num_frames is treated as k pseudo-videos here.
    """
    BT, Lx, D = x.shape
    G = cfg.num_global_prompts
    Tb = cfg.num_frames          # train-time frames (see docstring)
    Bb = BT // Tb

    k_q = p["attn"]["q"]["kernel"]
    k_out = p["attn"]["out"]["kernel"]
    from ..ops.int8_matmul import kernels_active
    w8a8 = isinstance(k_q, dict) and "qa" in k_q and kernels_active()
    fused_out = attn_impl == "flash" and isinstance(k_out, dict) and \
        "qa" in k_out

    from ..ops.extras_kernel import FUSED_EXTRAS
    # fused extras (A/B, GAVA_FUSED_EXTRAS=1): compute the whole prompt
    # machinery — cls_proj GEMM, summary LN + Tb-token attention, local/
    # global broadcasts, concat + sublane pad — in ONE Pallas launch
    # instead of ~10 launch-bound XLA ops (~0.14 ms/layer of dispatch gaps
    # in the ceiling accounting). Serving-aligned all-prompts-on path only.
    use_fused_extras = (FUSED_EXTRAS and w8a8 and fused_out
                        and lx_valid is not None
                        and cfg.use_summary_token and cfg.use_local_prompts
                        and cfg.use_global_prompts)

    summary = None
    extras = []
    fused_e = None
    if use_fused_extras:
        from ..ops.extras_kernel import fused_extras
        le = G + 1 + Tb
        le_pad = le + (-le % 8)
        fused_e, summary = fused_extras(
            x[:, 0], p, g_prompt.astype(x.dtype), Tb=Tb,
            num_heads=cfg.heads, le_pad=le_pad)
    else:
        if cfg.use_summary_token or cfg.use_local_prompts:
            cls = x[:, 0].reshape(Bb, Tb, D)
            cls_proj = linear(p["cls_proj"], cls)

        if cfg.use_global_prompts:
            extras.append(jnp.broadcast_to(g_prompt[None].astype(x.dtype),
                                           (BT, G, D)))
        if cfg.use_summary_token:
            s_norm = layer_norm(cls_proj, p["summary_ln"]["scale"],
                                p["summary_ln"]["bias"])
            summary = cls_proj + multi_head_attention(
                p["summary_attn"], s_norm, s_norm, s_norm, cfg.heads,
                impl="xla")
            extras.append(summary.reshape(BT, 1, D))
        if cfg.use_local_prompts:
            lp = p["local_prompts"].astype(x.dtype) + cls_proj  # (Bb, Tb, D)
            # every frame row of a pseudo-video attends over the same Tb
            # prompts
            extras.append(jnp.broadcast_to(lp[:, None], (Bb, Tb, Tb, D))
                          .reshape(BT, Tb, D))
    # NOTE (measured-rejected): a no-concat variant — projecting x and
    # extras through two separate qkv kernels and attending over both kv
    # sources with flash_attention_out_int8_2src — benched 586 clips/s vs
    # 609 for this path: the second kernel launch + its 3x768x768 weight
    # refetch per layer cost more than the 0.025 ms kv concat it saves.
    if w8a8:
        padded = lx_valid is not None and fused_out
        if use_fused_extras:
            le = G + 1 + Tb            # valid extras rows (pad masked out)
        elif padded and extras:
            # sublane-aligned layout: pad the extras group to the 8-row
            # quantum too, so the concatenated kv keeps every clip's row
            # count 8-aligned and kv.reshape(-1, D) stays a bitcast
            le = sum(e.shape[1] for e in extras)
            le_pad = -le % 8
            if le_pad:
                extras = extras + [jnp.zeros((BT, le_pad, D), x.dtype)]
        # w8a8 inference path: LayerNorm + shared quant + all three int8
        # projections in ONE fused kernel (q is a row-slice of the kv
        # output, so the generic shared-input dispatch in
        # multi_head_attention cannot trigger here)
        wq3 = tuple(p["attn"][n]["kernel"]["qa"] for n in ("q", "k", "v"))
        sc3 = tuple(p["attn"][n]["kernel"]["scale"]
                    for n in ("q", "k", "v"))
        b3 = tuple(p["attn"][n]["bias"] for n in ("q", "k", "v"))
        ln = (p["norm1"]["scale"], p["norm1"]["bias"])
        if padded and (extras or fused_e is not None):
            # aligned layout: the qkv kernel reads the patch rows and the
            # extras rows as two inputs and stitches them in VMEM —
            # the (BT, Lkv, D) kv concatenate never exists in HBM
            # (profiled at 0.6 ms/forward as an XLA concatenate)
            from ..ops.int8_matmul import w8a8_matmul3_cat
            if fused_e is not None:
                e = fused_e                 # already sublane-padded
            else:
                e = extras[0] if len(extras) == 1 else \
                    jnp.concatenate(extras, axis=1)
            cpb = max(c for c in (4, 2, 1) if BT % c == 0)
            qp, kp, vp = w8a8_matmul3_cat(x, e, wq3, sc3, bias3=b3,
                                          ln=ln, clips_per_block=cpb)
        else:
            kv = jnp.concatenate([x] + extras, axis=1) if extras else x
            from ..ops.int8_matmul import w8a8_matmul3
            outs = w8a8_matmul3(kv.reshape(-1, D), wq3, sc3, bias3=b3,
                                ln=ln)
            qp, kp, vp = (o.reshape(kv.shape) for o in outs)
        if fused_out and padded:
            # aligned serving layout: all Lx rows (incl. pad) are queries
            # and output rows; pad rows and the extras pad tail are masked
            # out of the keys by static segments
            from ..ops.flash_attention import flash_attention_out_int8
            segs = ((0, lx_valid),)
            if extras or fused_e is not None:
                segs = ((0, lx_valid), (Lx, Lx + le))
            x = flash_attention_out_int8(qp, kp, vp, cfg.heads,
                                         p["attn"]["out"], x, lq=Lx,
                                         k_segments=segs)
        elif fused_out:
            # attention + int8 out-projection + residual in one kernel:
            # the attention output never leaves VMEM. lq=Lx: the kernel
            # reads the first Lx rows of the FULL qkv projection as
            # queries, skipping the non-contiguous qp[:, :Lx] slice
            # materialization (one HBM round-trip of the query tensor
            # per layer)
            from ..ops.flash_attention import flash_attention_out_int8
            x = flash_attention_out_int8(qp, kp, vp, cfg.heads,
                                         p["attn"]["out"], x, lq=Lx)
        else:
            from ..ops.attention import attention_core
            attn = attention_core(qp[:, :Lx], kp, vp, cfg.heads,
                                  impl=attn_impl)
            x = x + linear(p["attn"]["out"], attn)
    elif isinstance(k_q, dict) and "qt" in k_q:
        # frozen-int8 TRAINING path: the fused inference qkv kernel for the
        # forward with a hand-written dx-only backward (the LN params and
        # int8 weights are frozen); attention + out-proj stay on their
        # differentiable implementations
        from ..ops.attention import attention_core
        from ..ops.int8_matmul import int8_qkv3_st
        a = p["attn"]
        kv = jnp.concatenate([x] + extras, axis=1) if extras else x
        kv2 = kv.reshape(-1, D)
        outs = int8_qkv3_st(
            kv2, a["q"]["kernel"]["qt"], a["k"]["kernel"]["qt"],
            a["v"]["kernel"]["qt"], a["q"]["kernel"]["scale"],
            a["k"]["kernel"]["scale"], a["v"]["kernel"]["scale"],
            a["q"]["bias"], a["k"]["bias"], a["v"]["bias"],
            p["norm1"]["scale"], p["norm1"]["bias"])
        qp, kp, vp = (o.reshape(kv.shape) for o in outs)
        attn = attention_core(qp[:, :Lx], kp, vp, cfg.heads, impl=attn_impl)
        x = x + linear(p["attn"]["out"], attn)
    else:
        kv = jnp.concatenate([x] + extras, axis=1) if extras else x
        kv_n = layer_norm(kv, p["norm1"]["scale"], p["norm1"]["bias"])
        x = x + multi_head_attention(p["attn"], kv_n[:, :Lx], kv_n, kv_n,
                                     cfg.heads, impl=attn_impl)
    x = mlp_block(p["mlp"], p["norm2"], x, quick_gelu, residual=x)
    return x, summary


def vision_encoder(params, x: jax.Array, cfg: VisionConfig,
                   compute_dtype=jnp.float32, attn_impl: str = "xla",
                   remat: bool = False, scan_unroll: int = 1,
                   input_format: str = "frames", pp=None):
    """Encode video (B, T, H, W, 3) -> (video_features (B, embed_dim),
    summary (B, feature_dim) | None).

    Equivalent to reference CLIPVisionEncoder.forward
    (VitaCLIP_vision_encoder.py:102-132): per-frame ViT, cls pooled through
    ln_post @ proj, mean over frames; summary = last block's summary-token
    attention output, mean over frames.

    input_format: 'frames' = (B, T, H, W, 3) pixels (conv patch embed);
    'patches' = (B, T, N, ph*pw*3) patch-major rows (see patchify) — the
    relayout was done upstream (host or once per clip), so the embed is a
    single contiguous GEMM.
    """
    D = cfg.feature_dim
    if input_format == "patches":
        B, T, N, P = x.shape
        x = patch_embed_patches(params["patch_embed"],
                                x.reshape(B * T, N, P), compute_dtype)
    else:
        B, T, H, W, C = x.shape
        x = x.reshape(B * T, H, W, C).astype(compute_dtype)
        x = patch_embed(params["patch_embed"], x, cfg)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype)[None, None], (B * T, 1, D))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    # temporal embedding (per frame index, broadcast over tokens)
    te = resize_time_embed(params["time_embed"], T).astype(x.dtype)  # (T, D)
    x = x + jnp.tile(te, (B, 1))[:, None, :]

    x = layer_norm(x, params["ln_pre"]["scale"], params["ln_pre"]["bias"])

    # sublane-aligned serving layout: on the fused w8a8+flash TPU path, pad
    # each clip's token rows (1+N=197 at 224^2/16) up to the 8-row quantum
    # so every (BT, L, D) <-> (BT*L, D) reshape around the Pallas kernels
    # compiles to a bitcast instead of a repack copy (the 3D tiled layout
    # pads L per clip, the flat layout doesn't; profiled at 1.53 ms of
    # reshape copies per forward = 12% of the w8a8 runtime). Pad rows are
    # masked out of attention keys inside the kernel (k_segments).
    lx_valid = None
    try:
        kq = params["blocks"]["attn"]["q"]["kernel"]
        ko = params["blocks"]["attn"]["out"]["kernel"]
        w8a8_serving = (isinstance(kq, dict) and "qa" in kq
                        and isinstance(ko, dict) and "qa" in ko)
    except (KeyError, TypeError):
        w8a8_serving = False
    Lx = x.shape[1]
    from ..ops.int8_matmul import kernels_active
    if (w8a8_serving and attn_impl == "flash"
            and kernels_active() and Lx % 8 != 0):
        lx_valid = Lx
        x = jnp.pad(x, ((0, 0), (0, -Lx % 8), (0, 0)))

    g_prompts = params.get("global_prompts")
    if g_prompts is None:
        g_prompts = jnp.zeros((cfg.layers, 0, D), x.dtype)

    Bb, Tb = (B * T) // cfg.num_frames, cfg.num_frames

    def scan_body(carry, layer_params):
        h, _ = carry
        p, g = layer_params
        h, summary = _block(p, g, h, cfg, attn_impl, lx_valid=lx_valid)
        if summary is None:
            # sized from the LOCAL h (not the closed-over full-batch Bb):
            # under pipeline_scan the carry is a microbatch slice
            summary = jnp.zeros((h.shape[0] // Tb, Tb, D), h.dtype)
        return (h, summary), None

    # remat: False/"none" saves all activations; True/"full" recomputes the
    # whole block in backward (lowest memory); "dots" saves GEMM outputs and
    # recomputes only the batched attention einsums + elementwise ops
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable — the
    # transformer-standard policy, trading HBM for ~half the recompute);
    # "save_attn" recomputes the block EXCEPT the flash-attention kernel
    # output (named 'attn_out' in ops/attention.py — skips the ~0.85
    # ms/layer flash forward re-run for ~84 MB/layer at the flagship train
    # shape); "save_attn_qkv" also keeps the q/k/v projections ('qkv',
    # ops/attention.py) so NOTHING upstream of the flash backward is
    # recomputed (the LN1+qkv GEMM re-run disappears); "save_attn_mlp"
    # additionally saves the pre-activation MLP hidden ('mlp_h',
    # ops/linear.py — drops the fc1 recompute, but the 4x-width residual's
    # HBM round-trip costs about what the recompute did at the flagship
    # shape, so save_attn_qkv is the measured default)
    if remat == "dots":
        body = jax.checkpoint(
            scan_body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    elif remat == "save_attn":
        body = jax.checkpoint(
            scan_body,
            policy=jax.checkpoint_policies.save_only_these_names("attn_out"))
    elif remat == "save_attn_qkv":
        body = jax.checkpoint(
            scan_body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_out", "qkv"))
    elif remat == "save_attn_mlp":
        body = jax.checkpoint(
            scan_body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_out", "qkv", "mlp_h"))
    elif remat and remat != "none":
        body = jax.checkpoint(scan_body)
    else:
        body = scan_body
    init_summary = jnp.zeros((Bb, Tb, D), x.dtype)
    if pp is not None:
        # pipeline parallelism over the block stack (forward/serving path;
        # the GPipe schedule in parallel/pipeline.py). Layer weights are
        # restaged (S, L/S, ...) inline — under jit+GSPMD the shard_map
        # in_specs shard them over the 'pipe' axis; pre-shard with
        # parallel.pipeline.stage_params to avoid the one-time reshuffle.
        assert not remat or remat == "none", \
            "pipeline parallelism is forward-path only (no remat)"
        from ..parallel.pipeline import pipeline_scan, restage
        pp_mesh, pp_micro = pp
        staged = restage((params["blocks"], g_prompts),
                         pp_mesh.shape["pipe"])

        def block_fn(carry, layer_params):
            return scan_body(carry, layer_params)[0]

        x, summary = pipeline_scan(block_fn, staged, (x, init_summary),
                                   pp_mesh, microbatches=pp_micro)
    else:
        (x, summary), _ = jax.lax.scan(body, (x, init_summary),
                                       (params["blocks"], g_prompts),
                                       unroll=scan_unroll)

    cls_x = layer_norm(x[:, 0], params["ln_post"]["scale"], params["ln_post"]["bias"])
    cls_x = cls_x @ params["proj"].astype(cls_x.dtype)
    video_features = cls_x.reshape(B, T, cfg.embed_dim).mean(axis=1)

    if cfg.use_summary_token:
        return video_features, summary.mean(axis=1)
    return video_features, None
