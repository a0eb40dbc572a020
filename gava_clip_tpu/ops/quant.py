"""Weight-only int8 quantization for serving.

Per-output-channel symmetric int8 weights with fp32 scales halve HBM traffic
again over bf16 (the ViT-B/16 inference path is partly weight-bandwidth
bound at small batches). Dequantization happens next to the matmul —
`w_i8.astype(bf16) * scale` — which XLA fuses into the GEMM prologue; a
Pallas dequant-GEMM kernel is the follow-up if profiling shows the fusion
missing.

Only the big square projections are quantized (attention q/k/v/out, MLP
fc1/fc2); embeddings, LayerNorms, heads and logit scales stay fp32/bf16.
"""

from typing import Dict, Tuple

import numpy as np


QUANT_KEY_FRAGMENTS = ("attn", "mlp")


def quantize_weight(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(in, out) or stacked (L, in, out) kernel -> (int8 values, fp32
    per-output-channel scales)."""
    w = np.asarray(w, np.float32)
    absmax = np.abs(w).max(axis=-2, keepdims=True)
    scale = absmax / 127.0
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def dequantize_weight(q, scale, dtype=None):
    import jax.numpy as jnp
    dtype = dtype or jnp.bfloat16
    return q.astype(dtype) * scale.astype(dtype)


def quantize_tower_params(params: Dict, act_quant: bool = False) -> Dict:
    """Quantize the projection kernels of a tower pytree in place-ish.

    act_quant=False (w8, latency serving): each targeted kernel leaf becomes
    {'q': int8, 'scale': fp32} — weights dequantized next to the GEMM, the
    matmul itself runs bf16.

    act_quant=True (w8a8, throughput serving): leaves become {'qa': int8,
    'scale': fp32} and ops.linear additionally quantizes activations
    per-token at run time, so the GEMM runs int8 x int8 -> int32 on the MXU
    (~2x bf16 MXU throughput on v5e). patch_embed stays bf16: it lowers to
    an XLA conv whose patch relayout fuses into the MXU operand load,
    whereas feeding a Pallas GEMM forces XLA to materialize the strided
    (BT, h, w, ph, pw, C) transpose in HBM — measured 1.74 ms vs 0.34 ms
    for the conv at the (64, 224, 224, 3) bench shape, dwarfing any int8
    win on a 19.7 GFLOP GEMM."""
    import jax

    key = "qa" if act_quant else "q"
    fragments = QUANT_KEY_FRAGMENTS

    def visit(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        name = "/".join(keys)
        # filter by NAME and ndim before touching values: np.asarray on a
        # device-committed leaf is a full host transfer through the
        # serialized relay, and most leaves are never quantized (the same
        # trap ADVICE r2 fixed in prepare_inference_params)
        if name.endswith("kernel") and getattr(leaf, "ndim", 0) >= 2 and \
                any(f"/{k}/" in name for k in fragments):
            q, scale = quantize_weight(np.asarray(leaf))
            return {key: q, "scale": scale}
        return leaf

    params = jax.tree_util.tree_map_with_path(visit, params)
    if act_quant and isinstance(params.get("visual", {}).get("patch_embed"),
                                dict):
        # int8 SIDECAR for the patch embed (kernel itself stays bf16 so the
        # frames-input conv path is untouched — see the docstring above):
        # used only by the patch-major input path, where the embed is a
        # plain contiguous GEMM and the int8 MXU rate applies
        pe = dict(params["visual"]["patch_embed"])
        if not isinstance(pe.get("kernel"), dict) and "kernel" in pe:
            q, scale = quantize_weight(np.asarray(pe["kernel"]))
            pe["kernel_q8"] = {"qa": q, "scale": scale}
            visual = dict(params["visual"])
            visual["patch_embed"] = pe
            params = dict(params)
            params["visual"] = visual
    return params


def quantize_frozen_for_train(frozen: Dict) -> Dict:
    """Quantize a FROZEN parameter subtree for int8-forward training
    ('--int8_frozen'): projection kernels become {'qt': int8, 'scale': fp32}
    leaves that ops.linear dispatches to the straight-through int8 linear
    (int8 MXU forward, bf16 dx backward, no dw — the weights are frozen).

    Pure jnp, safe to call INSIDE the jitted train step: one absmax+round
    pass over the frozen kernels per step (~0.4 ms at ViT-B scale on v5e),
    which XLA overlaps with the step prologue. The trainable subtree must
    NOT pass through here."""
    import jax
    import jax.numpy as jnp

    def visit(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        name = "/".join(keys)
        if name.endswith("kernel") and getattr(leaf, "ndim", 0) >= 2 and \
                any(f"/{k}/" in name for k in QUANT_KEY_FRAGMENTS):
            w = leaf.astype(jnp.float32)
            absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
            scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
            q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
            return {"qt": q, "scale": scale}
        return leaf

    return jax.tree_util.tree_map_with_path(visit, frozen)


def prepare_inference_params(params: Dict, quantize: str = "",
                             compute_dtype=None) -> Dict:
    """Eval/serving param prep: optionally int8-quantize the projection
    kernels (quantize in {'', 'w8', 'w8a8'}) and cast remaining float
    leaves to compute_dtype (halves HBM traffic for bf16)."""
    import jax
    import jax.numpy as jnp

    if quantize:
        params = quantize_tower_params(params, act_quant=(quantize == "w8a8"))
    if compute_dtype is not None and compute_dtype != jnp.float32:
        # Inspect x.dtype directly — np.asarray(x) would materialize
        # device-committed leaves on host (a full transfer through the
        # serialized relay just to read a dtype). jnp.issubdtype knows
        # ml_dtypes bfloat16, which is not a subtype of np.floating.
        # Quantization SCALES stay fp32: every kernel's contract is
        # {'q'/'qa'/'qt': int8, 'scale': fp32} — a bf16 scale adds up to
        # ~0.2% per-channel multiplicative weight error, the same order as
        # the int8 quantization error the accuracy gate measured without it.
        def is_quant(x):
            # exactly {'q'|'qa'|'qt', 'scale'} — a looser match would
            # swallow plain LayerNorm {'scale': ...} subtrees
            return _quant_values(x) is not None

        def cast(x):
            if is_quant(x):
                return x
            return (x.astype(compute_dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x)

        params = jax.tree_util.tree_map(cast, params, is_leaf=is_quant)
    return params


def _quant_values(x: Dict):
    """The int8 payload of a quantized leaf dict, or None. Recognizes all
    three quantized-leaf forms: 'q' (w8), 'qa' (w8a8), 'qt' (frozen-train)."""
    if isinstance(x, dict) and "scale" in x and len(x) == 2:
        for k in ("q", "qa", "qt"):
            if k in x:
                return x[k]
    return None


def dequantize_tree(params: Dict, dtype=None) -> Dict:
    """Materialize bf16 kernels from a quantized pytree (inside jit, so the
    dequant fuses into consumers). Handles 'q'/'qa'/'qt' leaves; the
    patch-embed int8 SIDECAR ('kernel_q8', which sits NEXT TO the real bf16
    kernel) is dropped rather than materialized — dequantizing it would
    leave a stale pseudo-kernel shadowing the real one."""
    import jax

    def is_quant(x):
        return _quant_values(x) is not None

    out = jax.tree_util.tree_map(
        lambda x: dequantize_weight(_quant_values(x), x["scale"], dtype)
        if is_quant(x) else x,
        params, is_leaf=is_quant)
    pe = out.get("visual", {}).get("patch_embed") if isinstance(
        out.get("visual"), dict) else None
    if isinstance(pe, dict) and "kernel_q8" in pe:
        pe = {k: v for k, v in pe.items() if k != "kernel_q8"}
        out = dict(out)
        out["visual"] = dict(out["visual"], patch_embed=pe)
    return out


def quantization_error(params: Dict, quantized: Dict) -> float:
    """Max relative Frobenius error across quantized kernels (diagnostic).
    Recognizes all quantized-leaf forms ('q'/'qa'/'qt') — a form mismatch
    must never read as 0.0 'perfect quantization'."""
    import jax

    def is_quant(x):
        return _quant_values(x) is not None

    flat_p = {tuple(str(getattr(p, "key", p)) for p in path): np.asarray(leaf)
              for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    errs = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            quantized, is_leaf=is_quant)[0]:
        if is_quant(leaf):
            key = tuple(str(getattr(p, "key", p)) for p in path)
            if key not in flat_p:     # the patch-embed sidecar has no
                continue              # counterpart leaf in the fp tree
            orig = flat_p[key]
            deq = np.asarray(_quant_values(leaf), np.float32) \
                * np.asarray(leaf["scale"], np.float32)
            errs.append(np.linalg.norm(deq - orig) / np.linalg.norm(orig))
    if not errs:
        raise ValueError("quantization_error: no quantized leaves found — "
                         "refusing to report 0.0 for a non-quantized tree")
    return float(max(errs))
