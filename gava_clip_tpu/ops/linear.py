"""Linear / MLP primitives over explicit parameter pytrees.

Weights are stored (in_dim, out_dim) so application is `x @ w` — the natural
MXU layout. The torch-checkpoint converter transposes torch's (out, in).
"""

from typing import Callable, Dict, Optional

import jax


def linear(params: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    kernel = params["kernel"]
    if isinstance(kernel, dict) and "qt" in kernel:
        # frozen-int8 training leaf ({'qt','scale'}): int8 MXU forward with a
        # straight-through bf16 backward for dx (frozen weights need no dw)
        from .int8_matmul import int8_linear_st
        return int8_linear_st(x, kernel["qt"], kernel["scale"],
                              params.get("bias"))
    if isinstance(kernel, dict) and "qa" in kernel:
        # w8a8 leaf ({'qa','scale'}): dynamic per-token activation quant +
        # int8 MXU GEMM (throughput serving mode)
        from .int8_matmul import int8_dynamic_linear
        return int8_dynamic_linear(params, x)
    if isinstance(kernel, dict) and "q" in kernel:
        # weight-only int8 leaf ({'q','scale'} from ops.quant): use the
        # Pallas dequant-GEMM so the bf16 weights never materialize in HBM
        from .int8_matmul import quantized_linear
        return quantized_linear(params, x)
    y = x @ kernel.astype(x.dtype)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(x.dtype)
    return y


def mlp(params: Dict[str, Dict[str, jax.Array]], x: jax.Array,
        act: Callable[[jax.Array], jax.Array]) -> jax.Array:
    """Two-layer MLP: fc1 -> act -> fc2 (dropout in the reference is 0.0).

    The PRE-activation hidden is checkpoint-named 'mlp_h' so a
    save_only_these_names remat policy (models/vision.py
    remat='save_attn_mlp') can keep it and skip the fc1 GEMM recompute in
    backward. Pre-act, not post-act: the activation's own dx needs the
    pre-act value, and with a frozen fc2 (no dw) the post-act tensor has no
    backward consumer at all — a post-act tag would be dead weight that XLA
    DCEs (verified by identical device traces). No-op without the policy."""
    from jax.ad_checkpoint import checkpoint_name
    h = checkpoint_name(linear(params["fc1"], x), "mlp_h")
    return linear(params["fc2"], act(h))


def mlp_block(params: Dict, norm_params: Dict, x: jax.Array,
              act: Callable[[jax.Array], jax.Array],
              residual: Optional[jax.Array] = None) -> jax.Array:
    """Pre-norm MLP: [residual +] fc2(act(fc1(LayerNorm(x)))).

    When the kernels are w8a8-quantized (and on TPU), the whole block runs
    as ONE fused Pallas kernel (ops/int8_matmul.w8a8_mlp[_res]) — LN, both
    int8 GEMMs, QuickGELU, and the residual add in VMEM, no (M, 4K)
    intermediate in HBM. The fused path assumes `act` is QuickGELU (the
    only activation in this model)."""
    k1 = params["fc1"]["kernel"]
    if isinstance(k1, dict) and "qt" in k1 and residual is not None:
        # frozen-int8 training: fused LN + int8 fc1 + GELU + int8 fc2 +
        # residual forward (same kernel as inference), hand-written dx-only
        # backward (ops/int8_matmul.int8_mlp_st)
        from .int8_matmul import int8_mlp_st
        x2 = x.reshape(-1, x.shape[-1])
        y = int8_mlp_st(x2, k1["qt"], k1["scale"], params["fc1"]["bias"],
                        params["fc2"]["kernel"]["qt"],
                        params["fc2"]["kernel"]["scale"],
                        params["fc2"]["bias"],
                        norm_params["scale"], norm_params["bias"],
                        residual.reshape(-1, residual.shape[-1]))
        return y.reshape(x.shape[:-1] + (y.shape[-1],))
    from .int8_matmul import kernels_active
    if isinstance(k1, dict) and "qa" in k1 and kernels_active():
        from .int8_matmul import w8a8_mlp, w8a8_mlp_res
        x2 = x.reshape(-1, x.shape[-1])
        ln = (norm_params["scale"], norm_params["bias"])
        if residual is not None:
            y = w8a8_mlp_res(x2, params["fc1"], params["fc2"], ln,
                             residual.reshape(-1, residual.shape[-1]))
        else:
            y = w8a8_mlp(x2, params["fc1"], params["fc2"], ln=ln)
        return y.reshape(x.shape[:-1] + (y.shape[-1],))
    from .norm import layer_norm
    out = mlp(params, layer_norm(x, norm_params["scale"],
                                  norm_params["bias"]), act)
    return out if residual is None else residual + out
