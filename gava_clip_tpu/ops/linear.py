"""Linear / MLP primitives over explicit parameter pytrees.

Weights are stored (in_dim, out_dim) so application is `x @ w` — the natural
MXU layout. The torch-checkpoint converter transposes torch's (out, in).
"""

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def linear(params: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    kernel = params["kernel"]
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
    """Two-layer MLP: fc1 -> act -> fc2 (dropout in the reference is 0.0)."""
    return linear(params["fc2"], act(linear(params["fc1"], x)))
