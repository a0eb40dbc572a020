"""Shared model config and parameter-init helpers."""

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def xavier_uniform(rng, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def init_linear(rng, in_dim: int, out_dim: int, bias: bool = True,
                bias_std: float = 0.0, xavier: bool = True):
    """Linear params. xavier=True mirrors the reference Attention/MLP init
    (reference VitaCLIP_vision_encoder_utils.py:54-57,144-147)."""
    k_rng, b_rng = jax.random.split(rng)
    if xavier:
        kernel = xavier_uniform(k_rng, (in_dim, out_dim))
    else:  # torch nn.Linear default: U(-1/sqrt(in), 1/sqrt(in))
        limit = 1.0 / math.sqrt(in_dim)
        kernel = jax.random.uniform(k_rng, (in_dim, out_dim), jnp.float32, -limit, limit)
    p = {"kernel": kernel}
    if bias:
        if bias_std > 0:
            p["bias"] = bias_std * jax.random.normal(b_rng, (out_dim,))
        elif not xavier:
            # torch nn.Linear/Conv default: bias ~ U(-1/sqrt(fan_in), +...)
            # — the reference's from-scratch heads (tf_project,
            # memory_project, sum_proj, cls_proj: VitaCLIP_model.py:166-190)
            # start with non-zero uniform biases, so zero-init here was a
            # silent init-distribution deviation
            limit = 1.0 / math.sqrt(in_dim)
            p["bias"] = jax.random.uniform(b_rng, (out_dim,), jnp.float32,
                                           -limit, limit)
        else:
            p["bias"] = jnp.zeros((out_dim,))
    return p


def init_layer_norm(dim: int):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_attention(rng, dim: int, out_dim: int = None):
    out_dim = out_dim or dim
    rngs = jax.random.split(rng, 4)
    return {
        "q": init_linear(rngs[0], dim, dim),
        "k": init_linear(rngs[1], dim, dim),
        "v": init_linear(rngs[2], dim, dim),
        "out": init_linear(rngs[3], dim, out_dim),
    }


def prompt_init_limit(patch_size: Tuple[int, int], prompt_dim: int) -> float:
    """VPT-style xavier-uniform limit used for local/global prompt tokens
    (reference VitaCLIP_vision_encoder_utils.py:149-152)."""
    return math.sqrt(6.0 / float(3 * patch_size[0] * patch_size[1] + prompt_dim))
