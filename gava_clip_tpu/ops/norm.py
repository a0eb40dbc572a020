"""LayerNorm with an fp32 island.

The reference CLIP stack always computes LayerNorm in float32 regardless of
activation dtype (reference training/VitaCLIP_vision_encoder_utils.py:22-28).
On TPU we keep activations in bf16 on the matmul path but normalize in fp32,
then cast back — numerically equivalent to the reference behavior.
"""

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)
