"""Elementwise activations.

Semantics match the reference CLIP stack (QuickGELU — see
reference training/VitaCLIP_vision_encoder_utils.py:18-20). These are plain
jnp expressions: XLA fuses them into the surrounding matmuls on TPU, so no
Pallas kernel is needed for the elementwise path.
"""

import jax
import jax.numpy as jnp


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 * x) — CLIP's GELU approximation."""
    return x * jax.nn.sigmoid(1.702 * x)
