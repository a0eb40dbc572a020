from .activations import quick_gelu
from .norm import layer_norm
from .attention import multi_head_attention, attention_core
from .linear import linear, mlp

__all__ = [
    "quick_gelu",
    "layer_norm",
    "multi_head_attention",
    "attention_core",
    "linear",
    "mlp",
]
