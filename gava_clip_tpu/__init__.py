"""gava_clip_tpu — a TPU-native (JAX/XLA/Pallas) video-CLIP framework.

A from-scratch rebuild of the capabilities of GaVA-CLIP (video CLIP for gait
analysis in neurodegenerative diseases): Vita-CLIP spatiotemporal prompting,
KAPT knowledge-augmented text prompts, support-memory and NTE contrastive
heads, LOSO cross-validation training, and zero-shot video classification —
designed for TPU from the start (SPMD meshes, one jitted train step, Pallas
kernels on the hot attention path).
"""

__version__ = "0.1.0"

NUM_COMB = 70  # number of 4-parameter gait combinations in an NTE matrix
