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


def __getattr__(name):
    """Lazy top-level API (keeps `import gava_clip_tpu` dependency-light)."""
    if name == "VitaClip":
        from .models.vita_clip import VitaClip
        return VitaClip
    if name == "VitaClipConfig":
        from .models.vita_clip import VitaClipConfig
        return VitaClipConfig
    if name == "VideoClassifier":
        from .serve import VideoClassifier
        return VideoClassifier
    if name == "tokenize":
        from .text import tokenize
        return tokenize
    if name == "build_flagship":
        from .utils.flagship import build_flagship
        return build_flagship
    if name == "build_zero_shot":
        from .utils.flagship import build_zero_shot
        return build_zero_shot
    raise AttributeError(name)
