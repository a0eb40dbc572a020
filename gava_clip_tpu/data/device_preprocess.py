"""On-device preprocessing: uint8 frames -> normalized float.

TPU-first: hosts ship compact uint8 tensors; the /255 + mean/std normalize
runs inside the same jit as the model so XLA fuses it into the patch-embed
GEMM (north star: uint8 straight to HBM). A pure-jax float reference path
(keep-aspect resize + center crop) exists for parity tests against the
reference's torch pipeline (dataset.py:117-139).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
DEFAULT_MEAN = (0.45, 0.45, 0.45)   # loader defaults (dataloader.py:64-77)
DEFAULT_STD = (0.225, 0.225, 0.225)


def normalize_frames(frames: jax.Array,
                     mean: Sequence[float] = DEFAULT_MEAN,
                     std: Sequence[float] = DEFAULT_STD,
                     compute_dtype=jnp.float32) -> jax.Array:
    """uint8/float (..., 3) -> normalized float ((x/255 - mean) / std)."""
    x = frames.astype(compute_dtype)
    if frames.dtype == jnp.uint8:
        x = x / 255.0
    mean = jnp.asarray(mean, compute_dtype)
    std = jnp.asarray(std, compute_dtype)
    return (x - mean) / std


def keep_aspect_resize_jax(frames: jax.Array, spatial_size: int) -> jax.Array:
    """Bilinear short-side resize (half-pixel centers ==
    torch align_corners=False), frames (..., H, W, C) float."""
    H, W = frames.shape[-3:-1]
    if H < W:
        new_h, new_w = spatial_size, W * spatial_size // H
    else:
        new_h, new_w = H * spatial_size // W, spatial_size
    out_shape = frames.shape[:-3] + (new_h, new_w, frames.shape[-1])
    return jax.image.resize(frames, out_shape, method="bilinear")


def center_crop_jax(frames: jax.Array, size: int) -> jax.Array:
    H, W = frames.shape[-3:-1]
    h0, w0 = (H - size) // 2, (W - size) // 2
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(frames, h0, h0 + size, axis=-3),
        w0, w0 + size, axis=-2)


def make_train_augment(auto_augment: Optional[str], mirror: bool,
                       mean=DEFAULT_MEAN, std=DEFAULT_STD,
                       erase_prob: float = 0.0):
    """Jittable train-time augmentation: uint8 (B,T,H,W,3) + PRNG key ->
    normalized float batch. RandAugment (when configured) + horizontal
    mirror + normalize [+ RandomErasing] all run on-device in one fused
    program — the TPU-native replacement for the reference's PIL worker path
    (dataset.py:98-110)."""
    import jax
    import jax.numpy as jnp

    def augment(key: jax.Array, frames_u8: jax.Array) -> jax.Array:
        x = frames_u8.astype(jnp.float32) / 255.0
        if auto_augment:
            from .rand_augment import rand_augment_batch
            key, k_aug = jax.random.split(key)
            x = rand_augment_batch(k_aug, x, auto_augment)
        if mirror:
            key, k_flip = jax.random.split(key)
            flip = jax.random.bernoulli(k_flip, 0.5, (x.shape[0],))
            x = jnp.where(flip[:, None, None, None, None], x[:, :, :, ::-1], x)
        if erase_prob > 0:
            from .random_erasing import RandomErasingConfig, random_erasing_batch
            key, k_erase = jax.random.split(key)
            x = random_erasing_batch(k_erase, x,
                                     RandomErasingConfig(probability=erase_prob))
        m = jnp.asarray(mean, x.dtype)
        s = jnp.asarray(std, x.dtype)
        return (x - m) / s

    return augment


def val_preprocess_float(frames: jax.Array, spatial_size: int,
                         mean=DEFAULT_MEAN, std=DEFAULT_STD) -> jax.Array:
    """Reference val pipeline on float frames in [0,1]:
    normalize -> keep-aspect resize -> center crop (dataset.py:117-135)."""
    x = (frames - jnp.asarray(mean, frames.dtype)) / jnp.asarray(std, frames.dtype)
    x = keep_aspect_resize_jax(x, spatial_size)
    return center_crop_jax(x, spatial_size)
