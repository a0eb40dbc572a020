"""RandomErasing, TPU-native.

Rebuild of the reference timm-style RandomErasing
(video_dataset/random_erasing.py:57-120) as a jittable jnp transform over a
batch of clips: per-sample random erase boxes with Inception-style
area/aspect sampling, `cube=True` temporal consistency (the same box and
noise erase every frame of a clip, reference :57-90), per-pixel gaussian
fill ('rand' mode), and per-sample application probability.

Static-shape trick: boxes are realized as coordinate masks (no dynamic
slicing), so any box size compiles into one program.
"""

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class RandomErasingConfig:
    probability: float = 0.25
    min_area: float = 0.02
    max_area: float = 1.0 / 3.0
    min_aspect: float = 0.3
    max_aspect: float = 1.0 / 0.3
    mode: str = "rand"          # 'rand' (gaussian) | 'const' (zeros)
    min_count: int = 1
    max_count: int = 1
    cube: bool = True           # same box across the clip's frames


def _sample_box(key, H, W, cfg: RandomErasingConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = H * W
    target = area * jax.random.uniform(k1, (), minval=cfg.min_area,
                                       maxval=cfg.max_area)
    log_ratio = jax.random.uniform(
        k2, (), minval=math.log(cfg.min_aspect), maxval=math.log(cfg.max_aspect))
    ratio = jnp.exp(log_ratio)
    h = jnp.clip(jnp.sqrt(target * ratio).astype(jnp.int32), 1, H)
    w = jnp.clip(jnp.sqrt(target / ratio).astype(jnp.int32), 1, W)
    top = jax.random.randint(k3, (), 0, jnp.maximum(H - h, 1))
    left = jax.random.randint(k4, (), 0, jnp.maximum(W - w, 1))
    return top, left, h, w


def erase_clip(key: jax.Array, clip: jax.Array,
               cfg: RandomErasingConfig = RandomErasingConfig()) -> jax.Array:
    """Erase one clip (T, H, W, C) with probability cfg.probability."""
    T, H, W, C = clip.shape
    k_apply, k_count, k_boxes, k_noise = jax.random.split(key, 4)
    apply = jax.random.uniform(k_apply) < cfg.probability
    count = jax.random.randint(k_count, (), cfg.min_count, cfg.max_count + 1)

    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    out = clip
    box_keys = jax.random.split(k_boxes, cfg.max_count)
    noise_keys = jax.random.split(k_noise, cfg.max_count)
    for i in range(cfg.max_count):
        top, left, h, w = _sample_box(box_keys[i], H, W, cfg)
        mask = ((yy >= top) & (yy < top + h) &
                (xx >= left) & (xx < left + w))           # (H, W)
        active = apply & (i < count)
        mask = mask & active
        if cfg.mode == "rand":
            if cfg.cube:
                noise = jax.random.normal(noise_keys[i], (1, H, W, C), clip.dtype)
                noise = jnp.broadcast_to(noise, clip.shape)
            else:
                noise = jax.random.normal(noise_keys[i], clip.shape, clip.dtype)
        else:
            noise = jnp.zeros_like(clip)
        out = jnp.where(mask[None, :, :, None], noise, out)
    return out


def random_erasing_batch(key: jax.Array, clips: jax.Array,
                         cfg: RandomErasingConfig = RandomErasingConfig()) -> jax.Array:
    """(B, T, H, W, C) batched per-clip erasing."""
    keys = jax.random.split(key, clips.shape[0])
    return jax.vmap(lambda k, c: erase_clip(k, c, cfg))(keys, clips)
