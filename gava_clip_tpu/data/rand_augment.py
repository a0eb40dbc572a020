"""RandAugment, TPU-native.

The reference applies timm's PIL-based RandAugment per frame on the host
(video_dataset/rand_augment.py, applied at dataset.py:98-108). Here the same
policy runs as pure jnp ops over a whole clip inside jit — uint8 frames are
shipped to the device and augmented there (north star: fused XLA
preprocessing), with ops selected per clip via `lax.switch` so one compiled
step covers every policy draw.

Op set mirrors rand_augment.py:390-406 (15 ops), the magnitude -> argument
mapping mirrors :285-340 (including the `inc1` increasing variants :409-425),
and the config string `rand-mN-nN-mstdF-inc1` parser mirrors :486-536.
Geometric ops use bilinear resampling with the gray (128) fill used by timm.

All ops operate on float clips (T, H, W, C) in [0, 1]; magnitudes are traced
scalars so random per-clip magnitude jitter stays inside jit.
"""

import re
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_MAX_LEVEL = 10.0
_FILL = 0.5  # timm fills geometric ops with mid-gray (128/255)


# ---------- pixel ops -------------------------------------------------------

def _blend(a, b, factor):
    return jnp.clip(b + factor * (a - b), 0.0, 1.0)


def identity(img, _):
    return img


def invert(img, _):
    return 1.0 - img


def auto_contrast(img, _):
    """Per-channel remap so min->0, max->1 (PIL autocontrast, no cutoff)."""
    lo = img.min(axis=(-3, -2), keepdims=True)
    hi = img.max(axis=(-3, -2), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    off = jnp.where(hi > lo, lo, 0.0)
    return jnp.clip((img - off) * scale, 0.0, 1.0)


def equalize(img, _):
    """Histogram equalization on the 256-level quantization, PIL's lookup
    construction. Equalized per channel over the whole clip — the
    temporally-consistent choice for video (PIL would do it per frame)."""
    q = jnp.clip((img * 255.0).astype(jnp.int32), 0, 255)

    def eq_channel(ch):  # ch: (T, H, W) int32
        hist = jnp.zeros((256,), jnp.int32).at[ch.reshape(-1)].add(1)
        # PIL: step = (total - last_nonzero_count) // 255
        last_nz_idx = 255 - jnp.argmax((hist > 0)[::-1])
        step = (hist.sum() - hist[last_nz_idx]) // 255
        cum = jnp.cumsum(hist)
        lut = jnp.clip(((cum - hist) + step // 2) // jnp.maximum(step, 1), 0, 255)
        return jnp.where(step == 0, ch, lut[ch.reshape(-1)].reshape(ch.shape))

    out = jax.vmap(eq_channel, in_axes=3, out_axes=3)(q)
    return out.astype(img.dtype) / 255.0


def posterize(img, bits):
    """Keep `bits` most-significant bits (PIL posterize)."""
    bits = jnp.clip(bits, 1, 8).astype(jnp.int32)
    shift = 8 - bits
    q = jnp.clip((img * 255.0).astype(jnp.int32), 0, 255)
    q = (q >> shift) << shift
    return q.astype(img.dtype) / 255.0


def solarize(img, thresh):
    return jnp.where(img >= thresh / 255.0, 1.0 - img, img)


def solarize_add(img, add):
    below = img < 128.0 / 255.0
    return jnp.where(below, jnp.clip(img + add / 255.0, 0.0, 1.0), img)


def _grayscale(img):
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return (img * w).sum(-1, keepdims=True)


def color(img, factor):
    """Saturation (PIL Color enhance)."""
    return _blend(img, jnp.broadcast_to(_grayscale(img), img.shape), factor)


def contrast(img, factor):
    mean = _grayscale(img).mean(axis=(-3, -2), keepdims=True)
    return _blend(img, jnp.broadcast_to(mean, img.shape), factor)


def brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def sharpness(img, factor):
    """PIL Sharpness enhance: blend with a 3x3 smoothing filter."""
    kernel = jnp.asarray([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    # depthwise conv over (T, H, W, C)
    x = img.transpose(0, 3, 1, 2).reshape(-1, 1, *img.shape[1:3])
    smoothed = jax.lax.conv_general_dilated(
        x, kernel[None, None], (1, 1), "SAME")
    smoothed = smoothed.reshape(img.shape[0], img.shape[3],
                                *img.shape[1:3]).transpose(0, 2, 3, 1)
    # PIL keeps the border unfiltered
    smoothed = smoothed.at[:, 0].set(img[:, 0]).at[:, -1].set(img[:, -1])
    smoothed = smoothed.at[:, :, 0].set(img[:, :, 0]).at[:, :, -1].set(img[:, :, -1])
    return _blend(img, smoothed, factor)


# ---------- geometric ops (bilinear affine resampling) -----------------------

def _affine(img, mat, offset):
    """Apply inverse-affine [a b; c d] + offset to each frame, bilinear,
    gray fill outside."""
    T, H, W, C = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=img.dtype),
                          jnp.arange(W, dtype=img.dtype), indexing="ij")
    src_x = mat[0] * xx + mat[1] * yy + offset[0]
    src_y = mat[2] * xx + mat[3] * yy + offset[1]
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = img[:, yc, xc, :]                       # (T, H, W, C)
        return jnp.where(valid[None, :, :, None], vals, _FILL)

    out = ((1 - wx) * (1 - wy))[None, :, :, None] * gather(y0, x0) \
        + (wx * (1 - wy))[None, :, :, None] * gather(y0, x0 + 1) \
        + ((1 - wx) * wy)[None, :, :, None] * gather(y0 + 1, x0) \
        + (wx * wy)[None, :, :, None] * gather(y0 + 1, x0 + 1)
    return jnp.clip(out, 0.0, 1.0)


def shear_x(img, mag):
    return _affine(img, jnp.stack([1.0 + 0 * mag, mag, 0 * mag, 1.0 + 0 * mag]),
                   jnp.stack([0 * mag, 0 * mag]))


def shear_y(img, mag):
    return _affine(img, jnp.stack([1.0 + 0 * mag, 0 * mag, mag, 1.0 + 0 * mag]),
                   jnp.stack([0 * mag, 0 * mag]))


def translate_x(img, frac):
    W = img.shape[2]
    return _affine(img, jnp.asarray([1.0, 0.0, 0.0, 1.0]),
                   jnp.stack([frac * W, 0 * frac]))


def translate_y(img, frac):
    H = img.shape[1]
    return _affine(img, jnp.asarray([1.0, 0.0, 0.0, 1.0]),
                   jnp.stack([0 * frac, frac * H]))


def rotate(img, degrees):
    T, H, W, C = img.shape
    theta = -degrees * jnp.pi / 180.0
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # src = R @ (dst - c) + c
    offset_x = cx - cos * cx - sin * cy
    offset_y = cy + sin * cx - cos * cy
    return _affine(img, jnp.stack([cos, sin, -sin, cos]),
                   jnp.stack([offset_x, offset_y]))


# ---------- policy ----------------------------------------------------------

@dataclass(frozen=True)
class RandAugmentConfig:
    magnitude: float = 10.0
    num_layers: int = 2
    mag_std: float = 0.0
    increasing: bool = False


def parse_rand_augment_config(config_str: str) -> RandAugmentConfig:
    """Parse `rand-mN-nN-mstdF-inc1` (reference rand_augment.py:486-536)."""
    parts = config_str.split("-")
    assert parts[0] == "rand", config_str
    m, n, mstd, inc = 10.0, 2, 0.0, False
    for p in parts[1:]:
        match = re.match(r"([a-z]+)([\d.]+)", p)
        if not match:
            continue
        key, val = match.group(1), match.group(2)
        if key == "m":
            m = float(val)
        elif key == "n":
            n = int(val)
        elif key == "mstd":
            mstd = float(val)
        elif key == "inc":
            inc = bool(int(val))
    return RandAugmentConfig(magnitude=m, num_layers=n, mag_std=mstd,
                             increasing=inc)


def _signed(key, mag):
    return jnp.where(jax.random.bernoulli(key), mag, -mag)


def _op_table(cfg: RandAugmentConfig, key):
    """(name, fn, traced-arg) triples; magnitude->arg maps follow
    rand_augment.py:285-340 (+ increasing variants)."""
    inc = cfg.increasing
    lvl = cfg.magnitude / _MAX_LEVEL

    def lv(key):
        m = cfg.magnitude
        if cfg.mag_std > 0:
            m = m + cfg.mag_std * jax.random.normal(key)
        return jnp.clip(m, 0.0, _MAX_LEVEL) / _MAX_LEVEL

    keys = jax.random.split(key, 16)
    L = lv(keys[15])
    enh = 1.0 + _signed(keys[14], L * 0.9)   # enhancement factor around 1
    return [
        ("AutoContrast", auto_contrast, 0.0),
        ("Equalize", equalize, 0.0),
        ("Invert", invert, 0.0),
        ("Rotate", rotate, _signed(keys[0], L * 30.0)),
        ("Posterize", posterize,
         (4.0 - L * 4.0) if not inc else (4.0 - (1 - L) * 4.0 + 0 * L)),
        ("Solarize", solarize, 256.0 - L * 256.0 if not inc else 256.0 * (1 - L)),
        ("SolarizeAdd", solarize_add, L * 110.0),
        ("Color", color, enh),
        ("Contrast", contrast, enh),
        ("Brightness", brightness, enh),
        ("Sharpness", sharpness, enh),
        ("ShearX", shear_x, _signed(keys[1], L * 0.3)),
        ("ShearY", shear_y, _signed(keys[2], L * 0.3)),
        ("TranslateX", translate_x, _signed(keys[3], L * 0.45)),
        ("TranslateY", translate_y, _signed(keys[4], L * 0.45)),
    ]


def rand_augment(key: jax.Array, clip: jax.Array,
                 cfg: RandAugmentConfig) -> jax.Array:
    """Apply `num_layers` randomly chosen ops to a float clip (T, H, W, C)
    in [0, 1]; op choices/magnitudes are identical for all frames of the
    clip (the reference applies one sampled transform to the PIL frame list)."""
    assert clip.ndim == 4
    for layer in range(cfg.num_layers):
        key, k_sel, k_mag = jax.random.split(key, 3)
        table = _op_table(cfg, k_mag)
        idx = jax.random.randint(k_sel, (), 0, len(table))
        branches = [partial(lambda f, a, c: f(c, a), fn, arg)
                    for _, fn, arg in table]
        clip = jax.lax.switch(idx, branches, clip)
    return clip


def rand_augment_batch(key: jax.Array, clips: jax.Array,
                       config_str: str) -> jax.Array:
    """Vectorized per-clip RandAugment over a batch (B, T, H, W, C)."""
    cfg = parse_rand_augment_config(config_str)
    keys = jax.random.split(key, clips.shape[0])
    return jax.vmap(lambda k, c: rand_augment(k, c, cfg))(keys, clips)
