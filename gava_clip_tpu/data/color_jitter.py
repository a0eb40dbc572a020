"""Color-jitter family, TPU-native.

Rebuild of the SlowFast-derived tensor color ops in the reference
video_dataset/transform.py:280-456 (brightness/contrast/saturation jitter
with random order, grayscale conversion, PCA lighting jitter, hue rotation)
as pure jnp transforms over clips (T, H, W, C) in [0, 1], jittable and
batched with vmap. These complement data/rand_augment.py (which carries the
PIL-op policy); this module is the plain jitter API used by SlowFast-style
training recipes.
"""



import jax
import jax.numpy as jnp

# ITU-R 601 luma weights (reference grayscale, transform.py:334-357)
_LUMA = jnp.asarray([0.299, 0.587, 0.114])

# ImageNet PCA eigenvalues/vectors (reference lighting_jitter defaults)
_EIG_VAL = jnp.asarray([0.225, 0.224, 0.229])
_EIG_VEC = jnp.asarray([
    [-0.5675, 0.7192, 0.4009],
    [-0.5808, -0.0045, -0.8140],
    [-0.5836, -0.6948, 0.4203],
])


def grayscale(clip: jax.Array) -> jax.Array:
    """RGB -> 3-channel luma (reference grayscale, transform.py:334-357)."""
    g = (clip * _LUMA.astype(clip.dtype)).sum(-1, keepdims=True)
    return jnp.broadcast_to(g, clip.shape)


def brightness_jitter(var: float, u: jax.Array, clip: jax.Array) -> jax.Array:
    """blend with black, alpha ~ U(1-var, 1+var) (transform.py:359-377)."""
    alpha = 1.0 + var * (2.0 * u - 1.0)
    return jnp.clip(clip * alpha, 0.0, 1.0)


def contrast_jitter(var: float, u: jax.Array, clip: jax.Array) -> jax.Array:
    """blend with the mean gray frame (transform.py:379-398)."""
    alpha = 1.0 + var * (2.0 * u - 1.0)
    mean = grayscale(clip).mean(axis=(-3, -2), keepdims=True)
    return jnp.clip(clip * alpha + mean * (1.0 - alpha), 0.0, 1.0)


def saturation_jitter(var: float, u: jax.Array, clip: jax.Array) -> jax.Array:
    """blend with grayscale (transform.py:400-419)."""
    alpha = 1.0 + var * (2.0 * u - 1.0)
    return jnp.clip(clip * alpha + grayscale(clip) * (1.0 - alpha), 0.0, 1.0)


def hue_rotate(degrees: jax.Array, clip: jax.Array) -> jax.Array:
    """Rotate hue by `degrees` around the luma axis in RGB space (the YIQ
    rotation used by torchvision's functional_tensor hue adjustment)."""
    theta = jnp.deg2rad(degrees)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # RGB -> YIQ, rotate IQ, YIQ -> RGB
    rgb2yiq = jnp.asarray([[0.299, 0.587, 0.114],
                           [0.595716, -0.274453, -0.321263],
                           [0.211456, -0.522591, 0.311135]])
    yiq2rgb = jnp.asarray([[1.0, 0.9563, 0.6210],
                           [1.0, -0.2721, -0.6474],
                           [1.0, -1.1070, 1.7046]])
    rot = jnp.asarray([[1.0, 0.0, 0.0],
                       [0.0, cos, -sin],
                       [0.0, sin, cos]])
    m = (yiq2rgb @ rot @ rgb2yiq).astype(clip.dtype)
    return jnp.clip(clip @ m.T, 0.0, 1.0)


def lighting_jitter(key: jax.Array, clip: jax.Array,
                    alphastd: float = 0.1,
                    eig_val: jax.Array = _EIG_VAL,
                    eig_vec: jax.Array = _EIG_VEC) -> jax.Array:
    """AlexNet-style PCA lighting noise, one draw per clip
    (transform.py:421-456)."""
    alphas = alphastd * jax.random.normal(key, (3,), clip.dtype)
    rgb = (eig_vec.astype(clip.dtype) * alphas *
           eig_val.astype(clip.dtype)).sum(-1)
    return jnp.clip(clip + rgb, 0.0, 1.0)


def color_jitter(key: jax.Array, clip: jax.Array,
                 img_brightness: float = 0.0, img_contrast: float = 0.0,
                 img_saturation: float = 0.0) -> jax.Array:
    """Apply the enabled jitters in random order with per-clip strengths
    (reference color_jitter, transform.py:280-313)."""
    enabled = []
    if img_brightness != 0:
        enabled.append(("b", img_brightness))
    if img_contrast != 0:
        enabled.append(("c", img_contrast))
    if img_saturation != 0:
        enabled.append(("s", img_saturation))
    if not enabled:
        return clip

    key, k_perm = jax.random.split(key)
    order = jax.random.permutation(k_perm, len(enabled))
    fns = {"b": brightness_jitter, "c": contrast_jitter, "s": saturation_jitter}

    def apply_one(i, c):
        key_i = jax.random.fold_in(key, i)
        u = jax.random.uniform(key_i)
        branches = [lambda cc, v=var, tag=tag: fns[tag](v, u, cc)
                    for tag, var in enabled]
        return jax.lax.switch(order[i], branches, c)

    for i in range(len(enabled)):
        clip = apply_one(i, clip)
    return clip
