"""On-device training augmentations, replacing the reference's kornia GPU
pipeline (classifier/train.py:116-126): RandomHorizontalFlip(0.5) ->
RandomResizedCrop(scale=(0.75,1.0)) -> RandomBrightness(0.5, p=0.3) ->
RandomContrast(0.5, p=0.3) -> RandomEqualize(p=0.3) -> RandomGrayscale(p=0.1)
-> Normalize(0.5, 0.5).

Everything is vmapped per-sample (kornia's same_on_batch=False) and runs
inside the jitted train step, so augmentation fuses into the forward pass
instead of stalling the input pipeline.
"""

import jax
import jax.numpy as jnp


def _random_resized_crop(key, img, scale=(0.75, 1.0), ratio=(3 / 4, 4 / 3)):
    """kornia/torchvision-style RandomResizedCrop for square outputs.

    Samples area in `scale`, log-uniform aspect in `ratio`, crops, and
    resizes back to the input size with bilinear interpolation.  Implemented
    with a dynamic-slice-free gather so it stays jittable at fixed shape.
    """
    h, w, c = img.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1]) * h * w
    log_r = jax.random.uniform(k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * r), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / r), 1.0, h)
    y0 = jax.random.uniform(k3, ()) * (h - ch)
    x0 = jax.random.uniform(k4, ()) * (w - cw)
    # sample the crop on a fixed (h, w) grid of fractional coordinates
    ys = y0 + (jnp.arange(h) + 0.5) * ch / h - 0.5
    xs = x0 + (jnp.arange(w) + 0.5) * cw / w - 0.5
    # clamp source coords like torch's area_pixel_compute_source_index:
    # border samples replicate the edge pixel instead of extrapolating
    # (unclamped fractions would push values outside [0,1] at the border)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    ylo = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    yhi = jnp.clip(ylo + 1, 0, h - 1)
    xlo = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    xhi = jnp.clip(xlo + 1, 0, w - 1)
    yf = (ys - ylo)[:, None, None]
    xf = (xs - xlo)[None, :, None]
    top = img[ylo][:, xlo] * (1 - xf) + img[ylo][:, xhi] * xf
    bot = img[yhi][:, xlo] * (1 - xf) + img[yhi][:, xhi] * xf
    return top * (1 - yf) + bot * yf


def _equalize_channel(chan):
    """Histogram equalization of one channel in [0,1] (256 bins)."""
    levels = jnp.clip((chan * 255.0).astype(jnp.int32), 0, 255)
    hist = jnp.zeros((256,), jnp.float32).at[levels.reshape(-1)].add(1.0)
    cdf = jnp.cumsum(hist)
    cdf_min = cdf[jnp.argmax(hist > 0)]
    denom = jnp.maximum(cdf[-1] - cdf_min, 1.0)
    lut = jnp.clip((cdf - cdf_min) / denom, 0.0, 1.0)
    return lut[levels]


def _augment_one(key, img):
    kf, kc, kb1, kc2, ke1, kg = jax.random.split(key, 6)
    # horizontal flip p=0.5
    img = jnp.where(jax.random.bernoulli(kf), img[:, ::-1], img)
    img = _random_resized_crop(kc, img)
    # brightness: kornia factor range (0.5, 0.5) -> out = clip(img + f - 1)
    img = jnp.where(jax.random.bernoulli(kb1, 0.3),
                    jnp.clip(img - 0.5, 0.0, 1.0), img)
    # contrast: factor 0.5 -> out = clip(img * f)
    img = jnp.where(jax.random.bernoulli(kc2, 0.3),
                    jnp.clip(img * 0.5, 0.0, 1.0), img)
    # equalize p=0.3
    eq = jnp.stack([_equalize_channel(img[..., i]) for i in range(img.shape[-1])], -1)
    img = jnp.where(jax.random.bernoulli(ke1, 0.3), eq, img)
    # grayscale p=0.1
    gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    img = jnp.where(jax.random.bernoulli(kg, 0.1),
                    jnp.stack([gray] * 3, -1), img)
    return img


@jax.jit
def train_augment(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Per-sample augmentations + Normalize(0.5, 0.5). images: (B,H,W,C) in [0,1]."""
    keys = jax.random.split(key, images.shape[0])
    out = jax.vmap(_augment_one)(keys, images)
    return (out - 0.5) / 0.5


@jax.jit
def eval_normalize(images: jnp.ndarray) -> jnp.ndarray:
    return (images - 0.5) / 0.5
