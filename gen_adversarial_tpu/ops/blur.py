"""Gaussian blur (separable, reflect-padded), replacing the reference's
kornia.filters.gaussian_blur2d call (abstract_models.py:158).

Runs as two 1-D depthwise convolutions; XLA maps these to the VPU and fuses
the padding.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def gaussian_kernel1d(kernel_size: int, sigma: float) -> jnp.ndarray:
    """1-D gaussian taps, normalized to sum 1 (kornia-compatible: for even
    sizes the window is shifted by half a sample)."""
    x = jnp.arange(kernel_size, dtype=jnp.float32) - kernel_size // 2
    if kernel_size % 2 == 0:
        x = x + 0.5
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


@partial(jax.jit, static_argnames=("kernel_size",))
def gaussian_blur2d(x: jnp.ndarray, kernel_size: int, sigma: float = 1.0) -> jnp.ndarray:
    """Separable gaussian blur on NHWC images with reflect padding
    (kornia's default border_type), matching
    kornia.filters.gaussian_blur2d(x, k, sigma=(s, s))."""
    b, h, w, c = x.shape
    k = gaussian_kernel1d(kernel_size, sigma).astype(x.dtype)
    pad = (kernel_size - 1) // 2, kernel_size // 2
    x = jnp.pad(x, ((0, 0), pad, pad, (0, 0)), mode="reflect")
    rhs_h = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    rhs_w = jnp.tile(k.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(x, rhs_h, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    x = lax.conv_general_dilated(x, rhs_w, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    return x
