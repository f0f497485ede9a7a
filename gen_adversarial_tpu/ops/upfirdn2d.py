"""TPU-native upfirdn2d: upsample -> FIR filter -> downsample, in one XLA conv.

The reference implements this as a hand-written CUDA kernel with a custom
autograd Function pair (StyleGan_E4E/stylegan2/op/upfirdn2d_kernel.cu and
op/upfirdn2d.py:17-139 in SerezD/gen_adversarial).  On TPU none of that is
needed: `lax.conv_general_dilated` natively expresses

    zero-insert upsampling  == lhs_dilation
    FIR filtering           == depthwise convolution (with a flipped kernel,
                               since upfirdn is a true convolution while XLA
                               conv is a correlation)
    downsampling            == window strides

so the whole op is a single fused XLA convolution that autodiffs exactly
(including double-backward, which the reference needed a second custom
Function for).  Because every FIR kernel used by StyleGAN2 is an outer
product of a 1-D kernel (generator.py:18-26 `make_kernel`), we additionally
provide a separable two-pass path that does O(kh + kw) taps per output
instead of O(kh * kw).

Layout: NHWC (TPU-native), images (B, H, W, C).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def make_fir_kernel(k) -> jnp.ndarray:
    """Normalized 2-D FIR kernel from a 1-D or 2-D tap list.

    Mirrors the semantics of the reference `make_kernel` (generator.py:18-26):
    1-D inputs become their outer product; the kernel is normalized to sum 1.
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = jnp.outer(k, k)
    return k / jnp.sum(k)


def _upfirdn1d(x: jnp.ndarray, kernel1d: jnp.ndarray, up: int, down: int,
               pad0: int, pad1: int, axis: int) -> jnp.ndarray:
    """Apply up/FIR/down along one spatial axis of an NHWC tensor.

    axis: 1 (height) or 2 (width).
    """
    b, h, w, c = x.shape
    kt = kernel1d.shape[0]
    k = jnp.flip(kernel1d, 0).astype(x.dtype)
    if axis == 1:
        rhs = jnp.tile(k.reshape(kt, 1, 1, 1), (1, 1, 1, c))
        window = (down, 1)
        dil = (up, 1)
        padding = ((pad0, pad1 + up - 1), (0, 0))
    else:
        rhs = jnp.tile(k.reshape(1, kt, 1, 1), (1, 1, 1, c))
        window = (1, down)
        dil = (1, up)
        padding = ((0, 0), (pad0, pad1 + up - 1))
    return lax.conv_general_dilated(
        x, rhs, window_strides=window, padding=padding, lhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("up", "down", "pad"))
def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1, down: int = 1,
              pad: tuple = (0, 0)) -> jnp.ndarray:
    """upfirdn2d on NHWC images.

    Matches the reference op semantics (op/upfirdn2d.py:142-147): `pad` is
    (pad0, pad1) applied to both spatial dims; output spatial size is
    (in * up + pad0 + pad1 - k) // down + 1.

    If `kernel` is 1-D it is treated as a separable (outer-product,
    normalized is caller's job via make_fir_kernel... see note) kernel and
    run as two cheap 1-D passes; a 2-D kernel runs as one depthwise conv.
    NOTE: a 1-D kernel here is used *as is* per axis (the separable factor),
    so pass `make_fir_kernel(k)` for the 2-D path or the normalized 1-D
    factor for the separable path.
    """
    pad0, pad1 = pad
    if kernel.ndim == 1:
        x = _upfirdn1d(x, kernel, up, down, pad0, pad1, axis=1)
        x = _upfirdn1d(x, kernel, up, down, pad0, pad1, axis=2)
        return x
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    rhs = jnp.tile(k.reshape(kh, kw, 1, 1), (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, rhs, window_strides=(down, down),
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=lax.Precision.HIGHEST)


def upfirdn2d_ref(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1,
                  down: int = 1, pad: tuple = (0, 0)) -> jnp.ndarray:
    """Straight-line reference implementation (pad -> dilate -> conv -> stride)
    used only by tests, mirroring the reference's pure `upfirdn2d_native`
    (op/upfirdn2d.py:150-184) semantics on NHWC.
    """
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    # zero-insert upsample (zeros *after* each element, like the reference)
    out = x.reshape(b, h, 1, w, 1, c)
    out = jnp.pad(out, ((0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1), (0, 0)))
    out = out.reshape(b, h * up, w * up, c)
    # pad (supports negative pads by slicing)
    out = jnp.pad(out, ((0, 0), (max(pad0, 0), max(pad1, 0)),
                        (max(pad0, 0), max(pad1, 0)), (0, 0)))
    out = out[:, max(-pad0, 0): out.shape[1] - max(-pad1, 0),
              max(-pad0, 0): out.shape[2] - max(-pad1, 0), :]
    # true convolution with the kernel == correlation with flipped kernel
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    rhs = jnp.tile(k.reshape(kh, kw, 1, 1), (1, 1, 1, c))
    out = lax.conv_general_dilated(
        out, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=lax.Precision.HIGHEST)
    return out[:, ::down, ::down, :]
