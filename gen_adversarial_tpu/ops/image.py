"""Image geometry ops: bilinear resize (both alignment conventions) and
adaptive average pooling, on NHWC tensors.

These replace the reference's kornia.geometry.resize (ours/models.py:307,351),
torch F.interpolate(..., align_corners=True) (encoding/helpers.py:140,
NVAE architecture.py:92) and torch AdaptiveAvgPool2d (psp.py:26).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def clamp01(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] clamp with torch's gradient convention.

    torch.clamp's backward passes the cotangent on the INCLUSIVE in-range
    mask (1.0 at x==0 and x==1), while jnp.clip's min/max composition gives
    0.5 at exact ties.  PNG-decoded pixels sit exactly at 0.0/1.0 en masse,
    and attacks differentiate through every defense-side clamp
    (abstract_models.py:141-143, nd_vae/purification_model.py:21,
    nd_vae NVAE.py:699 in SerezD/gen_adversarial), so the tie gradient is
    accuracy-relevant for attack-trajectory parity."""
    return jnp.where((x >= 0.0) & (x <= 1.0), x,
                     lax.stop_gradient(jnp.clip(x, 0.0, 1.0)))


@partial(jax.jit, static_argnames=("out_h", "out_w", "align_corners", "antialias"))
def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                    align_corners: bool = False, antialias: bool = False) -> jnp.ndarray:
    """Bilinear resize of NHWC images.

    align_corners=False matches torch F.interpolate / kornia default
    (half-pixel centers); align_corners=True matches the reference's FPN
    upsample and NVAE SkipUp convention.
    """
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    if not align_corners:
        return jax.image.resize(x, (b, out_h, out_w, c), method="bilinear",
                                antialias=antialias)

    # align_corners=True as two interpolation MATMULS (out = A_y x A_x^T):
    # TPU gathers serialize badly, while these land on the MXU.  The
    # interpolation matrices are built at trace time from static shapes.
    import numpy as _np

    def interp_matrix(in_size, out_size):
        a = _np.zeros((out_size, in_size), _np.float32)
        if out_size == 1:
            a[0, 0] = 1.0
            return a
        pos = _np.arange(out_size, dtype=_np.float64) * (in_size - 1) / (out_size - 1)
        lo = _np.clip(_np.floor(pos).astype(_np.int64), 0, in_size - 1)
        hi = _np.minimum(lo + 1, in_size - 1)
        frac = (pos - lo).astype(_np.float32)
        a[_np.arange(out_size), lo] += 1.0 - frac
        a[_np.arange(out_size), hi] += frac
        return a

    ay = jnp.asarray(interp_matrix(h, out_h), x.dtype)
    ax = jnp.asarray(interp_matrix(w, out_w), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", ay, x)
    return jnp.einsum("pw,bowc->bopc", ax, y)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """AdaptiveAvgPool2d for the evenly-divisible case (the only one the
    reference exercises: 1024->256 and 256->256 face pools)."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    assert h % out_h == 0 and w % out_w == 0, (h, w, out_h, out_w)
    fh, fw = h // out_h, w // out_w
    x = x.reshape(b, out_h, fh, out_w, fw, c)
    return x.mean(axis=(2, 4))


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def adaptive_avg_pool_general(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Full torch AdaptiveAvgPool2d semantics (windows
    [floor(i*in/out), ceil((i+1)*in/out))), valid for out smaller OR larger
    than in — torchvision VGG pools 2x2 features up to 7x7 on 64px inputs."""
    b, h, w, c = x.shape
    if h % out_h == 0 and w % out_w == 0:
        return adaptive_avg_pool(x, out_h, out_w)

    def pool_axis(arr, in_size, out_size, axis):
        slices = []
        for i in range(out_size):
            lo = (i * in_size) // out_size
            hi = -(-((i + 1) * in_size) // out_size)  # ceil
            seg = lax.slice_in_dim(arr, lo, hi, axis=axis)
            slices.append(seg.mean(axis=axis, keepdims=True))
        return jnp.concatenate(slices, axis=axis)

    x = pool_axis(x, h, out_h, 1)
    return pool_axis(x, w, out_w, 2)


@partial(jax.jit, static_argnames=("kernel",))
def avg_pool2d(x: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """Non-overlapping average pooling (torch F.avg_pool2d with
    stride=kernel), used by the A-VAE purifier's downsampling."""
    if kernel == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h // kernel, kernel, w // kernel, kernel, c)
    return x.mean(axis=(2, 4))
