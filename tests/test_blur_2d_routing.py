"""The GAT_BLUR_2D_MIN_H experimental routing (one dense 2-D depthwise
upfirdn instead of two separable 1-D passes, halving HBM round trips at
high resolution) must be numerically equivalent to the default separable
path at every blur site in models/stylegan2/layers.py."""

import numpy as np
import jax.numpy as jnp

from gen_adversarial_tpu.models.stylegan2 import layers


def _x(h=12, w=10, c=5):
    return jnp.asarray(np.random.RandomState(0).rand(2, h, w, c), jnp.float32)


def _routed(fn, *args, **kw):
    old = layers._BLUR_2D_MIN_H
    layers._BLUR_2D_MIN_H = 1
    try:
        return fn(*args, **kw)
    finally:
        layers._BLUR_2D_MIN_H = old


def test_blur_2d_routing_matches_separable():
    x = _x()
    k = (1, 3, 3, 1)
    for pad, factor in (((2, 1), 1), ((2, 1), 2)):
        ref = layers.blur(x, k, pad, upsample_factor=factor)
        out = _routed(layers.blur, x, k, pad, upsample_factor=factor)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_upsample_fir_2d_routing_matches_separable():
    x = _x()
    ref = layers.upsample_fir(x, (1, 3, 3, 1))
    out = _routed(layers.upsample_fir, x, (1, 3, 3, 1))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_downsample_fir_2d_routing_matches_separable():
    x = _x()
    ref = layers.downsample_fir(x, (1, 3, 3, 1))
    out = _routed(layers.downsample_fir, x, (1, 3, 3, 1))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
