"""Pallas blur kernel tests (interpret mode on CPU; the compiled kernel is
exercised and benchmarked on TPU separately - bit-exact vs the XLA path
there, see ops/pallas_upfirdn.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gen_adversarial_tpu.ops.pallas_upfirdn import pallas_blur
from gen_adversarial_tpu.ops.upfirdn2d import upfirdn2d

K4 = jnp.asarray(np.array([1.0, 3.0, 3.0, 1.0]) / 8.0)


@pytest.mark.parametrize("shape,pad", [
    ((2, 32, 32, 96), (2, 1)),    # post-upsample blur
    ((1, 17, 23, 128), (1, 1)),   # ragged spatial dims
    ((2, 64, 64, 256), (2, 2)),   # pre-downsample blur
    ((1, 8, 8, 3), (2, 1)),       # RGB (channel padding path)
])
def test_pallas_blur_matches_xla(shape, pad):
    x = jnp.asarray(np.random.RandomState(0).rand(*shape).astype(np.float32))
    want = upfirdn2d(x, K4, up=1, down=1, pad=pad)
    got = pallas_blur(x, K4, pad=pad, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_pallas_blur_3tap():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 8).astype(np.float32))
    k3 = jnp.asarray(np.array([1.0, 2.0, 1.0]) / 4.0)
    want = upfirdn2d(x, k3, up=1, down=1, pad=(1, 1))
    got = pallas_blur(x, k3, pad=(1, 1), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("pad", [(2, 1), (1, 1), (2, 2)])
def test_pallas_blur_diff_vjp_matches_xla(pad):
    """The custom x-VJP (transposed-pad trick) equals autodiff through the
    XLA upfirdn2d path - this is what attack gradients flow through when
    the Pallas blur is wired into the StyleGAN2 generators."""
    import jax
    from gen_adversarial_tpu.ops.pallas_upfirdn import pallas_blur_diff

    x = jnp.asarray(np.random.RandomState(2).rand(2, 16, 16, 8).astype(np.float32))

    def loss_pallas(x):
        out = pallas_blur_diff(x, K4, pad, True)
        return jnp.sum(jnp.sin(out))

    def loss_xla(x):
        out = upfirdn2d(x, K4, up=1, down=1, pad=pad)
        return jnp.sum(jnp.sin(out))

    gp = jax.grad(loss_pallas)(x)
    gx = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-5, atol=1e-6)
