"""Unit tests for the TPU op layer against pure reference semantics,
including cross-checks vs torch's own ops (torch CPU is available here as a
test oracle only; nothing in the framework imports it)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from gen_adversarial_tpu.ops import (
    upfirdn2d, upfirdn2d_ref, make_fir_kernel, fused_leaky_relu,
    gaussian_blur2d, gaussian_kernel1d, resize_bilinear, adaptive_avg_pool,
)
from gen_adversarial_tpu.ops.image import avg_pool2d


def torch_upfirdn2d_native(x_nchw, kernel, up, down, pad):
    """The reference's pure-torch upfirdn2d_native (op/upfirdn2d.py:150-184),
    reproduced here as the test oracle (test-only code)."""
    inp = torch.tensor(x_nchw)
    b, c, h, w = inp.shape
    inp = inp.reshape(-1, h, w, 1)
    k = torch.tensor(np.asarray(kernel))
    up_x = up_y = up
    down_x = down_y = down
    pad_x0 = pad_y0 = pad[0]
    pad_x1 = pad_y1 = pad[1]
    _, in_h, in_w, minor = inp.shape
    kernel_h, kernel_w = k.shape
    out = inp.view(-1, in_h, 1, in_w, 1, minor)
    out = F.pad(out, [0, 0, 0, up_x - 1, 0, 0, 0, up_y - 1])
    out = out.view(-1, in_h * up_y, in_w * up_x, minor)
    out = F.pad(out, [0, 0, max(pad_x0, 0), max(pad_x1, 0), max(pad_y0, 0), max(pad_y1, 0)])
    out = out[:, max(-pad_y0, 0): out.shape[1] - max(-pad_y1, 0),
              max(-pad_x0, 0): out.shape[2] - max(-pad_x1, 0), :]
    out = out.permute(0, 3, 1, 2)
    out = out.reshape([-1, 1, in_h * up_y + pad_y0 + pad_y1, in_w * up_x + pad_x0 + pad_x1])
    wt = torch.flip(k, [0, 1]).view(1, 1, kernel_h, kernel_w)
    out = F.conv2d(out, wt)
    out = out.reshape(-1, minor,
                      in_h * up_y + pad_y0 + pad_y1 - kernel_h + 1,
                      in_w * up_x + pad_x0 + pad_x1 - kernel_w + 1)
    out = out.permute(0, 2, 3, 1)
    out = out[:, ::down_y, ::down_x, :]
    out_h = (in_h * up_y + pad_y0 + pad_y1 - kernel_h) // down_y + 1
    out_w = (in_w * up_x + pad_x0 + pad_x1 - kernel_w) // down_x + 1
    return out.view(b, c, out_h, out_w).numpy()


CASES = [
    # (up, down, pad) pairs exercised by StyleGAN2 (generator.py:29-66,129-143)
    (1, 1, (2, 1)),   # Blur after upsample conv (k=3, factor=2)
    (1, 1, (2, 2)),   # Blur before downsample conv
    (2, 1, (2, 1)),   # Upsample module (factor 2, kernel 4)
    (1, 2, (1, 1)),   # Downsample
    (2, 2, (1, 1)),   # mixed
]


@pytest.mark.parametrize("up,down,pad", CASES)
def test_upfirdn2d_matches_torch_native(up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)  # NCHW for torch oracle
    k = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
    k /= k.sum()

    want = torch_upfirdn2d_native(x, k, up, down, pad)  # NCHW
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = upfirdn2d(x_nhwc, jnp.asarray(k), up=up, down=down, pad=pad)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("up,down,pad", CASES)
def test_upfirdn2d_separable_path(up, down, pad):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 12, 12, 5).astype(np.float32))
    k1 = np.array([1, 3, 3, 1], np.float32)
    k1 = k1 / k1.sum()
    k2 = np.outer(k1, k1)
    got_sep = upfirdn2d(x, jnp.asarray(k1), up=up, down=down, pad=pad)
    got_2d = upfirdn2d(x, jnp.asarray(k2), up=up, down=down, pad=pad)
    np.testing.assert_allclose(np.asarray(got_sep), np.asarray(got_2d),
                               rtol=1e-5, atol=1e-5)


def test_upfirdn2d_matches_ref_impl():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 9, 9, 2).astype(np.float32))
    k = make_fir_kernel([1, 2, 1])
    a = upfirdn2d(x, k, up=2, down=1, pad=(1, 1))
    b = upfirdn2d_ref(x, k, up=2, down=1, pad=(1, 1))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_upfirdn2d_grad_matches_torch():
    """First-order grads through upfirdn2d must match torch autograd through
    the native impl (the reference implements these grads by hand via
    UpFirDn2dBackward; XLA gives them automatically)."""
    rng = np.random.RandomState(3)
    x = rng.randn(1, 2, 8, 8).astype(np.float32)
    k = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
    k /= k.sum()

    xt = torch.tensor(x, requires_grad=True)
    b, c, h, w = xt.shape
    inp = xt.reshape(-1, h, w, 1)  # (b*c, h, w, 1), grad flows
    # oracle forward, differentiable (mirror of torch_upfirdn2d_native core)
    out = inp.view(-1, h, 1, w, 1, 1)
    out = F.pad(out, [0, 0, 0, 1, 0, 0, 0, 1]).view(-1, h * 2, w * 2, 1)
    out = F.pad(out, [0, 0, 2, 1, 2, 1])
    out = out.permute(0, 3, 1, 2)
    wt = torch.flip(torch.tensor(k), [0, 1]).view(1, 1, 4, 4)
    out = F.conv2d(out, wt)
    loss = (out ** 2).sum()
    loss.backward()
    want_grad = xt.grad.numpy()

    def f(xj):
        y = upfirdn2d(xj, jnp.asarray(k), up=2, down=1, pad=(2, 1))
        return jnp.sum(y ** 2)

    got_grad = jax.grad(f)(jnp.asarray(x.transpose(0, 2, 3, 1)))
    got_grad = np.asarray(got_grad).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_grad, want_grad, rtol=1e-4, atol=1e-4)


def test_upfirdn2d_double_backward():
    """Double-backward (needed by WGAN-GP gradient penalty in the A-VAE
    trainer) must be exact: check against finite differences of the grad."""
    k = make_fir_kernel([1, 2, 1])
    x = jnp.asarray(np.random.RandomState(4).randn(1, 6, 6, 1).astype(np.float32))

    def g(xj):
        y = upfirdn2d(xj, k, up=1, down=1, pad=(1, 1))
        return jnp.sum(jnp.sin(y))

    def gg(xj):
        return jnp.sum(jax.grad(g)(xj) ** 2)

    got = jax.grad(gg)(x)
    eps = 1e-3
    d = np.zeros_like(np.asarray(x))
    probe = np.zeros_like(d)
    probe[0, 2, 3, 0] = 1.0
    num = (gg(x + eps * probe) - gg(x - eps * probe)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(got)[0, 2, 3, 0], float(num), rtol=1e-2, atol=1e-3)


def test_fused_leaky_relu_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(4, 8, 8, 16).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    want = F.leaky_relu(torch.tensor(x) + torch.tensor(b).view(1, 1, 1, -1),
                        negative_slope=0.2).numpy() * np.sqrt(2, dtype=np.float32)
    got = fused_leaky_relu(jnp.asarray(x), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_gaussian_blur_preserves_mean_and_matches_scipy():
    from scipy.ndimage import correlate
    rng = np.random.RandomState(6)
    x = rng.rand(1, 17, 17, 1).astype(np.float32)
    k1 = np.asarray(gaussian_kernel1d(5, 1.0))
    k2 = np.outer(k1, k1)
    # torch/kornia 'reflect' excludes the edge sample == scipy 'mirror'
    want = correlate(x[0, :, :, 0], k2, mode="mirror")
    got = np.asarray(gaussian_blur2d(jnp.asarray(x), 5, 1.0))[0, :, :, 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_align_corners_matches_torch():
    rng = np.random.RandomState(7)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    want = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)), size=(10, 14),
                         mode="bilinear", align_corners=True).numpy()
    got = resize_bilinear(jnp.asarray(x), 10, 14, align_corners=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-5, atol=1e-5)


def test_resize_bilinear_half_pixel_matches_torch():
    rng = np.random.RandomState(8)
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    want = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)), size=(16, 16),
                         mode="bilinear", align_corners=False).numpy()
    got = resize_bilinear(jnp.asarray(x), 16, 16, align_corners=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-5, atol=1e-5)


def test_adaptive_avg_pool_and_avg_pool():
    rng = np.random.RandomState(9)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    want = F.adaptive_avg_pool2d(torch.tensor(x.transpose(0, 3, 1, 2)), (4, 4)).numpy()
    got = adaptive_avg_pool(jnp.asarray(x), 4, 4)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-6, atol=1e-6)
    want2 = F.avg_pool2d(torch.tensor(x.transpose(0, 3, 1, 2)), 2).numpy()
    got2 = avg_pool2d(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(got2).transpose(0, 3, 1, 2), want2,
                               rtol=1e-6, atol=1e-6)
