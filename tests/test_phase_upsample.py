"""phase_upsample: the fused phase-decomposed up-conv must match the
sequential conv_transpose(stride 2, k=3) + FIR-blur path bit-for-bit in
shape and numerically in value (it is an exact algebraic refactoring)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from gen_adversarial_tpu.ops.phase_upsample import (
    fused_upsample_kernel, phase_upsample)
from gen_adversarial_tpu.ops.upfirdn2d import upfirdn2d


BLUR = (1, 3, 3, 1)


def _sequential(x, weight, blur_1d=BLUR):
    """The existing ModulatedConv2d upsample composition
    (models/stylegan2/layers.py:174-187) minus modulation/demodulation."""
    k = weight.shape[0]
    wt = jnp.flip(weight, (0, 1))
    y = lax.conv_general_dilated(
        x, wt, (1, 1), ((k - 1, k - 1), (k - 1, k - 1)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    factor = 2
    p = (len(blur_1d) - factor) - (k - 1)
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2 + 1
    kb = jnp.asarray(blur_1d, jnp.float32)
    kb = kb / kb.sum() * factor
    return upfirdn2d(y, kb, up=1, down=1, pad=(pad0, pad1))


def test_matches_sequential_path():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 16, 12) * 0.1, jnp.float32)
    want = _sequential(x, w)
    got = phase_upsample(x, fused_upsample_kernel(w, BLUR))
    assert got.shape == want.shape == (2, 16, 16, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_matches_at_odd_content_and_sizes():
    rng = np.random.RandomState(1)
    for h, w_ in ((4, 4), (5, 7), (16, 16)):
        x = jnp.asarray(rng.randn(1, h, w_, 8), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.2, jnp.float32)
        want = _sequential(x, w)
        got = phase_upsample(x, fused_upsample_kernel(w, BLUR))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_modulated_conv_phase_mode_agrees(monkeypatch):
    """ModulatedConv2d upsample: GAT_SG2_UP=phase matches the dilated+blur
    default from the same variables, incl. demodulation and gradients."""
    from gen_adversarial_tpu.models.stylegan2.layers import ModulatedConv2d

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    style = jnp.asarray(rng.randn(2, 16), jnp.float32)
    mod = ModulatedConv2d(12, 3, upsample=True)
    monkeypatch.setenv("GAT_SG2_UP", "dilated")
    variables = mod.init(jax.random.PRNGKey(0), x, style)
    out, grad = {}, {}
    for mode in ("dilated", "phase"):
        monkeypatch.setenv("GAT_SG2_UP", mode)
        out[mode] = mod.apply(variables, x, style)
        grad[mode] = jax.grad(lambda x: jnp.sum(
            mod.apply(variables, x, style) ** 2))(x)
    assert out["phase"].shape == out["dilated"].shape == (2, 16, 16, 12)
    np.testing.assert_allclose(np.asarray(out["phase"]),
                               np.asarray(out["dilated"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad["phase"]),
                               np.asarray(grad["dilated"]),
                               rtol=1e-4, atol=1e-4)


def test_phase_upsample_fir_matches():
    from gen_adversarial_tpu.ops.phase_upsample import phase_upsample_fir
    from gen_adversarial_tpu.models.stylegan2.layers import upsample_fir

    rng = np.random.RandomState(5)
    for (h, w_, c) in ((4, 4, 3), (8, 6, 3), (16, 16, 8)):
        x = jnp.asarray(rng.randn(2, h, w_, c), jnp.float32)
        want = upsample_fir(x, BLUR)  # default (dilated) path
        got = phase_upsample_fir(x, BLUR)
        assert got.shape == want.shape == (2, 2 * h, 2 * w_, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_generator_phase_mode_agrees(monkeypatch):
    """Full StyleGAN2 generator (size 64): phase mode reproduces the
    default path's image from the same variables."""
    from gen_adversarial_tpu.models.stylegan2.generator import Generator

    gen = Generator(size=64)
    z = jnp.asarray(np.random.RandomState(4).randn(2, 512), jnp.float32)
    monkeypatch.setenv("GAT_SG2_UP", "dilated")
    variables = gen.init(jax.random.PRNGKey(0), [z], randomize_noise=False)
    imgs = {}
    for mode in ("dilated", "phase"):
        monkeypatch.setenv("GAT_SG2_UP", mode)
        imgs[mode], _ = gen.apply(variables, [z], randomize_noise=False)
    np.testing.assert_allclose(np.asarray(imgs["phase"]),
                               np.asarray(imgs["dilated"]),
                               rtol=2e-4, atol=2e-4)


def test_gradient_matches():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 6, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 4, 4) * 0.3, jnp.float32)

    g_got = jax.grad(lambda x: jnp.sum(
        phase_upsample(x, fused_upsample_kernel(w, BLUR)) ** 2))(x)
    g_want = jax.grad(lambda x: jnp.sum(_sequential(x, w) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-4)
    gw_got = jax.grad(lambda w: jnp.sum(jnp.sin(
        phase_upsample(x, fused_upsample_kernel(w, BLUR)))))(w)
    gw_want = jax.grad(lambda w: jnp.sum(jnp.sin(_sequential(x, w))))(w)
    np.testing.assert_allclose(np.asarray(gw_got), np.asarray(gw_want),
                               rtol=1e-4, atol=1e-4)
