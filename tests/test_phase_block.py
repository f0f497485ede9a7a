"""Exactness of the phase-domain (space-to-depth) StyleGAN2 ops
(ops/phase_block.py) against the logical-layout formulation."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gen_adversarial_tpu.ops.phase_block import (
    depth_to_space, phase_avg_pool2, phase_broadcast_noise,
    phase_conv1x1_kernel, phase_conv3x3_kernel, phase_tile_channels,
    space_to_depth)


def _conv(x, w, pad):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_d2s_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 6, 5))
    assert jnp.array_equal(depth_to_space(space_to_depth(x)), x)


def test_s2d_phase_order():
    # channel order must be phase-major [(py, px, c)]
    x = jnp.arange(1 * 4 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 4, 2)
    y = space_to_depth(x)
    # block (0,0): logical pixels (0,0),(0,1),(1,0),(1,1), channels 0..1 each
    expect = jnp.concatenate(
        [x[0, 0, 0], x[0, 0, 1], x[0, 1, 0], x[0, 1, 1]])
    assert jnp.array_equal(y[0, 0, 0], expect)


def test_phase_conv3x3_matches_logical():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 10, 5), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 5, 7) * 0.3, jnp.float32)
    ref = _conv(x, w, 1)
    got = depth_to_space(_conv(space_to_depth(x), phase_conv3x3_kernel(w), 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_phase_conv1x1_matches_logical():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 6, 6, 4), jnp.float32)
    w = jnp.asarray(rng.randn(1, 1, 4, 3) * 0.5, jnp.float32)
    ref = _conv(x, w, 0)
    got = depth_to_space(_conv(space_to_depth(x), phase_conv1x1_kernel(w), 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_phase_tile_channels_order():
    # per-logical-channel vector applied in phase layout == applying it
    # logically then converting
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 4, 3), jnp.float32)
    v = jnp.asarray(rng.randn(3), jnp.float32)
    ref = space_to_depth(x * v)
    got = space_to_depth(x) * phase_tile_channels(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_phase_broadcast_noise_matches_logical():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 6, 6, 5), jnp.float32)
    n = jnp.asarray(rng.randn(2, 6, 6, 1), jnp.float32)
    ref = space_to_depth(x + 0.3 * n)
    got = space_to_depth(x) + 0.3 * phase_broadcast_noise(n, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_phase_avg_pool2_matches_logical():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
    ref = jnp.mean(x.reshape(2, 4, 2, 4, 2, 3), axis=(2, 4))
    got = phase_avg_pool2(space_to_depth(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_phase_upconv_composes_with_conv3x3():
    """The full phase block chain: fused up-conv (phase out) -> 3x3 conv in
    phase domain -> depth_to_space == dilated conv_transpose + blur -> 3x3
    conv in logical domain (the exact generator block structure)."""
    from gen_adversarial_tpu.ops.phase_upsample import (
        fused_upsample_kernel, phase_upsample)
    from gen_adversarial_tpu.ops.upfirdn2d import upfirdn2d

    rng = np.random.RandomState(6)
    cin, cout = 6, 4
    x = jnp.asarray(rng.randn(2, 8, 8, cin), jnp.float32)
    w_up = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, cout, cout) * 0.3, jnp.float32)
    blur_k = (1.0, 3.0, 3.0, 1.0)

    # logical path (ModulatedConv2d upsample formulation, layers.py)
    wt = jnp.flip(w_up, (0, 1))
    y = lax.conv_general_dilated(
        x, wt, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    k1 = jnp.asarray(blur_k) / sum(blur_k) * 2.0
    y = upfirdn2d(y, k1, up=1, down=1, pad=(1, 1))
    ref = _conv(y, w2, 1)

    # phase path: fused up-conv staying in phase layout, then phase conv
    pk = fused_upsample_kernel(w_up, blur_k)
    yp = _conv(x, pk, 1)  # (B, 8, 8, 4*cout) phase layout @ input grid
    got = depth_to_space(_conv(yp, phase_conv3x3_kernel(w2), 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_phase_upsample_equals_no_d2s_path():
    """phase_upsample == depth_to_space of the raw phase conv output
    (pins the channel-order convention shared by both modules)."""
    from gen_adversarial_tpu.ops.phase_upsample import (
        fused_upsample_kernel, phase_upsample)

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 6, 6, 3), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 5) * 0.3, jnp.float32)
    pk = fused_upsample_kernel(w, (1.0, 3.0, 3.0, 1.0))
    ref = phase_upsample(x, pk)
    got = depth_to_space(_conv(x, pk, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_generator_phase_path_matches_default(monkeypatch):
    """Full Generator forward with the phase top-block path enabled equals
    the default logical path — same params, same noise key — covering the
    fused up-conv, phase noise injection, phase bias+activation, phase 3x3
    conv, phase ToRGB and the inter-block depth_to_space."""
    import gen_adversarial_tpu.models.stylegan2.generator as gmod

    # shrink the channel table so out_ch < 128 triggers the phase path
    monkeypatch.setattr(
        gmod, "generator_channels",
        lambda channel_multiplier=2: {4: 16, 8: 12, 16: 8, 32: 8})
    gen = gmod.Generator(size=32, style_dim=16, n_mlp=2)
    key = jax.random.PRNGKey(0)
    variables = gen.init(key, [jnp.zeros((2, 16))], randomize_noise=False)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    nkey = jax.random.PRNGKey(2)

    def run():
        img, _ = gen.apply(variables, [z], randomize_noise=True,
                           noise_key=nkey)
        return img

    monkeypatch.setenv("GAT_SG2_PHASE_MIN_RES", "0")  # logical path
    ref = run()
    monkeypatch.setenv("GAT_SG2_PHASE_MIN_RES", "16")
    got = run()
    assert ref.shape == got.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    # stored-noise-buffers path (the production E4E decode configuration)
    def run_buffers():
        img, _ = gen.apply(variables, [z], randomize_noise=False)
        return img

    got_b = run_buffers()
    monkeypatch.setenv("GAT_SG2_PHASE_MIN_RES", "0")  # logical path
    ref_b = run_buffers()
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               rtol=2e-4, atol=2e-5)


def test_generator_phase_path_grads_match(monkeypatch):
    """Attacks differentiate through the decode: the phase path must give
    the same input-gradients as the logical path."""
    import gen_adversarial_tpu.models.stylegan2.generator as gmod

    monkeypatch.setattr(
        gmod, "generator_channels",
        lambda channel_multiplier=2: {4: 16, 8: 12, 16: 8})
    gen = gmod.Generator(size=16, style_dim=16, n_mlp=2)
    variables = gen.init(jax.random.PRNGKey(0), [jnp.zeros((1, 16))],
                         randomize_noise=False)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (1, 16))

    def loss(z):
        img, _ = gen.apply(variables, [z], randomize_noise=False)
        return jnp.sum(img ** 2)

    monkeypatch.setenv("GAT_SG2_PHASE_MIN_RES", "0")  # logical path
    g_ref = jax.grad(loss)(z0)
    monkeypatch.setenv("GAT_SG2_PHASE_MIN_RES", "8")
    g_phase = jax.grad(loss)(z0)
    np.testing.assert_allclose(np.asarray(g_phase), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-5)


def test_generator_phase_rgb_output_matches_pooled_logical(monkeypatch):
    """phase_rgb: the generator returns the phased top-block RGB
    (B, H/2, W/2, 12) — its phase mean must equal the 2x2 average pool of
    the logical image (the decode paths fold it into face_pool), with the
    skip upsample computed by the dense phase conv instead of the dilated
    depthwise FIR.  Forward and input-grads."""
    import gen_adversarial_tpu.models.stylegan2.generator as gmod
    from gen_adversarial_tpu.ops.phase_block import phase_avg_pool2

    monkeypatch.setattr(
        gmod, "generator_channels",
        lambda channel_multiplier=2: {4: 16, 8: 12, 16: 8, 32: 8})
    gen = gmod.Generator(size=32, style_dim=16, n_mlp=2)
    variables = gen.init(jax.random.PRNGKey(0), [jnp.zeros((2, 16))],
                         randomize_noise=False)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    nkey = jax.random.PRNGKey(2)

    monkeypatch.setenv("GAT_SG2_PHASE_MIN_RES", "16")

    ref, _ = gen.apply(variables, [z], randomize_noise=True, noise_key=nkey)
    ref_pooled = jnp.mean(ref.reshape(2, 16, 2, 16, 2, 3), axis=(2, 4))

    got, _ = gen.apply(variables, [z], randomize_noise=True, noise_key=nkey,
                       phase_rgb=True)
    assert got.shape == (2, 16, 16, 12)
    np.testing.assert_allclose(np.asarray(phase_avg_pool2(got)),
                               np.asarray(ref_pooled), rtol=2e-4, atol=2e-5)

    # without the phase path enabled, phase_rgb degrades to logical output
    monkeypatch.setenv("GAT_SG2_PHASE_MIN_RES", "0")
    plain, _ = gen.apply(variables, [z], randomize_noise=True,
                         noise_key=nkey, phase_rgb=True)
    assert plain.shape == (2, 32, 32, 3)

    # grads through the pooled output must match the logical formulation
    monkeypatch.setenv("GAT_SG2_PHASE_MIN_RES", "16")

    def loss_phase(z):
        img, _ = gen.apply(variables, [z], randomize_noise=False,
                           phase_rgb=True)
        return jnp.sum(phase_avg_pool2(img) ** 2)

    def loss_ref(z):
        img, _ = gen.apply(variables, [z], randomize_noise=False)
        return jnp.sum(jnp.mean(
            img.reshape(2, 16, 2, 16, 2, 3), axis=(2, 4)) ** 2)

    g_ref = jax.grad(loss_ref)(z)
    g_phase = jax.grad(loss_phase)(z)
    np.testing.assert_allclose(np.asarray(g_phase), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-5)


def test_phase_in_upsample_kernels_match_logical_fused():
    """The lifted phase-in up-conv (ops/phase_upsample.
    phase_in_upsample_kernels) must equal the logical-input fused up-conv
    for arbitrary kernels — the relayout-free block boundary."""
    from gen_adversarial_tpu.ops.phase_upsample import (
        fused_upsample_kernel, phase_in_upsample, phase_in_upsample_kernels)

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 12, 6), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 6, 5) * 0.3, jnp.float32)
    blur = (1, 3, 3, 1)

    pk = fused_upsample_kernel(w, blur)            # logical in, phase out
    ref = _conv(x, pk, 1)                          # (2, 8, 12, 20)

    got = phase_in_upsample(space_to_depth(x),
                            phase_in_upsample_kernels(w, blur))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_generator_phase_in_up_boundary_matches(monkeypatch):
    """GAT_SG2_PHASE_IN_UP=1: with two consecutive phased blocks, the
    second block's up-conv consumes the phase layout directly — outputs
    and input-grads must match both the logical path and the
    depth_to_space-boundary phase path."""
    import gen_adversarial_tpu.models.stylegan2.generator as gmod

    monkeypatch.setattr(
        gmod, "generator_channels",
        lambda channel_multiplier=2: {4: 16, 8: 12, 16: 8, 32: 8})
    gen = gmod.Generator(size=32, style_dim=16, n_mlp=2)
    variables = gen.init(jax.random.PRNGKey(0), [jnp.zeros((2, 16))],
                         randomize_noise=False)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    nkey = jax.random.PRNGKey(2)

    def run():
        img, _ = gen.apply(variables, [z], randomize_noise=True,
                           noise_key=nkey)
        return img

    monkeypatch.setenv("GAT_SG2_PHASE_MIN_RES", "0")  # logical
    ref = run()
    monkeypatch.setenv("GAT_SG2_PHASE_MIN_RES", "16")
    monkeypatch.setenv("GAT_SG2_PHASE_IN_UP", "1")
    got = run()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=3e-5)

    def loss(z_):
        img, _ = gen.apply(variables, [z_], randomize_noise=False)
        return jnp.sum(img ** 2)

    monkeypatch.delenv("GAT_SG2_PHASE_IN_UP")
    monkeypatch.setenv("GAT_SG2_PHASE_MIN_RES", "0")
    g_ref = jax.grad(loss)(z)
    monkeypatch.setenv("GAT_SG2_PHASE_MIN_RES", "16")
    monkeypatch.setenv("GAT_SG2_PHASE_IN_UP", "1")
    g_got = jax.grad(loss)(z)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-5)
