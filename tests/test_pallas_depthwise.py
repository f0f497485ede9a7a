"""pallas_depthwise: fused BN-SiLU-DW5x5-BN-SiLU segment vs the plain XLA
composition (lax depthwise conv), forward + VJP, in interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from gen_adversarial_tpu.ops.pallas_depthwise import (
    depthwise_silu_segment, reference_segment)


def _oracle(x, wk, s0, b0, s1, b1):
    c = x.shape[-1]
    r = nn.silu(x * s0 + b0)
    r = jax.lax.conv_general_dilated(
        r, wk.reshape(5, 5, 1, c), (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return nn.silu(r * s1 + b1)


def _inputs(b=2, h=8, w=8, c=128, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    wk = jnp.asarray(rng.randn(5, 5, c) * 0.2, jnp.float32)
    s0, b0, s1, b1 = (jnp.asarray(rng.randn(c) * 0.5 + 1.0, jnp.float32)
                      for _ in range(4))
    return x, wk, s0, b0, s1, b1


def test_forward_matches_conv_oracle():
    args = _inputs()
    got = depthwise_silu_segment(*args, True)
    want = _oracle(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_multi_channel_tiles_and_batch_tiling():
    args = _inputs(b=3, h=16, w=16, c=256, seed=1)
    got = depthwise_silu_segment(*args, True)
    want = _oracle(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_reference_segment_matches_conv_oracle():
    args = _inputs(seed=2)
    np.testing.assert_allclose(np.asarray(reference_segment(*args)),
                               np.asarray(_oracle(*args)), rtol=1e-5, atol=1e-5)


def test_vjp_x_matches_autodiff():
    args = _inputs(seed=3)
    g_got = jax.grad(lambda x: jnp.sum(
        depthwise_silu_segment(x, *args[1:], True) ** 2))(args[0])
    g_want = jax.grad(lambda x: jnp.sum(_oracle(x, *args[1:]) ** 2))(args[0])
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-4)


def test_decoder_cell_modes_agree(monkeypatch):
    """ResidualCellDecoder: conv / shiftsum / pallas modes produce the same
    output and input-gradients from the same variables (the fused paths
    extract eval-BN affines via 0/1 probes without changing the tree)."""
    from gen_adversarial_tpu.models.nvae.cells import ResidualCellDecoder

    # in_channels=64 -> hidden=384, 128-aligned like every flagship decoder
    # shape, so the pallas mode runs the real kernel (interpret on CPU)
    cell = ResidualCellDecoder(in_channels=64, out_channels=64,
                               upsampling=False, use_se=True)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.float32)
    monkeypatch.setenv("GAT_NVAE_DW", "conv")
    variables = cell.init(jax.random.PRNGKey(0), x)
    # make the BN stats non-trivial so the affine extraction is exercised
    variables = jax.tree.map(
        lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        if a.ndim == 1 else a, variables)

    outs, grads = {}, {}
    for mode in ("conv", "shiftsum", "pallas"):
        monkeypatch.setenv("GAT_NVAE_DW", mode)
        outs[mode] = cell.apply(variables, x)
        grads[mode] = jax.grad(
            lambda x: jnp.sum(cell.apply(variables, x) ** 2))(x)
    for mode in ("shiftsum", "pallas"):
        np.testing.assert_allclose(np.asarray(outs[mode]),
                                   np.asarray(outs["conv"]),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(grads[mode]),
                                   np.asarray(grads["conv"]),
                                   rtol=2e-4, atol=2e-4)


def test_conv1x1_matmul_mode_agrees(monkeypatch):
    """Conv1x1: the GAT_NVAE_PW=matmul formulation matches the conv HLO
    (same variables, forward + input-gradient), incl. the strided case."""
    from gen_adversarial_tpu.models.nvae.cells import Conv1x1

    rng = np.random.RandomState(6)
    for stride in (1, 2):
        mod = Conv1x1(24, stride=stride)
        x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
        monkeypatch.setenv("GAT_NVAE_PW", "conv")
        variables = mod.init(jax.random.PRNGKey(0), x)
        out, grad = {}, {}
        for mode in ("conv", "matmul"):
            monkeypatch.setenv("GAT_NVAE_PW", mode)
            out[mode] = mod.apply(variables, x)
            grad[mode] = jax.grad(
                lambda x: jnp.sum(mod.apply(variables, x) ** 2))(x)
        np.testing.assert_allclose(np.asarray(out["matmul"]),
                                   np.asarray(out["conv"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(grad["matmul"]),
                                   np.asarray(grad["conv"]),
                                   rtol=1e-4, atol=1e-4)


def test_vjp_params_match_autodiff():
    x, wk, s0, b0, s1, b1 = _inputs(seed=4)

    def loss(fn):
        return lambda wk, s0, b0, s1, b1: jnp.sum(
            jnp.sin(fn(x, wk, s0, b0, s1, b1)))

    got = jax.grad(loss(lambda *a: depthwise_silu_segment(*a, True)),
                   argnums=(0, 1, 2, 3, 4))(wk, s0, b0, s1, b1)
    want = jax.grad(loss(_oracle), argnums=(0, 1, 2, 3, 4))(wk, s0, b0, s1, b1)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=1e-4, atol=1e-4)
