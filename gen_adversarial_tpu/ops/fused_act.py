"""Fused bias + scaled LeakyReLU.

The reference ships a CUDA kernel plus a double-backward autograd Function
for this (op/fused_bias_act_kernel.cu, op/fused_act.py:18-69 in
SerezD/gen_adversarial).  On TPU the op is a pure elementwise expression
that XLA fuses into the surrounding matmul/conv epilogue, and JAX autodiff
gives exact first and second derivatives for free, so no custom VJP is
required for parity (the reference's custom backward computes exactly the
derivative of this expression).
"""

import math

import jax.numpy as jnp


def fused_leaky_relu(x: jnp.ndarray, bias: jnp.ndarray | None = None,
                     negative_slope: float = 0.2,
                     scale: float = math.sqrt(2.0)) -> jnp.ndarray:
    """out = scale * leaky_relu(x + bias).

    `bias` is broadcast over the channel (last) axis, matching the
    reference's FusedLeakyReLU module semantics (op/fused_act.py:72-85)
    under the NHWC layout used throughout this framework.
    """
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, x * negative_slope) * scale
