"""Pallas TPU kernel: fused BN(affine)->SiLU->5x5 depthwise->BN->SiLU.

The NVAE decoder cell (reference NVAE/modules/architecture.py:139-186; here
models/nvae/cells.py ResidualCellDecoder) runs an MBConv segment whose
middle is a 5x5 depthwise conv.  In XLA a convolution HLO is a fusion
barrier: the eval-mode BN+SiLU on either side become separate loop fusions,
so the segment costs three HBM round trips.  This kernel computes the whole
segment in one pass: one read of x, one write of y; taps + affines live in
VMEM/SMEM.  The flagship decoder shapes (hidden channels 1536/768/384 at
8^2/16^2/32^2) are 128-lane aligned, and H x W is small enough that a
block holds the full spatial extent, so the 5x5 stencil needs no
cross-block halo - borders are zero-padded in-register.

Depthwise follows XLA's correlation convention (no kernel flip), matching
`lax.conv_general_dilated(..., feature_group_count=C)` with SAME (2,2)
padding, kernel (5,5,1,C).

`depthwise_silu_segment` is differentiable via jax.custom_vjp: the
backward recomputes activations with the plain-XLA shift-sum formulation
(one fused elementwise graph) - correct for x/taps/affine cotangents;
unused cotangents are DCE'd by XLA when only d/dx is requested (the attack
path).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = 5
PAD = 2
LANES = 128


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _kernel(x_ref, w_ref, s0_ref, b0_ref, s1_ref, b1_ref, out_ref):
    # x_ref: (bt, H, W, 128); w_ref: (5, 5, 128); affines: (1, 128).
    # Internal math in f32: Mosaic's logistic lowering rejects bf16
    # (vector.broadcast dtype mismatch), and f32 accumulation is better
    # numerically anyway; in/out stay in the model dtype.
    x = x_ref[...].astype(jnp.float32)
    xa = _silu(x * s0_ref[0].astype(jnp.float32) + b0_ref[0].astype(jnp.float32))
    h, w = x.shape[1], x.shape[2]
    # pad W to a sublane-aligned width so every tap's slice after the roll
    # is 8-aligned; the 2-col borders plus alignment tail are zeros, and
    # rolls by <= 4 never wrap data back into the live [0, w) window
    wp = w + 2 * PAD
    wpad = -wp % 8
    xp = jnp.pad(xa, ((0, 0), (PAD, PAD), (PAD, PAD + wpad), (0, 0)))
    wk = w_ref[...].astype(jnp.float32)
    wpx = wp + wpad
    acc = None
    for dy in range(TAPS):
        rows = xp[:, dy:dy + h, :, :]
        for dx in range(TAPS):
            # left-rotate by dx == roll right by wpx-dx (pltpu.roll wants
            # shift >= 0); the wrapped-in columns are alignment zeros
            shifted = pltpu.roll(rows, wpx - dx, 2) if dx else rows
            t = shifted[:, :, 0:w, :] * wk[dy, dx]
            acc = t if acc is None else acc + t
    y = _silu(acc * s1_ref[0].astype(jnp.float32) + b1_ref[0].astype(jnp.float32))
    out_ref[...] = y.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _segment_call(x, wk, scale0, bias0, scale1, bias1, interpret=False):
    b, h, w, c = x.shape
    assert c % LANES == 0, c
    assert wk.shape == (TAPS, TAPS, c), wk.shape

    # batch tile: keep the input block ~1MB of INTERNAL (f32) footprint -
    # the kernel upcasts to f32 regardless of the model dtype, so sizing by
    # the input itemsize overflows the 16M scoped-vmem stack for bf16
    # (measured: 17.57M at bt=4, (32,32,384) bf16)
    per_sample = h * w * LANES * 4
    bt = max(1, min(b, (1 << 20) // per_sample))
    while b % bt:
        bt -= 1

    aff = lambda: pl.BlockSpec((1, LANES), lambda bi, ci: (0, ci))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        grid=(b // bt, c // LANES),
        in_specs=[
            pl.BlockSpec((bt, h, w, LANES), lambda bi, ci: (bi, 0, 0, ci)),
            pl.BlockSpec((TAPS, TAPS, LANES), lambda bi, ci: (0, 0, ci)),
            aff(), aff(), aff(), aff(),
        ],
        out_specs=pl.BlockSpec((bt, h, w, LANES), lambda bi, ci: (bi, 0, 0, ci)),
        interpret=interpret,
    )(x, wk, scale0.reshape(1, c), bias0.reshape(1, c),
      scale1.reshape(1, c), bias1.reshape(1, c))
    return out


def _shiftsum(x, wk):
    """Depthwise 5x5 as 25 shifted multiplies (correlation, SAME pad);
    pure elementwise graph - XLA fuses it with neighbors."""
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    acc = None
    for dy in range(TAPS):
        for dx in range(TAPS):
            t = xp[:, dy:dy + h, dx:dx + w, :] * wk[dy, dx]
            acc = t if acc is None else acc + t
    return acc


def _dsilu(a):
    s = jax.nn.sigmoid(a)
    return s * (1 + a * (1 - s))


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def depthwise_silu_segment(x, wk, scale0, bias0, scale1, bias1,
                           interpret=False):
    """silu(DW5x5(silu(x*scale0+bias0)) * scale1 + bias1), one fused pass.

    x: (B,H,W,C) with C % 128 == 0; wk: (5,5,C) depthwise taps (XLA
    correlation convention); affines: (C,)."""
    return _segment_call(x, wk, scale0, bias0, scale1, bias1,
                         interpret=interpret)


def _seg_fwd(x, wk, scale0, bias0, scale1, bias1, interpret=False):
    y = _segment_call(x, wk, scale0, bias0, scale1, bias1,
                      interpret=interpret)
    return y, (x, wk, scale0, bias0, scale1, bias1)


def _seg_bwd(interpret, res, g):
    x, wk, scale0, bias0, scale1, bias1 = res
    a0 = x * scale0 + bias0
    xa = _silu(a0)
    acc = _shiftsum(xa, wk)
    a1 = acc * scale1 + bias1
    gi = g * _dsilu(a1)
    dacc = gi * scale1
    # correlation transpose: depthwise with spatially flipped taps
    dxa = _shiftsum(dacc, jnp.flip(wk, (0, 1)))
    dx = dxa * _dsilu(a0) * scale0
    # tap/affine cotangents (DCE'd when only d/dx is pulled, e.g. attacks)
    h, w = x.shape[1], x.shape[2]
    xap = jnp.pad(xa, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    dwk = jnp.stack([
        jnp.stack([
            jnp.sum(xap[:, dy:dy + h, dx:dx + w, :] * dacc, axis=(0, 1, 2))
            for dx in range(TAPS)], axis=0)
        for dy in range(TAPS)], axis=0)
    ds1 = jnp.sum(gi * acc, axis=(0, 1, 2))
    db1 = jnp.sum(gi, axis=(0, 1, 2))
    gx0 = dxa * _dsilu(a0)
    ds0 = jnp.sum(gx0 * x, axis=(0, 1, 2))
    db0 = jnp.sum(gx0, axis=(0, 1, 2))
    return dx, dwk, ds0, db0, ds1, db1


depthwise_silu_segment.defvjp(_seg_fwd, _seg_bwd)


def reference_segment(x, wk, scale0, bias0, scale1, bias1):
    """Plain-XLA oracle of the fused segment (for tests and as the
    non-Pallas fast path: the shift-sum keeps the whole segment one XLA
    fusion)."""
    r = _silu(x * scale0 + bias0)
    r = _shiftsum(r, wk)
    return _silu(r * scale1 + bias1)
