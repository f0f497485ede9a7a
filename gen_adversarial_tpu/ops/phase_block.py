"""Phase-domain (space-to-depth) compute path for StyleGAN2's top blocks.

Motivation (BASELINE.md stage roofline): the generator's top resolutions
have LOW channel counts (32 @1024, 64 @512 with channel_multiplier=2 —
reference generator channel table, StyleGan_E4E/stylegan2/generator.py:
300-311).  On TPU the minor (lane) dimension is 128 wide: a 32-channel
NHWC tensor fills 1/4 of every lane tile, so both HBM tiles and MXU lanes
run at <=25-50% utilization exactly where the tensors are biggest.

The fix is a layout, not a new op: carry the activations of a whole block
in space-to-depth form — (B, H/2, W/2, 4C), channel order phase-major
[(py, px, c)] — and rewrite each op of the block (modulated up-conv, noise
injection, bias+leaky-ReLU, 3x3 conv, 1x1 ToRGB) as the algebraically
identical op in that layout.  4C = 128 at the 1024 block: full lanes, and
the 2Hx2W tensor is never materialized.  The earlier single-op phase
experiment (ops/phase_upsample.py, GAT_SG2_UP=phase) regressed end-to-end
because it paid a depth-to-space relayout after EVERY up-conv; here the
phase layout persists across the block and only the 3-channel RGB leaves
it.

Conventions: stride-1 3x3 convs use JAX's correlation convention with
SAME padding; phase index = (py*2 + px); phase-major channel index
= phase*C + c.  Exactness vs the logical-layout path is pinned by
tests/test_phase_block.py.
"""

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major [(py, px, c)]."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # B, H/2, W/2, py, px, c
    return y.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth."""
    b, hh, wh, c4 = y.shape
    c = c4 // 4
    x = y.reshape(b, hh, wh, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H/2, py, W/2, px, c
    return x.reshape(b, 2 * hh, 2 * wh, c)


def phase_conv3x3_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Lift a (3, 3, C, O) stride-1 SAME conv kernel to the phase domain:
    returns (3, 3, 4C, 4O) such that

        conv(x, w, SAME)  ==  depth_to_space(conv(space_to_depth(x), w'))

    Derivation (correlation, per dim): output p = 2a + alpha reads input
    q = p - 1 + t = 2(a + e) + beta with (e, beta) = divmod(alpha - 1 + t, 2),
    e in {-1, 0, 1} — a 3-tap conv in block coordinates.  The lifted kernel
    is 75% zeros (each (alpha, beta, e) admits exactly one t per dim); it is
    materialized dense because the MXU runs dense contractions — 4x the
    logical FLOPs at 4x the lane utilization.
    """
    k1, k2, c, o = w.shape
    assert k1 == 3 and k2 == 3, (k1, k2)
    out = jnp.zeros((3, 3, 4 * c, 4 * o), w.dtype)
    for ay in range(2):
        for ty in range(3):
            ey, by = divmod(ay - 1 + ty, 2)
            for ax in range(2):
                for tx in range(3):
                    ex, bx = divmod(ax - 1 + tx, 2)
                    pin = by * 2 + bx
                    pout = ay * 2 + ax
                    out = out.at[ey + 1, ex + 1,
                                 pin * c:(pin + 1) * c,
                                 pout * o:(pout + 1) * o].add(w[ty, tx])
    return out


def phase_conv1x1_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Lift a (1, 1, C, O) conv kernel to (1, 1, 4C, 4O), block-diagonal
    over phases (a 1x1 conv acts independently per pixel)."""
    _, _, c, o = w.shape
    out = jnp.zeros((1, 1, 4 * c, 4 * o), w.dtype)
    for p in range(4):
        out = out.at[:, :, p * c:(p + 1) * c, p * o:(p + 1) * o].set(w)
    return out


def phase_tile_channels(v: jnp.ndarray) -> jnp.ndarray:
    """Tile a per-logical-channel vector (..., C) to phase-major (..., 4C):
    index phase*C + c must map to v[..., c], which is jnp.tile along the
    channel axis."""
    return jnp.tile(v, (1,) * (v.ndim - 1) + (4,))


def phase_broadcast_noise(noise: jnp.ndarray, c: int) -> jnp.ndarray:
    """Convert per-pixel noise (B, H, W, 1) to phase layout broadcast over
    the C logical channels: (B, H/2, W/2, 4C) with value noise[2i+py, 2j+px]
    at channel phase*C + c (jnp.repeat matches phase-major order)."""
    n = space_to_depth(noise)  # (B, H/2, W/2, 4)
    return jnp.repeat(n, c, axis=-1)


def phase_avg_pool2(y_p: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool of the LOGICAL tensor, computed in phase layout:
    each logical 2x2 block is exactly one phase group, so the pool is the
    mean over the 4 phases — no spatial op at all."""
    b, hh, wh, c4 = y_p.shape
    c = c4 // 4
    return jnp.mean(y_p.reshape(b, hh, wh, 4, c), axis=3)
