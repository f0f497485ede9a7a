"""Pallas TPU kernel for the separable FIR blur - the hottest upfirdn2d
configuration in StyleGAN2 (a Blur follows every up/down-sampling conv;
generator.py:50-66 in SerezD/gen_adversarial).

The XLA path (ops/upfirdn2d.py) lowers the two 1-D depthwise convolutions
as two separate HBM round-trips; this kernel fuses both passes in VMEM:
one DMA of a halo'd input tile, vertical taps, horizontal taps, one write.
Up/down-sampled configurations keep the XLA path (conv lhs_dilation /
strides map well to the hardware and run at lower rates).

Layout: NHWC; grid over (batch, H tiles, C tiles); the (taps-1)-row halo is
fetched with an explicit async copy from HBM (overlapping tiles are not
expressible with BlockSpec index_maps, which address block units).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blur_kernel(k_ref, x_hbm, out_ref, *, taps, th, w_out, c_tile,
                 halo_rows):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)

    def body(scratch, sem):
        row0 = hi * th
        # Mosaic requires 8-aligned slice sizes: copy th + halo_rows rows
        # (halo_rows >= taps-1, multiple of 8) of the full padded width
        dma = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(row0, th + halo_rows), :,
                     pl.ds(ci * c_tile, c_tile)],
            scratch, sem)
        dma.start()
        dma.wait()
        x = scratch[...]
        acc = x[0:th] * k_ref[0]
        for t in range(1, taps):
            acc = acc + x[t:t + th] * k_ref[t]
        out = acc[:, 0:w_out] * k_ref[0]
        for t in range(1, taps):
            out = out + acc[:, t:t + w_out] * k_ref[t]
        out_ref[0] = out

    wp = x_hbm.shape[2]
    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((th + halo_rows, wp, c_tile), out_ref.dtype),
        sem=pltpu.SemaphoreType.DMA,
    )


def pallas_blur(x: jnp.ndarray, kernel1d: jnp.ndarray, pad: tuple = (2, 1),
                interpret: bool = False) -> jnp.ndarray:
    """Fused separable FIR blur (up=1, down=1): upfirdn2d(x, k1d, 1, 1, pad).

    x: (B, H, W, C); kernel1d: (taps,) separable factor (same semantics as
    ops/upfirdn2d.upfirdn2d with a 1-D kernel).  vmap-compatible: mapped
    axes fold into the grid's batch dimension (the EoT wrapper vmaps the
    whole purifier over PRNG keys, so this runs under vmap in every
    defense)."""

    @jax.custom_batching.custom_vmap
    def call(x, k):
        return _pallas_blur_call(x, k, pad, interpret)

    @call.def_vmap
    def _rule(axis_size, in_batched, x, k):
        assert in_batched[0] and not in_batched[1], in_batched
        v = x.shape[0]
        out = call(x.reshape((-1,) + x.shape[2:]), k)
        return out.reshape((v, -1) + out.shape[1:]), True

    return call(x, kernel1d)


@partial(jax.jit, static_argnames=("pad", "interpret"))
def _pallas_blur_call(x: jnp.ndarray, kernel1d: jnp.ndarray,
                      pad: tuple = (2, 1),
                      interpret: bool = False) -> jnp.ndarray:
    b, h, w, c = x.shape
    taps = int(kernel1d.shape[0])
    pad0, pad1 = pad
    h_out = h + pad0 + pad1 - taps + 1
    w_out = w + pad0 + pad1 - taps + 1
    assert h_out > 0 and w_out > 0

    # FIR is a true convolution: flip the taps once (cf. ops/upfirdn2d.py)
    k = jnp.flip(kernel1d, 0).astype(x.dtype)

    # channel tiling: lanes are 128 wide; pad C up
    c_tile = 128
    c_pad = -c % c_tile
    # width padded to a sublane multiple (Mosaic slice alignment)
    wp = w + pad0 + pad1
    wp8 = wp + (-wp % 8)

    # H tiling sized to keep the scratch ~2MB; tiles 8-row aligned
    target = 2 * 1024 * 1024 // max(1, wp8 * c_tile * x.dtype.itemsize)
    th = max(8, min(h_out + (-h_out % 8), (int(target) // 8) * 8))
    n_h = -(-h_out // th)
    halo_rows = 8 * (-(-(taps - 1) // 8))  # >= taps-1, multiple of 8

    # pad rows so every tile's halo'd read stays in bounds
    rows_needed = n_h * th + halo_rows
    xp = jnp.pad(x, ((0, 0), (pad0, rows_needed - h - pad0),
                     (pad0, pad1 + wp8 - wp), (0, c_pad)))

    grid = (b, n_h, (c + c_pad) // c_tile)
    out = pl.pallas_call(
        partial(_blur_kernel, taps=taps, th=th, w_out=w_out, c_tile=c_tile,
                halo_rows=halo_rows),
        out_shape=jax.ShapeDtypeStruct((b, n_h * th, w_out, c + c_pad), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, th, w_out, c_tile),
                               lambda bi, hi, ci: (bi, hi, 0, ci)),
        interpret=interpret,
    )(k, xp)
    return out[:, :h_out, :, :c]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_blur_diff(x, kernel1d, pad, interpret=False):
    """Differentiable (in x) pallas_blur for the model path.

    The FIR taps are fixed binomial constants in every StyleGAN2 blur site
    (generator.py:50-66 upstream) - never parameters - so their cotangent is
    defined as zero.  The x-VJP is the transposed-parameter upfirdn trick
    (reference UpFirDn2dBackward, op/upfirdn2d.py:17-82): for up=down=1,
    grad_x = blur(g, flip(k), pad=(taps-1-pad0, taps-1-pad1)), which this
    routes through the same fused kernel."""
    return pallas_blur(x, kernel1d, pad, interpret)


def _blur_fwd(x, kernel1d, pad, interpret=False):
    return pallas_blur(x, kernel1d, pad, interpret), kernel1d


def _blur_bwd(pad, interpret, kernel1d, g):
    taps = kernel1d.shape[0]
    gpad = (taps - 1 - pad[0], taps - 1 - pad[1])
    gx = pallas_blur(g, jnp.flip(kernel1d, 0), gpad, interpret)
    return gx, jnp.zeros_like(kernel1d)


pallas_blur_diff.defvjp(_blur_fwd, _blur_bwd)
