"""Phase-decomposed fused upsample for StyleGAN2's up-convolution.

The reference upsample path (StyleGan_E4E/stylegan2/generator.py:163-207 +
op/upfirdn2d.py) is conv_transpose(stride 2, k=3) followed by a 4-tap
separable FIR blur - on TPU that means a zero-dilated convolution at the
OUTPUT resolution (2Hx2W) plus a depthwise blur pass, both of which XLA
lowers poorly at the generator's top (high-res, low-channel) layers.

Both ops are linear, so their composition is a single stride-2 transposed
convolution with the 6x6 kernel G = K2 (*) W (full 2-D convolution of the
4x4 outer-product blur kernel with the 3x3 conv kernel).  A stride-2
transposed conv splits exactly into its 4 output phases, and each phase of
a 6-tap kernel touches only 3 input taps - so the whole thing becomes:

    one dense 3x3 conv at the INPUT resolution, in_ch -> 4*out_ch
    (the 4 phases stacked in the channel dim), then a depth-to-space
    interleave to (B, 2H, 2W, out_ch).

Per-dimension derivation (correlation convention, fW = flip(W), fK =
flip(K)): the transposed conv produces yt[q] = sum_t fW[t] x[(q+t-2)/2]
(odd terms vanish), the blur z[o] = sum_s fK[s] yt[o+s-1]; substituting,
z[o] = sum_i x[i] * G[2i+3-o] with G = conv_full(fK, fW).  Even outputs
o=2a read G at odd indices {5,3,1} over x[a-1..a+1]; odd outputs read even
indices {4,2,0}.  Same decomposition independently per dimension in 2-D.

MACs are identical to the dilated form (4x fewer pixels x 4x channels),
but the conv is dense, undilated, and channel-aligned for the MXU, and the
separate blur pass (plus its HBM round trip) disappears.  Exactness vs the
reference composition is pinned by tests/test_phase_upsample.py.

Measured verdict (v5e-1, GAT_SG2_UP=phase): ISOLATED per-layer timings win
big (tools/microbench_stylegan.py bf16 batch 8: 3.6-20ms vs 45-54ms
dilated+blur per upsample layer) - but the FULL EoT-32 gender defense
REGRESSES (3.53 -> 1.55 img/s; 1.66 with the in_ch<=256 gate), so the
dilated path stays the default.  Same lesson as the NVAE Conv1x1 study
(models/nvae/cells.py): on this stack, isolated-program timings carry a
large fixed per-program cost and do not predict fused-graph behavior;
only end-to-end benches gate defaults.
"""

import jax.numpy as jnp
from jax import lax


def _norm1d(k):
    k = jnp.asarray(k, jnp.float32)
    return k / jnp.sum(k)


def fused_upsample_kernel(weight: jnp.ndarray, blur_1d,
                          upsample_factor: int = 2) -> jnp.ndarray:
    """Build the (3, 3, in, 4*out) phase kernel from the conv weight.

    weight: (3, 3, in, out) - the ALREADY-SCALED modulated-conv weight.
    blur_1d: the 4-tap FIR factor, e.g. (1, 3, 3, 1); normalized here and
    scaled by factor^2 total (factor per 1-D pass), as the reference does
    after an upsampling conv.
    """
    k, k2, cin, cout = weight.shape
    assert k == 3 and k2 == 3, "phase decomposition assumes k=3"
    fw = jnp.flip(weight, (0, 1))
    f = _norm1d(blur_1d) * upsample_factor
    fk2 = jnp.outer(jnp.flip(f, 0), jnp.flip(f, 0)).astype(weight.dtype)

    # G[r1, r2] = sum_{s1, s2} fk2[s1, s2] * fw[r1-s1, r2-s2]  (6x6 support)
    g = jnp.zeros((6, 6, cin, cout), weight.dtype)
    for s1 in range(4):
        for s2 in range(4):
            g = g.at[s1:s1 + 3, s2:s2 + 3].add(fk2[s1, s2] * fw)

    # phase (py, px): correlation tap u multiplies x[a-1+u], giving
    # G-index r = 2u + 1 for even outputs (o = 2a) and r = 2u for odd
    idx = {0: jnp.array([1, 3, 5]), 1: jnp.array([0, 2, 4])}
    phases = [g[idx[py]][:, idx[px]] for py in (0, 1) for px in (0, 1)]
    return jnp.concatenate(phases, axis=-1)  # (3, 3, in, 4*out)


def phase_upsample_fir_phase_out(x: jnp.ndarray, blur_1d,
                                 factor: int = 2) -> jnp.ndarray:
    """layers.upsample_fir (zero-insert x2 + 4-tap FIR) computed as one
    dense 3x3 conv at the input resolution, output LEFT in the phase-major
    space-to-depth layout (B, H, W, 4C), [(py, px, c)] channel order
    (ops/phase_block.py conventions).

    Per-dim (correlation, fK = flip(norm(k) * factor), window x[a-1..a+1]):
    even outputs o=2a take taps [fK[0], fK[2], 0], odd [0, fK[1], fK[3]].
    """
    assert factor == 2 and len(blur_1d) == 4
    c = x.shape[-1]
    f = _norm1d(blur_1d) * factor
    fk = jnp.flip(f, 0)
    ph = {0: jnp.array([fk[0], fk[2], 0.0]),
          1: jnp.array([0.0, fk[1], fk[3]])}
    # dense (3, 3, C, 4C) kernel, block-diagonal over channels; phase-major
    # output layout [(py, px, c)]
    eye = jnp.eye(c, dtype=x.dtype)
    k2 = jnp.concatenate(
        [jnp.einsum("u,v,cd->uvcd", ph[py], ph[px], eye)
         for py in (0, 1) for px in (0, 1)], axis=-1).astype(x.dtype)
    return lax.conv_general_dilated(
        x, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def phase_upsample_fir(x: jnp.ndarray, blur_1d,
                       factor: int = 2) -> jnp.ndarray:
    """Fused phase form of layers.upsample_fir (zero-insert x2 + 4-tap FIR,
    the ToRGB skip-pyramid upsample): one 3x3 conv at the input resolution
    + depth-to-space, instead of a dilated depthwise conv at 2Hx2W."""
    b, h, w, c = x.shape
    y = phase_upsample_fir_phase_out(x, blur_1d, factor)
    y = y.reshape(b, h, w, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, c)


def phase_upsample(x: jnp.ndarray, phase_kernel: jnp.ndarray) -> jnp.ndarray:
    """Apply the fused up-conv: (B, H, W, in) -> (B, 2H, 2W, out)."""
    b, h, w, _ = x.shape
    cout4 = phase_kernel.shape[-1]
    cout = cout4 // 4
    y = lax.conv_general_dilated(
        x, phase_kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # (B, H, W, [py, px, out]) -> interleave phases into space
    y = y.reshape(b, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # B, H, py, W, px, out
    return y.reshape(b, 2 * h, 2 * w, cout)


def phase_in_upsample_kernels(weight: jnp.ndarray, blur_1d,
                              upsample_factor: int = 2):
    """Lift the fused up-conv so it consumes PHASE-layout input directly —
    the relayout-free block boundary when two consecutive generator blocks
    both run phased (ROADMAP r4: 'phase BOTH top blocks with one relayout').

    The logical fused kernel pk (fused_upsample_kernel) computes, on the
    input's logical grid A (SAME pad 1):

        y_phase[A, (p, o)] = sum_{t in 3x3} pk[t] . x[A - 1 + t]

    With x itself in phase layout xp (block a, phase g: x[2a+g] = xp[a, g]),
    write A = 2a' + beta:  A - 1 + t = 2(a' + e) + g  with
    (e, g) = divmod(beta - 1 + t, 2).  Per output-grid phase beta the taps
    collapse to a 2x2 conv over blocks (e spans 2 values), reading the
    4C-channel phase input - full 128-wide lanes on both sides, and the
    half-lane logical tensor at the boundary is never materialized.

    Returns [(K, pad)] for beta = (0,0),(0,1),(1,0),(1,1):
    K (2, 2, 4*cin, 4*cout) phase-major in/out, pad the per-dim explicit
    conv padding.  Output channel concat over beta (beta-major) followed by
    ops.phase_block.depth_to_space yields exactly the phase_out layout of
    the logical path (pinned by tests/test_phase_block.py)."""
    pk = fused_upsample_kernel(weight, blur_1d, upsample_factor)
    _, _, cin, cout4 = pk.shape
    out = []
    for by in (0, 1):
        for bx in (0, 1):
            k = jnp.zeros((2, 2, 4 * cin, cout4), pk.dtype)
            for ty in range(3):
                ey, gy = divmod(by - 1 + ty, 2)
                iy = ey + (1 if by == 0 else 0)
                for tx in range(3):
                    ex, gx = divmod(bx - 1 + tx, 2)
                    ix = ex + (1 if bx == 0 else 0)
                    ph = gy * 2 + gx
                    k = k.at[iy, ix, ph * cin:(ph + 1) * cin, :].add(pk[ty, tx])
            pad = ((1, 0) if by == 0 else (0, 1),
                   (1, 0) if bx == 0 else (0, 1))
            out.append((k, pad))
    return out


def phase_in_upsample(xp: jnp.ndarray, kernels) -> jnp.ndarray:
    """Apply phase_in_upsample_kernels: (B, H/2, W/2, 4*cin) phase input ->
    (B, H, W, 4*cout) phase output (of the 2H x 2W logical image)."""
    b, hh, wh, _ = xp.shape
    ys = [lax.conv_general_dilated(
        xp, k.astype(xp.dtype), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) for k, pad in kernels]
    y4 = jnp.concatenate(ys, axis=-1)  # (B, H/2, W/2, 4 * 4*cout), beta-major
    from gen_adversarial_tpu.ops.phase_block import depth_to_space
    return depth_to_space(y4)
