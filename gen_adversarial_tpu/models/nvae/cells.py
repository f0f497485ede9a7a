"""NVAE building-block cells (reference NVAE/modules/architecture.py in
SerezD/gen_adversarial), re-implemented as Flax modules in NHWC.

Notes vs the reference:
- SyncBatchNorm(momentum=0.05) becomes flax BatchNorm(momentum=0.95); in the
  purification path everything runs with running averages (eval mode).
- weight_norm parametrizations are folded into plain kernels at checkpoint
  conversion time (core/torch_convert.py), so the cells hold ordinary convs.
- MaskedConv2d's autoregressive masking (architecture.py:9-34) is applied to
  the kernel at call time.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gen_adversarial_tpu.ops.image import resize_bilinear


def _bn(train: bool, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.95,
                        epsilon=1e-5, name=name)


class Conv1x1(nn.Module):
    """nn.Conv(features, (1,1))-compatible 1x1 conv with an optional
    explicit-einsum formulation (GAT_NVAE_PW=matmul; default conv HLO).

    Measured verdict (v5e-1): ISOLATED, the conv HLO is ~9x slower than
    the matmul at the flagship project C->C/6 shapes (48-61ms vs
    5.5-7.5ms, tools/microbench_ops.py) - but in the FULL jitted defense
    XLA already handles the 1x1s (EoT-32 flagship bf16: conv 53.7/60.4
    img/s at batch 64/96 vs matmul 49.7/OOM), so conv stays the default
    and the microbench number is a fusion-context artifact.  Identical
    variable tree (kernel (1,1,in,out) lecun-normal + zeros bias) either
    way; modes parity-tested (tests/test_pallas_depthwise.py)."""
    features: int
    use_bias: bool = True
    stride: int = 1

    @nn.compact
    def __call__(self, x, in_scale=None, in_bias=None,
                 out_scale=None, out_bias=None):
        """Optional affine folding (GAT_NVAE_BN_FOLD): computes
        out_scale*conv(in_scale*x + in_bias) + out_bias by scaling the
        KERNEL instead of the activations - the per-channel eval-BN affines
        adjacent to the 1x1s in ResidualCellDecoder become weight-sized
        elementwise ops (KB) instead of activation-sized passes (MB).
        With all four None this is byte-identical to the plain conv."""
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, in_ch, self.features))
        if self.stride > 1:
            x = x[:, ::self.stride, :: self.stride, :]
        k2 = kernel if out_scale is None else \
            kernel * out_scale[None, None, None, :]
        keff = k2 if in_scale is None else k2 * in_scale[None, None, :, None]
        if os.environ.get("GAT_NVAE_PW", "conv") == "matmul":
            y = jnp.einsum("bhwc,co->bhwo", x, keff[0, 0])
        else:
            y = jax.lax.conv_general_dilated(
                x, keff, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bias = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            bias = b if out_scale is None else b * out_scale
        if in_bias is not None:
            extra = in_bias @ k2[0, 0]
            bias = extra if bias is None else bias + extra
        if out_bias is not None:
            bias = out_bias if bias is None else bias + out_bias
        if bias is not None:
            y = y + bias
        return y


class _DepthwiseTaps(nn.Module):
    """Parameter-compatible stand-in for the decoder's depthwise nn.Conv:
    holds the identical 'kernel' param (shape (5,5,1,C), lecun-normal init,
    no bias) and returns it, so the cell can route the computation through
    a fused formulation without changing the variable tree (checkpoint
    conversion and all parity tests are unaffected)."""
    features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (5, 5, 1, self.features))


def _dw_mode(train: bool, hidden: int) -> str:
    """How to compute the decoder cell's BN-SiLU-DW5x5-BN-SiLU segment.

    conv:     lax depthwise conv between separate BN/SiLU fusions (XLA's
              convolution HLO is a fusion barrier: 3 HBM round trips).
    shiftsum: depthwise as 25 shifted multiplies - a pure elementwise graph
              XLA fuses with the surrounding eval-BN affines + SiLU into
              one pass.
    pallas:   ops/pallas_depthwise.py fused kernel (one read, one write).

    Fused modes need eval-mode BN (affine); training keeps conv."""
    mode = os.environ.get("GAT_NVAE_DW", "conv")
    if train or mode == "conv":
        return "conv"
    if mode == "pallas" and hidden % 128 != 0:
        return "shiftsum"
    return mode


class SE(nn.Module):
    """Squeeze-and-Excitation gate (architecture.py:37-61)."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        hidden = max(self.out_channels // 16, 4)
        se = jnp.mean(x, axis=(1, 2))
        se = nn.relu(nn.Dense(hidden, name="linear_1")(se))
        se = nn.sigmoid(nn.Dense(self.out_channels, name="linear_2")(se))
        return x * se[:, None, None, :]


class SkipDown(nn.Module):
    out_channels: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = nn.silu(x)
        return Conv1x1(self.out_channels, stride=self.stride, name="conv")(x)


class SkipUp(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # torch F.interpolate(scale_factor=2, bilinear, align_corners=True)
        x = resize_bilinear(x, h * 2, w * 2, align_corners=True)
        return Conv1x1(self.out_channels, name="conv")(x)


class ResidualCellEncoder(nn.Module):
    """(BN-SiLU-conv3x3) x2 + SE, 0.1-scaled residual (architecture.py:96-136)."""
    out_channels: int
    downsampling: bool
    use_se: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride = 2 if self.downsampling else 1
        r = _bn(train, "bn0")(x)
        r = nn.silu(r)
        r = nn.Conv(self.out_channels, (3, 3), strides=(stride, stride),
                    padding=1, name="conv0")(r)
        r = _bn(train, "bn1")(r)
        r = nn.silu(r)
        r = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(r)
        if self.use_se:
            r = SE(self.out_channels, name="se")(r)
        skip = SkipDown(self.out_channels, stride, name="skip")(x) \
            if self.downsampling else x
        return skip + 0.1 * r


class ResidualCellDecoder(nn.Module):
    """MBConv-style cell: 1x1 expand -> 5x5 depthwise -> 1x1 project, with
    BNs between, optional nearest-neighbor upsampling (architecture.py:139-186)."""
    in_channels: int
    out_channels: int
    upsampling: bool
    use_se: bool
    hidden_mul: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.in_channels * self.hidden_mul
        # default ON (promoted 2026-08-21): flagship EoT-32 bf16 60.41 ->
        # 61.74 img/s (+2.2%), reproduced across two healthy-chip runs
        # (tools/bench_queue_results.jsonl); GAT_NVAE_BN_FOLD=0 restores
        # the separate-BN-pass path for A/Bs
        fold = (not train) and os.environ.get("GAT_NVAE_BN_FOLD", "1") == "1"
        r = x
        if self.upsampling:
            b, h, w, c = r.shape
            r = jnp.repeat(jnp.repeat(r, 2, axis=1), 2, axis=2)  # nearest x2
        bn0 = _bn(train, "bn0")
        conv_expand = Conv1x1(hidden, use_bias=False, name="conv_expand")
        bn1, bn2 = _bn(train, "bn1"), _bn(train, "bn2")
        wk = _DepthwiseTaps(hidden, name="conv_depthwise")()
        mode = _dw_mode(train, hidden)

        def _affine(bn, ch):
            # eval BN is affine: probe at 0 and 1 to extract (scale, bias)
            # without touching its variable layout
            z = jnp.zeros((1, 1, 1, ch), r.dtype)
            b_ = bn(z).ravel()
            return bn(jnp.ones_like(z)).ravel() - b_, b_

        if fold:
            # GAT_NVAE_BN_FOLD: eval BNs are per-channel affines adjacent to
            # bias-free convs, so they fold into the kernels exactly:
            #   silu(bn1(expand(bn0(r)))) == silu(expand'(r)) etc.
            # (reference architecture.py:139-186 BN-conv chains; the folding
            # is result-identical at inference by linearity)
            s0, b0 = _affine(bn0, r.shape[-1])
        else:
            r = bn0(r)
            s0 = b0 = None
        if mode == "conv":
            if fold:
                s1, b1 = _affine(bn1, hidden)
                s2, b2 = _affine(bn2, hidden)
                r = nn.silu(conv_expand(r, in_scale=s0, in_bias=b0,
                                        out_scale=s1, out_bias=b1))
                r = jax.lax.conv_general_dilated(
                    r, wk * s2[None, None, None, :], (1, 1),
                    ((2, 2), (2, 2)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=hidden)
                r = nn.silu(r + b2)
            else:
                r = conv_expand(r)
                r = nn.silu(bn1(r))
                r = jax.lax.conv_general_dilated(
                    r, wk, (1, 1), ((2, 2), (2, 2)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=hidden)
                r = nn.silu(bn2(r))
        else:
            # the fused segment formulations consume bn1/bn2 as explicit
            # affines already; under fold, bn0 additionally moves into the
            # expand kernel
            from gen_adversarial_tpu.ops.pallas_depthwise import (
                depthwise_silu_segment, reference_segment)
            r = conv_expand(r, in_scale=s0, in_bias=b0)
            s1, b1 = _affine(bn1, hidden)
            s2, b2 = _affine(bn2, hidden)
            taps = wk.reshape(5, 5, hidden)
            if mode == "pallas":
                r = depthwise_silu_segment(
                    r, taps, s1, b1, s2, b2,
                    jax.default_backend() != "tpu")
            else:
                r = reference_segment(r, taps, s1, b1, s2, b2)
        conv_project = Conv1x1(self.out_channels, use_bias=False,
                               name="conv_project")
        bn3 = _bn(train, "bn3")
        if fold:
            s3, b3 = _affine(bn3, self.out_channels)
            r = conv_project(r, out_scale=s3, out_bias=b3)
        else:
            r = bn3(conv_project(r))
        if self.use_se:
            r = SE(self.out_channels, name="se")(r)
        skip = SkipUp(self.out_channels, name="skip")(x) if self.upsampling else x
        return skip + 0.1 * r


class EncCombinerCell(nn.Module):
    """x_enc + conv1x1(x_dec) (architecture.py:189-202)."""
    out_channels: int

    @nn.compact
    def __call__(self, x_enc, x_dec):
        return x_enc + Conv1x1(self.out_channels, name="conv")(x_dec)


class DecCombinerCell(nn.Module):
    """conv1x1(concat(x, z)) (architecture.py:205-218)."""
    out_channels: int

    @nn.compact
    def __call__(self, x, z):
        return Conv1x1(self.out_channels, name="conv")(
            jnp.concatenate([x, z], axis=-1))


def make_ar_mask(kh: int, kw: int, mirror: bool, zero_diag: bool) -> np.ndarray:
    """Autoregressive kernel mask (architecture.py:9-28): flatten the kernel
    taps, keep the first half - INCLUDING the center tap exactly when
    zero_diag=True (`half = (kh*kw)//2 + int(zero_diag)`, the reference's
    own inverted-looking quirk at architecture.py:13; do NOT "fix" it, every
    NF-equipped checkpoint depends on it) - optionally mirrored.  Returned
    as (kh, kw) float."""
    mask = np.ones((kh * kw,), np.float32)
    half = (kh * kw) // 2 + int(zero_diag)
    mask[half:] = 0
    if mirror:
        mask = mask[::-1].copy()
    return mask.reshape(kh, kw)


class MaskedConv2d(nn.Module):
    out_channels: int
    kernel_size: int
    mirror: bool
    zero_diag: bool
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        from jax import lax
        k = self.kernel_size
        mask = jnp.asarray(make_ar_mask(k, k, self.mirror, self.zero_diag))
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, x.shape[-1] // self.groups, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        masked = kernel * mask[:, :, None, None]
        y = lax.conv_general_dilated(
            x, masked, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups)
        return y + bias


class NFCell(nn.Module):
    """z - AR-masked conv stack (architecture.py:221-239)."""
    num_z: int
    mirror: bool

    @nn.compact
    def __call__(self, z):
        hidden = int(self.num_z * 6)
        h = MaskedConv2d(hidden, 3, self.mirror, zero_diag=True, name="conv0")(z)
        h = nn.elu(h)
        h = MaskedConv2d(hidden, 5, self.mirror, zero_diag=False,
                         groups=hidden, name="conv1")(h)
        h = nn.elu(h)
        h = MaskedConv2d(self.num_z, 1, self.mirror, zero_diag=False, name="conv2")(h)
        return z - h


class NFBlock(nn.Module):
    num_z: int

    @nn.compact
    def __call__(self, z):
        z = NFCell(self.num_z, mirror=False, name="cell1")(z)
        return NFCell(self.num_z, mirror=True, name="cell2")(z)
