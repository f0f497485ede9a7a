"""StyleGAN2 building blocks in Flax / NHWC.

Re-designed TPU-first from the reference
(StyleGan_E4E/stylegan2/generator.py and
StyleGan_Trans/models/stylegan2/model.py in SerezD/gen_adversarial):

- The grouped-conv "one weight per sample" trick in ModulatedConv2d
  (generator.py:163-207) becomes the mathematically identical
  input-scale / output-demodulate formulation: scale input channels by the
  style, convolve with the SHARED weight (one big batched conv on the MXU),
  then scale output channels by the demodulation factor.  This avoids
  per-sample weight materialization entirely and keeps XLA's conv tiling
  optimal.  (The rarely-used per-sample `weights_delta` path falls back to
  a vmapped per-sample conv.)
- upfirdn2d blurs use the separable XLA kernel in ops/upfirdn2d.py.
- All randomness (NoiseInjection) takes explicit PRNG keys.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from gen_adversarial_tpu.ops.fused_act import fused_leaky_relu
from gen_adversarial_tpu.ops.upfirdn2d import upfirdn2d


def pixel_norm(x: jnp.ndarray) -> jnp.ndarray:
    return x * lax.rsqrt(jnp.mean(x ** 2, axis=-1, keepdims=True) + 1e-8)


def _norm1d(k) -> np.ndarray:
    k = np.asarray(k, np.float32)
    return k / k.sum()


# Route the up=1/down=1 blur sites through the Pallas VMEM-fused separable
# kernel (ops/pallas_upfirdn.py) on TPU.  Opt-out with GAT_PALLAS_BLUR=0;
# bit-exactness and the x-VJP are covered by tests/test_pallas_upfirdn.py.
# Measured on v5e (f32, batch 64, the StyleGAN-1024 blur pyramid): 32.3x at
# 32^2x512, 9.3x at 64^2x512; 0.74-0.88x at >=128^2 where XLA's two-pass
# depthwise lowering stops being channel-bound - hence the spatial gate.
_PALLAS_BLUR = os.environ.get("GAT_PALLAS_BLUR", "1") != "0"
_PALLAS_BLUR_MAX_H = 96
# Experimental HBM-traffic knob for the high-res blur sites: the separable
# path costs two depthwise-conv HBM round trips (2R+2W); routing blurs at
# H >= GAT_BLUR_2D_MIN_H through ONE dense 2-D depthwise conv halves the
# traffic (1R+1W) at 2x the taps - a win only where the op is
# bandwidth-bound.  Off by default until the end-to-end gender bench says
# otherwise (the phase-upsample study showed isolated timings mislead here).
_BLUR_2D_MIN_H = int(os.environ.get("GAT_BLUR_2D_MIN_H", "0")) or 10 ** 9


def phase_min_res(default: int) -> int:
    """Resolution threshold for the phase-domain (space-to-depth) top-block
    path (ops/phase_block.py): generator blocks with logical resolution
    >= this AND out_channels < 128 carry their activations in (H/2, W/2, 4C)
    phase layout end-to-end — full 128-wide lanes where the logical channel
    count would waste them.

    `default` is the generator's own output size, i.e. by default only the
    TOP block runs phased — the measured end-to-end winner on v5e for both
    phased paths: gender (1024-px top, 32ch) EoT-32 3.70 -> 5.50 img/s
    (min_res=512, which also phases the mid-stack 512 block, measured 5.29
    — it pays two extra relayouts); cars (512-px top, 64ch) 10.72 -> 12.48.
    GAT_SG2_PHASE_MIN_RES overrides for A/Bs; 0 disables.  Read at trace
    time so tests can monkeypatch."""
    v = os.environ.get("GAT_SG2_PHASE_MIN_RES", "")
    return (int(v) if v else default) or 10 ** 9


def phase_rgb_enabled(default: bool = False) -> bool:
    """Whether decode paths that average-pool the generator output ask for
    the image in phase layout (Generator phase_rgb): the top block's RGB
    then stays space-to-depth, the skip upsample runs as a dense conv at
    H/2 instead of a zero-dilated depthwise at HxWx3 (3/128 lane fill),
    and the pool folds the phase mean in (phase_avg_pool2) — the full-res
    RGB tensor is never materialized.

    The default is PER CALL SITE — measured 2026-08-20 A/Bs went opposite
    ways: cars/StyleTransformer-512 12.51 -> 13.56 img/s (+8.4%, default
    ON there) but gender/PSP-1024 5.47 -> 1.69 (-69%, default OFF there).
    GAT_SG2_PHASE_RGB=0/1 overrides both for A/Bs; read at trace time."""
    v = os.environ.get("GAT_SG2_PHASE_RGB", "")
    return default if v == "" else v == "1"


def blur(x, kernel_1d, pad, upsample_factor: int = 1):
    """Blur module (generator.py:50-66): separable FIR, kernel scaled by
    factor^2 when following an upsampling conv."""
    k = jnp.asarray(_norm1d(kernel_1d))
    if upsample_factor > 1:
        k = k * upsample_factor  # (factor**2) split over the two 1-D passes
    if (_PALLAS_BLUR and x.shape[1] <= _PALLAS_BLUR_MAX_H
            and jax.default_backend() == "tpu"):
        from gen_adversarial_tpu.ops.pallas_upfirdn import pallas_blur_diff
        return pallas_blur_diff(x, k.astype(x.dtype), tuple(pad))
    if x.shape[1] >= _BLUR_2D_MIN_H:
        return upfirdn2d(x, jnp.outer(k, k), up=1, down=1, pad=pad)
    return upfirdn2d(x, k, up=1, down=1, pad=pad)


def upsample_fir(x, kernel_1d, factor: int = 2):
    """Upsample module (generator.py:29-47)."""
    if (factor == 2 and len(kernel_1d) == 4
            and os.environ.get("GAT_SG2_UP", "dilated") == "phase"):
        from gen_adversarial_tpu.ops.phase_upsample import phase_upsample_fir
        return phase_upsample_fir(x, kernel_1d, factor)
    k1 = jnp.asarray(_norm1d(kernel_1d)) * factor  # (factor**2) over 2 passes
    p = len(kernel_1d) - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    if x.shape[1] >= _BLUR_2D_MIN_H:
        return upfirdn2d(x, jnp.outer(k1, k1), up=factor, down=1,
                         pad=(pad0, pad1))
    return upfirdn2d(x, k1, up=factor, down=1, pad=(pad0, pad1))


def downsample_fir(x, kernel_1d, factor: int = 2):
    """Downsample module (model.py:49-67)."""
    k1 = jnp.asarray(_norm1d(kernel_1d))
    p = len(kernel_1d) - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    if x.shape[1] >= _BLUR_2D_MIN_H:
        return upfirdn2d(x, jnp.outer(k1, k1), up=1, down=factor,
                         pad=(pad0, pad1))
    return upfirdn2d(x, k1, up=1, down=factor, pad=(pad0, pad1))


class EqualLinear(nn.Module):
    """Equalized-lr linear (generator.py:69-105): weight stored at unit
    variance / lr_mul, scaled by (1/sqrt(in)) * lr_mul at call time."""
    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        weight = self.param(
            "weight",
            lambda k, s: jax.random.normal(k, s) / self.lr_mul,
            (in_dim, self.out_dim))
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.constant(self.bias_init),
                              (self.out_dim,))
        out = x @ (weight * scale)
        if self.activation:
            out = fused_leaky_relu(out, bias * self.lr_mul)
        elif bias is not None:
            out = out + bias * self.lr_mul
        return out


class EqualConv2d(nn.Module):
    """Equalized-lr conv (model.py:90-119)."""
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, in_ch, self.out_channels))
        scale = 1.0 / math.sqrt(in_ch * k ** 2)
        y = lax.conv_general_dilated(
            x, weight * scale, (self.stride, self.stride),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return y


def scaled_leaky_relu(x, negative_slope: float = 0.2):
    return jax.nn.leaky_relu(x, negative_slope) * math.sqrt(2)


class ModulatedConv2d(nn.Module):
    """Style-modulated conv with demodulation (generator.py:108-207).

    TPU formulation: y = demod(style, W) * conv(x * style, scale * W); for
    the upsample path the shared-weight conv_transpose runs first, then the
    post-conv blur; both orders are algebraically identical to the
    reference's per-sample grouped conv.
    """
    out_channels: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: tuple = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, weights_delta=None,
                 phase_in: bool = False, phase_out: bool = False):
        """phase_in/phase_out: the activation enters/leaves in the
        space-to-depth phase layout (ops/phase_block.py) — supported for
        the generator-block shapes (upsample k=3 with logical input,
        stride-1 k=3, and the 1x1 ToRGB input); per-sample weights_delta
        keeps the logical path."""
        in_ch = x.shape[-1] // (4 if phase_in else 1)
        k = self.kernel_size
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, in_ch, self.out_channels))
        scale = 1.0 / math.sqrt(in_ch * k ** 2)
        style = EqualLinear(in_ch, bias_init=1.0, name="modulation")(style)  # (B, in)

        if weights_delta is not None:
            assert not (phase_in or phase_out), \
                "weights_delta uses the logical per-sample path"
            return self._per_sample_path(x, weight, style, weights_delta, scale)

        if self.demodulate:
            # d[b,o] = rsqrt(sum_{k,i} (scale*W[k,i,o]*s[b,i])^2 + 1e-8)
            w2 = (scale * weight) ** 2                       # (k,k,in,out)
            sum_ki = jnp.einsum("hwio,bi->bo", w2, style ** 2)
            demod = lax.rsqrt(sum_ki + 1e-8)                 # (B, out)

        if phase_in or phase_out:
            return self._phase_path(
                x, weight, style, scale,
                demod if self.demodulate else None, phase_in, phase_out)

        xs = x * style[:, None, None, :]

        if self.upsample:
            if (k == 3 and os.environ.get("GAT_SG2_UP", "dilated") == "phase"
                    and in_ch <= int(os.environ.get("GAT_SG2_UP_MAXCH", "256"))):
                # fused phase decomposition: conv_transpose + blur as ONE
                # dense conv at the input resolution (ops/phase_upsample.py);
                # demod is per out-channel so it commutes with the blur.
                # Channel gate: at the deep low-res / 512-ch layers the
                # (6,6,in,out) combined-kernel build outweighs the tiny conv
                from gen_adversarial_tpu.ops.phase_upsample import (
                    fused_upsample_kernel, phase_upsample)
                pk = fused_upsample_kernel(weight * scale, self.blur_kernel)
                y = phase_upsample(xs, pk)
                if self.demodulate:
                    y = y * demod[:, None, None, :]
                return y
            # conv_transpose(stride 2, pad 0) == dilated conv with flipped kernel
            wt = jnp.flip(weight, (0, 1)) * scale
            y = lax.conv_general_dilated(
                xs, wt, (1, 1), ((k - 1, k - 1), (k - 1, k - 1)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.demodulate:
                y = y * demod[:, None, None, :]
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1
            y = blur(y, self.blur_kernel, (pad0, pad1), upsample_factor=factor)
        elif self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            xs = blur(xs, self.blur_kernel, (pad0, pad1))
            y = lax.conv_general_dilated(
                xs, weight * scale, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.demodulate:
                y = y * demod[:, None, None, :]
        else:
            y = lax.conv_general_dilated(
                xs, weight * scale, (1, 1),
                ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.demodulate:
                y = y * demod[:, None, None, :]
        return y

    def _phase_path(self, x, weight, style, scale, demod,
                    phase_in: bool, phase_out: bool):
        """Phase-domain (space-to-depth) formulations — algebraically
        identical to the logical paths above, pinned by
        tests/test_phase_block.py:

        - upsample (logical in, phase out): the conv_transpose + post-blur
          composite is one dense 3x3 conv at the INPUT resolution producing
          the 4 output phases stacked in channels
          (ops/phase_upsample.fused_upsample_kernel); demod is per logical
          out-channel, so it commutes with the blur and tiles 4x.
        - stride-1 k=3 (phase in, phase out): the lifted
          phase_conv3x3_kernel, 4x the logical FLOPs at 4x lane fill.
        - 1x1 (ToRGB; phase in, phase OUT): block-diagonal
          phase_conv1x1_kernel; the caller depth-to-spaces the 3-channel
          result.
        """
        from gen_adversarial_tpu.ops.phase_block import (
            phase_conv1x1_kernel, phase_conv3x3_kernel, phase_tile_channels)
        from gen_adversarial_tpu.ops.phase_upsample import (
            fused_upsample_kernel)

        k = self.kernel_size
        assert not self.downsample, "phase path covers generator blocks only"
        style_v = phase_tile_channels(style) if phase_in else style
        xs = x * style_v[:, None, None, :]

        if self.upsample:
            assert k == 3 and phase_out
            if phase_in:
                # relayout-free phased block boundary: the up-conv consumes
                # the previous block's phase layout directly via the lifted
                # 2x2-per-output-grid-phase kernels
                # (ops/phase_upsample.phase_in_upsample_kernels)
                from gen_adversarial_tpu.ops.phase_upsample import (
                    phase_in_upsample_kernels, phase_in_upsample)
                kernels = phase_in_upsample_kernels(weight * scale,
                                                    self.blur_kernel)
                y = phase_in_upsample(xs, kernels)
            else:
                pk = fused_upsample_kernel(weight * scale, self.blur_kernel)
                y = lax.conv_general_dilated(
                    xs, pk.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
        elif k == 3:
            assert phase_in and phase_out
            pw = phase_conv3x3_kernel(weight * scale)
            y = lax.conv_general_dilated(
                xs, pw.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            assert k == 1 and phase_in
            pw = phase_conv1x1_kernel(weight * scale)
            y = lax.conv_general_dilated(
                xs, pw.astype(x.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if demod is not None:
            y = y * phase_tile_channels(demod)[:, None, None, :]
        return y

    def _per_sample_path(self, x, weight, style, weights_delta, scale):
        """weights_delta support (E4E hypernetwork editing,
        generator.py:167-170): exact per-sample weights via vmap."""
        k = self.kernel_size

        def one(xb, sb, db):
            w = scale * (weight * (1 + db) * sb[None, None, :, None])
            if self.demodulate:
                d = lax.rsqrt(jnp.sum(w ** 2, axis=(0, 1, 2)) + 1e-8)
                w = w * d[None, None, None, :]
            xb = xb[None]
            if self.upsample:
                wt = jnp.flip(w, (0, 1))
                y = lax.conv_general_dilated(
                    xb, wt, (1, 1), ((k - 1, k - 1), (k - 1, k - 1)),
                    lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            elif self.downsample:
                y = lax.conv_general_dilated(
                    xb, w, (2, 2), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            else:
                y = lax.conv_general_dilated(
                    xb, w, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y[0]

        if self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            x = blur(x, self.blur_kernel, ((p + 1) // 2, p // 2))
        y = jax.vmap(one)(x, style, weights_delta)
        if self.upsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            y = blur(y, self.blur_kernel, ((p + 1) // 2 + factor - 1, p // 2 + 1),
                     upsample_factor=factor)
        return y


class NoiseInjection(nn.Module):
    """image + weight * noise (generator.py:210-222).

    phase=True: `image` is in space-to-depth layout (B, H/2, W/2, 4C); the
    noise is still drawn/stored at the LOGICAL (B, H, W, 1) shape — same
    PRNG bits as the logical path — and converted, so outputs are
    bit-identical up to layout."""

    @nn.compact
    def __call__(self, image, noise=None, key=None, phase: bool = False):
        w = self.param("weight", nn.initializers.zeros, (1,))
        if noise is None and key is None:
            return image  # noise explicitly disabled
        if phase:
            from gen_adversarial_tpu.ops.phase_block import (
                phase_broadcast_noise)
            b, hh, wd, c4 = image.shape
            if noise is None:
                noise = jax.random.normal(key, (b, 2 * hh, 2 * wd, 1),
                                          image.dtype)
            return image + w * phase_broadcast_noise(noise, c4 // 4)
        if noise is None:
            b, h, wd, c = image.shape
            noise = jax.random.normal(key, (b, h, wd, 1), image.dtype)
        return image + w * noise


class StyledConv(nn.Module):
    """ModulatedConv2d + NoiseInjection + FusedLeakyReLU (generator.py:238-270)."""
    out_channels: int
    kernel_size: int
    upsample: bool = False
    blur_kernel: tuple = (1, 3, 3, 1)
    demodulate: bool = True

    @nn.compact
    def __call__(self, x, style, noise=None, key=None, weights_delta=None,
                 phase_in: bool = False, phase_out: bool = False):
        y = ModulatedConv2d(self.out_channels, self.kernel_size,
                            demodulate=self.demodulate, upsample=self.upsample,
                            blur_kernel=self.blur_kernel, name="conv")(
            x, style, weights_delta, phase_in=phase_in, phase_out=phase_out)
        y = NoiseInjection(name="noise")(y, noise=noise, key=key,
                                         phase=phase_out)
        bias = self.param("activate_bias", nn.initializers.zeros,
                          (self.out_channels,))
        if phase_out:
            from gen_adversarial_tpu.ops.phase_block import (
                phase_tile_channels)
            bias = phase_tile_channels(bias)
        return fused_leaky_relu(y, bias)


class ToRGB(nn.Module):
    """1x1 modulated conv to RGB with skip-pyramid upsample (generator.py:273-292)."""
    upsample: bool = True
    blur_kernel: tuple = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, skip=None, weights_delta=None,
                 phase_in: bool = False, phase_out_rgb: bool = False):
        """phase_out_rgb (requires phase_in): return the RGB in phase-major
        space-to-depth layout (B, H/2, W/2, 12) instead of (B, H, W, 3),
        and upsample the incoming logical skip with the dense phase conv at
        H/2 (ops/phase_upsample.phase_upsample_fir_phase_out) instead of
        the zero-dilated depthwise FIR at HxW with 3/128 lane fill — the
        HxWx3 tensor is never materialized.  The caller (generator top
        block -> psp/trans face_pool) folds the phase mean into its
        average pool (ops/phase_block.phase_avg_pool2)."""
        y = ModulatedConv2d(3, 1, demodulate=False, name="conv")(
            x, style, weights_delta, phase_in=phase_in)
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3))
        if phase_in:
            # 1x1 conv output is phase-RGB (B, H/2, W/2, 12): add the bias
            # tiled over phases
            from gen_adversarial_tpu.ops.phase_block import (
                depth_to_space, phase_tile_channels)
            y = y + phase_tile_channels(bias.reshape(3))
            if phase_out_rgb:
                if skip is not None:
                    from gen_adversarial_tpu.ops.phase_upsample import (
                        phase_upsample_fir_phase_out)
                    y = y + phase_upsample_fir_phase_out(skip, self.blur_kernel)
                return y
            # otherwise leave the phase domain — RGB is only 3 channels,
            # so this is the cheap place to relayout
            y = depth_to_space(y)
        else:
            y = y + bias
        if skip is not None:
            skip = upsample_fir(skip, self.blur_kernel)
            y = y + skip
        return y


class ConvLayer(nn.Module):
    """Blur? + EqualConv2d + activation (model.py:546-593)."""
    out_channels: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: tuple = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (k - 1)
            x = blur(x, self.blur_kernel, ((p + 1) // 2, p // 2))
            stride, padding = 2, 0
        else:
            stride, padding = 1, k // 2
        x = EqualConv2d(self.out_channels, k, stride, padding,
                        use_bias=self.use_bias and not self.activate,
                        name="conv")(x)
        if self.activate:
            if self.use_bias:
                bias = self.param("activate_bias", nn.initializers.zeros,
                                  (self.out_channels,))
                x = fused_leaky_relu(x, bias)
            else:
                x = scaled_leaky_relu(x)
        return x


class ResBlock(nn.Module):
    """Residual downsampling block (model.py:595-613)."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = ConvLayer(in_ch, 3, name="conv1")(x)
        y = ConvLayer(self.out_channels, 3, downsample=True, name="conv2")(y)
        skip = ConvLayer(self.out_channels, 1, downsample=True,
                         activate=False, use_bias=False, name="skip")(x)
        return (y + skip) / math.sqrt(2)
