"""A-VAE competitor: StyleGAN-ish VAE purifier (reference
src/defenses/competitors/a_vae/{model.py,modules.py} in
SerezD/gen_adversarial), Flax / NHWC.

Equalized-lr is applied at call time (weight * sqrt(2/fan_in), the EqualLR
hook semantics, modules.py:8-37).  The reference's custom BlurFunction
autograd pair (modules.py:106-162) is unnecessary here: for the symmetric
binomial kernel its hand-written backward equals the true adjoint, which
JAX autodiff provides exactly.

Faithfully reproduced quirk: EncodeConvBlock computes InstanceNorm but
discards the result (modules.py:414-423 calls `self.norm1(out)` without
assignment), so the encoder is effectively norm-free; we skip the norm and
document it here.
"""

import math
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from gen_adversarial_tpu.models.stylegan2.layers import pixel_norm


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


class AEqualConv2d(nn.Module):
    """EqualLR conv: weight * sqrt(2 / fan_in) at call (modules.py:165-175)."""
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, in_ch, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        mult = math.sqrt(2.0 / (in_ch * k * k))
        y = lax.conv_general_dilated(
            x, w * mult, (self.stride, self.stride),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b


class AEqualLinear(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (in_dim, self.out_dim))
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return x @ (w * math.sqrt(2.0 / in_dim)) + b


def _smooth4(w):
    """pad 1 + average 4 shifted copies: the k -> k+1 smoothing used by the
    fused up/down-sample convs (modules.py:56-62). w: (k,k,I,O) -> (k+1,k+1,I,O)."""
    w = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    return (w[1:, 1:] + w[:-1, 1:] + w[1:, :-1] + w[:-1, :-1]) / 4.0


class FusedUpsample(nn.Module):
    """conv_transpose stride 2 with the smoothed kernel (modules.py:40-66)."""
    out_channels: int
    kernel_size: int
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, in_ch, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        mult = math.sqrt(2.0 / (in_ch * k * k))
        wk = _smooth4(w * mult)  # (k+1, k+1, I, O)
        ks = k + 1
        pad = ks - 1 - self.padding
        y = lax.conv_general_dilated(
            x, jnp.flip(wk, (0, 1)), (1, 1), ((pad, pad), (pad, pad)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b


class FusedDownsample(nn.Module):
    out_channels: int
    kernel_size: int
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, in_ch, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        mult = math.sqrt(2.0 / (in_ch * k * k))
        wk = _smooth4(w * mult)
        y = lax.conv_general_dilated(
            x, wk, (2, 2), ((self.padding, self.padding),) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b


BINOMIAL3 = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32) / 16.0


def blur3(x):
    """Fixed 3x3 binomial depthwise blur (modules.py:149-162)."""
    c = x.shape[-1]
    k = jnp.tile(jnp.asarray(BINOMIAL3)[:, :, None, None], (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def instance_norm(x, eps: float = 1e-5):
    """InstanceNorm2d without affine (torch default)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


class AdaptiveInstanceNorm(nn.Module):
    """IN + per-channel affine from style (modules.py:282-299)."""

    @nn.compact
    def __call__(self, x, style):
        c = x.shape[-1]
        st = AEqualLinear(c * 2, name="style")(style)
        gamma, beta = st[:, :c], st[:, c:]
        out = instance_norm(x)
        return gamma[:, None, None, :] * out + beta[:, None, None, :]


class ANoiseInjection(nn.Module):
    """image + (weight * sqrt(2/C)) * noise - the EqualLR hook applies to
    the noise weight too (model.py:366)."""

    @nn.compact
    def __call__(self, image, noise):
        c = image.shape[-1]
        w = self.param("weight", nn.initializers.zeros, (1, 1, 1, c))
        return image + (w * math.sqrt(2.0 / c)) * noise


class StyledConvBlock(nn.Module):
    """modules.py:325-388."""
    out_channels: int
    kernel_size: int = 3
    padding: int = 1
    initial: bool = False
    upsample: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x, style, noise):
        if self.initial:
            const = self.param("const_input", nn.initializers.normal(1.0),
                               (1, 4, 4, self.out_channels))
            out = jnp.broadcast_to(const, (x.shape[0],) + const.shape[1:])
        elif self.upsample:
            if self.fused:
                out = FusedUpsample(self.out_channels, self.kernel_size,
                                    self.padding, name="conv1_fused")(x)
                out = blur3(out)
            else:
                out = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                out = AEqualConv2d(self.out_channels, self.kernel_size,
                                   padding=self.padding, name="conv1")(out)
                out = blur3(out)
        else:
            out = AEqualConv2d(self.out_channels, self.kernel_size,
                               padding=self.padding, name="conv1")(x)

        out = ANoiseInjection(name="noise1")(out, noise)
        out = _lrelu(out)
        out = AdaptiveInstanceNorm(name="adain1")(out, style)

        out = AEqualConv2d(self.out_channels, self.kernel_size,
                           padding=self.padding, name="conv2")(out)
        out = ANoiseInjection(name="noise2")(out, noise)
        out = _lrelu(out)
        out = AdaptiveInstanceNorm(name="adain2")(out, style)
        return out


class EncodeConvBlock(nn.Module):
    """modules.py:391-425 (norm result discarded upstream -> omitted)."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = AEqualConv2d(self.out_channels, 3, padding=1, name="conv1")(x)
        x = _lrelu(x)
        x = AEqualConv2d(self.out_channels, 3, stride=2, padding=1, name="conv2")(x)
        return _lrelu(x)


class AVAEEncoder(nn.Module):
    """model.py:9-26: three stride-2 blocks -> (skip, mu, logvar)."""
    out_channels: int = 512

    @nn.compact
    def __call__(self, x):
        x1 = EncodeConvBlock(self.out_channels // 2, name="conv2")(x)
        x = EncodeConvBlock(self.out_channels, name="conv3")(x1)
        x = EncodeConvBlock(2 * self.out_channels, name="conv4")(x)
        return x1, x[..., :self.out_channels], x[..., self.out_channels:]


def avae_generator_plan(output_size: int):
    """(in_ch, out_ch, initial, upsample, fused) per progression step
    (model.py:36-63)."""
    base = [(512, 512, True, False, False),
            (512, 512, False, True, False),
            (512, 512, False, True, False),
            (512 + 256, 256, False, True, True)]
    if output_size == 64:
        tail = [(256, 128, False, True, True)]
    elif output_size == 128:
        tail = [(256, 256, False, True, True), (256, 128, False, True, True)]
    elif output_size == 256:
        tail = [(256, 256, False, True, True), (256, 256, False, True, True),
                (256, 128, False, True, True)]
    else:
        raise NotImplementedError(output_size)
    return base + tail


class AVAEGenerator(nn.Module):
    """model.py:29-105: styled progression with an encoder skip concat at
    the matching resolution."""
    output_size: int

    @nn.compact
    def __call__(self, x_skip, m, v, style_fn, noise, inference: bool = False,
                 key=None):
        temp = 0.6 if inference else 1.0
        sigma = jnp.exp(v * 0.5) * temp
        eps = jax.random.normal(key, m.shape, m.dtype)
        out = m + eps * sigma

        # channel-major flatten to match torch's NCHW view (model.py:85)
        z = jnp.transpose(out, (0, 3, 1, 2)).reshape(out.shape[0], -1)
        style = style_fn(z)

        plan = avae_generator_plan(self.output_size)
        for i, (in_ch, out_ch, initial, upsample, fused) in enumerate(plan):
            if out.shape[1] == x_skip.shape[1]:
                out = jnp.concatenate([out, x_skip], axis=-1)
            out = StyledConvBlock(out_ch, 3, 1, initial=initial,
                                  upsample=upsample, fused=fused,
                                  name=f"progression_{i}")(out, style, noise[i])
        return AEqualConv2d(3, 1, name="to_rgb")(out)


class StyledGenerator(nn.Module):
    """model.py:108-141: encoder + generator + 5-layer style MLP."""
    output_size: int = 128

    def setup(self):
        self.encoder = AVAEEncoder(512)
        self.generator = AVAEGenerator(self.output_size)
        self.style_layers = [AEqualLinear(512) for _ in range(4)]

    def style_fn(self, z):
        z = pixel_norm(z)
        for layer in self.style_layers:
            z = _lrelu(layer(z))
        return z

    def make_noise(self, key, batch: int):
        n_prog = len(avae_generator_plan(self.output_size))
        keys = jax.random.split(key, n_prog)
        return [jax.random.normal(keys[i], (batch, 4 * 2 ** i, 4 * 2 ** i, 1))
                for i in range(n_prog)]

    def __call__(self, x, key, noise=None, inference: bool = False):
        k_noise, k_eps = jax.random.split(key)
        if noise is None:
            noise = self.make_noise(k_noise, x.shape[0])
        x_skip, m, v = self.encoder(x)
        img = self.generator(x_skip, m, v, self.style_fn, noise,
                             inference=inference, key=k_eps)
        if inference:
            return img
        return m, v, img


class AVAEDiscriminator(nn.Module):
    """model.py:144-191 (WGAN critic).  ConvBlock (modules.py:191-279) with
    InstanceNorm kept (the discriminator applies it for real)."""
    initial_res: int = 128

    @nn.compact
    def __call__(self, x):
        if self.initial_res == 64:
            plan = [(128, True, True, True), (256, True, True, True),
                    (512, True, False, True), (512, True, False, True),
                    (512, False, False, False)]
        elif self.initial_res == 128:
            plan = [(128, True, True, True), (256, True, True, True),
                    (512, True, False, True), (512, True, False, True),
                    (512, True, False, True), (512, False, False, False)]
        elif self.initial_res == 256:
            plan = [(128, True, True, True), (256, True, True, True),
                    (256, True, False, True), (512, True, False, True),
                    (512, True, False, True), (512, True, False, True),
                    (512, False, False, False)]
        else:
            raise NotImplementedError(self.initial_res)

        y = AEqualConv2d(64, 1, name="from_rgb")(x)
        for i, (out_ch, downsample, fused, norm) in enumerate(plan):
            last = i == len(plan) - 1
            k2, p2 = (4, 0) if last else (3, 1)
            y = AEqualConv2d(out_ch, 3, padding=1, name=f"block{i}_conv1")(y)
            if norm:
                y = instance_norm(y)
            y = _lrelu(y)
            if downsample:
                y = blur3(y)
                if fused:
                    y = FusedDownsample(out_ch, k2, padding=p2,
                                        name=f"block{i}_conv2f")(y)
                else:
                    y = AEqualConv2d(out_ch, k2, padding=p2,
                                     name=f"block{i}_conv2")(y)
                    y = y.reshape(y.shape[0], y.shape[1] // 2, 2,
                                  y.shape[2] // 2, 2, y.shape[3]).mean((2, 4))
            else:
                y = AEqualConv2d(out_ch, k2, padding=p2, name=f"block{i}_conv2")(y)
            if norm:
                y = instance_norm(y)
            y = _lrelu(y)
        y = y.reshape(y.shape[0], -1)
        return AEqualLinear(1, name="linear")(y)
