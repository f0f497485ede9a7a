"""E4E Encoder4Editing: IR-SE-50 backbone + FPN + GradualStyleBlock heads
(reference StyleGan_E4E/encoding/encoder.py and helpers.py in
SerezD/gen_adversarial), Flax / NHWC.

The w0 head runs on the deepest feature; per-style deltas are added with
the coarse(3)/middle(7)/fine split, gated by the progressive stage
(Inference = all deltas active, encoder.py:113-140).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gen_adversarial_tpu.models.stylegan2.layers import EqualLinear
from gen_adversarial_tpu.ops.image import resize_bilinear


def _bn(train: bool, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class PReLU(nn.Module):
    """Per-channel PReLU (torch PReLU(num_parameters=C))."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, a * x)


class SEModule(nn.Module):
    """ArcFace SE block (helpers.py:57-73)."""
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(c // self.reduction, (1, 1), use_bias=False, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=False, name="fc2")(s)
        return x * nn.sigmoid(s)


class BottleneckIRSE(nn.Module):
    """bottleneck_IR_SE (helpers.py:98-120)."""
    depth: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        if in_ch == self.depth:
            # MaxPool2d(1, stride): stride-subsample
            shortcut = x[:, ::self.stride, ::self.stride, :]
        else:
            shortcut = nn.Conv(self.depth, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="shortcut_conv")(x)
            shortcut = _bn(train, "shortcut_bn")(shortcut)
        r = _bn(train, "bn0")(x)
        r = nn.Conv(self.depth, (3, 3), padding=1, use_bias=False, name="conv1")(r)
        r = PReLU(name="prelu")(r)
        r = nn.Conv(self.depth, (3, 3), strides=(self.stride,) * 2, padding=1,
                    use_bias=False, name="conv2")(r)
        r = _bn(train, "bn2")(r)
        r = SEModule(name="se")(r)
        return r + shortcut


# (depth, stride) per bottleneck for num_layers=50 (helpers.py:30-37)
def irse50_blocks():
    blocks = []
    for in_c, depth, n in [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)]:
        blocks += [(depth, 2)] + [(depth, 1)] * (n - 1)
    return blocks


class IRSE50Trunk(nn.Module):
    """input_layer + body with taps at block indices 6 / 20 / 23
    (encoder.py:113-124)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="input_conv")(x)
        x = _bn(train, "input_bn")(x)
        x = PReLU(name="input_prelu")(x)
        c1 = c2 = c3 = None
        for i, (depth, stride) in enumerate(irse50_blocks()):
            x = BottleneckIRSE(depth, stride, name=f"body_{i}")(x, train)
            if i == 6:
                c1 = x
            elif i == 20:
                c2 = x
            elif i == 23:
                c3 = x
        return c1, c2, c3


class GradualStyleBlock(nn.Module):
    """Strided conv chain + EqualLinear head (encoder.py:33-54)."""
    out_dim: int
    spatial: int

    @nn.compact
    def __call__(self, x):
        num_pools = int(np.log2(self.spatial))
        for i in range(num_pools):
            x = nn.Conv(self.out_dim, (3, 3), strides=(2, 2), padding=1,
                        name=f"conv{i}")(x)
            x = jax.nn.leaky_relu(x, 0.01)  # torch LeakyReLU default slope
        x = x.reshape(x.shape[0], -1)  # (B, out_dim) once spatial == 1
        return EqualLinear(self.out_dim, name="linear")(x)


def upsample_add(x, y):
    """Bilinear (align_corners=True) upsample of x to y's size, + y
    (helpers.py:123-140)."""
    return resize_bilinear(x, y.shape[1], y.shape[2], align_corners=True) + y


class Encoder4Editing(nn.Module):
    stylegan_size: int = 1024
    coarse_ind: int = 3
    middle_ind: int = 7

    @property
    def style_count(self):
        return int(2 * np.log2(self.stylegan_size) - 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, c3 = IRSE50Trunk(name="trunk")(x, train)

        styles = [GradualStyleBlock(512, 16, name=f"style_{i}") if i < self.coarse_ind
                  else GradualStyleBlock(512, 32, name=f"style_{i}") if i < self.middle_ind
                  else GradualStyleBlock(512, 64, name=f"style_{i}")
                  for i in range(self.style_count)]

        w0 = styles[0](c3)
        w = jnp.repeat(w0[:, None, :], self.style_count, axis=1)  # (B, N, 512)

        features = c3
        deltas = []
        p2 = None
        for i in range(1, self.style_count):  # Inference stage: all deltas
            if i == self.coarse_ind:
                p2 = upsample_add(c3, nn.Conv(512, (1, 1), name="latlayer1")(c2))
                features = p2
            elif i == self.middle_ind:
                p1 = upsample_add(p2, nn.Conv(512, (1, 1), name="latlayer2")(c1))
                features = p1
            deltas.append(styles[i](features))
        delta = jnp.stack(deltas, axis=1)                         # (B, N-1, 512)
        w = w.at[:, 1:, :].add(delta)
        return w
