"""StyleGAN2 discriminator with minibatch-stddev (reference
StyleGan_Trans/models/stylegan2/model.py:616-674), Flax / NHWC."""

import math

import jax.numpy as jnp
from flax import linen as nn

from gen_adversarial_tpu.models.stylegan2.generator import generator_channels
from gen_adversarial_tpu.models.stylegan2.layers import ConvLayer, ResBlock, EqualLinear


class Discriminator(nn.Module):
    size: int
    channel_multiplier: int = 2
    stddev_group: int = 4
    stddev_feat: int = 1

    @nn.compact
    def __call__(self, x):
        ch = generator_channels(self.channel_multiplier)
        log_size = int(math.log2(self.size))
        y = ConvLayer(ch[self.size], 1, name="conv_in")(x)
        for i in range(log_size, 2, -1):
            y = ResBlock(ch[2 ** (i - 1)], name=f"res_{i}")(y)

        b, h, w, c = y.shape
        group = min(b, self.stddev_group)
        # minibatch stddev (model.py:655-663), NHWC
        stddev = y.reshape(group, b // group, h, w, self.stddev_feat,
                           c // self.stddev_feat)
        stddev = jnp.sqrt(jnp.var(stddev, axis=0) + 1e-8)  # (b/g, h, w, f, c/f)
        stddev = jnp.mean(stddev, axis=(1, 2, 4))           # (b/g, f)
        stddev = jnp.tile(stddev.reshape(b // group, 1, 1, self.stddev_feat),
                          (group, h, w, 1))
        y = jnp.concatenate([y, stddev], axis=-1)

        y = ConvLayer(ch[4], 3, name="final_conv")(y)
        # channel-major flatten to line up with torch's NCHW view(b, -1)
        y = jnp.transpose(y, (0, 3, 1, 2)).reshape(b, -1)
        y = EqualLinear(ch[4], activation=True, name="final_linear0")(y)
        return EqualLinear(1, name="final_linear1")(y)
