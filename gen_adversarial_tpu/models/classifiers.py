"""Classifier zoo: ResNet50, VGG11-BN, ResNeXt50-32x4d with the reference's
3-layer projector head (classifier/model.py:10-70 in SerezD/gen_adversarial:
torchvision backbones whose final fc/classifier is replaced by
Linear(d, d, bias=False) -> BatchNorm1d -> ReLU -> Linear(d, n_classes)).

Re-implemented in Flax with NHWC layout (TPU-native).  Structure matches
torchvision exactly so that torch checkpoints convert weight-for-weight
(see core/torch_convert.py); flatten order is kept channel-major so VGG's
flattened features line up with torch's NCHW flatten.
"""

from functools import partial
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def _bn(train: bool, name: str) -> nn.BatchNorm:
    # torch BatchNorm defaults: momentum 0.1 (flax momentum = 1 - 0.1), eps 1e-5
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class Projector(nn.Module):
    """The reference's replacement head (classifier/model.py:20-24)."""
    n_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = x.shape[-1]
        x = nn.Dense(d, use_bias=False, name="fc0")(x)
        x = _bn(train, "bn")(x)
        x = nn.relu(x)
        return nn.Dense(self.n_classes, name="fc1")(x)


class Bottleneck(nn.Module):
    """torchvision ResNet Bottleneck (stride on the 3x3, 'B' variant)."""
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_bn(train, "bn1")(y))
        y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                    padding=1, feature_group_count=self.groups,
                    use_bias=False, name="conv2")(y)
        y = nn.relu(_bn(train, "bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = _bn(train, "bn3")(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, name="downsample_conv")(x)
            x = _bn(train, "downsample_bn")(x)
        return nn.relu(y + x)


class ResNetBackbone(nn.Module):
    """ResNet-50 family; groups/base_width=(32, 4) gives ResNeXt50-32x4d."""
    n_classes: int
    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(_bn(train, "bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, n_blocks in enumerate(self.layers):
            planes = 64 * (2 ** stage)
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = Bottleneck(planes, stride, self.groups, self.base_width,
                               name=f"layer{stage + 1}_{i}")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return Projector(self.n_classes, name="fc")(x, train)


ResNet50 = partial(ResNetBackbone, layers=(3, 4, 6, 3), groups=1, base_width=64)
ResNeXt50 = partial(ResNetBackbone, layers=(3, 4, 6, 3), groups=32, base_width=4)

# vgg11_bn feature plan: channel counts with 'M' maxpools between stages
VGG11_PLAN = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")


class VGG11BN(nn.Module):
    n_classes: int
    plan: Sequence = VGG11_PLAN

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv_i = 0
        for item in self.plan:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(item, (3, 3), padding=1, name=f"conv{conv_i}")(x)
                x = nn.relu(_bn(train, f"bn{conv_i}")(x))
                conv_i += 1
        # torchvision applies AdaptiveAvgPool2d(7) before the classifier;
        # on the 64px inputs used here that upsamples 2x2 -> 7x7.
        from gen_adversarial_tpu.ops.image import adaptive_avg_pool_general
        x = adaptive_avg_pool_general(x, 7, 7)
        b = x.shape[0]
        # channel-major flatten to match torch's NCHW view(b, -1)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        return Projector(self.n_classes, name="classifier")(x, train)


def make_classifier(model_type: str, n_classes: int) -> nn.Module:
    if model_type == "resnet":
        return ResNet50(n_classes=n_classes)
    if model_type == "resnext":
        return ResNeXt50(n_classes=n_classes)
    if model_type == "vgg":
        return VGG11BN(n_classes=n_classes)
    raise ValueError(model_type)
