"""ResNet-50/101 encoder (stage-5 dropped; reference:
networks/encoders/resnet.py:57-199 — layer4 is commented out there, so the
output is [256 (4x), 512 (8x), 1024 (16x), 1024 (16x, duplicated)]).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from aot_tpu.models.encoders.common import FrozenBatchNorm, conv_kaiming

Dtype = Any


class Bottleneck(nn.Module):
    """reference: resnet.py:6-55."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    frozen_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.planes
        y = conv_kaiming(p, 1, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(p, frozen=self.frozen_bn, name="bn1")(y)
        y = nn.relu(y)
        y = conv_kaiming(p, 3, self.stride, self.dilation, dtype=self.dtype,
                         name="conv2")(y)
        y = FrozenBatchNorm(p, frozen=self.frozen_bn, name="bn2")(y)
        y = nn.relu(y)
        y = conv_kaiming(p * 4, 1, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(p * 4, frozen=self.frozen_bn, name="bn3")(y)
        if self.downsample:
            x = conv_kaiming(p * 4, 1, self.stride, dtype=self.dtype,
                             name="downsample_conv")(x)
            x = FrozenBatchNorm(p * 4, frozen=self.frozen_bn,
                                name="downsample_bn")(x)
        return nn.relu(x + y)


class ResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    frozen_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = conv_kaiming(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, frozen=self.frozen_bn, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, 2, padding=1): pad with -inf so padding never wins
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        plan = [
            ("layer1", 64, 1, 1),
            ("layer2", 128, 2, 1),
            ("layer3", 256, 2, 1),
        ]
        for (name, planes, stride, dilation), n_blocks in zip(plan, self.layers):
            for i in range(n_blocks):
                first = i == 0
                x = Bottleneck(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=max(dilation // 2, 1) if first else dilation,
                    downsample=first,
                    frozen_bn=self.frozen_bn,
                    dtype=self.dtype,
                    name=f"{name}_{i}",
                )(x)
            outs.append(x)
        outs.append(outs[-1])  # stage-5 dropped; 16x duplicated
        return outs


def ResNet50(frozen_bn: bool = True, dtype: Dtype = jnp.float32) -> ResNet:
    return ResNet(layers=(3, 4, 6), frozen_bn=frozen_bn, dtype=dtype)


def ResNet101(frozen_bn: bool = True, dtype: Dtype = jnp.float32) -> ResNet:
    return ResNet(layers=(3, 4, 23), frozen_bn=frozen_bn, dtype=dtype)
