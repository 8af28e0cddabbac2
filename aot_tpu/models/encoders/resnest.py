"""ResNeSt-50/101 encoder (split-attention bottlenecks, deep stem, avg-down;
reference: networks/encoders/resnest/{resnet,splat,resnest}.py, built with
dilation=2 by the factory — i.e. layer3 keeps stride 2, output stride 16,
layer4 dropped). Emits [256, 512, 1024, 1024] NHWC.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from aot_tpu.models.encoders.common import FrozenBatchNorm, conv_kaiming

Dtype = Any


class SplAtConv2d(nn.Module):
    """Split-attention conv (reference: resnest/splat.py:15-131),
    radix=2, cardinality=1."""

    in_channels: int
    channels: int
    stride: int = 1
    dilation: int = 1
    radix: int = 2
    frozen_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = self.radix
        c = self.channels
        inter = max(self.in_channels * r // 4, 32)
        y = conv_kaiming(c * r, 3, self.stride, self.dilation, groups=r,
                         dtype=self.dtype, name="conv")(x)
        y = FrozenBatchNorm(c * r, frozen=self.frozen_bn, name="bn0")(y)
        y = nn.relu(y)
        b, h, w, _ = y.shape
        split = y.reshape(b, h, w, r, c)
        gap = split.sum(axis=3).mean(axis=(1, 2))  # (B, C)
        gap = nn.Dense(inter, dtype=self.dtype, name="fc1")(gap)
        gap = FrozenBatchNorm(inter, frozen=self.frozen_bn,
                              name="bn1")(gap[:, None, None, :])[:, 0, 0]
        gap = nn.relu(gap)
        atten = nn.Dense(c * r, dtype=self.dtype, name="fc2")(gap)
        atten = jax.nn.softmax(
            atten.reshape(b, r, c).astype(jnp.float32), axis=1
        ).astype(y.dtype)
        return (split * atten[:, None, None, :, :]).sum(axis=3)


def _avg_pool_3x3(x, stride):
    # torch AvgPool2d(3, stride, padding=1) defaults count_include_pad=True
    return nn.avg_pool(x, (3, 3), strides=(stride, stride),
                       padding=((1, 1), (1, 1)), count_include_pad=True)


class SplAtBottleneck(nn.Module):
    """(reference: resnest/resnet.py:37-177)."""

    inplanes: int
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    avd: bool = True
    is_first: bool = False
    frozen_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.planes
        use_avd = self.avd and (self.stride > 1 or self.is_first)
        conv_stride = 1 if use_avd else self.stride
        y = conv_kaiming(p, 1, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(p, frozen=self.frozen_bn, name="bn1")(y)
        y = nn.relu(y)
        y = SplAtConv2d(p, p, stride=conv_stride,
                        dilation=self.dilation, frozen_bn=self.frozen_bn,
                        dtype=self.dtype, name="conv2")(y)
        if use_avd:  # avd_first=False: pool AFTER conv2 (resnet.py:152-153)
            y = _avg_pool_3x3(y, self.stride)
        y = conv_kaiming(p * 4, 1, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(p * 4, frozen=self.frozen_bn, name="bn3")(y)
        if self.downsample:
            # avg-down shortcut (resnet.py:333-352); torch uses ceil_mode
            s = x
            if self.stride > 1:
                ph = (-s.shape[1]) % self.stride
                pw = (-s.shape[2]) % self.stride
                s = nn.avg_pool(s, (self.stride, self.stride),
                                strides=(self.stride, self.stride),
                                padding=((0, ph), (0, pw)),
                                count_include_pad=False)
            s = conv_kaiming(p * 4, 1, dtype=self.dtype,
                             name="downsample_conv")(s)
            x = FrozenBatchNorm(p * 4, frozen=self.frozen_bn,
                                name="downsample_bn")(s)
        return nn.relu(x + y)


class ResNeSt(nn.Module):
    layers: Sequence[int] = (3, 4, 23)
    stem_width: int = 64
    frozen_bn: bool = True
    dtype: Dtype = jnp.float32

    @classmethod
    def named(cls, name: str, frozen_bn=True, dtype=jnp.float32):
        if name == "resnest50":
            return cls(layers=(3, 4, 6), stem_width=32, frozen_bn=frozen_bn,
                       dtype=dtype)
        if name == "resnest101":
            return cls(layers=(3, 4, 23), stem_width=64, frozen_bn=frozen_bn,
                       dtype=dtype)
        if name == "resnest200":  # reference: resnest.py:71-89
            return cls(layers=(3, 24, 36), stem_width=64,
                       frozen_bn=frozen_bn, dtype=dtype)
        if name == "resnest269":  # reference: resnest.py:91-109
            return cls(layers=(3, 30, 48), stem_width=64,
                       frozen_bn=frozen_bn, dtype=dtype)
        raise NotImplementedError(name)

    @nn.compact
    def __call__(self, x):
        sw = self.stem_width
        # deep stem (resnet.py:232-263)
        x = conv_kaiming(sw, 3, 2, dtype=self.dtype, name="stem_conv1")(x)
        x = FrozenBatchNorm(sw, frozen=self.frozen_bn, name="stem_bn1")(x)
        x = nn.relu(x)
        x = conv_kaiming(sw, 3, 1, dtype=self.dtype, name="stem_conv2")(x)
        x = FrozenBatchNorm(sw, frozen=self.frozen_bn, name="stem_bn2")(x)
        x = nn.relu(x)
        x = conv_kaiming(sw * 2, 3, 1, dtype=self.dtype, name="stem_conv3")(x)
        x = FrozenBatchNorm(sw * 2, frozen=self.frozen_bn, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        inplanes = sw * 2
        plan = [("layer1", 64, 1, False), ("layer2", 128, 2, True),
                ("layer3", 256, 2, True)]
        for (name, planes, stride, _if), n_blocks in zip(plan, self.layers):
            for i in range(n_blocks):
                first = i == 0
                x = SplAtBottleneck(
                    inplanes=inplanes if first else planes * 4,
                    planes=planes,
                    stride=stride if first else 1,
                    downsample=first,
                    is_first=False,
                    frozen_bn=self.frozen_bn,
                    dtype=self.dtype,
                    name=f"{name}_{i}")(x)
            inplanes = planes * 4
            outs.append(x)
        outs.append(outs[-1])
        return outs
