"""MobileNet-V2 encoder, output_stride=16 with dilated last stages
(reference: networks/encoders/mobilenetv2.py:116-247, built with
output_stride=16 by the factory at encoders/__init__.py:21).

Emits [x4 (24ch), x8 (32ch), x16 (96ch), x16-dilated (1280ch)] NHWC, matching
the reference's stage split features[0:4]/[4:7]/[7:14]/[14:].
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from aot_tpu.models.encoders.common import FrozenBatchNorm, conv_kaiming

Dtype = Any

# (in, out, stride, dilation, expand_ratio) for each InvertedResidual, derived
# from the reference's setting table at output_stride=16
# (mobilenetv2.py:150-159 walked by :178-197).
_BLOCKS: List[Tuple[int, int, int, int, int]] = [
    (32, 16, 1, 1, 1),     # 1
    (16, 24, 2, 1, 6),     # 2
    (24, 24, 1, 1, 6),     # 3
    (24, 32, 2, 1, 6),     # 4
    (32, 32, 1, 1, 6),     # 5
    (32, 32, 1, 1, 6),     # 6
    (32, 64, 2, 1, 6),     # 7
    (64, 64, 1, 1, 6),     # 8
    (64, 64, 1, 1, 6),     # 9
    (64, 64, 1, 1, 6),     # 10
    (64, 96, 1, 1, 6),     # 11  (stride-16 reached; stays 1)
    (96, 96, 1, 1, 6),     # 12
    (96, 96, 1, 1, 6),     # 13
    (96, 160, 1, 1, 6),    # 14  (would-be stride 2 -> 1; first block dil 1)
    (160, 160, 1, 2, 6),   # 15
    (160, 160, 1, 2, 6),   # 16
    (160, 320, 1, 2, 6),   # 17
]

_STAGE_SPLIT = (4, 7, 14)  # feature indices ending stages 4x / 8x / 16x


class ConvBNReLU6(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    frozen_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = conv_kaiming(self.features, self.kernel_size, self.stride,
                         self.dilation, self.groups, dtype=self.dtype,
                         name="conv")(x)
        x = FrozenBatchNorm(self.features, frozen=self.frozen_bn,
                            name="bn")(x)
        return jnp.clip(x, 0.0, 6.0)  # ReLU6


class InvertedResidual(nn.Module):
    """reference: mobilenetv2.py:63-113."""

    inp: int
    oup: int
    stride: int
    dilation: int
    expand_ratio: int
    frozen_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(round(self.inp * self.expand_ratio))
        use_res = self.stride == 1 and self.inp == self.oup
        y = x
        if self.expand_ratio != 1:
            y = ConvBNReLU6(hidden, 1, frozen_bn=self.frozen_bn,
                            dtype=self.dtype, name="expand")(y)
        y = ConvBNReLU6(hidden, 3, self.stride, self.dilation, groups=hidden,
                        frozen_bn=self.frozen_bn, dtype=self.dtype,
                        name="depthwise")(y)
        y = conv_kaiming(self.oup, 1, dtype=self.dtype, name="project")(y)
        y = FrozenBatchNorm(self.oup, frozen=self.frozen_bn,
                            name="project_bn")(y)
        return x + y if use_res else y


class MobileNetV2(nn.Module):
    frozen_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU6(32, 3, 2, frozen_bn=self.frozen_bn, dtype=self.dtype,
                        name="features_0")(x)
        idx = 1
        outs = []
        for (inp, oup, s, d, t) in _BLOCKS:
            x = InvertedResidual(inp, oup, s, d, t, frozen_bn=self.frozen_bn,
                                 dtype=self.dtype, name=f"features_{idx}")(x)
            idx += 1
            if idx in _STAGE_SPLIT:
                outs.append(x)
        x = ConvBNReLU6(1280, 1, frozen_bn=self.frozen_bn, dtype=self.dtype,
                        name=f"features_{idx}")(x)
        outs.append(x)
        return outs  # [x4, x8, x16, x16]
