"""MobileNetV3-Large encoder, output_stride=16
(reference: networks/encoders/mobilenetv3.py:142-239).

Emits [24 (4x), 40 (8x), 112 (16x), 960 (16x dilated)] NHWC — the stage
split features[0:4]/[4:7]/[7:13]/[13:] + final 1x1 conv.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from aot_tpu.models.encoders.common import FrozenBatchNorm, conv_kaiming

Dtype = Any


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def h_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def h_swish(x):
    return x * h_sigmoid(x)


# (k, t, c, SE, HS, s) walked at output_stride=16
# (reference: mobilenetv3.py:155-172,178-193)
_CFGS = [
    (3, 1, 16, 0, 0, 1),
    (3, 4, 24, 0, 0, 2),
    (3, 3, 24, 0, 0, 1),
    (5, 3, 40, 1, 0, 2),
    (5, 3, 40, 1, 0, 1),
    (5, 3, 40, 1, 0, 1),
    (3, 6, 80, 0, 1, 2),
    (3, 2.5, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1),
    (3, 6, 112, 1, 1, 1),
    (3, 6, 112, 1, 1, 1),
    (5, 6, 160, 1, 1, 2),
    (5, 6, 160, 1, 1, 1),
    (5, 6, 160, 1, 1, 1),
]

_STAGE_SPLIT = (4, 7, 13)  # features indices closing the 4x/8x/16x stages


def _walk_cfgs(output_stride: int = 16):
    """Resolve per-block (k, exp, out, se, hs, stride, dilation)."""
    blocks = []
    inp = _make_divisible(16)
    now_stride, rate = 2, 1
    for (k, t, c, se, hs, s) in _CFGS:
        if now_stride == output_stride:
            dilation = rate
            rate *= s
            s = 1
        else:
            dilation = 1
            now_stride *= s
        out = _make_divisible(c)
        exp = _make_divisible(inp * t)
        blocks.append((k, exp, out, se, hs, s, dilation, inp))
        inp = out
    return blocks, exp


class SELayer(nn.Module):
    """Squeeze-excite with hard sigmoid (reference: mobilenetv3.py:51-66)."""

    channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inter = _make_divisible(self.channel // 4)
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.Dense(inter, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channel, dtype=self.dtype, name="fc2")(y)
        y = h_sigmoid(y)
        return x * y[:, None, None, :]


class InvertedResidualV3(nn.Module):
    inp: int
    exp: int
    out: int
    kernel: int
    stride: int
    use_se: bool
    use_hs: bool
    dilation: int = 1
    frozen_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = h_swish if self.use_hs else nn.relu
        y = x
        if self.inp != self.exp:
            y = conv_kaiming(self.exp, 1, dtype=self.dtype, name="pw")(y)
            y = FrozenBatchNorm(self.exp, frozen=self.frozen_bn, name="pw_bn")(y)
            y = act(y)
        y = conv_kaiming(self.exp, self.kernel, self.stride, self.dilation,
                         groups=self.exp, dtype=self.dtype, name="dw")(y)
        y = FrozenBatchNorm(self.exp, frozen=self.frozen_bn, name="dw_bn")(y)
        if self.inp == self.exp:
            y = act(y)
            if self.use_se:
                y = SELayer(self.exp, dtype=self.dtype, name="se")(y)
        else:
            if self.use_se:
                y = SELayer(self.exp, dtype=self.dtype, name="se")(y)
            y = act(y)
        y = conv_kaiming(self.out, 1, dtype=self.dtype, name="pw_linear")(y)
        y = FrozenBatchNorm(self.out, frozen=self.frozen_bn,
                            name="pw_linear_bn")(y)
        if self.stride == 1 and self.inp == self.out:
            y = x + y
        return y


class MobileNetV3Large(nn.Module):
    frozen_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        blocks, last_exp = _walk_cfgs(16)
        x = conv_kaiming(_make_divisible(16), 3, 2, dtype=self.dtype,
                         name="features_0_conv")(x)
        x = FrozenBatchNorm(_make_divisible(16), frozen=self.frozen_bn,
                            name="features_0_bn")(x)
        x = h_swish(x)
        outs = []
        idx = 1
        for (k, exp, out, se, hs, s, d, inp) in blocks:
            x = InvertedResidualV3(inp, exp, out, k, s, bool(se), bool(hs), d,
                                   frozen_bn=self.frozen_bn,
                                   dtype=self.dtype, name=f"features_{idx}")(x)
            idx += 1
            if idx in _STAGE_SPLIT:
                outs.append(x)
        # final 1x1 conv applied to the 16x stage output
        x = conv_kaiming(last_exp, 1, dtype=self.dtype, name="conv_conv")(x)
        x = FrozenBatchNorm(last_exp, frozen=self.frozen_bn, name="conv_bn")(x)
        x = h_swish(x)
        outs.append(x)
        return outs
