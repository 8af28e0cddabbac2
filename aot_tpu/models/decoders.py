"""FPN segmentation head (reference: networks/decoders/fpn.py:7-63)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from aot_tpu.models.layers import ConvGN, XAVIER, torch_bias_init
from aot_tpu.ops.image import interpolate_bilinear

Dtype = Any


def _conv1x1(features: int, in_f: int, dtype, name: str) -> nn.Conv:
    return nn.Conv(features, (1, 1), kernel_init=XAVIER,
                   bias_init=torch_bias_init(in_f), dtype=dtype, name=name)


class FPNSegmentationHead(nn.Module):
    in_dim: int
    out_dim: int
    decode_intermediate_input: bool = True
    hidden_dim: int = 256
    shortcut_dims: Sequence[int] = (24, 32, 96, 1280)
    align_corners: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], shortcuts: Sequence[jax.Array]):
        """inputs: [proj-16x-shortcut, lstt_emb_1, ...] NHWC; shortcuts: the
        4 encoder maps NHWC. Returns (B, H4, W4, out_dim) logits."""
        hd = self.hidden_dim
        if self.decode_intermediate_input:
            x = jnp.concatenate(inputs, axis=-1)
        else:
            x = inputs[-1]

        x = nn.relu(ConvGN(hd, 1, dtype=self.dtype, name="conv_in")(x))
        s16 = _conv1x1(hd, self.shortcut_dims[-2], self.dtype, "adapter_16x")(
            shortcuts[-2])
        x = nn.relu(ConvGN(hd, 3, dtype=self.dtype, name="conv_16x")(s16 + x))

        x = interpolate_bilinear(
            x, shortcuts[-3].shape[1:3], align_corners=self.align_corners)
        s8 = _conv1x1(hd, self.shortcut_dims[-3], self.dtype, "adapter_8x")(
            shortcuts[-3])
        x = nn.relu(ConvGN(hd // 2, 3, dtype=self.dtype, name="conv_8x")(s8 + x))

        x = interpolate_bilinear(
            x, shortcuts[-4].shape[1:3], align_corners=self.align_corners)
        s4 = _conv1x1(hd // 2, self.shortcut_dims[-4], self.dtype, "adapter_4x")(
            shortcuts[-4])
        x = nn.relu(ConvGN(hd // 2, 3, dtype=self.dtype, name="conv_4x")(s4 + x))

        x = _conv1x1(self.out_dim, hd // 2, self.dtype, "conv_out")(x)
        return x.astype(jnp.float32)
