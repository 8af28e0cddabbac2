"""Shared encoder building blocks."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params
    (reference: networks/layers/normalization.py:6-43).

    All four arrays live in params (so checkpoint import fills them) but are
    excluded from optimization and wrapped in stop_gradient — matching the
    reference's requires_grad=False buffers. Init sets running_var = 1 - eps
    so the transform starts as identity, as the reference does.
    """

    features: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.features
        weight = self.param("weight", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        mean = self.param("running_mean", nn.initializers.zeros, (f,), jnp.float32)
        var = self.param(
            "running_var",
            lambda k, s, d=jnp.float32: jnp.full(s, 1.0 - self.epsilon, d),
            (f,), jnp.float32)
        scale = weight * jax.lax.rsqrt(var + self.epsilon)
        shift = bias - mean * scale
        scale = jax.lax.stop_gradient(scale).astype(x.dtype)
        shift = jax.lax.stop_gradient(shift).astype(x.dtype)
        return x * scale + shift


class BatchNorm(nn.Module):
    """Trainable BatchNorm (used when MODEL_FREEZE_BN=False). Batch stats go
    to the 'batch_stats' collection; cross-replica sync via axis_name when a
    mesh axis is present (SyncBN equivalent, reference: trainer.py:66-67)."""

    features: int
    epsilon: float = 1e-5
    momentum: float = 0.9
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            axis_name=self.axis_name,
        )(x)


def conv_kaiming(features: int, kernel_size: int, stride: int = 1,
                 dilation: int = 1, groups: int = 1, use_bias: bool = False,
                 dtype: Dtype = jnp.float32, name: Optional[str] = None,
                 padding: Optional[int] = None) -> nn.Conv:
    """Conv with kaiming-normal(fan_out) init (torch encoder convention,
    reference: mobilenetv2.py:226-231)."""
    if padding is None:
        padding = (kernel_size - 1) // 2 * dilation
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=padding,
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
        dtype=dtype,
        name=name,
    )
