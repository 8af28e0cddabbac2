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

    Frozen mode (default — every reference config sets MODEL_FREEZE_BN=True):
    all four arrays live in params (so checkpoint import fills them) but are
    excluded from optimization and wrapped in stop_gradient — matching the
    reference's requires_grad=False buffers. Init sets running_var = 1 - eps
    so the transform starts as identity, as the reference does.

    frozen=False (MODEL_FREEZE_BN=False): trainable BatchNorm. weight/bias
    stay in params (optimized); running stats move to the 'batch_stats'
    collection. When apply is called with mutable=['batch_stats'] the layer
    normalises by CURRENT batch statistics and EMA-updates the running stats
    (torch momentum 0.1, unbiased running_var — torch BatchNorm semantics);
    otherwise it uses the stored running averages (eval). Batch moments are
    computed on the logically-global array, so under pjit with a
    batch-sharded mesh XLA inserts the cross-replica reduction — SyncBN
    (reference: trainer.py:66-67 convert_sync_batchnorm) with no explicit
    axis_name.
    """

    features: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    frozen: bool = True
    momentum: float = 0.1  # torch nn.BatchNorm2d default

    @nn.compact
    def __call__(self, x):
        f = self.features
        weight = self.param("weight", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        if self.frozen:
            mean = self.param("running_mean", nn.initializers.zeros, (f,),
                              jnp.float32)
            var = self.param(
                "running_var",
                lambda k, s, d=jnp.float32: jnp.full(s, 1.0 - self.epsilon, d),
                (f,), jnp.float32)
            scale = weight * jax.lax.rsqrt(var + self.epsilon)
            shift = bias - mean * scale
            scale = jax.lax.stop_gradient(scale).astype(x.dtype)
            shift = jax.lax.stop_gradient(shift).astype(x.dtype)
            return x * scale + shift

        ra_mean = self.variable("batch_stats", "running_mean",
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "running_var",
                               lambda: jnp.ones((f,), jnp.float32))
        use_batch_stats = (self.is_mutable_collection("batch_stats")
                           and not self.is_initializing())
        if use_batch_stats:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))  # (N, H, W) of NHWC
            mean = jnp.mean(x32, axis=axes)
            var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean)
            n = 1
            for a in axes:
                n *= x.shape[a]
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            ra_mean.value = (1 - m) * ra_mean.value + m * mean
            ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        scale = weight * jax.lax.rsqrt(var + self.epsilon)
        shift = bias - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


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
