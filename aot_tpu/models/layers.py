"""Basic flax layers shared across the framework.

Initialisation follows the reference's scheme (xavier-uniform for all >1-dim
transformer/decoder params — reference: transformer.py:369-372; torch-default
uniform for biases) so that training-from-scratch statistics match.

Token sequences are (B, HW, C); size_2d=(H, W) recovers the 2-D grid.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from aot_tpu.ops import attention as att_ops

Dtype = Any


# --- initializers ----------------------------------------------------------

def xavier_uniform_fans(fan_in: int, fan_out: int) -> Callable:
    """Xavier-uniform with explicit fans (our param layouts differ from
    torch's, so fans are supplied rather than inferred)."""
    bound = math.sqrt(6.0 / (fan_in + fan_out))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


XAVIER = nn.initializers.xavier_uniform()


def seq_to_2d(x: jax.Array, size_2d: Tuple[int, int]) -> jax.Array:
    """(B, HW, C) -> (B, H, W, C)."""
    b, hw, c = x.shape
    return x.reshape(b, size_2d[0], size_2d[1], c)


def seq_from_2d(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, HW, C)."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


class Linear(nn.Module):
    """Dense with torch-matching default init (xavier weight + uniform bias)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param("kernel", XAVIER, (in_f, self.features), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_f), (self.features,),
                              jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class GroupNorm(nn.Module):
    """GroupNorm over channel-last inputs, fp32 statistics, torch eps."""

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon,
                         dtype=jnp.float32)(x.astype(jnp.float32))
        return y.astype(dt)


class LayerNorm(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32)(
            x.astype(jnp.float32))
        return y.astype(dt)


class DepthwiseConv5x5(nn.Module):
    """5x5 depthwise conv on (B, HW, C) given size_2d; no bias.

    (reference: basic.py:38-57 DWConv2d / :15-35 GNActDWConv2d conv part)
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size_2d):
        x2 = seq_to_2d(x, size_2d)
        y = nn.Conv(
            features=self.features,
            kernel_size=(5, 5),
            padding=2,
            feature_group_count=self.features,
            use_bias=False,
            kernel_init=nn.initializers.kaiming_normal(),
            dtype=self.dtype,
        )(x2)
        return seq_from_2d(y)


class GNActDWConv2d(nn.Module):
    """GroupNorm(32) + GELU + 5x5 depthwise conv — the LSTT FFN activation
    (reference: basic.py:15-35)."""

    features: int
    gn_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size_2d):
        x = GroupNorm(self.gn_groups)(x)
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
        return DepthwiseConv5x5(self.features, dtype=self.dtype)(x, size_2d)


class DWConv2d(nn.Module):
    """Depthwise 5x5 + spatial (channel-wise) dropout
    (reference: basic.py:38-57; torch Dropout2d(p=0.1) by default)."""

    features: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size_2d, *, deterministic: bool = True):
        y = DepthwiseConv5x5(self.features, dtype=self.dtype)(x, size_2d)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, broadcast_dims=(1,))(
                y, deterministic=deterministic)
        return y


class ConvGN(nn.Module):
    """Conv + GroupNorm(8) used by the FPN decoder (reference: basic.py:75-85)."""

    features: int
    kernel_size: int
    gn_groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        ks = self.kernel_size
        y = nn.Conv(
            features=self.features,
            kernel_size=(ks, ks),
            padding=ks // 2,
            kernel_init=XAVIER,
            bias_init=torch_bias_init(in_f * ks * ks),
            dtype=self.dtype,
        )(x)
        return GroupNorm(self.gn_groups)(y)


def drop_path(
    x: jax.Array, rate: float, rng: Optional[jax.Array], deterministic: bool
) -> jax.Array:
    """Stochastic depth over the batch dim (reference: basic.py:129-148,
    DropPath(batch_dim=1) on (T,B,C) == per-sample here on (B, ...))."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, jnp.float32))
    return (x / keep * mask.astype(x.dtype)).astype(x.dtype)


class DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("droppath")
        return drop_path(x, self.rate, rng, deterministic)


# --- attention modules ------------------------------------------------------


class MultiheadAttention(nn.Module):
    """Global attention module (reference: attention.py:29-126).

    use_linear=False drops the Q/K/V projections (the LSTT block hoists them);
    the output projection is always present.
    """

    d_model: int
    num_heads: int = 8
    use_linear: bool = True
    d_att: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, *, valid_len=None, top_k: int = -1,
                 max_mem_len_ratio: float = -1.0, deterministic: bool = True):
        if self.use_linear:
            q = Linear(self.d_model, dtype=self.dtype, name="linear_Q")(q)
            k = Linear(self.d_model, dtype=self.dtype, name="linear_K")(k)
            v = Linear(self.d_model, dtype=self.dtype, name="linear_V")(v)
        out = att_ops.global_attention(
            q, k, v, self.num_heads, self.d_att,
            valid_len=valid_len, top_k=top_k, max_mem_len_ratio=max_mem_len_ratio,
        )
        # attention-prob dropout is 0 in every reference config; the module
        # keeps the knob for parity but applies it on the output-equivalent
        # path only when configured.
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return Linear(self.d_model, dtype=self.dtype, name="projection")(out)


class MultiheadLocalAttention(nn.Module):
    """Dilated local-window attention module with learned relative key/value
    biases (reference: attention.py:248-577)."""

    d_model: int
    num_heads: int
    max_dis: int = 7
    dilation: int = 1
    use_linear: bool = False
    d_att: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, size_2d, *, deterministic: bool = True):
        h = self.num_heads
        d_att = self.d_att if self.d_att is not None else self.d_model // h
        win2 = (2 * self.max_dis + 1) ** 2
        if self.use_linear:
            q = Linear(self.d_model, dtype=self.dtype, name="linear_Q")(q)
            k = Linear(self.d_model, dtype=self.dtype, name="linear_K")(k)
            v = Linear(self.d_model, dtype=self.dtype, name="linear_V")(v)

        rel_w = self.param(
            "relative_emb_k_w", xavier_uniform_fans(d_att, h * win2),
            (h, win2, d_att), jnp.float32)
        rel_b = self.param("relative_emb_k_b", torch_bias_init(d_att),
                           (h, win2), jnp.float32)
        rel_v = self.param(
            "relative_emb_v",
            xavier_uniform_fans(self.d_model // h, win2),
            (h, self.d_model // h, win2), jnp.float32)

        rel_bias = att_ops.relative_emb_from_q(
            q.astype(jnp.float32), rel_w, rel_b, h)
        out = att_ops.local_attention(
            q, k, v, rel_bias, rel_v,
            num_heads=h, size_2d=size_2d, max_dis=self.max_dis,
            dilation=self.dilation, d_att=d_att,
        )
        return Linear(self.d_model, dtype=self.dtype, name="projection")(out)


class GatedPropagation(nn.Module):
    """DeAOT gated propagation: softmax attention over a 2x value stream,
    elementwise U-gate, depthwise conv, projection
    (reference: attention.py:589-717)."""

    d_qk: int
    d_vu: int
    num_heads: int = 8
    d_att: Optional[int] = None
    use_linear: bool = True
    expand_ratio: float = 2.0
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, u, size_2d, *, valid_len=None, top_k: int = -1,
                 max_mem_len_ratio: float = -1.0, deterministic: bool = True):
        h = self.num_heads
        d_att = self.d_att if self.d_att is not None else self.d_qk // h
        expand_d_vu = int(self.d_vu * self.expand_ratio)
        hidden = expand_d_vu // h

        if self.use_linear:
            q = k = Linear(d_att * h, dtype=self.dtype, name="linear_QK")(q)
            half = self.d_vu // 2
            v1 = Linear(hidden * h // 2, dtype=self.dtype, name="linear_V1")(v[..., :half])
            v2 = Linear(hidden * h // 2, dtype=self.dtype, name="linear_V2")(v[..., half:])
            u1 = Linear(hidden * h // 2, dtype=self.dtype, name="linear_U1")(u[..., :half])
            u2 = Linear(hidden * h // 2, dtype=self.dtype, name="linear_U2")(u[..., half:])

            def cat_halves(x1, x2):
                if h > 1:
                    b, l, _ = x1.shape
                    x1 = x1.reshape(b, l, h, hidden // 2)
                    x2 = x2.reshape(b, l, h, hidden // 2)
                    return jnp.concatenate([x1, x2], axis=-1).reshape(b, l, h * hidden)
                return jnp.concatenate([x1, x2], axis=-1)

            v = att_ops.silu(cat_halves(v1, v2))
            u = att_ops.silu(cat_halves(u1, u2))

        out = att_ops.gated_global_attention(
            q, k, v, h, d_att,
            valid_len=valid_len, top_k=top_k, max_mem_len_ratio=max_mem_len_ratio,
        )
        out = out * u
        out = DWConv2d(expand_d_vu, dtype=self.dtype, name="dw_conv")(
            out, size_2d, deterministic=deterministic)
        return Linear(self.d_vu, dtype=self.dtype, name="projection")(out)


class LocalGatedPropagation(nn.Module):
    """DeAOT local gated propagation (reference: attention.py:720-914)."""

    d_qk: int
    d_vu: int
    num_heads: int
    d_att: Optional[int] = None
    max_dis: int = 7
    dilation: int = 1
    use_linear: bool = False
    expand_ratio: float = 2.0
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, u, size_2d, *, deterministic: bool = True):
        h = self.num_heads
        d_att = self.d_att if self.d_att is not None else self.d_qk // h
        expand_d_vu = int(self.d_vu * self.expand_ratio)
        win2 = (2 * self.max_dis + 1) ** 2

        if self.use_linear:
            q = k = Linear(d_att * h, dtype=self.dtype, name="linear_QK")(q)
            v = att_ops.silu(Linear(expand_d_vu, dtype=self.dtype, name="linear_V")(v))
            u = att_ops.silu(Linear(expand_d_vu, dtype=self.dtype, name="linear_U")(u))

        rel_w = self.param(
            "relative_emb_k_w", xavier_uniform_fans(d_att, h * win2),
            (h, win2, d_att), jnp.float32)
        rel_b = self.param("relative_emb_k_b", torch_bias_init(d_att),
                           (h, win2), jnp.float32)
        rel_bias = att_ops.relative_emb_from_q(
            q.astype(jnp.float32), rel_w, rel_b, h)

        out = att_ops.gated_local_attention(
            q, k, v, rel_bias,
            num_heads=h, size_2d=size_2d, max_dis=self.max_dis,
            dilation=self.dilation, d_att=d_att,
        )
        out = out * u
        out = DWConv2d(expand_d_vu, dtype=self.dtype, name="dw_conv")(
            out, size_2d, deterministic=deterministic)
        return Linear(self.d_vu, dtype=self.dtype, name="projection")(out)
