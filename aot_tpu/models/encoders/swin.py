"""Swin Transformer encoder (detection variant: last stage removed, per-out
LayerNorms; reference: networks/encoders/swin/swin_transformer.py and
build.py — swin_base: embed 128, depths [2,2,18](+removed 2), heads
[4,8,16], window 7, drop_path 0.3 over the FULL 24-block schedule).

Emits [4x (128), 8x (256), 16x (512), 16x (512)] NHWC.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aot_tpu.models.layers import DropPath

Dtype = Any

TRUNC02 = nn.initializers.truncated_normal(stddev=0.02)


@lru_cache(maxsize=8)
def relative_position_index(window: int) -> np.ndarray:
    """(win^2, win^2) indices into the (2w-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, w2, w2)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1).astype(np.int32)


@lru_cache(maxsize=64)
def shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """(num_windows, w2, w2) additive mask for shifted windows."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // window, window, wp // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, w2, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)


def window_reverse(x: jax.Array, window: int, h: int, w: int) -> jax.Array:
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array]):
        """x: (B_, w2, C); mask: (nW, w2, w2) or None."""
        b_, n, c = x.shape
        h = self.num_heads
        d = c // h
        table = self.param(
            "relative_position_bias_table", TRUNC02,
            ((2 * self.window - 1) ** 2, h), jnp.float32)
        idx = jnp.asarray(relative_position_index(self.window).reshape(-1))
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)  # (h, w2, w2)

        qkv = nn.Dense(3 * c, use_bias=True, kernel_init=TRUNC02,
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (d ** -0.5), qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, h, n, n) + \
                mask[None, :, None, :, :]
            attn = attn.reshape(b_, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, kernel_init=TRUNC02, dtype=self.dtype,
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int], *, deterministic=True):
        """x: (B, H*W, C)."""
        hgt, wid = hw
        b, l, c = x.shape
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)).astype(x.dtype)
        y = y.reshape(b, hgt, wid, c)

        pad_b = (self.window - hgt % self.window) % self.window
        pad_r = (self.window - wid % self.window) % self.window
        hp, wp = hgt + pad_b, wid + pad_r
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(hp, wp, self.window, self.shift))
        else:
            mask = None

        wins = window_partition(y, self.window)
        wins = WindowAttention(self.dim, self.num_heads, self.window,
                               dtype=self.dtype, name="attn")(wins, mask)
        y = window_reverse(wins, self.window, hp, wp)

        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y[:, :hgt, :wid].reshape(b, l, c)

        dp = DropPath(self.drop_path)
        x = shortcut + dp(y, deterministic=deterministic)
        z = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)).astype(x.dtype)
        z = nn.Dense(int(c * self.mlp_ratio), kernel_init=TRUNC02,
                     dtype=self.dtype, name="mlp_fc1")(z)
        z = jax.nn.gelu(z.astype(jnp.float32), approximate=False).astype(x.dtype)
        z = nn.Dense(c, kernel_init=TRUNC02, dtype=self.dtype,
                     name="mlp_fc2")(z)
        return x + dp(z, deterministic=deterministic)


class PatchMerging(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        hgt, wid = hw
        b, l, c = x.shape
        y = x.reshape(b, hgt, wid, c)
        y = jnp.pad(y, ((0, 0), (0, hgt % 2), (0, wid % 2), (0, 0)))
        y = jnp.concatenate([y[:, 0::2, 0::2], y[:, 1::2, 0::2],
                             y[:, 0::2, 1::2], y[:, 1::2, 1::2]], axis=-1)
        y = y.reshape(b, -1, 4 * c)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            y.astype(jnp.float32)).astype(x.dtype)
        return nn.Dense(2 * c, use_bias=False, kernel_init=TRUNC02,
                        dtype=self.dtype, name="reduction")(y)


class SwinTransformer(nn.Module):
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18)
    full_depths: Sequence[int] = (2, 2, 18, 2)  # droppath schedule incl. the
    # removed stage (reference: swin_transformer.py:600-603)
    num_heads: Sequence[int] = (4, 8, 16)
    window: int = 7
    drop_path_rate: float = 0.3
    out_indices: Sequence[int] = (0, 1, 2)
    dtype: Dtype = jnp.float32

    @classmethod
    def base(cls, dtype=jnp.float32):
        return cls(dtype=dtype)

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        # patch embed: conv 4x4 stride 4 + LN (patch_norm=True)
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding=0,
                    kernel_init=TRUNC02, dtype=self.dtype,
                    name="patch_embed_proj")(x)
        b, hgt, wid, c = x.shape
        x = x.reshape(b, hgt * wid, c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="patch_embed_norm")(
            x.astype(jnp.float32)).astype(self.dtype)

        dpr = np.linspace(0, self.drop_path_rate,
                          sum(self.full_depths)).tolist()
        outs = []
        hw = (hgt, wid)
        for i, depth in enumerate(self.depths):
            dim = int(self.embed_dim * 2 ** i)
            for j in range(depth):
                x = SwinBlock(
                    dim=dim, num_heads=self.num_heads[i], window=self.window,
                    shift=0 if j % 2 == 0 else self.window // 2,
                    drop_path=dpr[sum(self.full_depths[:i]) + j],
                    dtype=self.dtype, name=f"layers_{i}_block_{j}",
                )(x, hw, deterministic=deterministic)
            if i in self.out_indices:
                y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name=f"norm{i}")(x.astype(jnp.float32))
                outs.append(y.reshape(b, hw[0], hw[1], dim).astype(self.dtype))
            if i < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"layers_{i}_downsample")(x, hw)
                hw = ((hw[0] + 1) // 2, (hw[1] + 1) // 2)
        outs.append(outs[-1])
        return outs
